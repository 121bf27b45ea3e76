// Reference-baseline benchmark driver.
//
// Links the UNMODIFIED reference sources (/root/reference: linemod + ICP +
// CadReco) and drives the product API CObjRecoCAD::Recognition
// (obj_reco_lmicp.cpp:86-204) on a fixture produced by make_fixture.py, to
// measure the single-core C++ baseline that BASELINE.md requires
// ("reference measurement: run the C++ pipeline single-core ... to obtain
// ADD pass-rate and frames/s").
//
// Usage:
//   ref_bench <features_dir> <scene_bgr.png> <scene_depth.png>
//             <fx> <fy> <cx> <cy> <iters>
//
// Prints ONE JSON line on stdout:
//   {"ms_per_frame":..., "fps":..., "n_results":..., "obj":"...",
//    "pose":[16 floats row-major]}
// The reference's own stdout chatter (per-iteration ICP prints,
// "Time of linemod/ICP") is redirected away during the timed region.

#include <chrono>
#include <cstdio>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include "obj_reco_temp.h"

int main(int argc, char **argv) {
  if (argc < 9) {
    std::fprintf(stderr,
                 "usage: ref_bench <features_dir> <bgr.png> <depth.png> "
                 "<fx> <fy> <cx> <cy> <iters>\n");
    return 2;
  }
  const std::string features_dir = argv[1];
  cv::Mat bgr = cv::imread(argv[2], cv::IMREAD_COLOR);
  cv::Mat depth = cv::imread(argv[3], cv::IMREAD_UNCHANGED);
  if (bgr.empty() || depth.empty() || depth.type() != CV_16UC1) {
    std::fprintf(stderr, "bad scene images\n");
    return 2;
  }
  const int iters = std::atoi(argv[8]);

  // single-core measurement (the reference has no threading of its own;
  // keep OpenCV's internal parallel_for off too)
  cv::setNumThreads(1);

  TCamIntrinsicParam cam;
  cam.nWidth = bgr.cols;
  cam.nHeight = bgr.rows;
  cam.dFx = std::atof(argv[4]);
  cam.dFy = std::atof(argv[5]);
  cam.dCx = std::atof(argv[6]);
  cam.dCy = std::atof(argv[7]);

  TImageU rgb_img;
  rgb_img.dTimestamp = 0.0;
  rgb_img.pData = bgr.data;
  rgb_img.nWidth = bgr.cols;
  rgb_img.nHeight = bgr.rows;
  TImageU16 depth_img;
  depth_img.dTimestamp = 0.0;
  depth_img.pData = depth.ptr<unsigned short>();
  depth_img.nWidth = depth.cols;
  depth_img.nHeight = depth.rows;

  CObjRecoCAD *eng = CObjRecoCAD::Create(CObjRecoCAD::EObjReco_LmICP);
  if (int rc = eng->AddObj(features_dir)) {
    std::fprintf(stderr, "AddObj failed: 0x%x\n", rc);
    return 1;
  }

  std::vector<TObjRecoResult> results;

  // silence the pipeline's unconditional cout chatter during timing
  std::ostringstream devnull;
  std::streambuf *saved = std::cout.rdbuf(devnull.rdbuf());

  int rc = eng->Recognition(rgb_img, depth_img, cam, results);  // warm
  if (rc != 0 || results.empty()) {
    std::cout.rdbuf(saved);
    std::fprintf(stderr, "warmup Recognition rc=%d results=%zu\n", rc,
                 results.size());
    return 1;
  }

  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; ++i) {
    devnull.str("");
    eng->Recognition(rgb_img, depth_img, cam, results);
  }
  auto t1 = std::chrono::steady_clock::now();
  std::cout.rdbuf(saved);

  double ms =
      std::chrono::duration<double, std::milli>(t1 - t0).count() / iters;

  std::ostringstream out;
  out << "{\"ms_per_frame\": " << ms << ", \"fps\": " << 1000.0 / ms
      << ", \"n_results\": " << results.size() << ", \"obj\": \""
      << results[0].strObjTag << "\", \"pose\": [";
  for (int i = 0; i < 16; ++i)
    out << results[0].tWorld2Cam[i] << (i == 15 ? "]" : ", ");
  out << "}";
  std::cout << out.str() << std::endl;
  CObjRecoCAD::Destroy(eng);
  return 0;
}
