// Reference-baseline SERIES driver for ADD pass-rate parity.
//
// Like ref_bench.cpp but drives CObjRecoCAD::Recognition over a rendered
// frame sequence (make_sequence.py) and prints one JSON line per frame:
//   {"frame": i, "ms": ..., "ok": 0|1, "pose": [16 floats row-major]}
// The ADD computation against the ground-truth poses happens in
// run_parity.py (shared between both engines).
//
// Usage: ref_series <features_dir> <frames_dir> <fx> <fy> <cx> <cy> <n>

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
  if (argc < 8) {
    std::fprintf(stderr,
                 "usage: ref_series <features_dir> <frames_dir> "
                 "<fx> <fy> <cx> <cy> <n_frames>\n");
    return 2;
  }
  const std::string features_dir = argv[1];
  const std::string frames_dir = argv[2];
  const int n_frames = std::atoi(argv[7]);

  cv::setNumThreads(1);

  CObjRecoCAD *eng = CObjRecoCAD::Create(CObjRecoCAD::EObjReco_LmICP);
  if (int rc = eng->AddObj(features_dir)) {
    std::fprintf(stderr, "AddObj failed: 0x%x\n", rc);
    return 1;
  }

  TCamIntrinsicParam cam;
  cam.dFx = std::atof(argv[3]);
  cam.dFy = std::atof(argv[4]);
  cam.dCx = std::atof(argv[5]);
  cam.dCy = std::atof(argv[6]);

  std::ostringstream lines;
  for (int i = 0; i < n_frames; ++i) {
    char name[64];
    std::snprintf(name, sizeof(name), "/color_%03d.png", i);
    cv::Mat bgr = cv::imread(frames_dir + name, cv::IMREAD_COLOR);
    std::snprintf(name, sizeof(name), "/depth_%03d.png", i);
    cv::Mat depth = cv::imread(frames_dir + name, cv::IMREAD_UNCHANGED);
    if (bgr.empty() || depth.empty() || depth.type() != CV_16UC1) {
      std::fprintf(stderr, "bad frame %d\n", i);
      return 2;
    }
    cam.nWidth = bgr.cols;
    cam.nHeight = bgr.rows;
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

    std::vector<TObjRecoResult> results;
    std::ostringstream devnull;
    std::streambuf *saved = std::cout.rdbuf(devnull.rdbuf());
    auto t0 = std::chrono::steady_clock::now();
    int rc = eng->Recognition(rgb_img, depth_img, cam, results);
    auto t1 = std::chrono::steady_clock::now();
    std::cout.rdbuf(saved);
    double ms =
        std::chrono::duration<double, std::milli>(t1 - t0).count();

    lines << "{\"frame\": " << i << ", \"ms\": " << ms << ", \"ok\": "
          << ((rc == 0 && !results.empty()) ? 1 : 0) << ", \"pose\": [";
    for (int j = 0; j < 16; ++j) {
      float v = (rc == 0 && !results.empty()) ? results[0].tWorld2Cam[j]
                                              : 0.0f;
      lines << v << (j == 15 ? "]}\n" : ", ");
    }
  }
  std::cout << lines.str();
  CObjRecoCAD::Destroy(eng);
  return 0;
}
