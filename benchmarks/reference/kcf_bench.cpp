// KCF/FHOG parity driver against the UNMODIFIED reference tracker
// (kcf_tracker/fhog.cpp, kcftracker.cpp).
//
// Modes:
//   kcf_bench fhog <patch.png> <cell_size>
//     -> JSON {"sizeX":..,"sizeY":..,"feats":[31-ch FHOG after
//        getFeatureMaps + normalizeAndTruncate(0.2) + PCAFeatureMaps,
//        row-major y,x,ch]}
//   kcf_bench track <frames_dir> <n> <x> <y> <w> <h> <hog> <fixed> <multi> <lab>
//     -> JSON lines {"frame":i,"roi":[x,y,w,h]} for color_%03d.png,
//        KCFTracker::init on frame 0 then update per frame.

#include <chrono>
#include <cstdio>
#include <iostream>
#include <sstream>
#include <string>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/core/core_c.h>

// kcftracker.hpp (pulling the full OpenCV headers) must come BEFORE
// fhog.hpp, whose `#define EPS` clashes with cv::TermCriteria::EPS.
#include "kcftracker.hpp"
#include "fhog.hpp"

static int run_fhog(const char *path, int cell) {
  cv::Mat img = cv::imread(path, cv::IMREAD_COLOR);
  if (img.empty()) {
    std::fprintf(stderr, "bad patch\n");
    return 2;
  }
  cv::Mat imgf;
  img.convertTo(imgf, CV_32F, 1.0 / 255.0);  // KCF feeds float [0,1]*? no:
  // KCFTracker::getFeatures passes the u8 BGR subwindow directly.
  IplImage zz = cvIplImage(img);
  CvLSVMFeatureMapCaskade *map = nullptr;
  getFeatureMaps(&zz, cell, &map);
  normalizeAndTruncate(map, 0.2f);
  PCAFeatureMaps(map);
  std::ostringstream out;
  out << "{\"sizeX\": " << map->sizeX << ", \"sizeY\": " << map->sizeY
      << ", \"numFeatures\": " << map->numFeatures << ", \"feats\": [";
  const int n = map->sizeX * map->sizeY * map->numFeatures;
  for (int i = 0; i < n; ++i)
    out << map->map[i] << (i == n - 1 ? "]" : ", ");
  out << "}";
  std::cout << out.str() << std::endl;
  freeFeatureMapObject(&map);
  return 0;
}

static int run_track(int argc, char **argv) {
  const std::string dir = argv[2];
  const int n = std::atoi(argv[3]);
  const float x = std::atof(argv[4]), y = std::atof(argv[5]);
  const float w = std::atof(argv[6]), h = std::atof(argv[7]);
  const bool hog = std::atoi(argv[8]), fixedw = std::atoi(argv[9]);
  const bool multi = std::atoi(argv[10]), lab = std::atoi(argv[11]);
  KCFTracker tracker(hog, fixedw, multi, lab);
  std::ostringstream out;
  double total_ms = 0.0;
  for (int i = 0; i < n; ++i) {
    char name[64];
    std::snprintf(name, sizeof(name), "/color_%03d.png", i);
    cv::Mat frame = cv::imread(dir + name, cv::IMREAD_COLOR);
    if (frame.empty()) {
      std::fprintf(stderr, "bad frame %d\n", i);
      return 2;
    }
    cv::Rect_<float> roi;
    if (i == 0) {
      tracker.init(cv::Rect_<float>(x, y, w, h), frame);
      roi = cv::Rect_<float>(x, y, w, h);
    } else {
      auto t0 = std::chrono::steady_clock::now();
      roi = tracker.update(frame);
      auto t1 = std::chrono::steady_clock::now();
      total_ms +=
          std::chrono::duration<double, std::milli>(t1 - t0).count();
    }
    out << "{\"frame\": " << i << ", \"roi\": [" << roi.x << ", " << roi.y
        << ", " << roi.width << ", " << roi.height << "]}\n";
  }
  out << "{\"update_ms_per_frame\": " << total_ms / (n - 1) << "}\n";
  std::cout << out.str();
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 4 && std::string(argv[1]) == "fhog")
    return run_fhog(argv[2], std::atoi(argv[3]));
  if (argc >= 12 && std::string(argv[1]) == "track") return run_track(argc, argv);
  std::fprintf(stderr,
               "usage: kcf_bench fhog <patch.png> <cell>\n"
               "       kcf_bench track <dir> <n> <x> <y> <w> <h> "
               "<hog> <fixed> <multi> <lab>\n");
  return 2;
}
