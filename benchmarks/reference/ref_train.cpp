// Training-throughput baseline for the UNMODIFIED reference: time
// Detector::addTemplate (getDefaultLINEMOD) over the dumped training
// views (dump_train_views.py), exactly the linemod_train loop
// (/root/reference/test/linemod_train.cpp:40-86) minus file IO.
//
// Usage: ref_train <views_dir> <n_views> [repeats]
// Prints one JSON line: {"n", "added", "secs", "templates_per_s"}.
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "linemod.hpp"

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <views_dir> <n_views> [repeats]\n", argv[0]);
    return 1;
  }
  std::string dir = argv[1];
  int n = atoi(argv[2]);
  int repeats = argc > 3 ? atoi(argv[3]) : 3;

  std::vector<cv::Mat> colors, depths, masks;
  for (int i = 0; i < n; i++) {
    char name[64];
    snprintf(name, sizeof(name), "/color_%03d.png", i);
    cv::Mat c = cv::imread(dir + name);
    snprintf(name, sizeof(name), "/depth_%03d.png", i);
    cv::Mat d = cv::imread(dir + name, cv::IMREAD_UNCHANGED);
    snprintf(name, sizeof(name), "/mask_%03d.png", i);
    cv::Mat m = cv::imread(dir + name, cv::IMREAD_GRAYSCALE);
    if (c.empty() || d.empty() || m.empty()) {
      fprintf(stderr, "missing view %d under %s\n", i, dir.c_str());
      return 1;
    }
    colors.push_back(c);
    depths.push_back(d);
    masks.push_back(m > 0);
  }

  float pose[13] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 700.0f};
  double best = 1e30;
  int added = 0;
  for (int rep = 0; rep < repeats; rep++) {
    cv::Ptr<cup_linemod::Detector> det = cup_linemod::getDefaultLINEMOD();
    auto t0 = std::chrono::steady_clock::now();
    added = 0;
    for (int i = 0; i < n; i++) {
      std::vector<cv::Mat> sources;
      sources.push_back(colors[i]);
      sources.push_back(depths[i]);
      cv::Rect bb;
      int tid = det->addTemplate(sources, "obj", masks[i], pose, &bb);
      if (tid >= 0) added++;
    }
    double secs = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0)
                      .count();
    if (secs < best) best = secs;
  }
  printf("{\"n\": %d, \"added\": %d, \"secs\": %.4f, "
         "\"templates_per_s\": %.2f}\n",
         n, added, best, added / best);
  return 0;
}
