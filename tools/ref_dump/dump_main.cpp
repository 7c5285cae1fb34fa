// Reference-dump driver: links against the UNMODIFIED reference
// sift.cpp (canhld94/SIFT-GPU, built out-of-tree by build.sh) and
// dumps its keypoints, descriptors, and ratio-test matches to text /
// raw files. These dumps are the golden data for the >=0.95
// keypoint/match recall acceptance gate (BASELINE.json) measured by
// sift_tpu/eval.py.
//
// This file is OUR code (not copied from the reference); it
// reproduces the demo driver's semantics (reference src/main.cpp:
// scene resized to 960x960, RGB2GRAY on BGR data, BFMatcher NORM_L1
// knn k=2, Lowe ratio 0.86) without the GUI.

#include "sift.hpp"
#include <opencv2/features2d.hpp>
#include <fstream>
#include <string>
#include <vector>

static bool load_gray(const char *path, cv::Mat &gray, bool resize960) {
  cv::Mat img = cv::imread(path);
  if (img.empty()) return false;
  if (resize960) cv::resize(img, img, cv::Size(960, 960));
  // reference reads BGR but converts with COLOR_RGB2GRAY
  // (src/main.cpp:84): R/B luma weights are swapped. Reproduce it.
  cv::cvtColor(img, gray, cv::COLOR_RGB2GRAY);
  gray.convertTo(gray, CV_32FC1);
  return true;
}

static void dump_features(const std::string &outdir, const std::string &tag,
                          const std::vector<cv::KeyPoint> &kps,
                          const cv::Mat &desc) {
  std::ofstream kf(outdir + "/kp_" + tag + ".txt");
  for (const auto &k : kps)
    kf << k.pt.x << " " << k.pt.y << " " << k.size << " " << k.angle
       << " " << k.octave << " " << k.response << "\n";
  std::ofstream df(outdir + "/desc_" + tag + ".f32",
                   std::ios::binary);
  df.write(reinterpret_cast<const char *>(desc.ptr<float>(0)),
           static_cast<std::streamsize>(desc.total() * sizeof(float)));
  std::ofstream sf(outdir + "/desc_" + tag + ".shape");
  sf << desc.rows << " " << desc.cols << "\n";
}

int main(int argc, char **argv) {
  if (argc < 5) {
    fprintf(stderr,
            "usage: %s <scene> <object> <outdir> <resize_scene 0|1>\n",
            argv[0]);
    return 2;
  }
  cv::Mat gray_scene, gray_obj;
  bool resize_scene = std::stoi(argv[4]) != 0;
  if (!load_gray(argv[1], gray_scene, resize_scene) ||
      !load_gray(argv[2], gray_obj, false)) {
    fprintf(stderr, "image read failed\n");
    return 1;
  }
  std::string outdir = argv[3];

  std::vector<cv::KeyPoint> kp_scene, kp_obj;
  cv::Mat desc_scene, desc_obj;
  SIFT_NCL(gray_scene, kp_scene, desc_scene);
  SIFT_NCL(gray_obj, kp_obj, desc_obj);
  dump_features(outdir, "scene", kp_scene, desc_scene);
  dump_features(outdir, "object", kp_obj, desc_obj);

  // demo matching semantics: query=object, train=scene, L1 knn k=2,
  // ratio 0.86 (reference src/main.cpp:25-40)
  cv::BFMatcher matcher(cv::NORM_L1);
  std::vector<std::vector<cv::DMatch>> knn;
  matcher.knnMatch(desc_obj, desc_scene, knn, 2);
  std::ofstream mf(outdir + "/matches.txt");
  for (const auto &pair : knn) {
    if (pair.size() < 2) continue;
    const cv::DMatch &m = pair[0], &n = pair[1];
    int good = m.distance <= 0.86f * n.distance ? 1 : 0;
    mf << m.queryIdx << " " << m.trainIdx << " " << m.distance << " "
       << n.distance << " " << good << "\n";
  }
  printf("scene_kpts=%zu object_kpts=%zu\n", kp_scene.size(),
         kp_obj.size());
  return 0;
}
