// Differential ICP oracle: run the REFERENCE's tracking pipeline
// (se_denseslam/src/tracking.cpp + preprocessing.cpp kernels, composed
// exactly like DenseSLAMSystem::tracking, DenseSLAMSystem.cpp:143-189)
// on inputs dumped from the TPU pipeline, and print the solved pose.
//
// Purpose: a bit-level arbiter for the noisy-sequence ICP gap (STATUS
// "Generalization") — if the reference loop run on OUR inputs (filtered
// depth + OUR raycast reference maps + OUR poses) reproduces OUR solve,
// the tracking port is faithful and any closed-loop difference lives in
// the inputs; if it diverges, the discrepancy is inside tracking.
//
// Build: make -C csrc track_oracle   (same flags as refbuild/)
// I/O:   argv[1] = blob from scripts/track_oracle.py; prints pose (16
//        floats row-major), tracked flag, final rmse, inlier count.

#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <vector>
#include <string>
#include <cstring>

#include <Eigen/Dense>
#include <se/commons.h>
#include <se/constant_parameters.h>
#include <se/image/image.hpp>
#include <perfstats.h>

PerfStats Stats;   // the TICK/TOCK global the reference apps define

// reference kernel definitions (read-only sources, compiled out-of-tree
// exactly like refbuild/)
#include "/root/reference/se_denseslam/src/tracking.cpp"
#include "/root/reference/se_denseslam/src/preprocessing.cpp"

static void read_f32(FILE* f, float* dst, size_t n) {
  if (fread(dst, sizeof(float), n, f) != n) {
    fprintf(stderr, "short read\n");
    exit(2);
  }
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: track_oracle <blob>\n");
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 2; }

  int32_t hw[3];
  if (fread(hw, sizeof(int32_t), 3, f) != 3) return 2;
  const int H = hw[0], W = hw[1];
  // mode 0: rebuild the pyramid with the reference kernels from depth0;
  // mode 1: read OUR pyramid (vertex+normal per level) from the blob —
  // bisects pyramid-construction differences from ICP-loop differences
  const int mode = hw[2];
  const int LEVELS = 3;
  const int iters[LEVELS] = {10, 5, 4};

  se::Image<float> depth0(W, H);
  read_f32(f, depth0.data(), (size_t)H * W);
  se::Image<Eigen::Vector3f> ref_v(W, H), ref_n(W, H);
  std::vector<float> buf((size_t)H * W * 3);
  read_f32(f, buf.data(), buf.size());
  for (int i = 0; i < H * W; ++i)
    ref_v[i] = Eigen::Vector3f(buf[3 * i], buf[3 * i + 1], buf[3 * i + 2]);
  read_f32(f, buf.data(), buf.size());
  for (int i = 0; i < H * W; ++i)
    ref_n[i] = Eigen::Vector3f(buf[3 * i], buf[3 * i + 1], buf[3 * i + 2]);
  float pm[16], rpm[16], kv[4], icp_thr;
  read_f32(f, pm, 16);
  read_f32(f, rpm, 16);
  read_f32(f, kv, 4);
  read_f32(f, &icp_thr, 1);
  fclose(f);

  Eigen::Matrix4f pose, raycast_pose;
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) {
      pose(r, c) = pm[4 * r + c];
      raycast_pose(r, c) = rpm[4 * r + c];
    }
  Eigen::Vector4f k(kv[0], kv[1], kv[2], kv[3]);

  // ---- DenseSLAMSystem::tracking, verbatim structure ----
  std::vector<se::Image<float>*> scaled;
  std::vector<se::Image<Eigen::Vector3f>*> in_v, in_n;
  for (int i = 0; i < LEVELS; ++i) {
    scaled.push_back(new se::Image<float>(W >> i, H >> i));
    in_v.push_back(new se::Image<Eigen::Vector3f>(W >> i, H >> i));
    in_n.push_back(new se::Image<Eigen::Vector3f>(W >> i, H >> i));
  }
  if (mode == 0) {
    memcpy(scaled[0]->data(), depth0.data(), sizeof(float) * H * W);
    for (int i = 1; i < LEVELS; ++i)
      halfSampleRobustImageKernel(*scaled[i], *scaled[i - 1], e_delta * 3, 1);
    for (int i = 0; i < LEVELS; ++i) {
      Eigen::Matrix4f invK = getInverseCameraMatrix(k / float(1 << i));
      depth2vertexKernel(*in_v[i], *scaled[i], invK);
      if (k.y() < 0)
        vertex2normalKernel<true>(*in_n[i], *in_v[i]);
      else
        vertex2normalKernel<false>(*in_n[i], *in_v[i]);
    }
  } else {
    FILE* g = fopen((std::string(argv[1]) + ".pyr").c_str(), "rb");
    if (!g) { perror("open pyr"); return 2; }
    for (int i = 0; i < LEVELS; ++i) {
      const int h = H >> i, w = W >> i;
      std::vector<float> tmp((size_t)h * w * 3);
      read_f32(g, tmp.data(), tmp.size());
      for (int p = 0; p < h * w; ++p)
        (*in_v[i])[p] = Eigen::Vector3f(tmp[3*p], tmp[3*p+1], tmp[3*p+2]);
      read_f32(g, tmp.data(), tmp.size());
      for (int p = 0; p < h * w; ++p)
        (*in_n[i])[p] = Eigen::Vector3f(tmp[3*p], tmp[3*p+1], tmp[3*p+2]);
    }
    fclose(g);
  }

  std::vector<TrackData> tracking_result((size_t)H * W);
  std::vector<float> reduction_output(8 * 32);
  const Eigen::Matrix4f old_pose = pose;
  const Eigen::Matrix4f projectReference =
      getCameraMatrix(k) * raycast_pose.inverse();
  const Eigen::Vector2i computation_size(W, H);

  for (int level = LEVELS - 1; level >= 0; --level) {
    Eigen::Vector2i localimagesize(W >> level, H >> level);
    for (int i = 0; i < iters[level]; ++i) {
      trackKernel(tracking_result.data(), *in_v[level], *in_n[level],
                  ref_v, ref_n, pose, projectReference,
                  dist_threshold, normal_threshold);
      reduceKernel(reduction_output.data(), tracking_result.data(),
                   computation_size, localimagesize);
      if (updatePoseKernel(pose, reduction_output.data(), icp_thr))
        break;
    }
  }
  bool tracked = checkPoseKernel(pose, old_pose, reduction_output.data(),
                                 computation_size, track_threshold);

  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c)
      printf("%.9g ", pose(r, c));
  const float err2 = reduction_output[0], cnt = reduction_output[28];
  printf("\n%d %.9g %.0f\n", tracked ? 1 : 0,
         std::sqrt(err2 / std::max(cnt, 1.f)), cnt);
  return 0;
}
