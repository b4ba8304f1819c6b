// Differential FUSION oracle: run the REFERENCE's allocation + integration
// (DenseSLAMSystem::integration, DenseSLAMSystem.cpp:206-268) with
// externally supplied ground-truth poses on raw depth frames, and save the
// resulting map in the reference binary format — the track_oracle move
// applied to the map (VERDICT r3 item 2).  With identical poses on both
// sides, a per-voxel field comparison (scripts/fuse_oracle.py) isolates
// fusion/allocation differences from tracking feedback.
//
// Build:  make -C csrc fuse_oracle      (SDF + OFusion variants)
// Usage:  fuse_oracle_<field> <blob> <out.bin> <mu>
// Blob:   int32 H, W, N; float k[4]; then per frame:
//         float pose[16] row-major camera-to-world (volume frame, metres),
//         uint16 depth[H*W] millimetres.
//
// Like csrc/track_oracle.cpp this #includes the read-only reference
// sources out-of-tree; it is a test harness, not shipped framework code.

#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <vector>

#include <Eigen/Dense>
#include <se/DenseSLAMSystem.h>
#include <perfstats.h>

PerfStats Stats;

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: fuse_oracle <blob> <out.bin> <mu> "
                         "[size] [dim]\n");
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 2; }
  const float mu = std::atof(argv[3]);
  const int size = argc > 4 ? std::atoi(argv[4]) : 256;
  const float dim = argc > 5 ? std::atof(argv[5]) : 4.8f;

  int32_t hw[3];
  if (fread(hw, sizeof(int32_t), 3, f) != 3) return 2;
  const int H = hw[0], W = hw[1], N = hw[2];
  float k4[4];
  if (fread(k4, sizeof(float), 4, f) != 4) return 2;
  const Eigen::Vector4f k(k4[0], k4[1], k4[2], k4[3]);

  Configuration config;
  config.compute_size_ratio = 1;
  config.integration_rate = 1;
  config.tracking_rate = 1;
  config.volume_resolution = Eigen::Vector3i::Constant(size);
  config.volume_size = Eigen::Vector3f::Constant(dim);
  config.initial_pos_factor = Eigen::Vector3f::Zero();
  config.pyramid = {10, 5, 4};
  config.mu = mu;
  config.groundtruth_file = "";

  // init_pose zero: the blob's poses are absolute in the volume frame
  // (setPose adds init_pose_, DenseSLAMSystem.h:353-357)
  const Eigen::Vector3f init_pose = Eigen::Vector3f::Zero();
  DenseSLAMSystem pipeline(Eigen::Vector2i(W, H),
                           config.volume_resolution, config.volume_size,
                           init_pose, config.pyramid, config);

  std::vector<float> pose(16);
  std::vector<uint16_t> depth((size_t)H * W);
  for (int frame = 0; frame < N; ++frame) {
    if (fread(pose.data(), sizeof(float), 16, f) != 16) return 2;
    if (fread(depth.data(), sizeof(uint16_t), depth.size(), f)
        != depth.size()) return 2;
    Eigen::Matrix4f P;
    for (int r = 0; r < 4; ++r)
      for (int c = 0; c < 4; ++c) P(r, c) = pose[4 * r + c];
    pipeline.preprocessing(depth.data(), Eigen::Vector2i(W, H), false);
    pipeline.setPose(P);
    pipeline.integration(k, 1, mu, frame);
  }
  fclose(f);

  std::shared_ptr<se::Octree<FieldType> > map_ptr;
  pipeline.getMap(map_ptr);
  map_ptr->save(argv[2]);
  std::printf("{\"frames\": %d, \"saved\": \"%s\"}\n", N, argv[2]);
  return 0;
}
