// Reference-format serialization oracle: load a map binary with the
// REFERENCE's own Octree<T>::load (octree.hpp:916-950), print topology +
// content statistics, and re-save it with Octree<T>::save — so the repo's
// io/serialise.py save_se/load_se can be verified against the reference's
// actual parser/writer instead of against a transcription of it.
//
// Build:  make -C csrc se_bin_oracle          (SDF + OFusion variants)
// Usage:  se_bin_oracle_<field> <in.bin> [out.bin]
// Prints: one JSON line {size, dim, nodes, blocks, sum_x, sum_y, nnz_x}
//
// Like csrc/track_oracle.cpp this #includes the read-only reference
// sources out-of-tree; it is a test harness, not shipped framework code.

#include <cstdio>
#include <cstdint>
#include <cmath>
#include <string>

#include <Eigen/Dense>
#include <se/octree.hpp>
#include <se/volume_traits.hpp>

#ifndef SE_FIELD_TYPE
#define SE_FIELD_TYPE SDF
#endif
typedef SE_FIELD_TYPE FieldType;

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: se_bin_oracle <in.bin> [out.bin]\n");
    return 2;
  }
  se::Octree<FieldType> tree;
  tree.load(argv[1]);

  // content checksums over the block buffer
  std::vector<se::VoxelBlock<FieldType>*> blocks;
  tree.getBlockList(blocks, false);
  double sum_x = 0.0, sum_y = 0.0;
  long long nnz_x = 0;
  for (auto* b : blocks) {
    auto* raw = b->getBlockRawPtr();
    for (int i = 0; i < 512; ++i) {
      sum_x += raw[i].x;
      sum_y += (double)raw[i].y;
      nnz_x += raw[i].x != 0.f;
    }
  }
  std::printf(
      "{\"size\": %d, \"dim\": %g, \"blocks\": %zu, \"sum_x\": %.6f, "
      "\"sum_y\": %.6f, \"nnz_x\": %lld}\n",
      tree.size(), tree.dim(), blocks.size(), sum_x, sum_y, nnz_x);

  if (argc > 2) tree.save(argv[2]);
  return 0;
}
