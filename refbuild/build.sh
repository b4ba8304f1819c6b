#!/bin/bash
# Rebuild the reference CPU benchmark binaries out-of-tree (read-only
# reference sources; tensorflow's vendored Eigen; the sophus SE3 shim).
# Round-2 recipe reconstructed in round 4 (the original cmake run was
# never committed — only its gitignored products).  DenseSLAMSystem.cpp
# #includes preprocessing/tracking/rendering.cpp itself.
set -e
REF=/root/reference
OUT=/root/repo/refbuild/build/se_apps
mkdir -p "$OUT"
INC="-I$REF/se_denseslam/include -I$REF/se_core/include -I$REF/se_shared/. -I$REF/se_shared/thirparty -I$REF/se_tools/. -I$REF/se_apps/include -I/root/repo/refbuild -I/opt/venv/lib/python3.12/site-packages/tensorflow/include"
SRC="$REF/se_apps/src/benchmark.cpp $REF/se_apps/src/reader.cpp $REF/se_apps/src/PowerMonitor.cpp $REF/se_denseslam/src/DenseSLAMSystem.cpp $REF/se_tools/lodepng.cpp"
FLAGS="-U__AVX512FP16__ -O3 -DNDEBUG -std=c++14 -march=native -Wno-unknown-pragmas -w -fopenmp"
for f in SDF OFusion; do
  low=$(echo $f | tr A-Z a-z)
  g++ $FLAGS -DSE_FIELD_TYPE=$f $INC $SRC -o $OUT/se-denseslam-$low-benchmark
done
echo "built: $(ls $OUT)"
