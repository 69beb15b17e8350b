#!/bin/bash
# Build the reference TWILIGHT CPU binary out-of-tree (golden-output generation).
# Uses a minimal boost shim since boost is not installed in this image.
#
# -ffp-contract=off pins IEEE float semantics: gcc at -O3 -march=native
# otherwise fuses a*b+c into FMAs in the similarity/gap sums, making the
# reference's alignment output depend on the compiler's contraction choices
# (the same source yields different MSAs on different ISAs). The canonical
# goldens are the portable, contraction-free semantics, which all four of
# our kernel implementations reproduce bit-for-bit.
set -e
SRC=/root/reference/src
OUT=${1:-/root/repo/.refbuild}
SHIM=/root/repo/tools/refbuild/include
VER=/root/repo/tools/refbuild
mkdir -p $OUT
g++ -O3 -std=c++17 -march=native -ffp-contract=off -DTALCO_SIMD \
  -Wno-sign-compare -Wno-unused-variable -Wno-unused-result \
  -I$SHIM -I$VER -I$SRC \
  $SRC/twilight-main.cpp $SRC/phylogeny.cpp $SRC/tree.cpp $SRC/partitionInfo.cpp \
  $SRC/node.cpp $SRC/scoring-matrix.cpp $SRC/io.cpp $SRC/option.cpp \
  $SRC/sequencedb.cpp $SRC/progressive.cpp $SRC/alignment-cpu.cpp \
  $SRC/alignment-helper.cpp $SRC/TALCO-XDrop.cpp \
  -ltbb -lz -o $OUT/twilight_ref
echo "built $OUT/twilight_ref"
