#!/bin/bash
# Build the reference TWILIGHT CPU binary out-of-tree (golden-output generation).
# Uses a minimal boost shim since boost is not installed in this image.
set -e
SRC=/root/reference/src
OUT=${1:-/root/repo/.refbuild}
SHIM=/root/repo/tools/refbuild/include
VER=/root/repo/tools/refbuild
mkdir -p $OUT
g++ -O3 -std=c++17 -march=native -DTALCO_SIMD \
  -Wno-sign-compare -Wno-unused-variable -Wno-unused-result \
  -I$SHIM -I$VER -I$SRC \
  $SRC/twilight-main.cpp $SRC/phylogeny.cpp $SRC/tree.cpp $SRC/partitionInfo.cpp \
  $SRC/node.cpp $SRC/scoring-matrix.cpp $SRC/io.cpp $SRC/option.cpp \
  $SRC/sequencedb.cpp $SRC/progressive.cpp $SRC/alignment-cpu.cpp \
  $SRC/alignment-helper.cpp $SRC/TALCO-XDrop.cpp \
  -ltbb -lz -o $OUT/twilight_ref
echo "built $OUT/twilight_ref"
