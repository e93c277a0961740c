#!/bin/sh
# Build the ground-truth VLFeat oracle tool from the ACTUAL reference C
# sources (read directly from /root/reference/vl — nothing is copied into
# this repo). Plain C, no display deps. SSE2 kernels are included for
# fidelity with the reference build; AVX is disabled (the dispatch guards
# it at runtime anyway, and the sources predate modern compilers).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
REF=/root/reference
gcc -O2 -std=c99 -I"$REF" \
    -DVL_DISABLE_AVX -DVL_DISABLE_OPENMP -DVL_DISABLE_THREADS \
    scripts/vlfeat_dump.c \
    "$REF"/vl/sift.c "$REF"/vl/imopv.c "$REF"/vl/imopv_sse2.c \
    "$REF"/vl/mathop.c "$REF"/vl/mathop_sse2.c "$REF"/vl/kdtree.c \
    "$REF"/vl/generic.c "$REF"/vl/random.c "$REF"/vl/host.c \
    -lm -o build/vlfeat_dump
echo "built build/vlfeat_dump"
