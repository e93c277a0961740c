#!/bin/sh
# Build the ground-truth VLFeat oracle tool from the ACTUAL reference C
# sources (read directly from /root/reference/vl — nothing is copied into
# this repo). Plain C, no display deps. SSE2 kernels are included for
# fidelity with the reference build; AVX is disabled (the dispatch guards
# it at runtime anyway, and the sources predate modern compilers).
#
# mathop.c MUST be compiled at -O0: the vendored copy's
# vl_get_vector_comparison_function_{f,d} (vl/mathop.c:471-488) assign
# `function` but never `return` it — undefined behavior that happens to
# work at -O0 (the value rides the return register) and becomes a wild
# jump at -O1+ (this is how the reference's own builds ran). The parity
# harness cross-checks every kd-forest pair against our exact matcher, so
# a silently-wrong distance function would be caught.
set -e
cd "$(dirname "$0")/.."
mkdir -p build
REF=/root/reference
CFLAGS="-std=c99 -I$REF -DVL_DISABLE_AVX -DVL_DISABLE_OPENMP -DVL_DISABLE_THREADS"
gcc -O0 $CFLAGS -c "$REF"/vl/mathop.c -o build/mathop.o
gcc -O2 $CFLAGS \
    scripts/vlfeat_dump.c \
    "$REF"/vl/sift.c "$REF"/vl/imopv.c "$REF"/vl/imopv_sse2.c \
    build/mathop.o "$REF"/vl/mathop_sse2.c "$REF"/vl/kdtree.c \
    "$REF"/vl/generic.c "$REF"/vl/random.c "$REF"/vl/host.c \
    -lm -o build/vlfeat_dump
echo "built build/vlfeat_dump"
