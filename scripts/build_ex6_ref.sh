#!/bin/sh
# Build the REFERENCE ex6 pipeline (src/ex6/ImageProcess.cpp, unmodified)
# into a headless binary, plus the LD_PRELOAD time() shim that makes its
# srand(time(0)) RANSAC reproducible. Used by scripts/golden_envelope.py to
# measure the reference's own run-to-run output variance — the calibration
# for our golden-comparison gates.
#
# The driver (scripts/ex6_driver.cpp) replicates the ImageProcess ctor body
# minus the result.display() call that aborts headless builds
# (ImageProcess.cpp:14 throws CImgDisplayException before :16 ever saves).
#
# vl/mathop.c must build at -O0: the vendored VLFeat's
# vl_get_vector_comparison_function_{f,d} never `return` their result
# (mathop.c:471-488) — UB that works at -O0 and becomes a wild jump at -O1+.
set -e
cd "$(dirname "$0")/.."
mkdir -p build/ex6
REF=/root/reference/src/ex6
CC="gcc -std=c99 -I$REF -DVL_DISABLE_AVX -DVL_DISABLE_OPENMP -DVL_DISABLE_THREADS"
CXX="g++ -O2 -std=c++11 -Dcimg_display=0 -I$REF"
$CC -O0 -c $REF/vl/mathop.c -o build/ex6/mathop.o
for f in sift imopv imopv_sse2 mathop_sse2 kdtree generic random host; do
  $CC -O2 -c $REF/vl/$f.c -o build/ex6/$f.o
done
for f in ImageProcess Projection equalization; do
  $CXX -c $REF/$f.cpp -o build/ex6/$f.o
done
$CXX -c scripts/ex6_driver.cpp -o build/ex6/driver.o
$CXX -c scripts/refit_driver.cpp -o build/ex6/refit_driver.o
LIBS="build/ex6/ImageProcess.o build/ex6/Projection.o \
    build/ex6/equalization.o build/ex6/sift.o build/ex6/imopv.o \
    build/ex6/imopv_sse2.o build/ex6/mathop.o build/ex6/mathop_sse2.o \
    build/ex6/kdtree.o build/ex6/generic.o build/ex6/random.o \
    build/ex6/host.o"
g++ build/ex6/driver.o $LIBS -lm -lpthread -o build/ex6_ref
g++ build/ex6/refit_driver.o $LIBS -lm -lpthread -o build/refit_ref
gcc -O2 -shared -fPIC scripts/libfaketime_stub.c -o build/libfaketime.so
echo "built build/ex6_ref + build/refit_ref + build/libfaketime.so"
