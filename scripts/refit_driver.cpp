/* Coefficient-level registration parity harness (VERDICT r2 #5).
 *
 * Feeds OUR per-edge match set through the REFERENCE's own compiled
 * RANSAC + least-squares refit (src/ex6/ImageProcess.cpp:400-445,
 * getInlinerHomography :507-536, compiled unmodified) and prints the
 * 8 warp coefficients + inlier count. Comparing these against our
 * ransac_warp coefficients ON THE SAME MATCH SET isolates the residual
 * golden-image drift: if the refits agree, the drift lives in the match
 * set (SIFT sub-pixel differences); if they disagree, in solve/refit.
 *
 * The reference seeds srand(time(0)) (ImageProcess.cpp:403) — run under
 * scripts/libfaketime_stub.c (FAKETIME=<epoch> LD_PRELOAD=...) for
 * reproducible draws, and sweep FAKETIME for a coefficient envelope.
 *
 * Input: a text file of "src_x src_y dst_x dst_y" lines (floats) — the
 * warp maps src -> dst, the convention of getHomographyMat
 * (ImageProcess.cpp:455-462). Output (stdout, one line):
 *   w11 w12 w13 w21 w22 w23 w31 w32 n_inliers n_pairs
 *
 * Usage: refit_driver <pairs.txt> [lsq]
 *   default: the reference's full RANSAC + refit on the pairs
 *   lsq:     getInlinerHomography (plain CImg least squares,
 *            ImageProcess.cpp:507-536) on ALL input pairs — pass OUR
 *            RANSAC's inlier set to isolate solver-level parity from
 *            consensus-set selection
 */
#define cimg_display 0
#define private public
#include "ImageProcess.h"
#undef private

#include <cstdio>
#include <new>

int main(int argc, char **argv) {
  if (argc < 2 || argc > 3) {
    fprintf(stderr, "usage: %s <pairs.txt> [lsq]\n", argv[0]);
    return 1;
  }
  FILE *f = fopen(argv[1], "r");
  if (!f) {
    perror(argv[1]);
    return 1;
  }
  vector<ImgPair> pairs;
  float sx, sy, dx, dy;
  while (fscanf(f, "%f %f %f %f", &sx, &sy, &dx, &dy) == 4) {
    VlSiftKeypoint a, b;
    memset(&a, 0, sizeof a);
    memset(&b, 0, sizeof b);
    a.x = sx;
    a.y = sy;
    b.x = dx;
    b.y = dy;
    pairs.push_back(ImgPair(a, b));
  }
  fclose(f);
  if (pairs.size() < 4) {
    fprintf(stderr, "need >= 4 pairs, got %zu\n", pairs.size());
    return 1;
  }

  /* raw ImageProcess instance, ctor body skipped (see ex6_driver.cpp) */
  alignas(ImageProcess) static unsigned char buf[sizeof(ImageProcess)];
  ImageProcess &ip = *reinterpret_cast<ImageProcess *>(buf);

  Homography H;
  if (argc == 3 && strcmp(argv[2], "lsq") == 0) {
    vector<int> all;
    for (size_t i = 0; i < pairs.size(); i++) all.push_back((int)i);
    H = ip.getInlinerHomography(pairs, all);
  } else {
    H = ip.RANSAC(pairs);
  }
  set<int> none;
  vector<int> inl = ip.getInlinerIndex(pairs, H, none);
  printf("%.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %zu %zu\n", H.H[0][0],
         H.H[0][1], H.H[0][2], H.H[1][0], H.H[1][1], H.H[1][2], H.H[2][0],
         H.H[2][1], inl.size(), pairs.size());
  return 0;
}
