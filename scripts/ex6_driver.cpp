/* Headless driver for the REFERENCE ex6 pipeline
 * (/root/reference/src/ex6/ImageProcess.cpp, compiled unmodified).
 *
 * The reference's only entry is the ImageProcess constructor, which calls
 * result.display("result") BEFORE result.save() (ImageProcess.cpp:14-16) —
 * with cimg_display=0 that throws CImgDisplayException and the panorama is
 * lost. This driver replicates the constructor body (alloc + readFile +
 * matching, ImageProcess.cpp:4-17) minus the display call, on an instance
 * whose members are constructed individually (the class is
 * non-virtual/base-free, every member is default-constructible).
 *
 * Combined with scripts/libfaketime_stub.c (LD_PRELOAD time() shim) the
 * reference's srand(time(0)) RANSAC (ImageProcess.cpp:403) becomes
 * reproducible, which lets scripts/golden_envelope.py measure the
 * reference's OWN run-to-run output variance — the yardstick for our
 * golden-comparison gates.
 *
 * Usage: ex6_driver <dataset_dir_with_trailing_slash> <count> <out.bmp>
 */
#define cimg_display 0
#define private public
#include "ImageProcess.h"
#undef private

#include <new>

int main(int argc, char **argv) {
  if (argc != 4) {
    fprintf(stderr, "usage: %s <dataset_dir/> <count> <out.bmp>\n", argv[0]);
    return 1;
  }
  std::string dir = argv[1];
  int n = atoi(argv[2]);

  alignas(ImageProcess) static unsigned char buf[sizeof(ImageProcess)];
  ImageProcess &ip = *reinterpret_cast<ImageProcess *>(buf);
  new (&ip.imgs) (Image *)(nullptr);
  new (&ip.picSum) int(0);
  new (&ip.result) CImg<unsigned char>();
  new (&ip.YCbCrResult) CImg<float>();
  new (&ip.balanced) CImg<unsigned char>();
  new (&ip.YCbCrBalanced) CImg<float>();
  new (&ip.forward_H) Homography();
  new (&ip.backward_H) Homography();

  /* ImageProcess::ImageProcess(string, const int), minus display/save */
  ip.imgs = new Image[n];
  ip.picSum = n;
  ip.readFile(dir, n);
  ip.matching();

  ip.result.save(argv[3]);
  printf("saved %s (%dx%d)\n", argv[3], ip.result.width(),
         ip.result.height());
  return 0;
}
