/* LD_PRELOAD shim: time() returns $FAKE_TIME (constant), making the
 * reference ex6 pipeline's srand(time(0)) (ImageProcess.cpp:403)
 * reproducible so scripts/golden_envelope.py can measure the reference's
 * seed-to-seed output variance.
 *
 * Build: gcc -O2 -shared -fPIC scripts/libfaketime_stub.c -o build/libfaketime.so
 */
#include <stdlib.h>
#include <time.h>

time_t time(time_t *tloc) {
  const char *v = getenv("FAKE_TIME");
  time_t t = v ? (time_t)atoll(v) : (time_t)0;
  if (tloc) *tloc = t;
  return t;
}
