/* Test oracle: wraps the reference CDEF direction search + filter kernels
 * so unit tests can check our implementation bit-exactly.  Links against
 * the reference cdef_block.c; not part of the framework. */
#include <stdint.h>
#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "av1/common/cdef_block.h"

int oracle_cdef_find_dir(const uint16_t *img, int stride, int32_t *var,
                         int coeff_shift) {
  return cdef_find_dir_c(img, stride, var, coeff_shift);
}

void oracle_cdef_filter(uint8_t *dst, int dstride, const uint16_t *in,
                        int pri, int sec, int dir, int pdamp, int sdamp,
                        int bw, int bh) {
  int idx = (sec == 0) | ((pri == 0) << 1);
  switch (idx) {
    case 0: cdef_filter_8_0_c(dst, dstride, in, pri, sec, dir, pdamp, sdamp, 0, bw, bh); break;
    case 1: cdef_filter_8_1_c(dst, dstride, in, pri, sec, dir, pdamp, sdamp, 0, bw, bh); break;
    case 2: cdef_filter_8_2_c(dst, dstride, in, pri, sec, dir, pdamp, sdamp, 0, bw, bh); break;
    default: cdef_filter_8_3_c(dst, dstride, in, pri, sec, dir, pdamp, sdamp, 0, bw, bh); break;
  }
}
