/* Test oracle: wraps the reference single-ref convolve paths so unit tests
 * can check our numpy/JAX implementations bit-exactly.  Links against the
 * oracle libaom.a build; not part of the framework. */
#include <stdint.h>
#include <string.h>

#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "av1/common/filter.h"
#include "av1/common/convolve.h"

void oracle_convolve_sr(const uint8_t *src, int src_stride, uint8_t *dst,
                        int dst_stride, int w, int h, int filt_x, int filt_y,
                        int subpel_x, int subpel_y) {
  const InterpFilterParams *px =
      av1_get_interp_filter_params_with_block_size((InterpFilter)filt_x, w);
  const InterpFilterParams *py =
      av1_get_interp_filter_params_with_block_size((InterpFilter)filt_y, h);
  ConvolveParams cp = get_conv_params_no_round(0, 0, NULL, 0, 0, 8);
  if (subpel_x == 0 && subpel_y == 0) {
    for (int y = 0; y < h; y++)
      memcpy(dst + y * dst_stride, src + y * src_stride, w);
  } else if (subpel_y == 0) {
    av1_convolve_x_sr_c(src, src_stride, dst, dst_stride, w, h, px, subpel_x,
                        &cp);
  } else if (subpel_x == 0) {
    av1_convolve_y_sr_c(src, src_stride, dst, dst_stride, w, h, py, subpel_y);
  } else {
    av1_convolve_2d_sr_c(src, src_stride, dst, dst_stride, w, h, px, py,
                         subpel_x, subpel_y, &cp);
  }
}
