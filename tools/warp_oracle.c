/* Test oracle: wraps the reference warp_plane so unit tests can check our
 * warp_affine bit-exactly.  Links against the reference libaom.a; not part
 * of the framework. */
#include <stdint.h>
#include <string.h>
#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "av1/common/mv.h"
#include "av1/common/convolve.h"
#include "av1/common/warped_motion.h"

void oracle_warp(const int32_t *mat, const uint8_t *ref, int width,
                 int height, int stride, uint8_t *pred, int p_col, int p_row,
                 int p_width, int p_height, int p_stride, int ss_x, int ss_y,
                 int16_t alpha, int16_t beta, int16_t gamma, int16_t delta) {
  ConvolveParams cp;
  memset(&cp, 0, sizeof(cp));
  cp.round_0 = 3;
  cp.round_1 = 11;
  cp.is_compound = 0;
  cp.do_average = 0;
  av1_warp_affine_c(mat, ref, width, height, stride, pred, p_col, p_row,
                    p_width, p_height, p_stride, ss_x, ss_y, &cp, alpha, beta,
                    gamma, delta);
}
