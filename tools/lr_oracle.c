/* Test oracle: wraps the reference loop-restoration kernels (Wiener
 * convolve-add-src and self-guided restoration) so unit tests can check
 * our implementation bit-exactly.  Links against the reference libaom.a;
 * not part of the framework. */
#include <stdint.h>
#include <string.h>
#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "av1/common/convolve.h"
#include "av1/common/restoration.h"

void oracle_sgr_tables(int32_t *x_by_xplus1 /*256*/,
                       int32_t *one_by_x /*25*/, int32_t *params /*16*4*/) {
  memcpy(x_by_xplus1, av1_x_by_xplus1, 256 * sizeof(int32_t));
  memcpy(one_by_x, av1_one_by_x, 25 * sizeof(int32_t));
  for (int i = 0; i < 16; i++) {
    params[4 * i + 0] = av1_sgr_params[i].r[0];
    params[4 * i + 1] = av1_sgr_params[i].r[1];
    params[4 * i + 2] = av1_sgr_params[i].s[0];
    params[4 * i + 3] = av1_sgr_params[i].s[1];
  }
}

void oracle_wiener_stripe(const uint8_t *src, int src_stride, uint8_t *dst,
                          int dst_stride, const int16_t *hfilter /*8*/,
                          const int16_t *vfilter /*8*/, int w, int h) {
  const ConvolveParams conv_params = get_conv_params_wiener(8);
  av1_wiener_convolve_add_src_c(src, src_stride, dst, dst_stride, hfilter, 16,
                                vfilter, 16, w, h, &conv_params);
}

void oracle_sgr(const uint8_t *dat, int w, int h, int stride, int eps,
                const int *xqd, uint8_t *dst, int dst_stride,
                int32_t *tmpbuf) {
  av1_apply_selfguided_restoration_c(dat, w, h, stride, eps, xqd, dst,
                                     dst_stride, tmpbuf, 8, 0);
}

/* Full-unit oracle: run av1_loop_restoration_filter_unit on caller-supplied
 * data + stripe boundary buffers. */
void oracle_lr_unit(int v_start, int v_end, int h_start, int h_end,
                    int rtype, const int16_t *hfilter, const int16_t *vfilter,
                    int ep, const int *xqd,
                    uint8_t *above, uint8_t *below, int bdry_stride,
                    int tile_top, int tile_bottom, int tile_left,
                    int tile_right, int ss_x, int ss_y, uint8_t *data8,
                    int stride, uint8_t *dst8, int dst_stride,
                    int32_t *tmpbuf, int optimized) {
  RestorationTileLimits limits;
  limits.v_start = v_start;
  limits.v_end = v_end;
  limits.h_start = h_start;
  limits.h_end = h_end;
  RestorationUnitInfo rui;
  memset(&rui, 0, sizeof(rui));
  rui.restoration_type = (RestorationType)rtype;
  if (rtype == RESTORE_WIENER) {
    memcpy(rui.wiener_info.hfilter, hfilter, 8 * sizeof(int16_t));
    memcpy(rui.wiener_info.vfilter, vfilter, 8 * sizeof(int16_t));
  } else if (rtype == RESTORE_SGRPROJ) {
    rui.sgrproj_info.ep = ep;
    rui.sgrproj_info.xqd[0] = xqd[0];
    rui.sgrproj_info.xqd[1] = xqd[1];
  }
  RestorationStripeBoundaries rsb;
  rsb.stripe_boundary_above = above;
  rsb.stripe_boundary_below = below;
  rsb.stripe_boundary_stride = bdry_stride;
  static RestorationLineBuffers rlbs;
  PixelRect tile_rect;
  tile_rect.top = tile_top;
  tile_rect.bottom = tile_bottom;
  tile_rect.left = tile_left;
  tile_rect.right = tile_right;
  av1_loop_restoration_filter_unit(&limits, &rui, &rsb, &rlbs, &tile_rect, 0,
                                   ss_x, ss_y, 0, 8, data8, stride, dst8,
                                   dst_stride, tmpbuf, optimized);
}
