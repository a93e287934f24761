/* Dump the AV1 *normative constant tables* (default CDFs, scan orders,
 * quantizer lookups) from the reference build into a flat binary file,
 * converted to data/av1_tables.npz by tools/convert_tables.py.
 *
 * These are spec-defined data (AV1 spec §9 default CDF tables etc.), not
 * code; the framework loads them as arrays.  Test scaffolding only.
 */
#include <stdio.h>
#include <stdint.h>
#include <string.h>

#include "av1/common/entropy.h"
#include "av1/common/entropymode.h"
#include "av1/common/scan.h"
#include "av1/common/quant_common.h"
#include "av1/common/common_data.h"
#include "av1/common/av1_common_int.h"
/* static const coefficient CDF tables, banded by qindex */
#include "av1/common/token_cdfs.h"

static FILE *g_out;

static void dump_u16(const char *name, const void *data, size_t n_elems) {
  uint32_t len = (uint32_t)strlen(name);
  uint32_t n = (uint32_t)n_elems;
  uint32_t tag = 0; /* u16 */
  fwrite(&len, 4, 1, g_out);
  fwrite(name, 1, len, g_out);
  fwrite(&tag, 4, 1, g_out);
  fwrite(&n, 4, 1, g_out);
  fwrite(data, 2, n_elems, g_out);
}

static void dump_i16(const char *name, const void *data, size_t n_elems) {
  uint32_t len = (uint32_t)strlen(name);
  uint32_t n = (uint32_t)n_elems;
  uint32_t tag = 1; /* i16 */
  fwrite(&len, 4, 1, g_out);
  fwrite(name, 1, len, g_out);
  fwrite(&tag, 4, 1, g_out);
  fwrite(&n, 4, 1, g_out);
  fwrite(data, 2, n_elems, g_out);
}

#define DUMP(field) dump_u16(#field, fc.field, sizeof(fc.field) / 2)
#define DUMPT(tbl) dump_u16(#tbl, tbl, sizeof(tbl) / 2)

int main(void) {
  g_out = fopen("av1_tables.bin", "wb");
  if (!g_out) return 1;

  FRAME_CONTEXT fc;
  static AV1_COMMON cm; /* only cm.fc is touched by av1_init_mv_probs */
  memset(&fc, 0, sizeof(fc));
  av1_init_mode_probs(&fc);
  cm.fc = &fc;
  av1_init_mv_probs(&cm);

  DUMP(newmv_cdf); DUMP(zeromv_cdf); DUMP(refmv_cdf); DUMP(drl_cdf);
  DUMP(inter_compound_mode_cdf); DUMP(compound_type_cdf); DUMP(wedge_idx_cdf);
  DUMP(interintra_cdf); DUMP(wedge_interintra_cdf); DUMP(interintra_mode_cdf);
  DUMP(motion_mode_cdf); DUMP(obmc_cdf);
  DUMP(palette_y_size_cdf); DUMP(palette_uv_size_cdf);
  DUMP(palette_y_color_index_cdf); DUMP(palette_uv_color_index_cdf);
  DUMP(palette_y_mode_cdf); DUMP(palette_uv_mode_cdf);
  DUMP(comp_inter_cdf); DUMP(single_ref_cdf); DUMP(comp_ref_type_cdf);
  DUMP(uni_comp_ref_cdf); DUMP(comp_ref_cdf); DUMP(comp_bwdref_cdf);
  DUMP(txfm_partition_cdf); DUMP(compound_index_cdf); DUMP(comp_group_idx_cdf);
  DUMP(skip_mode_cdfs); DUMP(skip_txfm_cdfs); DUMP(intra_inter_cdf);
  dump_u16("nmv_joints_cdf", fc.nmvc.joints_cdf, sizeof(fc.nmvc.joints_cdf) / 2);
  for (int c = 0; c < 2; c++) {
    char nm[64];
    const nmv_component *mc = &fc.nmvc.comps[c];
#define DUMPMV(f) do { \
    snprintf(nm, sizeof(nm), "nmv_comp%d_%s", c, #f); \
    dump_u16(nm, mc->f, sizeof(mc->f) / 2); } while (0)
    DUMPMV(classes_cdf); DUMPMV(class0_fp_cdf); DUMPMV(fp_cdf);
    DUMPMV(sign_cdf); DUMPMV(class0_hp_cdf); DUMPMV(hp_cdf);
    DUMPMV(class0_cdf); DUMPMV(bits_cdf);
#undef DUMPMV
  }
  DUMP(intrabc_cdf);
  dump_u16("seg_pred_cdf", fc.seg.pred_cdf, sizeof(fc.seg.pred_cdf) / 2);
  dump_u16("seg_spatial_pred_cdf", fc.seg.spatial_pred_seg_cdf,
           sizeof(fc.seg.spatial_pred_seg_cdf) / 2);
  DUMP(filter_intra_cdfs); DUMP(filter_intra_mode_cdf);
  DUMP(switchable_restore_cdf); DUMP(wiener_restore_cdf);
  DUMP(sgrproj_restore_cdf);
  DUMP(y_mode_cdf); DUMP(uv_mode_cdf); DUMP(partition_cdf);
  DUMP(switchable_interp_cdf); DUMP(kf_y_cdf); DUMP(angle_delta_cdf);
  DUMP(tx_size_cdf); DUMP(delta_q_cdf); DUMP(delta_lf_multi_cdf);
  DUMP(delta_lf_cdf); DUMP(intra_ext_tx_cdf); DUMP(inter_ext_tx_cdf);
  DUMP(cfl_sign_cdf); DUMP(cfl_alpha_cdf);

  /* qindex-banded coefficient CDFs (4 bands) */
  DUMPT(av1_default_txb_skip_cdfs);
  DUMPT(av1_default_eob_extra_cdfs);
  DUMPT(av1_default_dc_sign_cdfs);
  DUMPT(av1_default_coeff_lps_multi_cdfs);
  DUMPT(av1_default_coeff_base_multi_cdfs);
  DUMPT(av1_default_coeff_base_eob_multi_cdfs);
  DUMPT(av1_default_eob_multi16_cdfs);
  DUMPT(av1_default_eob_multi32_cdfs);
  DUMPT(av1_default_eob_multi64_cdfs);
  DUMPT(av1_default_eob_multi128_cdfs);
  DUMPT(av1_default_eob_multi256_cdfs);
  DUMPT(av1_default_eob_multi512_cdfs);
  DUMPT(av1_default_eob_multi1024_cdfs);

  /* scan orders: for each tx size and type, scan + iscan (flattened,
   * length = tx_size_2d capped at 32x32) */
  for (int ts = 0; ts < TX_SIZES_ALL; ts++) {
    for (int tt = 0; tt < TX_TYPES; tt++) {
      char nm[64];
      const SCAN_ORDER *so = &av1_scan_orders[ts][tt];
      int n = tx_size_2d[ts];
      if (n > 1024) n = 1024;
      snprintf(nm, sizeof(nm), "scan_%d_%d", ts, tt);
      dump_i16(nm, so->scan, n);
      snprintf(nm, sizeof(nm), "iscan_%d_%d", ts, tt);
      dump_i16(nm, so->iscan, n);
    }
  }

  /* quant lookups for qindex 0..255 x bitdepth {8,10,12} */
  {
    int16_t dcq[3][256], acq[3][256];
    const aom_bit_depth_t bds[3] = { AOM_BITS_8, AOM_BITS_10, AOM_BITS_12 };
    for (int b = 0; b < 3; b++)
      for (int q = 0; q < 256; q++) {
        dcq[b][q] = av1_dc_quant_QTX(q, 0, bds[b]);
        acq[b][q] = av1_ac_quant_QTX(q, 0, bds[b]);
      }
    dump_i16("dc_quant_qtx", dcq, 3 * 256);
    dump_i16("ac_quant_qtx", acq, 3 * 256);
  }

  fclose(g_out);
  return 0;
}
