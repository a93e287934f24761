/* Dump the AV1 normative quantizer-matrix tables (spec §9.5, reference
 * av1/common/quant_common.c wt_matrix_ref/iwt_matrix_ref) via the public
 * av1_qm_init API into a flat binary, converted to data/qm_tables.npz by
 * tools/convert_qm.py.  Normative data extraction only — no code reuse. */
#include <stdio.h>
#include <stdint.h>
#include <string.h>

#include "av1/common/av1_common_int.h"
#include "av1/common/quant_common.h"

int main(int argc, char **argv) {
  static CommonQuantParams qp;
  av1_qm_init(&qp, 3);
  FILE *f = fopen(argc > 1 ? argv[1] : "qm_raw.bin", "wb");
  if (!f) return 1;
  /* layout: for q in 0..14, c in 0..1: for each distinct (adjusted) tx
   * size in TX_SIZES_ALL order: tx_size_2d[t] bytes of iwt then wt */
  for (int q = 0; q < NUM_QM_LEVELS - 1; ++q) {
    for (int c = 0; c < 2; ++c) {
      for (int t = 0; t < TX_SIZES_ALL; ++t) {
        if (av1_get_adjusted_tx_size(t) != t) continue;
        int n = tx_size_2d[t];
        fwrite(qp.giqmatrix[q][c][t], 1, n, f);
        fwrite(qp.gqmatrix[q][c][t], 1, n, f);
      }
    }
  }
  fclose(f);
  return 0;
}
