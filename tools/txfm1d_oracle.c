/* Oracle wrapper exposing the reference 1D transforms for bit-exactness
 * tests (links against reference av1_inv_txfm1d.c / av1_fwd_txfm1d.c). */
#include <stdint.h>
#include "av1/common/av1_inv_txfm1d.h"
#include "av1/encoder/av1_fwd_txfm1d.h"

typedef void (*fn_t)(const int32_t *, int32_t *, int8_t, const int8_t *);

/* kind: 0..4 idct4..64; 5..7 iadst4..16; 10..14 fdct4..64; 15..17 fadst */
int txfm1d_run(int kind, const int32_t *in, int32_t *out, int8_t cos_bit,
               const int8_t *stage_range) {
  switch (kind) {
    case 0: av1_idct4(in, out, cos_bit, stage_range); return 0;
    case 1: av1_idct8(in, out, cos_bit, stage_range); return 0;
    case 2: av1_idct16(in, out, cos_bit, stage_range); return 0;
    case 3: av1_idct32(in, out, cos_bit, stage_range); return 0;
    case 4: av1_idct64(in, out, cos_bit, stage_range); return 0;
    case 5: av1_iadst4(in, out, cos_bit, stage_range); return 0;
    case 6: av1_iadst8(in, out, cos_bit, stage_range); return 0;
    case 7: av1_iadst16(in, out, cos_bit, stage_range); return 0;
    case 8: av1_iidentity4_c(in, out, cos_bit, stage_range); return 0;
    case 9: av1_iidentity8_c(in, out, cos_bit, stage_range); return 0;
    case 18: av1_iidentity16_c(in, out, cos_bit, stage_range); return 0;
    case 19: av1_iidentity32_c(in, out, cos_bit, stage_range); return 0;
    case 10: av1_fdct4(in, out, cos_bit, stage_range); return 0;
    case 11: av1_fdct8(in, out, cos_bit, stage_range); return 0;
    case 12: av1_fdct16(in, out, cos_bit, stage_range); return 0;
    case 13: av1_fdct32(in, out, cos_bit, stage_range); return 0;
    case 14: av1_fdct64(in, out, cos_bit, stage_range); return 0;
    case 15: av1_fadst4(in, out, cos_bit, stage_range); return 0;
    case 16: av1_fadst8(in, out, cos_bit, stage_range); return 0;
    case 17: av1_fadst16(in, out, cos_bit, stage_range); return 0;
    case 20: av1_fidentity4_c(in, out, cos_bit, stage_range); return 0;
    case 21: av1_fidentity8_c(in, out, cos_bit, stage_range); return 0;
    case 22: av1_fidentity16_c(in, out, cos_bit, stage_range); return 0;
    case 23: av1_fidentity32_c(in, out, cos_bit, stage_range); return 0;
  }
  return -1;
}
