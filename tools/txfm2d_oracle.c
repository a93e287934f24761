/* 2D transform oracle (links reference av1_fwd_txfm2d.c / av1_inv_txfm2d.c)
 * for bit-exactness tests. */
#include <stdint.h>
#include "av1/common/enums.h"
#include "av1/common/av1_txfm.h"

void av1_fwd_txfm2d_4x4_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_8x8_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_16x16_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_32x32_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_64x64_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_4x8_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_8x4_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_8x16_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_16x8_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_16x32_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_32x16_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_32x64_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_64x32_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_4x16_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_16x4_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_8x32_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_32x8_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_16x64_c(const int16_t *, int32_t *, int, TX_TYPE, int);
void av1_fwd_txfm2d_64x16_c(const int16_t *, int32_t *, int, TX_TYPE, int);

void av1_inv_txfm2d_add_4x4_c(const int32_t *, uint16_t *, int, TX_TYPE, int);
void av1_inv_txfm2d_add_8x8_c(const int32_t *, uint16_t *, int, TX_TYPE, int);
void av1_inv_txfm2d_add_16x16_c(const int32_t *, uint16_t *, int, TX_TYPE,
                                int);
void av1_inv_txfm2d_add_32x32_c(const int32_t *, uint16_t *, int, TX_TYPE,
                                int);
void av1_inv_txfm2d_add_64x64_c(const int32_t *, uint16_t *, int, TX_TYPE,
                                int);
void av1_inv_txfm2d_add_4x8_c(const int32_t *, uint16_t *, int, TX_TYPE, int);
void av1_inv_txfm2d_add_8x4_c(const int32_t *, uint16_t *, int, TX_TYPE, int);
void av1_inv_txfm2d_add_8x16_c(const int32_t *, uint16_t *, int, TX_TYPE,
                               int);
void av1_inv_txfm2d_add_16x8_c(const int32_t *, uint16_t *, int, TX_TYPE,
                               int);
void av1_inv_txfm2d_add_16x32_c(const int32_t *, uint16_t *, int, TX_TYPE,
                                int);
void av1_inv_txfm2d_add_32x16_c(const int32_t *, uint16_t *, int, TX_TYPE,
                                int);
void av1_inv_txfm2d_add_32x64_c(const int32_t *, uint16_t *, int, TX_TYPE,
                                int);
void av1_inv_txfm2d_add_64x32_c(const int32_t *, uint16_t *, int, TX_TYPE,
                                int);
void av1_inv_txfm2d_add_4x16_c(const int32_t *, uint16_t *, int, TX_TYPE,
                               int);
void av1_inv_txfm2d_add_16x4_c(const int32_t *, uint16_t *, int, TX_TYPE,
                               int);
void av1_inv_txfm2d_add_8x32_c(const int32_t *, uint16_t *, int, TX_TYPE,
                               int);
void av1_inv_txfm2d_add_32x8_c(const int32_t *, uint16_t *, int, TX_TYPE,
                               int);
void av1_inv_txfm2d_add_16x64_c(const int32_t *, uint16_t *, int, TX_TYPE,
                                int);
void av1_inv_txfm2d_add_64x16_c(const int32_t *, uint16_t *, int, TX_TYPE,
                                int);

typedef void (*fwd_fn)(const int16_t *, int32_t *, int, TX_TYPE, int);
typedef void (*inv_fn)(const int32_t *, uint16_t *, int, TX_TYPE, int);

static const fwd_fn FWD[19] = {
  av1_fwd_txfm2d_4x4_c,   av1_fwd_txfm2d_8x8_c,   av1_fwd_txfm2d_16x16_c,
  av1_fwd_txfm2d_32x32_c, av1_fwd_txfm2d_64x64_c, av1_fwd_txfm2d_4x8_c,
  av1_fwd_txfm2d_8x4_c,   av1_fwd_txfm2d_8x16_c,  av1_fwd_txfm2d_16x8_c,
  av1_fwd_txfm2d_16x32_c, av1_fwd_txfm2d_32x16_c, av1_fwd_txfm2d_32x64_c,
  av1_fwd_txfm2d_64x32_c, av1_fwd_txfm2d_4x16_c,  av1_fwd_txfm2d_16x4_c,
  av1_fwd_txfm2d_8x32_c,  av1_fwd_txfm2d_32x8_c,  av1_fwd_txfm2d_16x64_c,
  av1_fwd_txfm2d_64x16_c,
};
static const inv_fn INV[19] = {
  av1_inv_txfm2d_add_4x4_c,   av1_inv_txfm2d_add_8x8_c,
  av1_inv_txfm2d_add_16x16_c, av1_inv_txfm2d_add_32x32_c,
  av1_inv_txfm2d_add_64x64_c, av1_inv_txfm2d_add_4x8_c,
  av1_inv_txfm2d_add_8x4_c,   av1_inv_txfm2d_add_8x16_c,
  av1_inv_txfm2d_add_16x8_c,  av1_inv_txfm2d_add_16x32_c,
  av1_inv_txfm2d_add_32x16_c, av1_inv_txfm2d_add_32x64_c,
  av1_inv_txfm2d_add_64x32_c, av1_inv_txfm2d_add_4x16_c,
  av1_inv_txfm2d_add_16x4_c,  av1_inv_txfm2d_add_8x32_c,
  av1_inv_txfm2d_add_32x8_c,  av1_inv_txfm2d_add_16x64_c,
  av1_inv_txfm2d_add_64x16_c,
};

void txfm2d_fwd(int tx_size, int tx_type, const int16_t *in, int stride,
                int32_t *out, int bd) {
  FWD[tx_size](in, out, stride, (TX_TYPE)tx_type, bd);
}

void txfm2d_inv_add(int tx_size, int tx_type, const int32_t *coeff,
                    uint16_t *dest, int stride, int bd) {
  INV[tx_size](coeff, dest, stride, (TX_TYPE)tx_type, bd);
}
