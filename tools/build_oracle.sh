#!/bin/sh
# Build the reference aomenc/aomdec (from the read-only checkout at
# /root/reference) as *external test oracles*.  No reference code is used in
# the framework itself; these binaries only serve as the conformance /
# bit-exactness check in tests (SURVEY.md §4 layers 3-4).
set -e
REF=${1:-/root/reference}
OUT=${2:-/root/repo/.oracle/build}
mkdir -p "$OUT"
cd "$OUT"
cmake "$REF" -G Ninja -DCMAKE_BUILD_TYPE=Release -DAOM_TARGET_CPU=generic \
  -DENABLE_TESTS=0 -DENABLE_TESTDATA=0 -DENABLE_DOCS=0 -DENABLE_EXAMPLES=1 \
  -DENABLE_TOOLS=0 -DCONFIG_MULTITHREAD=0
ninja aomenc aomdec
gcc -O2 -shared -fPIC -I"$REF" -I"$OUT" /root/repo/tools/ec_oracle.c \
  "$REF"/aom_dsp/entenc.c "$REF"/aom_dsp/entdec.c "$REF"/aom_dsp/entcode.c \
  -o "$OUT"/../libec_oracle.so
gcc -O2 -shared -fPIC /root/repo/tools/txfm_oracle.c \
  -o "$OUT"/../libtxfm_oracle.so
gcc -O2 -shared -fPIC -I"$REF" -I"$OUT" /root/repo/tools/txfm1d_oracle.c \
  "$REF"/av1/common/av1_inv_txfm1d.c "$REF"/av1/encoder/av1_fwd_txfm1d.c \
  "$REF"/av1/common/av1_txfm.c -o "$OUT"/../libtxfm1d_oracle.so
gcc -O2 -shared -fPIC -I"$REF" -I"$OUT" /root/repo/tools/txfm2d_oracle.c \
  "$REF"/av1/common/av1_inv_txfm2d.c "$REF"/av1/encoder/av1_fwd_txfm2d.c \
  "$REF"/av1/common/av1_inv_txfm1d.c "$REF"/av1/encoder/av1_fwd_txfm1d.c \
  "$REF"/av1/common/av1_txfm.c -o "$OUT"/../libtxfm2d_oracle.so
gcc -O2 -shared -fPIC -I"$REF" -I"$OUT" /root/repo/tools/cdef_oracle.c \
  "$REF"/av1/common/cdef_block.c -o "$OUT"/../libcdef_oracle.so
gcc -O2 -shared -fPIC -I"$REF" -I"$OUT" /root/repo/tools/convolve_oracle.c \
  "$OUT"/libaom.a -o "$OUT"/../libconvolve_oracle.so
gcc -O2 -shared -fPIC -I"$REF" -I"$OUT" /root/repo/tools/warp_oracle.c \
  "$OUT"/libaom.a -o "$OUT"/../libwarp_oracle.so
gcc -O2 -shared -fPIC -I"$REF" -I"$OUT" /root/repo/tools/lr_oracle.c \
  "$OUT"/libaom.a -o "$OUT"/../liblr_oracle.so
