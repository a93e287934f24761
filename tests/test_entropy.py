"""Range coder tests: self round-trip + byte-exact vs the reference EC.

Mirrors the reference test strategy (test/ec_test.cc): random symbol
sequences over random CDFs, adaptive and static, plus literal bits.
"""

import ctypes
import os

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream.entropy import (
    CDF_PROB_TOP,
    RangeDecoder,
    RangeEncoder,
    icdf,
    uniform_icdf,
    update_cdf,
)

ORACLE_SO = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                         "libec_oracle.so")


def random_icdf(rng, nsymbs):
    """Random valid icdf with nonzero probability per symbol."""
    while True:
        cuts = np.sort(rng.integers(1, CDF_PROB_TOP, size=nsymbs - 1))
        cum = np.concatenate([cuts, [CDF_PROB_TOP]])
        if nsymbs == 1 or np.all(np.diff(cum) > 0) and cum[0] > 0:
            return icdf(cum)


def make_stream(rng, n):
    """Random mixed symbol stream: (kinds, syms, nsymbs, adapt, cdfs)."""
    kinds = rng.integers(0, 2, size=n).astype(np.int32)  # 0=cdf, 1=bit
    nsymbs = rng.integers(2, 17, size=n).astype(np.int32)
    adapt = rng.integers(0, 2, size=n).astype(np.int32)
    cdfs = np.zeros((n, 18), dtype=np.uint16)
    syms = np.zeros(n, dtype=np.int32)
    for i in range(n):
        if kinds[i] == 0:
            cdfs[i, : nsymbs[i] + 1] = random_icdf(rng, int(nsymbs[i]))[
                : nsymbs[i] + 1]
            syms[i] = rng.integers(0, nsymbs[i])
        else:
            syms[i] = rng.integers(0, 2)
    return kinds, syms, nsymbs, adapt, cdfs


def py_encode(kinds, syms, nsymbs, adapt, cdfs):
    enc = RangeEncoder()
    cdfs = cdfs.copy()
    for i in range(len(kinds)):
        if kinds[i] == 0:
            if adapt[i]:
                enc.encode_symbol_adapt(int(syms[i]), cdfs[i], int(nsymbs[i]))
            else:
                enc.encode_symbol(int(syms[i]), cdfs[i], int(nsymbs[i]))
        else:
            enc.encode_bit(int(syms[i]))
    return enc.done()


def py_decode(data, kinds, nsymbs, adapt, cdfs):
    dec = RangeDecoder(data)
    cdfs = cdfs.copy()
    out = np.zeros(len(kinds), dtype=np.int32)
    for i in range(len(kinds)):
        if kinds[i] == 0:
            if adapt[i]:
                out[i] = dec.decode_symbol_adapt(cdfs[i], int(nsymbs[i]))
            else:
                out[i] = dec.decode_symbol(cdfs[i], int(nsymbs[i]))
        else:
            out[i] = dec.decode_bit()
    return out


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("n", [1, 7, 100, 2000])
def test_roundtrip(seed, n):
    rng = np.random.default_rng(seed)
    kinds, syms, nsymbs, adapt, cdfs = make_stream(rng, n)
    data = py_encode(kinds, syms, nsymbs, adapt, cdfs)
    got = py_decode(data, kinds, nsymbs, adapt, cdfs)
    np.testing.assert_array_equal(got, syms)


def test_literals_roundtrip():
    rng = np.random.default_rng(3)
    enc = RangeEncoder()
    vals = [(int(rng.integers(0, 1 << b)), b) for b in range(1, 17)
            for _ in range(20)]
    for v, b in vals:
        enc.encode_literal(v, b)
    data = enc.done()
    dec = RangeDecoder(data)
    for v, b in vals:
        assert dec.decode_literal(b) == v


def test_update_cdf_matches_spec_rule():
    # hand-check the adaptation rule on a 4-symbol cdf
    cdf = uniform_icdf(4).astype(np.uint16)
    before = cdf.copy()
    update_cdf(cdf, 2, 4)
    rate = 4 + 0 + 1
    for i in range(3):
        c = int(before[i])
        if i < 2:
            assert cdf[i] == c + ((CDF_PROB_TOP - c) >> rate)
        else:
            assert cdf[i] == c - (c >> rate)
    assert cdf[4] == 1


@pytest.mark.skipif(not os.path.exists(ORACLE_SO),
                    reason="reference EC oracle not built")
@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("n", [1, 13, 500, 5000])
def test_byte_exact_vs_reference(seed, n):
    lib = ctypes.CDLL(ORACLE_SO)
    rng = np.random.default_rng(100 + seed)
    kinds, syms, nsymbs, adapt, cdfs = make_stream(rng, n)

    ours = py_encode(kinds, syms, nsymbs, adapt, cdfs)

    out = np.zeros(8 * n + 64, dtype=np.uint8)
    c = cdfs.copy()
    ret = lib.ec_oracle_encode(
        kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        syms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nsymbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        adapt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(out))
    assert ret > 0
    theirs = bytes(out[:ret])
    assert ours == theirs, (
        f"byte mismatch: ours={ours[:32].hex()} ref={theirs[:32].hex()}")

    # and the reference decoder must read our bytes back
    dsyms = np.zeros(n, dtype=np.int32)
    c = cdfs.copy()
    buf = np.frombuffer(ours, dtype=np.uint8).copy()
    lib.ec_oracle_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(ours),
        kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nsymbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        adapt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n, dsyms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    np.testing.assert_array_equal(dsyms, syms)
