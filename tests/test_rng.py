"""Bit-exactness tests for the Marsaglia xorshift RNG (Math.c:251-343)."""
import numpy as np

from yaha_tpu.utils.rng import RandState, query_seed_state


def _c_reference_stream(n):
    """Independent Python model of the C code for cross-checking."""
    s = [123456789, 362436069, 521288629, 88675123, 886756453]
    out = []
    M = 0xFFFFFFFF
    for _ in range(n):
        t = (s[0] ^ (s[0] >> 7)) & M
        s[0], s[1], s[2], s[3] = s[1], s[2], s[3], s[4]
        s[4] = ((s[4] ^ ((s[4] << 6) & M)) ^ (t ^ ((t << 13) & M))) & M
        out.append(((s[1] + s[1] + 1) * s[4]) & M)
    return out


def test_rand_bits_stream():
    rs = RandState.default()
    got = [rs.rand_bits() for _ in range(1000)]
    assert got == _c_reference_stream(1000)
    # All values fit in uint32.
    assert all(0 <= v <= 0xFFFFFFFF for v in got)


def test_rand_sample_order_preserving():
    rs = RandState.default()
    inp = np.arange(100, dtype=np.uint32) * 7
    out = rs.rand_sample(inp, 10)
    assert len(out) == 10
    # Order preserved (ascending since input ascending).
    assert np.all(np.diff(out.astype(np.int64)) > 0)
    # Deterministic given seed.
    rs2 = RandState.default()
    assert np.array_equal(out, rs2.rand_sample(inp, 10))


def test_rand_sample_keep_most():
    # outLen > inLen/2 exercises the mark-discards branch.
    rs = RandState.default()
    inp = np.arange(20, dtype=np.uint32)
    out = rs.rand_sample(inp, 15)
    assert len(out) == 15
    assert np.all(np.diff(out.astype(np.int64)) > 0)


def test_query_seed_wraps():
    codes = np.array([0, 1, 2, 3] * 3, dtype=np.uint8)  # length 12, wraps
    st = query_seed_state(codes, 12)
    assert len(st) == 5
    word0 = 0
    off = 0
    for _ in range(16):
        word0 = ((word0 << 2) | int(codes[off % 12])) & 0xFFFFFFFF
        off += 1
    assert st[0] == word0
