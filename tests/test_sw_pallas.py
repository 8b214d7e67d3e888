"""Pallas kernels (interpret mode) vs their XLA twins.

On-chip parity is checked separately on real TPU hardware; interpret mode
exercises the same kernel Python against the jitted XLA reference
implementations, which are themselves oracle-parity tested.
Sizes are tiny: interpret mode executes the grid serially in Python.
"""
import numpy as np
import pytest

from yaha_tpu.ops import sw_batch, sw_pallas

KW = dict(go=5, ge=2, rc=3, ms=1, max_gap=50, max_intron=50)


def test_anchored_pallas_matches_xla():
    rng = np.random.default_rng(7)
    n, ql, rl = sw_pallas.TILE, 10, 12
    q = rng.integers(0, 5, (n, ql)).astype(np.uint8)
    r = rng.integers(0, 5, (n, rl)).astype(np.uint8)
    qlens = rng.integers(1, ql + 1, n).astype(np.int64)
    rlens = rng.integers(1, rl + 1, n).astype(np.int64)
    lbw = np.zeros(n, np.int64)
    rbw = np.zeros(n, np.int64)
    for k in range(n):
        if k % 2 == 0:   # full-DP encoding
            lbw[k] = rbw[k] = max(qlens[k], rlens[k]) + 1
        else:            # banded with asymmetric bands (SW.cpp:855-871)
            d = 2
            if rlens[k] >= qlens[k]:
                lbw[k], rbw[k] = d, d + (rlens[k] - qlens[k])
            else:
                lbw[k], rbw[k] = d + (qlens[k] - rlens[k]), d
    ref = sw_batch.batched_anchored_forward(q, qlens, r, rlens, lbw, rbw,
                                            **KW)
    mine = sw_pallas.anchored_forward_pallas(q, qlens, r, rlens, lbw, rbw,
                                             interpret=True, **KW)
    for key in ("score", "eo", "idc"):
        np.testing.assert_array_equal(np.asarray(ref[key]),
                                      np.asarray(mine[key]), err_msg=key)


def test_extension_pallas_matches_xla():
    rng = np.random.default_rng(11)
    n, ql, bw = sw_pallas.TILE, 12, 2
    bw2 = 2 * bw
    rl = ql + 2 * bw2
    q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
    qlens = rng.integers(1, ql + 1, n).astype(np.int64)
    r = np.zeros((n, rl), np.uint8)
    for k in range(n):
        L = qlens[k]
        r[k, :L] = q[k, :L]
        m = rng.random(L) < 0.15
        r[k, :L][m] = rng.integers(0, 4, int(m.sum()))
        r[k, L:] = rng.integers(0, 4, rl - L)
    rlens = np.minimum(qlens + bw2, rl).astype(np.int64)
    kw = dict(band_width=bw, x_cutoff=25, **KW)
    ref = sw_batch.batched_extension_forward(q, qlens, r, rlens, **kw)
    mine = sw_pallas.extension_forward_pallas(q, qlens, r, rlens,
                                              interpret=True, **kw)
    for key in ("score", "maxi", "maxj", "eo", "idc"):
        np.testing.assert_array_equal(np.asarray(ref[key]),
                                      np.asarray(mine[key]), err_msg=key)
