"""Pallas kernels (interpret mode) vs their XLA twins.

On-chip parity is checked separately on real TPU hardware; interpret mode
exercises the same kernel Python against the jitted XLA reference
implementations, which are themselves oracle-parity tested.
Sizes are tiny: interpret mode executes the grid serially in Python.

The Pallas kernels emit a packed 1-byte backtrack plane (op plus gap-run
continue bits); unpack_backtrack reconstructs the XLA twins' (eo, idc)
run-length arrays exactly, which is what these tests assert, alongside
decoded-alignment equality through the packed walkers (python + native).
"""
import numpy as np
import pytest

from yaha_tpu.ops import sw_batch, sw_pallas, dp_common

KW = dict(go=5, ge=2, rc=3, ms=1, max_gap=50, max_intron=50)


def _bands(rng, n, qlens, rlens):
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
    return lbw, rbw


def test_anchored_pallas_matches_xla():
    rng = np.random.default_rng(7)
    n, ql, rl = sw_pallas.TILE, 10, 12
    q = rng.integers(0, 5, (n, ql)).astype(np.uint8)
    r = rng.integers(0, 5, (n, rl)).astype(np.uint8)
    qlens = rng.integers(1, ql + 1, n).astype(np.int64)
    rlens = rng.integers(1, rl + 1, n).astype(np.int64)
    lbw, rbw = _bands(rng, n, qlens, rlens)
    ref = sw_batch.batched_anchored_forward(q, qlens, r, rlens, lbw, rbw,
                                            **KW)
    mine = sw_pallas.anchored_forward_pallas(q, qlens, r, rlens, lbw, rbw,
                                             interpret=True, **KW)
    np.testing.assert_array_equal(np.asarray(ref["score"]),
                                  np.asarray(mine["score"]), err_msg="score")
    # The Pallas kernel only sweeps the union of per-problem bands per
    # row; cells outside every band are never written (traceback walks
    # in-band cells only).  Compare unpacked eo/idc on the in-band mask,
    # which is everything the traceback (and the XLA twin's consumers)
    # can read.
    eo_u, idc_u = sw_pallas.unpack_backtrack(np.asarray(mine["bt"]), "up")
    ii = np.arange(ql + 1)[None, :, None]
    jj = np.arange(rl + 1)[None, None, :]
    band = ((ii <= qlens[:, None, None]) & (jj <= rlens[:, None, None])
            & (jj >= ii - lbw[:, None, None])
            & (jj <= ii + rbw[:, None, None]))
    for key, mine_arr in (("eo", eo_u), ("idc", idc_u)):
        a = np.asarray(ref[key])
        np.testing.assert_array_equal(np.where(band, a, 0),
                                      np.where(band, mine_arr, 0),
                                      err_msg=key)
    # And the decoded alignments must be identical outright.
    bt = np.asarray(mine["bt"])
    ks = list(range(0, n, 97))
    for k in ks:
        ta = dp_common.traceback_anchored(np.asarray(ref["eo"])[k],
                                          np.asarray(ref["idc"])[k],
                                          int(qlens[k]), int(rlens[k]))
        tb = dp_common.traceback_anchored_packed(bt[k], int(qlens[k]),
                                                 int(rlens[k]))
        assert ta == tb, k
    from yaha_tpu.native import host as native_host
    if native_host.available():
        items = native_host.traceback_anchored_packed_batch(
            bt[ks], qlens[ks], rlens[ks])
        for idx, k in enumerate(ks):
            want = dp_common.traceback_anchored(
                np.asarray(ref["eo"])[k], np.asarray(ref["idc"])[k],
                int(qlens[k]), int(rlens[k]))
            assert items[idx] == want, k


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
    for key in ("score", "maxi", "maxj"):
        np.testing.assert_array_equal(np.asarray(ref[key]),
                                      np.asarray(mine[key]), err_msg=key)
    eo_u, idc_u = sw_pallas.unpack_backtrack(np.asarray(mine["bt"]), "diag")
    np.testing.assert_array_equal(np.asarray(ref["eo"]), eo_u, err_msg="eo")
    np.testing.assert_array_equal(np.asarray(ref["idc"]).astype(np.int32),
                                  idc_u, err_msg="idc")
    # Packed walkers (python + native) vs the unpacked decode.
    bt = np.asarray(mine["bt"])
    ks = list(range(0, n, 89))
    for k in ks:
        want = dp_common.traceback_extension(
            np.asarray(ref["eo"])[k], np.asarray(ref["idc"])[k],
            int(ref["maxi"][k]), int(ref["maxj"][k]),
            int(ref["score"][k]), bw2, bool(k % 2))
        got = dp_common.traceback_extension_packed(
            bt[k], int(mine["maxi"][k]), int(mine["maxj"][k]),
            int(mine["score"][k]), bw2, bool(k % 2))
        assert got == want, k
    from yaha_tpu.native import host as native_host
    if native_host.available():
        rev = np.array([k % 2 for k in ks], np.uint8)
        items = native_host.traceback_extension_packed_batch(
            bt[ks], np.asarray(mine["maxi"])[ks],
            np.asarray(mine["maxj"])[ks], np.asarray(mine["score"])[ks],
            rev)
        for idx, k in enumerate(ks):
            want, _, _ = dp_common.traceback_extension_packed(
                bt[k], int(mine["maxi"][k]), int(mine["maxj"][k]),
                int(mine["score"][k]), bw2, bool(k % 2))
            if int(mine["score"][k]) <= 0:
                want = []
            assert items[idx] == want, k


def test_anchored_banded_pallas_matches_xla():
    """Band-relative anchored kernel vs the XLA twin: scores, unshifted
    full-matrix arrays, and both backtrack decoders (python + native)."""
    rng = np.random.default_rng(23)
    n, ql, rl = sw_pallas.TILE, 11, 14
    q = rng.integers(0, 5, (n, ql)).astype(np.uint8)
    r = rng.integers(0, 5, (n, rl)).astype(np.uint8)
    qlens = rng.integers(1, ql + 1, n).astype(np.int64)
    rlens = rng.integers(1, rl + 1, n).astype(np.int64)
    lbw, rbw = _bands(rng, n, qlens, rlens)
    ref = sw_batch.batched_anchored_forward(q, qlens, r, rlens, lbw, rbw,
                                            **KW)
    wband = int((lbw + rbw).max()) + 1
    mine = sw_pallas.anchored_forward_pallas_banded(
        q, qlens, r, rlens, lbw, rbw, wband=wband, interpret=True, **KW)
    np.testing.assert_array_equal(np.asarray(ref["score"]),
                                  np.asarray(mine["score"]), err_msg="score")
    eo_b, idc_b = sw_pallas.unpack_backtrack(np.asarray(mine["bt_b"]),
                                             "diag")
    eo_u, idc_u = sw_pallas.unshift_anchored_banded(
        eo_b, idc_b, np.asarray(lbw), wid=rl + 1)
    np.testing.assert_array_equal(np.asarray(ref["eo"]), np.asarray(eo_u),
                                  err_msg="eo")
    np.testing.assert_array_equal(np.asarray(ref["idc"]).astype(np.int32),
                                  np.asarray(idc_u), err_msg="idc")
    # Decoders: banded packed python + native vs the absolute decode.
    bt_b = np.asarray(mine["bt_b"])
    ref_eo = np.asarray(ref["eo"])
    ref_idc = np.asarray(ref["idc"])
    ks = list(range(0, n, 89))
    for k in ks:
        want = dp_common.traceback_anchored(ref_eo[k], ref_idc[k],
                                            int(qlens[k]), int(rlens[k]))
        got = dp_common.traceback_anchored_banded_packed(
            bt_b[k], int(lbw[k]), int(qlens[k]), int(rlens[k]))
        assert got == want, k
    from yaha_tpu.native import host as native_host
    if native_host.available():
        items = native_host.traceback_anchored_banded_packed_batch(
            bt_b[ks], qlens[ks], rlens[ks], lbw[ks])
        for idx, k in enumerate(ks):
            want = dp_common.traceback_anchored(
                ref_eo[k], ref_idc[k], int(qlens[k]), int(rlens[k]))
            assert items[idx] == want, k


def test_extension_pallas_windowed_matches_resident():
    """The windowed-input variant (VMEM O(band); used for ql > 2048
    where resident rows blow the 16 MB scoped VMEM limit) must be
    bit-identical to the resident variant at any shape."""
    rng = np.random.default_rng(23)
    n, ql, bw = sw_pallas.TILE, 20, 2
    bw2 = 2 * bw
    rl = ql + 2 * bw2
    q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
    qlens = rng.integers(1, ql + 1, n).astype(np.int64)
    r = np.zeros((n, rl), np.uint8)
    for k in range(n):
        L = qlens[k]
        r[k, :L] = q[k, :L]
        m = rng.random(L) < 0.2
        r[k, :L][m] = rng.integers(0, 4, int(m.sum()))
        r[k, L:] = rng.integers(0, 4, rl - L)
    rlens = np.minimum(qlens + bw2, rl).astype(np.int64)
    kw = dict(band_width=bw, x_cutoff=25, **KW)
    res = sw_pallas.extension_forward_pallas(q, qlens, r, rlens,
                                             interpret=True, **kw)
    win = sw_pallas.extension_forward_pallas(q, qlens, r, rlens,
                                             interpret=True,
                                             force_windowed=True, **kw)
    for key in ("score", "maxi", "maxj", "bt"):
        np.testing.assert_array_equal(np.asarray(res[key]),
                                      np.asarray(win[key]), err_msg=key)
