"""NumPy twin DPs vs the scalar oracle (fast test-suite versions)."""
import numpy as np

from yaha_tpu.core import sw as sw_oracle
from yaha_tpu.ops import sw_batch, sw_numpy


class _AA:
    go_cost = 5
    ge_cost = 2
    r_cost = 3
    m_score = 1
    x_cutoff = 25
    max_gap = 50
    max_intron = 50
    band_width = 5


KW = dict(go=5, ge=2, rc=3, ms=1, max_gap=50, max_intron=50)


def test_extension_np_matches_oracle():
    rng = np.random.default_rng(11)
    n = 48
    bw2 = 10
    ql_max = 80
    q = rng.integers(0, 4, (n, ql_max)).astype(np.uint8)
    qlens = rng.integers(5, ql_max + 1, n)
    rl = ql_max + 2 * bw2
    r = np.zeros((n, rl), np.uint8)
    for k in range(n):
        L = qlens[k]
        r[k, :L] = q[k, :L]
        m = rng.random(L) < 0.15
        r[k, :L][m] = rng.integers(0, 4, int(m.sum()))
        r[k, L:] = rng.integers(0, 4, rl - L)
    rlens = qlens + bw2
    out = sw_numpy.batched_extension_forward_np(
        q, qlens, r, rlens, band_width=5, x_cutoff=25, **KW)
    aa = _AA()
    for k in range(n):
        o_score, o_items, o_maxi, o_maxj, _ = \
            sw_oracle._find_affine_gap_score(
                aa, q[k, :qlens[k]], r[k, :rlens[k]], True, True, False,
                True, 5)
        if o_score <= 0:
            assert out["score"][k] <= 0
            continue
        assert out["score"][k] == o_score, k
        items, _, _ = sw_batch.traceback_extension(
            out["eo"][k], out["idc"][k], out["maxi"][k], out["maxj"][k],
            int(out["score"][k]), bw2, reverse=False)
        assert items == o_items, (k, items, o_items)


def test_anchored_np_matches_oracle():
    rng = np.random.default_rng(5)
    n = 48
    aa = _AA()
    cases = []
    for k in range(n):
        qg = int(rng.integers(2, 60))
        rg = int(rng.integers(2, 60))
        q = rng.integers(0, 4, qg).astype(np.uint8)
        r = rng.integers(0, 4, rg).astype(np.uint8)
        if k % 2:
            m = min(qg, rg)
            r[:m] = q[:m]
            mm = rng.random(m) < 0.15
            r[:m][mm] = rng.integers(0, 4, int(mm.sum()))
        len_diff = abs(qg - rg)
        banded = len_diff + aa.band_width * 2 + 1 < rg
        if banded:
            if rg > qg:
                lbw, rbw = aa.band_width, aa.band_width + (rg - qg)
            else:
                lbw, rbw = aa.band_width + (qg - rg), aa.band_width
        else:
            lbw = rbw = 1000
        cases.append((q, r, qg, rg, lbw, rbw, banded))
    qg_max = max(c[2] for c in cases)
    rg_max = max(c[3] for c in cases)
    qa = np.zeros((n, qg_max), np.uint8)
    ra = np.zeros((n, rg_max), np.uint8)
    qlens = np.zeros(n, np.int64)
    rlens = np.zeros(n, np.int64)
    lbws = np.zeros(n, np.int64)
    rbws = np.zeros(n, np.int64)
    for k, (q, r, qg, rg, lbw, rbw, _) in enumerate(cases):
        qa[k, :qg] = q
        ra[k, :rg] = r
        qlens[k], rlens[k], lbws[k], rbws[k] = qg, rg, lbw, rbw
    out = sw_numpy.batched_anchored_forward_np(qa, qlens, ra, rlens, lbws,
                                               rbws, **KW)
    for k, (q, r, qg, rg, lbw, rbw, banded) in enumerate(cases):
        o_score, o_items, _, _, _ = sw_oracle._find_affine_gap_score(
            aa, q, r, banded, False, False, False, aa.band_width)
        assert out["score"][k] == o_score, (k, out["score"][k], o_score)
        items = sw_batch.traceback_anchored(out["eo"][k], out["idc"][k],
                                            qg, rg)
        assert items == o_items, (k, items, o_items)
