"""Batched XLA extension DP vs the reference-exact oracle (core/sw.py)."""
import numpy as np
import pytest

from yaha_tpu.core import sw as sw_oracle
from yaha_tpu.ops import sw_batch


class _AA:
    go_cost = 5
    ge_cost = 2
    r_cost = 3
    m_score = 1
    x_cutoff = 25
    max_gap = 50
    max_intron = 50
    band_width = 5


def _random_problems(rng, n, qlen_max, mut=0.05, indel=0.01):
    """Extension problems: ref derived from query with mutations."""
    bw2 = 2 * _AA.band_width
    qs, rs, qlens, rlens = [], [], [], []
    for _ in range(n):
        qlen = rng.integers(5, qlen_max + 1)
        q = rng.integers(0, 4, qlen).astype(np.uint8)
        # ref: mutated copy + random tail
        r = []
        i = 0
        while i < qlen:
            p = rng.random()
            if p < mut:
                r.append(rng.integers(0, 4))
                i += 1
            elif p < mut + indel:
                if rng.random() < 0.5:
                    i += 1  # deletion from ref
                else:
                    r.append(rng.integers(0, 4))
            else:
                r.append(q[i])
                i += 1
        r = np.array(r, dtype=np.uint8)
        rlen = qlen + bw2
        if len(r) < rlen:
            r = np.concatenate([r, rng.integers(0, 4, rlen - len(r))
                                .astype(np.uint8)])
        r = r[:rlen]
        qs.append(q)
        rs.append(r)
        qlens.append(qlen)
        rlens.append(rlen)
    ql_max = max(qlens)
    rl_max = max(rlens)
    qarr = np.zeros((n, ql_max), np.uint8)
    rarr = np.zeros((n, rl_max), np.uint8)
    for k in range(n):
        qarr[k, :qlens[k]] = qs[k]
        rarr[k, :rlens[k]] = rs[k]
    return qarr, np.array(qlens), rarr, np.array(rlens)


@pytest.mark.parametrize("seed,qlen_max,mut", [
    (0, 40, 0.05), (2, 100, 0.3), (3, 200, 0.02),
])
def test_batched_extension_matches_oracle(seed, qlen_max, mut):
    rng = np.random.default_rng(seed)
    n = 32
    q, qlens, r, rlens = _random_problems(rng, n, qlen_max, mut=mut)
    aa = _AA()
    out = sw_batch.batched_extension_forward(
        q, qlens, r, rlens, band_width=aa.band_width, go=aa.go_cost,
        ge=aa.ge_cost, rc=aa.r_cost, ms=aa.m_score, max_gap=aa.max_gap,
        max_intron=aa.max_intron, x_cutoff=aa.x_cutoff)
    score = np.asarray(out["score"])
    maxi = np.asarray(out["maxi"])
    maxj = np.asarray(out["maxj"])
    eo = np.asarray(out["eo"])
    idc = np.asarray(out["idc"])
    bw2 = 2 * aa.band_width

    for k in range(n):
        o_score, o_items, o_maxi, o_maxj, _ = sw_oracle._find_affine_gap_score(
            aa, q[k, :qlens[k]], r[k, :rlens[k]], True, True, False, True,
            aa.band_width)
        if o_score <= 0:
            assert score[k] <= 0, k
            continue
        assert score[k] == o_score, (k, score[k], o_score)
        assert maxi[k] == o_maxi, (k, maxi[k], o_maxi)
        assert maxj[k] == o_maxj, (k, maxj[k], o_maxj)
        items, aq, ar = sw_batch.traceback_extension(
            eo[k], idc[k], maxi[k], maxj[k], score[k], bw2, reverse=False)
        assert items == o_items, (k, items, o_items)
