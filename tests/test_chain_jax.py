"""Batched XLA chain DP vs the native/scalar chain DP."""
import numpy as np
import pytest

from yaha_tpu.ops import chain_jax
from yaha_tpu.native import host


class _AA:
    max_gap = 50
    max_desert = 200
    m_score = 1
    go_cost = 5
    ge_cost = 2
    band_width = 5


def _random_problem(rng, n):
    """Fragment-like nodes sorted ascending (SQO, diag), incl. unsigned
    diag wrap cases (RO < QO)."""
    sqo = np.sort(rng.integers(0, 900, n))
    length = rng.integers(10, 60, n)
    eqo = sqo + length - 1
    # Region-local diagonals (successive diffs bounded), incl. a uint32
    # wrap batch: wrapped regions re-base to the same small span.
    base = 2**32 - 20 if rng.random() < 0.2 else rng.integers(0, 5000)
    diag = (base + rng.integers(0, 3000, n)) % 2**32
    order = np.lexsort((diag, sqo))
    return sqo[order], eqo[order], diag[order].astype(np.int64), \
        length[order]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_chain_matches_native(seed):
    if not host.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(seed)
    aa = _AA()
    b, n_max = 16, 48
    sqo = np.zeros((b, n_max), np.int64)
    eqo = np.zeros((b, n_max), np.int64)
    diag = np.zeros((b, n_max), np.int64)
    length = np.zeros((b, n_max), np.int64)
    valid = np.zeros((b, n_max), bool)
    diag_orig = np.zeros((b, n_max), np.int64)
    counts = rng.integers(1, n_max + 1, b)
    for k in range(b):
        c = counts[k]
        s, e, d, ln = _random_problem(rng, c)
        sqo[k, :c], eqo[k, :c], length[k, :c] = s, e, ln
        diag_orig[k, :c] = d
        # Caller-side re-base (see chain_jax docstring).
        diag[k, :c] = (d - d.min()) % 2**32
        valid[k, :c] = True

    out = chain_jax.batched_chain_dp(
        sqo, eqo, diag, length, valid, max_gap=aa.max_gap,
        max_desert=aa.max_desert, m_score=aa.m_score, go_cost=aa.go_cost,
        ge_cost=aa.ge_cost)
    best = np.asarray(out["best"])
    prev = np.asarray(out["prev"])
    best_score = np.asarray(out["best_score"])

    for k in range(b):
        c = counts[k]
        nb, nsc, nprev, _, _ = host.chain_dp(
            sqo[k, :c], eqo[k, :c], diag_orig[k, :c], length[k, :c],
            max_gap=aa.max_gap, max_desert=aa.max_desert,
            m_score=aa.m_score, go_cost=aa.go_cost, ge_cost=aa.ge_cost)
        assert best[k] == nb, k
        assert best_score[k] == nsc[nb], k
        np.testing.assert_array_equal(prev[k, :c], nprev, err_msg=str(k))
