"""Batched fragment-chain DP on device (XLA).

Device analog of buildBestClumpFromFragmentRange (GraphPath.cpp:161-270)
for the TPU pipeline: B independent fragment ranges (padded to N nodes)
relax in lockstep.  The outer loop over left nodes i is sequential (the
DP dependency); for fixed i every right node j relaxes independently, so
each step is [B, N]-wide vector work — the same SoA reformulation as
core/chain._chain_dp_vectorized, which is byte-parity tested against the
reference scalar loop.  Tie-breaks, int16 score wraps (SINT stores), and
the ascending best-node fold all match the reference exactly.

Nodes must arrive sorted ascending by (SQO, diag) per problem; padding
rows use valid=False and never relax or win the fold.

Coordinates are int32 (jax default x64 is off): callers re-base each
problem's diag by its region minimum (diag' = (diag - diag0) mod 2^32,
always small because a region is a maximal run of fragments whose
successive diagonals differ <= maxGap, QueryMatch.c:146-158), which
shifts sro/ero uniformly and leaves every comparison and difference in
the DP unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _wrap_i16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


@functools.partial(
    jax.jit,
    static_argnames=("max_gap", "max_desert", "m_score", "go_cost",
                     "ge_cost"))
def batched_chain_dp(sqo, eqo, diag, length, valid, *, max_gap, max_desert,
                     m_score, go_cost, ge_cost):
    """Chain DP over B problems of up to N nodes each.

    sqo/eqo/diag/length: [B, N] int32 (diag re-based per problem),
    valid: [B, N] bool.
    Returns dict with best [B] (index of best end node, -1 if none),
    best_score [B], prev [B, N], path_sqo [B, N].
    """
    sqo = sqo.astype(jnp.int32)
    eqo = eqo.astype(jnp.int32)
    diag = diag.astype(jnp.int32)   # re-based: see module docstring
    length = length.astype(jnp.int32)
    b, n = sqo.shape
    sro = diag + sqo
    ero = diag + eqo
    length_w = _wrap_i16(length)
    best_score0 = _wrap_i16(length_w * m_score)

    def relax(i, state):
        # prev_dd / prev_qg carry the stored edge's diagDiff and query gap
        # so the tie cascade never needs a gather over prev indices.
        best_score, prev, path_len, path_sqo, prev_dd, prev_qg, \
            prev_psqo = state
        sqo_i = jax.lax.dynamic_index_in_dim(sqo, i, 1, keepdims=True)
        eqo_i = jax.lax.dynamic_index_in_dim(eqo, i, 1, keepdims=True)
        diag_i = jax.lax.dynamic_index_in_dim(diag, i, 1, keepdims=True)
        sro_i = jax.lax.dynamic_index_in_dim(sro, i, 1, keepdims=True)
        ero_i = jax.lax.dynamic_index_in_dim(ero, i, 1, keepdims=True)
        sc_i = jax.lax.dynamic_index_in_dim(best_score, i, 1, keepdims=True)
        plen_i = jax.lax.dynamic_index_in_dim(path_len, i, 1, keepdims=True)
        psqo_i = jax.lax.dynamic_index_in_dim(path_sqo, i, 1, keepdims=True)
        valid_i = jax.lax.dynamic_index_in_dim(valid, i, 1, keepdims=True)

        j_idx = jnp.arange(n)[None, :]
        cand = valid & valid_i & (j_idx > i) & (sqo > sqo_i)
        diag_gap = jnp.abs(diag - diag_i)
        cand &= diag_gap <= max_gap
        cand &= sro > sro_i
        q_gap = jnp.maximum(sqo - eqo_i - 1, 0)
        r_gap = jnp.maximum(sro - ero_i - 1, 0)
        cand &= jnp.minimum(q_gap, r_gap) <= max_desert
        q_ov = jnp.maximum(eqo_i - sqo + 1, 0)
        r_ov = jnp.maximum(ero_i - sro + 1, 0)
        newbases = length_w - jnp.maximum(q_ov, r_ov)
        cand &= newbases >= 1
        gap_cost = jnp.where(diag_gap > 0,
                             -(go_cost + diag_gap * ge_cost), 0)
        # `int newScore` (GraphPath.cpp:230): compare unwrapped.
        new_score = sc_i + newbases * m_score + gap_cost
        better = new_score > best_score
        equal = new_score == best_score
        # Tie cascade vs the stored prev (GraphPath.cpp:239-251).
        has_prev = prev >= 0
        diag_cmp = diag_gap - prev_dd
        gap_cmp = q_gap - prev_qg
        tie_win = has_prev & (
            (diag_cmp < 0) |
            ((diag_cmp == 0) & ((gap_cmp < 0) |
                                ((gap_cmp == 0) & (psqo_i > prev_psqo)))))
        accept = cand & (better | (equal & tie_win))
        best_score = jnp.where(accept, _wrap_i16(new_score), best_score)
        prev = jnp.where(accept, i, prev)
        path_len = jnp.where(accept, plen_i + 1, path_len)
        path_sqo = jnp.where(accept, psqo_i, path_sqo)
        prev_dd = jnp.where(accept, diag_gap, prev_dd)
        prev_qg = jnp.where(accept, q_gap, prev_qg)
        prev_psqo = jnp.where(accept, psqo_i, prev_psqo)
        return (best_score, prev, path_len, path_sqo, prev_dd, prev_qg,
                prev_psqo)

    zeros = jnp.zeros((b, n), jnp.int32)
    state = (best_score0, jnp.full((b, n), -1, jnp.int32),
             jnp.ones((b, n), jnp.int32), sqo, zeros, zeros, zeros)
    best_score, prev, path_len, path_sqo, _, _, _ = jax.lax.fori_loop(
        0, n - 1, relax, state)

    # Ascending best-node fold (GraphPath.cpp:259-266): prefer higher
    # score; on ties lower EQO, then greater pathSQO, keeping the later
    # index on full ties (the scalar loop replaces on accepted ties).
    def fold(i, acc):
        best, best_sc, best_eqo, best_psqo = acc
        sc = best_score[:, i]
        e = eqo[:, i]
        ps = path_sqo[:, i]
        v = valid[:, i]
        win = v & ((best < 0) | (sc > best_sc) |
                   ((sc == best_sc) &
                    (jnp.where(e != best_eqo, e < best_eqo,
                               ps > best_psqo))))
        best = jnp.where(win, i, best)
        best_sc = jnp.where(win, sc, best_sc)
        best_eqo = jnp.where(win, e, best_eqo)
        best_psqo = jnp.where(win, ps, best_psqo)
        return best, best_sc, best_eqo, best_psqo

    acc = (jnp.full((b,), -1, jnp.int32),
           jnp.full((b,), -0x7FFFFF00, jnp.int32),
           jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32))
    best, best_sc, _, _ = jax.lax.fori_loop(0, n, fold, acc)
    return {"best": best, "best_score": best_sc, "prev": prev,
            "path_sqo": path_sqo}
