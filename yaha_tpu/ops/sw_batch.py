"""Batched banded affine-gap DP, vectorized over problems (XLA path).

TPU-first reformulation of findAffineGapScore (SW.cpp:798-1208): instead of
one problem at a time, N extension problems run in lockstep — the band
(width W = 4*bandWidth+1, static) is walked row by row exactly like the
reference inner loop, but every arithmetic op is an [N]-wide vector op, so
XLA/TPU lanes carry the parallelism.  Cell-evaluation order (and therefore
every tie-break: extensions prefer indels via `>=`, delete checked before
insert) matches the reference per cell, so results are bit-identical to the
core/sw.py oracle.

The X-dropoff early exit is a per-problem `done` mask; the row loop stops
when every problem in the batch is done (lax.while_loop).

Outputs include the backtrack arrays (op codes + indel run lengths); the
run-length decode to edit-op lists is a cheap host-side pass
(traceback_extension below).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .dp_common import (DP_WORST, OP_UNKNOWN, OP_MATCH, OP_REPLACE,   # noqa: F401 (re-exported)
                        OP_INSERT, OP_DELETE, OP_CHARS,
                        traceback_extension, traceback_anchored)


@functools.partial(
    jax.jit,
    static_argnames=("band_width", "go", "ge", "rc", "ms", "max_gap",
                     "max_intron", "x_cutoff"))
def batched_extension_forward(q, qlens, r, rlens, *, band_width, go, ge, rc,
                              ms, max_gap, max_intron, x_cutoff):
    """Forward pass for N banded X-dropoff extensions.

    q:     [N, QL]  query codes, direction-normalized (row i uses q[:, i-1])
    qlens: [N]      per-problem query lengths (<= QL)
    r:     [N, RL]  reference codes, RL >= QL + 2*(2*band_width)
    rlens: [N]      per-problem reference lengths

    Returns dict with score [N], maxi [N], maxj [N], eo [N, QL+1, W] int8,
    idc [N, QL+1, W] int32.
    """
    n, ql_max = q.shape
    bw2 = 2 * band_width          # leftBW == rightBW for extensions
    w = 2 * bw2 + 1               # band width (SW.cpp:849-871)
    int32 = jnp.int32
    qlens = qlens.astype(int32)
    rlens = rlens.astype(int32)

    # Pad ref so the row window r_pad[:, i-1 : i-1+w] maps to reference
    # index i - bw2 - 1 + j (j in [0, w)): lead pad of bw2 entries.
    r_pad = jnp.pad(r, ((0, 0), (bw2, w)), constant_values=255)

    # Row-0 initialization (SW.cpp:899-933).
    j_idx = jnp.arange(w)
    delete_count = j_idx - bw2
    pv_row0 = jnp.where(j_idx > bw2, -(go + delete_count * ge),
                        DP_WORST).astype(int32)
    pv_row0 = pv_row0.at[bw2].set(0)     # PVRow[startInit-1] = 0
    pv0 = jnp.broadcast_to(pv_row0, (n, w))
    pv0 = jnp.concatenate([pv0, jnp.full((n, 1), DP_WORST, int32)], axis=1)
    pf_row0 = jnp.full((w,), DP_WORST, int32).at[bw2].set(0)
    pf0 = jnp.concatenate([jnp.broadcast_to(pf_row0, (n, w)),
                           jnp.full((n, 1), DP_WORST, int32)], axis=1)
    pi0 = jnp.zeros((n, w + 1), int32)

    eo = jnp.zeros((n, ql_max + 1, w), jnp.int8)
    idc = jnp.zeros((n, ql_max + 1, w), int32)
    eo = eo.at[:, 0, :].set(
        jnp.where(j_idx > bw2, OP_DELETE, OP_UNKNOWN).astype(jnp.int8))
    idc = idc.at[:, 0, :].set(jnp.where(j_idx > bw2, delete_count, 0))
    # Anti-diagonal insert inits: rows 1..bw2 at j = bw2 - i (SW.cpp:925-933).
    for i in range(1, min(bw2, ql_max) + 1):
        eo = eo.at[:, i, bw2 - i].set(OP_INSERT)
        idc = idc.at[:, i, bw2 - i].set(i)

    def row_body(state):
        (i, pv, pf, pi, eo, idc, max_score, maxi, maxj, done) = state
        start_col = jnp.maximum(bw2 + 1 - i, 0)
        # When startCol > 0: PVCol = PVRow[startCol-1] = -(GO + i*GE).
        edge = i <= bw2
        edge_idx = jnp.maximum(bw2 - i, 0)
        edge_val = jnp.where(edge, -(go + i * ge), pv[:, edge_idx])
        pv = pv.at[:, edge_idx].set(edge_val)
        pv_col0 = jnp.full((n,), jnp.where(edge, -(go + i * ge), DP_WORST),
                           int32)
        end_col = jnp.minimum(bw2 + rlens - i, w - 1)          # [N]
        q_char = jax.lax.dynamic_slice_in_dim(q, i - 1, 1, axis=1)[:, 0]
        r_window = jax.lax.dynamic_slice_in_dim(r_pad, i - 1, w, axis=1)

        row_active = jnp.logical_not(done) & (i <= qlens)       # [N]
        eo_row = jax.lax.dynamic_slice_in_dim(eo, i, 1, axis=1)[:, 0]
        idc_row = jax.lax.dynamic_slice_in_dim(idc, i, 1, axis=1)[:, 0]

        def col_step(j, cstate):
            (pe_col, pd_col, pv_col, pv_cur, pf_cur, pi_cur, row_max,
             eo_row, idc_row, best_v, best_j) = cstate
            active = row_active & (j >= start_col) & (j <= end_col)
            v = pv_cur[:, j]
            r_char = r_window[:, j]
            is_match = q_char == r_char
            g = jnp.where(is_match, v + ms, v - rc)
            opcode = jnp.where(is_match, OP_MATCH,
                               OP_REPLACE).astype(jnp.int8)
            cell_idc = idc_row[:, j]

            # Delete, checked first (SW.cpp:1026-1041).
            ce = pe_col - ge
            ne = pv_col - (go + ge)
            cont_d = (ce >= ne) & (pd_col + 1 <= max_intron)
            pe_new = jnp.where(cont_d, ce, ne)
            pd_new = jnp.where(cont_d, pd_col + 1, 1)
            take_d = pe_new >= g   # extension tie rule: >=
            v1 = jnp.where(take_d, pe_new, g)
            opcode = jnp.where(take_d, OP_DELETE, opcode).astype(jnp.int8)
            cell_idc = jnp.where(take_d, pd_new, cell_idc)

            # Insert (SW.cpp:1043-1060).
            cf = pf_cur[:, j + 1] - ge
            nf = pv_cur[:, j + 1] - (go + ge)
            cont_f = (cf >= nf) & (pi_cur[:, j + 1] + 1 <= max_gap)
            f = jnp.where(cont_f, cf, nf)
            ii = jnp.where(cont_f, pi_cur[:, j + 1] + 1, 1)
            take_f = f >= v1
            v2 = jnp.where(take_f, f, v1)
            opcode = jnp.where(take_f, OP_INSERT, opcode).astype(jnp.int8)
            cell_idc = jnp.where(take_f, ii, cell_idc)

            pf_cur = pf_cur.at[:, j].set(jnp.where(active, f, pf_cur[:, j]))
            pi_cur = pi_cur.at[:, j].set(jnp.where(active, ii, pi_cur[:, j]))
            eo_row = eo_row.at[:, j].set(
                jnp.where(active, opcode, eo_row[:, j]))
            idc_row = idc_row.at[:, j].set(
                jnp.where(active, cell_idc, idc_row[:, j]))
            row_max = jnp.where(active, jnp.maximum(row_max, v2), row_max)
            upd_best = active & (v2 > best_v)
            best_v = jnp.where(upd_best, v2, best_v)
            best_j = jnp.where(upd_best, j, best_j)
            pv_cur = pv_cur.at[:, j].set(jnp.where(active, v2, pv_cur[:, j]))
            pe_col = jnp.where(active, pe_new, pe_col)
            pd_col = jnp.where(active, pd_new, pd_col)
            pv_col = jnp.where(active, v2, pv_col)
            return (pe_col, pd_col, pv_col, pv_cur, pf_cur, pi_cur, row_max,
                    eo_row, idc_row, best_v, best_j)

        cstate = (jnp.full((n,), DP_WORST, int32),   # PECol
                  jnp.zeros((n,), int32),            # PDCol
                  pv_col0,                           # PVCol
                  pv, pf, pi,
                  jnp.full((n,), DP_WORST, int32),   # rowMax
                  eo_row, idc_row,
                  jnp.full((n,), DP_WORST, int32),   # best V in row
                  jnp.zeros((n,), int32))            # its j
        cstate = jax.lax.fori_loop(0, w, col_step, cstate)
        (_, _, _, pv, pf, pi, row_max, eo_row, idc_row, best_v,
         best_j) = cstate

        eo = jax.lax.dynamic_update_slice_in_dim(eo, eo_row[:, None, :], i,
                                                 axis=1)
        idc = jax.lax.dynamic_update_slice_in_dim(idc, idc_row[:, None, :],
                                                  i, axis=1)

        # Global max tracking (strict >, row-major first occurrence).
        upd = row_active & (best_v > max_score)
        max_score = jnp.where(upd, best_v, max_score)
        maxi = jnp.where(upd, i, maxi)
        maxj = jnp.where(upd, best_j, maxj)

        # X-cutoff row break (SW.cpp:1091) + natural end of rows.
        newly_done = row_active & (row_max < max_score - x_cutoff)
        done = done | newly_done | (i >= qlens)
        return (i + 1, pv, pf, pi, eo, idc, max_score, maxi, maxj, done)

    def row_cond(state):
        i = state[0]
        done = state[-1]
        return (i <= ql_max) & jnp.logical_not(jnp.all(done))

    init = (jnp.asarray(1, int32), pv0, pf0, pi0, eo, idc,
            jnp.full((n,), DP_WORST, int32), jnp.zeros((n,), int32),
            jnp.zeros((n,), int32), jnp.zeros((n,), bool))
    final = jax.lax.while_loop(row_cond, row_body, init)
    (_, _, _, _, eo, idc, max_score, maxi, maxj, _) = final
    return {"score": max_score, "maxi": maxi, "maxj": maxj,
            "eo": eo, "idc": idc}




@functools.partial(
    jax.jit,
    static_argnames=("go", "ge", "rc", "ms", "max_gap", "max_intron"))
def batched_anchored_forward(q, qlens, r, rlens, left_bw, right_bw, *,
                             go, ge, rc, ms, max_gap, max_intron):
    """Forward pass for N anchored (gap-fill) alignments.

    A masked full-matrix reformulation that reproduces both reference
    variants — full DP and banded DP with per-problem asymmetric
    left/right bandwidths (SW.cpp:855-871) — in one batched kernel:
    cells outside a problem's band are never updated and read as the same
    DPWorst sentinels the banded code keeps at its band edges, so in-band
    values, opcodes, and the backtrack are identical (in full-matrix
    coordinates the banded anti-diagonal insert inits land on column 0 and
    its row-0 Unknown lands on (0,0), exactly like full DP).  Callers
    encode "full DP" as left_bw = right_bw >= max(qlen, rlen).  Tie rules
    are the anchored ones (strict > for indels, SW.cpp:1036,1054).

    Returns score [N] (= V at (qlen, rlen)), eo [N, QL+1, RL+1] int8,
    idc [N, QL+1, RL+1] int32.
    """
    n, ql_max = q.shape
    rl_max = r.shape[1]
    int32 = jnp.int32
    qlens = qlens.astype(int32)
    rlens = rlens.astype(int32)
    left_bw = left_bw.astype(int32)
    right_bw = right_bw.astype(int32)
    wid = rl_max + 1

    rj = jnp.arange(wid)
    # Row 0: delete boundary for rj in [1, min(rlen, right_bw)].  (Under
    # the reference banded/full selection heuristic rightBW <= rLen for
    # banded problems, so the caps are equivalent to the banded init.)
    row0_live = (rj[None, :] >= 1) & (rj[None, :] <= right_bw[:, None]) \
        & (rj[None, :] <= rlens[:, None])
    pv0 = jnp.where(row0_live, -(go + rj[None, :] * ge), DP_WORST)
    pv0 = pv0.at[:, 0].set(0).astype(int32)
    pf0 = jnp.full((n, wid + 1), DP_WORST, int32)
    pi0 = jnp.zeros((n, wid + 1), int32)
    pv0 = jnp.concatenate([pv0, jnp.full((n, 1), DP_WORST, int32)], axis=1)

    eo = jnp.zeros((n, ql_max + 1, wid), jnp.int8)
    idc = jnp.zeros((n, ql_max + 1, wid), int32)
    eo = eo.at[:, 0, :].set(
        jnp.where(row0_live, OP_DELETE, OP_UNKNOWN).astype(jnp.int8))
    idc = idc.at[:, 0, :].set(jnp.where(row0_live, rj[None, :], 0))
    # First-column insert boundary, rows 1..min(qlen, left_bw).
    i_rows = jnp.arange(ql_max + 1)
    col0_live = (i_rows[None, :] >= 1) & \
        (i_rows[None, :] <= left_bw[:, None]) & \
        (i_rows[None, :] <= qlens[:, None])
    eo = eo.at[:, :, 0].set(
        jnp.where(col0_live, OP_INSERT, OP_UNKNOWN).astype(jnp.int8))
    idc = idc.at[:, :, 0].set(jnp.where(col0_live, i_rows[None, :], 0))

    score0 = jnp.full((n,), DP_WORST, int32)

    def row_body(i, state):
        (pv, pf, pi, eo, idc, score) = state
        row_active = i <= qlens
        q_char = jax.lax.dynamic_index_in_dim(q, i - 1, axis=1,
                                              keepdims=False)
        eo_row = jax.lax.dynamic_slice_in_dim(eo, i, 1, axis=1)[:, 0]
        idc_row = jax.lax.dynamic_slice_in_dim(idc, i, 1, axis=1)[:, 0]
        # New-row V buffer: cells never written stay DPWorst, which is what
        # out-of-band reads must see; column 0 is the insert boundary while
        # in band, stale (and unread) after the band passes it.
        v_new = jnp.full((n, wid + 1), DP_WORST, int32)
        v_new = v_new.at[:, 0].set(
            jnp.where(row_active & (i <= left_bw), -(go + i * ge),
                      pv[:, 0]))

        def col_step(j, cstate):
            (pe_col, pd_col, pv_col, v_new, pf_cur, pi_cur, eo_row,
             idc_row, score) = cstate
            in_band = (j >= jnp.maximum(i - left_bw, 1)) & \
                (j <= jnp.minimum(i + right_bw, rlens))
            active = row_active & in_band
            v = pv[:, j - 1]
            r_char = r[:, j - 1]
            is_match = q_char == r_char
            g = jnp.where(is_match, v + ms, v - rc)
            opcode = jnp.where(is_match, OP_MATCH,
                               OP_REPLACE).astype(jnp.int8)
            cell_idc = jnp.zeros((n,), int32)

            ce = pe_col - ge
            ne = pv_col - (go + ge)
            cont_d = (ce >= ne) & (pd_col + 1 <= max_intron)
            pe_new = jnp.where(cont_d, ce, ne)
            pd_new = jnp.where(cont_d, pd_col + 1, 1)
            take_d = pe_new > g          # anchored tie rule: >
            v1 = jnp.where(take_d, pe_new, g)
            opcode = jnp.where(take_d, OP_DELETE, opcode).astype(jnp.int8)
            cell_idc = jnp.where(take_d, pd_new, cell_idc)

            cf = pf_cur[:, j] - ge
            nf = pv[:, j] - (go + ge)
            cont_f = (cf >= nf) & (pi_cur[:, j] + 1 <= max_gap)
            f = jnp.where(cont_f, cf, nf)
            ii = jnp.where(cont_f, pi_cur[:, j] + 1, 1)
            take_f = f > v1
            v2 = jnp.where(take_f, f, v1)
            opcode = jnp.where(take_f, OP_INSERT, opcode).astype(jnp.int8)
            cell_idc = jnp.where(take_f, ii, cell_idc)

            pf_cur = pf_cur.at[:, j].set(jnp.where(active, f, pf_cur[:, j]))
            pi_cur = pi_cur.at[:, j].set(jnp.where(active, ii,
                                                   pi_cur[:, j]))
            eo_row = eo_row.at[:, j].set(jnp.where(active, opcode,
                                                   eo_row[:, j]))
            idc_row = idc_row.at[:, j].set(jnp.where(active, cell_idc,
                                                     idc_row[:, j]))
            v_new = v_new.at[:, j].set(jnp.where(active, v2, v_new[:, j]))
            score = jnp.where(active & (i == qlens) & (j == rlens), v2,
                              score)
            pe_col = jnp.where(active, pe_new, pe_col)
            pd_col = jnp.where(active, pd_new, pd_col)
            pv_col = jnp.where(active, v2, pv_col)
            return (pe_col, pd_col, pv_col, v_new, pf_cur, pi_cur, eo_row,
                    idc_row, score)

        pv_col0 = jnp.where(i <= left_bw, -(go + i * ge),
                            DP_WORST).astype(int32)
        cstate = (jnp.full((n,), DP_WORST, int32), jnp.zeros((n,), int32),
                  pv_col0, v_new, pf, pi, eo_row, idc_row, score)
        cstate = jax.lax.fori_loop(1, wid, col_step, cstate)
        (_, _, _, v_new, pf, pi, eo_row, idc_row, score) = cstate
        eo = jax.lax.dynamic_update_slice_in_dim(eo, eo_row[:, None, :], i,
                                                 axis=1)
        idc = jax.lax.dynamic_update_slice_in_dim(idc, idc_row[:, None, :],
                                                  i, axis=1)
        pv2 = jnp.where(row_active[:, None], v_new, pv)
        return (pv2, pf, pi, eo, idc, score)

    state = (pv0, pf0, pi0, eo, idc, score0)
    state = jax.lax.fori_loop(1, ql_max + 1, row_body, state)
    (_, _, _, eo, idc, score) = state
    return {"score": score, "eo": eo, "idc": idc}


