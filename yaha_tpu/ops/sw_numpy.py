"""NumPy twins of the batched DP forwards (host fallback / test backend).

Same batched-over-problems structure and identical cell semantics as
ops/sw_batch.py, but plain numpy with Python row/column loops — no XLA
compile cost, fast enough for host-side batches, and byte-exact with both
the oracle and the device kernels.
"""
from __future__ import annotations

import numpy as np

from .dp_common import (DP_WORST, OP_UNKNOWN, OP_MATCH, OP_REPLACE,
                        OP_INSERT, OP_DELETE)


def batched_extension_forward_np(q, qlens, r, rlens, *, band_width, go, ge,
                                 rc, ms, max_gap, max_intron, x_cutoff):
    """NumPy port of batched_extension_forward (see sw_batch.py)."""
    n, ql_max = q.shape
    bw2 = 2 * band_width
    w = 2 * bw2 + 1
    qlens = np.asarray(qlens, np.int64)
    rlens = np.asarray(rlens, np.int64)
    r_pad = np.pad(r, ((0, 0), (bw2, w)), constant_values=255)

    j_idx = np.arange(w)
    pv = np.full((n, w + 1), DP_WORST, np.int64)
    pv[:, :w] = np.where(j_idx > bw2, -(go + (j_idx - bw2) * ge), DP_WORST)
    pv[:, bw2] = 0
    pf = np.full((n, w + 1), DP_WORST, np.int64)
    pf[:, bw2] = 0
    pi = np.zeros((n, w + 1), np.int64)

    eo = np.zeros((n, ql_max + 1, w), np.int8)
    idc = np.zeros((n, ql_max + 1, w), np.int32)
    eo[:, 0, :] = np.where(j_idx > bw2, OP_DELETE, OP_UNKNOWN)
    idc[:, 0, :] = np.where(j_idx > bw2, j_idx - bw2, 0)
    for i in range(1, min(bw2, ql_max) + 1):
        eo[:, i, bw2 - i] = OP_INSERT
        idc[:, i, bw2 - i] = i

    max_score = np.full(n, DP_WORST, np.int64)
    maxi = np.zeros(n, np.int64)
    maxj = np.zeros(n, np.int64)
    done = np.zeros(n, bool)

    for i in range(1, ql_max + 1):
        row_active = ~done & (i <= qlens)
        if not row_active.any():
            break
        start_col = max(bw2 + 1 - i, 0)
        end_col = np.minimum(bw2 + rlens - i, w - 1)
        if i <= bw2:
            pv[:, bw2 - i] = -(go + i * ge)
            pv_col = np.full(n, -(go + i * ge), np.int64)
        else:
            pv_col = np.full(n, DP_WORST, np.int64)
        q_char = q[:, i - 1].astype(np.int64)
        r_win = r_pad[:, i - 1:i - 1 + w].astype(np.int64)

        pe_col = np.full(n, DP_WORST, np.int64)
        pd_col = np.zeros(n, np.int64)
        row_max = np.full(n, DP_WORST, np.int64)
        best_v = np.full(n, DP_WORST, np.int64)
        best_j = np.zeros(n, np.int64)
        eo_row = eo[:, i, :]
        idc_row = idc[:, i, :]
        for j in range(start_col, w):
            active = row_active & (j >= start_col) & (j <= end_col)
            if not active.any():
                continue
            v = pv[:, j]
            is_match = q_char == r_win[:, j]
            g = np.where(is_match, v + ms, v - rc)
            opcode = np.where(is_match, OP_MATCH, OP_REPLACE).astype(np.int8)
            cell_idc = np.zeros(n, np.int64)

            ce = pe_col - ge
            ne = pv_col - (go + ge)
            cont_d = (ce >= ne) & (pd_col + 1 <= max_intron)
            pe_new = np.where(cont_d, ce, ne)
            pd_new = np.where(cont_d, pd_col + 1, 1)
            take_d = pe_new >= g
            v1 = np.where(take_d, pe_new, g)
            opcode = np.where(take_d, OP_DELETE, opcode).astype(np.int8)
            cell_idc = np.where(take_d, pd_new, cell_idc)

            cf = pf[:, j + 1] - ge
            nf = pv[:, j + 1] - (go + ge)
            cont_f = (cf >= nf) & (pi[:, j + 1] + 1 <= max_gap)
            f = np.where(cont_f, cf, nf)
            ii = np.where(cont_f, pi[:, j + 1] + 1, 1)
            take_f = f >= v1
            v2 = np.where(take_f, f, v1)
            opcode = np.where(take_f, OP_INSERT, opcode).astype(np.int8)
            cell_idc = np.where(take_f, ii, cell_idc)

            pf[:, j] = np.where(active, f, pf[:, j])
            pi[:, j] = np.where(active, ii, pi[:, j])
            eo_row[:, j] = np.where(active, opcode, eo_row[:, j])
            idc_row[:, j] = np.where(active, cell_idc, idc_row[:, j])
            row_max = np.where(active, np.maximum(row_max, v2), row_max)
            upd = active & (v2 > best_v)
            best_v = np.where(upd, v2, best_v)
            best_j = np.where(upd, j, best_j)
            pv[:, j] = np.where(active, v2, pv[:, j])
            pe_col = np.where(active, pe_new, pe_col)
            pd_col = np.where(active, pd_new, pd_col)
            pv_col = np.where(active, v2, pv_col)

        upd = row_active & (best_v > max_score)
        max_score = np.where(upd, best_v, max_score)
        maxi = np.where(upd, i, maxi)
        maxj = np.where(upd, best_j, maxj)
        done |= (row_active & (row_max < max_score - x_cutoff)) | (i >= qlens)

    return {"score": max_score, "maxi": maxi, "maxj": maxj, "eo": eo,
            "idc": idc}


def batched_anchored_forward_np(q, qlens, r, rlens, left_bw, right_bw, *,
                                go, ge, rc, ms, max_gap, max_intron):
    """NumPy port of batched_anchored_forward (see sw_batch.py)."""
    n, ql_max = q.shape
    rl_max = r.shape[1]
    qlens = np.asarray(qlens, np.int64)
    rlens = np.asarray(rlens, np.int64)
    left_bw = np.asarray(left_bw, np.int64)
    right_bw = np.asarray(right_bw, np.int64)
    wid = rl_max + 1

    rj = np.arange(wid)
    row0_live = (rj[None, :] >= 1) & (rj[None, :] <= right_bw[:, None]) \
        & (rj[None, :] <= rlens[:, None])
    pv = np.where(row0_live, -(go + rj[None, :] * ge), DP_WORST).astype(np.int64)
    pv[:, 0] = 0
    pv = np.concatenate([pv, np.full((n, 1), DP_WORST, np.int64)], axis=1)
    pf = np.full((n, wid + 1), DP_WORST, np.int64)
    pi = np.zeros((n, wid + 1), np.int64)

    eo = np.zeros((n, ql_max + 1, wid), np.int8)
    idc = np.zeros((n, ql_max + 1, wid), np.int32)
    eo[:, 0, :] = np.where(row0_live, OP_DELETE, OP_UNKNOWN)
    idc[:, 0, :] = np.where(row0_live, rj[None, :], 0)
    i_rows = np.arange(ql_max + 1)
    col0_live = (i_rows[None, :] >= 1) & \
        (i_rows[None, :] <= left_bw[:, None]) & \
        (i_rows[None, :] <= qlens[:, None])
    eo[:, :, 0] = np.where(col0_live, OP_INSERT, OP_UNKNOWN)
    idc[:, :, 0] = np.where(col0_live, i_rows[None, :], 0)

    score = np.full(n, DP_WORST, np.int64)
    rr = r.astype(np.int64)

    for i in range(1, ql_max + 1):
        row_active = i <= qlens
        if not row_active.any():
            break
        q_char = q[:, i - 1].astype(np.int64)
        v_new = np.full((n, wid + 1), DP_WORST, np.int64)
        v_new[:, 0] = np.where(row_active & (i <= left_bw), -(go + i * ge),
                               pv[:, 0])
        pe_col = np.full(n, DP_WORST, np.int64)
        pd_col = np.zeros(n, np.int64)
        pv_col = np.where(i <= left_bw, -(go + i * ge), DP_WORST)
        lo = np.maximum(i - left_bw, 1)
        hi = np.minimum(i + right_bw, rlens)
        eo_row = eo[:, i, :]
        idc_row = idc[:, i, :]
        jlo = int(lo.min())
        jhi = int(hi.max())
        for j in range(jlo, min(jhi, wid - 1) + 1):
            active = row_active & (j >= lo) & (j <= hi)
            if not active.any():
                continue
            v = pv[:, j - 1]
            is_match = q_char == rr[:, j - 1]
            g = np.where(is_match, v + ms, v - rc)
            opcode = np.where(is_match, OP_MATCH, OP_REPLACE).astype(np.int8)
            cell_idc = np.zeros(n, np.int64)

            ce = pe_col - ge
            ne = pv_col - (go + ge)
            cont_d = (ce >= ne) & (pd_col + 1 <= max_intron)
            pe_new = np.where(cont_d, ce, ne)
            pd_new = np.where(cont_d, pd_col + 1, 1)
            take_d = pe_new > g
            v1 = np.where(take_d, pe_new, g)
            opcode = np.where(take_d, OP_DELETE, opcode).astype(np.int8)
            cell_idc = np.where(take_d, pd_new, cell_idc)

            cf = pf[:, j] - ge
            nf = pv[:, j] - (go + ge)
            cont_f = (cf >= nf) & (pi[:, j] + 1 <= max_gap)
            f = np.where(cont_f, cf, nf)
            ii = np.where(cont_f, pi[:, j] + 1, 1)
            take_f = f > v1
            v2 = np.where(take_f, f, v1)
            opcode = np.where(take_f, OP_INSERT, opcode).astype(np.int8)
            cell_idc = np.where(take_f, ii, cell_idc)

            pf[:, j] = np.where(active, f, pf[:, j])
            pi[:, j] = np.where(active, ii, pi[:, j])
            eo_row[:, j] = np.where(active, opcode, eo_row[:, j])
            idc_row[:, j] = np.where(active, cell_idc, idc_row[:, j])
            v_new[:, j] = np.where(active, v2, v_new[:, j])
            score = np.where(active & (i == qlens) & (j == rlens), v2, score)
            pe_col = np.where(active, pe_new, pe_col)
            pd_col = np.where(active, pd_new, pd_col)
            pv_col = np.where(active, v2, pv_col)

        pv = np.where(row_active[:, None], v_new, pv)

    return {"score": score, "eo": eo, "idc": idc}
