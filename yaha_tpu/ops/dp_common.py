"""Backend-independent DP constants and host-side backtrack decodes.

Shared by the XLA (sw_batch), numpy (sw_numpy), Pallas (sw_pallas), and
native C++ backends; importing this module must stay jax-free so the
host-only paths (oracle, native, numpy) never pay the jax import cost.
"""
from __future__ import annotations

DP_WORST = -(0x7FFFFF00)

# Op codes (int8) for the device arrays; mapping to the reference op chars.
OP_UNKNOWN = 0
OP_MATCH = 1
OP_REPLACE = 2
OP_INSERT = 3
OP_DELETE = 4
OP_CHARS = ["U", "M", "R", "I", "D"]


def traceback_extension(eo, idc, maxi, maxj, score, bw2, reverse):
    """Host run-length decode of one problem's backtrack arrays.

    Mirrors the banded backtrack (SW.cpp:1137-1195): Delete moves left in
    the band, Insert moves up-right, M/R up.  Returns (items, added_q,
    added_r) with items in final list order.
    """
    if score <= 0:
        return [], 0, 0
    x = int(maxj)
    y = int(maxi)
    prev = int(eo[y][x])
    op_len = 0
    items = []
    while True:
        code = int(eo[y][x])
        if code == OP_UNKNOWN:
            break
        length = int(idc[y][x])
        if code == OP_DELETE:
            x -= length
        elif code == OP_INSERT:
            x += length
            y -= length
        else:
            y -= 1
            length = 1
        if prev != code:
            if reverse:
                items.append([OP_CHARS[prev], op_len])
            else:
                items.insert(0, [OP_CHARS[prev], op_len])
            prev = code
            op_len = length
        else:
            op_len += length
    if reverse:
        items.append([OP_CHARS[prev], op_len])
    else:
        items.insert(0, [OP_CHARS[prev], op_len])
    added_q = int(maxi)
    added_r = int(maxi) + (int(maxj) - bw2)
    return items, added_q, added_r


def traceback_anchored_banded(eo_b, idc_b, lbw, qlen, rlen):
    """Anchored run-length decode in band-relative coordinates.

    `eo_b`/`idc_b` are [QL+1, WBAND] with column o = j - i + lbw (the
    layout produced by sw_pallas.anchored_forward_pallas_banded).  The
    walk is identical to traceback_anchored after the change of frame:
    M/R keeps o (diagonal), Delete length L moves o -= L, Insert length
    L moves y -= L and o += L.  Returns the same items list.
    """
    y = int(qlen)
    o = int(rlen) - y + int(lbw)
    prev = int(eo_b[y][o])
    op_len = 0
    items = []
    while True:
        code = int(eo_b[y][o])
        if code == OP_UNKNOWN:
            break
        length = int(idc_b[y][o])
        if code == OP_DELETE:
            o -= length
        elif code == OP_INSERT:
            y -= length
            o += length
        else:
            y -= 1
            length = 1
        if prev != code:
            items.insert(0, [OP_CHARS[prev], op_len])
            prev = code
            op_len = length
        else:
            op_len += length
    items.insert(0, [OP_CHARS[prev], op_len])
    return items


def traceback_anchored(eo, idc, qlen, rlen):
    """Host run-length decode for anchored problems (full coordinates).

    Mirrors the non-banded backtrack arm (SW.cpp:1172-1178); banded
    problems computed by batched_anchored_forward land on the same cells
    in full coordinates.
    """
    x = int(rlen)
    y = int(qlen)
    prev = int(eo[y][x])
    op_len = 0
    items = []
    while True:
        code = int(eo[y][x])
        if code == OP_UNKNOWN:
            break
        length = int(idc[y][x])
        if code == OP_DELETE:
            x -= length
        elif code == OP_INSERT:
            y -= length
        else:
            x -= 1
            y -= 1
            length = 1
        if prev != code:
            items.insert(0, [OP_CHARS[prev], op_len])
            prev = code
            op_len = length
        else:
            op_len += length
    items.insert(0, [OP_CHARS[prev], op_len])
    return items
