"""Device-side seed stage: batched rolling hash, SO gather, fragment keys.

The TPU-native replacement for the reference's per-read seed loop
(Query.c:361-412) and heap-based fragment sort (QueryMatch.c:43-121):

  * hashes for every offset of a padded read batch in one vectorized pass;
  * seed counts via a gather from the HBM-resident SO array (optionally
    sharded over the `model` mesh axis, see parallel/mesh.py);
  * fragment formation as a sort over packed (diag<<32|qo) keys plus
    run-boundary detection — the same order the reference's heap merge
    produces, as a segmented scan instead of a pointer structure.

Ragged hit expansion (each offset contributes `count` reference offsets)
is bounded by a per-read hit capacity; reads whose hits overflow the
capacity fall back to the host path (the reference's per-query realloc
analog, Query.c:81-100, turned into a static bucket).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

M32 = 0xFFFFFFFF


@functools.partial(jax.jit, static_argnames=("word_len",))
def batched_seed_hashes(codes, lengths, *, word_len):
    """codes [B, L] uint8 -> (hashes [B, L-wl+1] int64, clean mask).

    clean[b, p] is True when window p is inside the read and contains no
    non-ACGT code (the reference's skip loop, Query.c:371-387).
    """
    # int32 throughout: hashes fit 2*wordLen <= 30 bits (Main.c caps
    # -L at 15); x64 stays off.
    b, l = codes.shape
    n = l - word_len + 1
    c = codes.astype(jnp.int32)
    bad = (c > 3).astype(jnp.int32)
    bad_cum = jnp.concatenate([jnp.zeros((b, 1), jnp.int32),
                               jnp.cumsum(bad, axis=1)], axis=1)
    clean = (bad_cum[:, word_len:] - bad_cum[:, :-word_len]) == 0
    h = jnp.zeros((b, n), jnp.int32)
    for i in range(word_len):
        h = (h << 2) | c[:, i:i + n]
    pos = jnp.arange(n)[None, :]
    in_read = pos <= (lengths[:, None] - word_len)
    clean = clean & in_read
    return jnp.where(clean, h, 0), clean


@jax.jit
def seed_counts(hashes, clean, so):
    """Gather SO counts; zero where not clean (Query.c:391-405)."""
    so = so.astype(jnp.int64)
    counts = so[hashes + 1] - so[hashes]
    return jnp.where(clean, counts, 0), jnp.where(clean, so[hashes], 0)


@functools.partial(jax.jit, static_argnames=("max_hits", "capacity"))
def expand_sort_hits_device(hashes, clean, so, roa, *, max_hits, capacity):
    """Fully on-device hit expansion + (diag, qo) sort for a strand batch.

    The device replacement for the reference seed loop + heap merge
    (Query.c:361-412, QueryMatch.c:52-121): SO gather -> ragged ROA run
    expansion into a fixed [B, C] hit buffer (searchsorted over the
    kept-count prefix sums assigns each slot its window) -> two-key
    lexicographic sort on (diag uint32, qo) via lax.sort.

    hashes/clean: [B, N] from batched_seed_hashes; so/roa: device uint32.
    Returns dict with diag uint32 [B, C], qo int32 [B, C], total [B],
    overflow [B] (hits exceed capacity -> caller retries a larger
    capacity tier or falls back) and wrapped [B, N] (window's run is
    entirely ro < qo: the reference heap pre-seed then reads past the
    run -- the phantom-hit quirk, QueryMatch.c:57-69; the caller
    injects the exact phantom hits host-side per flagged window,
    models/seeder._inject_row) plus allwrapped [B] = any(wrapped).
    """
    b, n = hashes.shape
    so_lo = so[hashes]
    cnt_u = so[hashes + 1] - so_lo            # uint32, wrap-safe
    counts = cnt_u.astype(jnp.int32)
    kept_mask = clean & (counts > 0) & (counts <= max_hits)
    kept = jnp.where(kept_mask, counts, 0)
    cum = jnp.cumsum(kept, axis=1)
    total = cum[:, -1]
    overflow = total > capacity

    t = jnp.broadcast_to(jnp.arange(capacity, dtype=jnp.int32)[None, :],
                         (b, capacity))
    win = jax.vmap(
        lambda c, tt: jnp.searchsorted(c, tt, side="right"))(cum, t)
    win_c = jnp.minimum(win, n - 1)
    base = jnp.where(win_c > 0,
                     jnp.take_along_axis(cum, jnp.maximum(win_c - 1, 0),
                                         axis=1), 0)
    rank = (t - base).astype(jnp.uint32)
    off = jnp.take_along_axis(jnp.where(kept_mask, so_lo, 0), win_c,
                              axis=1)
    valid = t < total[:, None]
    idx = jnp.where(valid, (off + rank).astype(jnp.int32), 0)
    ro = roa[idx]                              # uint32
    qo = win_c.astype(jnp.int32)
    diag = ro - qo.astype(jnp.uint32)          # uint32 wrap (fragDiag)

    # Phantom-quirk detection: any kept window whose whole run wraps.
    # Window w's expansion occupies slots [cum[w]-kept[w], cum[w]), so
    # any(ok) over the run is a prefix-sum difference — no segment
    # reduction (jax.ops.segment_max over [8192, C] batches produced
    # wrong flags on TPU; a cumsum + two gathers is exact and cheaper).
    # Flags are only consumed when the row did NOT overflow this
    # capacity tier (the clamp truncates runs past the cutoff).
    ok = jnp.where(valid & (ro >= qo.astype(jnp.uint32)), 1, 0)
    okc = jnp.concatenate(
        [jnp.zeros((b, 1), ok.dtype), jnp.cumsum(ok, axis=1)], axis=1)
    w_end = jnp.minimum(cum, capacity)
    w_start = jnp.minimum(cum - kept, capacity)
    any_ok = (jnp.take_along_axis(okc, w_end, axis=1) -
              jnp.take_along_axis(okc, w_start, axis=1))
    wrapped = kept_mask & (any_ok == 0)
    allwrapped = jnp.any(wrapped, axis=1)

    diag_s = jnp.where(valid, diag, jnp.uint32(0xFFFFFFFF))
    qo_s = jnp.where(valid, qo, jnp.int32(0x7FFFFFFF))
    diag_sorted, qo_sorted = jax.lax.sort((diag_s, qo_s), num_keys=2,
                                          dimension=1)
    return {"diag": diag_sorted, "qo": qo_sorted, "total": total,
            "overflow": overflow, "wrapped": wrapped,
            "allwrapped": allwrapped}


@jax.jit
def strand_hit_totals(hashes, clean, so, max_hits):
    """Per-strand kept-hit totals (for capacity bucket selection) and raw
    seed-match totals (the seedMatches stat, Query.c:395-400)."""
    so_lo = so[hashes]
    counts = (so[hashes + 1] - so_lo).astype(jnp.int32)
    kept_mask = clean & (counts > 0) & (counts <= max_hits)
    seed_mask = clean & (counts > 0) & (counts <= max_hits)
    kept = jnp.where(kept_mask, counts, 0)
    return kept.sum(axis=1), jnp.where(seed_mask, counts, 0).sum(axis=1)


def expand_and_sort_hits(counts, so_offsets, roa, max_hits, capacity):
    """Expand per-offset ROA runs and sort by (diag, qo) packed keys.

    counts/so_offsets: [B, N] from seed_counts (host numpy arrays).
    Returns per-read (diag, qo) arrays in heap-merge order plus an
    overflow mask for reads exceeding `capacity` expanded hits.  Runs on
    host numpy today (ragged gather); the sorted output feeds the same
    coalescing as the host path.
    """
    b, n = counts.shape
    kept = np.where(counts <= max_hits, counts, 0)
    totals = kept.sum(axis=1)
    overflow = totals > capacity
    out = []
    for k in range(b):
        if overflow[k]:
            out.append(None)
            continue
        offs = np.flatnonzero(kept[k])
        if len(offs) == 0:
            out.append((np.empty(0, np.int64), np.empty(0, np.int64)))
            continue
        qo = np.repeat(offs, kept[k][offs])
        idx = np.concatenate([np.arange(s, s + c) for s, c in
                              zip(so_offsets[k][offs], kept[k][offs])])
        ro = np.asarray(roa[idx], dtype=np.int64)
        diag = (ro - qo) & M32
        order = np.lexsort((qo, diag))
        out.append((diag[order], qo[order]))
    return out, overflow


@functools.partial(jax.jit, static_argnames=("word_len",))
def fragment_boundaries(diag, qo, valid, *, word_len):
    """Segmented run coalescing on device: new-fragment boundaries where
    the diagonal changes or the query-offset step exceeds wordLen
    (QueryMatch.c:99-115)."""
    d_change = jnp.concatenate(
        [jnp.ones_like(diag[:, :1], dtype=bool),
         (diag[:, 1:] != diag[:, :-1]) | (qo[:, 1:] - qo[:, :-1] > word_len)],
        axis=1)
    return d_change & valid
