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
    b, l = codes.shape
    n = l - word_len + 1
    c = codes.astype(jnp.int64)
    bad = (c > 3).astype(jnp.int64)
    bad_cum = jnp.concatenate([jnp.zeros((b, 1), jnp.int64),
                               jnp.cumsum(bad, axis=1)], axis=1)
    clean = (bad_cum[:, word_len:] - bad_cum[:, :-word_len]) == 0
    h = jnp.zeros((b, n), jnp.int64)
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
