"""k-mer index construction with byte-exact reference file output.

Port of indexFile (Index.c:49-335), re-expressed as vectorized array ops:
the reference's two rolling-hash genome scans become one vectorized hash +
bincount + stable argsort (which reproduces the per-k-mer ascending
reference-offset order of the two-pass fill), and the third pass is the
order-preserving Floyd down-sampling with the fixed Marsaglia seed.

The subtle part is *which* window positions are scanned when skipDist > 1:
the scan starts on the grid {seqStart + k*skipDist} but renormalizes to the
absolute grid {k*skipDist} after every run of non-ACGT codes
(Index.c:108-117).  scan_positions() reproduces that exactly.
"""
from __future__ import annotations

import numpy as np

from ..utils.rng import RandState
from ..io.genome import Genome

INDEX_FILE_VERSION = 0xFFFFFFFF  # (UINT)-1, Math.h:76


def scan_positions(codes: np.ndarray, start: int, length: int,
                   word_len: int, skip_dist: int) -> np.ndarray:
    """Window start offsets the reference scan visits-and-counts.

    Exact emulation of the skip/renormalize loop in Index.c:96-128 for one
    sequence [start, start+length).
    """
    ending = start + length - word_len
    if ending < start:
        return np.empty(0, dtype=np.uint32)
    n = len(codes)
    # Bad (non-ACGT) code positions at-or-after start.
    bad = np.flatnonzero(codes[start:] > 3) + start
    positions = []
    base = start  # current grid anchor
    bi = 0        # index into bad[] of first bad >= current window start
    while base <= ending:
        # First bad position >= base.
        bi = np.searchsorted(bad, base)
        p_bad = int(bad[bi]) if bi < len(bad) else n + word_len
        # Windows on grid {base, base+s, ...} with window end before p_bad.
        # Window [p, p+wl) is good iff p + wl - 1 < p_bad.
        last_good_start = min(ending, p_bad - word_len)
        if last_good_start >= base:
            count = (last_good_start - base) // skip_dist + 1
            positions.append((base + skip_dist *
                              np.arange(count, dtype=np.int64))
                             .astype(np.uint32))
            next_window = base + count * skip_dist
        else:
            next_window = base
        if next_window > ending or p_bad > n:
            break
        # The scan hit the bad code: skip the run of bad codes starting at
        # p_bad + 1, then renormalize to the absolute skipDist grid.
        cur = p_bad + 1
        while cur < n and codes[cur] > 3:
            cur += 1
        base = ((cur + skip_dist - 1) // skip_dist) * skip_dist
        if cur >= n:
            break
    if not positions:
        return np.empty(0, dtype=np.uint32)
    return np.concatenate(positions)


def genome_scan_positions(genome: Genome, word_len: int,
                          skip_dist: int) -> np.ndarray:
    parts = [scan_positions(genome.codes, int(s), int(l), word_len, skip_dist)
             for s, l in zip(genome.starting_offsets, genome.lengths)]
    return (np.concatenate(parts) if parts
            else np.empty(0, dtype=np.uint32))


def hash_windows(codes: np.ndarray, positions: np.ndarray,
                 word_len: int) -> np.ndarray:
    """2-bit hash per window: codes packed MSB-first (Index.c:32-43).

    Computed as a sliding-window rolling hash over the contiguous span
    covering `positions` (shifted-slice ORs are sequential-bandwidth ops;
    per-position gathers are ~10x slower at genome scale), then gathered
    at the requested positions.  2*word_len <= 30 bits fits int32.
    """
    if len(positions) == 0:
        return np.empty(0, dtype=np.int64)
    lo = int(positions[0])
    hi = int(positions[-1])
    nwin = hi - lo + 1
    c = codes[lo:hi + word_len].astype(np.int32)
    h = np.zeros(nwin, dtype=np.int32)
    for i in range(word_len):
        h = (h << 2) | c[i:i + nwin]
    return h[positions - lo]   # int32: 2*word_len <= 30 bits


def build_index(genome: Genome, word_len: int, skip_dist: int,
                max_hits: int, chunk: int = 64 << 20):
    """Returns (starting_offs[HTsize+1] uint32, roa uint32, total_matches).

    Memory-bounded two-pass construction (the reference's structure,
    Index.c:96-242, vectorized): pass 1 accumulates per-k-mer counts with
    chunked bincounts; pass 2 scatters positions into the ROA at
    SO[h] + seen-so-far[h], processing `chunk` windows at a time so peak
    memory is SO + ROA + one chunk regardless of genome size (hg18-scale
    at wordLen 15 stays ~2.5x the output size instead of ~6x).
    """
    ht_size = 1 << (2 * word_len)
    positions = genome_scan_positions(genome, word_len, skip_dist)
    n = len(positions)

    counts = np.zeros(ht_size, dtype=np.uint32)
    for lo in range(0, n, chunk):
        h = hash_windows(genome.codes, positions[lo:lo + chunk], word_len)
        np.add(counts, np.bincount(h, minlength=ht_size), out=counts,
               casting="unsafe")

    so = np.zeros(ht_size + 1, dtype=np.int64)
    np.cumsum(counts, out=so[1:])
    roa = np.empty(int(so[-1]), dtype=np.uint32)
    seen = np.zeros(ht_size, dtype=np.uint32)
    for lo in range(0, n, chunk):
        pos_c = positions[lo:lo + chunk]
        h = hash_windows(genome.codes, pos_c, word_len)
        # Stable sort within the chunk preserves ascending position order
        # per k-mer; combined with the running `seen` offsets this equals
        # the reference's in-scan-order ROA fill (Index.c:222-229).
        order = np.argsort(h, kind="stable")
        h_sorted = h[order]
        # Rank of each element within its k-mer run.
        run_starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(h_sorted)) + 1])
        rank = np.arange(len(h_sorted)) - np.repeat(
            run_starts, np.diff(np.concatenate([run_starts,
                                                [len(h_sorted)]])))
        roa[so[h_sorted] + seen[h_sorted] + rank] = pos_c[order]
        np.add(seen, np.bincount(h_sorted, minlength=ht_size), out=seen,
               casting="unsafe")
    counts = np.diff(so)

    # Third pass: random down-sampling of k-mers over maxHits
    # (Index.c:271-315).  RNG state flows across k-mers in ascending hash
    # order from the fixed default Marsaglia seed.
    over = np.flatnonzero(counts > max_hits)
    if len(over):
        rng = RandState.default()
        so = np.zeros(ht_size + 1, dtype=np.int64)
        np.cumsum(counts, out=so[1:])
        pieces = []
        prev = 0
        for h in over:
            lo, hi = int(so[h]), int(so[h + 1])
            pieces.append(roa[prev:lo])
            pieces.append(rng.rand_sample(roa[lo:hi], max_hits))
            prev = hi
        pieces.append(roa[prev:])
        roa = np.ascontiguousarray(np.concatenate(pieces), dtype=np.uint32)
        counts = np.minimum(counts, max_hits)

    so64 = np.zeros(ht_size + 1, dtype=np.int64)
    np.cumsum(counts, out=so64[1:])
    starting_offs = so64.astype(np.uint32)
    total_matches = int(so64[-1])
    return starting_offs, roa, total_matches


def print_count_statistics(starting_offs, word_len, file=None):
    """Index statistics (outputCountStatistics analog, Index.c:337-407):
    total hits, zero-hit k-mers, and count percentiles over k-mers and
    hits."""
    import sys
    file = file or sys.stderr
    so = np.asarray(starting_offs, dtype=np.int64)
    counts = np.diff(so)
    total = int(counts.sum())
    ht_size = len(counts)
    print("Found %d total hits across %d %d-mers." % (total, ht_size,
                                                      word_len), file=file)
    print("Found %d %d-mers with zero hits." %
          (int((counts == 0).sum()), word_len), file=file)
    percs = [0.25, 0.50, 0.75, 0.90, 0.95, 0.99, 0.999, 0.9999]
    nz = np.sort(counts)
    hit_cum = np.cumsum(nz)
    for p in percs:
        kmer_thresh = nz[min(int(ht_size * p + 0.5), ht_size - 1)]
        hit_idx = int(np.searchsorted(hit_cum, total * p + 0.5))
        hit_thresh = nz[min(hit_idx, ht_size - 1)]
        print("The %g percentile of %d-mers is %d, and of total matches "
              "is %d." % (p, word_len, int(kmer_thresh), int(hit_thresh)),
              file=file)
