"""Device (TPU) front end: seed -> fragment -> chain on-device.

Replaces the host `process_strand` in the batched engines with device
stages (SURVEY.md section 2.3 device-kernel list):

  1. batched rolling hash + SO gather          (ops/seeds_jax.py)
  2. ragged ROA expansion + (diag, qo) sort    (expand_sort_hits_device)
  3. fragment coalescing                       (host numpy over the batch)
  4. fragment-graph chain DP                   (ops/chain_jax.py), run
     round-synchronized: every active region's next clump extraction is
     one batched device call; the extraction bookkeeping (insertFragment
     chops, cleanUpClump, coverage elimination -- the mutation-heavy
     scalar logic of GraphPath.cpp:272-292 / QueryMatch.c:161-215) stays
     on host between rounds.

Reads that need the phantom-hit quirk (QueryMatch.c:57-69) stay on the
device path: the device flags each wrapped seed run and the exact
phantom hits are injected per flagged window host-side
(_inject_phantoms).  Hit-capacity overflow retries a larger fixed
capacity tier (sharded path) before falling back; only reads exceeding
the top tier take the host seed loop.  Emission order is replayed per
read exactly as the sequential host path would produce it, so byte
parity is preserved end-to-end.
"""
from __future__ import annotations

import numpy as np

from ..core.chain import (build_best_clump, check_start_end_coverage,
                          clean_up_clump, insert_fragment, process_strand)
from ..core.clumps import Clump
from ..core.frags import Fragment, abs_diag_diff

M32 = 0xFFFFFFFF


def _pow2(n, lo, hi):
    b = lo
    while b < n and b < hi:
        b *= 2
    return b


class _Region:
    """One reference region mid-extraction (processFragmentRangeUsingGraph
    state across rounds)."""

    __slots__ = ("key", "frags", "used", "coverage", "clumps", "done")

    def __init__(self, key, frags, query_len):
        self.key = key                  # (read_idx, strand, region_idx)
        self.frags = frags              # Fragment objects (chops persist)
        self.used = [False] * len(frags)
        self.coverage = np.zeros(query_len, dtype=bool)
        self.clumps = []
        self.done = False

    def live_nodes(self):
        """Unused fragments sorted ascending (SQO, diag)
        (compareFragsByQueryOffsets, GraphPath.cpp:148-159)."""
        nodes = [f for f, u in zip(self.frags, self.used) if not u]
        nodes.sort(key=lambda f: (f.sqo, f.diag))
        return nodes

    def apply_round(self, aa, best, prev, nodes):
        """Path extraction + elimination for one chain round
        (processBestFragmentPath + eliminateFragments)."""
        clump = Clump()
        k = best
        while k >= 0:
            insert_fragment(clump, nodes[k])
            k = prev[k]
        if clump.matched_bases < aa.min_match:
            self.done = True
            return
        clean_up_clump(clump, aa)
        if clump.is_empty:
            self.done = True
            return
        self.coverage[clump.sqo:clump.sqo + clump.query_len] = True
        id_to_idx = {id(f): i for i, f in enumerate(self.frags)}
        for nd in nodes:
            i = id_to_idx[id(nd)]
            if self.used[i]:
                continue
            if not check_start_end_coverage(self.coverage, nd,
                                            aa.min_non_overlap):
                self.used[i] = True
        self.clumps.append(clump)


class _SeedRows:
    """Per-row view over the tiered seed-expansion outputs: rows that
    overflowed the first capacity tier read from the big-tier rerun."""

    def __init__(self, out1, out2):
        self.out1 = out1
        self.out2 = out2

    def _o(self, r):
        if self.out2 is not None and self.out1["overflow"][r]:
            return self.out2
        return self.out1

    def row(self, r):
        o = self._o(r)
        return o["diag"][r], o["qo"][r], int(o["total"][r]), o["wrapped"][r]

    def overflow(self, r):
        return bool(self._o(r)["overflow"][r])


class DeviceFrontEnd:
    """Batched device seed->fragment->chain for the TPU engines."""

    N_BUCKETS = (16, 64, 256)

    def __init__(self, aa, index, mesh=None, n_model=1):
        import jax.numpy as jnp
        self.aa = aa
        self.index = index
        self.word_len = index.word_len
        self.mesh = mesh
        self.sidx = None
        self.collective_stats = {"all_gather_calls": 0,
                                 "all_gather_bytes": 0}
        self.n_phantom_injected = 0
        if mesh is not None:
            # TP-analog: SO + ROA hash-range sharded across `model`
            # (parallel/mesh.py ShardedIndex), lookups merged with an
            # all_gather over ICI.
            from ..parallel.mesh import ShardedIndex
            self.sidx = ShardedIndex(index, n_model).place(mesh)
            self.data_size = mesh.shape["data"]
        else:
            so = index.starting_offs
            roa = index.roa
            self.so_dev = jnp.asarray(np.ascontiguousarray(so, np.uint32))
            self.roa_dev = jnp.asarray(
                np.ascontiguousarray(roa, np.uint32))
            self.data_size = 1

    # ---- stage 1+2: device seed scan and hit expansion ----

    CAP_TIERS = (1024, 8192)

    def _seed_batch(self, codes_pad, lengths):
        """Returns (_SeedRows accessor, seed_totals).  Capacity runs in
        two fixed tiers (every distinct capacity is a separate compiled
        program; cold compiles cost minutes on remote links): the mesh
        path retries only-if-needed at the big tier, the single-device
        path picks the tier from exact totals up front."""
        from ..ops import seeds_jax
        import jax.numpy as jnp
        aa = self.aa
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            import jax
            sh = NamedSharding(self.mesh, P("data", None))
            codes_d = jax.device_put(jnp.asarray(codes_pad), sh)
            lens_d = jax.device_put(
                jnp.asarray(lengths),
                NamedSharding(self.mesh, P("data")))
            hashes, clean = seeds_jax.batched_seed_hashes(
                codes_d, lens_d, word_len=self.word_len)
            from ..parallel.mesh import sharded_expand_sort
            out = sharded_expand_sort(
                self.mesh, hashes, clean, self.sidx,
                max_hits=int(aa.max_hits), capacity=self.CAP_TIERS[0])
            out = {k: np.asarray(v) for k, v in out.items()}
            self._account_collectives(out["diag"].shape[0],
                                      self.CAP_TIERS[0])
            out2 = None
            if out["overflow"].any():
                # Tier retry keeps overflow reads on the sharded path.
                out2 = sharded_expand_sort(
                    self.mesh, hashes, clean, self.sidx,
                    max_hits=int(aa.max_hits),
                    capacity=self.CAP_TIERS[1])
                out2 = {k: np.asarray(v) for k, v in out2.items()}
                self._account_collectives(out["diag"].shape[0],
                                          self.CAP_TIERS[1])
            return _SeedRows(out, out2), np.asarray(out["total"])
        hashes, clean = seeds_jax.batched_seed_hashes(
            jnp.asarray(codes_pad), jnp.asarray(lengths),
            word_len=self.word_len)
        totals, seed_totals = seeds_jax.strand_hit_totals(
            hashes, clean, self.so_dev, aa.max_hits)
        totals = np.asarray(totals)
        cap = int(max(1, totals.max() if len(totals) else 1))
        cap = (self.CAP_TIERS[0] if cap <= self.CAP_TIERS[0]
               else self.CAP_TIERS[1])
        out = seeds_jax.expand_sort_hits_device(
            hashes, clean, self.so_dev, self.roa_dev,
            max_hits=int(aa.max_hits), capacity=cap)
        out = {k: np.asarray(v) for k, v in out.items()}
        return _SeedRows(out, None), np.asarray(seed_totals)

    def _account_collectives(self, rows, capacity):
        """all_gather budget of one sharded seed call (diag + qo planes,
        [model, rows, capacity] x 4 B each) — reported by the multichip
        dryrun and scaling bench."""
        m = self.mesh.shape["model"] if self.mesh is not None else 1
        self.collective_stats["all_gather_calls"] += 1
        self.collective_stats["all_gather_bytes"] += 2 * 4 * m * rows * \
            capacity

    # ---- phantom-hit injection (QueryMatch.c:57-69 on the device path) --

    def _inject_phantoms(self, codes, wrapped_row, diag_row, qo_row,
                         total):
        """Exact per-window phantom-hit emulation for device-flagged
        wrapped runs: recompute the flagged windows' SO runs host-side,
        walk past each run (core/frags.phantom_hits), merge the extra
        hits into the device-sorted (diag, qo) row."""
        from ..core.frags import phantom_hits
        wl = self.word_len
        offs = np.flatnonzero(wrapped_row)
        index = self.index
        so = getattr(index, "_so64", None)
        if so is None:
            so = np.asarray(index.starting_offs, dtype=np.int64)
            try:
                index._so64 = so
            except AttributeError:
                pass
        c = codes.astype(np.int64)
        h = np.zeros(len(offs), np.int64)
        for t in range(wl):
            h = (h << 2) | c[offs + t]
        so_offs = so[h]
        counts = so[h + 1] - so[h]
        extra_qo, extra_ro = phantom_hits(
            offs, so_offs, counts, index.roa, range(len(offs)))
        if not extra_qo:
            return diag_row, qo_row, total
        qo = np.concatenate([qo_row[:total].astype(np.int64),
                             np.asarray(extra_qo, np.int64)])
        diag = np.concatenate(
            [diag_row[:total].astype(np.int64),
             (np.asarray(extra_ro, np.int64) -
              np.asarray(extra_qo, np.int64)) & M32])
        order = np.lexsort((qo, diag))
        return (diag[order].astype(np.uint32),
                qo[order].astype(np.int32), len(qo))

    # ---- stage 3: fragment coalescing (vectorized host) ----

    def _strand_frags(self, diag_row, qo_row, total):
        wl = self.word_len
        if total == 0:
            return []
        diag = diag_row[:total].astype(np.int64)
        qo = qo_row[:total].astype(np.int64)
        if total == 1:
            brk = np.empty(0, np.int64)
        else:
            brk = np.flatnonzero((np.diff(diag) != 0) |
                                 (np.diff(qo) > wl)) + 1
        starts = np.concatenate([[0], brk])
        ends = np.concatenate([brk - 1, [total - 1]])
        frags = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            sqo = int(qo[s])
            eqo = int(qo[e]) + wl - 1
            frags.append(Fragment(sqo=sqo, eqo=eqo,
                                  sro=int((diag[s] + sqo) & M32),
                                  ref_len=eqo - sqo + 1))
        return frags

    # ---- stage 4: round-synchronized chain extraction ----

    def _run_regions(self, regions, qs_by_read):
        from ..ops import chain_jax
        import jax.numpy as jnp
        aa = self.aa
        active = [r for r in regions if not r.done]
        while active:
            buckets = {}
            for r in active:
                nodes = r.live_nodes()
                if not nodes:
                    r.done = True
                    continue
                nb = _pow2(len(nodes), self.N_BUCKETS[0],
                           self.N_BUCKETS[-1])
                if len(nodes) > self.N_BUCKETS[-1]:
                    # Oversized region: host chain DP this round (the
                    # shape-bucket escape hatch; still byte-parity).
                    qs = qs_by_read[r.key[0]]
                    clump = Clump()
                    used = [False] * len(nodes)
                    qs.coverage = r.coverage  # eliminate uses qs.coverage
                    build_best_clump(aa, qs, nodes, used, 0,
                                     len(nodes) - 1, clump)
                    self._apply_host_round(r, clump, nodes)
                    continue
                buckets.setdefault(nb, []).append((r, nodes))
            for nb, items in sorted(buckets.items()):
                # Pad the batch dimension to power-of-2 tiers: a distinct
                # row count is a distinct compiled program, and region
                # counts vary every extraction round.  Padded rows are
                # all-invalid and are never read back (the apply loop
                # walks only len(items) rows).
                bsz = _pow2(len(items), 8, 1 << 30)
                sqo = np.zeros((bsz, nb), np.int32)
                eqo = np.zeros((bsz, nb), np.int32)
                diag = np.zeros((bsz, nb), np.int32)
                length = np.zeros((bsz, nb), np.int32)
                valid = np.zeros((bsz, nb), bool)
                for k, (r, nodes) in enumerate(items):
                    m = len(nodes)
                    d = np.array([f.diag for f in nodes], np.int64)
                    d0 = d.min()
                    sqo[k, :m] = [f.sqo for f in nodes]
                    eqo[k, :m] = [f.eqo for f in nodes]
                    diag[k, :m] = ((d - d0) & M32).astype(np.int32)
                    length[k, :m] = [f.match_count for f in nodes]
                    valid[k, :m] = True
                res = chain_jax.batched_chain_dp(
                    jnp.asarray(sqo), jnp.asarray(eqo), jnp.asarray(diag),
                    jnp.asarray(length), jnp.asarray(valid),
                    max_gap=aa.max_gap, max_desert=aa.max_desert,
                    m_score=aa.m_score, go_cost=aa.go_cost,
                    ge_cost=aa.ge_cost)
                best = np.asarray(res["best"])
                prev = np.asarray(res["prev"])
                for k, (r, nodes) in enumerate(items):
                    if best[k] < 0:
                        r.done = True
                        continue
                    r.apply_round(aa, int(best[k]), prev[k].tolist(),
                                  nodes)
            active = [r for r in active if not r.done]

    def _apply_host_round(self, region, clump, nodes):
        """Mirror of _Region.apply_round when build_best_clump already
        emitted (host oversized-region path): build_best_clump performs
        min_match reset + cleanUpClump itself."""
        aa = self.aa
        if clump.is_empty:
            region.done = True
            return
        region.coverage[clump.sqo:clump.sqo + clump.query_len] = True
        id_to_idx = {id(f): i for i, f in enumerate(region.frags)}
        for nd in nodes:
            i = id_to_idx.get(id(nd))
            if i is None or region.used[i]:
                continue
            if not check_start_end_coverage(region.coverage, nd,
                                            aa.min_non_overlap):
                region.used[i] = True
        region.clumps.append(clump)

    # ---- batch driver ----

    def process_batch(self, states):
        """Fill qs.clumps for every QueryState via the device front end.
        Returns the number of reads that used the host fallback."""
        aa = self.aa
        wl = self.word_len
        n_reads = len(states)
        max_len = max(qs.query_len for qs in states)
        lpad = _pow2(max_len, 64, 1 << 20)
        bpad = _pow2(2 * n_reads, 16, 1 << 20)
        codes = np.full((bpad, lpad), 4, np.uint8)  # N codes: never clean
        lengths = np.zeros(bpad, np.int32)
        for i, qs in enumerate(states):
            codes[2 * i, :qs.query_len] = qs.forward_codes
            codes[2 * i + 1, :qs.query_len] = qs.reverse_codes
            lengths[2 * i] = lengths[2 * i + 1] = qs.query_len
        rows, seed_totals = self._seed_batch(codes, lengths)

        # Overflow of the TOP capacity tier is the only remaining host
        # fallback; wrapped runs are phantom-injected in place.
        fallback_reads = set()
        for i in range(n_reads):
            for s in (0, 1):
                if rows.overflow(2 * i + s):
                    fallback_reads.add(i)

        # Build per-strand fragments and split into regions
        # (processFragmentsGapped, QueryMatch.c:224-303).
        regions = []
        singles = {}     # key -> Clump (single-fragment regions)
        order = {}       # read_idx -> list of region keys in host order
        for i, qs in enumerate(states):
            if i in fallback_reads:
                continue
            order[i] = []
            for s, rev in ((0, False), (1, True)):
                row = 2 * i + s
                diag_row, qo_row, total, wrapped_row = rows.row(row)
                if wrapped_row.any():
                    codes_s = (qs.reverse_codes if rev
                               else qs.forward_codes)
                    diag_row, qo_row, total = self._inject_phantoms(
                        np.asarray(codes_s), wrapped_row, diag_row,
                        qo_row, total)
                    self.n_phantom_injected += 1
                frags = self._strand_frags(diag_row, qo_row, total)
                if not frags:
                    continue
                # Region split by successive-diagonal proximity.
                start = 0
                region_idx = 0
                n_frags = len(frags)
                while start < n_frags:
                    end = start
                    cur = frags[start].diag
                    for t in range(start, n_frags):
                        d = frags[t].diag
                        if abs_diag_diff(cur, d) > aa.max_gap:
                            end = t - 1
                            break
                        cur = d
                        end = t
                    key = (i, s, region_idx)
                    sub = frags[start:end + 1]
                    if len(sub) == 1:
                        if sub[0].match_count >= aa.min_match:
                            clump = Clump()
                            from ..core.chain import add_fragment
                            add_fragment(clump, sub[0])
                            singles[key] = clump
                            order[i].append(key)
                    else:
                        regions.append(_Region(key, sub, qs.query_len))
                        order[i].append(key)
                    region_idx += 1
                    start = end + 1

        qs_by_read = {i: states[i] for i in range(n_reads)}
        self._run_regions(regions, qs_by_read)

        region_by_key = {r.key: r for r in regions}
        # Replay emission order per read: strands in order, regions in
        # order, extraction rounds in order; addClump prepends.
        for i, qs in enumerate(states):
            if i in fallback_reads:
                for rev in (False, True):
                    qs.reversed = rev
                    codes_s = (qs.reverse_codes if rev
                               else qs.forward_codes)
                    process_strand(aa, qs, self.index, codes_s)
                continue
            for key in order.get(i, ()):
                _, s, _ = key
                qs.reversed = bool(s)
                if key in singles:
                    qs.add_clump(singles[key])
                else:
                    for clump in region_by_key[key].clumps:
                        qs.add_clump(clump)
        return len(fallback_reads)
