"""Batched aligner: the TPU-structured pipeline with host orchestration.

Restructures the reference's per-clump sequential alignment
(postProcessClumps -> alignClump -> scoreClump, QueryMatch.c:306-331) into
DP *phases* batched across every clump of every read in the batch:

  phase A  gap-fill DPs   (makeAndAlignSFragmentToFillGap's DP arm)
  phase B  extension DPs  (extendClumpForwardReverse's DP arm)

All problems within a phase are independent in the reference (anchored
both ends / anchored one end with inputs fixed before any DP runs), so
batching preserves byte-parity; the parity suite runs end-to-end through
this path.  Backends: 'native' (C++ host DP, default when built), 'numpy'
(pure-Python twin), 'xla' (jit), 'pallas' (TPU kernel for extensions).

Splits and careful re-extensions are rare (clumpSplit flag) and stay on
the scalar oracle path.
"""
from __future__ import annotations

import numpy as np

from ..core import sw
from ..core.align import (extend_backward_perfect, extend_forward_perfect,
                          collapse_sfragments, score_clump)
from ..core.clumps import SFragment
from ..core.editops import EditOpList, MATCH, REPLACE, INSERT, DELETE
from ..core.frags import (Fragment, calc_gap_cost, calc_query_gap,
                          calc_ref_gap)
from ..core.chain import process_strand
from ..core.oqc import post_filter_by_similarity, post_filter_remove_dups
from ..core.pipeline import QueryState
from ..io import sam
from ..ops import dp_common, sw_numpy

M32 = 0xFFFFFFFF


class _GapProblem:
    __slots__ = ("sfrag", "q", "r", "qlen", "rlen", "lbw", "rbw")

    def __init__(self, sfrag, q, r, qlen, rlen, lbw, rbw):
        self.sfrag = sfrag
        self.q = q
        self.r = r
        self.qlen = qlen
        self.rlen = rlen
        self.lbw = lbw
        self.rbw = rbw


class _ExtProblem:
    __slots__ = ("clump", "sfrag", "q", "r", "qlen", "rlen", "reverse")

    def __init__(self, clump, sfrag, q, r, qlen, rlen, reverse):
        self.clump = clump
        self.sfrag = sfrag
        self.q = q
        self.r = r
        self.qlen = qlen
        self.rlen = rlen
        self.reverse = reverse


class BatchAligner:
    """Aligns batches of reads; DP phases run through batched kernels."""

    def __init__(self, aa, genome, index, backend="auto", frontend="host",
                 mesh=None, n_model=1):
        self.aa = aa
        self.genome = genome
        self.index = index
        if backend == "auto":
            from ..native import host
            backend = "native" if host.available() else "numpy"
        self.backend = backend
        self.mesh = mesh
        self.frontend = None
        if frontend == "device":
            from .frontend import DeviceFrontEnd
            self.frontend = DeviceFrontEnd(aa, index, mesh=mesh,
                                           n_model=n_model)

    def _shard_dp(self, arrays):
        """Pad the DP problem batch to the data-axis size and place it
        sharded over `data` (DP-1: problems ride the data axis; XLA
        partitions the batched forward with no code changes)."""
        if self.mesh is None:
            return arrays
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        d = self.mesh.shape["data"]
        n = len(arrays[0])
        pad = (-n) % d
        out = []
        for a in arrays:
            if pad:
                a = np.concatenate(
                    [a, np.repeat(a[-1:], pad, axis=0)], axis=0)
            spec = P("data") if a.ndim == 1 else P("data", None)
            out.append(jax.device_put(jnp.asarray(a),
                                      NamedSharding(self.mesh, spec)))
        return out

    # ----- phase A: gap fill -----

    def _collect_gap_problems(self, clump, qs, problems):
        """alignClump's pre-DP stages (AlignHelpers.c:205-262) with the DP
        cascade arm deferred into `problems`."""
        aa = self.aa
        genome = qs.genome_codes
        q_codes = qs.clump_query_codes(clump)
        sfrags = clump.sfrags
        for k in range(len(sfrags) - 1):
            frag1 = sfrags[k].frag
            frag2 = sfrags[k + 1].frag
            gap = min(calc_query_gap(frag1, frag2),
                      calc_ref_gap(frag1, frag2))
            gap -= extend_backward_perfect(frag2, genome, q_codes, gap)
            gap -= extend_forward_perfect(frag1, genome, q_codes, gap)
        for sf in sfrags:
            q_len = sf.frag.q_len
            sf.eol.add_front(MATCH, q_len)
            sf.score = aa.m_score * q_len
        i = 0
        while i < len(sfrags) - 1:
            frag1 = sfrags[i].frag
            frag2 = sfrags[i + 1].frag
            q_gap = calc_query_gap(frag1, frag2)
            r_gap = calc_ref_gap(frag1, frag2)
            if q_gap == 0 and r_gap == 0:
                i += 1
                continue
            new_sf = SFragment()
            nf = new_sf.frag
            nf.sqo = frag1.eqo + 1
            nf.eqo = frag2.sqo - 1
            nf.sro = (frag1.ero + 1) & M32
            nf.set_ero(frag2.sro - 1)
            if q_gap == 0:
                new_sf.eol.add_front(DELETE, r_gap)
                new_sf.score = calc_gap_cost(r_gap, aa)
            elif r_gap == 0:
                new_sf.eol.add_front(INSERT, q_gap)
                new_sf.score = calc_gap_cost(q_gap, aa)
            elif r_gap == 1 and q_gap == 1:
                new_sf.eol.add_front(REPLACE, 1)
                new_sf.score = -aa.r_cost
            else:
                len_diff = abs(q_gap - r_gap)
                banded = len_diff + aa.band_width * 2 + 1 < r_gap
                if banded:
                    if r_gap > q_gap:
                        lbw = aa.band_width
                        rbw = aa.band_width + (r_gap - q_gap)
                    else:
                        lbw = aa.band_width + (q_gap - r_gap)
                        rbw = aa.band_width
                else:
                    lbw = rbw = max(q_gap, r_gap) + 1
                problems.append(_GapProblem(
                    new_sf,
                    np.asarray(q_codes[nf.sqo:nf.sqo + q_gap]),
                    np.asarray(genome[nf.sro:nf.sro + r_gap]),
                    q_gap, r_gap, lbw, rbw))
            sfrags.insert(i + 1, new_sf)
            i += 1

    def _collect_gap_problems_native(self, qs, problems) -> bool:
        """yt_collect_gaps for all clumps of one read; False -> caller
        falls back to the per-clump Python stage (degenerate chop offsets
        where the reference walks out of its buffers, or no native lib)."""
        from ..native import host
        if not qs.clumps or not host.available():
            return not qs.clumps
        res = host.collect_gaps(qs.clumps, qs, self.aa)
        if res is None:
            return False
        offs, sqo, eqo, sro, rlen, kind, score, oplen, a0, a1 = \
            [a.tolist() for a in res]
        genome = qs.genome_codes
        for k, clump in enumerate(qs.clumps):
            q_codes = qs.clump_query_codes(clump)
            new_sfrags = []
            for i in range(offs[k], offs[k + 1]):
                sf = SFragment(Fragment(
                    sqo=sqo[i], eqo=eqo[i], sro=sro[i], ref_len=rlen[i]))
                sf.score = score[i]
                kd = kind[i]
                if kd == 0:
                    sf.eol.items = [[MATCH, oplen[i]]]
                elif kd == 1:
                    sf.eol.items = [[DELETE, oplen[i]]]
                elif kd == 2:
                    sf.eol.items = [[INSERT, oplen[i]]]
                elif kd == 3:
                    sf.eol.items = [[REPLACE, 1]]
                else:
                    q_gap = eqo[i] - sqo[i] + 1
                    r_gap = rlen[i]
                    problems.append(_GapProblem(
                        sf,
                        np.asarray(q_codes[sf.frag.sqo:
                                           sf.frag.sqo + q_gap]),
                        np.asarray(genome[sf.frag.sro:
                                          sf.frag.sro + r_gap]),
                        q_gap, r_gap, a0[i], a1[i]))
                new_sfrags.append(sf)
            clump.sfrags = new_sfrags
        return True

    def _run_gap_problems(self, problems):
        if not problems:
            return
        n = len(problems)
        qg = max(p.qlen for p in problems)
        rg = max(p.rlen for p in problems)
        if self.backend not in ("numpy", "native"):
            qg = max(32, 1 << (qg - 1).bit_length())
            rg = max(32, 1 << (rg - 1).bit_length())
        qa = np.zeros((n, qg), np.uint8)
        ra = np.zeros((n, rg), np.uint8)
        qlens = np.zeros(n, np.int64)
        rlens = np.zeros(n, np.int64)
        lbws = np.zeros(n, np.int64)
        rbws = np.zeros(n, np.int64)
        for k, p in enumerate(problems):
            qa[k, :p.qlen] = p.q
            ra[k, :p.rlen] = p.r
            qlens[k], rlens[k] = p.qlen, p.rlen
            lbws[k], rbws[k] = p.lbw, p.rbw
        kw = dict(go=self.aa.go_cost, ge=self.aa.ge_cost, rc=self.aa.r_cost,
                  ms=self.aa.m_score, max_gap=self.aa.max_gap,
                  max_intron=self.aa.max_intron)
        wband_need = int((lbws + rbws).max()) + 1
        wband = max(32, 1 << (wband_need - 1).bit_length())
        if self.backend == "native":
            from ..native import host
            out = host.anchored_forward(qa, qlens, ra, rlens, lbws, rbws,
                                        **kw)
        elif self.backend == "numpy":
            out = sw_numpy.batched_anchored_forward_np(
                qa, qlens, ra, rlens, lbws, rbws, **kw)
        elif self.backend == "pallas" and wband <= 512 and wband < rg + 1:
            # Band-relative kernel: per-row work and VMEM scale with the
            # band, not the reference length, so narrow-band gap fills of
            # any length stay on-chip (no rg cap).  Backtrack arrays come
            # back in banded layout and are decoded directly.
            from ..ops import sw_pallas
            pad = (-n) % sw_pallas.TILE
            out = sw_pallas.anchored_forward_pallas_banded(
                np.pad(qa, ((0, pad), (0, 0))),
                np.pad(qlens, (0, pad)),
                np.pad(ra, ((0, pad), (0, 0))),
                np.pad(rlens, (0, pad)),
                np.pad(lbws, (0, pad)),
                np.pad(rbws, (0, pad)), wband=wband, **kw)
            bt_b = np.asarray(out["bt_b"])[:n]
            score_arr = np.asarray(out["score"])[:n]
            from ..native import host as native_host
            if native_host.available():
                all_items = native_host.traceback_anchored_banded_packed_batch(
                    bt_b, qlens, rlens, lbws)
            else:
                all_items = [dp_common.traceback_anchored_banded_packed(
                    bt_b[k], int(lbws[k]), p.qlen, p.rlen)
                    for k, p in enumerate(problems)]
            for k, p in enumerate(problems):
                p.sfrag.eol.items = all_items[k]
                p.sfrag.score = int(score_arr[k])
            return
        elif self.backend == "pallas" and rg <= 512:
            # VMEM scales with the reference-gap width (~22 KB/column:
            # 3 int32 state rows + double-buffered int8+int32 backtrack
            # slices); rg=512 compiles and is bit-identical on v5e
            # (rg=1024 exceeds VMEM).  The rare wider gap batch falls
            # back to the XLA path.
            from ..ops import sw_pallas
            pad = (-n) % sw_pallas.TILE
            out = sw_pallas.anchored_forward_pallas(
                np.pad(qa, ((0, pad), (0, 0))),
                np.pad(qlens, (0, pad)),
                np.pad(ra, ((0, pad), (0, 0))),
                np.pad(rlens, (0, pad)),
                np.pad(lbws, (0, pad)),
                np.pad(rbws, (0, pad)), **kw)
            bt = np.asarray(out["bt"])[:n]
            score_arr = np.asarray(out["score"])[:n]
            from ..native import host as native_host
            if native_host.available():
                all_items = native_host.traceback_anchored_packed_batch(
                    bt, qlens, rlens)
            else:
                all_items = [dp_common.traceback_anchored_packed(
                    bt[k], p.qlen, p.rlen) for k, p in enumerate(problems)]
            for k, p in enumerate(problems):
                p.sfrag.eol.items = all_items[k]
                p.sfrag.score = int(score_arr[k])
            return
        else:
            from ..ops import sw_batch
            sqa, sql, sra, srl, slb, srb = self._shard_dp(
                (qa, qlens, ra, rlens, lbws, rbws))
            out = sw_batch.batched_anchored_forward(
                sqa, sql, sra, srl, slb, srb, **kw)
            out = {k2: np.asarray(v)[:n] for k2, v in out.items()}
        from ..native import host as native_host
        if native_host.available():
            all_items = native_host.traceback_anchored_batch(
                out["eo"], out["idc"], qlens, rlens)
        else:
            all_items = [dp_common.traceback_anchored(
                out["eo"][k], out["idc"][k], p.qlen, p.rlen)
                for k, p in enumerate(problems)]
        for k, p in enumerate(problems):
            p.sfrag.eol.items = all_items[k]
            p.sfrag.score = int(out["score"][k])

    # ----- phase B: clump extensions -----

    def _collect_ext_problems(self, clump, qs, problems):
        """extendClumpForwardReverse's perfect stage + DP deferral
        (AlignExtFrag.cpp:64-144, non-careful arms)."""
        aa = self.aa
        sf = clump.sfrags[0]
        frag = sf.frag
        lst = clump.eol
        genome = qs.genome_codes
        q_codes = qs.clump_query_codes(clump)
        score = sf.score

        back_len = min(frag.sqo, frag.sro)
        if back_len > 0:
            nm = extend_backward_perfect(frag, genome, q_codes, back_len)
            if nm > 0:
                lst.first()[1] += nm
                score += nm * aa.m_score
                back_len -= nm
        qlen = (qs.query_len - 1) - frag.eqo
        rlen = qs.max_roff - frag.ero
        forw_len = min(qlen, rlen)
        if forw_len > 0:
            nm = extend_forward_perfect(frag, genome, q_codes, forw_len)
            if nm > 0:
                lst.last()[1] += nm
                score += nm * aa.m_score
                forw_len -= nm
        sf.score = score

        bw2 = 2 * aa.band_width
        if back_len >= aa.min_ext_length:
            # findAGSExtension<TRUE> trimming (SW.cpp:496-507).
            q_len = back_len
            r_off = frag.sro - 1
            r_len = q_len + bw2
            if r_len > r_off:
                r_len = r_off + 1
                q_len = r_len - bw2
            if q_len > 0:
                q_off = frag.sqo - 1
                q_slice = np.asarray(
                    q_codes[q_off - q_len + 1:q_off + 1][::-1])
                r_slice = np.asarray(
                    genome[r_off - r_len + 1:r_off + 1][::-1])
                problems.append(_ExtProblem(clump, sf, q_slice, r_slice,
                                            q_len, r_len, True))
        if forw_len >= aa.min_ext_length:
            q_len = forw_len
            r_off = frag.ero + 1
            r_len = q_len + bw2
            if r_off + r_len > qs.max_roff:
                r_len = qs.max_roff - r_off
                q_len = r_len - bw2
            if q_len > 0:
                q_off = frag.eqo + 1
                q_slice = np.asarray(q_codes[q_off:q_off + q_len])
                r_slice = np.asarray(genome[r_off:r_off + r_len])
                problems.append(_ExtProblem(clump, sf, q_slice, r_slice,
                                            q_len, r_len, False))

    def _run_ext_problems(self, problems):
        if not problems:
            return
        # Length-bucket: extensions range from a few bases to whole-read
        # length; padding everything to the max wastes most of the batch.
        buckets = {}
        for p in problems:
            b = max(32, 1 << (p.qlen - 1).bit_length())
            buckets.setdefault(b, []).append(p)
        for b in sorted(buckets):
            self._run_ext_bucket(buckets[b], b)

    def _run_ext_bucket(self, problems, ql):
        aa = self.aa
        bw2 = 2 * aa.band_width
        n = len(problems)
        rl = ql + 2 * bw2
        qa = np.zeros((n, ql), np.uint8)
        ra = np.full((n, rl), 255, np.uint8)
        qlens = np.zeros(n, np.int64)
        rlens = np.zeros(n, np.int64)
        for k, p in enumerate(problems):
            qa[k, :p.qlen] = p.q
            ra[k, :p.rlen] = p.r
            qlens[k], rlens[k] = p.qlen, p.rlen
        kw = dict(band_width=aa.band_width, go=aa.go_cost, ge=aa.ge_cost,
                  rc=aa.r_cost, ms=aa.m_score, max_gap=aa.max_gap,
                  max_intron=aa.max_intron, x_cutoff=aa.x_cutoff)
        if self.backend == "native":
            from ..native import host
            out = host.extension_forward(qa, qlens, ra, rlens, **kw)
        elif self.backend == "numpy":
            out = sw_numpy.batched_extension_forward_np(
                qa, qlens, ra, rlens, **kw)
        elif self.backend == "pallas":
            from ..ops import sw_pallas
            pad = (-n) % sw_pallas.TILE
            pout = sw_pallas.extension_forward_pallas(
                np.pad(qa, ((0, pad), (0, 0))),
                np.pad(qlens, (0, pad)),
                np.pad(ra, ((0, pad), (0, 0)), constant_values=255),
                np.pad(rlens, (0, pad)), **kw)
            out = {k2: np.asarray(v)[:n] for k2, v in pout.items()}
            out["packed"] = True
        else:
            from ..ops import sw_batch
            sqa, sql, sra, srl = self._shard_dp((qa, qlens, ra, rlens))
            out = sw_batch.batched_extension_forward(
                sqa, sql, sra, srl, **kw)
            out = {k2: np.asarray(v)[:n] for k2, v in out.items()}
        from ..native import host as native_host
        packed = out.get("packed", False)
        if native_host.available():
            rev = np.array([p.reverse for p in problems], np.uint8)
            if packed:
                all_items = native_host.traceback_extension_packed_batch(
                    out["bt"], out["maxi"], out["maxj"], out["score"], rev)
            else:
                all_items = native_host.traceback_extension_batch(
                    out["eo"], out["idc"], out["maxi"], out["maxj"],
                    out["score"], rev)
        else:
            all_items = None
        for k, p in enumerate(problems):
            score = int(out["score"][k])
            if all_items is not None:
                items = all_items[k]
                aq = int(out["maxi"][k])
                ar = aq + (int(out["maxj"][k]) - bw2)
            elif packed:
                items, aq, ar = dp_common.traceback_extension_packed(
                    out["bt"][k], int(out["maxi"][k]),
                    int(out["maxj"][k]), score, bw2, p.reverse)
            else:
                items, aq, ar = dp_common.traceback_extension(
                    out["eo"][k], out["idc"][k], int(out["maxi"][k]),
                    int(out["maxj"][k]), score, bw2, p.reverse)
            if score <= 0:
                continue
            tmp = EditOpList(items)
            frag = p.sfrag.frag
            if p.reverse:
                p.clump.eol.merge_to_front(tmp)
                frag.add_q_front(aq)
                frag.add_r_front(ar)
            else:
                p.clump.eol.merge_to_back(tmp)
                frag.add_q_back(aq)
                frag.add_r_back(ar)
            p.sfrag.score += score

    # ----- batch driver -----

    def align_batch(self, records) -> list[str]:
        """Align a list of QueryRecords; returns per-read output text."""
        aa = self.aa
        states = []
        for rec in records:
            qs = QueryState(aa, self.genome, self.index)
            qs.set_query(rec)
            states.append(qs)
        if self.frontend is not None:
            # Device seed->fragment->chain (models/frontend.py).
            self.frontend.process_batch(states)
        else:
            for qs in states:
                for rev in (False, True):
                    qs.reversed = rev
                    codes = qs.reverse_codes if rev else qs.forward_codes
                    process_strand(aa, qs, self.index, codes)

        # Phase A across the whole batch.
        gap_problems = []
        for qs in states:
            if not self._collect_gap_problems_native(qs, gap_problems):
                for clump in qs.clumps:
                    self._collect_gap_problems(clump, qs, gap_problems)
        self._run_gap_problems(gap_problems)

        # Collapse + phase B.
        ext_problems = []
        for qs in states:
            for clump in qs.clumps:
                collapse_sfragments(clump)
                self._collect_ext_problems(clump, qs, ext_problems)
        self._run_ext_problems(ext_problems)

        # Scoring (splits fall back to the oracle path), filter, output.
        outputs = []
        for qs in states:
            clumps = qs.clumps
            qs.clumps = []
            for clump in clumps:
                clump.aligned = True
                score_clump(clump, aa, qs)
                if clump.scored:
                    qs.clumps.insert(0, clump)
            if aa.oqc:
                post_filter_by_similarity(aa, qs)
            else:
                post_filter_remove_dups(aa, qs)
            outputs.append("".join(sam.print_clump(c, aa, qs)
                                   for c in qs.clumps))
        return outputs
