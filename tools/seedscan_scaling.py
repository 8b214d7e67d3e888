#!/usr/bin/env python3
"""hg-scale seed-scan thread scaling (VERDICT r4 #3).

At hg scale the staged engine's host wall is the L15 seed scan (SO +
ROA random gathers over the 16.3 GB mmap'd index, memory-latency-bound
— BASELINE round 2).  This tool measures the scan's scaling curve: the
staged phase-1 wall (parse -> seed scan -> chain -> clumps; scan is
~90% of it at hg scale) at 1/2/4 threads on the same reads, warm page
cache, plus the thread-summed scan CPU seconds (YT_PROFILE) so
contention inflation is visible (wall x threads vs summed seconds).

Assets: /root/hgdata or tools/hgscale_validate.sh's /tmp/hgscale
(big.nib2 + big.X15_01_65525S).

Usage: python tools/seedscan_scaling.py [--dir D] [--reads N] [--len L]
Prints one JSON line.
"""
import argparse
import ctypes
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/hgdata")
    ap.add_argument("--reads", type=int, default=4000)
    ap.add_argument("--len", dest="rlen", type=int, default=1000)
    ap.add_argument("--err", type=float, default=0.05)
    ap.add_argument("--threads", default="1,2,4")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    os.environ["YT_PROFILE"] = "1"
    from yaha_tpu.config import AlignmentArgs
    from yaha_tpu.io import native_loader
    from yaha_tpu.native import host
    from yaha_tpu.models.staged import StagedAligner
    from yaha_tpu.utils import codec

    genome = native_loader.load_genome(os.path.join(args.dir, "big.nib2"))
    index = native_loader.load_index(
        os.path.join(args.dir, "big.X15_01_65525S"))

    aa = AlignmentArgs()
    aa.xfile_name = "big.X15_01_65525S"
    aa.qfile_name = "reads.fa"
    aa.ofile_name = "out.sam"
    aa.post_process(True)
    aa.word_len = index.word_len
    aa.max_hits = min(aa.max_hits, index.max_hits)
    aa.fastq = False

    rng = np.random.default_rng(33)
    codes_np = np.ctypeslib.as_array(
        ctypes.cast(genome.codes_buf, ctypes.POINTER(ctypes.c_uint8)),
        shape=(int(genome.codes_len),))
    starts = genome.starting_offsets
    lens = genome.lengths
    parts = []
    for i in range(args.reads):
        c = int(rng.integers(0, len(starts)))
        pos = int(starts[c]) + int(rng.integers(
            0, max(1, int(lens[c]) - args.rlen)))
        r = codes_np[pos:pos + args.rlen].copy()
        m = (rng.random(args.rlen) < args.err) & (r < 4)
        r[m] = rng.integers(0, 4, int(m.sum()))
        if rng.random() < 0.5:
            r = codec.complement4to4(r)[::-1]
        parts.append(b">rd%d\n%s\n" % (i, codec.unmap4to8(r).tobytes()))
    pr = host.parse_queries_native(b"".join(parts), False,
                                   aa.max_query_length, aa.word_len)

    lib = host._load()
    scan_syms = ("yt_prof_scan", "yt_prof_scan_a", "yt_prof_scan_b",
                 "yt_prof_scan_c")

    def scan_cpu_s():
        return sum(ctypes.c_double.in_dll(lib, s).value
                   for s in scan_syms[:1])

    def reset_prof():
        for s in scan_syms + ("yt_prof_sort", "yt_prof_f2c"):
            ctypes.c_double.in_dll(lib, s).value = 0.0

    rows = []
    ref = None
    for t in [int(x) for x in args.threads.split(",")]:
        st = StagedAligner(aa, genome, index, backend="native",
                           n_threads=t)
        # warm pass (page cache + allocator)
        text, _, _ = st.align_chunk(pr, 0, pr.n)
        if ref is None:
            ref = text
        best_begin, best_wall, cpu = float("inf"), float("inf"), None
        for _ in range(args.iters):
            for k in st.stats:
                st.stats[k] = type(st.stats[k])(0)
            reset_prof()
            t0 = time.time()
            text, _, _ = st.align_chunk(pr, 0, pr.n)
            wall = time.time() - t0
            assert text == ref
            if st.stats["begin_s"] < best_begin:
                best_begin = st.stats["begin_s"]
                best_wall = wall
                cpu = scan_cpu_s()
        rows.append({
            "threads": t,
            "phase1_wall_s": round(best_begin, 3),
            "scan_cpu_s_thread_sum": round(cpu, 3),
            "scan_s_per_thread": round(cpu / t, 3),
            "chunk_wall_s": round(best_wall, 3),
            "phase1_reads_per_s": round(pr.n / best_begin, 1),
        })
    base = rows[0]["phase1_wall_s"]
    for r in rows:
        r["speedup_vs_t1"] = round(base / r["phase1_wall_s"], 2)
        r["efficiency"] = round(base / r["phase1_wall_s"] / r["threads"],
                                2)
    print(json.dumps({
        "protocol": "staged native phase-1 wall (parse+seed scan+chain+"
                    "clumps) on %d x %d bp reads vs the %.1f GB L15 "
                    "index, warm page cache, best-of-%d"
                    % (pr.n, args.rlen,
                       (4 * (4 ** index.word_len + 1)
                        + 4 * index.roa_len) / 1e9, args.iters),
        "rows": rows}))


if __name__ == "__main__":
    main()
