#!/usr/bin/env python3
"""Reads/s scaling-efficiency harness over mesh sizes — FULL pipeline.

Runs the complete aligner (device seed->fragment->chain front end with a
hash-range-sharded index, data-sharded DP phases, host OQC/SAM) over
meshes of 1/2/4/8 devices and reports reads/s + efficiency vs linear
scaling.  On real multi-chip slices this measures ICI scaling; on virtual
CPU devices (one host) the devices share the same physical cores, so
"efficiency" there bounds sharding overhead, not real speedup — the
physical-core ceiling is documented in BASELINE.md.

Usage:  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py [--reads 64] [--len 100]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=64)
    ap.add_argument("--len", dest="read_len", type=int, default=100)
    ap.add_argument("--word-len", type=int, default=9)
    args = ap.parse_args()

    import jax
    from yaha_tpu.config import AlignmentArgs
    from yaha_tpu.io import nib2, fasta
    from yaha_tpu.io.index_io import Index
    from yaha_tpu.index import build
    from yaha_tpu.models.aligner import BatchAligner
    from yaha_tpu.parallel import mesh as pmesh

    n_avail = len(jax.devices())
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    seq = bases[rng.integers(0, 4, 200_000)]
    fa = b">c1\n" + bytes(seq) + b"\n"
    genome = nib2.load(nib2.compress_fasta_bytes(fa))
    wl = args.word_len
    so, roa, tm = build.build_index(genome, wl, 1, 65525)
    index = Index(word_len=wl, max_hits=65525, total_matches=tm,
                  starting_offs=so, roa=roa)

    comp = bytes.maketrans(b"ACGT", b"TGCA")
    reads = []
    for k in range(args.reads):
        pos = int(rng.integers(0, len(seq) - args.read_len - 1))
        r = bytearray(seq[pos:pos + args.read_len].tobytes())
        for _ in range(max(1, args.read_len // 50)):
            p = int(rng.integers(0, len(r)))
            r[p] = bases[rng.integers(0, 4)]
        if k % 2:
            r = bytearray(bytes(r).translate(comp)[::-1])
        reads.append(b">r%d\n%s\n" % (k, bytes(r)))
    qdata = b"".join(reads)

    aa = AlignmentArgs()
    aa.word_len = wl
    aa.qfile_name = "bench.fa"
    aa.xfile_name = "bench.X"
    aa.ofile_name = "out.sam"
    aa.post_process(True)
    records = list(fasta.read_queries(qdata, aa))

    results = []
    base_rps = None
    sizes = [s for s in (1, 2, 4, 8) if s <= n_avail]
    for nd in sizes:
        model = 2 if nd >= 2 else 1
        mesh = pmesh.make_mesh(nd, model_parallel=model)
        aligner = BatchAligner(aa, genome, index, backend="xla",
                               frontend="device", mesh=mesh,
                               n_model=model)
        out = aligner.align_batch(records)   # compile + warm
        best = float("inf")
        host_s = 0.0
        for _ in range(3):
            if aligner.frontend is not None:
                aligner.frontend.collective_stats = {
                    "all_gather_calls": 0, "all_gather_bytes": 0}
            t0 = time.perf_counter()
            out2 = aligner.align_batch(records)
            best = min(best, time.perf_counter() - t0)
        assert out2 == out
        rps = len(records) / best
        if base_rps is None:
            base_rps = rps
        cs = (aligner.frontend.collective_stats
              if aligner.frontend is not None else {})
        # Comm/launch budget (SURVEY DP-1/Comm-1): what one read costs
        # in collective traffic.  On real ICI (v5e ~186 GB/s per link)
        # this budget, not the virtual-CPU timings, decides the >=80%
        # scaling target — see BASELINE.md.
        ag_bytes = cs.get("all_gather_bytes", 0)
        results.append({
            "devices": nd, "mesh": {"data": nd // model, "model": model},
            "reads_per_s": round(rps, 1),
            "efficiency_vs_1dev": round(rps / (base_rps * nd), 3),
            "all_gather_calls_per_batch": cs.get("all_gather_calls", 0),
            "all_gather_bytes_per_read": round(ag_bytes /
                                               max(1, len(records))),
            "ici_s_per_batch_at_100GBps": round(ag_bytes / 100e9, 6)})
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
