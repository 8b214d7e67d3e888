#!/usr/bin/env python3
"""hg-scale staged-TPU protocol (VERDICT r3 #4): the staged batch-pallas
engine against the 3 Gbp genome / 16.3 GB L15 index, with the same
byte/launch decomposition + host-phase profile as the 12 Mbp rows and
an in-run parity check vs the per-read native pipeline.

Residency story (the numbers this tool prints):
  * index (SO 4.3 GB + ROA ~12 GB): host mmap, shared by the native
    seed scan across threads — exactly the reference's shared-index
    model (Query.c:556);
  * genome codes (~3.0 GB u8): HBM-resident for the whole run
    (ops/gather_dp.DeviceCorpus, 256 Mcode pages) — DP problem r-slices
    gather on device;
  * per chunk: 4-bit-packed read codes up, RLE backtrack items down.

Assets: tools/hgscale_validate.sh builds /tmp/hgscale/{big.nib2,
big.X15_01_65525S}; reads default to the bundled hg18 wgsim sets.

Usage: python tools/hgscale_staged_tpu.py [--reads-gz PATH] [--n N]
"""
import argparse
import gzip
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/hgscale")
    ap.add_argument("--reads-gz", default="/root/reference/testdata/"
                    "hg18L1000E10Q10K.fasta.gz")
    ap.add_argument("--sample", action="store_true",
                    help="sample the reads FROM the 3 Gbp genome (full "
                    "DP workload) instead of the bundled hg18 sets "
                    "(which barely align to the synthetic genome: "
                    "realistic index-scan load, near-idle DP phases)")
    ap.add_argument("--len", dest="rlen", type=int, default=1000)
    ap.add_argument("--err", type=float, default=0.05)
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/yaha_tpu/xla"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.0")
    from yaha_tpu.config import AlignmentArgs
    from yaha_tpu.io import native_loader
    from yaha_tpu.native import host
    from yaha_tpu.models.staged import StagedAligner

    t0 = time.time()
    genome = native_loader.load_genome(os.path.join(args.dir, "big.nib2"))
    index = native_loader.load_index(
        os.path.join(args.dir, "big.X15_01_65525S"))
    t_load = time.time() - t0

    aa = AlignmentArgs()
    aa.xfile_name = "big.X15_01_65525S"
    aa.qfile_name = os.path.basename(args.reads_gz)[:-3]
    aa.ofile_name = "out.sam"
    aa.post_process(True)
    aa.word_len = index.word_len
    aa.max_hits = min(aa.max_hits, index.max_hits)
    if args.sample:
        import ctypes
        import numpy as np
        from yaha_tpu.utils import codec
        rng = np.random.default_rng(20260820)
        codes_np = np.ctypeslib.as_array(
            ctypes.cast(genome.codes_buf,
                        ctypes.POINTER(ctypes.c_uint8)),
            shape=(int(genome.codes_len),))
        parts = [b""]
        starts = genome.starting_offsets
        lens = genome.lengths
        for i in range(args.n):
            c = int(rng.integers(0, len(starts)))
            pos = int(starts[c]) + int(rng.integers(
                0, max(1, lens[c] - args.rlen)))
            r = codes_np[pos:pos + args.rlen].copy()
            m = rng.random(args.rlen) < args.err
            r[m] = rng.integers(0, 4, int(m.sum()))
            if rng.random() < 0.5:
                r = codec.complement4to4(r)[::-1]
            parts.append(b">rd%d\n%s\n" %
                         (i, codec.unmap4to8(r).tobytes()))
        data = b"".join(parts)
        aa.qfile_name = "sampled_L%dE%02d.fasta" % (
            args.rlen, round(args.err * 100))
    else:
        with gzip.open(args.reads_gz) as f:
            data = f.read()
    aa.fastq = data[:1] == b"@"
    pr = host.parse_queries_native(data, aa.fastq, aa.max_query_length,
                                   aa.word_len)
    n = min(pr.n, args.n)

    t0 = time.time()
    st = StagedAligner(aa, genome, index, backend="pallas",
                       n_threads=args.threads)
    t_corpus = time.time() - t0    # genome pages -> HBM (one-time)
    genome_hbm_mb = (st.corpus.genome_bytes / 1e6
                     if st.corpus is not None else 0)

    t0 = time.time()
    text, sm, nr = st.align_chunk(pr, 0, n)
    warmup = time.time() - t0
    ref, _, _, _ = host.align_batch_native(pr, 0, n, genome, index, aa,
                                           n_threads=args.threads)
    parity = text == ref
    rows = []
    for it in range(args.iters):
        st.stats = {k: (0 if not isinstance(v, float) else 0.0)
                    for k, v in st.stats.items()}
        t0 = time.time()
        text, sm, nr = st.align_chunk(pr, 0, n)
        wall = time.time() - t0
        parity = parity and text == ref
        s = dict(st.stats)
        host_s = wall - s["device_s"]
        local_dev = ((s["h2d_bytes"] + s["d2h_bytes"]) / 8e9 +
                     s["dp_launches"] * 1e-4)
        rows.append({
            "wall_s": round(wall, 2), "host_s": round(host_s, 2),
            "device_plus_transfer_s": round(s["device_s"], 2),
            "host_decomposition_s": {
                k[:-2]: round(s[k], 3)
                for k in ("begin_s", "gap_host_s", "phase2_s",
                          "ext_host_s", "finish_s")},
            "dp_launches": s["dp_launches"],
            "gap_problems": s["gap_problems"],
            "gap_dispatch": {"banded": s["gap_banded"],
                             "full": s["gap_full"],
                             "fallback": s["gap_fallback"]},
            "ext_problems": s["ext_problems"],
            "h2d_mb": round(s["h2d_bytes"] / 1e6, 1),
            "d2h_mb": round(s["d2h_bytes"] / 1e6, 1),
            "reads_per_s": round(n / wall, 1),
            "local_chip_projection_reads_per_s": round(
                n / (host_s + local_dev), 1)})
    print(json.dumps({
        "protocol": "hg-scale staged batch-pallas (3 Gbp, L15)",
        "reads_file": aa.qfile_name if args.sample
        else os.path.basename(args.reads_gz),
        "reads": n, "records": nr, "parity": parity,
        "threads": args.threads,
        "residency": {
            "index_host_mmap_gb": round(
                (4 * (4 ** index.word_len + 1) +
                 4 * index.roa_len) / 1e9, 2),
            "genome_codes_hbm_gb": round(genome_hbm_mb / 1e3, 2),
            "genome_upload_s_one_time": round(t_corpus, 1),
            "load_s": round(t_load, 1),
        },
        "warmup_s": round(warmup, 1),
        "iters": rows}))


if __name__ == "__main__":
    main()
