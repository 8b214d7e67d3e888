#!/usr/bin/env python3
"""Profile the staged engine's host phases vs the monolithic native
pipeline on identical reads (the VERDICT r3 item-2 decomposition: which
host phase is the 1 kb wall).

Runs in-process on synthetic reads vs the checked-in testgen index.
YT_PROFILE=1 prints the native-side phase accumulators.
"""
import argparse
import gzip
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def make_reads(d, n_reads, read_len, err):
    import make_testdata as mt
    import random
    rng = random.Random(20260816)
    genome_d = mt.make_genome(rng)
    rng = random.Random(424242)
    recs = []
    for i in range(n_reads):
        chrom, pos, s = mt.sample_read(rng, genome_d, read_len)
        s = mt.mutate(rng, s, err, err / 4)
        if rng.random() < 0.5:
            s = mt.revcomp(s)
        recs.append(("rd%d" % i, s))
    qpath = os.path.join(d, "reads.fasta")
    mt.write_fasta(qpath, recs)
    return qpath


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=4000)
    ap.add_argument("--len", type=int, dest="rlen", default=1000)
    ap.add_argument("--err", type=float, default=0.05)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--modes", default="native,staged-native,staged-xla")
    args = ap.parse_args()

    os.environ.setdefault("YT_PROFILE", "1")
    from yaha_tpu.config import AlignmentArgs
    from yaha_tpu.io import native_loader
    from yaha_tpu.native import host
    from yaha_tpu.models.staged import StagedAligner

    d = tempfile.mkdtemp(prefix="staged_prof_")
    try:
        shutil.copy(os.path.join(REPO, "tests/golden/testgen.nib2"), d)
        with gzip.open(os.path.join(
                REPO, "tests/golden/testgen.X11_01_65525S.gz")) as f:
            with open(os.path.join(d, "testgen.X11_01_65525S"), "wb") as o:
                o.write(f.read())
        qpath = make_reads(d, args.reads, args.rlen, args.err)
        aa = AlignmentArgs()
        aa.xfile_name = "testgen.X11_01_65525S"
        aa.qfile_name = "reads.fasta"
        aa.ofile_name = "out.sam"
        aa.post_process(True)
        genome = native_loader.load_genome(os.path.join(d, "testgen.nib2"))
        index = native_loader.load_index(
            os.path.join(d, "testgen.X11_01_65525S"))
        aa.word_len = index.word_len
        aa.max_hits = min(aa.max_hits, index.max_hits)
        with open(qpath, "rb") as f:
            data = f.read()
        pr = host.parse_queries_native(data, False, aa.max_query_length,
                                       aa.word_len)
        lib = host._load()

        def prof_dump(tag):
            import ctypes as ct
            for name in ("yt_prof_scan", "yt_prof_scan_a", "yt_prof_scan_b",
                         "yt_prof_scan_c", "yt_prof_sort", "yt_prof_f2c"):
                v = ct.c_double.in_dll(lib, name)
                print("  %s %s=%.3f" % (tag, name, v.value))
                v.value = 0.0
            for name in ("yt_prof_hits", "yt_prof_frags"):
                v = ct.c_int64.in_dll(lib, name)
                print("  %s %s=%d" % (tag, name, v.value))
                v.value = 0

        texts = {}
        for mode in args.modes.split(","):
            best = float("inf")
            # One aligner per mode (ADVICE r4): constructing inside the
            # iteration loop re-ran DeviceCorpus setup (a full
            # genome-codes device_put, ~3 GB at hg scale) per iteration.
            st = None
            if mode != "native":
                st = StagedAligner(aa, genome, index,
                                   backend=mode.split("-", 1)[1],
                                   n_threads=args.threads)
            for it in range(args.iters):
                if mode == "native":
                    t0 = time.time()
                    text, stats, sm, nr = host.align_batch_native(
                        pr, 0, pr.n, genome, index, aa,
                        n_threads=args.threads)
                    dt = time.time() - t0
                    dev = 0.0
                else:
                    for k in st.stats:
                        st.stats[k] = type(st.stats[k])(0)
                    t0 = time.time()
                    text, sm, nr = st.align_chunk(pr, 0, pr.n)
                    dt = time.time() - t0
                    dev = st.stats["device_s"]
                    if it == args.iters - 1:
                        print("  %s stats: %s" % (mode, st.stats))
                print("%s iter%d wall=%.3f host=%.3f dev=%.3f (%.0f r/s "
                      "host-only)" % (mode, it, dt, dt - dev, dev,
                                      pr.n / max(dt - dev, 1e-9)))
                prof_dump(mode)
                best = min(best, dt - dev)
            texts[mode] = text
            print("%s: best host phases %.3f s = %.0f reads/s (records %d)"
                  % (mode, best, pr.n / best, nr))
        vals = list(texts.values())
        print("parity across modes:",
              all(v == vals[0] for v in vals[1:]))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
