#!/usr/bin/env python3
"""SVsim/wgsim-style SV read simulation against any .nib2 genome.

Reproduces the structure of the reference's bundled SV sets
(testdata/README.txt: RandomSV_Events = DEL/DUP/INV/distal-INS event
contigs, 500-mer wgsim reads at 5x, 2% error, with a .sim.bedpe
breakpoint truth file) so breakpoint recall can be measured with
tools/bedpe_eval.py even though the original read FASTAs are stripped
from the mirror (.MISSING_LARGE_BLOBS).

Usage: python3 tools/make_sv_testdata.py genome.nib2 out_prefix
           [--events 200] [--read-len 500] [--coverage 5] [--err 0.02]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("genome_nib2")
    ap.add_argument("out_prefix")
    ap.add_argument("--events", type=int, default=200)
    ap.add_argument("--read-len", type=int, default=500)
    ap.add_argument("--coverage", type=int, default=5)
    ap.add_argument("--err", type=float, default=0.02)
    ap.add_argument("--flank", type=int, default=600)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cgr", action="store_true",
                    help="complex-rearrangement mode (CGR_Events analog): "
                         "each contig chains 3-6 segments from scattered "
                         "loci with inversions, ~30 kb total; reads are "
                         "the whole contigs (SVsim -l style)")
    args = ap.parse_args()

    from yaha_tpu.io import nib2
    from yaha_tpu.utils import codec
    with open(args.genome_nib2, "rb") as f:
        genome = nib2.load(f.read())

    rng = np.random.default_rng(args.seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    comp = bytes.maketrans(b"ACGT", b"TGCA")

    def chars(gstart, n):
        return codec.unmap4to8(
            genome.codes[gstart:gstart + n]).tobytes()

    def pick_locus(span):
        while True:
            c = int(rng.integers(0, genome.n_seqs))
            cs = int(genome.starting_offsets[c])
            cl = int(genome.lengths[c])
            if cl < span + 2 * args.flank + 10:
                continue
            p = int(rng.integers(args.flank, cl - span - args.flank))
            return c, cs, p

    fl = args.flank
    comp2 = comp
    if args.cgr:
        # CGR mode: one contig = 3-6 distal segments (some inverted);
        # every junction is a truth breakpoint.
        fa_path = args.out_prefix + ".fasta"
        bedpe_path = args.out_prefix + ".sim.bedpe"
        with open(fa_path, "wb") as ff, open(bedpe_path, "w") as fb:
            for i in range(args.events):
                n_seg = int(rng.integers(3, 7))
                segs = []
                # Keep contigs ~30 kb (the real CGR_Events contig size,
                # inside the reference's 32 kb read cap).
                max_seg = 30000 // n_seg
                for _ in range(n_seg):
                    size = int(rng.integers(2000, max_seg))
                    c, cs, p = pick_locus(size)
                    piece = chars(cs + p, size)
                    inv = rng.random() < 0.4
                    if inv:
                        piece = piece.translate(comp2)[::-1]
                    segs.append((genome.names[c], p, size, inv, piece))
                contig = b"".join(s[4] for s in segs)
                # Mutations (E1-style 1% with 10% small indels).
                if args.err > 0:
                    r = bytearray(contig)
                    nerr = rng.binomial(len(r), args.err)
                    for _ in range(int(nerr)):
                        j = int(rng.integers(0, len(r)))
                        if rng.random() < 0.1:
                            if rng.random() < 0.5 and len(r) > 1:
                                del r[j]
                            else:
                                r.insert(j, bases[rng.integers(0, 4)])
                        else:
                            r[j] = bases[rng.integers(0, 4)]
                    contig = bytes(r)
                ff.write(b">CGR%d\n" % i)
                for k in range(0, len(contig), 70):
                    ff.write(contig[k:k + 70] + b"\n")
                for (na, pa, sa, ia, _), (nb, pb, sb, ib, _) in zip(
                        segs, segs[1:]):
                    ea = pa if ia else pa + sa - 1
                    sb_ = pb + sb - 1 if ib else pb
                    fb.write("%s\t%d\t%d\t%s\t%d\t%d\tCGR\n" %
                             (na, ea - 1, ea, nb, sb_, sb_ + 1))
        print("wrote %s + %s (%d CGR contigs)" %
              (fa_path, bedpe_path, args.events))
        return

    events = []      # (name, contig bytes, bedpe row)
    kinds = ["DEL", "DUP", "INV", "INS"]
    for i in range(args.events):
        kind = kinds[i % 4]
        size = int(rng.integers(100, 2000))
        if kind == "DEL":
            c, cs, p = pick_locus(size)
            name = genome.names[c]
            contig = chars(cs + p - fl, fl) + chars(cs + p + size, fl)
            bed = (name, p - 1, p, name, p + size, p + size + 1)
        elif kind == "DUP":
            c, cs, p = pick_locus(size)
            name = genome.names[c]
            # Tandem duplication: junction between copy end and start.
            contig = (chars(cs + p - fl, fl + size) +
                      chars(cs + p, size + fl))
            bed = (name, p + size - 1, p + size, name, p, p + 1)
        elif kind == "INV":
            c, cs, p = pick_locus(size)
            name = genome.names[c]
            inv = chars(cs + p, size).translate(comp)[::-1]
            contig = chars(cs + p - fl, fl) + inv + \
                chars(cs + p + size, fl)
            bed = (name, p - 1, p, name, p + size - 1, p + size)
        else:  # distal INS: insert a distant segment at p
            c, cs, p = pick_locus(10)
            c2, cs2, p2 = pick_locus(size)
            name = genome.names[c]
            name2 = genome.names[c2]
            contig = (chars(cs + p - fl, fl) + chars(cs2 + p2, size) +
                      chars(cs + p, fl))
            bed = (name, p - 1, p, name2, p2, p2 + 1)
        events.append(("EV%d_%s" % (i, kind), contig, bed))

    n_reads_per = max(1, (len(events[0][1]) * args.coverage)
                      // args.read_len)
    fa_path = args.out_prefix + ".fasta"
    bedpe_path = args.out_prefix + ".sim.bedpe"
    with open(fa_path, "wb") as f:
        for name, contig, _ in events:
            span = len(contig) - args.read_len
            if span <= 0:
                continue
            n_reads = max(1, (len(contig) * args.coverage)
                          // args.read_len)
            for k in range(n_reads):
                p = int(rng.integers(0, span + 1))
                r = bytearray(contig[p:p + args.read_len])
                nerr = rng.binomial(len(r), args.err)
                for _ in range(int(nerr)):
                    j = int(rng.integers(0, len(r)))
                    r[j] = bases[rng.integers(0, 4)]
                if rng.random() < 0.5:
                    r = bytearray(bytes(r).translate(comp)[::-1])
                f.write(b">%s_rd%d\n%s\n" % (name.encode(), k, bytes(r)))
    with open(bedpe_path, "w") as f:
        for name, _, bed in events:
            f.write("%s\t%d\t%d\t%s\t%d\t%d\t%s\n" %
                    (bed[0], bed[1], bed[2], bed[3], bed[4], bed[5], name))
    print("wrote %s + %s (%d events)" % (fa_path, bedpe_path, len(events)))


if __name__ == "__main__":
    main()
