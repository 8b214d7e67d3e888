#!/usr/bin/env python3
"""Generate deterministic synthetic genome + read sets for golden-parity testing.

The reference repository ships hg18-simulated reads but no genome
(/root/reference/testdata, .fasta.gz read sets only), so SAM-parity goldens are
generated against a synthetic genome small enough to commit.  Structure mirrors
the reference test strategy (SURVEY.md section 4): sim reads at several lengths /
error rates plus SV (split-read) reads with known breakpoints.
"""
import argparse
import gzip
import os
import random

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data")

BASES = "ACGT"


def rand_seq(rng, n):
    return "".join(rng.choice(BASES) for _ in range(n))


def make_genome(rng):
    # chr1: 120kb with planted repeats; chr2: 60kb sharing blocks with chr1.
    chr1 = list(rand_seq(rng, 120000))
    alu = rand_seq(rng, 300)
    # Plant ~30 slightly mutated copies of a 300bp repeat to exercise maxHits.
    for _ in range(30):
        pos = rng.randrange(0, len(chr1) - 300)
        copy = list(alu)
        for _ in range(rng.randrange(0, 8)):
            i = rng.randrange(300)
            copy[i] = rng.choice(BASES)
        chr1[pos:pos + 300] = copy
    # A 2kb exact duplication within chr1.
    src = rng.randrange(0, 50000)
    dst = rng.randrange(60000, 110000)
    chr1[dst:dst + 2000] = chr1[src:src + 2000]
    # Some N runs.
    for _ in range(4):
        pos = rng.randrange(0, len(chr1) - 500)
        n = rng.randrange(20, 400)
        chr1[pos:pos + n] = ["N"] * n
    chr1 = "".join(chr1)

    chr2 = list(rand_seq(rng, 60000))
    # Copy two blocks from chr1 (cross-chrom homology).
    for blk, at in ((5000, 10000), (1000, 40000)):
        src = rng.randrange(0, 100000)
        chr2[at:at + blk] = chr1[src:src + blk]
    chr2 = "".join(chr2)
    return {"chr1": chr1, "chr2": chr2}


COMP = str.maketrans("ACGTNacgtn", "TGCANtgcan")


def revcomp(s):
    return s.translate(COMP)[::-1]


def mutate(rng, s, sub_rate, indel_rate=0.0):
    out = []
    for c in s:
        r = rng.random()
        if r < sub_rate:
            out.append(rng.choice([b for b in BASES if b != c]))
        elif r < sub_rate + indel_rate:
            if rng.random() < 0.5:
                out.append(c)
                out.append(rng.choice(BASES))  # insertion
            # else deletion: drop base
        else:
            out.append(c)
    return "".join(out)


def sample_read(rng, genome, length):
    names = sorted(genome)
    chrom = rng.choice(names)
    seq = genome[chrom]
    while True:
        pos = rng.randrange(0, len(seq) - length)
        s = seq[pos:pos + length]
        if s.count("N") < length // 4:
            return chrom, pos, s


def write_fasta(path, recs, width=70):
    with open(path, "w") as f:
        for name, seq in recs:
            f.write(">" + name + "\n")
            for i in range(0, len(seq), width):
                f.write(seq[i:i + width] + "\n")


def write_fastq(path, recs, rng):
    with open(path, "w") as f:
        for name, seq in recs:
            qual = "".join(chr(33 + rng.randrange(10, 40)) for _ in seq)
            f.write("@%s\n%s\n+\n%s\n" % (name, seq, qual))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=OUT)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    rng = random.Random(20260816)

    genome = make_genome(rng)
    write_fasta(os.path.join(args.outdir, "testgen.fasta"),
                [("chr1 synthetic test chromosome 1", genome["chr1"]),
                 ("chr2", genome["chr2"])], width=70)

    # Set A: 200 x 100bp, 2% subs.
    recs = []
    for i in range(200):
        chrom, pos, s = sample_read(rng, genome, 100)
        s = mutate(rng, s, 0.02)
        if rng.random() < 0.5:
            s = revcomp(s)
        recs.append(("rdA_%d_%s_%d" % (i, chrom, pos), s))
    write_fasta(os.path.join(args.outdir, "readsA_100bp.fasta"), recs)

    # Set B: 100 x 500bp, subs + indels.
    recs = []
    for i in range(100):
        chrom, pos, s = sample_read(rng, genome, 500)
        s = mutate(rng, s, 0.02, 0.005)
        if rng.random() < 0.5:
            s = revcomp(s)
        recs.append(("rdB_%d_%s_%d" % (i, chrom, pos), s))
    write_fasta(os.path.join(args.outdir, "readsB_500bp.fasta"), recs)

    # Set C: 50 x 1000bp, 5% error.
    recs = []
    for i in range(50):
        chrom, pos, s = sample_read(rng, genome, 1000)
        s = mutate(rng, s, 0.05, 0.01)
        if rng.random() < 0.5:
            s = revcomp(s)
        recs.append(("rdC_%d_%s_%d" % (i, chrom, pos), s))
    write_fasta(os.path.join(args.outdir, "readsC_1kb.fasta"), recs)

    # Set D: SV split reads (deletion / inversion / translocation breakpoints).
    recs = []
    for i in range(100):
        kind = rng.choice(["del", "inv", "tra"])
        if kind == "del":
            chrom, pos, _ = sample_read(rng, genome, 6000)
            seq = genome[chrom]
            half = rng.randrange(150, 350)
            gap = rng.randrange(300, 5000)
            s = seq[pos:pos + half] + seq[pos + half + gap:pos + half + gap + (500 - half)]
        elif kind == "inv":
            chrom, pos, s0 = sample_read(rng, genome, 500)
            half = rng.randrange(150, 350)
            s = s0[:half] + revcomp(s0[half:])
        else:
            c1, p1, s1 = sample_read(rng, genome, 300)
            c2, p2, s2 = sample_read(rng, genome, 300)
            half = rng.randrange(120, 250)
            s = s1[:half] + s2[:500 - half]
        s = mutate(rng, s, 0.01)
        if rng.random() < 0.5:
            s = revcomp(s)
        recs.append(("rdD_%d_%s" % (i, kind), s))
    write_fasta(os.path.join(args.outdir, "readsD_sv.fasta"), recs)

    # Set E: FASTQ of 60 x 150bp reads.
    recs = []
    for i in range(60):
        chrom, pos, s = sample_read(rng, genome, 150)
        s = mutate(rng, s, 0.02)
        if rng.random() < 0.5:
            s = revcomp(s)
        recs.append(("rdE_%d_%s_%d" % (i, chrom, pos), s))
    write_fastq(os.path.join(args.outdir, "readsE_150bp.fastq"), recs, rng)

    # Edge cases.
    edge = []
    chrom, pos, s = sample_read(rng, genome, 120)
    edge.append(("edge with spaces in id", s))
    edge.append(("edge_verylongid_" + "x" * 250, sample_read(rng, genome, 120)[2]))
    edge.append(("edge_short", "ACGTACGTAC"))  # < wordLen, skipped
    sN = list(sample_read(rng, genome, 120)[2])
    sN[30:40] = ["N"] * 10
    edge.append(("edge_with_Ns", "".join(sN)))
    edge.append(("edge_lowercase", sample_read(rng, genome, 120)[2].lower()))
    edge.append(("edge_nonacgt", sample_read(rng, genome, 120)[2][:50] + "RYKM" +
                 sample_read(rng, genome, 120)[2][:50]))
    edge.append(("edge_allN", "N" * 100))
    write_fasta(os.path.join(args.outdir, "readsF_edge.fasta"), edge)

    print("wrote test data to", args.outdir)


if __name__ == "__main__":
    main()
