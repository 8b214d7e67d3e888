#!/usr/bin/env python3
"""Generate a human-scale synthetic genome FASTA (default 3 Gbp).

Chunked numpy generation with interspersed repeats and N runs so the
index build sees a realistic k-mer count distribution (repeats create
over-maxHits k-mers exercising the Floyd down-sampling) and the scan
exercises the bad-run renormalization.

Usage: python3 tools/make_big_genome.py out.fasta [--gbp 3.0] [--seed 7]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--gbp", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--chroms", type=int, default=24)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    total = int(args.gbp * 1e9)
    per_chrom = total // args.chroms

    # A family of repeat units reused across the genome (Alu-ish).
    reps = [bases[rng.integers(0, 4, rng.integers(150, 500))]
            for _ in range(8)]

    with open(args.out, "wb", buffering=1 << 22) as f:
        for c in range(args.chroms):
            f.write(b">chr%d\n" % (c + 1))
            remaining = per_chrom
            while remaining > 0:
                n = min(remaining, 8 << 20)
                seq = bases[rng.integers(0, 4, n)]
                # Sprinkle repeats (~5% of sequence).
                n_rep = max(1, n // 60000)
                for _ in range(n_rep):
                    rep = reps[int(rng.integers(0, len(reps)))]
                    p = int(rng.integers(0, max(1, n - len(rep))))
                    seq[p:p + len(rep)] = rep[:max(0, n - p)][:len(rep)]
                # Occasional N runs.
                if rng.random() < 0.3:
                    p = int(rng.integers(0, max(1, n - 1000)))
                    seq[p:p + int(rng.integers(10, 1000))] = ord("N")
                # 70-char lines.
                pad = (-len(seq)) % 70
                if pad:
                    seq = np.concatenate(
                        [seq, np.full(pad, ord("\n"), np.uint8)])
                lines = seq.reshape(-1, 70)
                out = np.empty((lines.shape[0], 71), np.uint8)
                out[:, :70] = lines
                out[:, 70] = ord("\n")
                # Trim the pad region of the final row.
                buf = out.tobytes()
                if pad:
                    buf = buf[:-(pad + 1)] + b"\n"
                f.write(buf)
                remaining -= n
    print("wrote %s (%.2f Gbp, %d chroms)" %
          (args.out, total / 1e9, args.chroms))


if __name__ == "__main__":
    main()
