#!/usr/bin/env python3
"""Split-read breakpoint recall vs a .bedpe truth set.

The reference's accuracy methodology (SURVEY.md section 4, testdata
README): SV events are validated by extracting breakpoints from adjacent
split alignments of the same read in the SAM output and matching them
against the simulation's .sim.bedpe truth within a slop window.

Works on the reference's bundled SV truth files
(/root/reference/testdata/*.sim.bedpe) and on synthetic sets.

Usage: python tools/bedpe_eval.py out.sam truth.bedpe [slop]
"""
import collections
import re
import sys


def read_sam_splits(path):
    """Breakpoints from consecutive primary split alignments per read."""
    aligns = collections.defaultdict(list)
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            t = line.rstrip("\n").split("\t")
            qname, flag, rname, pos, _, cigar = t[:6]
            flag = int(flag)
            pos = int(pos)
            # Aligned reference span from CIGAR.
            ref_len = sum(int(n) for n, op in
                          re.findall(r"(\d+)([MIDNSHP=X])", cigar)
                          if op in "MDN")
            # Query span (for ordering along the read).
            lead = re.match(r"(\d+)[SH]", cigar)
            qstart = int(lead.group(1)) if lead else 0
            strand = "-" if (flag & 0x10) else "+"
            aligns[qname].append((qstart, rname, pos, pos + ref_len - 1,
                                  strand))
    breakpoints = []
    for qname, parts in aligns.items():
        if len(parts) < 2:
            continue
        parts.sort()
        for a, b in zip(parts, parts[1:]):
            # Breakpoint = junction between adjacent query segments.
            pa = a[3] if a[4] == "+" else a[2]
            pb = b[2] if b[4] == "+" else b[3]
            breakpoints.append((a[1], pa, b[1], pb, qname))
    return breakpoints


def read_bedpe(path):
    events = []
    with open(path) as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            t = line.split("\t")
            events.append((t[0], int(t[1]), int(t[2]),
                           t[3], int(t[4]), int(t[5])))
    return events


def main():
    sam_path, bedpe_path = sys.argv[1], sys.argv[2]
    slop = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    bps = read_sam_splits(sam_path)
    events = read_bedpe(bedpe_path)
    hit = 0
    for (c1, s1, e1, c2, s2, e2) in events:
        found = False
        for (ca, pa, cb, pb, _) in bps:
            ok_fwd = (ca == c1 and s1 - slop <= pa <= e1 + slop and
                      cb == c2 and s2 - slop <= pb <= e2 + slop)
            ok_rev = (cb == c1 and s1 - slop <= pb <= e1 + slop and
                      ca == c2 and s2 - slop <= pa <= e2 + slop)
            if ok_fwd or ok_rev:
                found = True
                break
        hit += found
    total = len(events)
    print("breakpoint recall: %d/%d = %.1f%%  (%d candidate junctions, "
          "slop %d)" % (hit, total, 100.0 * hit / max(total, 1), len(bps),
                        slop))


if __name__ == "__main__":
    main()
