"""Long reads beyond the reference's 32 kb cap (--max-query-length).

The reference rejects reads over maxQueryLength 32000 (AlignArgs.c:82);
banded DP makes per-read cost linear in length, so the only hard limits
were buffer sizes and the int16/uint16 score wraps (Math.h:517-521,
GraphPath.cpp:71,305) that byte parity forces at <= 32 kb.  With
--max-query-length above 32000 the native engine switches to wide
(int64) scores — a >32767 match score would otherwise wrap negative in
OQC and lose to spurious alternatives — and aligns arbitrarily long
reads (SURVEY.md section 5 "long-context", the CP-analog row).
"""
import gzip
import os
import random
import shutil
import subprocess
import sys

from conftest import GOLD

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stage(tmp_path):
    shutil.copy(os.path.join(GOLD, "testgen.nib2"), tmp_path)
    with gzip.open(os.path.join(GOLD, "testgen.X11_01_65525S.gz")) as f:
        with open(os.path.join(tmp_path, "testgen.X11_01_65525S"),
                  "wb") as out:
            out.write(f.read())
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_testdata as mt
    rng = random.Random(20260816)
    genome = mt.make_genome(rng)
    # 105 kb three-segment SV read: chr1 fwd + chr2 fwd + chr1 revcomp.
    seg1 = genome["chr1"][2000:52000]
    seg2 = genome["chr2"][5000:35000]
    seg3 = mt.revcomp(genome["chr1"][60000:85000])
    read = list(seg1 + seg2 + seg3)
    rr = random.Random(99)
    for _ in range(len(read) // 200):   # 0.5% substitutions
        p = rr.randrange(len(read))
        read[p] = rr.choice("ACGT")
    with open(os.path.join(tmp_path, "long.fasta"), "w") as f:
        f.write(">long105k\n%s\n" % "".join(read))


def _run(tmp_path, *args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "yaha_tpu.cli", *args],
        cwd=tmp_path, env=env, capture_output=True, timeout=1800)


def test_native_long_read_split_alignment(tmp_path):
    _stage(tmp_path)
    r = _run(tmp_path, "-x", "testgen.X11_01_65525S", "-q", "long.fasta",
             "--engine", "native", "--max-query-length", "150000",
             "-osh", "long.sam")
    assert r.returncode == 0, r.stderr.decode()[-1500:]
    with open(os.path.join(tmp_path, "long.sam")) as f:
        recs = [l.split("\t") for l in f if not l.startswith("@")]
    # OQC's best path recovers exactly the three planted segments, on
    # the right chromosomes/strands/positions (1-based SAM pos).
    got = sorted((c[2], int(c[1]) & 0x10, int(c[3])) for c in recs)
    assert len(recs) == 3, recs
    expect = sorted([("chr1", 0, 2001), ("chr2", 0, 5001),
                     ("chr1", 16, 60001)])
    for (ch, fl, pos), (ech, efl, epos) in zip(got, expect):
        assert ch == ech and fl == efl and abs(pos - epos) <= 2, \
            (got, expect)


def test_long_read_rejected_at_default_cap(tmp_path):
    """Without --max-query-length the reference's 32 kb cap applies:
    the oversized read is skipped with the reference's warning
    (Query.c:148-166 skip-and-warn), not aligned or crashed on."""
    _stage(tmp_path)
    r = _run(tmp_path, "-x", "testgen.X11_01_65525S", "-q", "long.fasta",
             "--engine", "native", "-osh", "capped.sam")
    assert r.returncode == 0, r.stderr.decode()[-1500:]
    with open(os.path.join(tmp_path, "capped.sam")) as f:
        recs = [l for l in f if not l.startswith("@")]
    assert recs == [], recs
    assert b"exceeds maximum length of 32000" in r.stderr, r.stderr


def test_batch_xla_long_read_matches_native(tmp_path):
    """CP-analog through the device engines (SURVEY.md section 5): the
    same 105 kb read aligns byte-identically through the staged
    batch-xla engine (native host phases + device DP batches; extension
    problems bucket to a 128k-row tier whose banded DP stays linear in
    read length)."""
    _stage(tmp_path)
    r = _run(tmp_path, "-x", "testgen.X11_01_65525S", "-q", "long.fasta",
             "--engine", "native", "--max-query-length", "150000",
             "-osh", "long_native.sam")
    assert r.returncode == 0, r.stderr.decode()[-1500:]
    r = _run(tmp_path, "-x", "testgen.X11_01_65525S", "-q", "long.fasta",
             "--engine", "batch-xla", "--max-query-length", "150000",
             "-osh", "long_xla.sam")
    assert r.returncode == 0, r.stderr.decode()[-1500:]
    def strip_pg(t):
        # @PG embeds the -osh filename, which differs by design.
        return [l for l in t.split(b"\n") if not l.startswith(b"@PG")]
    with open(os.path.join(tmp_path, "long_native.sam"), "rb") as f:
        native = strip_pg(f.read())
    with open(os.path.join(tmp_path, "long_xla.sam"), "rb") as f:
        xla = strip_pg(f.read())
    assert native == xla
