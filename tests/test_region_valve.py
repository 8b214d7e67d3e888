"""--max-region-frags safety valve: skip pathological repeat regions.

The chain DP is O(n^2) over a region's fragments; tandem-repeat reads
can put 10^5 fragments into one region (minutes per read; the reference
binary segfaults on some such inputs, NOTES.md).  The opt-in valve skips
oversized regions with a warning.  Default (0) keeps byte parity — the
full golden suite runs with it off.
"""
import gzip
import os
import random
import shutil
import subprocess
import sys

from conftest import DATA, GOLD

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stage(tmp_path):
    shutil.copy(os.path.join(GOLD, "testgen.nib2"), tmp_path)
    with gzip.open(os.path.join(GOLD, "testgen.X11_01_65525S.gz")) as f:
        with open(os.path.join(tmp_path, "testgen.X11_01_65525S"),
                  "wb") as out:
            out.write(f.read())
    # A read that is 200 tandem copies of a genome 20-mer: every window
    # hits, diagonals step by 20 (< maxGap 50), so all fragments land in
    # one huge region per strand.
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_testdata as mt
    rng = random.Random(20260816)
    genome = mt.make_genome(rng)
    chrom = sorted(genome)[0]
    unit = genome[chrom][5000:5020]
    with open(os.path.join(tmp_path, "tandem.fasta"), "w") as f:
        f.write(">tandem_read\n%s\n" % (unit * 200))


def _run(tmp_path, *args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "yaha_tpu.cli", *args],
        cwd=tmp_path, env=env, capture_output=True, timeout=600)


def test_region_valve_native_and_oracle(tmp_path):
    _stage(tmp_path)
    results = {}
    for engine in ("native", "oracle"):
        r = _run(tmp_path, "-x", "testgen.X11_01_65525S", "-q",
                 "tandem.fasta", "--engine", engine,
                 "--max-region-frags", "100", "-osh",
                 "out_%s.sam" % engine)
        assert r.returncode == 0, r.stderr.decode()[-1500:]
        assert b"skipped 2 fragment region(s)" in r.stderr, r.stderr
        with open(os.path.join(tmp_path, "out_%s.sam" % engine),
                  "rb") as f:
            results[engine] = [l for l in f.read().splitlines()
                               if not l.startswith(b"@PG")]
    assert results["native"] == results["oracle"]


def test_region_valve_off_is_parity(tmp_path):
    """Cap off (default): no warning, and output equals a cap so large
    it never triggers."""
    _stage(tmp_path)
    r0 = _run(tmp_path, "-x", "testgen.X11_01_65525S", "-q",
              "tandem.fasta", "--engine", "native", "-osh", "off.sam")
    assert r0.returncode == 0
    assert b"skipped" not in r0.stderr
    r1 = _run(tmp_path, "-x", "testgen.X11_01_65525S", "-q",
              "tandem.fasta", "--engine", "native",
              "--max-region-frags", "10000000", "-osh", "huge.sam")
    assert r1.returncode == 0
    with open(os.path.join(tmp_path, "off.sam"), "rb") as f:
        a = [l for l in f.read().splitlines()
             if not l.startswith(b"@PG")]
    with open(os.path.join(tmp_path, "huge.sam"), "rb") as f:
        b = [l for l in f.read().splitlines()
             if not l.startswith(b"@PG")]
    assert a == b
