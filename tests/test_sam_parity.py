"""End-to-end SAM/Blast8 byte-parity vs reference goldens.

Each case reproduces a reference run (tools/make_goldens.sh) inside a
scratch dir with the same relative file names, so even the @PG CL line is
byte-identical.
"""
import gzip
import os
import shutil
import subprocess
import sys

import pytest

from conftest import DATA, GOLD

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    ("A_default.sam", "readsA_100bp.fasta", "testgen.X11_01_65525S", ["-osh"]),
    ("A_soft.sam", "readsA_100bp.fasta", "testgen.X11_01_65525S", ["-oss"]),
    ("A_fbs.sam", "readsA_100bp.fasta", "testgen.X11_01_65525S",
     ["-FBS", "Y", "-osh"]),
    ("A_all.sam", "readsA_100bp.fasta", "testgen.X11_01_65525S",
     ["-OQC", "N", "-osh"]),
    ("A_edit.sam", "readsA_100bp.fasta", "testgen.X11_01_65525S",
     ["-AGS", "N", "-osh"]),
    ("A_blast8.out", "readsA_100bp.fasta", "testgen.X11_01_65525S", ["-o8"]),
    ("A_h20.sam", "readsA_100bp.fasta", "testgen.X11_01_00020S",
     ["-H", "20", "-osh"]),
    ("B_default.sam", "readsB_500bp.fasta", "testgen.X11_01_65525S", ["-osh"]),
    ("B_fbs.sam", "readsB_500bp.fasta", "testgen.X11_01_65525S",
     ["-FBS", "Y", "-osh"]),
    ("C_default.sam", "readsC_1kb.fasta", "testgen.X11_01_65525S", ["-osh"]),
    ("C_params.sam", "readsC_1kb.fasta", "testgen.X11_01_65525S",
     ["-BW", "3", "-G", "20", "-M", "15", "-X", "15", "-osh"]),
    ("D_default.sam", "readsD_sv.fasta", "testgen.X11_01_65525S", ["-osh"]),
    ("D_fbs.sam", "readsD_sv.fasta", "testgen.X11_01_65525S",
     ["-FBS", "Y", "-osh"]),
    ("D_all.sam", "readsD_sv.fasta", "testgen.X11_01_65525S",
     ["-OQC", "N", "-osh"]),
    ("E_fastq.sam", "readsE_150bp.fastq", "testgen.X11_01_65525S", ["-osh"]),
    ("F_edge.sam", "readsF_edge.fasta", "testgen.X11_01_65525S", ["-osh"]),
    ("B_scoring.sam", "readsB_500bp.fasta", "testgen.X11_01_65525S",
     ["-GOC", "6", "-GEC", "1", "-RC", "4", "-MS", "2", "-osh"]),
    ("D_bp.sam", "readsD_sv.fasta", "testgen.X11_01_65525S",
     ["-BP", "10", "-MGDP", "9", "-MNO", "10", "-osh"]),
    ("D_strict.sam", "readsD_sv.fasta", "testgen.X11_01_65525S",
     ["-P", "0.95", "-M", "40", "-osh"]),
    ("C_blast8.out", "readsC_1kb.fasta", "testgen.X11_01_65525S", ["-o8"]),
    ("D_fbs_loose.sam", "readsD_sv.fasta", "testgen.X11_01_65525S",
     ["-FBS", "Y", "-PRL", "0.5", "-PSS", "0.5", "-osh"]),
]


@pytest.fixture(scope="module")
def scratch(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity")
    for f in os.listdir(DATA):
        shutil.copy(os.path.join(DATA, f), d)
    shutil.copy(os.path.join(GOLD, "testgen.nib2"), d)
    for idx in ("testgen.X11_01_65525S", "testgen.X11_01_00020S"):
        with gzip.open(os.path.join(GOLD, idx + ".gz")) as f:
            with open(os.path.join(d, idx), "wb") as out:
                out.write(f.read())
    return d


@pytest.mark.parametrize("out_name,reads,idx,args", CASES,
                         ids=[c[0] for c in CASES])
def test_sam_parity(scratch, out_name, reads, idx, args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    cmd = [sys.executable, "-m", "yaha_tpu.cli", "-x", idx, "-q", reads,
           "--engine", "oracle", *args, out_name]
    r = subprocess.run(cmd, cwd=scratch, env=env, capture_output=True,
                       timeout=2400)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    with open(os.path.join(scratch, out_name), "rb") as f:
        mine = f.read()
    with open(os.path.join(GOLD, out_name), "rb") as f:
        gold = f.read()
    # --engine is a yaha_tpu extension and not part of the @PG CL line,
    # so the comparison stays fully byte-exact.
    assert mine == gold, "output differs from reference golden"


@pytest.mark.parametrize("out_name,reads,idx,args", CASES,
                         ids=["native-" + c[0] for c in CASES])
def test_sam_parity_native_engine(scratch, out_name, reads, idx, args):
    """The full C++ per-read pipeline (--engine native, yaha_pipe.cpp)
    must hit the same byte-exact goldens as the oracle."""
    from yaha_tpu.native import host
    if not host.available():
        pytest.skip("native library not built")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    out_path = "native_" + out_name
    cmd = [sys.executable, "-m", "yaha_tpu.cli", "-x", idx, "-q", reads,
           "--engine", "native", *args, out_path]
    r = subprocess.run(cmd, cwd=scratch, env=env, capture_output=True,
                       timeout=2400)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    with open(os.path.join(scratch, out_path), "rb") as f:
        mine = f.read()
    with open(os.path.join(GOLD, out_name), "rb") as f:
        gold = f.read()
    # @PG embeds the -o file name, which differs here by design.
    strip = lambda b: [l for l in b.splitlines() if not l.startswith(b"@PG")]
    assert strip(mine) == strip(gold), \
        "native engine output differs from reference golden"


def test_native_engine_threads_deterministic(scratch):
    """-t 4 through the native engine is byte-identical to -t 1 (the
    reference's -t output is completion-order dependent; ours is
    input-ordered by construction)."""
    from yaha_tpu.native import host
    if not host.available():
        pytest.skip("native library not built")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    outs = []
    for t in ("1", "4"):
        out = "nthreads_%s.sam" % t
        cmd = [sys.executable, "-m", "yaha_tpu.cli",
               "-x", "testgen.X11_01_65525S", "-q", "readsD_sv.fasta",
               "--engine", "native", "-t", t, "-osh", out]
        r = subprocess.run(cmd, cwd=scratch, env=env, capture_output=True,
                           timeout=2400)
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        with open(os.path.join(scratch, out), "rb") as f:
            # @PG embeds the -t value and output name; ignore it.
            outs.append([l for l in f.read().splitlines()
                         if not l.startswith(b"@PG")])
    assert outs[0] == outs[1]
