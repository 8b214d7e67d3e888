"""Device front end (models/frontend.py): seed->fragment->chain on the
jax device, byte-parity with the host front end through the full engine.

Kept small: the 8-vdev CPU test environment compiles jit programs ~11x
slower than a plain CPU backend, so this uses a handful of reads (small
batch/length/capacity buckets) while the full golden sweep runs in CI via
the batch-xla engine manually (see NOTES.md) and on real TPU hardware.
"""
import os
import subprocess
import sys

import pytest

from conftest import DATA, GOLD

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_device_frontend_small_parity(tmp_path):
    import gzip
    import shutil
    shutil.copy(os.path.join(DATA, "readsF_edge.fasta"), tmp_path)
    shutil.copy(os.path.join(GOLD, "testgen.nib2"), tmp_path)
    with gzip.open(os.path.join(GOLD, "testgen.X11_01_65525S.gz")) as f:
        with open(os.path.join(tmp_path, "testgen.X11_01_65525S"),
                  "wb") as out:
            out.write(f.read())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # --frontend device pins the device front end (batch-xla defaults
    # to the staged native frontend since round 3).
    r = subprocess.run(
        [sys.executable, "-m", "yaha_tpu.cli", "-x",
         "testgen.X11_01_65525S", "-q", "readsF_edge.fasta",
         "--engine", "batch-xla", "--frontend", "device",
         "-osh", "F_edge.sam"],
        cwd=tmp_path, env=env, capture_output=True, timeout=2400)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    with open(os.path.join(tmp_path, "F_edge.sam"), "rb") as f:
        mine = f.read()
    with open(os.path.join(GOLD, "F_edge.sam"), "rb") as f:
        gold = f.read()
    assert mine == gold


def test_device_frontend_module_direct():
    """Direct module-level check on tiny synthetic state: device hit
    expansion matches the host seed path."""
    import numpy as np
    from yaha_tpu.ops import seeds_jax
    import jax.numpy as jnp

    word_len = 4
    # Genome: positions of each 4-mer; build a toy SO/ROA pair.
    rng = np.random.RandomState(7)
    genome = rng.randint(0, 4, size=512).astype(np.uint8)
    ht = 4 ** word_len
    hashes_g = np.zeros(len(genome) - word_len + 1, np.int64)
    h = 0
    for i, c in enumerate(genome):
        h = ((h << 2) | int(c)) & (ht - 1)
        if i >= word_len - 1:
            hashes_g[i - word_len + 1] = h
    counts = np.bincount(hashes_g, minlength=ht)
    so = np.zeros(ht + 1, np.uint32)
    so[1:] = np.cumsum(counts)
    order = np.argsort(hashes_g, kind="stable")
    roa = order.astype(np.uint32)

    read = genome[100:160].copy()
    codes = read[None, :]
    lengths = np.array([len(read)], np.int32)
    hs, clean = seeds_jax.batched_seed_hashes(
        jnp.asarray(codes), jnp.asarray(lengths), word_len=word_len)
    out = seeds_jax.expand_sort_hits_device(
        hs, clean, jnp.asarray(so), jnp.asarray(roa), max_hits=650,
        capacity=1024)
    total = int(out["total"][0])
    assert total > 0
    assert not bool(out["overflow"][0])
    diag = np.asarray(out["diag"][0][:total]).astype(np.int64)
    qo = np.asarray(out["qo"][0][:total]).astype(np.int64)
    # Host reference expansion.
    exp = []
    for p in range(len(read) - word_len + 1):
        hv = 0
        for c in read[p:p + word_len]:
            hv = (hv << 2) | int(c)
        lo, hi = int(so[hv]), int(so[hv + 1])
        for j in range(lo, hi):
            exp.append((((int(roa[j]) - p) & 0xFFFFFFFF), p))
    exp.sort()
    got = sorted(zip(diag.tolist(), qo.tolist()))
    assert got == exp


def test_device_frontend_phantom_injection_parity():
    """Reads whose seed runs all wrap (ro < qo) stay on the device path:
    the device flags the wrapped windows and the exact phantom hits
    (QueryMatch.c:57-69) are injected host-side — byte parity with the
    host front end, zero fallbacks."""
    import gzip
    import numpy as np
    from conftest import GOLD
    from yaha_tpu.config import AlignmentArgs
    from yaha_tpu.io import nib2, fasta, index_io
    from yaha_tpu.models.aligner import BatchAligner

    with open(os.path.join(GOLD, "testgen.nib2"), "rb") as f:
        genome = nib2.load(f.read())
    with gzip.open(os.path.join(GOLD, "testgen.X11_01_65525S.gz")) as f:
        raw = f.read()
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".X11_01_65525S",
                                     delete=False) as tf:
        tf.write(raw)
        xname = tf.name
    index = index_io.load_index(xname)
    os.unlink(xname)

    # Reads = random prefix + the genome start: suffix windows map to
    # reference offsets < their query offsets, so unique k-mers near the
    # genome start produce all-wrapped runs.
    rng = np.random.RandomState(3)
    start = genome.codes[:90]                    # 4-bit codes (T=0..G=3)
    reads = []
    for k in range(4):
        pre = rng.randint(0, 4, 50).astype(np.uint8)
        chars = b"".join(b"TCAG"[c:c + 1]
                         for c in np.concatenate([pre, start]))
        reads.append(b">ph%d\n%s\n" % (k, chars))
    qdata = b"".join(reads)

    aa = AlignmentArgs()
    aa.word_len = index.word_len
    aa.qfile_name = "ph.fa"
    aa.xfile_name = "x"
    aa.ofile_name = "o.sam"
    aa.post_process(True)
    aa.max_hits = min(aa.max_hits, index.max_hits)
    records = list(fasta.read_queries(qdata, aa))

    host_al = BatchAligner(aa, genome, index, backend="numpy")
    out_host = host_al.align_batch(records)
    dev_al = BatchAligner(aa, genome, index, backend="numpy",
                          frontend="device")
    from yaha_tpu.core.pipeline import QueryState
    probe = [QueryState(aa, genome, index) for _ in records]
    for qs, rec in zip(probe, records):
        qs.set_query(rec)
    n_fallback = dev_al.frontend.process_batch(probe)
    assert n_fallback == 0, "phantom reads must not fall back"
    assert dev_al.frontend.n_phantom_injected > 0, \
        "expected wrapped runs on these reads"
    out_dev = dev_al.align_batch(records)
    assert out_dev == out_host
