"""On-TPU parity for the jax engines (skipped when no TPU is attached).

VERDICT item: pin the flagship path in CI — --engine batch-pallas runs
the staged engine's Pallas DP kernels (and, with --seed device, the
device seed phase) on the real chip and must hit the byte-exact golden.
"""
import gzip
import os
import shutil
import subprocess
import sys

import pytest

from conftest import DATA, GOLD

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON_SITE = "/root/.axon_site"


def _tpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    env["PYTHONPATH"] = REPO + os.pathsep + AXON_SITE
    env.pop("XLA_FLAGS", None)
    return env


def _have_tpu():
    if not os.path.isdir(AXON_SITE):
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(any(d.platform == 'tpu' "
             "for d in jax.devices()))"],
            env=_tpu_env(), capture_output=True, timeout=120, text=True)
    except subprocess.TimeoutExpired:
        # A down tunnel blocks device enumeration indefinitely; treat it
        # as "no TPU" so the suite skips instead of erroring.
        return False
    return r.returncode == 0 and "True" in r.stdout


def test_batch_pallas_on_tpu_parity(tmp_path):
    if not _have_tpu():
        pytest.skip("no TPU attached")
    shutil.copy(os.path.join(DATA, "readsA_100bp.fasta"), tmp_path)
    shutil.copy(os.path.join(GOLD, "testgen.nib2"), tmp_path)
    with gzip.open(os.path.join(GOLD, "testgen.X11_01_65525S.gz")) as f:
        with open(os.path.join(tmp_path, "testgen.X11_01_65525S"),
                  "wb") as out:
            out.write(f.read())
    r = subprocess.run(
        [sys.executable, "-m", "yaha_tpu.cli", "-x",
         "testgen.X11_01_65525S", "-q", "readsA_100bp.fasta",
         "--engine", "batch-pallas", "-osh", "A_default.sam"],
        cwd=tmp_path, env=_tpu_env(), capture_output=True, timeout=2400)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    with open(os.path.join(tmp_path, "A_default.sam"), "rb") as f:
        mine = f.read()
    with open(os.path.join(GOLD, "A_default.sam"), "rb") as f:
        gold = f.read()
    assert mine == gold


def test_seed_device_on_tpu_parity(tmp_path):
    """--seed device pins the device seed phase (k-mer scan + SO/ROA
    lookup + hit sort on the chip, models/seeder.DeviceSeeder) composed
    with the staged engine; byte parity with the golden on the edge-case
    read set (round 5: the DeviceSeeder replaced the retired device
    front end as the on-chip seed path)."""
    if not _have_tpu():
        pytest.skip("no TPU attached")
    shutil.copy(os.path.join(DATA, "readsF_edge.fasta"), tmp_path)
    shutil.copy(os.path.join(GOLD, "testgen.nib2"), tmp_path)
    with gzip.open(os.path.join(GOLD, "testgen.X11_01_65525S.gz")) as f:
        with open(os.path.join(tmp_path, "testgen.X11_01_65525S"),
                  "wb") as out:
            out.write(f.read())
    r = subprocess.run(
        [sys.executable, "-m", "yaha_tpu.cli", "-x",
         "testgen.X11_01_65525S", "-q", "readsF_edge.fasta",
         "--engine", "batch-pallas", "--seed", "device",
         "-osh", "F_edge.sam"],
        cwd=tmp_path, env=_tpu_env(), capture_output=True, timeout=2400)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    with open(os.path.join(tmp_path, "F_edge.sam"), "rb") as f:
        mine = f.read()
    with open(os.path.join(GOLD, "F_edge.sam"), "rb") as f:
        gold = f.read()
    assert mine == gold


def test_anchored_pallas_variants_on_tpu(tmp_path):
    """Both Pallas anchored (gap-fill) kernels — full-matrix and
    band-relative — bit-identical on the real chip to the native host
    DP, including the banded-layout backtrack decode (VERDICT r2 #9)."""
    if not _have_tpu():
        pytest.skip("no TPU attached")
    script = r"""
import numpy as np
from yaha_tpu.ops import sw_pallas
from yaha_tpu.ops import dp_common
from yaha_tpu.native import host

rng = np.random.default_rng(31)
n, ql, rl = sw_pallas.TILE, 24, 32
q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
r = rng.integers(0, 4, (n, rl)).astype(np.uint8)
qlens = rng.integers(4, ql + 1, n).astype(np.int64)
rlens = rng.integers(4, rl + 1, n).astype(np.int64)
lbw = np.maximum(1, qlens - 1)
rbw = np.maximum(1, rlens - 1)
KW = dict(go=5, ge=2, rc=3, ms=1, max_gap=50, max_intron=50)
ref = host.anchored_forward(q, qlens, r, rlens, lbw, rbw, **KW)
full = sw_pallas.anchored_forward_pallas(q, qlens, r, rlens, lbw, rbw,
                                         **KW)
wband = int((lbw + rbw).max()) + 1
band = sw_pallas.anchored_forward_pallas_banded(
    q, qlens, r, rlens, lbw, rbw, wband=wband, **KW)
assert np.array_equal(np.asarray(full["score"]), ref["score"])
assert np.array_equal(np.asarray(band["score"]), ref["score"])
bt = np.asarray(full["bt"])
bt_b = np.asarray(band["bt_b"])
for k in range(0, n, 97):
    want = dp_common.traceback_anchored(ref["eo"][k], ref["idc"][k],
                                        int(qlens[k]), int(rlens[k]))
    assert dp_common.traceback_anchored_packed(
        bt[k], int(qlens[k]), int(rlens[k])) == want, k
    assert dp_common.traceback_anchored_banded_packed(
        bt_b[k], int(lbw[k]), int(qlens[k]), int(rlens[k])) == want, k
print("ANCHORED_VARIANTS_OK")
"""
    r = subprocess.run([sys.executable, "-c", script], env=_tpu_env(),
                       capture_output=True, timeout=2400, text=True,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ANCHORED_VARIANTS_OK" in r.stdout
