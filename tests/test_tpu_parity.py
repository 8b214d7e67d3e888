"""On-TPU parity for the jax engines (skipped when no TPU is attached).

VERDICT item: pin the flagship path in CI — --engine batch-pallas runs
the device front end (seed->fragment->chain) AND the Pallas DP kernels on
the real chip and must hit the byte-exact golden.
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
