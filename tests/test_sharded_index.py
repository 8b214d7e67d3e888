"""Sharded-index lookup (parallel/mesh.py ShardedIndex) tests."""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sharded_index_construction(test_index):
    """Shards partition SO by hash range with locally-rebased offsets and
    exactly the addressed ROA slices."""
    from yaha_tpu.parallel.mesh import ShardedIndex
    sidx = ShardedIndex(test_index, 4)
    so = np.asarray(test_index.starting_offs, np.uint32)
    roa = np.asarray(test_index.roa, np.uint32)
    ht = len(so) - 1
    per = ht // 4
    for m in range(4):
        lo, hi = m * per, (m + 1) * per
        base = int(so[lo])
        assert (sidx.so_local[m] == so[lo:hi + 1] - np.uint32(base)).all()
        n_m = int(so[hi]) - base
        assert (sidx.roa_sh[m, :n_m] == roa[base:base + n_m]).all()
    # Every hash resolves to the same run through its shard as globally.
    rng = np.random.default_rng(0)
    for h in rng.integers(0, ht, 50):
        m = int(h) // per
        lh = int(h) - m * per
        lo_l = int(sidx.so_local[m][lh])
        hi_l = int(sidx.so_local[m][lh + 1])
        got = sidx.roa_sh[m, lo_l:hi_l]
        want = roa[int(so[h]):int(so[h + 1])]
        assert (got == want).all()


def test_dryrun_multichip_2dev():
    """Full pipeline on a (data=1, model=2) mesh: sharded SO+ROA serving
    real lookups with all_gather merge, byte-identical output.  Run in a
    subprocess so the virtual-device platform is set before JAX init.
    (The driver runs the 8-device variant; 2 devices keeps the 8-vdev
    CPU compile-cost multiplier out of the suite.)"""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=REPO, env=env, capture_output=True, timeout=2400)
    assert r.returncode == 0, (r.stdout.decode()[-1000:] +
                               r.stderr.decode()[-1000:])
    assert b"dryrun_multichip ok" in r.stdout
