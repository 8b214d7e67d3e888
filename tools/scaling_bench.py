#!/usr/bin/env python3
"""Reads/s scaling-efficiency harness over mesh sizes.

Runs the data-parallel extension step (the dominant device work) over
meshes of 1/2/4/8 virtual devices and reports throughput + efficiency vs
linear scaling.  On real multi-chip slices the same harness measures ICI
scaling; with one chip (or host CPU devices) it validates that the sharded
program itself adds no overhead beyond collectives.

Usage:  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    from yaha_tpu.ops import sw_batch
    from yaha_tpu.parallel import mesh as pmesh

    n_avail = len(jax.devices())
    rng = np.random.default_rng(0)
    per_dev = 64
    ql = 64
    bw2 = 10
    kw = dict(band_width=5, go=5, ge=2, rc=3, ms=1, max_gap=50,
              max_intron=50, x_cutoff=25)
    ext_fn = functools.partial(sw_batch.batched_extension_forward, **kw)

    results = []
    sizes = [s for s in (1, 2, 4, 8) if s <= n_avail]
    for nd in sizes:
        mesh = pmesh.make_mesh(nd, model_parallel=1)
        step = jax.jit(pmesh.data_parallel_extension_step(mesh, ext_fn))
        n = per_dev * nd
        q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
        qlens = np.full(n, ql, np.int64)
        rl = ql + 2 * bw2
        r = np.zeros((n, rl), np.uint8)
        r[:, :ql] = q
        rlens = qlens + bw2
        out = step(q, qlens, r, rlens)
        out[0].block_until_ready()
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = step(q, qlens, r, rlens)
        out[0].block_until_ready()
        dt = (time.time() - t0) / reps
        results.append((nd, n / dt))
    base = results[0][1]
    print("devices  problems/s  efficiency")
    for nd, rps in results:
        eff = rps / (base * nd)
        print("%7d  %10.0f  %9.0f%%" % (nd, rps, eff * 100))


if __name__ == "__main__":
    main()
