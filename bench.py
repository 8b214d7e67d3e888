#!/usr/bin/env python3
"""Benchmark: banded-SW extension throughput on the flagship Pallas kernel.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference yaha 0.1.83 banded X-dropoff extension DP measured
single-core on this machine via a microbenchmark linked against the
reference objects (tools/ref_swbench notes): 1.054e8 cells/s at 1 kb query
length, 10% mismatch (BASELINE.md).  vs_baseline is ours / reference.
"""
import json
import sys
import time

import numpy as np

REF_CELLS_PER_S = 1.054e8  # reference single-core banded extension DP


def main():
    sys.path.insert(0, ".")
    import jax
    use_tpu = any(d.platform == "tpu" for d in jax.devices())
    from yaha_tpu.ops import sw_pallas, sw_batch

    rng = np.random.default_rng(7)
    if use_tpu:
        tiles, ql = 4, 128
        n = sw_pallas.TILE * tiles
    else:
        tiles, ql = 1, 64
        n = 256
    bw2 = 10
    q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
    qlens = np.full(n, ql, np.int32)
    rl = ql + 2 * bw2
    r = np.zeros((n, rl), np.uint8)
    r[:, :ql] = q
    m = rng.random((n, ql)) < 0.1
    r[:, :ql][m] = rng.integers(0, 4, int(m.sum()))
    rlens = qlens + bw2
    kw = dict(band_width=5, go=5, ge=2, rc=3, ms=1, max_gap=50,
              max_intron=50, x_cutoff=25)

    # Kernel throughput (apples-to-apples with the reference's pure DP
    # loop): inputs staged on device outside the timed window, and every
    # launch gets DISTINCT inputs — the remote-TPU execution path
    # memoizes bit-identical calls, which would otherwise inflate the
    # number ~3x.  Host->device staging overlaps compute in the real
    # pipeline (batches are prepared while the previous batch runs).
    import jax.numpy as jnp
    reps = 8 if use_tpu else 2
    arg_sets = []
    for s in range(reps):
        q2 = q.copy()
        q2[:, 0] = (q2[:, 0] + s) % 4
        arg_sets.append(tuple(jnp.asarray(x)
                              for x in (q2, qlens, r, rlens)))
    if use_tpu:
        fwd = lambda a: sw_pallas.extension_forward_pallas(*a, **kw)
    else:
        fwd = lambda a: sw_batch.batched_extension_forward(*a, **kw)
    out = fwd(arg_sets[0])
    out["score"].block_until_ready()  # compile
    windows = 5 if use_tpu else 1
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.time()
        outs = [fwd(a) for a in arg_sets]
        for o in outs:
            o["score"].block_until_ready()
        best_dt = min(best_dt, (time.time() - t0) / reps)
    dt = best_dt
    cells = n * ql * 21
    cps = cells / dt
    print(json.dumps({
        "metric": "banded-SW extension DP throughput (%s, batch %dx%dbp)"
                  % ("TPU pallas" if use_tpu else "CPU XLA", n, ql),
        "value": round(cps / 1e9, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(cps / REF_CELLS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
