#!/usr/bin/env python3
"""Kernel roofline: measured device rates for the Pallas DP kernels vs
measured VPU / HBM capability probes.

ROUND-5 PROTOCOL (supersedes the windowed protocol): every measurement
is a DATA-DEPENDENT CHAIN inside one jitted dispatch — K sequential
kernel invocations, each perturbing the next input from its own output
— and the scalar result is FETCHED (np.asarray).  Two failure modes of
the old protocol made its numbers dispatch artifacts, not device rates
(NOTES.md round 5):

  * the remote-TPU execution path memoizes bit-identical launches, and
    re-timing previously-seen device-resident inputs hits that cache;
  * block_until_ready can return before the result materializes on
    this backend, so per-launch "walls" measured dispatch enqueue.

The chain is immune to both (each step's input depends on the previous
step's output), and a measured trivial-dispatch RTT is subtracted from
the single blocking wall.  The old protocol reported 183.9 Gcells/s
for the extension kernel; the chain measures ~36 — still ~345x the
reference's measured single-core DP (1.054e8 cells/s), and the number
BENCH_r05 quotes.

Usage: python tools/kernel_roofline.py            (TPU via axon env)
Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _measure_rtt():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1)
    np.asarray(f(jnp.int32(0)))
    ts = []
    for k in range(7):
        t0 = time.time()
        np.asarray(f(jnp.int32(k + 1)))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def _chain_trials(step_fn, q0, K, trials=5):
    """Per-trial chain walls (seconds per launch, RTT subtracted),
    sorted ascending.  step_fn(q) -> int32 scalar."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(qs):
        def body(carry, _):
            qc, acc = carry
            s = step_fn(qc)
            qc2 = ((qc.astype(jnp.int32) + (s % 3)) % 4).astype(jnp.uint8)
            return (qc2, acc + s), None
        (_, acc), _ = jax.lax.scan(body, (qs, jnp.int32(0)), None,
                                   length=K)
        return acc

    q_d = jax.device_put(q0)
    q_d.block_until_ready()
    np.asarray(chain(q_d))
    rtt = _measure_rtt()
    walls = []
    for t in range(trials):
        q2 = q0.copy()
        q2[:, 2] = (q2[:, 2] + t + 1) % 4
        q_d2 = jax.device_put(q2)
        q_d2.block_until_ready()
        t0 = time.time()
        np.asarray(chain(q_d2))
        walls.append(max(time.time() - t0 - rtt, 1e-9) / K)
    return sorted(walls)


def _spread(dts, scale):
    """{min, median, max} of scale/dt (rate units, Gcells/s)."""
    return {"max": round(scale / dts[0] / 1e9, 2),
            "median": round(scale / dts[len(dts) // 2] / 1e9, 2),
            "min": round(scale / dts[-1] / 1e9, 2)}


def bench_ext_kernel():
    """Extension kernel cells/s at the bench.py shape (4096 x 128bp)."""
    from yaha_tpu.ops import sw_pallas
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    tiles, ql = 4, 128
    n = sw_pallas.TILE * tiles
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
    qlens_j = jnp.asarray(qlens)
    rlens_j = jnp.asarray(rlens)
    r_j = jnp.asarray(r)

    def step(qc):
        out = sw_pallas.extension_forward_pallas(qc, qlens_j, r_j,
                                                 rlens_j, **kw)
        return jnp.sum(out["score"])

    dts = _chain_trials(step, q, 512)
    w = 21
    cells = n * ql * w
    bt_bytes = n * (ql + 1) * w      # 1 B/cell backtrack stream
    return cells / dts[0], bt_bytes / dts[0], n, ql, w, \
        _spread(dts, cells)


def bench_anchored_kernels():
    """Both anchored (gap-fill) kernels at their production shapes."""
    from yaha_tpu.ops import sw_pallas
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    n = sw_pallas.TILE
    out = {}
    kw = dict(go=5, ge=2, rc=3, ms=1, max_gap=50, max_intron=50)
    # full-matrix, unbanded wide-band shape (bench.bench_anchored)
    ql, rl = 64, 96
    q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
    r = rng.integers(0, 4, (n, rl)).astype(np.uint8)
    args = [jnp.asarray(x) for x in
            (np.full(n, ql, np.int32), np.asarray(r),
             np.full(n, rl, np.int32), np.full(n, rl + 1, np.int32),
             np.full(n, rl + 1, np.int32))]

    def step_full(qc):
        o = sw_pallas.anchored_forward_pallas(
            qc, args[0], args[1], args[2], args[3], args[4], **kw)
        return jnp.sum(o["score"])

    dts = _chain_trials(step_full, q, 256)
    out["anchored_full_gcells_s"] = _spread(dts, n * ql * rl)
    # band-relative long-gap shape (ql=192 rl=256 lbw=5 rbw=69 wband=75)
    ql2, rl2, d = 192, 256, 5
    lbw_v, rbw_v = d, d + (rl2 - ql2)
    wband = lbw_v + rbw_v + 1
    q2 = rng.integers(0, 4, (n, ql2)).astype(np.uint8)
    r2 = rng.integers(0, 4, (n, rl2)).astype(np.uint8)
    args2 = [jnp.asarray(x) for x in
             (np.full(n, ql2, np.int32), np.asarray(r2),
              np.full(n, rl2, np.int32), np.full(n, lbw_v, np.int32),
              np.full(n, rbw_v, np.int32))]

    def step_band(qc):
        o = sw_pallas.anchored_forward_pallas_banded(
            qc, args2[0], args2[1], args2[2], args2[3], args2[4],
            wband=wband, **kw)
        return jnp.sum(o["score"])

    dts = _chain_trials(step_band, q2, 128)
    cells_per = sum(min(i + rbw_v, rl2) - max(i - lbw_v, 1) + 1
                    for i in range(1, ql2 + 1))
    out["anchored_banded_gcells_s"] = _spread(dts, n * cells_per)
    return out


def bench_vpu_int32():
    """Dependent-chain int32 lane-op rate: 8 ops per iteration on a
    [K, 8, 128] block, fori chain long enough (2^17) that the single
    dispatch's compute dwarfs the RTT."""
    import jax
    import jax.numpy as jnp

    K = 64
    ITERS = 1 << 17
    OPS = 8

    @jax.jit
    def chain(x, y):
        def body(i, carry):
            x, y = carry
            a = x + y
            b = a * 3
            c = jnp.where(b > x, b, x)
            d = jnp.where(c >= y, c - y, c)
            e = jnp.maximum(d, x)
            f = e + 1
            return (f, jnp.where(f > y, y, f))
        x, y = jax.lax.fori_loop(0, ITERS, body, (x, y))
        return jnp.sum(x) + jnp.sum(y)

    rng = np.random.default_rng(3)
    x0 = rng.integers(0, 100, (K, 8, 128)).astype(np.int32)
    y0 = rng.integers(1, 100, (K, 8, 128)).astype(np.int32)
    np.asarray(chain(jnp.asarray(x0), jnp.asarray(y0)))
    rtt = _measure_rtt()
    best = float("inf")
    for t in range(3):
        x0[0, 0, 0] = t
        t0 = time.time()
        np.asarray(chain(jnp.asarray(x0), jnp.asarray(y0)))
        best = min(best, max(time.time() - t0 - rtt, 1e-9))
    return K * 8 * 128 * ITERS * OPS / best


def bench_hbm_store():
    """Streaming read+write bandwidth: a fori chain of elementwise
    passes over a 256 MB int32 buffer inside one dispatch (each
    iteration rewrites the carry: 256 MB read + 256 MB write)."""
    import jax
    import jax.numpy as jnp

    NB = 256 << 20
    N = NB // 4
    ITERS = 32

    @jax.jit
    def chain(x):
        def body(i, x):
            return x + 1
        x = jax.lax.fori_loop(0, ITERS, body, x)
        return jnp.sum(x[:1024])

    rng = np.random.default_rng(5)
    base = rng.integers(0, 100, N).astype(np.int32)
    np.asarray(chain(jnp.asarray(base)))
    rtt = _measure_rtt()
    best = float("inf")
    for t in range(3):
        base[0] = t
        t0 = time.time()
        np.asarray(chain(jnp.asarray(base)))
        best = min(best, max(time.time() - t0 - rtt, 1e-9))
    return 2 * NB * ITERS / best


def main():
    import jax
    plat = jax.devices()[0].platform
    cells_s, bt_bytes_s, n, ql, w, ext_spread = bench_ext_kernel()
    anch = bench_anchored_kernels()
    vpu_ops_s = bench_vpu_int32()
    hbm_bytes_s = bench_hbm_store()
    # Static per-cell vector-op count of _ext_kernel.col_step, counted
    # from the source (arithmetic + compare + select + store ops on
    # [8,128] tiles): ~55 before compiler fusion.
    OPS_PER_CELL = 55
    HBM_SPEC = 819e9          # v5e HBM bandwidth (spec)
    out = {
        "platform": plat,
        "protocol": "data-dependent chain, one dispatch, value fetched,"
                    " RTT subtracted (round 5)",
        "ext_kernel_gcells_s": round(cells_s / 1e9, 2),
        "ext_bt_stream_gb_s": round(bt_bytes_s / 1e9, 2),
        "vpu_int32_glaneops_s": round(vpu_ops_s / 1e9, 1),
        # Informational only: XLA's loop-carried elementwise passes do
        # not stream at HBM peak on this backend, so the probe badly
        # underestimates; the roofline fraction uses the spec number.
        "hbm_probe_gb_s_underestimates": round(hbm_bytes_s / 1e9, 1),
        "hbm_spec_gb_s": round(HBM_SPEC / 1e9),
        "shape": "%dx%dbp w=%d" % (n, ql, w),
        # Implied budget: lane-ops the VPU delivers per computed cell at
        # the measured rates, vs the kernel's static op count.
        "vpu_ops_per_cell_available": round(vpu_ops_s / cells_s, 1),
        "static_ops_per_cell": OPS_PER_CELL,
        "bt_stream_fraction_of_hbm_spec": round(bt_bytes_s / HBM_SPEC, 3),
        "ext_kernel_gcells_s_spread": ext_spread,
    }
    out.update(anch)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
