#!/usr/bin/env python3
"""Empirical roofline for the Pallas extension kernel (VERDICT r2 #2).

The 1-byte packed backtrack (commit 6ede30f) voided the old
"output-bandwidth-bound, 5 B/cell" claim; this tool measures, on the
attached device, the three quantities that decide the new bound:

  1. the extension kernel's cells/s (device-resident distinct inputs,
     same protocol as bench.py);
  2. an int32 VPU lane-op rate probe: a jit'd dependent chain of
     add/mul/select/compare ops shaped like the kernel's cell work;
  3. an HBM store-bandwidth probe (int8 writes, the backtrack stream).

and prints one JSON line with the measured rates and the implied
per-cell budget: ops/cell the VPU could afford at the measured cells/s
vs the kernel's static op count, and backtrack bytes/s vs HBM.

Run on TPU (default env) or CPU (JAX_PLATFORMS=cpu, numbers meaningless
for the roofline but the harness still works).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _time_windows(fn, args_list, windows=5):
    """Every timed launch uses a DISTINCT input set: the remote-TPU
    execution path memoizes bit-identical launches (NOTES.md), so
    repeating any input would measure the cache, not the device.
    args_list must hold windows+1 groups; group 0 warms/compiles.
    Returns the sorted per-launch window times (min..max) — the idle-box
    capture protocol (VERDICT r3 #7) quotes min/median/max so the
    tunnel-load spread is visible in the published number."""
    groups = len(args_list)
    assert groups >= windows + 1, (groups, windows)
    per = max(1, groups // (windows + 1))
    for a in args_list[:per]:
        r = fn(a)
    jax_block(r)
    dts = []
    for wdx in range(windows):
        grp = args_list[(wdx + 1) * per:(wdx + 2) * per]
        if not grp:
            break
        t0 = time.time()
        for a in grp:
            r = fn(a)
        jax_block(r)
        dts.append((time.time() - t0) / len(grp))
    return sorted(dts)


def _time_best(fn, args_list, windows=5):
    return _time_windows(fn, args_list, windows)[0]


def _spread(dts, scale):
    """{min, median, max} of scale/dt (rate units)."""
    return {"max": round(scale / dts[0] / 1e9, 2),
            "median": round(scale / dts[len(dts) // 2] / 1e9, 2),
            "min": round(scale / dts[-1] / 1e9, 2)}


def jax_block(x):
    import jax
    jax.tree_util.tree_map(
        lambda l: l.block_until_ready() if hasattr(l, "block_until_ready")
        else l, x)


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
    arg_sets = []
    for sft in range(18):
        q2 = q.copy()
        q2[:, 0] = (q2[:, 0] + sft) % 4
        q2[:, 1] = (q2[:, 1] + sft // 4) % 4
        arg_sets.append(tuple(jnp.asarray(x)
                              for x in (q2, qlens, r, rlens)))
    fn = lambda a: sw_pallas.extension_forward_pallas(*a, **kw)
    dts = _time_windows(fn, arg_sets)
    w = 21
    cells = n * ql * w
    bt_bytes = n * (ql + 1) * w      # 1 B/cell backtrack stream
    return cells / dts[0], bt_bytes / dts[0], n, ql, w, \
        _spread(dts, cells)


def bench_anchored_kernels():
    """Both anchored (gap-fill) kernels at their production shapes
    (bench.py dispatch): the full-matrix kernel at its wide-band shape
    and the band-relative kernel at a long-gap-fill shape — with the
    windowed spread (VERDICT r3 #6/#7)."""
    from yaha_tpu.ops import sw_pallas
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    n = sw_pallas.TILE
    out = {}
    # full-matrix, unbanded wide-band shape (bench.bench_anchored)
    ql, rl = 64, 96
    q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
    r = rng.integers(0, 4, (n, rl)).astype(np.uint8)
    qlens = np.full(n, ql, np.int32)
    rlens = np.full(n, rl, np.int32)
    lbw = np.full(n, rl + 1, np.int32)
    rbw = np.full(n, rl + 1, np.int32)
    kw = dict(go=5, ge=2, rc=3, ms=1, max_gap=50, max_intron=50)
    args = []
    for s in range(18):
        q2 = q.copy()
        q2[:, 0] = (q2[:, 0] + s) % 4
        q2[:, 1] = (q2[:, 1] + s // 4) % 4
        args.append(tuple(jnp.asarray(x) for x in
                          (q2, qlens, r, rlens, lbw, rbw)))
    dts = _time_windows(
        lambda a: sw_pallas.anchored_forward_pallas(*a, **kw), args)
    out["anchored_full_gcells_s"] = _spread(dts, n * ql * rl)
    # band-relative long-gap shape (bench.bench_anchored_banded:
    # ql=192 rl=256 lbw=5 rbw=69, wband=75)
    ql2, rl2, d = 192, 256, 5
    lbw_v, rbw_v = d, d + (rl2 - ql2)
    wband = lbw_v + rbw_v + 1
    q = rng.integers(0, 4, (n, ql2)).astype(np.uint8)
    r = rng.integers(0, 4, (n, rl2)).astype(np.uint8)
    qlens = np.full(n, ql2, np.int32)
    rlens = np.full(n, rl2, np.int32)
    lbw = np.full(n, lbw_v, np.int32)
    rbw = np.full(n, rbw_v, np.int32)
    args = []
    for s in range(18):
        q2 = q.copy()
        q2[:, 0] = (q2[:, 0] + s) % 4
        q2[:, 1] = (q2[:, 1] + s // 4) % 4
        args.append(tuple(jnp.asarray(x) for x in
                          (q2, qlens, r, rlens, lbw, rbw)))
    dts = _time_windows(
        lambda a: sw_pallas.anchored_forward_pallas_banded(
            *a, wband=wband, **kw), args)
    cells_per = sum(min(i + rbw_v, rl2) - max(i - lbw_v, 1) + 1
                    for i in range(1, ql2 + 1))
    out["anchored_banded_gcells_s"] = _spread(dts, n * cells_per)
    return out


def bench_vpu_int32():
    """Dependent-chain int32 lane-op rate: 8 ops per iteration (add,
    mul, two compares folded to selects, two selects, max, sub) on a
    [K, 8, 128] block — the kernel's cell-work mix, serialized like the
    kernel's in-row dependency."""
    import jax
    import jax.numpy as jnp

    K = 64          # independent lanes-blocks to fill the pipeline
    ITERS = 256     # dependent chain length
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
        return x + y

    rng = np.random.default_rng(3)
    args = []
    for _ in range(18):
        x = jnp.asarray(rng.integers(0, 100, (K, 8, 128), np.int32))
        y = jnp.asarray(rng.integers(1, 100, (K, 8, 128), np.int32))
        args.append((x, y))
    dt = _time_best(lambda a: chain(*a), args)
    lane_ops = K * 8 * 128 * ITERS * OPS
    return lane_ops / dt


def bench_hbm_store():
    """int8 store bandwidth: y = x ^ 1 over 256 MB (reads+writes HBM)."""
    import jax
    import jax.numpy as jnp

    NB = 256 << 20

    @jax.jit
    def f(x):
        return x ^ 1

    rng = np.random.default_rng(5)
    base = rng.integers(0, 127, NB, np.int8)
    args = []
    for sft in range(8):
        a = base.copy()
        a[:64] = sft          # distinct bytes, cheap to derive
        args.append(jnp.asarray(a))
    dt = _time_best(f, args, windows=3)
    return 2 * NB / dt            # read + write


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
    out = {
        "platform": plat,
        "ext_kernel_gcells_s": round(cells_s / 1e9, 2),
        "ext_bt_stream_gb_s": round(bt_bytes_s / 1e9, 2),
        "vpu_int32_glaneops_s": round(vpu_ops_s / 1e9, 1),
        "hbm_int8_rw_gb_s": round(hbm_bytes_s / 1e9, 1),
        "shape": "%dx%dbp w=%d" % (n, ql, w),
        # Implied budget: lane-ops the VPU delivers per computed cell at
        # the measured rates, vs the kernel's static op count.
        "vpu_ops_per_cell_available": round(vpu_ops_s / cells_s, 1),
        "static_ops_per_cell": OPS_PER_CELL,
        "bt_stream_fraction_of_hbm": round(bt_bytes_s / hbm_bytes_s, 3),
        # Windowed spread (min/median/max over 5 distinct-input
        # windows): the idle-box capture protocol of VERDICT r3 #7 —
        # quote the spread, not a single cell.
        "ext_kernel_gcells_s_spread": ext_spread,
    }
    out.update(anch)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
