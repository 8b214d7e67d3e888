#!/usr/bin/env python3
"""Measured device term for the staged e2e decomposition (VERDICT r4 #2).

The staged rows' `local_chip_projection` modeled the device side as
`bytes / 8 GB/s + launches x 100 us` — two assumed constants and an
implicit "kernel time ~ 0".  This tool MEASURES the device seconds of a
chunk's DP launch sequence:

  1. capture — run one align_chunk with the Pallas kernel entry points
     patched to record their (host-materialized) inputs: the exact
     bucket/tier sequence the chunk dispatches;
  2. replay — rebuild the sequence as ONE jitted program (kernel ->
     on-device RLE decode wired exactly as models/staged.py wires them)
     so a window costs a single dispatch: through a remote-TPU tunnel
     the per-dispatch RTT would otherwise swamp kernel milliseconds;
  3. measure — stage W distinct-input windows in HBM (each window's
     per-problem arrays rolled along the batch axis — the remote
     execution path memoizes bit-identical launches, NOTES.md), run
     each window blocked, and report min/med/max wall minus a measured
     trivial-dispatch RTT baseline.

Excluded (host-coupled, not pure device compute): the ragged RLE/plane
gathers (their sizes ride the d2h byte model) and, when --seed device
is active, the seed-phase launches.  The replayed sequence is the DP
kernel + decode work — the device term the projection previously
assumed free.

Standalone: python tools/device_replay.py [--reads N] [--len L] [--err E]
(uses the bench_e2e_staged_tpu protocol).  Library: measure_chunk_device.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_KERNELS = ("extension_forward_pallas_p4", "anchored_forward_pallas_p4",
            "anchored_forward_pallas_banded_p4")


def capture_chunk(aligner, pr, lo, hi):
    """Run align_chunk with the Pallas kernels patched to record their
    inputs; returns the recorded call list [(name, args_np, kw)]."""
    from yaha_tpu.ops import sw_pallas
    calls = []
    saved = {}

    def mk(name, orig):
        def f(*a, **kw):
            calls.append((name,
                          [np.asarray(x) for x in a],
                          {k: v for k, v in kw.items()
                           if k != "interpret"}))
            return orig(*a, **kw)
        return f

    for name in _KERNELS:
        saved[name] = getattr(sw_pallas, name)
        setattr(sw_pallas, name, mk(name, saved[name]))
    try:
        aligner.align_chunk(pr, lo, hi)
    finally:
        for name, orig in saved.items():
            setattr(sw_pallas, name, orig)
    return calls


def _decode_plan(name, args, bt_shape, maxi_host):
    """Mirror models/staged.py's decode wiring for one kernel call:
    returns (decode_kind, y0x0_source, active_kind, cap, order, plan)
    or None, where `order` is the host walk-bound sort permutation and
    `plan` the static decode_plan slice list (walk-bound-adaptive
    per-slice iteration bounds) — both computed exactly as
    staged._run_{ext,gap}_bucket computes them, using the captured
    args plus the eager kernel's maxi for extensions."""
    from yaha_tpu.models.staged import (_pow2, _pow2_floor, decode_plan,
                                        DECODE_MAX_CELLS)
    w = bt_shape[2]
    qg = 2 * args[0].shape[1]
    if name == "extension_forward_pallas_p4":
        if qg > 16384:            # plane-path fallback in staged.py
            return None
        bound = 2 * qg + w + 2
        kind, yx, act = "band", "maxij", "score"
        wb = 2 * maxi_host.astype(np.int64) + w + 2 + 16
        order = np.argsort(maxi_host, kind="stable")
    elif name == "anchored_forward_pallas_banded_p4":
        bound = 2 * qg + w + 2
        kind, yx, act = "band", "banded", "ones"
        wb = 2 * np.asarray(args[1], np.int64) + w + 2 + 16
        order = np.argsort(wb, kind="stable")
    else:
        rg = 2 * args[2].shape[1]
        bound = qg + rg + 2
        kind, yx, act = "full", "full", "ones"
        wb = (np.asarray(args[1], np.int64)
              + np.asarray(args[3], np.int64) + 2 + 16)
        order = np.argsort(wb, kind="stable")
    n = bt_shape[0]
    sl = min(_pow2_floor(max(1, DECODE_MAX_CELLS //
                             max(1, bt_shape[1] * w)), 1024), n)
    plan = decode_plan(wb[order], n, sl, bound + 16)
    return (kind, yx, act, _pow2(bound, 32), order, plan)


def build_replay(calls):
    """One jitted program running the chunk's kernel + decode sequence;
    returns (jit_fn, flat_args_template).  Each captured kernel runs
    once eagerly first: the decode slicing is walk-bound-adaptive
    (staged.decode_plan needs the host maxi), so the static plan is
    derived from real outputs before the replay program is traced."""
    import jax
    import jax.numpy as jnp
    from yaha_tpu.ops import sw_pallas, decode_jax

    meta = []
    flat = []
    plans = []
    for name, args, kw in calls:
        meta.append((name, len(args), tuple(sorted(kw.items()))))
        maxi = None
        if name == "extension_forward_pallas_p4":
            out = getattr(sw_pallas, name)(*[jnp.asarray(a) for a in args],
                                           **kw)
            maxi = np.asarray(out["maxi"])
            bt_shape = out["bt"].shape
        else:
            qg = 2 * args[0].shape[1]
            w_full = 2 * args[2].shape[1] + 1
            kwd = dict(kw)
            bt_shape = (args[0].shape[0], qg + 1,
                        kwd.get("wband", w_full))
        plan = _decode_plan(name, args, bt_shape, maxi)
        plans.append(plan)
        flat.extend(args)
        if plan is not None:
            flat.append(plan[4].astype(np.int32))   # the window-0 order

    def run(args_flat):
        it = iter(args_flat)
        acc = jnp.zeros((), jnp.int32)
        for (name, na, kwt), plan in zip(meta, plans):
            a = [next(it) for _ in range(na)]
            kw = dict(kwt)
            out = getattr(sw_pallas, name)(*a, **kw)
            acc = acc + jnp.sum(out["score"]).astype(jnp.int32)
            bt = out.get("bt", out.get("bt_b"))
            if plan is None:
                acc = acc + jnp.sum(bt[:, 0, 0].astype(jnp.int32))
                continue
            kind, yx, act_kind, cap, order, slices = plan
            if yx == "maxij":
                y0 = out["maxi"].astype(jnp.int32)
                x0 = out["maxj"].astype(jnp.int32)
            elif yx == "banded":     # x0 = rlen - qlen + lbw
                y0 = a[1].astype(jnp.int32)
                x0 = (a[3] - a[1] + a[4]).astype(jnp.int32)
            else:                    # full: x0 = rlen
                y0 = a[1].astype(jnp.int32)
                x0 = a[3].astype(jnp.int32)
            active = (out["score"] > 0) if act_kind == "score" else \
                jnp.ones(bt.shape[0], bool)
            decode = (decode_jax.rle_decode_band if kind == "band"
                      else decode_jax.rle_decode_full)
            # The sort permutation is a replay INPUT (windows roll the
            # problem axis, so the window's own permutation must ride
            # along — the slice plan itself is roll-invariant because
            # rolling permutes problems without changing the sorted
            # walk-bound sequence).
            idx = next(it)
            bt = jnp.take(bt, idx, axis=0)
            y0 = jnp.take(y0, idx, axis=0)
            x0 = jnp.take(x0, idx, axis=0)
            active = jnp.take(active, idx, axis=0)
            for s0, L, lo, hi, mi in slices:
                r, c = decode(bt[s0:s0 + L], y0[s0:s0 + L],
                              x0[s0:s0 + L], active[s0:s0 + L],
                              cap=cap, max_iters=mi)
                acc = acc + jnp.sum(c).astype(jnp.int32) \
                    + jnp.sum(r[:, 0]).astype(jnp.int32)
        return acc

    return jax.jit(run), flat, plans


def _roll_window(calls, plans, w):
    """Distinct-input window w: every per-problem array rolled by the
    same amount along axis 0 (keeps (problem, length) pairings valid).
    Each call's sort permutation rides along: the problem holding
    sorted-rank s moves from order0[s] to (order0[s] + k) % n."""
    out = []
    for (_, args, _), plan in zip(calls, plans):
        n = args[0].shape[0]
        k = 0 if w == 0 else (w * 17) % max(n, 1)
        out.extend(args if k == 0 else
                   (np.roll(a, k, axis=0) for a in args))
        if plan is not None:
            out.append(((plan[4] + k) % n).astype(np.int32))
    return out


def measure_chunk_device(aligner, pr, lo, hi, windows=5):
    """Capture + replay one chunk; returns the measured device term."""
    import jax
    import jax.numpy as jnp
    calls = capture_chunk(aligner, pr, lo, hi)
    if not calls:
        return {"error": "no pallas kernel calls captured"}
    run_jit, _, plans = build_replay(calls)

    staged = []
    for w in range(windows):
        args = [jax.device_put(a) for a in _roll_window(calls, plans, w)]
        for a in args:
            a.block_until_ready()
        staged.append(tuple(args))

    # Trivial-dispatch RTT baseline (distinct inputs per rep).  Walls
    # fetch the scalar VALUE: on the remote-TPU backend
    # block_until_ready can return before the result is materialized,
    # while np.asarray is a true round trip.
    f = jax.jit(lambda x: x + 1)
    np.asarray(f(jnp.int32(0)))
    rtts = []
    for k in range(7):
        t0 = time.time()
        np.asarray(f(jnp.int32(k + 1)))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    np.asarray(run_jit(staged[0]))                # compile
    walls = []
    for args in staged:
        t0 = time.time()
        np.asarray(run_jit(args))
        walls.append(time.time() - t0)
    walls.sort()
    med = walls[len(walls) // 2]
    return {
        "kernel_calls": len(calls),
        "windows": windows,
        "dispatch_rtt_s": round(rtt, 4),
        "wall_s_min_med_max": [round(w, 4) for w in
                               (walls[0], med, walls[-1])],
        "device_s_med": round(max(med - rtt, 0.0), 4),
        "device_s_min": round(max(walls[0] - rtt, 0.0), 4),
    }


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=4000)
    ap.add_argument("--len", dest="rlen", type=int, default=1000)
    ap.add_argument("--err", type=float, default=0.05)
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/yaha_tpu/xla"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.0")
    import bench
    row = bench.bench_e2e_staged_tpu(args.reads, args.rlen, args.err,
                                     replay_windows=args.windows)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
