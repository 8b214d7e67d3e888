#!/usr/bin/env python3
"""Component profile of the on-device RLE decode at a hot tier shape.

The 1 kb staged chunk's measured device term is dominated by the two
large extension tiers, and within them the RLE decode (kernel alone is
~0.04 s; BASELINE round 5).  This tool splits the decode into its three
stages at a production-like tier shape so optimization is measurement-
driven:

  jump   — the _jump_plane precompute (full-plane cummax prefix ops);
  loop   — jump + the while_loop walk (per-iteration gathers);
  full   — jump + loop + the stable-sort compaction.

Protocol: single dispatch per rep over DISTINCT device-resident inputs
(rolled along the batch axis; the remote-TPU link memoizes bit-identical
launches), value fetched with np.asarray (block_until_ready can return
early on this backend), measured trivial-dispatch RTT subtracted
(NOTES.md round-5 measurement pitfall).

Usage: python tools/decode_profile.py [--n 16384] [--ql 512] [--reps 5]
Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rtt(jax, jnp):
    f = jax.jit(lambda x: x + 1)
    np.asarray(f(jnp.int32(0)))
    ts = []
    for k in range(7):
        t0 = time.time()
        np.asarray(f(jnp.int32(k + 1)))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def _time_fn(fn, arg_sets, rtt):
    np.asarray(fn(*arg_sets[0]))          # compile
    walls = []
    for args in arg_sets:
        t0 = time.time()
        np.asarray(fn(*args))
        walls.append(time.time() - t0)
    walls.sort()
    med = walls[len(walls) // 2]
    return {"med_s": round(max(med - rtt, 0.0), 4),
            "min_s": round(max(walls[0] - rtt, 0.0), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--ql", type=int, default=512)
    ap.add_argument("--err", type=float, default=0.05)
    ap.add_argument("--junk", type=float, default=0.5,
                    help="fraction of problems with random refs "
                         "(X-drop out after a few rows, like the junk "
                         "extensions that dominate production batches)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/yaha_tpu/xla"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.0")
    import jax
    import jax.numpy as jnp
    from yaha_tpu.ops import sw_pallas, decode_jax

    n, ql = args.n, args.ql
    rng = np.random.default_rng(3)
    bw2 = 10
    q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
    qlens = np.full(n, ql, np.int32)
    rl = ql + 2 * bw2
    r = np.zeros((n, rl), np.uint8)
    r[:, :ql] = q
    m = rng.random((n, ql)) < args.err
    r[:, :ql][m] = rng.integers(0, 4, int(m.sum()))
    junk = rng.random(n) < args.junk
    r[junk] = rng.integers(0, 4, (int(junk.sum()), rl)).astype(np.uint8)
    rlens = qlens + bw2
    kw = dict(band_width=5, go=5, ge=2, rc=3, ms=1, max_gap=50,
              max_intron=50, x_cutoff=25)
    out = sw_pallas.extension_forward_pallas(
        jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(r),
        jnp.asarray(rlens), **kw)
    bt = np.asarray(out["bt"])
    y0 = np.asarray(out["maxi"]).astype(np.int32)
    x0 = np.asarray(out["maxj"]).astype(np.int32)
    act = np.asarray(out["score"]) > 0
    h, w = bt.shape[1], bt.shape[2]
    qg = 2 * ql
    bound = 2 * qg + w + 2
    cap, max_iters = 2048, bound + 16

    # Walk-length stats for context (maxi bounds the walk's row travel).
    mi = y0.copy()
    mi[~act] = 0
    pct = {p: int(np.percentile(mi, p)) for p in (50, 90, 99, 100)}

    def stage(bt_d, y_d, x_d, a_d, which):
        jmp = decode_jax._jump_plane(bt_d & 7, (bt_d >> 3) & 1, 0)
        if which == "jump":
            return jnp.sum(jmp.astype(jnp.int32))
        s = decode_jax._walk_loop(bt_d, jmp, y_d, x_d, a_d,
                                  max_iters=max_iters, moves=(0, 1))
        if which == "loop":
            return jnp.sum(s[8]) + jnp.sum(s[7]) + s[0]
        rle = decode_jax._compact(s[8], cap, max_iters)
        return jnp.sum(rle) + jnp.sum(s[7])

    arg_sets = []
    for k in range(args.reps):
        sh = (k * 257) % n
        arg_sets.append(tuple(jax.device_put(v) for v in (
            np.roll(bt, sh, 0), np.roll(y0, sh), np.roll(x0, sh),
            np.roll(act, sh))))
        for a in arg_sets[-1]:
            a.block_until_ready()
    rtt = _rtt(jax, jnp)

    row = {"n": n, "ql": ql, "plane": [int(x) for x in bt.shape],
           "cap": cap, "max_iters": max_iters,
           "junk_frac": args.junk, "maxi_pct": pct,
           "dispatch_rtt_s": round(rtt, 4)}
    for which in ("jump", "loop", "full"):
        f = jax.jit(lambda b, y, x, a, _w=which: stage(b, y, x, a, _w))
        row[which] = _time_fn(f, arg_sets, rtt)
    row["sort_s_med"] = round(row["full"]["med_s"]
                              - row["loop"]["med_s"], 4)
    row["walk_s_med"] = round(row["loop"]["med_s"]
                              - row["jump"]["med_s"], 4)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
