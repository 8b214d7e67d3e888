#!/usr/bin/env python3
"""Benchmark: flagship Pallas kernel + e2e aligner throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The headline metric is the banded-SW extension kernel (the speed-of-light
component); "extra" carries the anchored (gap-fill) kernel and the
end-to-end native-engine reads/s vs the reference binary when it exists.

Baseline: the reference yaha 0.1.83 banded X-dropoff extension DP measured
single-core on this machine via a microbenchmark linked against the
reference objects (tools/ref_swbench notes): 1.054e8 cells/s at 1 kb query
length, 10% mismatch (BASELINE.md).  vs_baseline is ours / reference.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REF_CELLS_PER_S = 1.054e8  # reference single-core banded extension DP
REF_BIN = "/root/yaha_ref_build/bin/yaha"
REPO = os.path.dirname(os.path.abspath(__file__))


def _measure_rtt():
    """Median trivial-dispatch round trip (subtracted from chain walls).
    Values are FETCHED (np.asarray): on the remote-TPU backend
    block_until_ready can return before results materialize."""
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


def _chain_rate(step_fn, q0, K, cells_per_launch, trials=3):
    """True per-launch device seconds via a data-dependent scan chain:
    ONE dispatch runs K sequential kernel invocations, each perturbing
    the next input from its own output (no launch can be elided or
    served from the remote launch-memoizer), and the scalar result is
    fetched.  Round 5: the old protocol (reused device-resident inputs
    over windows, block_until_ready) measured memoized dispatch, not
    compute — it reported 183.9 Gcells/s where the chain measures ~36
    (NOTES.md round-5).  Returns cells/s using the best trial."""
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

    import jax as _j
    q_d = _j.device_put(q0)
    q_d.block_until_ready()
    np.asarray(chain(q_d))            # compile
    rtt = _measure_rtt()
    best = float("inf")
    for t in range(trials):
        q2 = q0.copy()
        q2[:, 2] = (q2[:, 2] + t + 1) % 4
        q_d2 = _j.device_put(q2)
        q_d2.block_until_ready()
        t0 = time.time()
        np.asarray(chain(q_d2))
        best = min(best, time.time() - t0)
    per = max(best - rtt, 1e-9) / K
    return cells_per_launch / per


def bench_extension(use_tpu):
    from yaha_tpu.ops import sw_pallas, sw_batch
    import jax.numpy as jnp
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
    cells = n * ql * 21
    if use_tpu:
        fwd = sw_pallas.extension_forward_pallas
        K = 512
    else:
        fwd = sw_batch.batched_extension_forward
        K = 4
    r_d = np.asarray(r)
    qlens_j = jnp.asarray(qlens)
    rlens_j = jnp.asarray(rlens)
    r_j = jnp.asarray(r_d)

    def step(qc):
        out = fwd(qc, qlens_j, r_j, rlens_j, **kw)
        return jnp.sum(out["score"])

    return _chain_rate(step, q, K, cells), n, ql


def bench_anchored(use_tpu):
    """Anchored (gap-fill) kernel at its WIDE-BAND production shape:
    unbanded gap fills (lbw = rbw = max(q,r)+1) are the only shapes the
    full-matrix kernel serves in production — narrow bands ride the
    band-relative kernel (bench_anchored_banded; models/staged.py
    dispatch).  At this shape the band covers the whole matrix, so the
    in-band cell count equals the computed cells and the old 64x96/
    band-43 cell (37-45 Gcells/s, BENCH_r02) was measuring ~2.2x of
    masked out-of-band work that production never runs."""
    from yaha_tpu.ops import sw_pallas, sw_batch
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    n = sw_pallas.TILE if use_tpu else 256
    ql, rl = 64, 96
    lbw_v, rbw_v = rl + 1, rl + 1      # unbanded (SW.cpp:899 full init)
    q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
    r = rng.integers(0, 4, (n, rl)).astype(np.uint8)
    qlens = np.full(n, ql, np.int32)
    rlens = np.full(n, rl, np.int32)
    lbw = np.full(n, lbw_v, np.int32)
    rbw = np.full(n, rbw_v, np.int32)
    kw = dict(go=5, ge=2, rc=3, ms=1, max_gap=50, max_intron=50)
    qlens_j = jnp.asarray(qlens)
    rlens_j = jnp.asarray(rlens)
    lbw_j = jnp.asarray(lbw)
    rbw_j = jnp.asarray(rbw)
    r_j = jnp.asarray(r)
    if use_tpu:
        fwd = sw_pallas.anchored_forward_pallas
        K = 256
    else:
        fwd = sw_batch.batched_anchored_forward
        K = 4

    def step(qc):
        out = fwd(qc, qlens_j, r_j, rlens_j, lbw_j, rbw_j, **kw)
        return jnp.sum(out["score"])

    cells_per = ql * rl                # whole matrix in band
    return _chain_rate(step, q, K, n * cells_per), 2 * (rl + 1) + 1


def bench_anchored_banded(use_tpu):
    """Band-relative anchored kernel at a long-gap-fill shape (per-row
    work scales with the band, not the reference length)."""
    from yaha_tpu.ops import sw_pallas, sw_batch
    import jax.numpy as jnp
    rng = np.random.default_rng(13)
    n = sw_pallas.TILE if use_tpu else 256
    ql, rl, d = 192, 256, 5
    lbw_v, rbw_v = d, d + (rl - ql)
    wband = lbw_v + rbw_v + 1
    q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
    r = rng.integers(0, 4, (n, rl)).astype(np.uint8)
    qlens = np.full(n, ql, np.int32)
    rlens = np.full(n, rl, np.int32)
    lbw = np.full(n, lbw_v, np.int32)
    rbw = np.full(n, rbw_v, np.int32)
    kw = dict(go=5, ge=2, rc=3, ms=1, max_gap=50, max_intron=50)
    qlens_j = jnp.asarray(qlens)
    rlens_j = jnp.asarray(rlens)
    lbw_j = jnp.asarray(lbw)
    rbw_j = jnp.asarray(rbw)
    r_j = jnp.asarray(r)
    if use_tpu:
        fwd = lambda qc, *a, **k: sw_pallas.anchored_forward_pallas_banded(
            qc, *a, wband=wband, **k)
        K = 256
    else:
        fwd = sw_batch.batched_anchored_forward
        K = 4

    def step(qc):
        out = fwd(qc, qlens_j, r_j, rlens_j, lbw_j, rbw_j, **kw)
        return jnp.sum(out["score"])

    cells_per = sum(min(i + rbw_v, rl) - max(i - lbw_v, 1) + 1
                    for i in range(1, ql + 1))
    return _chain_rate(step, q, K, n * cells_per), wband


def _ensure_ref_bin():
    """Build the reference binary out-of-tree if this VM doesn't have it
    yet (fresh VMs drop /root/yaha_ref_build); modern g++ needs
    -fpermissive for SW.cpp's default-argument redeclaration."""
    if os.path.exists(REF_BIN):
        return True
    bdir = os.path.dirname(os.path.dirname(REF_BIN))
    src = "/root/reference"
    if not os.path.isdir(os.path.join(src, "src")):
        return False
    try:
        os.makedirs(bdir, exist_ok=True)
        subprocess.run(["cp", "-r", os.path.join(src, "src"),
                        os.path.join(bdir, "src")], check=True)
        subprocess.run(["cp", os.path.join(src, "Makefile"), bdir],
                       check=True)
        mk = os.path.join(bdir, "Makefile")
        with open(mk) as f:
            text = f.read()
        with open(mk, "w") as f:
            f.write(text.replace("CPPFLAGS := $(CCFLAGS)",
                                 "CPPFLAGS := $(CCFLAGS) -fpermissive"))
        subprocess.run(["make", "-j4"], cwd=bdir, check=True,
                       capture_output=True, timeout=600)
    except Exception:
        return os.path.exists(REF_BIN)
    return os.path.exists(REF_BIN)


def bench_e2e(reads, read_len, err, label_suffix=""):
    """Native-engine e2e reads/s vs the reference binary (best-of-N
    interleaved), on the checked-in test genome.  Read counts are sized
    so each run is multiple seconds — short runs are startup-dominated
    and the shared VM's wall clock swings between runs."""
    if not _ensure_ref_bin():
        return None
    out = {}
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/e2e_bench.py"),
             "--reads", str(reads), "--len", str(read_len),
             "--err", str(err), "--threads", "1,4",
             "--engine", "native", "--iters", "4"],
            capture_output=True, timeout=1200, text=True)
        for line in r.stdout.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            key = "%s_t%d" % ("ref" if rec["who"] == "reference"
                              else "native", rec["threads"])
            out[key + "_reads_per_s"] = rec["reads_per_s"]
            if "parity" in rec:
                out[key + "_parity"] = rec["parity"]
        for t in (1, 4):
            rk, nk = "ref_t%d_reads_per_s" % t, "native_t%d_reads_per_s" % t
            if rk in out and nk in out:
                out["t%d_vs_ref" % t] = round(out[nk] / out[rk], 3)
    except Exception as e:          # pragma: no cover
        out["error"] = str(e)[:200]
    return out


def bench_e2e_staged_tpu(n_reads=20000, read_len=100, err=0.02,
                         replay_windows=5):
    """Warm in-process e2e of the staged batch-pallas engine (native
    host phases + Pallas DP batches) with the tunnel cost decomposed.

    Protocol: parse once, run align_chunk twice; the first run pays
    backend attach + per-shape compiles (reported as warmup_s), the
    second is the steady-state number.  The decomposition separates
    host phases from device+transfer so a local-chip projection can be
    made: on this remote-TPU link the per-launch RTT and ~10 MB/s
    result-plane transfer dominate device_s; a local chip's DMA
    (>8 GB/s) makes the same bytes negligible (BASELINE.md round 3)."""
    import tempfile
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_testdata as mt
    import random
    # Persistent kernel-executable cache across bench processes.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/yaha_tpu/xla"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.0")
    from yaha_tpu.config import AlignmentArgs
    from yaha_tpu.io import native_loader
    from yaha_tpu.native import host
    from yaha_tpu.models.staged import StagedAligner

    d = tempfile.mkdtemp(prefix="staged_tpu_")
    try:
        import gzip
        import shutil
        shutil.copy(os.path.join(REPO, "tests/golden/testgen.nib2"), d)
        with gzip.open(os.path.join(
                REPO, "tests/golden/testgen.X11_01_65525S.gz")) as f:
            with open(os.path.join(d, "testgen.X11_01_65525S"),
                      "wb") as out:
                out.write(f.read())
        rng = random.Random(20260816)
        genome_d = mt.make_genome(rng)
        rng = random.Random(424242)
        recs = []
        for i in range(n_reads):
            chrom, pos, s = mt.sample_read(rng, genome_d, read_len)
            s = mt.mutate(rng, s, err, err / 4)
            if rng.random() < 0.5:
                s = mt.revcomp(s)
            recs.append(("rd%d" % i, s))
        qpath = os.path.join(d, "reads.fasta")
        mt.write_fasta(qpath, recs)

        aa = AlignmentArgs()
        aa.xfile_name = "testgen.X11_01_65525S"
        aa.qfile_name = "reads.fasta"
        aa.ofile_name = "out.sam"
        aa.post_process(True)
        genome = native_loader.load_genome(os.path.join(d, "testgen.nib2"))
        index = native_loader.load_index(
            os.path.join(d, "testgen.X11_01_65525S"))
        aa.word_len = index.word_len
        aa.max_hits = min(aa.max_hits, index.max_hits)
        with open(qpath, "rb") as f:
            data = f.read()
        pr = host.parse_queries_native(data, False, aa.max_query_length,
                                       aa.word_len)
        st = StagedAligner(aa, genome, index, backend="pallas",
                           n_threads=4)
        t0 = time.time()
        text, sm, nr = st.align_chunk(pr, 0, pr.n)
        warmup = time.time() - t0
        # In-run parity bit (same convention as the e2e_100bp/1kb rows):
        # the staged output on THESE measured reads must byte-match the
        # per-read native pipeline.
        ref, _, _, _ = host.align_batch_native(pr, 0, pr.n, genome,
                                               index, aa, n_threads=4)
        parity = text == ref
        iters = []
        for _ in range(3):
            st.stats = {k: (0 if not isinstance(v, float) else 0.0)
                        for k, v in st.stats.items()}
            t0 = time.time()
            text, sm, nr = st.align_chunk(pr, 0, pr.n)
            wall = time.time() - t0
            parity = parity and text == ref
            iters.append((wall, dict(st.stats)))
        iters.sort(key=lambda it: it[0])
        walls = [round(w, 2) for w, _ in iters]
        wall, s = iters[len(iters) // 2]        # median-wall iteration
        host_s = wall - s["device_s"]
        # Local-chip projection: replace tunnel RTT+transfer with DMA at
        # 8 GB/s and 100 us/launch.
        local_dev_s = ((s["h2d_bytes"] + s["d2h_bytes"]) / 8e9 +
                       s["dp_launches"] * 1e-4)
        # Measured device term (VERDICT r4 #2): replay the chunk's DP
        # launch sequence as one jitted program over device-resident
        # distinct-input windows — replaces the projection's implicit
        # "kernel time ~ 0" with a measurement (tools/device_replay.py).
        dev_meas = None
        if replay_windows:
            try:
                sys.path.insert(0, os.path.join(REPO, "tools"))
                import device_replay
                dev_meas = device_replay.measure_chunk_device(
                    st, pr, 0, pr.n, windows=replay_windows)
            except Exception as e:              # pragma: no cover
                dev_meas = {"error": str(e)[:300]}
        row = {
            "reads": pr.n,
            "reads_per_s_warm": round(pr.n / wall, 1),
            "warm_wall_s_min_med_max": walls,
            "warmup_s": round(warmup, 1),
            "wall_s": round(wall, 2),
            "host_phases_s": round(host_s, 2),
            "host_decomposition_s": {
                k[:-2]: round(s[k], 3)
                for k in ("begin_s", "gap_host_s", "phase2_s",
                          "ext_host_s", "finish_s")},
            "device_plus_transfer_s": round(s["device_s"], 2),
            "dp_launches": s["dp_launches"],
            "gap_problems": s["gap_problems"],
            # Which kernel serves the gap problems (VERDICT r3 #6): the
            # full-matrix kernel's share of real workloads.
            "gap_dispatch": {"banded": s["gap_banded"],
                             "full": s["gap_full"],
                             "fallback": s["gap_fallback"]},
            "ext_problems": s["ext_problems"],
            "h2d_mb": round(s["h2d_bytes"] / 1e6, 1),
            "d2h_mb": round(s["d2h_bytes"] / 1e6, 1),
            "records": nr,
            "parity": parity,
            "local_chip_projection_reads_per_s": round(
                pr.n / (host_s + local_dev_s), 1),
        }
        if dev_meas is not None:
            row["device_measured"] = dev_meas
            if "device_s_med" in dev_meas:
                # Projection with the MEASURED kernel+decode seconds in
                # place of the implicit zero: host + measured device +
                # modeled DMA/launch overhead.
                row["local_chip_projection_measured_reads_per_s"] = round(
                    pr.n / (host_s + dev_meas["device_s_med"]
                            + local_dev_s), 1)
        return row
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)


def _tpu_reachable(timeout=240):
    """Probe device enumeration in a child process: a down TPU tunnel
    blocks jax.devices() indefinitely, which must not hang the bench."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(any(d.platform == 'tpu' "
             "for d in jax.devices()))"],
            capture_output=True, timeout=timeout, text=True,
            env=dict(os.environ, PYTHONPATH=REPO + os.pathsep +
                     os.environ.get("PYTHONPATH", "")))
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and "True" in r.stdout


def main():
    sys.path.insert(0, REPO)
    # Persistent kernel-executable cache for the in-process kernel
    # benches too (the chained-scan programs cost minutes of remote
    # compile cold; cached they load in seconds).
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/yaha_tpu/xla"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.0")
    use_tpu = _tpu_reachable()
    if not use_tpu:
        # Device link down or CPU-only env: bench the XLA twins on CPU
        # rather than hanging in backend init.
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax
    use_tpu = use_tpu and any(d.platform == "tpu" for d in jax.devices())

    cps, n, ql = bench_extension(use_tpu)
    extra = {}
    try:
        acps, band = bench_anchored(use_tpu)
        extra["anchored_gcells_per_s"] = round(acps / 1e9, 3)
        extra["anchored_band"] = band
    except Exception as e:          # pragma: no cover
        extra["anchored_error"] = str(e)[:200]
    try:
        bcps, bband = bench_anchored_banded(use_tpu)
        extra["anchored_banded_gcells_per_s"] = round(bcps / 1e9, 3)
        extra["anchored_banded_band"] = bband
    except Exception as e:          # pragma: no cover
        extra["anchored_banded_error"] = str(e)[:200]
    e2e = bench_e2e(100000, 100, 0.02)
    if e2e:
        extra["e2e_100bp"] = e2e
    e2e1k = bench_e2e(12000, 1000, 0.05)
    if e2e1k:
        extra["e2e_1kb"] = e2e1k
    if use_tpu:
        # Staged TPU engine e2e (VERDICT r2 #1): native host phases +
        # Pallas DP batches, warm in-process protocol with the tunnel
        # cost decomposed.  Subprocess-guarded: a cold compile cache
        # costs ~10 min of remote kernel compiles and must not kill the
        # whole bench.
        for key, call in (
                ("e2e_tpu_staged_100bp", "bench.bench_e2e_staged_tpu()"),
                ("e2e_tpu_staged_1kb",
                 "bench.bench_e2e_staged_tpu(4000, 1000, 0.05)"),
                # The reference's marquee long-read case (VERDICT r4 #8):
                # CP-analog staged decomposition at 10 kb.
                ("e2e_tpu_staged_10kb",
                 "bench.bench_e2e_staged_tpu(600, 10000, 0.05)")):
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import sys; sys.path.insert(0, %r); import bench, "
                     "json; print('STAGED|' + json.dumps(%s))"
                     % (REPO, call)],
                    capture_output=True, timeout=2400, text=True,
                    env=dict(os.environ, PYTHONPATH=REPO + os.pathsep +
                             os.environ.get("PYTHONPATH", "")))
                for line in r.stdout.splitlines():
                    if line.startswith("STAGED|"):
                        extra[key] = json.loads(line[7:])
                        break
                else:                               # pragma: no cover
                    extra[key + "_error"] = (r.stderr or r.stdout)[-200:]
            except Exception as e:                  # pragma: no cover
                extra[key + "_error"] = str(e)[:200]

    print(json.dumps({
        "metric": "banded-SW extension DP throughput (%s, batch %dx%dbp)"
                  % ("TPU pallas" if use_tpu else "CPU XLA", n, ql),
        "value": round(cps / 1e9, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(cps / REF_CELLS_PER_S, 1),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
