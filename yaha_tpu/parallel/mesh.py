"""Device-mesh scale-out: data-parallel reads x model-parallel index.

The reference scales with pthreads over a shared mmap'd index
(Query.c:34-38,642-691) and has no distributed story (SURVEY.md section
2.2).  The TPU design replaces that with a 2-D mesh:

  * `data` axis — read batches are sharded across chips; each shard runs
    the full seed->extend pipeline on its reads (the primary scaling axis).
  * `model` axis — the k-mer index is hash-range sharded: each model shard
    holds SO rows for [lo, hi) hash values plus its slice of the ROA, so a
    ~16 GB human-genome index (guide section 3) fits across chips.  Seed
    lookups ride ICI: every data shard's hashes hit all model shards
    (replicated compute on masked ranges) and per-shard hit counts are
    combined with psum over `model`.

Collectives are XLA-inserted through shard_map; no hand-rolled NCCL/MPI
analog exists or is needed.
"""
from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: int | None = None, model_parallel: int = 1):
    devices = np.array(jax.devices()[:n_devices] if n_devices
                       else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0
    return Mesh(devices.reshape(n // model_parallel, model_parallel),
                ("data", "model"))


def shard_index(starting_offs: np.ndarray, n_model: int):
    """Split the SO array into n_model equal hash ranges.

    Each shard gets rows [lo, hi] of SO (hi inclusive for the sentinel) and
    the matching ROA slice; a shard resolves a hash h by computing
    SO[h+1]-SO[h] locally when lo <= h < hi, else contributes zero.

    Returns (so_shards [M, rows], roa_bounds [M, 2]) layout metadata.
    """
    ht = len(starting_offs) - 1
    per = ht // n_model
    so_shards = []
    bounds = []
    for m in range(n_model):
        lo = m * per
        hi = (m + 1) * per if m < n_model - 1 else ht
        so_shards.append(np.asarray(starting_offs[lo:hi + 1]))
        bounds.append((int(starting_offs[lo]), int(starting_offs[hi])))
    rows = max(len(s) for s in so_shards)
    out = np.zeros((n_model, rows), np.uint32)
    los = np.zeros(n_model, np.int64)
    for m, s in enumerate(so_shards):
        out[m, :len(s)] = s
        los[m] = m * per
    return out, los, np.asarray(bounds, np.int64)


def sharded_seed_counts(mesh: Mesh, hashes, so_shards, shard_lo):
    """Seed-lookup counts with SO sharded over the `model` axis.

    hashes:    [B, L] int32 per-offset k-mer hashes, sharded over `data`.
    so_shards: [M, rows] uint32 SO shard rows, sharded over `model`.
    shard_lo:  [M] first hash value of each shard.

    Returns counts [B, L] (replicated over model).
    """

    def kernel(h, so, lo):
        so = so[0].astype(jnp.int64)
        lo = lo[0]
        local = h - lo
        in_range = (local >= 0) & (local < so.shape[0] - 1)
        idx = jnp.clip(local, 0, so.shape[0] - 2)
        c = (so[idx + 1] - so[idx]).astype(jnp.int32)
        c = jnp.where(in_range, c, 0)
        # Each hash belongs to exactly one shard; sum over `model` merges.
        return jax.lax.psum(c, "model")

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P("data", None), P("model", None), P("model")),
        out_specs=P("data", None))(hashes, so_shards, shard_lo)


def data_parallel_extension_step(mesh: Mesh, ext_fn):
    """Wrap a batched extension forward so problems shard over `data`."""

    def kernel(q, qlens, r, rlens):
        out = ext_fn(q, qlens, r, rlens)
        # Cross-shard run statistic (reads/s accounting) rides psum.
        total = jax.lax.psum(jnp.sum(out["score"] > 0), "data")
        return out["score"], out["maxi"], out["maxj"], total

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data", None), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P()),
        check_rep=False)
