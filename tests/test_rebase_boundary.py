"""ROA-offset rebasing at the 2^31 / 2^32 boundaries (VERDICT r4 #1).

The index file stores SO offsets as u32 cumulative match counts
(Index.c:161-194); for genomes past ~2.1 Gbp (design ceiling < 4 Gbp,
guide section 8.3) the global offsets legitimately exceed 2^31 and
approach 2^32.  The sharded lookup (parallel/mesh.py) rebases each
shard's SO rows to LOCAL offsets and gathers the local ROA slice with
int32 indices — these tests pin the boundary math:

  * rebase_so at synthetic SO values crossing 2^31 and ending near
    2^32-1 (uint32 subtraction exactness, int32 gather safety,
    base + local == global reconstruction);
  * the device kernel on ROA *values* near 2^32 (reference offsets of
    a ~4 Gbp genome) — the uint32 diag wrap (fragDiag, Math.h:448-461)
    against a numpy oracle;
  * the >=2^31 shard-slice assertion that forbids int32-unsafe shards.
"""
import numpy as np
import pytest


def _synthetic_so(ht, total, seed=0, start=0):
    """A valid (nondecreasing, u32) SO array over `ht` k-mers whose
    cumulative offsets span [start, start+total)."""
    rng = np.random.default_rng(seed)
    w = rng.random(ht)
    counts = np.floor(w / w.sum() * total).astype(np.int64)
    counts[-1] += total - counts.sum()
    so = np.zeros(ht + 1, np.int64)
    np.cumsum(counts, out=so[1:])
    so += start
    assert so[-1] < (1 << 32)
    return so.astype(np.uint32), so  # (u32 as stored, int64 truth)


def test_rebase_so_crossing_2_31():
    """Global SO offsets crossing 2^31: locals are exact and int32-safe."""
    from yaha_tpu.parallel.mesh import rebase_so
    ht = 1 << 12
    # Span [2^31 - 10^6, 2^31 + 3*10^6): the boundary falls inside
    # shard ~1 of 4.
    so_u32, so_i64 = _synthetic_so(ht, 4_000_000,
                                   start=(1 << 31) - 1_000_000)
    so_local, bases, lens = rebase_so(so_u32, 4)
    per = ht // 4
    for m in range(4):
        lo, hi = m * per, (m + 1) * per
        want = (so_i64[lo:hi + 1] - so_i64[lo])
        assert (so_local[m].astype(np.int64) == want).all()
        assert int(bases[m]) == int(so_i64[lo])
        assert int(lens[m]) == int(so_i64[hi] - so_i64[lo])
        # int32 gather safety: every local offset addresses the slice.
        assert so_local[m].max() == lens[m] and lens[m] < (1 << 31)
        # Reconstruction: base + local == global for all rows.
        assert (bases[m] + so_local[m].astype(np.int64)
                == so_i64[lo:hi + 1]).all()


def test_rebase_so_near_2_32():
    """Global SO offsets ending at 2^32 - 1 (the u32 format ceiling)."""
    from yaha_tpu.parallel.mesh import rebase_so
    ht = 1 << 10
    total = 5_000_000
    so_u32, so_i64 = _synthetic_so(ht, total, seed=3,
                                   start=(1 << 32) - total - 1)
    assert int(so_i64[-1]) == (1 << 32) - 1
    for n_model in (2, 4):
        so_local, bases, lens = rebase_so(so_u32, n_model)
        per = ht // n_model
        recon = bases[:, None] + so_local.astype(np.int64)
        want = np.stack([so_i64[m * per:(m + 1) * per + 1]
                         for m in range(n_model)])
        assert (recon == want).all()


def test_rebase_so_rejects_int32_unsafe_shard():
    """A shard slice of >= 2^31 entries must be rejected, not silently
    miscast (the kernel gathers local ROA with int32 indices)."""
    from yaha_tpu.parallel.mesh import rebase_so
    so = np.zeros(5, np.uint32)
    so[1:] = np.uint32((1 << 31))   # one shard owns 2^31 entries
    so[2:] = np.uint32((1 << 31) + 10)
    so[3:] = np.uint32((1 << 31) + 20)
    so[4] = np.uint32((1 << 31) + 30)
    with pytest.raises(AssertionError):
        rebase_so(so, 2)            # shard 0 slice = 2^31 + 10 entries
    # The same offsets over 4 shards are fine (each slice small except
    # shard 0's 2^31... still unsafe) — verify the safe variant passes.
    so2 = np.array([0, 10, 20, 30, 40], np.uint32)
    so_local, bases, lens = rebase_so(so2, 2)
    assert (lens == [20, 20]).all()


def test_sharded_lookup_ref_offsets_near_2_32():
    """Device sharded lookup with ROA *values* near 2^32 (reference
    offsets at the < 4 Gbp design ceiling): the uint32 diag wrap must
    match the host oracle bit-for-bit through the sharded kernel."""
    import jax
    from jax.sharding import Mesh
    from yaha_tpu.parallel.mesh import ShardedIndex, sharded_expand_sort

    ht = 256                      # tiny hash space, word_len irrelevant
    rng = np.random.default_rng(7)
    counts = rng.integers(0, 6, ht)
    so = np.zeros(ht + 1, np.uint32)
    so[1:] = np.cumsum(counts).astype(np.uint32)
    total = int(so[-1])
    # Reference offsets clustered just below 2^32 (plus a few tiny ones
    # so diag wraps both ways relative to qo).
    roa = ((1 << 32) - 1 - rng.integers(0, 5000, total)).astype(np.uint32)
    small = rng.random(total) < 0.2      # some small ROs so diag wraps
    roa[small] = rng.integers(0, 50, int(small.sum())).astype(np.uint32)

    class Idx:
        word_len = 4
        max_hits = 650
        starting_offs = so

    Idx.roa = roa
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "model"))
    sidx = ShardedIndex(Idx, 2).place(mesh)

    b, n = 4, 16
    hashes = rng.integers(0, ht, (b, n)).astype(np.int32)
    clean = rng.random((b, n)) < 0.8
    out = sharded_expand_sort(mesh, hashes, clean, sidx,
                              max_hits=650, capacity=64)
    width = out["diag"].shape[1]
    for k in range(b):
        # Host oracle: expand + lexsort by (diag u32, qo).
        ds, qs = [], []
        for w in range(n):
            if not clean[k, w]:
                continue
            h = int(hashes[k, w])
            c = int(so[h + 1]) - int(so[h])
            if c == 0 or c > 650:
                continue
            for j in range(c):
                ro = int(roa[int(so[h]) + j])
                ds.append((ro - w) & 0xFFFFFFFF)
                qs.append(w)
        order = np.lexsort((np.asarray(qs, np.int64),
                            np.asarray(ds, np.int64))) \
            if ds else np.zeros(0, np.int64)
        want_d = np.asarray(ds, np.uint32)[order] if ds else \
            np.zeros(0, np.uint32)
        want_q = np.asarray(qs, np.int32)[order] if ds else \
            np.zeros(0, np.int32)
        tot = int(np.asarray(out["total"])[k])
        assert tot == len(want_d)
        got_d = np.asarray(out["diag"])[k, :tot]
        got_q = np.asarray(out["qo"])[k, :tot]
        assert (got_d == want_d).all()
        assert (got_q == want_q).all()
