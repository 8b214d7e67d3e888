"""Native host library parity vs the Python implementations."""
import os

import numpy as np
import pytest

from conftest import DATA, GOLD

host = pytest.importorskip("yaha_tpu.native.host")

pytestmark = pytest.mark.skipif(not host.available(),
                                reason="libyaha_host.so not built "
                                       "(tools/build_native.sh)")


def test_native_compress_matches_golden():
    with open(os.path.join(DATA, "testgen.fasta"), "rb") as f:
        data = f.read()
    with open(os.path.join(GOLD, "testgen.nib2"), "rb") as f:
        gold = f.read()
    assert host.compress_fasta(data) == gold


def test_native_compress_file_matches_golden(tmp_path):
    """File-to-file compress (the CLI -c fast path) is byte-identical to
    the in-memory codec."""
    out = os.path.join(tmp_path, "out.nib2")
    host.compress_fasta_file(os.path.join(DATA, "testgen.fasta"), out)
    with open(os.path.join(GOLD, "testgen.nib2"), "rb") as f:
        gold = f.read()
    with open(out, "rb") as f:
        assert f.read() == gold


def test_native_unpack():
    from yaha_tpu.utils import codec
    rng = np.random.default_rng(0)
    packed = rng.integers(0, 256, 4096).astype(np.uint8)
    assert np.array_equal(host.unpack_nib2(packed),
                          codec.unpack_nib2(packed))


@pytest.mark.parametrize("fname,fastq", [
    ("readsF_edge.fasta", False),
    ("readsE_150bp.fastq", True),
    ("readsA_100bp.fasta", False),
])
def test_native_parser_matches_python(fname, fastq):
    from yaha_tpu.io import fasta as pyfasta
    from yaha_tpu.config import AlignmentArgs
    with open(os.path.join(DATA, fname), "rb") as f:
        qdata = f.read()
    aa = AlignmentArgs()
    aa.post_process(True)
    recs = list(pyfasta.read_queries(qdata, aa))
    ids, seqs, quals = host.parse_queries(qdata, fastq,
                                          aa.max_query_length, aa.word_len)
    assert len(recs) == len(ids)
    for k, rec in enumerate(recs):
        assert rec.query_id == ids[k]
        assert rec.forward_buf.tobytes() == seqs[k]
        if fastq:
            assert rec.qual.tobytes() == quals[k]


def test_native_cigar_md():
    from yaha_tpu.io import nib2
    with open(os.path.join(GOLD, "testgen.nib2"), "rb") as f:
        g = nib2.load(f.read())
    ops = ["M", "R", "M", "D", "M", "I", "M"]
    lens = [10, 2, 5, 3, 4, 2, 6]
    cigar, md = host.format_cigar_md(ops, lens, g.codes, 1000)
    assert cigar == "17M3D4M2I6M"
    # Cross-check MD against the Python SAM writer logic.
    from yaha_tpu.utils import codec
    exp = []
    matches = 0
    cur = 1000
    prev = "U"
    for op, ln in zip(ops, lens):
        if op == "M":
            matches += ln
            cur += ln
        elif op == "R":
            if matches:
                exp.append(str(matches))
                matches = 0
            if prev == "D":
                exp.append("0")
            exp.append(codec.unmap4to8(g.codes[cur:cur + ln]).tobytes()
                       .decode())
            cur += ln
        elif op == "D":
            if matches:
                exp.append(str(matches))
                matches = 0
            exp.append("^" + codec.unmap4to8(g.codes[cur:cur + ln])
                       .tobytes().decode())
            cur += ln
        prev = op
    if matches:
        exp.append(str(matches))
    assert md == "".join(exp)


def test_native_dp_matches_numpy_twins():
    from yaha_tpu.ops import sw_numpy
    rng = np.random.default_rng(12)
    n, ql, bw2 = 24, 70, 10
    q = rng.integers(0, 4, (n, ql)).astype(np.uint8)
    qlens = rng.integers(5, ql + 1, n).astype(np.int32)
    rl = ql + 2 * bw2
    r = np.zeros((n, rl), np.uint8)
    for k in range(n):
        L = qlens[k]
        r[k, :L] = q[k, :L]
        m = rng.random(L) < 0.2
        r[k, :L][m] = rng.integers(0, 4, int(m.sum()))
        r[k, L:] = rng.integers(0, 4, rl - L)
    rlens = (qlens + bw2).astype(np.int32)
    kw = dict(band_width=5, go=5, ge=2, rc=3, ms=1, max_gap=50,
              max_intron=50, x_cutoff=25)
    a = host.extension_forward(q, qlens, r, rlens, **kw)
    b = sw_numpy.batched_extension_forward_np(q, qlens, r, rlens, **kw)
    for key in ("score", "maxi", "maxj", "eo", "idc"):
        assert np.array_equal(a[key], b[key]), key

    qg = rng.integers(2, 40, n)
    rg = rng.integers(2, 40, n)
    qa = np.zeros((n, int(qg.max())), np.uint8)
    ra = np.zeros((n, int(rg.max())), np.uint8)
    lb = np.zeros(n, np.int64)
    rb = np.zeros(n, np.int64)
    for k in range(n):
        qa[k, :qg[k]] = rng.integers(0, 4, qg[k])
        ra[k, :rg[k]] = rng.integers(0, 4, rg[k])
        if k % 2:
            m = min(qg[k], rg[k])
            ra[k, :m] = qa[k, :m]
        ld = abs(int(qg[k]) - int(rg[k]))
        if ld + 11 < rg[k]:
            if rg[k] > qg[k]:
                lb[k], rb[k] = 5, 5 + rg[k] - qg[k]
            else:
                lb[k], rb[k] = 5 + qg[k] - rg[k], 5
        else:
            lb[k] = rb[k] = 1000
    kw2 = dict(go=5, ge=2, rc=3, ms=1, max_gap=50, max_intron=50)
    a = host.anchored_forward(qa, qg, ra, rg, lb, rb, **kw2)
    b = sw_numpy.batched_anchored_forward_np(qa, qg, ra, rg, lb, rb, **kw2)
    for key in ("score", "eo", "idc"):
        assert np.array_equal(a[key], b[key]), key
