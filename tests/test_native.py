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
