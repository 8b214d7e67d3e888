"""Index-build byte-parity tests against reference golden index files."""
import gzip
import io
import os

import numpy as np
import pytest

from conftest import GOLD


def _build_bytes(genome, wl, sd, mh):
    from yaha_tpu.index import build
    from yaha_tpu.io import index_io
    so, roa, tm = build.build_index(genome, wl, sd, mh)
    buf = io.BytesIO()
    header = np.array([index_io.INDEX_FILE_VERSION, wl, mh, tm],
                      dtype=np.uint32)
    buf.write(header.tobytes())
    buf.write(np.ascontiguousarray(so, dtype=np.uint32).tobytes())
    buf.write(np.ascontiguousarray(roa, dtype=np.uint32).tobytes())
    return buf.getvalue()


@pytest.mark.parametrize("gold,wl,sd,mh", [
    ("testgen.X09_01_65525S.gz", 9, 1, 65525),
    ("testgen.X11_01_65525S.gz", 11, 1, 65525),
    ("testgen.X10_03_65525S.gz", 10, 3, 65525),   # skipDist > 1 grid logic
    ("testgen.X11_01_00020S.gz", 11, 1, 20),      # random down-sampling
])
def test_index_byte_identical(genome, gold, wl, sd, mh):
    mine = _build_bytes(genome, wl, sd, mh)
    with gzip.open(os.path.join(GOLD, gold)) as f:
        assert mine == f.read()


def test_index_roundtrip_io(tmp_path, genome):
    from yaha_tpu.index import build
    from yaha_tpu.io import index_io
    so, roa, tm = build.build_index(genome, 9, 1, 65525)
    p = str(tmp_path / "t.idx")
    index_io.write_index(p, 9, 65525, so, roa, tm)
    idx = index_io.load_index(p)
    assert idx.word_len == 9
    assert idx.total_matches == tm
    assert np.array_equal(idx.starting_offs, so)
    assert np.array_equal(idx.roa, roa)
