"""Codec + nib2 byte-parity tests (reference Compress.c golden round trip)."""
import os

import numpy as np

from conftest import DATA, GOLD


def test_compress_byte_identical():
    from yaha_tpu.io import nib2
    with open(os.path.join(DATA, "testgen.fasta"), "rb") as f:
        mine = nib2.compress_fasta_bytes(f.read())
    with open(os.path.join(GOLD, "testgen.nib2"), "rb") as f:
        gold = f.read()
    assert mine == gold


def test_uncompress_byte_identical(genome):
    from yaha_tpu.io import nib2
    fa = nib2.uncompress_to_fasta(genome)
    with open(os.path.join(GOLD, "testgen.uncompressed.fasta"), "rb") as f:
        assert fa == f.read()


def test_codec_tables_roundtrip():
    from yaha_tpu.utils import codec
    codes = np.arange(16, dtype=np.uint8)
    chars = codec.unmap4to8(codes)
    assert bytes(chars) == b"TCAGNBDHKMRSVWXY"
    # Complement is an involution on the 16 codes.
    assert np.array_equal(
        codec.complement4to4(codec.complement4to4(codes)), codes)
    # ACGT chars map to 2-bit codes.
    assert list(codec.map8to4(np.frombuffer(b"TCAG", dtype=np.uint8))) == [0, 1, 2, 3]
    assert list(codec.map8to4(np.frombuffer(b"tcag", dtype=np.uint8))) == [0, 1, 2, 3]


def test_pack_unpack():
    from yaha_tpu.utils import codec
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=1000, dtype=np.uint8)
    assert np.array_equal(codec.unpack_nib2(codec.pack_nib2(codes)), codes)


def test_nib2_load_pads_zero_page():
    """Reads past maxROff must see mmap-zero-page codes (NOTES.md:
    reference UB emulations; fuzz seed 12247)."""
    import gzip
    import os
    import numpy as np
    from yaha_tpu.io import nib2
    gold = os.path.join(os.path.dirname(__file__), "golden", "testgen.nib2")
    with open(gold, "rb") as f:
        g = nib2.load(f.read())
    assert len(g.codes) >= g.max_roff + 4096
    assert (np.asarray(g.codes[-4096:]) == 0).all()
