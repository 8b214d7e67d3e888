"""nib2 genome container: byte-exact read/write of the reference format.

Format (Compress.c:25-74): 16-byte header {magic 0x01020304, version,
byte-offset-of-bases, seqCount}; per-sequence block {startOffset(bytes),
length(bases), nameOffset, nameLen} (v2: 4 u32; v1: 3 u32 with packed
name info); mask-block count (always 0); concatenated names padded to a
4-byte boundary; packed 4-bit bases, each sequence padded with X to a
4-byte boundary.
"""
from __future__ import annotations

import numpy as np

from ..utils import codec
from .genome import Genome

NIB2_MARKER = 0x01020304
_XCODE = 14


def compress_fasta_bytes(data: bytes) -> bytes:
    """FASTA -> nib2 bytes. Port of compressFile (Compress.c:220-329).

    Mirrors reference quirks: bytes 0-31 are skipped as whitespace, every
    other non-'>' byte counts as a base (space maps to X), sequence names
    stop at the first space, odd-length sequences get an X pad nibble and
    each sequence is padded with 0xEE bytes to a 4-byte boundary.
    """
    arr = np.frombuffer(data, dtype=np.uint8)
    # Sequence boundaries: '>' at positions.
    gt_positions = np.flatnonzero(arr == ord(">"))
    # The reference treats '>' anywhere outside 0-31 runs as a header start;
    # in practice FASTA headers start after newlines.  We parse headers
    # sequentially for exactness.
    names: list[bytes] = []
    seq_starts: list[int] = []   # byte offset in output base area
    seq_lengths: list[int] = []
    chunks: list[np.ndarray] = []  # per-seq packed byte arrays

    newline_pos = np.flatnonzero(arr == ord("\n"))

    def next_newline(pos: int) -> int:
        i = np.searchsorted(newline_pos, pos)
        if i == len(newline_pos):
            return len(arr)  # no trailing newline; reference would overrun
        return int(newline_pos[i])

    out_offset = 0
    for idx, gt in enumerate(gt_positions):
        nl = next_newline(gt + 1)
        name = bytes(arr[gt + 1:nl])
        sp = name.find(b" ")
        if sp >= 0:
            name = name[:sp]
        names.append(name)
        seq_end = gt_positions[idx + 1] if idx + 1 < len(gt_positions) else len(arr)
        body = arr[nl + 1:seq_end]
        # Drop control chars (0-31), exactly like the reference skip.
        body = body[body > 31]
        codes = codec.FOUR_BIT_CODES[body]
        n_bases = len(codes)
        if n_bases % 2:
            codes = np.concatenate([codes, np.array([_XCODE], dtype=np.uint8)])
        packed = codec.pack_nib2(codes)
        # Pad to 4-byte boundary with X-filled bytes (0xEE).
        pad = (-len(packed)) % 4
        if pad:
            packed = np.concatenate(
                [packed, np.full(pad, (_XCODE << 4) + _XCODE, dtype=np.uint8)])
        seq_starts.append(out_offset)
        seq_lengths.append(n_bases)
        chunks.append(packed)
        out_offset += len(packed)

    # Header (outputBaseSequences, Compress.c:140-191), always version 2.
    tot_name_len = sum(len(n) for n in names)
    tot_name_len_padded = (tot_name_len + 3) & ~3
    seq_count = len(names)
    preamble = 20 + 16 * seq_count + tot_name_len_padded

    out = bytearray()
    head = np.array([NIB2_MARKER, 2, preamble, seq_count], dtype=np.uint32)
    out += head.tobytes()
    name_offset = 0
    for i in range(seq_count):
        out += np.array([seq_starts[i], seq_lengths[i], name_offset,
                         len(names[i])], dtype=np.uint32).tobytes()
        name_offset += len(names[i])
    out += np.zeros(1, dtype=np.uint32).tobytes()  # mask block count
    for n in names:
        out += n
    # Pad names to 4-byte boundary.  The reference writes
    # (totNameLen_padded - totNameLen) bytes from a zeroed u32 buffer
    # (Compress.c:188-190).
    out += b"\x00" * (tot_name_len_padded - tot_name_len)
    for c in chunks:
        out += c.tobytes()
    return bytes(out)


def load(data: bytes) -> Genome:
    """Parse nib2 bytes into a normalized Genome.

    Port of loadBaseSequences (Compress.c:76-134) + normalizeBaseSequences
    (BaseSeq.c:113-119): returned offsets are in bases.
    """
    head = np.frombuffer(data[:16], dtype=np.uint32)
    if head[0] != NIB2_MARKER or head[1] not in (1, 2):
        raise ValueError("Input nib2 file bad header format.")
    version = int(head[1])
    base_off = int(head[2])
    seq_count = int(head[3])
    bs_block = 12 if version == 1 else 16
    name_start = 16 + bs_block * seq_count + 4  # + mask header (0 blocks)

    recs = np.frombuffer(
        data[16:16 + bs_block * seq_count], dtype=np.uint32
    ).reshape(seq_count, bs_block // 4)
    names = []
    starts = np.empty(seq_count, dtype=np.int64)
    lengths = np.empty(seq_count, dtype=np.int64)
    for i in range(seq_count):
        starts[i] = int(recs[i, 0]) * 2  # bytes -> bases (normalize)
        lengths[i] = int(recs[i, 1])
        if version == 1:
            name_info = int(recs[i, 2])
            noff, nlen = (name_info >> 16) & 0xFFFF, name_info & 0xFFFF
        else:
            noff, nlen = int(recs[i, 2]), int(recs[i, 3])
        names.append(data[name_start + noff:name_start + noff + nlen]
                     .decode("latin-1"))
    packed = np.frombuffer(data[base_off:], dtype=np.uint8)
    codes = codec.unpack_nib2(packed)
    # The reference mmaps the genome file (Query.c:556); reads past EOF
    # land on the mmap zero page, i.e. code 0 ('T'), for up to a page.
    # Degenerate chop offsets can walk the perfect extensions exactly to
    # maxROff (fuzz seed 12247), so reproduce the zero page.
    codes = np.concatenate([codes, np.zeros(8192, dtype=np.uint8)])
    return Genome(names=names, starting_offsets=starts, lengths=lengths,
                  codes=codes)


def uncompress_to_fasta(genome: Genome) -> bytes:
    """nib2 -> FASTA bytes. Port of uncompressFile (Compress.c:337-402):
    50-char lines, names as stored."""
    parts = []
    for i in range(genome.n_seqs):
        parts.append(b">" + genome.names[i].encode("latin-1") + b"\n")
        start = int(genome.starting_offsets[i])
        length = int(genome.lengths[i])
        chars = codec.unmap4to8(genome.codes[start:start + length])
        full = (length // 50) * 50
        if full:
            block = np.empty((full // 50, 51), np.uint8)
            block[:, :50] = chars[:full].reshape(-1, 50)
            block[:, 50] = ord("\n")
            parts.append(block.tobytes())
        if length > full:
            parts.append(chars[full:].tobytes() + b"\n")
    return b"".join(parts)
