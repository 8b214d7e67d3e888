"""ctypes bindings for the native host library (libyaha_host.so).

Falls back gracefully (available() == False) when the library has not
been built; callers keep using the pure-Python implementations.  Build
with tools/build_native.sh.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libyaha_host.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.yt_compress_fasta.argtypes = [
        c_u8p, ctypes.c_int64, ctypes.POINTER(c_u8p), c_i64p]
    lib.yt_unpack_nib2.argtypes = [c_u8p, ctypes.c_int64, c_u8p]
    lib.yt_parse_queries.argtypes = [
        c_u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(c_u8p), ctypes.POINTER(c_i64p),
        ctypes.POINTER(c_u8p), ctypes.POINTER(c_i64p),
        ctypes.POINTER(c_u8p), c_i64p]
    lib.yt_format_cigar_md.argtypes = [
        c_u8p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, c_u8p,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p)]
    lib.yt_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def compress_fasta(data: bytes) -> bytes:
    lib = _load()
    arr = np.frombuffer(data, dtype=np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_n = ctypes.c_int64()
    rc = lib.yt_compress_fasta(_as_u8p(arr), len(arr), ctypes.byref(out),
                               ctypes.byref(out_n))
    assert rc == 0
    try:
        return ctypes.string_at(out, out_n.value)
    finally:
        lib.yt_free(out)


def unpack_nib2(packed: np.ndarray) -> np.ndarray:
    lib = _load()
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    out = np.empty(len(packed) * 2, dtype=np.uint8)
    lib.yt_unpack_nib2(_as_u8p(packed), len(packed), _as_u8p(out))
    return out


def parse_queries(data: bytes, fastq: bool, max_query_len: int,
                  word_len: int):
    """Returns (ids list[str], seqs list[bytes], quals list[bytes]|None)."""
    lib = _load()
    arr = np.frombuffer(data, dtype=np.uint8)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    ids = c_u8p()
    id_offs = c_i64p()
    seqs = c_u8p()
    seq_offs = c_i64p()
    quals = c_u8p()
    n_reads = ctypes.c_int64()
    rc = lib.yt_parse_queries(
        _as_u8p(arr), len(arr), int(fastq), max_query_len, word_len,
        ctypes.byref(ids), ctypes.byref(id_offs), ctypes.byref(seqs),
        ctypes.byref(seq_offs), ctypes.byref(quals), ctypes.byref(n_reads))
    assert rc == 0
    n = n_reads.value
    try:
        id_off = np.ctypeslib.as_array(id_offs, shape=(n + 1,)).copy()
        seq_off = np.ctypeslib.as_array(seq_offs, shape=(n + 1,)).copy()
        id_bytes = ctypes.string_at(ids, int(id_off[-1])) if n else b""
        seq_bytes = ctypes.string_at(seqs, int(seq_off[-1])) if n else b""
        qual_bytes = (ctypes.string_at(quals, int(seq_off[-1]))
                      if (n and fastq) else b"")
    finally:
        for p in (ids, id_offs, seqs, seq_offs, quals):
            lib.yt_free(p)
    out_ids = []
    out_seqs = []
    out_quals = [] if fastq else None
    for k in range(n):
        out_ids.append(id_bytes[id_off[k]:id_off[k + 1]].decode("latin-1"))
        out_seqs.append(seq_bytes[seq_off[k]:seq_off[k + 1]])
        if fastq:
            out_quals.append(qual_bytes[seq_off[k]:seq_off[k + 1]])
    return out_ids, out_seqs, out_quals


def format_cigar_md(ops, lens, genome_codes: np.ndarray,
                    ref_off: int) -> tuple[str, str]:
    lib = _load()
    ops_arr = np.frombuffer("".join(ops).encode("latin-1"), dtype=np.uint8)
    lens_arr = np.asarray(lens, dtype=np.int32)
    cigar = ctypes.c_char_p()
    md = ctypes.c_char_p()
    rc = lib.yt_format_cigar_md(
        _as_u8p(ops_arr), lens_arr.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)), len(ops_arr),
        _as_u8p(np.ascontiguousarray(genome_codes)), ref_off,
        ctypes.byref(cigar), ctypes.byref(md))
    assert rc == 0
    return cigar.value.decode(), md.value.decode()
