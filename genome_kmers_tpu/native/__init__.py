"""Native (C++) sidecar: fast FASTA parsing + byte-table kernels.

Builds ``libgkt_native.so`` from fasta_parser.cpp on first use (g++ -O3) and
binds it via ctypes; every caller falls back to the vectorized NumPy path in
io/fasta.py when the toolchain or the build is unavailable, so the native
layer is a pure accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "fasta_parser.cpp"
_LIB = Path(__file__).parent / "libgkt_native.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
                str(_SRC), "-o", str(_LIB),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # toolchain missing / sandboxed build dir
        logger.debug("native build failed: %s", e)
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError as e:
        logger.debug("native load failed: %s", e)
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gk_fasta_stats.restype = ctypes.c_int64
    lib.gk_fasta_stats.argtypes = [u8p, ctypes.c_int64, i64p, ctypes.c_int64]
    lib.gk_fasta_fill.restype = ctypes.c_int64
    lib.gk_fasta_fill.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64, i64p, i64p]
    lib.gk_validate_alphabet.restype = ctypes.c_int64
    lib.gk_validate_alphabet.argtypes = [u8p, ctypes.c_int64, u8p]
    lib.gk_reverse_complement.restype = None
    lib.gk_reverse_complement.argtypes = [u8p, ctypes.c_int64, u8p, u8p]
    lib.gk_chunk_bounds.restype = None
    lib.gk_chunk_bounds.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.gk_fasta_stats_mt.restype = ctypes.c_int64
    lib.gk_fasta_stats_mt.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p, i64p, i64p, i64p,
        ctypes.c_int64,
    ]
    lib.gk_fasta_fill_mt.restype = None
    lib.gk_fasta_fill_mt.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p, u8p, i64p, i64p,
    ]
    lib.gk_pack_strided.restype = None
    lib.gk_pack_strided.argtypes = [
        u8p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.gk_decode_rows.restype = None
    lib.gk_decode_rows.argtypes = [
        u8p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p,
    ]
    lib.gk_decode_rows_var.restype = None
    lib.gk_decode_rows_var.argtypes = [
        u8p, i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, u8p,
    ]
    _lib = lib
    return _lib


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


_MT_THRESHOLD = 8 << 20  # parse buffers above 8 MB with threads


def parse_fasta_bytes_native(data: bytes):
    """Native parse (multithreaded above 8 MB). Returns (sba, seg_starts,
    header_spans) or None if the native library is unavailable or limits are
    exceeded."""
    lib = get_lib()
    if lib is None:
        return None
    if len(data) >= _MT_THRESHOLD:
        return _parse_fasta_bytes_mt(data, lib)
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    max_records = max(1024, n // 8)
    seq_lens = np.zeros(max_records, dtype=np.int64)
    num_records = lib.gk_fasta_stats(_u8(arr), n, _i64(seq_lens), max_records)
    if num_records < 0:
        return None
    seq_lens = seq_lens[:num_records]

    # the reference's empty-sequence detection is a seg-start diff check that
    # misses a trailing empty record (sequence_collection.py:562-566); match
    # that quirk exactly by only rejecting non-trailing empties
    if num_records > 1 and (seq_lens[:-1] == 0).any():
        raise ValueError("At least one empty sequence was found in the input file")

    sba_len = int(seq_lens.sum()) + max(num_records - 1, 0)
    sba = np.empty(max(sba_len, 1), dtype=np.uint8)
    header_starts = np.zeros(max(num_records, 1), dtype=np.int64)
    header_ends = np.zeros(max(num_records, 1), dtype=np.int64)
    written = lib.gk_fasta_fill(
        _u8(arr), n, _u8(sba), sba.size, _i64(header_starts), _i64(header_ends)
    )
    if written != sba_len:
        raise AssertionError("After parsing the fasta file, we expect sba to be full")
    sba = sba[:sba_len]

    seg_starts = np.zeros(num_records, dtype=np.uint32)
    if num_records > 1:
        seg_starts[1:] = (np.cumsum(seq_lens[:-1] + 1)).astype(np.uint32)
    header_spans = list(zip(header_starts[:num_records], header_ends[:num_records]))
    return sba, seg_starts, header_spans


def _parse_fasta_bytes_mt(data: bytes, lib):
    """Multithreaded parse: line-aligned chunks, two-phase parallel stats
    (per-chunk byte/header counts + global header slabs), Python-side merge
    of cross-chunk record continuations, then a parallel fill at precomputed
    per-chunk output offsets."""
    import os

    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    n_chunks = max(1, min(os.cpu_count() or 4, 16))
    bounds = np.zeros(n_chunks + 1, dtype=np.int64)
    lib.gk_chunk_bounds(_u8(arr), n, n_chunks, _i64(bounds))

    max_records = max(1024, n // 8)
    seq_bytes = np.zeros(n_chunks, dtype=np.int64)
    lead = np.zeros(n_chunks, dtype=np.int64)
    nheaders = np.zeros(n_chunks, dtype=np.int64)
    hdr_offsets = np.zeros(max_records, dtype=np.int64)
    hdr_counts = np.zeros(max_records, dtype=np.int64)
    num_records = lib.gk_fasta_stats_mt(
        _u8(arr), n, n_chunks, _i64(bounds), _i64(seq_bytes), _i64(lead),
        _i64(nheaders), _i64(hdr_offsets), _i64(hdr_counts), max_records,
    )
    if num_records < 0:
        return None
    seq_lens = hdr_counts[:num_records].copy()

    # cross-chunk continuation: a chunk's leading sequence bytes belong to the
    # last record opened in an earlier chunk
    headers_before = np.concatenate([[0], np.cumsum(nheaders)[:-1]])
    last_open = -1
    for c in range(n_chunks):
        if lead[c] > 0 and last_open >= 0:
            seq_lens[last_open] += lead[c]
        if nheaders[c] > 0:
            last_open = int(headers_before[c] + nheaders[c] - 1)

    if num_records > 1 and (seq_lens[:-1] == 0).any():
        raise ValueError("At least one empty sequence was found in the input file")

    total_seq = int(seq_bytes.sum())
    sba_len = total_seq + max(num_records - 1, 0)
    sba = np.empty(max(sba_len, 1), dtype=np.uint8)

    seqb_before = np.concatenate([[0], np.cumsum(seq_bytes)[:-1]])
    out_offsets = seqb_before + headers_before - (headers_before > 0)
    header_starts = np.zeros(max(num_records, 1), dtype=np.int64)
    header_ends = np.zeros(max(num_records, 1), dtype=np.int64)
    lib.gk_fasta_fill_mt(
        _u8(arr), n, n_chunks, _i64(bounds), _i64(out_offsets),
        _i64(np.ascontiguousarray(headers_before)), _u8(sba),
        _i64(header_starts), _i64(header_ends),
    )
    sba = sba[:sba_len]

    seg_starts = np.zeros(num_records, dtype=np.uint32)
    if num_records > 1:
        seg_starts[1:] = (np.cumsum(seq_lens[:-1] + 1)).astype(np.uint32)
    header_spans = list(zip(header_starts[:num_records], header_ends[:num_records]))
    return sba, seg_starts, header_spans


def pack_strided_native(
    sba: np.ndarray, table: np.ndarray, bits: int, extra_words: int = 8
) -> np.ndarray | None:
    """Strided rank pack via the native library (multithreaded), or None if
    unavailable. Bit-identical to the NumPy pack in ops/large.py (same
    big-endian field order, rank-0 tail, ``extra_words`` trailing zeros)."""
    lib = get_lib()
    if lib is None or bits not in (2, 4):
        return None
    import os

    sba = np.ascontiguousarray(sba, dtype=np.uint8)
    table = np.ascontiguousarray(table, dtype=np.uint8)
    n = len(sba)
    bpw = 32 // bits
    n_words = -(-n // bpw)
    out = np.zeros(n_words + extra_words, dtype=np.uint32)
    if n == 0:
        return out
    n_threads = 1 if n < (4 << 20) else min(os.cpu_count() or 1, 8)
    lib.gk_pack_strided(
        _u8(sba),
        ctypes.c_int64(n),
        _u8(table),
        ctypes.c_int64(bits),
        ctypes.c_int64(n_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out


def decode_rows_native(sba: np.ndarray, pos: np.ndarray, kmer_len: int) -> np.ndarray | None:
    """(n, kmer_len) uint8 matrix with row r = sba[pos[r] : pos[r]+kmer_len]
    (multithreaded contiguous copies), or None if the native library is
    unavailable. Byte-identical to the per-offset NumPy gather in
    Kmers._decode_block_bytes, which is the fallback."""
    lib = get_lib()
    if lib is None:
        return None
    import os

    sba = np.ascontiguousarray(sba, dtype=np.uint8)
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    n = len(pos)
    out = np.empty((n, kmer_len), dtype=np.uint8)
    if n == 0:
        return out
    # callers have already validated positions against segment ends; this
    # guards the raw memcpy against a bad caller (IndexError like NumPy's)
    pmin, pmax = int(pos.min()), int(pos.max())
    if pmin < 0 or pmax + kmer_len > len(sba):
        raise IndexError("decode position out of bounds")
    n_threads = 1 if n * kmer_len < (4 << 20) else min(os.cpu_count() or 1, 8)
    lib.gk_decode_rows(
        _u8(sba), _i64(pos), ctypes.c_int64(n), ctypes.c_int64(kmer_len),
        ctypes.c_int64(n_threads), _u8(out),
    )
    return out


def decode_rows_var_native(
    sba: np.ndarray, pos: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray] | None:
    """Variable-width bulk decode: returns (data, offsets) where
    data[offsets[r] : offsets[r+1]] = sba[pos[r] : pos[r]+lens[r]] — an
    arrow-style string column. None if the native library is unavailable
    (callers fall back to a repeat-gather NumPy formulation)."""
    lib = get_lib()
    if lib is None:
        return None
    import os

    sba = np.ascontiguousarray(sba, dtype=np.uint8)
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    n = len(pos)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    data = np.empty(max(total, 1), dtype=np.uint8)[:total]
    if n == 0:
        return data, offsets
    if (lens < 0).any():
        raise ValueError("negative decode length")
    end_max = int((pos + lens).max())
    if int(pos.min()) < 0 or end_max > len(sba):
        raise IndexError("decode position out of bounds")
    n_threads = 1 if total < (4 << 20) else min(os.cpu_count() or 1, 8)
    lib.gk_decode_rows_var(
        _u8(sba), _i64(pos), _i64(lens), _i64(offsets), ctypes.c_int64(n),
        ctypes.c_int64(n_threads), _u8(data),
    )
    return data, offsets


def validate_alphabet_native(sba: np.ndarray, allowed_bytes: set) -> int | None:
    """First disallowed byte value, or None if clean / native unavailable
    (caller must fall back when None and the array wasn't checked)."""
    lib = get_lib()
    if lib is None:
        return None
    table = np.zeros(256, dtype=np.uint8)
    for b in allowed_bytes:
        table[b] = 1
    bad = lib.gk_validate_alphabet(_u8(np.ascontiguousarray(sba)), sba.size, _u8(table))
    return int(bad)


def reverse_complement_native(sba: np.ndarray, table: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(sba)
    out = np.empty_like(src)
    lib.gk_reverse_complement(_u8(src), src.size, _u8(np.ascontiguousarray(table)), _u8(out))
    return out
