"""Base encodings for the TPU k-mer engine.

The reference stores sequences as ASCII bytes in a "sequence byte array" (SBA)
and compares k-mers byte-by-byte with a Numba comparator
(reference: kmers.py:306-397). TPUs want fixed-width vectorized keys instead,
so we exploit a structural accident of the IUPAC alphabet: the 15 IUPAC codes
plus the ``$`` record separator are exactly 16 symbols, and their ASCII order

    $ < A < B < C < D < G < H < K < M < N < R < S < T < V < W < Y

is the comparison order the reference uses (plain byte compare, with ``$`` /
past-the-end sorting below every base — reference kmers.py:360-378). We
therefore map each byte to a 4-bit *rank* (``$`` -> 0, A -> 1, ... Y -> 15) and
nibble-pack 8 ranks per uint32 word, big-endian within the word. Unsigned
comparison of packed words is then exactly byte-wise lexicographic comparison
of the underlying bases, including full IUPAC parity and the
"shorter-prefix-equal => smaller" rule (rank 0 pads past segment ends).
"""

from __future__ import annotations

import numpy as np

# The 16 allowed symbols in ASCII (== comparison) order.
ALLOWED_CHARS = "$ABCDGHKMNRSTVWY"
SEPARATOR = ord("$")

# uint8 byte value -> 4-bit rank. Disallowed bytes map to 0 but are rejected
# during SequenceCollection validation, so they never reach the compute path.
RANK_TABLE = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(ALLOWED_CHARS):
    RANK_TABLE[ord(_c)] = _i

# rank -> ASCII byte (for decoding packed data back to strings if needed)
UNRANK_TABLE = np.zeros(16, dtype=np.uint8)
for _i, _c in enumerate(ALLOWED_CHARS):
    UNRANK_TABLE[_i] = ord(_c)

# IUPAC complement (reference: sequence_collection.py:402-433), as a 256-entry
# byte-to-byte table so reverse-complement is a flip + one table gather.
COMPLEMENT_PAIRS = {
    "A": "T", "C": "G", "G": "C", "T": "A",
    "R": "Y", "Y": "R", "S": "S", "W": "W",
    "K": "M", "M": "K", "B": "V", "D": "H",
    "H": "D", "V": "B", "N": "N", "$": "$",
}
COMPLEMENT_TABLE = np.zeros(256, dtype=np.uint8)
for _k, _v in COMPLEMENT_PAIRS.items():
    COMPLEMENT_TABLE[ord(_k)] = ord(_v)

BASES_PER_WORD = 8  # 8 nibbles per uint32

# --------------------------------------------------------------------------- #
# 2-bit fast path (ACGT-only genomes: A=0 C=1 G=2 T=3, 16 bases per uint32)
#
# With rank(A) = 0, zero-padding past a segment end is indistinguishable from
# a run of As, so the 2-bit sort carries the compare-cap as an explicit extra
# key lane: equal masked words + smaller cap == the reference's
# "shorter-prefix-equal => smaller" rule (kmers.py:372-377), and group
# identity compares (masked words, capped length) pairs. Valid only when the
# SBA alphabet is a subset of {A,C,G,T,$} — SequenceCollection tracks that
# during alphabet validation.
# --------------------------------------------------------------------------- #

RANK2_TABLE = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    RANK2_TABLE[ord(_c)] = _i

BASES_PER_WORD2 = 16  # 16 2-bit fields per uint32

# MASKS2[r] keeps the top r 2-bit fields of a packed word (r in [0, 16]).
DIBIT_MASKS = np.zeros(17, dtype=np.uint32)
for _r in range(17):
    DIBIT_MASKS[_r] = (0xFFFFFFFF << (2 * (16 - _r))) & 0xFFFFFFFF if _r else 0

# MASKS[r] keeps the top r nibbles of a packed word (r in [0, 8]).
NIBBLE_MASKS = np.zeros(9, dtype=np.uint32)
for _r in range(9):
    NIBBLE_MASKS[_r] = (0xFFFFFFFF << (4 * (8 - _r))) & 0xFFFFFFFF if _r else 0


_QUERY_COMP_TABLE = str.maketrans(
    {_k: _v for _k, _v in COMPLEMENT_PAIRS.items() if _k != "$"}
)
_QUERY_ALLOWED = frozenset(COMPLEMENT_PAIRS) - {"$"}


def iupac_revcomp_strs(queries) -> list[str]:
    """Reverse complements of uppercase IUPAC query strings — shared by both
    engines' ``count_queries_canonical`` (one complement table, one error
    message). Raises ValueError on any non-IUPAC character."""
    out = []
    for q in queries:
        if set(q) - _QUERY_ALLOWED:
            raise ValueError(f"canonical queries must be uppercase IUPAC: '{q}'")
        out.append(q.translate(_QUERY_COMP_TABLE)[::-1])
    return out


def reverse_complement_bytes(sba: np.ndarray) -> np.ndarray:
    """Vectorized reverse complement of an ASCII SBA.

    Replaces the reference's scalar Numba loop
    (sequence_collection.py:42-73) with a table gather + flip (NumPy), or a
    single fused native scan for large arrays (native/fasta_parser.cpp).
    """
    if sba.size >= (1 << 16):
        from ..native import reverse_complement_native

        out = reverse_complement_native(sba, COMPLEMENT_TABLE)
        if out is not None:
            return out
    return COMPLEMENT_TABLE[sba][::-1].copy()


def pack_rank_words_np(sba: np.ndarray) -> np.ndarray:
    """Host (NumPy) version of the nibble packing, for tests and small inputs.

    P[i] packs ranks of bytes i..i+7 big-endian into one uint32; positions past
    the end of the array pack as rank 0 (same as ``$``), reproducing the
    reference's "past the array end == out of bounds" rule (kmers.py:361-362).
    """
    n = len(sba)
    ranks = RANK_TABLE[sba].astype(np.uint32)
    padded = np.zeros(n + BASES_PER_WORD - 1, dtype=np.uint32)
    padded[:n] = ranks
    out = np.zeros(n, dtype=np.uint32)
    for j in range(BASES_PER_WORD):
        out |= padded[j : j + n] << np.uint32(4 * (7 - j))
    return out
