"""Differential check of the chunked host comparator.

``compare_sba_kmers_lexicographically`` is implemented as a chunked
numpy scan deriving the outcome from (nearest terminator, first difference,
compare cap); this sweep pins it against a literal byte-at-a-time walk of
the reference's control flow (reference kmers.py:306-397) over every index
pair and a spread of caps, including the no-valid-bases AssertionError.
"""

import numpy as np
import pytest

from genome_kmers_tpu.kmers import compare_sba_kmers_lexicographically


def _byte_walk(sa, sb, ia, ib, mk=None):
    j = 0
    while True:
        xa, xb = ia + j, ib + j
        a_over = xa >= len(sa) or sa[xa] == ord("$")
        b_over = xb >= len(sb) or sb[xb] == ord("$")
        if a_over or b_over:
            last = j - 1
            if last < 0:
                raise AssertionError("no bases")
            if a_over and not b_over:
                return -1, last
            if b_over and not a_over:
                return 1, last
            return 0, last
        if sa[xa] != sb[xb]:
            return (-1 if sa[xa] < sb[xb] else 1), j
        if mk is not None and j == mk - 1:
            return 0, j
        j += 1


@pytest.mark.parametrize(
    "sba_bytes",
    [
        b"ACGTACGT$AAAA$ACGAACGT",
        b"$A$",
        b"AAAAAAAAAA",
        b"NRYKMN$ACGT$N",
    ],
)
def test_comparator_matches_byte_walk(sba_bytes):
    a = np.frombuffer(sba_bytes, dtype=np.uint8)
    for ia in range(len(a)):
        for ib in range(len(a)):
            for mk in (None, 1, 2, 3, 5, 100):
                try:
                    want = _byte_walk(a, a, ia, ib, mk)
                except AssertionError:
                    want = "raise"
                try:
                    got = compare_sba_kmers_lexicographically(
                        a, a, ia, ib, max_kmer_len=mk
                    )
                except AssertionError:
                    got = "raise"
                assert got == want, (ia, ib, mk, got, want)


def test_comparator_cross_array_and_long_equal():
    # two different arrays, plus an equal stretch longer than one chunk (64)
    left = np.frombuffer(b"C" * 200 + b"$", dtype=np.uint8)
    right = np.frombuffer(b"C" * 150 + b"G" + b"C" * 50, dtype=np.uint8)
    assert compare_sba_kmers_lexicographically(left, right, 0, 0) == (-1, 150)
    assert compare_sba_kmers_lexicographically(right, left, 0, 0) == (1, 150)
    assert compare_sba_kmers_lexicographically(left, right, 0, 0, max_kmer_len=150) == (
        0,
        149,
    )
    assert compare_sba_kmers_lexicographically(left, left, 0, 0) == (0, 199)
