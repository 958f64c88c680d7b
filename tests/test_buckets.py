"""Property tests for the compile-shape bucketing helpers.

Remote XLA compiles cost minutes per shape, so every user-tunable quantity
is bucketed before it reaches a jitted kernel: sort sizes (half-pow2
steps), histogram bin counts (pow2, host fold restores exact clipping),
and count_queries batch sizes (pow2, floor 128). These tests pin the
bucket functions' contracts so a regression can't silently re-introduce
per-value compiles or, worse, under-allocate.
"""

import numpy as np

from genome_kmers_tpu.kmers import _pow2_bucket
from genome_kmers_tpu.ops.groups import _COMPARE_HIST_MAX_BINS, adaptive_bin_count
from genome_kmers_tpu.ops.sort import _bucket


def test_sort_bucket_contract():
    for n in list(range(1, 300)) + [4_599_970, 45_999_970, 2**24, 2**27]:
        b = _bucket(n)
        assert b >= n, n
        assert b >= 8
        # half-pow2 step: b is 2^i or 1.5 * 2^i
        p = 1 << (int(b).bit_length() - 1)
        assert b == p or b * 2 == 3 * p, (n, b)
        # padding waste capped at ~50% (exactly: b < 1.5 * n once n >= 8)
        if n >= 8:
            assert b <= n + (n // 2) + 4, (n, b)
    # exact sizes the bench relies on stay exact
    assert _bucket(2**24) == 2**24
    assert _bucket(2**27) == 2**27
    # monotone
    prev = 0
    for n in range(1, 2000):
        b = _bucket(n)
        assert b >= prev
        prev = b


def test_adaptive_bin_count_contract():
    for hi in (0, 1, 5, 31, 100, 4096, 10_000, 2**31):
        for mcb in (1, 25, 1000, 10_000, 1_000_000):
            bins = adaptive_bin_count(hi, mcb)
            # pow2-bucketed (program sharing) and able to hold the clipped range
            assert (bins + 1) & bins == 0
            assert bins >= min(hi, mcb)
            # small ranges ride the broadcast-compare form
            if min(hi, mcb) < _COMPARE_HIST_MAX_BINS // 2:
                assert bins + 1 <= _COMPARE_HIST_MAX_BINS
            # past the compare range, the scatter runs at the bucketed USER
            # bin count (>= mcb so the host fold restores exact clipping)
            if bins + 1 > _COMPARE_HIST_MAX_BINS:
                assert bins >= mcb
    # the reference's default shares one bucket with anything <= 2^20 - 1
    assert adaptive_bin_count(10**9, 1_000_000) == adaptive_bin_count(10**9, 1_048_575)


def test_pow2_bucket_contract():
    for n in range(1, 100):
        b = _pow2_bucket(n)
        assert b >= max(n, 8) and (b & (b - 1)) == 0
