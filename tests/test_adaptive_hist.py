"""Adaptive two-stage histogram: at large max_counts_bin (the reference's
1e6 default) the device reads a [total, hi] digest first and dispatches the
stage-2 histogram at a pow2-bucketed bin count — broadcast-compare when the
largest qualifying group fits (the common case), scatter-add otherwise
(ops/groups sizes_digest / hist_from_sizes). These tests pin exactness of
the fold against small-clip queries across all engine paths (retained
lanes, lanes-filtered, plane-filtered, gather boundary), including a
planted group larger than the compare-histogram range so the scatter
stage 2 runs.
"""

import numpy as np
import pytest

from genome_kmers_tpu import SequenceCollection
from genome_kmers_tpu.kmers import Kmers
from genome_kmers_tpu.ops.filters import GcContentFilter, VectorizedFilter


def _fold(hist, clip):
    out = hist[: clip + 1].copy()
    out[clip] += hist[clip + 1 :].sum()
    return out


@pytest.fixture(scope="module")
def km_with_big_group():
    rng = np.random.default_rng(13)
    seq = "".join(rng.choice(list("ACGT"), 3000)) + "A" * 5000
    sc = SequenceCollection(sequence_list=[("r1", seq)], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=9, max_kmer_len=16)
    km.sort()
    return km


@pytest.mark.parametrize("filt", [None, GcContentFilter(0.2, 0.8, 9)],
                         ids=["keep-all", "gc"])
def test_default_bins_equal_small_clip_folds(km_with_big_group, filt):
    km = km_with_big_group
    kw = {} if filt is None else {"kmer_filter_func": filt}
    h_big, t_big = km.get_kmer_group_counts(9, max_counts_bin=1000000, **kw)
    if filt is None:
        # the poly-A run makes one group of ~5000 — past the compare range,
        # so the scatter stage 2 ran for the default query above (the GC
        # filter kills that group: zero of its bases are G/C)
        assert np.flatnonzero(h_big)[-1] > 4096
    for clip in (10, 1000, 4500, 5000):
        h_c, t_c = km.get_kmer_group_counts(9, max_counts_bin=clip, **kw)
        assert t_c == t_big
        assert np.array_equal(h_c, _fold(h_big, clip))


def test_adaptive_on_plane_filtered_path(km_with_big_group):
    # VectorizedFilter has no lanes form -> the plane/window filtered path,
    # whose adaptive stage 1 is filtered_sizes_digest
    km = km_with_big_group
    import jax.numpy as jnp

    filt = VectorizedFilter(
        lambda sba, positions, valid_len: (positions & jnp.uint32(1)) == 0
    )
    h_big, t_big = km.get_kmer_group_counts(9, kmer_filter_func=filt,
                                            max_counts_bin=1000000)
    h_s, t_s = km.get_kmer_group_counts(9, kmer_filter_func=filt,
                                        max_counts_bin=2000)
    assert t_s == t_big
    assert np.array_equal(h_s, _fold(h_big, 2000))


def test_adaptive_group_size_bounds(km_with_big_group):
    km = km_with_big_group
    h_all, t_all = km.get_kmer_group_counts(9, max_counts_bin=1000000)
    h_b, t_b = km.get_kmer_group_counts(
        9, max_counts_bin=1000000, min_group_size=2, max_group_size=4000
    )
    # bounded query drops singletons and the poly-A group
    assert h_b[1] == 0 and h_b[4001:].sum() == 0
    assert t_b == sum(i * h_all[i] for i in range(2, 4001))
