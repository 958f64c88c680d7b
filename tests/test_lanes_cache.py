"""Sorted-key-lane retention: after sort(), group-boundary masks come from
the retained sorted lanes (pure adjacent compare, no genome gathers —
ops/sort.boundaries_from_sorted_lanes). Must equal the gather-rebuilding
path bit-for-bit for every kmer_len <= the built length, on the 2-bit
(uniform and capped) and 4-bit paths."""

import numpy as np
import pytest

from genome_kmers_tpu import Kmers, SequenceCollection


def _random_seqs(rng, alphabet, n_records, lo, hi):
    return [
        ("r%d" % i, "".join(rng.choice(list(alphabet), size=int(rng.integers(lo, hi + 1)))))
        for i in range(n_records)
    ]


@pytest.mark.parametrize(
    "alphabet,min_k,max_k",
    [
        ("ACGT", 5, 5),      # 2-bit uniform-cap (no cap lane)
        ("ACGT", 2, 9),      # 2-bit with cap lane
        ("ACGT", 3, 40),     # 2-bit, multi-word, cap lane
        ("ACGTN", 2, 7),     # 4-bit one-window
        ("ACGTN", 4, 4),     # 4-bit uniform
    ],
)
def test_lane_boundaries_match_gather_path(alphabet, min_k, max_k):
    rng = np.random.default_rng(max_k * 100 + min_k)
    sc = SequenceCollection(
        sequence_list=_random_seqs(rng, alphabet, 3, max_k, 120),
        strands_to_load="forward",
    )
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    km.sort()
    assert km._lanes_cache is not None

    for k in sorted({min_k, max_k, (min_k + max_k) // 2, 1}):
        c_lane, t_lane = km.get_kmer_group_counts(k, max_counts_bin=40)
        cache, km._lanes_cache = km._lanes_cache, None
        km._lanes_rebuild = False
        c_gather, t_gather = km.get_kmer_group_counts(k, max_counts_bin=40)
        km._lanes_cache, km._lanes_rebuild = cache, True
        np.testing.assert_array_equal(np.asarray(c_lane), np.asarray(c_gather)), k
        assert t_lane == t_gather, k


def test_refinement_path_has_no_lanes():
    rng = np.random.default_rng(0)
    sc = SequenceCollection(
        sequence_list=_random_seqs(rng, "ACGTN", 2, 40, 80),
        strands_to_load="forward",
    )
    km = Kmers(sc, min_kmer_len=1, max_kmer_len=None)  # unbounded -> refinement
    km.sort()
    assert km._lanes_cache is None
    # and the engine still works
    assert km.get_kmer_count(3) > 0


def test_cache_invalidation():
    rng = np.random.default_rng(1)
    sc = SequenceCollection(
        sequence_list=_random_seqs(rng, "ACGT", 2, 20, 60),
        strands_to_load="forward",
    )
    km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
    km.sort()
    assert km._lanes_cache is not None
    km.kmer_sba_start_indices = km.kmer_sba_start_indices.copy()
    assert km._lanes_cache is None  # setter invalidates

    km2 = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
    km2.sort()
    from genome_kmers_tpu.parallel import make_mesh

    km2.sort(mesh=make_mesh(2))
    assert km2._lanes_cache is None  # mesh layout replaces single-chip lanes
    assert km2.get_kmer_count(4) == km.get_kmer_count(4)


def test_filtered_queries_bypass_lane_cache():
    from genome_kmers_tpu.ops.filters import GcContentFilter

    rng = np.random.default_rng(2)
    sc = SequenceCollection(
        sequence_list=_random_seqs(rng, "ACGT", 2, 30, 70),
        strands_to_load="forward",
    )
    km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
    km.sort()
    f = GcContentFilter(0.25, 0.75, 4)
    c1, t1 = km.get_kmer_group_counts(4, kmer_filter_func=f)
    cache, km._lanes_cache = km._lanes_cache, None
    km._lanes_rebuild = False
    c2, t2 = km.get_kmer_group_counts(4, kmer_filter_func=f)
    km._lanes_cache, km._lanes_rebuild = cache, True
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert t1 == t2


def test_both_strand_track_separately_uses_lanes():
    rng = np.random.default_rng(3)
    seqs = _random_seqs(rng, "ACGT", 2, 20, 50)
    sc = SequenceCollection(sequence_list=seqs, strands_to_load="both")
    km = Kmers.from_strand(sc, min_kmer_len=4, max_kmer_len=4,
                           source_strand="both", track_strands_separately=True)
    km.sort()
    assert km._lanes_cache is not None
    c1, t1 = km.get_kmer_group_counts(4, max_counts_bin=30)
    cache, km._lanes_cache = km._lanes_cache, None
    km._lanes_rebuild = False
    c2, t2 = km.get_kmer_group_counts(4, max_counts_bin=30)
    km._lanes_cache, km._lanes_rebuild = cache, True
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert t1 == t2


def test_lanes_rebuild_after_load(tmp_path):
    # the reference's flagship workflow: sort once, save, reload for queries
    # (reference docs/overview.rst:99-112). A loaded index has no in-process
    # sort to retain lanes from; the first stats query rebuilds them once and
    # every path (unfiltered, filtered lanes flags) runs gather-free after.
    import numpy as np

    from genome_kmers_tpu.ops.filters import GcContentFilter

    rng = np.random.default_rng(17)
    seqs = _random_seqs(rng, "ACGT", 3, 40, 90)
    sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=8, max_kmer_len=12)
    km.sort()
    want_h, want_t = km.get_kmer_group_counts(8, max_counts_bin=25)
    f = GcContentFilter(0.2, 0.8, 8)
    want_fh, want_ft = km.get_kmer_group_counts(8, kmer_filter_func=f,
                                                max_counts_bin=25)
    p = str(tmp_path / "km.h5")
    km.save(p, include_sequence_collection=True, format="hdf5")
    km2 = Kmers.__new__(Kmers)
    km2.load(p, format="hdf5")
    assert getattr(km2, "_lanes_cache", None) is None
    got_h, got_t = km2.get_kmer_group_counts(8, max_counts_bin=25)
    assert km2._lanes_cache is not None  # rebuilt on first query
    assert got_t == want_t and np.array_equal(np.asarray(got_h), np.asarray(want_h))
    # the rebuilt lanes serve the filtered lanes-flags path too
    assert km2._filtered_lanes_stats(8, f) is not None
    got_fh, got_ft = km2.get_kmer_group_counts(8, kmer_filter_func=f,
                                               max_counts_bin=25)
    assert got_ft == want_ft and np.array_equal(np.asarray(got_fh), np.asarray(want_fh))
