"""Multi-chip engine tests on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8, set in conftest.py).

The reference has no distributed tier at all (SURVEY.md §2); these tests pin
the new distributed sort/stats to exact parity with the single-chip engine
and the string oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.ops.keys import cap_lengths, compute_valid_len
from genome_kmers_tpu.ops.groups import group_size_histogram
from genome_kmers_tpu.ops.sort import adjacent_boundaries, sort_positions
from genome_kmers_tpu.parallel import (
    distributed_group_size_histogram,
    distributed_group_size_histogram_ragged,
    distributed_sort_positions,
    make_mesh,
    sample_sort_positions,
    sample_sort_positions_ragged,
)


def random_seq(n, seed, alphabet="ACGT"):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list(alphabet), size=n))


def setup_engine(seq_list, min_k, max_k):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    dc = sc.device_cache("forward")
    positions = jnp.asarray(km.kmer_sba_start_indices)
    valid_len = compute_valid_len(positions, dc.seg_starts, dc.seg_ends)
    cap = cap_lengths(valid_len, max_k)
    return km, dc, positions, cap


def caps_for(dc, positions, k):
    """Caps aligned with the given (possibly sorted) position order."""
    return cap_lengths(compute_valid_len(positions, dc.seg_starts, dc.seg_ends), k)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


class TestDistributedSort:
    @pytest.mark.parametrize("n_bp,k", [(200, 8), (503, 16), (1000, 31)])
    def test_matches_single_chip(self, mesh8, n_bp, k):
        seq_list = [("chr1", random_seq(n_bp, seed=n_bp))]
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(distributed_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8))
        assert np.array_equal(got, expected)

    def test_multi_record(self, mesh8):
        seq_list = [
            ("chr1", random_seq(150, 1)),
            ("chr2", random_seq(97, 2)),
            ("chr3", random_seq(211, 3)),
        ]
        k = 12
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(distributed_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8))
        assert np.array_equal(got, expected)

    def test_repetitive_genome(self, mesh8):
        # heavy ties: position tie-break must stay deterministic across shards
        seq_list = [("chr1", "ACGT" * 100)]
        k = 8
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(distributed_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8))
        assert np.array_equal(got, expected)

    def test_oracle_strings(self, mesh8):
        seq_list = [("chr1", random_seq(300, 9))]
        k = 5
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        got = np.asarray(distributed_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8))
        seq = seq_list[0][1]
        exp = sorted(seq[i : i + k] for i in range(len(seq) - k + 1))
        got_strs = [seq[p : p + k] for p in got]
        assert got_strs == exp

    def test_unsupported_k_raises(self, mesh8):
        seq_list = [("chr1", random_seq(100, 4))]
        km, dc, positions, cap = setup_engine(seq_list, 1, None)
        with pytest.raises(NotImplementedError):
            distributed_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, None, mesh8)

    @pytest.mark.parametrize("n_bp,k", [(300, 8), (777, 31)])
    def test_two_bit_path_matches(self, mesh8, n_bp, k):
        """ACGT-only genomes ride the 2-bit half-lane keys; output must stay
        identical to the 4-bit distributed path and the single-chip sort."""
        seq_list = [("chr1", random_seq(n_bp, seed=500 + n_bp))]
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        assert dc.packed2 is not None
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got4 = np.asarray(distributed_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8))
        got2 = np.asarray(
            distributed_sort_positions(None, positions, dc.seg_starts, dc.seg_ends, k, mesh8, packed2=dc.packed2)
        )
        assert np.array_equal(got4, expected)
        assert np.array_equal(got2, expected)

    def test_two_bit_short_records_cap_ties(self, mesh8):
        """Records shorter than k force truncated k-mers: the 2-bit cap lane
        must order shorter-prefix-equal k-mers first, matching 4-bit."""
        seq_list = [("r%d" % i, "A" * (3 + i % 5)) for i in range(40)]
        k = 8
        km, dc, positions, cap = setup_engine(seq_list, 2, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got2 = np.asarray(
            distributed_sort_positions(None, positions, dc.seg_starts, dc.seg_ends, k, mesh8, packed2=dc.packed2)
        )
        assert np.array_equal(got2, expected)

    @pytest.mark.parametrize("n_dev", [2, 4])
    def test_smaller_meshes(self, n_dev):
        mesh = make_mesh(n_dev)
        seq_list = [("chr1", random_seq(137, n_dev))]
        k = 8
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(distributed_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh))
        assert np.array_equal(got, expected)


class TestSampleSort:
    """Splitter-based all-to-all sample sort (parallel/sample_sort.py) —
    exact parity with the single-chip sort, including fully degenerate key
    distributions (splitters partition on unique (key, position) rows)."""

    @pytest.mark.parametrize("n_bp,k", [(200, 8), (503, 16), (1000, 31), (4096, 31)])
    def test_matches_single_chip(self, mesh8, n_bp, k):
        seq_list = [("chr1", random_seq(n_bp, seed=3000 + n_bp))]
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(
            sample_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8)
        )
        assert np.array_equal(got, expected)

    def test_all_equal_keys_balanced(self, mesh8):
        # all-'A' genome: every key identical — position uniqueness must keep
        # the partition exact (no overflow, no loss)
        seq_list = [("chr1", "A" * 700)]
        k = 4
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(
            sample_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8)
        )
        assert np.array_equal(got, expected)

    def test_two_bit(self, mesh8):
        seq_list = [("chr1", random_seq(900, 41)), ("chr2", random_seq(333, 42))]
        k = 21
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(
            sample_sort_positions(
                None, positions, dc.seg_starts, dc.seg_ends, k, mesh8, packed2=dc.packed2
            )
        )
        assert np.array_equal(got, expected)

    def test_short_records_cap_ties(self, mesh8):
        seq_list = [("r%d" % i, "AC" * (2 + i % 4)) for i in range(30)]
        k = 8
        km, dc, positions, cap = setup_engine(seq_list, 2, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(
            sample_sort_positions(
                None, positions, dc.seg_starts, dc.seg_ends, k, mesh8, packed2=dc.packed2
            )
        )
        assert np.array_equal(got, expected)

    def test_k55_two_bit(self, mesh8):
        """BASELINE config 5's k=55 rides the extended (k<=64) 2-bit path."""
        seq_list = [("chr1", random_seq(800, 550))]
        k = 55
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k, packed2=dc.packed2))
        # cross-check against the 4-bit refinement truth
        truth = np.asarray(sort_positions(dc.packed, positions, cap, k))
        assert np.array_equal(expected, truth)
        got = np.asarray(
            sample_sort_positions(
                None, positions, dc.seg_starts, dc.seg_ends, k, mesh8, packed2=dc.packed2
            )
        )
        assert np.array_equal(got, truth)

    def test_uniform_cap_lane_drop(self, mesh8):
        """min_kmer_len == max_kmer_len drops the cap key lane; output must
        stay identical."""
        seq_list = [("chr1", random_seq(600, 91)), ("chr2", random_seq(201, 92))]
        k = 16
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(
            sample_sort_positions(
                None, positions, dc.seg_starts, dc.seg_ends, k, mesh8,
                packed2=dc.packed2, uniform_cap=True,
            )
        )
        assert np.array_equal(got, expected)

    def test_overflow_retry(self, mesh8):
        # absurdly small capacity factor forces the retry-with-larger-capacity
        # path; result must still be exact
        seq_list = [("chr1", random_seq(512, 77))]
        k = 8
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(
            sample_sort_positions(
                dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8,
                n_samples=4, capacity_factor=0.05,
            )
        )
        assert np.array_equal(got, expected)

    @pytest.mark.parametrize("n_dev", [1, 2, 4])
    def test_smaller_meshes(self, n_dev):
        mesh = make_mesh(n_dev)
        seq_list = [("chr1", random_seq(241, 60 + n_dev))]
        k = 8
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(
            sample_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh)
        )
        assert np.array_equal(got, expected)

    def test_fewer_kmers_than_devices(self, mesh8):
        seq_list = [("c", "ACGTACG")]
        k = 4
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        expected = np.asarray(sort_positions(dc.packed, positions, cap, k))
        got = np.asarray(
            sample_sort_positions(dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8)
        )
        assert np.array_equal(got, expected)


class TestKmersMeshSort:
    def test_sort_with_mesh_end_to_end(self, mesh8):
        """Kmers.sort(mesh=...) must produce the identical index and support
        the full downstream query surface."""
        seq_list = [("chr1", random_seq(400, 123)), ("chr2", random_seq(177, 124))]
        sc1 = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km1 = Kmers(sc1, min_kmer_len=8, max_kmer_len=8)
        km1.sort()
        sc2 = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km2 = Kmers(sc2, min_kmer_len=8, max_kmer_len=8)
        km2.sort(mesh=mesh8)
        assert np.array_equal(km1.kmer_sba_start_indices, km2.kmer_sba_start_indices)
        assert km2.get_kmer_count(8) == km1.get_kmer_count(8)
        h1, t1 = km1.get_kmer_group_counts(8, max_counts_bin=10)
        h2, t2 = km2.get_kmer_group_counts(8, max_counts_bin=10)
        assert t1 == t2 and np.array_equal(h1, h2)


class TestDistributedGroupStats:
    @pytest.mark.parametrize("n_bp,k", [(200, 4), (513, 8), (300, 2)])
    def test_histogram_matches_single_chip(self, mesh8, n_bp, k):
        seq_list = [("chr1", random_seq(n_bp, seed=77 + n_bp))]
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        sorted_pos = sort_positions(dc.packed, positions, cap, k)
        boundary = adjacent_boundaries(dc.packed, sorted_pos, caps_for(dc, sorted_pos, k), k)
        from genome_kmers_tpu.ops.groups import group_geometry

        _, _, size, _ = group_geometry(boundary)
        exp_counts, exp_total = group_size_histogram(
            boundary, size, jnp.uint32(1), jnp.uint32(0xFFFFFFF0), max_counts_bin=50
        )
        got_counts, got_total = distributed_group_size_histogram(
            dc.packed, sorted_pos, dc.seg_starts, dc.seg_ends, k, mesh8, max_counts_bin=50
        )
        assert int(got_total) == int(exp_total)
        assert np.array_equal(np.asarray(got_counts), np.asarray(exp_counts))

    def test_group_spanning_many_shards(self, mesh8):
        # one giant group spanning every shard: 'A'*500, k=1
        seq_list = [("chr1", "A" * 500)]
        k = 1
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        sorted_pos = sort_positions(dc.packed, positions, cap, k)
        counts, total = distributed_group_size_histogram(
            dc.packed, sorted_pos, dc.seg_starts, dc.seg_ends, k, mesh8, max_counts_bin=600
        )
        assert int(total) == 500
        assert int(np.asarray(counts)[500]) == 1

    @pytest.mark.parametrize("n_bp,k,mgs,xgs", [(333, 4, 1, None), (801, 8, 2, 6)])
    def test_full_device_pipeline_ragged(self, mesh8, n_bp, k, mgs, xgs):
        """sample sort (ragged device output) -> ragged stats, never leaving
        the mesh; must equal the single-chip histogram exactly."""
        seq_list = [("chr1", random_seq(n_bp, seed=n_bp * 3))]
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        # single-chip truth
        sorted_pos = sort_positions(dc.packed, positions, cap, k)
        boundary = adjacent_boundaries(dc.packed, sorted_pos, caps_for(dc, sorted_pos, k), k)
        from genome_kmers_tpu.ops.groups import group_geometry

        _, _, size, _ = group_geometry(boundary)
        exp_counts, exp_total = group_size_histogram(
            boundary, size, jnp.uint32(mgs),
            jnp.uint32(xgs) if xgs else jnp.uint32(0xFFFFFFF0), max_counts_bin=40,
        )
        # device pipeline
        rag_pos, rag_pad = sample_sort_positions_ragged(
            dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8
        )
        got_counts, got_total = distributed_group_size_histogram_ragged(
            dc.packed, rag_pos, rag_pad, dc.seg_starts, dc.seg_ends, k, mesh8,
            min_group_size=mgs, max_group_size=xgs, max_counts_bin=40,
        )
        assert int(got_total) == int(exp_total)
        assert np.array_equal(np.asarray(got_counts), np.asarray(exp_counts))

    def test_ragged_giant_group_spans_shards(self, mesh8):
        seq_list = [("chr1", "A" * 431)]
        k = 2
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        rag_pos, rag_pad = sample_sort_positions_ragged(
            dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8
        )
        counts, total = distributed_group_size_histogram_ragged(
            dc.packed, rag_pos, rag_pad, dc.seg_starts, dc.seg_ends, k, mesh8,
            max_counts_bin=600,
        )
        assert int(total) == 430
        assert int(np.asarray(counts)[430]) == 1

    def test_two_bit_histogram_matches(self, mesh8):
        seq_list = [("chr1", random_seq(400, 31))] + [("s%d" % i, "AC" * 3) for i in range(5)]
        k = 4
        km, dc, positions, cap = setup_engine(seq_list, 2, k)
        sorted_pos = sort_positions(dc.packed, positions, cap, k)
        exp_counts, exp_total = distributed_group_size_histogram(
            dc.packed, sorted_pos, dc.seg_starts, dc.seg_ends, k, mesh8, max_counts_bin=40
        )
        got_counts, got_total = distributed_group_size_histogram(
            None, sorted_pos, dc.seg_starts, dc.seg_ends, k, mesh8, max_counts_bin=40, packed2=dc.packed2
        )
        assert int(got_total) == int(exp_total)
        assert np.array_equal(np.asarray(got_counts), np.asarray(exp_counts))

    def test_bounds_filtering(self, mesh8):
        seq_list = [("chr1", random_seq(400, 55))]
        k = 3
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        sorted_pos = sort_positions(dc.packed, positions, cap, k)
        boundary = adjacent_boundaries(dc.packed, sorted_pos, caps_for(dc, sorted_pos, k), k)
        from genome_kmers_tpu.ops.groups import group_geometry

        _, _, size, _ = group_geometry(boundary)
        exp_counts, exp_total = group_size_histogram(
            boundary, size, jnp.uint32(2), jnp.uint32(9), max_counts_bin=20
        )
        got_counts, got_total = distributed_group_size_histogram(
            dc.packed, sorted_pos, dc.seg_starts, dc.seg_ends, k, mesh8,
            min_group_size=2, max_group_size=9, max_counts_bin=20,
        )
        assert int(got_total) == int(exp_total)
        assert np.array_equal(np.asarray(got_counts), np.asarray(exp_counts))


class TestDistributedQueries:
    def test_counts_match_single_chip(self, mesh8):
        seq_list = [("chr1", random_seq(700, 201)), ("chr2", random_seq(260, 202))]
        k = 8
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        rag_pos, rag_pad = sample_sort_positions_ragged(
            dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8
        )
        rng = np.random.default_rng(7)
        seqs = [s for _, s in seq_list]
        queries = [seqs[0][i : i + k] for i in rng.integers(0, len(seqs[0]) - k, size=6)]
        queries += ["A" * k, "ACGTACGT"]
        from genome_kmers_tpu.parallel import distributed_count_queries

        got = distributed_count_queries(
            dc.packed, rag_pos, rag_pad, dc.seg_starts, dc.seg_ends, queries, k, mesh8
        )
        # single-chip truth
        km.sort()
        exp = km.count_queries(queries, k)
        assert np.array_equal(got, exp), queries

    def test_iupac_genome(self, mesh8):
        seq_list = [("c", random_seq(500, 300, alphabet="ACGTN"))]
        k = 4
        km, dc, positions, cap = setup_engine(seq_list, k, k)
        rag_pos, rag_pad = sample_sort_positions_ragged(
            dc.packed, positions, dc.seg_starts, dc.seg_ends, k, mesh8
        )
        from genome_kmers_tpu.parallel import distributed_count_queries

        queries = ["ACGT", "NNNN", "ANGT"]
        got = distributed_count_queries(
            dc.packed, rag_pos, rag_pad, dc.seg_starts, dc.seg_ends, queries, k, mesh8
        )
        km.sort()
        exp = km.count_queries(queries, k)
        assert np.array_equal(got, exp)


class TestKmersMeshStats:
    def test_group_counts_with_mesh(self, mesh8):
        seq_list = [("chr1", random_seq(600, 401)), ("chr2", random_seq(211, 402))]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=6, max_kmer_len=6)
        km.sort()
        h1, t1 = km.get_kmer_group_counts(6, max_counts_bin=20)
        h2, t2 = km.get_kmer_group_counts(6, max_counts_bin=20, mesh=mesh8)
        assert t1 == t2 and np.array_equal(h1, h2)
        # with group-size bounds
        h3, t3 = km.get_kmer_group_counts(6, min_group_size=2, max_counts_bin=20)
        h4, t4 = km.get_kmer_group_counts(6, min_group_size=2, max_counts_bin=20, mesh=mesh8)
        assert t3 == t4 and np.array_equal(h3, h4)

    def test_group_counts_mesh_with_filter(self, mesh8):
        # filters are supported on the mesh path (round 2); exact parity
        from genome_kmers_tpu import gen_no_ambiguous_bases_filter

        sc = SequenceCollection(sequence_list=[("c", random_seq(100, 403, "ACGTN"))],
                                strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
        km.sort()
        f = gen_no_ambiguous_bases_filter(4)
        h1, t1 = km.get_kmer_group_counts(4, kmer_filter_func=f, max_counts_bin=20)
        h2, t2 = km.get_kmer_group_counts(4, kmer_filter_func=f, max_counts_bin=20,
                                          mesh=mesh8)
        assert t1 == t2 and np.array_equal(h1, h2)

    def test_count_queries_with_mesh(self, mesh8):
        seq = random_seq(777, 405)
        sc = SequenceCollection(sequence_list=[("c", seq)], strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=9, max_kmer_len=9)
        km.sort()
        qs = [seq[i : i + 9] for i in (3, 100, 500)] + ["A" * 9]
        single = km.count_queries(qs)
        meshed = km.count_queries(qs, mesh=mesh8)
        assert np.array_equal(single, meshed)


class TestUnboundedDistributedSort:
    """Suffix-mode (max_kmer_len=None) sample sort with distributed
    refinement rounds vs the single-chip iterative refinement truth."""

    def _truth(self, seq_list, min_k):
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=None)
        dc = sc.device_cache("forward")
        pos = jnp.asarray(km.kmer_sba_start_indices)
        cap = caps_for(dc, pos, None)
        return km, dc, pos, np.asarray(sort_positions(dc.packed, pos, cap, None))

    def test_long_repeats_multi_round(self, mesh8):
        from genome_kmers_tpu.parallel import sample_sort_positions_unbounded

        base = random_seq(50, 901)
        seq = base + base + random_seq(120, 902) + base  # 50-base repeats: 2 rounds
        km, dc, pos, truth = self._truth([("chr1", seq)], 1)
        got = np.asarray(sample_sort_positions_unbounded(
            dc.packed, pos, dc.seg_starts, dc.seg_ends, mesh8))
        assert np.array_equal(got, truth)
        got2 = np.asarray(sample_sort_positions_unbounded(
            None, pos, dc.seg_starts, dc.seg_ends, mesh8, packed2=dc.packed2))
        assert np.array_equal(got2, truth)

    def test_multi_record_short_suffixes(self, mesh8):
        from genome_kmers_tpu.parallel import sample_sort_positions_unbounded

        rep = random_seq(40, 903)
        seq_list = [("a", rep + rep), ("b", rep[:20]), ("c", random_seq(77, 904))]
        km, dc, pos, truth = self._truth(seq_list, 1)
        got = np.asarray(sample_sort_positions_unbounded(
            dc.packed, pos, dc.seg_starts, dc.seg_ends, mesh8))
        assert np.array_equal(got, truth)

    def test_iupac_genome(self, mesh8):
        from genome_kmers_tpu.parallel import sample_sort_positions_unbounded

        seq = random_seq(300, 905, alphabet="ACGTN")
        km, dc, pos, truth = self._truth([("c", seq)], 2)
        got = np.asarray(sample_sort_positions_unbounded(
            dc.packed, pos, dc.seg_starts, dc.seg_ends, mesh8))
        assert np.array_equal(got, truth)

    def test_kmers_sort_mesh_unbounded(self, mesh8):
        seq = "ACGTAC" * 30 + random_seq(100, 906)
        sc1 = SequenceCollection(sequence_list=[("c", seq)], strands_to_load="forward")
        km1 = Kmers(sc1, min_kmer_len=2, max_kmer_len=None)
        km1.sort()
        sc2 = SequenceCollection(sequence_list=[("c", seq)], strands_to_load="forward")
        km2 = Kmers(sc2, min_kmer_len=2, max_kmer_len=None)
        km2.sort(mesh=mesh8)
        assert np.array_equal(km1.kmer_sba_start_indices, km2.kmer_sba_start_indices)

    def test_all_identical_suffix_heavy(self, mesh8):
        from genome_kmers_tpu.parallel import sample_sort_positions_unbounded

        seq = "A" * 200  # every suffix a prefix of the next: maximal tie depth
        km, dc, pos, truth = self._truth([("c", seq)], 1)
        got = np.asarray(sample_sort_positions_unbounded(
            dc.packed, pos, dc.seg_starts, dc.seg_ends, mesh8))
        assert np.array_equal(got, truth)


class TestLongBoundedDistributed:
    def test_k40_iupac_refinement(self, mesh8):
        # 4-bit one-window limit is 32; k=40 takes the refinement rounds
        seq_list = [("c", random_seq(400, 910, alphabet="ACGTN"))]
        km, dc, positions, cap = setup_engine(seq_list, 2, 40)
        truth = np.asarray(sort_positions(dc.packed, positions, cap, 40))
        got = np.asarray(sample_sort_positions(
            dc.packed, positions, dc.seg_starts, dc.seg_ends, 40, mesh8))
        assert np.array_equal(got, truth)

    def test_k70_acgt_refinement(self, mesh8):
        base = random_seq(80, 911)
        seq_list = [("c", base + base + random_seq(150, 912))]
        km, dc, positions, cap = setup_engine(seq_list, 2, 70)
        truth = np.asarray(sort_positions(dc.packed, positions, cap, 70))
        got = np.asarray(sample_sort_positions(
            dc.packed, positions, dc.seg_starts, dc.seg_ends, 70, mesh8,
            packed2=dc.packed2))
        assert np.array_equal(got, truth)

    def test_kmers_mesh_sort_k70(self, mesh8):
        seq = random_seq(300, 913)
        sc1 = SequenceCollection(sequence_list=[("c", seq)], strands_to_load="forward")
        km1 = Kmers(sc1, min_kmer_len=3, max_kmer_len=70); km1.sort()
        sc2 = SequenceCollection(sequence_list=[("c", seq)], strands_to_load="forward")
        km2 = Kmers(sc2, min_kmer_len=3, max_kmer_len=70); km2.sort(mesh=mesh8)
        assert np.array_equal(km1.kmer_sba_start_indices, km2.kmer_sba_start_indices)
