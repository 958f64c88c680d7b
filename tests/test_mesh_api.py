"""Mesh-parity of the Kmers query surface (round 2).

Pins the composed on-device pipeline — ``sort(mesh=)`` retains the ragged
sharded layout and every following mesh call reuses it without a second sort
— plus filtered mesh statistics and ``get_kmer_count(mesh=)``, all against
the single-chip engine (itself oracle-pinned elsewhere).
"""

import numpy as np
import pytest

import jax

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.kmers import (
    crispr_ngg_pam_filter,
    gen_kmer_gc_content_filter_func,
    gen_kmer_homopolymer_filter_func,
    gen_kmer_length_filter_func,
    gen_no_ambiguous_bases_filter,
)
from genome_kmers_tpu.parallel import make_mesh


def random_seq(n, seed, alphabet="ACGT"):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list(alphabet), size=n))


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def build(seq_list, min_k, max_k):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    return Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)


def _no_resort(monkeypatch):
    """Fail the test if anything runs a fresh sample sort."""
    import genome_kmers_tpu.parallel as par

    def boom(*a, **k):
        raise AssertionError("sample sort re-ran; mesh pipeline must reuse the layout")

    monkeypatch.setattr(par, "sample_sort_positions_ragged", boom)


LIB_FILTERS = [
    ("length", lambda k: gen_kmer_length_filter_func(k)),
    ("gc", lambda k: gen_kmer_gc_content_filter_func(0.25, 0.75, k)),
    ("homopolymer", lambda k: gen_kmer_homopolymer_filter_func(2, k)),
    ("noambig", lambda k: gen_no_ambiguous_bases_filter(k)),
]


class TestComposedPipeline:
    def test_sort_mesh_retains_layout_and_host_view(self, mesh8):
        seq_list = [("c1", random_seq(500, 11)), ("c2", random_seq(231, 12))]
        km_mesh = build(seq_list, 8, 8)
        km_chip = build(seq_list, 8, 8)
        km_mesh.sort(mesh=mesh8)
        km_chip.sort()
        assert km_mesh._dist_cache is not None
        assert len(km_mesh) == len(km_chip)
        assert np.array_equal(km_mesh.kmer_sba_start_indices, km_chip.kmer_sba_start_indices)

    def test_stats_reuse_layout_no_resort(self, mesh8, monkeypatch):
        seq_list = [("c1", random_seq(700, 21))]
        km_mesh = build(seq_list, 9, 9)
        km_chip = build(seq_list, 9, 9)
        km_mesh.sort(mesh=mesh8)
        km_chip.sort()
        _no_resort(monkeypatch)
        h_m, t_m = km_mesh.get_kmer_group_counts(9, max_counts_bin=30, mesh=mesh8)
        h_c, t_c = km_chip.get_kmer_group_counts(9, max_counts_bin=30)
        assert t_m == t_c and np.array_equal(h_m, h_c)
        assert km_mesh.get_kmer_count(9, mesh=mesh8) == km_chip.get_kmer_count(9)

    @pytest.mark.parametrize("name,make_filter", LIB_FILTERS)
    def test_filtered_stats_reuse_layout(self, mesh8, monkeypatch, name, make_filter):
        alphabet = "ACGTN" if name == "noambig" else "ACGT"
        seq_list = [("c1", random_seq(400, 31, alphabet)), ("c2", random_seq(177, 32, alphabet))]
        k = 6
        km_mesh = build(seq_list, k, k)
        km_chip = build(seq_list, k, k)
        km_mesh.sort(mesh=mesh8)
        km_chip.sort()
        _no_resort(monkeypatch)
        f = make_filter(k)
        for mgs, xgs in ((1, None), (2, 5)):
            h_m, t_m = km_mesh.get_kmer_group_counts(
                k, kmer_filter_func=f, min_group_size=mgs, max_group_size=xgs,
                max_counts_bin=25, mesh=mesh8,
            )
            h_c, t_c = km_chip.get_kmer_group_counts(
                k, kmer_filter_func=f, min_group_size=mgs, max_group_size=xgs,
                max_counts_bin=25,
            )
            assert t_m == t_c, (name, mgs, xgs)
            assert np.array_equal(h_m, h_c), (name, mgs, xgs)
        assert km_mesh.get_kmer_count(k, kmer_filter_func=f, mesh=mesh8) == (
            km_chip.get_kmer_count(k, kmer_filter_func=f)
        )
        # the mesh path served the mask from the retained sorted lanes
        # (lanes flags — no plane gather, so the plane cache stays empty);
        # filters without a lanes form would fall back to the plane
        cache = km_mesh._dist_cache
        lanes_dict = {
            "two_bit": cache.lanes_two_bit,
            "built_k": cache.built_k,
            "words": tuple(cache.lanes),
            "cap": None,
        }
        if f.lanes_spec(lanes_dict, len(km_mesh._host_sba()), k) is not None:
            assert not km_mesh._dc().filter_flags, name

    def test_crispr_filter_on_mesh(self, mesh8, monkeypatch):
        seq_list = [("c1", random_seq(900, 41))]
        km_mesh = build(seq_list, 23, 23)
        km_chip = build(seq_list, 23, 23)
        km_mesh.sort(mesh=mesh8)
        km_chip.sort()
        _no_resort(monkeypatch)
        h_m, t_m = km_mesh.get_kmer_group_counts(
            23, kmer_filter_func=crispr_ngg_pam_filter, max_counts_bin=10, mesh=mesh8
        )
        h_c, t_c = km_chip.get_kmer_group_counts(
            23, kmer_filter_func=crispr_ngg_pam_filter, max_counts_bin=10
        )
        assert t_m == t_c and np.array_equal(h_m, h_c)

    def test_count_queries_reuse_layout(self, mesh8, monkeypatch):
        seq = random_seq(650, 51)
        km = build([("c", seq)], 9, 9)
        km_chip = build([("c", seq)], 9, 9)
        km.sort(mesh=mesh8)
        km_chip.sort()
        _no_resort(monkeypatch)
        qs = [seq[i : i + 9] for i in (0, 77, 300)] + ["A" * 9]
        assert np.array_equal(km.count_queries(qs, mesh=mesh8), km_chip.count_queries(qs))

    def test_stats_reuse_lanes_shorter_k(self, mesh8, monkeypatch):
        # retained mesh lanes built at max_kmer_len serve stats at ANY
        # kmer_len <= built length (last word masked to kmer_len bases)
        seq_list = [("c1", random_seq(520, 22)), ("c2", random_seq(140, 23))]
        km_mesh = build(seq_list, 2, 11)
        km_chip = build(seq_list, 2, 11)
        km_mesh.sort(mesh=mesh8)
        km_chip.sort()
        assert km_mesh._dist_cache is not None and km_mesh._dist_cache.lanes
        _no_resort(monkeypatch)
        for k in (2, 5, 8, 11):
            h_m, t_m = km_mesh.get_kmer_group_counts(k, max_counts_bin=30, mesh=mesh8)
            h_c, t_c = km_chip.get_kmer_group_counts(k, max_counts_bin=30)
            assert t_m == t_c, k
            assert np.array_equal(h_m, h_c), k

    def test_stats_reuse_lanes_4bit(self, mesh8, monkeypatch):
        # ambiguous bases force the 4-bit encoding; lane reuse must hold there
        seq_list = [("c1", random_seq(430, 24, "ACGTN")), ("c2", random_seq(150, 25, "ACGTN"))]
        km_mesh = build(seq_list, 3, 10)
        km_chip = build(seq_list, 3, 10)
        km_mesh.sort(mesh=mesh8)
        km_chip.sort()
        cache = km_mesh._dist_cache
        assert cache is not None and cache.lanes and not cache.lanes_two_bit
        _no_resort(monkeypatch)
        for k in (3, 7, 10):
            h_m, t_m = km_mesh.get_kmer_group_counts(k, max_counts_bin=30, mesh=mesh8)
            h_c, t_c = km_chip.get_kmer_group_counts(k, max_counts_bin=30)
            assert t_m == t_c, k
            assert np.array_equal(h_m, h_c), k

    def test_sort_mesh_skips_4bit_pack_on_acgt(self, mesh8):
        km = build([("c", random_seq(300, 61))], 7, 7)
        dc = km.seq_coll.device_cache("forward")
        km.sort(mesh=mesh8)
        assert dc._packed is None, "4-bit pack must not be built on the 2-bit path"

    def test_arbitrary_callable_filter_redistributes(self, mesh8):
        # user callables can't vectorize; the mesh path falls back to host
        # survivor selection + redistribution, still exact
        seq_list = [("c", random_seq(160, 71))]
        k = 5
        km_mesh = build(seq_list, k, k)
        km_chip = build(seq_list, k, k)
        km_mesh.sort(mesh=mesh8)
        km_chip.sort()

        def odd_positions_only(sba, strand, idx):
            return idx % 2 == 1

        h_m, t_m = km_mesh.get_kmer_group_counts(
            k, kmer_filter_func=odd_positions_only, max_counts_bin=15, mesh=mesh8
        )
        h_c, t_c = km_chip.get_kmer_group_counts(
            k, kmer_filter_func=odd_positions_only, max_counts_bin=15
        )
        assert t_m == t_c and np.array_equal(h_m, h_c)


class TestMeshErrorParity:
    def test_filter_error_message_matches(self, mesh8):
        # truncated k-mers make the GC filter raise; mesh and single chip
        # must raise the same ValueError
        seq_list = [("c", random_seq(90, 81))]
        km_mesh = build(seq_list, 3, 8)
        km_chip = build(seq_list, 3, 8)
        km_mesh.sort(mesh=mesh8)
        km_chip.sort()
        f = gen_kmer_gc_content_filter_func(0.0, 1.0, 8)
        with pytest.raises(ValueError) as e_chip:
            km_chip.get_kmer_group_counts(8, kmer_filter_func=f, max_counts_bin=5)
        with pytest.raises(ValueError) as e_mesh:
            km_mesh.get_kmer_group_counts(8, kmer_filter_func=f, max_counts_bin=5, mesh=mesh8)
        assert str(e_chip.value) == str(e_mesh.value)

    def test_unsorted_mesh_count_raises(self, mesh8):
        km = build([("c", random_seq(100, 91))], 5, 5)
        with pytest.raises(NotImplementedError):
            km.get_kmer_count(5, mesh=mesh8)


class TestLoadedIndexRedistributes:
    def test_stats_without_retained_layout(self, mesh8):
        # a sorted index with no dist cache (e.g. single-chip sorted, or
        # loaded from disk) redistributes once and still matches
        seq_list = [("c1", random_seq(450, 95)), ("c2", random_seq(120, 96))]
        km = build(seq_list, 8, 8)
        km.sort()  # single-chip: no retained mesh layout
        h_c, t_c = km.get_kmer_group_counts(8, max_counts_bin=20)
        h_m, t_m = km.get_kmer_group_counts(8, max_counts_bin=20, mesh=mesh8)
        assert t_m == t_c and np.array_equal(h_m, h_c)
        f = gen_kmer_gc_content_filter_func(0.3, 0.7, 8)
        h_c2, t_c2 = km.get_kmer_group_counts(8, kmer_filter_func=f, max_counts_bin=20)
        h_m2, t_m2 = km.get_kmer_group_counts(
            8, kmer_filter_func=f, max_counts_bin=20, mesh=mesh8
        )
        assert t_m2 == t_c2 and np.array_equal(h_m2, h_c2)


class TestCanonicalMesh:
    @pytest.mark.parametrize("mn,mx,k", [(1, 8, 5), (4, 31, 31), (1, 20, 17)])
    def test_canonical_mesh_matches_single_chip(self, mesh8, mn, mx, k):
        seqs = [("r%d" % i, random_seq(n, 40 + i)) for i, n in enumerate((300, 75, 41))]
        km = build(seqs, mn, mx)
        assert km._init_geometry is not None
        want_h, want_t = km.get_canonical_kmer_group_counts(k, max_counts_bin=12)
        km2 = build(seqs, mn, mx)
        got_h, got_t = km2.get_canonical_kmer_group_counts(
            k, max_counts_bin=12, mesh=mesh8
        )
        np.testing.assert_array_equal(want_h, got_h)
        assert want_t == got_t

    def test_canonical_mesh_customized_positions(self, mesh8):
        # round 4: customized position sets take the gather canonical
        # sample sort (was NotImplementedError)
        rng = np.random.default_rng(40)
        km = build([("a", random_seq(300, 3)), ("b", random_seq(150, 4))], 1, 8)
        pos = km.kmer_sba_start_indices
        rng.shuffle(pos)
        keep = pos[: len(pos) * 2 // 3].copy()
        km.kmer_sba_start_indices = keep
        got_h, got_t = km.get_canonical_kmer_group_counts(
            5, max_counts_bin=12, mesh=mesh8
        )
        want_h, want_t = km.get_canonical_kmer_group_counts(5, max_counts_bin=12)
        np.testing.assert_array_equal(got_h, want_h)
        assert got_t == want_t

    def test_canonical_mesh_trivial_duplicates(self, mesh8):
        # AAAA / TTTT collapse to one canonical group across strands
        km = build([("a", "AAAATTTT")], 1, 4)
        h, t = km.get_canonical_kmer_group_counts(4, max_counts_bin=10, mesh=mesh8)
        h1, t1 = build([("a", "AAAATTTT")], 1, 4).get_canonical_kmer_group_counts(
            4, max_counts_bin=10
        )
        np.testing.assert_array_equal(h, h1)
        assert t == t1

    def test_count_queries_canonical_mesh(self, mesh8):
        seqs = [("a", random_seq(200, 77))]
        km = build(seqs, 6, 6)
        km.sort()
        queries = ["ACGTAC", "AAAAAA", "GCGCGC", random_seq(6, 5)]
        want = km.count_queries_canonical(queries)
        km2 = build(seqs, 6, 6)
        km2.sort(mesh=mesh8)
        got = km2.count_queries_canonical(queries, mesh=mesh8)
        np.testing.assert_array_equal(want, got)
