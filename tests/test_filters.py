"""Filter tests: scalar parity, vectorized batch-mask parity, error behavior,
and filter/group-walk interaction (reference tests/test_kmers.py:2063-2437,
including permutation sweeps).
"""

import numpy as np
import pytest

from genome_kmers_tpu import (
    Kmers,
    SequenceCollection,
    crispr_ngg_pam_filter,
    gen_kmer_gc_content_filter_func,
    gen_kmer_homopolymer_filter_func,
    gen_kmer_length_filter_func,
    gen_no_ambiguous_bases_filter,
    kmer_has_required_len,
)
from oracle import expected_groups, expected_kmers


def _sba(s):
    return np.frombuffer(s.encode(), dtype=np.uint8).copy()


def all_4mers():
    """All 256 ACGT 4-mers, one record each (single engine run covers every
    composition — the vectorized analog of the reference's permutation sweeps,
    tests/test_kmers.py:2147-2164)."""
    bases = "ACGT"
    out = []
    i = 0
    for a in bases:
        for b in bases:
            for c in bases:
                for d in bases:
                    out.append((f"r{i}", a + b + c + d))
                    i += 1
    return out


def brute_gc_ok(kmer, min_frac, max_frac):
    import math

    k = len(kmer)
    lo = math.ceil(k * min_frac)
    hi = math.floor(k * max_frac)
    gc = sum(1 for ch in kmer if ch in "GC")
    return lo <= gc <= hi


def brute_homopolymer_ok(kmer, max_h):
    run = 1
    best = 1
    for i in range(1, len(kmer)):
        if kmer[i] == kmer[i - 1]:
            run += 1
        else:
            run = 1
        best = max(best, run)
    return best <= max_h


# --------------------------------------------------------------------------- #
# kmer_has_required_len
# --------------------------------------------------------------------------- #


class TestKmerHasRequiredLen:
    def test_basic(self):
        sba = _sba("ATCG$GG")
        assert kmer_has_required_len(sba, 0, 4)
        assert not kmer_has_required_len(sba, 1, 4)
        assert kmer_has_required_len(sba, 5, 2)
        assert not kmer_has_required_len(sba, 5, 3)  # runs off array end
        assert not kmer_has_required_len(sba, 4, 1)  # starts on '$'
        assert kmer_has_required_len(sba, 0, 0)


# --------------------------------------------------------------------------- #
# length filter
# --------------------------------------------------------------------------- #


class TestLengthFilter:
    def test_scalar(self):
        sba = _sba("ATCG$GG")
        f = gen_kmer_length_filter_func(3)
        assert f(sba, "forward", 0)
        assert f(sba, "forward", 1)
        assert not f(sba, "forward", 2)
        assert not f(sba, "forward", 5)

    def test_through_get_kmers(self):
        # min_kmer_len=1 gives every position; length filter >= 3 drops the
        # last two positions of each record
        sc = SequenceCollection(sequence_list=[("chr1", "ATCGA"), ("chr2", "GGTT")],
                                strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=1)
        km.sort()
        f = gen_kmer_length_filter_func(3)
        got = list(km.get_kmers(None, kmer_filter_func=f))
        # surviving positions: records contribute len-2 positions each
        assert len(got) == (5 - 2) + (4 - 2)


# --------------------------------------------------------------------------- #
# GC content filter
# --------------------------------------------------------------------------- #


class TestGcFilter:
    def test_ctor_validation(self):
        with pytest.raises(ValueError):
            gen_kmer_gc_content_filter_func(0.6, 0.4, 4)
        with pytest.raises(ValueError):
            gen_kmer_gc_content_filter_func(-0.1, 0.5, 4)
        with pytest.raises(ValueError):
            gen_kmer_gc_content_filter_func(0.0, 1.5, 4)

    @pytest.mark.parametrize("min_frac,max_frac", [(0.0, 1.0), (0.25, 0.75), (0.5, 0.5), (0.4, 0.6)])
    def test_all_4mer_compositions(self, min_frac, max_frac):
        seq_list = all_4mers()
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
        km.sort()
        f = gen_kmer_gc_content_filter_func(min_frac, max_frac, 4)
        # scalar parity on every position
        sba = sc.forward_sba
        for pos in km.kmer_sba_start_indices:
            kmer = bytearray(sba[pos : pos + 4]).decode()
            assert f(sba, "forward", int(pos)) == brute_gc_ok(kmer, min_frac, max_frac)
        # vectorized parity through get_kmers
        _, _, sorted_kmers, _ = expected_kmers(seq_list, 4, 4)
        exp = expected_groups(
            sorted_kmers, 4, keep=lambda i: brute_gc_ok(sorted_kmers[i], min_frac, max_frac)
        )
        got = list(km.get_kmers(4, kmer_filter_func=f))
        assert len(got) == len(exp)
        assert [g[1:] for g in got] == [e[1:] for e in exp]

    def test_impossible_range_short_circuits(self):
        # ceil(4*0.3)=2 > floor(4*0.4)=1 -> always False, no SBA access
        f = gen_kmer_gc_content_filter_func(0.3, 0.4, 4)
        sba = _sba("GCGC")
        assert not f(sba, "forward", 0)

    def test_truncated_kmer_raises(self):
        f = gen_kmer_gc_content_filter_func(0.0, 1.0, 4)
        sba = _sba("AT$ATCG")
        with pytest.raises(ValueError):
            f(sba, "forward", 0)

    def test_exceed_before_truncation_returns_false(self):
        # GC count exceeds max before reaching '$' -> False, not raise
        # (reference kmers.py:176-185)
        f = gen_kmer_gc_content_filter_func(0.0, 0.25, 4)
        sba = _sba("GGC$ATCG")
        assert not f(sba, "forward", 0)


# --------------------------------------------------------------------------- #
# homopolymer filter
# --------------------------------------------------------------------------- #


class TestHomopolymerFilter:
    def test_ctor_validation(self):
        with pytest.raises(ValueError):
            gen_kmer_homopolymer_filter_func(0, 4)
        with pytest.raises(ValueError):
            gen_kmer_homopolymer_filter_func(2, 0)

    @pytest.mark.parametrize("max_h", [1, 2, 3])
    def test_all_4mer_compositions(self, max_h):
        seq_list = all_4mers()
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
        km.sort()
        f = gen_kmer_homopolymer_filter_func(max_h, 4)
        sba = sc.forward_sba
        for pos in km.kmer_sba_start_indices:
            kmer = bytearray(sba[pos : pos + 4]).decode()
            assert f(sba, "forward", int(pos)) == brute_homopolymer_ok(kmer, max_h), kmer
        _, _, sorted_kmers, _ = expected_kmers(seq_list, 4, 4)
        exp = expected_groups(
            sorted_kmers, 4, keep=lambda i: brute_homopolymer_ok(sorted_kmers[i], max_h)
        )
        got = list(km.get_kmers(4, kmer_filter_func=f))
        assert [g[1:] for g in got] == [e[1:] for e in exp]

    def test_short_kmer_true_before_dollar_check(self):
        # kmer_len < max_homopolymer_size returns True without probing '$'
        # (reference kmers.py:66-74)
        f = gen_kmer_homopolymer_filter_func(5, 3)
        sba = _sba("AT$GGGG")
        assert f(sba, "forward", 0)

    def test_overflow_raises(self):
        f = gen_kmer_homopolymer_filter_func(2, 4)
        sba = _sba("AT$ATCG")
        with pytest.raises(ValueError):
            f(sba, "forward", 0)  # '$' inside window
        with pytest.raises(ValueError):
            f(sba, "forward", 5)  # runs off array end


# --------------------------------------------------------------------------- #
# no-ambiguous-bases filter
# --------------------------------------------------------------------------- #


class TestNoAmbiguousFilter:
    def test_scalar(self):
        f = gen_no_ambiguous_bases_filter(3)
        sba = _sba("ACGNACG")
        assert not f(sba, "forward", 1)  # covers N
        assert not f(sba, "forward", 3)
        assert f(sba, "forward", 4)
        assert f(sba, "forward", 0) is False or f(sba, "forward", 0) is True  # no raise

    def test_dollar_raises_but_ambiguous_first_returns_false(self):
        f = gen_no_ambiguous_bases_filter(4)
        with pytest.raises(ValueError):
            f(_sba("ACG$AAAA"), "forward", 1)
        # N occurs before '$' -> False without raising (reference kmers.py:216-227)
        assert not f(_sba("AN$AAAA"), "forward", 0)

    def test_beyond_array_end_raises(self):
        f = gen_no_ambiguous_bases_filter(4)
        with pytest.raises(ValueError):
            f(_sba("ACG"), "forward", 0)

    def test_through_get_kmers(self):
        seq_list = [("chr1", "ACGTNACGTNAC")]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
        km.sort()
        f = gen_no_ambiguous_bases_filter(3)
        _, _, sorted_kmers, _ = expected_kmers(seq_list, 3, 3)
        exp = expected_groups(
            sorted_kmers, 3, keep=lambda i: "N" not in sorted_kmers[i][:3]
        )
        got = list(km.get_kmers(3, kmer_filter_func=f))
        assert [g[1:] for g in got] == [e[1:] for e in exp]
        assert all(
            "N" not in km.get_kmer_str(g[0], 3) for g in got
        )


# --------------------------------------------------------------------------- #
# CRISPR NGG PAM filter
# --------------------------------------------------------------------------- #


class TestCrisprPamFilter:
    def test_scalar(self):
        # 23-mer guide: positions +21,+22 must be G
        seq = "A" * 21 + "GG" + "C" * 5
        sba = _sba(seq)
        assert crispr_ngg_pam_filter(sba, "forward", 0)
        assert not crispr_ngg_pam_filter(sba, "forward", 1)

    def test_overflow_raises(self):
        sba = _sba("A" * 22)
        with pytest.raises(ValueError):
            crispr_ngg_pam_filter(sba, "forward", 0)

    def test_through_get_kmers(self):
        rng = np.random.default_rng(7)
        seq = "".join(rng.choice(list("ACGT"), size=120))
        seq_list = [("chr1", seq)]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=23, max_kmer_len=23)
        km.sort()
        _, _, sorted_kmers, _ = expected_kmers(seq_list, 23, 23)
        exp = expected_groups(
            sorted_kmers,
            23,
            keep=lambda i: sorted_kmers[i][21] == "G" and sorted_kmers[i][22] == "G",
        )
        got = list(km.get_kmers(23, kmer_filter_func=crispr_ngg_pam_filter))
        assert [g[1:] for g in got] == [e[1:] for e in exp]
        for g in got:
            assert km.get_kmer_str(g[0], 23).endswith("GG")


# --------------------------------------------------------------------------- #
# filters change group segmentation (compare-to-previous-SURVIVOR semantics)
# --------------------------------------------------------------------------- #


def test_filter_groups_count_only_survivors():
    """Group sizes count surviving k-mers only (SURVEY.md gotcha 4): with the
    no-ambiguous filter, N-containing k-mers between two equal survivors must
    not split or inflate their group."""
    seq_list = [("chr1", "ACGTTACGTTNACGTT")]
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
    km.sort()
    f = gen_no_ambiguous_bases_filter(4)
    _, _, sorted_kmers, _ = expected_kmers(seq_list, 4, 4)
    exp = expected_groups(sorted_kmers, 4, keep=lambda i: "N" not in sorted_kmers[i][:4])
    got = list(km.get_kmers(4, kmer_filter_func=f))
    assert [g[1:] for g in got] == [e[1:] for e in exp]
    # ACGT appears 3 times -> one group of 3 among survivors
    strs = [km.get_kmer_str(g[0], 4) for g in got]
    assert strs.count("ACGT") == 3
    sizes = {s: t for (k, y, t), s in zip(got, strs)}
    assert sizes["ACGT"] == 3


def test_custom_callable_filter_fallback():
    """Arbitrary user callables take the host fallback path and must agree
    with the vectorized engine's keep-all result."""
    sc = SequenceCollection(sequence_list=[("chr1", "ATCGAATTAG")], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
    km.sort()

    def keep_starting_with_A(sba, sba_strand, idx):
        return sba[idx] == ord("A")

    got = list(km.get_kmers(3, kmer_filter_func=keep_starting_with_A))
    for g in got:
        assert km.get_kmer_str(g[0], 3).startswith("A")
    n_a = sum(
        1 for i in range(len(km)) if km.get_kmer_str(i, 3).startswith("A")
    )
    assert len(got) == n_a


class TestVectorizedFilter:
    """EXTENSION: VectorizedFilter routes a custom mask through the
    vectorized engine (and the mesh path) instead of the scalar host loop."""

    def _km(self):
        from genome_kmers_tpu import Kmers, SequenceCollection

        sc = SequenceCollection(
            sequence_list=[("a", "ACGTAAGGCCATTA"), ("b", "GGATCCAAGTT")],
            strands_to_load="forward",
        )
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
        km.sort()
        return km

    def test_matches_scalar_equivalent(self):
        import jax.numpy as jnp
        from genome_kmers_tpu.ops.filters import VectorizedFilter

        km = self._km()

        def scalar_first_a(sba, sba_strand, idx):
            return sba[idx] == ord("A")

        vec = VectorizedFilter(
            lambda sba, pos, vl: jnp.take(sba, pos.astype(jnp.int32)) == ord("A")
        )
        assert km.get_kmer_count(3, kmer_filter_func=vec) == km.get_kmer_count(
            3, kmer_filter_func=scalar_first_a
        )
        c1, t1 = km.get_kmer_group_counts(3, kmer_filter_func=vec)
        c2, t2 = km.get_kmer_group_counts(3, kmer_filter_func=scalar_first_a)
        assert t1 == t2 and np.array_equal(np.asarray(c1), np.asarray(c2))

    def test_scalar_call_and_scalar_fn(self):
        import jax.numpy as jnp
        from genome_kmers_tpu.ops.filters import VectorizedFilter

        km = self._km()
        sba = km.seq_coll.forward_sba
        vec = VectorizedFilter(
            lambda s, pos, vl: jnp.take(s, pos.astype(jnp.int32)) == ord("A")
        )
        assert vec(sba, "forward", 0) is True   # 'A'
        assert vec(sba, "forward", 1) is False  # 'C'
        vec2 = VectorizedFilter(
            lambda s, pos, vl: jnp.zeros(pos.shape[0], dtype=bool),
            scalar_fn=lambda s, st, i: True,
        )
        assert vec2(sba, "forward", 0) is True  # scalar_fn wins for __call__

    def test_check_fn_raises(self):
        import jax.numpy as jnp
        from genome_kmers_tpu.ops.filters import VectorizedFilter

        km = self._km()

        def boom(ctx):
            raise ValueError("custom check failed")

        vec = VectorizedFilter(
            lambda s, pos, vl: jnp.ones(pos.shape[0], dtype=bool), check_fn=boom
        )
        with pytest.raises(ValueError, match="custom check failed"):
            km.get_kmer_count(3, kmer_filter_func=vec)

    def test_mesh_path(self):
        import jax.numpy as jnp
        from genome_kmers_tpu.ops.filters import VectorizedFilter
        from genome_kmers_tpu.parallel import make_mesh

        km = self._km()
        vec = VectorizedFilter(
            lambda s, pos, vl: jnp.take(s, pos.astype(jnp.int32)) == ord("A")
        )
        mesh = make_mesh(8)
        c0, t0 = km.get_kmer_group_counts(3, kmer_filter_func=vec)
        km.sort(mesh=mesh)  # retained layout path
        c1, t1 = km.get_kmer_group_counts(3, kmer_filter_func=vec, mesh=mesh)
        assert t1 == t0 and np.array_equal(np.asarray(c1), np.asarray(c0))

    def test_init_time_use(self):
        import jax.numpy as jnp
        from genome_kmers_tpu import Kmers, SequenceCollection
        from genome_kmers_tpu.ops.filters import VectorizedFilter

        sc = SequenceCollection(
            sequence_list=[("a", "ACGTAAGGCCATTA")], strands_to_load="forward"
        )
        vec = VectorizedFilter(
            lambda s, pos, vl: jnp.take(s, pos.astype(jnp.int32)) == ord("A")
        )
        km = Kmers.from_strand(sc, min_kmer_len=3, max_kmer_len=3,
                               kmer_filters=[vec])
        seq = "ACGTAAGGCCATTA"
        exp = [j for j in range(len(seq) - 2) if seq[j] == "A"]
        assert km.kmer_sba_start_indices.tolist() == exp
