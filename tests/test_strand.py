"""Real reverse-complement source_strand support (Kmers.from_strand —
EXTENSION; the plain constructor preserves the reference's
NotImplementedError, reference kmers.py:693-696).

Oracle: a Kmers over the reverse-complement SBA must behave exactly like a
plain forward Kmers built over the reverse-complemented sequences in
reversed record order (that IS the revcomp SBA's layout)."""

import numpy as np
import pytest

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.parallel import make_mesh

_COMP = str.maketrans("ACGT", "TGCA")


def _rc(s: str) -> str:
    return s.translate(_COMP)[::-1]


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(9)
    seqs = [
        ("r%d" % i, "".join(rng.choice(list("ACGT"), size=n)))
        for i, n in enumerate((83, 61, 47))
    ]
    sc_rc = SequenceCollection(sequence_list=seqs, strands_to_load="reverse_complement")
    km_rc = Kmers.from_strand(
        sc_rc, min_kmer_len=1, max_kmer_len=None, source_strand="reverse_complement"
    )
    km_rc.sort()

    seqs_rc = [(n, _rc(s)) for n, s in reversed(seqs)]
    sc_f = SequenceCollection(sequence_list=seqs_rc, strands_to_load="forward")
    km_f = Kmers(sc_f, min_kmer_len=1, max_kmer_len=None)
    km_f.sort()
    return km_rc, km_f


class TestReverseComplementStrand:
    def test_sorted_index_matches_forward_oracle(self, pair):
        km_rc, km_f = pair
        np.testing.assert_array_equal(
            km_rc.kmer_sba_start_indices, km_f.kmer_sba_start_indices
        )

    @pytest.mark.parametrize("k", [5, None])
    def test_group_counts_match(self, pair, k):
        km_rc, km_f = pair
        c1, t1 = km_rc.get_kmer_group_counts(k, max_counts_bin=30)
        c2, t2 = km_f.get_kmer_group_counts(k, max_counts_bin=30)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        assert int(t1) == int(t2)
        assert km_rc.get_kmer_count(5) == km_f.get_kmer_count(5)

    def test_kmer_strings_read_revcomp_sba(self, pair):
        km_rc, km_f = pair
        got = [km_rc.get_kmer_str_no_checks(i, "+", 5) for i in range(5)]
        want = [km_f.get_kmer_str_no_checks(i, "+", 5) for i in range(5)]
        assert got == want

    def test_queries_match(self, pair):
        km_rc, km_f = pair
        q = km_f.get_kmer_str_no_checks(0, "+", 5)
        assert (
            km_rc.count_queries([q], 5).tolist()
            == km_f.count_queries([q], 5).tolist()
        )

    def test_mesh_pipeline_matches(self, pair):
        km_rc, km_f = pair
        mesh = make_mesh(8)
        km_rc2 = Kmers.from_strand(
            km_rc.seq_coll, min_kmer_len=1, max_kmer_len=None,
            source_strand="reverse_complement",
        )
        km_rc2.sort(mesh=mesh)
        np.testing.assert_array_equal(
            km_rc2.kmer_sba_start_indices, km_f.kmer_sba_start_indices
        )
        c1, t1 = km_rc2.get_kmer_group_counts(5, max_counts_bin=30, mesh=mesh)
        c2, t2 = km_f.get_kmer_group_counts(5, max_counts_bin=30)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        assert int(t1) == int(t2)

    def test_save_load_round_trip(self, pair, tmp_path):
        km_rc, km_f = pair
        km_rc.save(str(tmp_path / "rc.h5"), include_sequence_collection=True)
        km_l = Kmers()
        km_l.load(str(tmp_path / "rc.h5"))
        assert km_l.kmer_source_strand == "reverse_complement"
        np.testing.assert_array_equal(
            km_l.kmer_sba_start_indices, km_rc.kmer_sba_start_indices
        )
        assert km_l.get_kmer_count(5) == km_f.get_kmer_count(5)

    def test_parity_errors_preserved(self, pair):
        km_rc, _ = pair
        with pytest.raises(NotImplementedError, match="source_strand"):
            Kmers(km_rc.seq_coll, source_strand="reverse_complement")
        # from_strand("both") is now implemented (tests/test_both.py); on a
        # single-strand collection it reports the reference's mismatch error
        with pytest.raises(ValueError, match="does not match"):
            Kmers.from_strand(km_rc.seq_coll, source_strand="both")

    def test_from_strand_forward_equals_plain_ctor(self, pair):
        _, km_f = pair
        km_p = Kmers.from_strand(km_f.seq_coll, min_kmer_len=1)
        km_p.sort()
        np.testing.assert_array_equal(
            km_p.kmer_sba_start_indices, km_f.kmer_sba_start_indices
        )

    def test_strand_mismatch_rejected(self):
        sc_f = SequenceCollection(
            sequence_list=[("a", "ACGTACGT")], strands_to_load="forward"
        )
        with pytest.raises(ValueError, match="does not match"):
            Kmers.from_strand(sc_f, source_strand="reverse_complement")
        # a both-loaded collection must also fail with the reference's
        # mismatch message for single-strand from_strand requests (not
        # iter_records' internal sba_strand error)
        sc_b = SequenceCollection(
            sequence_list=[("a", "ACGTACGT")], strands_to_load="both"
        )
        with pytest.raises(ValueError, match="does not match"):
            Kmers.from_strand(sc_b, source_strand="reverse_complement")
        with pytest.raises(ValueError, match="does not match"):
            Kmers.from_strand(sc_b, source_strand="forward")
