"""Literal golden fixtures transcribed from the reference documentation
(reference docs/overview.rst:40-96) — the canonical exact-match check,
stated as verbatim expected output rather than recomputed oracles."""

from genome_kmers_tpu import Kmers, SequenceCollection

SEQ_LIST = [("chr1", "ATCGAATTAG"), ("chr2", "GGATCTTGCATT"), ("chr3", "GTGATTGACCCCT")]

# reference docs/overview.rst:46-74 — all sorted 3-mers
GOLDEN_SORTED_3MERS = [
    "AAT", "ACC", "ATC", "ATC", "ATT", "ATT", "ATT", "CAT", "CCC", "CCC",
    "CCT", "CGA", "CTT", "GAA", "GAC", "GAT", "GAT", "GCA", "GGA", "GTG",
    "TAG", "TCG", "TCT", "TGA", "TGA", "TGC", "TTA", "TTG", "TTG",
]

# reference docs/overview.rst:76-96 — first occurrence of 3-mers with
# group size in [2, 3]
GOLDEN_FIRST_OF_GROUPS_2_TO_3 = ["ATC", "ATT", "CCC", "GAT", "TGA", "TTG"]


def make_sorted():
    sc = SequenceCollection(sequence_list=SEQ_LIST, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=3)
    km.sort()
    return km


def test_golden_sorted_3mers_via_documented_workflow():
    km = make_sorted()
    out = []
    for kmer_info in km.get_kmers(kmer_len=3, kmer_info_to_yield="full"):
        kmer_num, strand = kmer_info[0:2]
        out.append(km.get_kmer_str_no_checks(kmer_num, strand, kmer_len=3))
    assert out == GOLDEN_SORTED_3MERS


def test_golden_group_filtered_yields():
    km = make_sorted()
    out = []
    gen = km.get_kmers(
        kmer_len=3, kmer_info_to_yield="full", min_group_size=2,
        max_group_size=3, yield_first_n=1,
    )
    for kmer_info in gen:
        kmer_num, strand = kmer_info[0:2]
        out.append(km.get_kmer_str_no_checks(kmer_num, strand, kmer_len=3))
    assert out == GOLDEN_FIRST_OF_GROUPS_2_TO_3
