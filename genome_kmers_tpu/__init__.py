"""genome_kmers_tpu: a TPU-native genomic k-mer analysis engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
mrperkett/genome-kmers (the reference implementation studied in SURVEY.md):
FASTA ingestion into a '$'-separated sequence byte array, a position-indexed
k-mer representation, accelerator-resident lexicographic k-mer index sorting,
segmented group statistics (counts, uniqueness, group-size histograms),
vectorized k-mer filters (length / GC / homopolymer / ambiguous-base /
CRISPR-PAM), and HDF5/shelve persistence — plus multi-device scaling via
position-sharded sample sort over a ``jax.sharding.Mesh``.
"""

from .kmers import (
    Kmers,
    compare_sba_kmers_always_less_than,
    compare_sba_kmers_lexicographically,
    crispr_ngg_pam_filter,
    gen_kmer_gc_content_filter_func,
    gen_kmer_homopolymer_filter_func,
    gen_kmer_length_filter_func,
    gen_no_ambiguous_bases_filter,
    get_compare_sba_kmers_func,
    get_kmer_group_size_hist,
    get_kmer_info_group_size_only,
    get_kmer_info_minimal,
    kmer_filter_keep_all,
    kmer_has_required_len,
    kmer_info_by_group_generator,
)
from .large_kmers import LargeKmers
from .ops.filters import VectorizedFilter
from .sequence_collection import SequenceCollection

__version__ = "0.1.0"

__all__ = [
    "Kmers",
    "LargeKmers",
    "SequenceCollection",
    "VectorizedFilter",
    "compare_sba_kmers_always_less_than",
    "compare_sba_kmers_lexicographically",
    "crispr_ngg_pam_filter",
    "gen_kmer_gc_content_filter_func",
    "gen_kmer_homopolymer_filter_func",
    "gen_kmer_length_filter_func",
    "gen_no_ambiguous_bases_filter",
    "get_compare_sba_kmers_func",
    "get_kmer_group_size_hist",
    "get_kmer_info_group_size_only",
    "get_kmer_info_minimal",
    "kmer_filter_keep_all",
    "kmer_has_required_len",
    "kmer_info_by_group_generator",
]
