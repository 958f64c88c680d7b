"""Multi-chip scaling: position-sharded k-mer sort and stitched group
statistics over a ``jax.sharding.Mesh`` (new TPU-native design; the reference
has no distributed code — SURVEY.md §2)."""

from .checkpoint import (
    load_kmers_sharded,
    load_large_kmers,
    load_sharded_index,
    save_kmers_sharded,
    save_large_kmers,
    save_sharded_index,
)
from .distributed import (
    AXIS,
    compact_ragged,
    distributed_group_size_histogram,
    distributed_group_size_histogram_ragged,
    distributed_sort_positions,
    make_mesh,
)
from .hier import make_mesh2, sample_sort_positions_ragged_hier
from .large import distributed_group_size_histogram_large_ragged
from .large import large_lanes_filter_flags, rebuild_large_lanes
from .query import distributed_count_queries, distributed_count_queries_large
from .sample_sort import (
    sample_sort_canonical_dense_ragged,
    sample_sort_canonical_large_ragged,
    sample_sort_canonical_ragged,
    sample_sort_positions,
    sample_sort_positions_dense_ragged,
    sample_sort_positions_large,
    sample_sort_positions_large_ragged,
    sample_sort_positions_ragged,
    sample_sort_positions_unbounded,
)

__all__ = [
    "AXIS",
    "compact_ragged",
    "distributed_group_size_histogram",
    "distributed_count_queries",
    "distributed_count_queries_large",
    "distributed_group_size_histogram_large_ragged",
    "distributed_group_size_histogram_ragged",
    "distributed_sort_positions",
    "sample_sort_positions_large",
    "sample_sort_positions_large_ragged",
    "large_lanes_filter_flags",
    "load_kmers_sharded",
    "load_large_kmers",
    "rebuild_large_lanes",
    "load_sharded_index",
    "make_mesh",
    "make_mesh2",
    "sample_sort_canonical_dense_ragged",
    "sample_sort_canonical_large_ragged",
    "sample_sort_canonical_ragged",
    "sample_sort_positions",
    "sample_sort_positions_dense_ragged",
    "sample_sort_positions_ragged",
    "sample_sort_positions_ragged_hier",
    "sample_sort_positions_unbounded",
    "save_kmers_sharded",
    "save_large_kmers",
    "save_sharded_index",
]
