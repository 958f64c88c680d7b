"""Brute-force pure-Python oracles for the TPU k-mer engine tests.

Mirrors the reference's central testing idea (reference
tests/test_kmers.py:55-116, :842-929): recompute k-mers as Python strings via
slicing and ``list.sort``, re-derive groups from the sorted strings, and apply
group filtering in plain Python — then compare the engine's output against
this oracle across comprehensive parameter sweeps.
"""

from __future__ import annotations

from typing import Union

import numpy as np


def expected_kmers(
    seq_list: list[tuple[str, str]], min_kmer_len: int, max_kmer_len: Union[int, None]
):
    """Return (unsorted_indices, unsorted_kmers, sorted_kmers, sorted_indices).

    A k-mer at record offset i spans seq[i : i + max_kmer_len] (to end of
    record when max_kmer_len is None); its SBA index accounts for the '$'
    separators. sorted_indices follow a stable sort by k-mer string (matching
    the engine's position-tie-break order).
    """
    indices: list[int] = []
    unsorted: list[str] = []
    start = 0
    for _, seq in seq_list:
        for i in range(len(seq) - min_kmer_len + 1):
            end = len(seq) if max_kmer_len is None else min(len(seq), i + max_kmer_len)
            unsorted.append(seq[i:end])
            indices.append(start + i)
        start += len(seq) + 1  # +1 for '$'
    unsorted_indices = np.array(indices, dtype=np.uint32)

    order = sorted(range(len(unsorted)), key=lambda j: unsorted[j])
    sorted_kmers = [unsorted[j] for j in order]
    sorted_indices = [int(unsorted_indices[j]) for j in order]
    return unsorted_indices, unsorted, sorted_kmers, sorted_indices


def parameter_combinations(seq_lists):
    """All (seq_list, min_kmer_len, max_kmer_len) combos, sweeping min up to
    the shortest record length and max in [min, shortest) plus None."""
    params = []
    for seq_list in seq_lists:
        shortest = min(len(seq) for _, seq in seq_list)
        for min_kmer_len in range(1, shortest):
            for max_kmer_len in list(range(min_kmer_len, shortest)) + [None]:
                params.append((seq_list, min_kmer_len, max_kmer_len))
    return params


def expected_groups(
    sorted_kmers: list[str],
    kmer_len: Union[int, None],
    min_group_size: int = 1,
    max_group_size: Union[int, None] = None,
    yield_first_n: Union[int, None] = None,
    keep=None,
):
    """Re-derive the group walk's yields from sorted k-mer strings.

    ``keep`` is an optional per-sorted-position filter predicate (position ->
    bool); group identity is the kmer_len-prefix of each *surviving* k-mer,
    compared to the previous survivor. Returns a list of
    (sorted_position, group_size_yielded, group_size_total) in yield order.
    """
    survivors = [
        (i, s if kmer_len is None else s[:kmer_len])
        for i, s in enumerate(sorted_kmers)
        if keep is None or keep(i)
    ]
    out = []
    group: list[int] = []

    def flush(group):
        total = len(group)
        if total == 0:
            return
        if total < min_group_size:
            return
        if max_group_size is not None and total > max_group_size:
            return
        n_yield = total if yield_first_n is None else min(total, yield_first_n)
        for pos in group[:n_yield]:
            out.append((pos, n_yield, total))

    prev_key = None
    for pos, key in survivors:
        if prev_key is not None and key == prev_key:
            group.append(pos)
        else:
            flush(group)
            group = [pos]
        prev_key = key
    flush(group)
    return out


def expected_hist(
    sorted_kmers,
    kmer_len,
    min_group_size=1,
    max_group_size=None,
    max_counts_bin=1000000,
    keep=None,
):
    """Group-size histogram + total count, matching reference kmers.py:454-520."""
    yields = expected_groups(
        sorted_kmers, kmer_len, min_group_size, max_group_size, yield_first_n=1, keep=keep
    )
    counts = np.zeros(max_counts_bin + 1, dtype=np.int64)
    total = 0
    for _, _, group_total in yields:
        counts[min(group_total, max_counts_bin)] += 1
        total += group_total
    return counts, total
