"""Differential coverage for the genome-order filter flag planes.

The production query path (kmers.py `_boundary_parts`/`_mask_parts`) hands the
SequenceCollection device cache to `FilterContext` as ``scans``, which lets
each library filter serve `mask_pure`/`check_batch` from a cached uint8 flag
plane (`ops/filters._genome_flags`) — one gather per query instead of 2-3.
These tests pin the flag-plane path against

  1. the scan-less fallback path (``scans=None`` → the per-query window
     kernels), and
  2. the scalar ``__call__`` oracle (reference semantics per position,
     including which positions raise and with what message),

on genomes chosen to hit the plane edge cases: multi-record truncation at
'$', array-end truncation on the last record, N runs, full-IUPAC bases, and
single-base records.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_kmers_tpu import SequenceCollection
from genome_kmers_tpu.kmers import Kmers
from genome_kmers_tpu.ops.filters import (
    CrisprNggPamFilter,
    FilterContext,
    GcContentFilter,
    HomopolymerFilter,
    NoAmbiguousBasesFilter,
)
from genome_kmers_tpu.ops.keys import compute_valid_len


def _random_seq(rng, n, alphabet):
    return "".join(rng.choice(list(alphabet), n))


def _genomes():
    rng = np.random.default_rng(7)
    yield "acgt-multi", [
        ("r1", _random_seq(rng, 200, "ACGT")),
        ("r2", _random_seq(rng, 37, "ACGT")),
        ("r3", _random_seq(rng, 64, "ACGT")),
    ]
    g = list(_random_seq(rng, 180, "ACGT"))
    g[40:55] = "N" * 15
    g[90] = "N"
    yield "n-runs", [("r1", "".join(g)), ("r2", _random_seq(rng, 30, "ACGTN"))]
    yield "iupac", [
        ("r1", _random_seq(rng, 120, "ACGTRYSWKMBDHVN")),
        ("r2", _random_seq(rng, 25, "ACGT")),
    ]
    yield "tiny-segments", [
        ("r1", "A"),
        ("r2", "GGGGGGGG"),
        ("r3", _random_seq(rng, 50, "ACGT")),
        ("r4", "C"),
    ]


def _contexts(seq_list):
    """(flag-plane ctx, fallback ctx, sba bytes, positions) for one genome.

    Positions come from ``min_kmer_len=1`` (every base starts a k-mer) while
    the filters carry their own k — the production shape for
    ``get_kmer_group_counts(kmer_len=k, kmer_filter_func=...)`` — so short
    segments exercise '$'/array-end truncation at every filter k."""
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=1)
    dc = km._dc()
    positions = km._device_positions()
    valid_len = compute_valid_len(positions, dc.seg_starts, dc.seg_ends)
    sba = km._host_sba()
    ctx_fl = FilterContext(sba, positions, valid_len, sba_dev=lambda: dc.sba, scans=dc)
    ctx_fb = FilterContext(sba, positions, valid_len)
    return ctx_fl, ctx_fb, sba, np.asarray(positions)


def _scalar_oracle(filt, sba, positions):
    """Per-position scalar outcomes: (mask, first raise message or None)."""
    mask = np.zeros(len(positions), dtype=bool)
    first_err = None
    for i, p in enumerate(positions):
        try:
            mask[i] = filt(sba, "+", int(p))
        except ValueError as e:
            if first_err is None:
                first_err = str(e)
            mask[i] = False
    return mask, first_err


def _filters_for(min_k):
    yield GcContentFilter(0.0, 1.0, min_k)
    yield GcContentFilter(0.3, 0.7, min_k)
    yield GcContentFilter(0.5, 0.5, min_k)
    yield HomopolymerFilter(2, min_k)
    yield HomopolymerFilter(min_k + 2, min_k)  # k < max_h short-circuit
    yield NoAmbiguousBasesFilter(min_k)


@pytest.mark.parametrize("name,seq_list", list(_genomes()))
@pytest.mark.parametrize("filter_k", [1, 4, 9])
def test_flag_plane_matches_fallback_and_oracle(name, seq_list, filter_k):
    ctx_fl, ctx_fb, sba, positions = _contexts(seq_list)
    for filt in _filters_for(filter_k):
        got_fl = np.asarray(filt.mask_pure(ctx_fl))
        got_fb = np.asarray(filt.mask_pure(ctx_fb))
        label = f"{name} k={filter_k} {type(filt).__name__}"
        np.testing.assert_array_equal(got_fl, got_fb, err_msg=label)

        oracle_mask, oracle_err = _scalar_oracle(filt, sba, positions)

        def check(ctx):
            try:
                filt.check_batch(ctx)
                return None
            except ValueError as e:
                return str(e)

        err_fl, err_fb = check(ctx_fl), check(ctx_fb)
        assert err_fl == err_fb, label
        assert (err_fl is None) == (oracle_err is None), label
        if oracle_err is None:
            np.testing.assert_array_equal(got_fl, oracle_mask, err_msg=label)

    # the flag-plane path really engaged (not a silent fallback): every
    # filter family built its plane on the device cache (the k < max_h
    # homopolymer short-circuits by design and builds none)
    built = {key[0] for key in ctx_fl._scans.filter_flags}
    expected = {"gc", "noamb"}
    if filter_k >= 2:  # HomopolymerFilter(2, k) short-circuits when k < 2
        expected.add("homopoly")
    assert expected <= built, built


@pytest.mark.parametrize("name,seq_list", list(_genomes()))
def test_crispr_flag_plane(name, seq_list):
    ctx_fl, ctx_fb, sba, positions = _contexts(seq_list)
    filt = CrisprNggPamFilter()
    got_fl = np.asarray(filt.mask_pure(ctx_fl))
    got_fb = np.asarray(filt.mask_pure(ctx_fb))
    np.testing.assert_array_equal(got_fl, got_fb, err_msg=name)
    # flag path really engaged (plane cached on the device cache)
    assert ("crispr",) in ctx_fl._scans.filter_flags
    oracle_mask, oracle_err = _scalar_oracle(filt, sba, positions)
    if oracle_err is None:
        np.testing.assert_array_equal(got_fl, oracle_mask, err_msg=name)


def test_flag_planes_cache_across_queries():
    _, seq_list = next(_genomes())
    ctx_fl, _, _, _ = _contexts(seq_list)
    filt = GcContentFilter(0.25, 0.75, 8)
    first = np.asarray(filt.mask_pure(ctx_fl))
    store = ctx_fl._scans.filter_flags
    key = ("gc", 8, filt.min_allowed_gc_count, filt.max_allowed_gc_count)
    assert key in store
    plane = store[key]
    # second query on a fresh context reuses the cached plane object
    sc_again = np.asarray(filt.mask_pure(ctx_fl))
    assert store[key] is plane
    np.testing.assert_array_equal(first, sc_again)
    # a different parameterization builds its own plane
    filt2 = GcContentFilter(0.0, 0.5, 8)
    filt2.mask_pure(ctx_fl)
    key2 = ("gc", 8, filt2.min_allowed_gc_count, filt2.max_allowed_gc_count)
    assert key2 in store and key2 != key


def test_flag_plane_raise_bit_on_truncation():
    # r2 is shorter than k, so every r2 position truncates at '$'; the GC
    # filter raises only when the truncated window's count never exceeded
    # the max (left-to-right scan semantics)
    seq_list = [("r1", "ACGTACGTACGTACGT"), ("r2", "ACG")]
    ctx_fl, ctx_fb, sba, positions = _contexts(seq_list)
    filt = GcContentFilter(0.0, 1.0, 8)
    with pytest.raises(ValueError) as e_fl:
        filt.check_batch(ctx_fl)
    with pytest.raises(ValueError) as e_fb:
        filt.check_batch(ctx_fb)
    assert str(e_fl.value) == str(e_fb.value)
    _, oracle_err = _scalar_oracle(filt, sba, positions)
    assert oracle_err is not None
