"""Differential coverage for the lanes-flags filtered stats path.

After a bounded-k sort the index retains its sorted key lanes; library
filters can evaluate their (pass, raise) outcome DIRECTLY on those lane
words (ops/filters lanes flags), fusing the whole filtered query into one
program with zero genome gathers (ops/groups.lanes_filtered_*). These tests
pin that path against the pre-existing flag-plane/window path — itself
oracle-pinned by tests/test_filter_flags.py and tests/test_filters.py — on
genomes hitting the lane edge cases: multi-record truncation, N runs, full
IUPAC (4-bit lanes), uniform-cap lanes (min_kmer_len == max_kmer_len, no cap
lane), word-boundary filter windows (k = 16/32 on 2-bit, 8 on 4-bit), and
raising configurations (error message + which query raises must match).
"""

import numpy as np
import pytest

from genome_kmers_tpu import SequenceCollection
from genome_kmers_tpu.kmers import Kmers
from genome_kmers_tpu.ops.filters import (
    CrisprNggPamFilter,
    GcContentFilter,
    HomopolymerFilter,
    LengthFilter,
    NoAmbiguousBasesFilter,
)


def _random_seq(rng, n, alphabet):
    return "".join(rng.choice(list(alphabet), n))


def _genomes():
    rng = np.random.default_rng(11)
    yield "acgt-multi", [
        ("r1", _random_seq(rng, 220, "ACGT")),
        ("r2", _random_seq(rng, 41, "ACGT")),
        ("r3", _random_seq(rng, 64, "ACGT")),
    ]
    g = list(_random_seq(rng, 170, "ACGT"))
    g[50:61] = "N" * 11
    yield "n-runs", [("r1", "".join(g)), ("r2", _random_seq(rng, 33, "ACGTN"))]
    yield "iupac", [
        ("r1", _random_seq(rng, 130, "ACGTRYSWKMBDHVN")),
        ("r2", _random_seq(rng, 27, "ACGT")),
    ]
    yield "tiny-segments", [
        ("r1", "A"),
        ("r2", "GGGGGGGGGGGGGGGGGGGGGGGGGG"),
        ("r3", _random_seq(rng, 56, "ACGT")),
        ("r4", "C"),
    ]


GENOMES = list(_genomes())


def _filters():
    yield "gc-mid", GcContentFilter(0.3, 0.7, 11), 11
    yield "gc-word-edge16", GcContentFilter(0.25, 0.75, 16), 16
    yield "gc-word-edge8", GcContentFilter(0.25, 0.75, 8), 8
    yield "gc-impossible", GcContentFilter(0.49, 0.50, 3), 3
    yield "gc-k1", GcContentFilter(0.0, 1.0, 1), 1
    yield "noamb", NoAmbiguousBasesFilter(9), 9
    yield "noamb-k16", NoAmbiguousBasesFilter(16), 16
    yield "len-small", LengthFilter(5), 5
    yield "len-big", LengthFilter(20), 20
    yield "crispr", CrisprNggPamFilter(), 23
    yield "homopoly-2", HomopolymerFilter(2, 12), 12
    yield "homopoly-1", HomopolymerFilter(1, 9), 9
    yield "homopoly-3", HomopolymerFilter(3, 16), 16
    yield "homopoly-short-circuit", HomopolymerFilter(30, 6), 6
    yield "homopoly-edge", HomopolymerFilter(7, 8), 8


def _run_both(km, k, filt, **kw):
    """(result-or-None, error-str-or-None) for (lanes path, forced fallback)."""
    out = []
    for force_fallback in (False, True):
        saved = km._lanes_cache
        try:
            if force_fallback:
                km._lanes_cache = None
                km._lanes_rebuild = False
            try:
                hist, total = km.get_kmer_group_counts(k, kmer_filter_func=filt, **kw)
                cnt = km.get_kmer_count(
                    k, kmer_filter_func=filt,
                    min_group_size=kw.get("min_group_size", 1),
                    max_group_size=kw.get("max_group_size"),
                )
                out.append(((np.asarray(hist), total, cnt), None))
            except ValueError as e:
                out.append((None, str(e)))
        finally:
            km._lanes_cache = saved
            km._lanes_rebuild = True
    return out


@pytest.mark.parametrize("min_k,max_k", [(1, 31), (11, 11), (23, 32), (1, 16)])
@pytest.mark.parametrize("gname,seq_list", GENOMES, ids=[g[0] for g in GENOMES])
def test_lanes_filters_match_fallback(gname, seq_list, min_k, max_k):
    shortest = min(len(s) for _, s in seq_list)
    if min_k > shortest:
        pytest.skip("min_kmer_len exceeds shortest record")
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    km.sort()
    assert km._lanes_cache is not None
    exercised = 0
    for fname, filt, k in _filters():
        if k > max_k:
            continue
        eligible = km._filtered_lanes_stats(k, filt) is not None
        (lanes_res, lanes_err), (fb_res, fb_err) = _run_both(
            km, k, filt, max_counts_bin=40, min_group_size=1
        )
        assert lanes_err == fb_err, (gname, fname, lanes_err, fb_err)
        if lanes_err is None:
            lh, lt, lc = lanes_res
            fh, ft, fc = fb_res
            assert lt == ft and lc == fc, (gname, fname)
            assert np.array_equal(lh, fh), (gname, fname)
        if eligible:
            exercised += 1
    assert exercised > 0  # the lanes path must actually run somewhere


@pytest.mark.parametrize("gname,seq_list", GENOMES[:2], ids=[g[0] for g in GENOMES[:2]])
def test_lanes_filters_group_params(gname, seq_list):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=1, max_kmer_len=24)
    km.sort()
    filt = GcContentFilter(0.2, 0.8, 7)
    for min_gs, max_gs in [(1, None), (2, None), (1, 1), (2, 3)]:
        (lr, le), (fr, fe) = _run_both(
            km, 7, filt, max_counts_bin=10, min_group_size=min_gs,
            max_group_size=max_gs,
        )
        assert le == fe
        if le is None:
            assert lr[1] == fr[1] and lr[2] == fr[2]
            assert np.array_equal(lr[0], fr[0])


def test_lanes_filters_eligibility_gates():
    rng = np.random.default_rng(3)
    seq = _random_seq(rng, 200, "ACGT")
    sc = SequenceCollection(sequence_list=[("r1", seq)], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=5, max_kmer_len=20)
    km.sort()
    # filter window beyond the built lanes -> ineligible (falls back)
    assert km._filtered_lanes_stats(20, GcContentFilter(0.2, 0.8, 25)) is None
    # CRISPR without the min_kmer_len >= 23 guarantee -> ineligible (the
    # reference reads raw bytes across segment ends; lanes cannot)
    assert km._filtered_lanes_stats(20, CrisprNggPamFilter()) is None
    # LengthFilter within the built window -> eligible; beyond it but within
    # the index floor (every row passes trivially) -> still eligible; beyond
    # both -> ineligible
    km2 = Kmers(sc, min_kmer_len=30, max_kmer_len=32)
    km2.sort()
    assert km2._filtered_lanes_stats(30, LengthFilter(28)) is not None
    spec = km2._filtered_lanes_stats(30, LengthFilter(30))
    assert spec is not None
    assert km2._filtered_lanes_stats(30, LengthFilter(40)) is None
    # ... and the trivial-floor case answers exactly like the fallback
    (lr, le), (fr, fe) = _run_both(km2, 30, LengthFilter(30), max_counts_bin=10)
    assert le is None and fe is None
    assert lr[1] == fr[1] and np.array_equal(lr[0], fr[0])
    # keep-all and non-KmerFilter callables never take the lanes path
    assert km._filtered_lanes_stats(20, lambda s, st, i: True) is None


def test_lanes_filters_crispr_exactness_min23():
    rng = np.random.default_rng(9)
    seq = _random_seq(rng, 400, "ACGT")
    sc = SequenceCollection(sequence_list=[("r1", seq)], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=23, max_kmer_len=23)
    km.sort()
    filt = CrisprNggPamFilter()
    assert km._filtered_lanes_stats(23, filt) is not None
    (lr, le), (fr, fe) = _run_both(km, 23, filt, max_counts_bin=20)
    assert le is None and fe is None
    assert lr[1] == fr[1] and np.array_equal(lr[0], fr[0])
    # cross-check against the scalar oracle (raw-byte semantics)
    sba = np.frombuffer(seq.encode(), dtype=np.uint8)
    expected = sum(
        1 for p in range(len(seq) - 22)
        if seq[p + 21] == "G" and seq[p + 22] == "G" and p + 23 <= len(seq)
    )
    assert lr[1] == expected


def test_lanes_filters_raise_parity_truncation():
    # a k-mer window crossing '$' raises through both paths with the same
    # message, and the lanes digest reports the FIRST bad position in sorted
    # order (matching the fallback's _first_true_pos semantics)
    sc = SequenceCollection(
        sequence_list=[("r1", "ACGTACGTAC"), ("r2", "GGGCC")],
        strands_to_load="forward",
    )
    km = Kmers(sc, min_kmer_len=1, max_kmer_len=12)
    km.sort()
    gc = GcContentFilter(0.0, 1.0, 8)
    (lr, le), (fr, fe) = _run_both(km, 8, gc, max_counts_bin=10)
    assert le is not None and le == fe
    na = NoAmbiguousBasesFilter(8)
    (lr, le), (fr, fe) = _run_both(km, 8, na, max_counts_bin=10)
    assert le is not None and le == fe


class TestMeshLanesFilters:
    """The mesh filtered stats evaluate lanes flags on the retained sharded
    lanes (no plane gather, no compaction, no host allgather error checks)
    — pinned here against the single-chip engine on the 8-device virtual
    mesh, including raising configurations and both lane encodings."""

    @pytest.fixture()
    def mesh8(self):
        import jax
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()[:8]), ("kmers",))

    @pytest.mark.parametrize("alpha", ["ACGT", "ACGTN"])
    def test_mesh_matches_single_chip(self, mesh8, alpha):
        rng = np.random.default_rng(31)
        seq_list = [
            ("c1", _random_seq(rng, 500, alpha)),
            ("c2", _random_seq(rng, 83, alpha)),
        ]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km_m = Kmers(sc, min_kmer_len=7, max_kmer_len=24)
        km_c = Kmers(sc, min_kmer_len=7, max_kmer_len=24)
        km_m.sort(mesh=mesh8)
        km_c.sort()
        for fname, filt, k in _filters():
            if k > 24 or k < 7:
                continue  # windows below the floor raise on truncation
            try:
                h_c, t_c = km_c.get_kmer_group_counts(
                    k, kmer_filter_func=filt, max_counts_bin=30
                )
                err_c = None
            except ValueError as e:
                h_c = t_c = None
                err_c = str(e)
            try:
                h_m, t_m = km_m.get_kmer_group_counts(
                    k, kmer_filter_func=filt, max_counts_bin=30, mesh=mesh8
                )
                err_m = None
            except ValueError as e:
                h_m = t_m = None
                err_m = str(e)
            assert err_c == err_m, (alpha, fname, err_c, err_m)
            if err_c is None:
                assert t_m == t_c, (alpha, fname)
                assert np.array_equal(np.asarray(h_m), np.asarray(h_c)), (alpha, fname)

    def test_mesh_homopolymer_preemption_parity(self, mesh8):
        # a '$'-truncated window whose run already exceeded max_h returns
        # False (no raise) — the mesh lanes path must agree with the
        # single-chip engine on a custom position set excluding the
        # unconditionally-raising array-end overflow rows
        seq1 = "ACGTCGTACGTACGGTCA" + "A" * 5
        seq2 = "CGTACGTTGCATGCATGCAT"
        sc = SequenceCollection(
            sequence_list=[("r1", seq1), ("r2", seq2)], strands_to_load="forward"
        )
        k = 6
        positions = np.array(
            list(range(len(seq1) - 2))
            + [len(seq1) + 1 + q for q in range(len(seq2) - k + 1)],
            dtype=np.uint32,
        )
        filt = HomopolymerFilter(1, k)
        km_c = Kmers(sc, min_kmer_len=3, max_kmer_len=8)
        km_c.kmer_sba_start_indices = positions.copy()
        km_c.sort()
        h_c, t_c = km_c.get_kmer_group_counts(k, kmer_filter_func=filt,
                                              max_counts_bin=10)
        km_m = Kmers(sc, min_kmer_len=3, max_kmer_len=8)
        km_m.kmer_sba_start_indices = positions.copy()
        km_m.sort(mesh=mesh8)
        h_m, t_m = km_m.get_kmer_group_counts(k, kmer_filter_func=filt,
                                              max_counts_bin=10, mesh=mesh8)
        assert t_m == t_c
        assert np.array_equal(np.asarray(h_m), np.asarray(h_c))

    def test_mesh_raise_parity(self, mesh8):
        # filter window beyond short rows: both engines raise identically
        rng = np.random.default_rng(5)
        seq_list = [("c1", _random_seq(rng, 120, "ACGT"))]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km_m = Kmers(sc, min_kmer_len=3, max_kmer_len=16)
        km_c = Kmers(sc, min_kmer_len=3, max_kmer_len=16)
        km_m.sort(mesh=mesh8)
        km_c.sort()
        for filt in (GcContentFilter(0.0, 1.0, 12), NoAmbiguousBasesFilter(12),
                     HomopolymerFilter(2, 12)):
            with pytest.raises(ValueError) as e_c:
                km_c.get_kmer_group_counts(12, kmer_filter_func=filt, max_counts_bin=5)
            with pytest.raises(ValueError) as e_m:
                km_m.get_kmer_group_counts(
                    12, kmer_filter_func=filt, max_counts_bin=5, mesh=mesh8
                )
            assert str(e_c.value) == str(e_m.value), type(filt).__name__


@pytest.mark.parametrize("alpha", ["ACGT", "ACGTN"])
def test_homopolymer_lanes_mask_vs_scalar_oracle(alpha):
    """Row-level check of the run-detection bit tricks: the lanes mask must
    equal the scalar reference walk at every surviving position (planted
    homopolymer runs of assorted lengths, both lane widths)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(77)
    g = list("".join(rng.choice(list(alpha), 300)))
    for start, length, base in [(10, 2, "A"), (40, 3, "C"), (80, 5, "T"),
                                (120, 9, "G"), (200, 17, "A"), (260, 20, "C")]:
        g[start : start + length] = base * length
    # a run reaching the SEGMENT END: windows crossing the '$' AFTER the run
    # already exceeded max_h must return False, not raise (the reference's
    # left-to-right scan preempts the '$', kmers.py:75-86)
    g[-14:] = "A" * 14
    seq = "".join(g)
    sc = SequenceCollection(sequence_list=[("r1", seq)], strands_to_load="forward")
    sba = np.frombuffer((seq).encode(), dtype=np.uint8)
    for min_k, max_k in [(1, 31), (12, 32), (1, 64)]:
        km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
        km.sort()
        lanes = km._lanes_cache
        if lanes is None:
            continue
        if not lanes["two_bit"] and max_k > 32:
            continue
        pos = np.asarray(km._device_positions())  # sorted order = lane rows
        for max_h, k in [(1, 12), (2, 12), (3, 20), (4, 31), (8, 31), (16, 31)]:
            if k > max_k:
                continue
            filt = HomopolymerFilter(max_h, k)
            spec = filt.lanes_spec(lanes, len(sba), min_k)
            assert spec is not None
            fn, params, _ = spec
            mask, (raises,) = fn(
                lanes["words"], lanes["cap"], km._device_positions(),
                jnp.asarray(params),
            )
            mask = np.asarray(mask)
            raises = np.asarray(np.broadcast_to(raises, mask.shape))
            for i, p in enumerate(pos):
                try:
                    want = filt(sba, "+", int(p))
                    assert not raises[i], (max_h, k, p)
                    assert bool(mask[i]) == want, (max_h, k, p, seq[p:p+k])
                except ValueError:
                    assert raises[i], (max_h, k, p)


def test_homopolymer_truncation_preempted_by_early_run():
    """Reference kmers.py:75-86: a window that crosses '$' AFTER its run
    already exceeded max_homopolymer_size returns False — it never reaches
    the '$' check (array-end overflow, by contrast, raises unconditionally
    BEFORE the scan, kmers.py:66-69). Regression: all vectorized paths used
    to raise on any truncated row."""
    k, max_h = 6, 1
    filt = HomopolymerFilter(max_h, k)
    seq1 = "ACGTCGTACGTACGGTCA" + "A" * 5  # '$'-truncated tail run
    seq2 = "CGTACGTTGCATGCATGCAT"
    seq_list = [("r1", seq1), ("r2", seq2)]
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    sba = np.frombuffer((seq1 + "$" + seq2).encode(), dtype=np.uint8)

    # Custom position set: every row the scalar reference filter handles
    # WITHOUT raising (r1's truncated tail rows are all preempted by the
    # A-run; r2's overflow tail is excluded). The query must not raise and
    # must count exactly the scalar survivors.
    positions, expected_surv = [], 0
    # rows with vl >= min_kmer_len only (the sort's validate_kmers check)
    for p in list(range(len(seq1) - 2)) + [len(seq1) + 1 + q for q in range(len(seq2) - k + 1)]:
        try:
            ok = filt(sba, "+", p)
        except ValueError:
            continue
        positions.append(p)
        expected_surv += int(ok)
    km = Kmers(sc, min_kmer_len=3, max_kmer_len=8)
    km.kmer_sba_start_indices = np.asarray(positions, dtype=np.uint32)
    km.sort()
    (lr, le), (fr, fe) = _run_both(km, k, filt, max_counts_bin=10)
    assert le is None and fe is None, (le, fe)
    assert lr[1] == fr[1] == expected_surv
    assert np.array_equal(lr[0], fr[0])

    # Full dense index: r2's array-end tail rows overflow, so the query
    # raises — and the reported first-bad position must skip r1's preempted
    # rows (they return False, they do not raise) identically on every path.
    km2 = Kmers(sc, min_kmer_len=3, max_kmer_len=8)
    km2.sort()
    first_bad = None
    for p in np.asarray(km2.kmer_sba_start_indices):
        try:
            filt(sba, "+", int(p))
        except ValueError:
            first_bad = int(p)
            break
    (lr, le), (fr, fe) = _run_both(km2, k, filt, max_counts_bin=10)
    assert le is not None and le == fe
    assert f"({first_bad})" in le


def test_lanes_filters_strand_split():
    rng = np.random.default_rng(21)
    seq = _random_seq(rng, 150, "ACGT")
    sc = SequenceCollection(sequence_list=[("r1", seq)], strands_to_load="both")
    km = Kmers.from_strand(
        sc, source_strand="both", track_strands_separately=True,
        min_kmer_len=1, max_kmer_len=16,
    )
    km.sort()
    if km._lanes_cache is None:
        pytest.skip("no retained lanes on this configuration")
    filt = GcContentFilter(0.25, 0.75, 9)
    (lr, le), (fr, fe) = _run_both(km, 9, filt, max_counts_bin=25)
    assert le == fe
    if le is None:
        assert lr[1] == fr[1] and np.array_equal(lr[0], fr[0])
