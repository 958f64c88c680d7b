"""Differential fuzzing for the round-2 strand/init extensions: random
genomes, alphabets, and parameters through from_strand("both") (collapsed
and strand-split), init-time filters, and LargeKmers — all pinned to
string-slicing oracles built independently from the raw sequences."""

from collections import Counter

import numpy as np
import pytest

from genome_kmers_tpu import Kmers, LargeKmers, SequenceCollection
from genome_kmers_tpu.parallel import make_mesh

_IUPAC_COMP = str.maketrans("ACGTRYSWKMBDHVN", "TGCAYRSWMKVHDBN")


def _rc(s: str) -> str:
    return s.translate(_IUPAC_COMP)[::-1]


def _random_seq_list(rng, alphabet, n_records, lo, hi):
    out = []
    for i in range(n_records):
        n = int(rng.integers(lo, hi + 1))
        out.append(("r%d" % i, "".join(rng.choice(list(alphabet), size=n))))
    return out


def _both_entries(seq_list, k):
    entries = []
    pos = 0
    for _, s in seq_list:
        for j in range(len(s) - k + 1):
            entries.append((s[j : j + k], pos + j, "+"))
        pos += len(s) + 1
    for _, s in reversed(seq_list):
        rs = _rc(s)
        for j in range(len(rs) - k + 1):
            entries.append((rs[j : j + k], pos + j, "-"))
        pos += len(s) + 1
    return entries


@pytest.mark.parametrize(
    "seed,alphabet,k",
    [
        (1, "ACGT", 3),
        (2, "ACGT", 7),
        (3, "ACGTN", 4),
        (4, "ACGTRYSWKMBDHVN", 3),
        (5, "ACGT", 12),
        (6, "ACGTN", 6),
    ],
)
def test_both_strand_fuzz(seed, alphabet, k):
    rng = np.random.default_rng(seed)
    seq_list = _random_seq_list(rng, alphabet, int(rng.integers(1, 5)), k, 60)
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="both")
    entries = sorted(_both_entries(seq_list, k), key=lambda t: (t[0], t[1]))

    km = Kmers.from_strand(sc, min_kmer_len=k, max_kmer_len=k, source_strand="both")
    km.sort()
    assert km.kmer_sba_start_indices.tolist() == [p for (_, p, _) in entries]

    by_str = Counter(s for (s, _, _) in entries)
    counts, total = km.get_kmer_group_counts(k, max_counts_bin=30)
    exp_hist = Counter(by_str.values())
    for size in range(1, 31):
        assert counts[size] == exp_hist.get(size, 0), size
    assert total == sum(by_str.values())

    km_sep = Kmers.from_strand(
        sc, min_kmer_len=k, max_kmer_len=k, source_strand="both",
        track_strands_separately=True,
    )
    km_sep.sort()
    by_pair = Counter((s, st) for (s, _, st) in entries)
    counts_s, total_s = km_sep.get_kmer_group_counts(k, max_counts_bin=30)
    exp_hist_s = Counter(by_pair.values())
    for size in range(1, 31):
        assert counts_s[size] == exp_hist_s.get(size, 0), size
    assert total_s == total

    # full info strands against the oracle
    got = list(km.get_kmers(k, kmer_info_to_yield="full"))
    assert [g[1] for g in got] == [st for (_, _, st) in entries]


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_both_strand_mesh_fuzz(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 9))
    seq_list = _random_seq_list(rng, "ACGT", int(rng.integers(1, 4)), k, 80)
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="both")
    km = Kmers.from_strand(
        sc, min_kmer_len=k, max_kmer_len=k, source_strand="both",
        track_strands_separately=bool(seed % 2),
    )
    km2 = Kmers.from_strand(
        sc, min_kmer_len=k, max_kmer_len=k, source_strand="both",
        track_strands_separately=bool(seed % 2),
    )
    km.sort()
    mesh = make_mesh(int(rng.choice([2, 3, 8])))
    km2.sort(mesh=mesh)
    np.testing.assert_array_equal(
        km.kmer_sba_start_indices, km2.kmer_sba_start_indices
    )
    c1, t1 = km.get_kmer_group_counts(k, max_counts_bin=30)
    c2, t2 = km2.get_kmer_group_counts(k, max_counts_bin=30, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert int(t1) == int(t2)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_init_filter_fuzz(seed):
    from genome_kmers_tpu.ops.filters import GcContentFilter, NoAmbiguousBasesFilter

    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 7))
    seq_list = _random_seq_list(rng, "ACGTN", int(rng.integers(1, 4)), k, 70)
    sc1 = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    sc2 = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    filters = [NoAmbiguousBasesFilter(k), GcContentFilter(0.25, 0.9, k)]
    km_s = Kmers.from_strand(sc1, min_kmer_len=k, max_kmer_len=k,
                             kmer_filters=filters)
    km_d = Kmers.from_strand(sc2, min_kmer_len=k, max_kmer_len=k,
                             method="double_pass", kmer_filters=filters)
    np.testing.assert_array_equal(
        km_s.kmer_sba_start_indices, km_d.kmer_sba_start_indices
    )

    def gc_ok(s):
        gc = sum(c in "GC" for c in s)
        lo = int(np.ceil(k * 0.25))
        hi = int(np.floor(k * 0.9))
        return lo <= gc <= hi

    exp = []
    pos = 0
    for _, s in seq_list:
        for j in range(len(s) - k + 1):
            w = s[j : j + k]
            if set(w) <= set("ACGT") and gc_ok(w):
                exp.append(pos + j)
        pos += len(s) + 1
    assert km_s.kmer_sba_start_indices.tolist() == exp


@pytest.mark.parametrize("seed", [31, 32])
def test_large_facade_fuzz(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 8))
    seq_list = _random_seq_list(rng, "ACGT", int(rng.integers(1, 4)), k, 90)
    both = bool(seed % 2)
    if both:
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="both")
        km = Kmers.from_strand(sc, min_kmer_len=k, max_kmer_len=k,
                               source_strand="both")
    else:
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=k, max_kmer_len=k)
    km.sort()
    lk = LargeKmers.from_records(seq_list, k, k, both_strands=both)
    mesh = make_mesh(int(rng.choice([2, 4])))
    lk.sort(mesh)
    np.testing.assert_array_equal(
        lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
    )
    c1, t1 = lk.get_kmer_group_counts(k, max_counts_bin=30)
    c2, t2 = km.get_kmer_group_counts(k, max_counts_bin=30)
    np.testing.assert_array_equal(
        np.asarray(c1)[:31].astype(np.int64), np.asarray(c2)[:31]
    )
    assert t1 == t2


@pytest.mark.parametrize(
    "seed,alphabet,k",
    [
        (11, "ACGTN", 5),
        (12, "ACGTRYSWKMBDHVN", 4),
        (13, "ACGTN", 9),
        (14, "ACGT", 7),  # 2-bit regression through the same oracle
    ],
)
def test_canonical_iupac_fuzz(seed, alphabet, k):
    """Round 5: canonical statistics on IUPAC genomes (4-bit lanes with the
    per-nibble rank complement) — dense, customized-gather, mesh, and
    LargeKmers paths all pinned to a string oracle min(kmer, revcomp)."""
    rng = np.random.default_rng(seed)
    seq_list = _random_seq_list(rng, alphabet, int(rng.integers(1, 4)), k, 80)
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")

    canon = Counter()
    for _, s in seq_list:
        for j in range(len(s) - k + 1):
            km_s = s[j : j + k]
            canon[min(km_s, _rc(km_s))] += 1
    exp_hist = Counter(canon.values())
    exp_total = sum(canon.values())

    def check(counts, total):
        for size in range(1, 31):
            assert int(counts[size]) == exp_hist.get(size, 0), size
        assert int(total) == exp_total

    km = Kmers(sc, min_kmer_len=1, max_kmer_len=max(k, 4))
    check(*km.get_canonical_kmer_group_counts(k, max_counts_bin=30))
    check(*km.get_canonical_kmer_group_counts(k, max_counts_bin=30,
                                              mesh=make_mesh(4)))
    # customized position set (same rows, shuffled) takes the gather paths
    km2 = Kmers(sc, min_kmer_len=1, max_kmer_len=max(k, 4))
    pos = np.asarray(km2.kmer_sba_start_indices)
    rng.shuffle(pos)
    km2.kmer_sba_start_indices = pos
    check(*km2.get_canonical_kmer_group_counts(k, max_counts_bin=30))
    check(*km2.get_canonical_kmer_group_counts(k, max_counts_bin=30,
                                               mesh=make_mesh(4)))
    # the 64-bit regime
    lk = LargeKmers.from_records(seq_list, 1, max(k, 4))
    lk.sort(make_mesh(2))
    check(*lk.get_canonical_kmer_group_counts(k, max_counts_bin=30))


def test_canonical_queries_iupac():
    """Canonical queries accept uppercase IUPAC (round 5 — was ACGT-only)."""
    rng = np.random.default_rng(21)
    seq_list = _random_seq_list(rng, "ACGTN", 2, 8, 60)
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=1, max_kmer_len=8)
    km.sort()
    K = 6
    queries = [seq_list[0][1][:K], "N" * K, "RYSWKM"]
    want = []
    for q in queries:
        tot = sum(
            1 for _, s in seq_list for i in range(len(s) - K + 1)
            if s[i : i + K] == q
        )
        r = _rc(q)
        if r != q:
            tot += sum(
                1 for _, s in seq_list for i in range(len(s) - K + 1)
                if s[i : i + K] == r
            )
        want.append(tot)
    assert km.count_queries_canonical(queries, K).tolist() == want
    with pytest.raises(ValueError, match="uppercase IUPAC"):
        km.count_queries_canonical(["acgtac"], K)


@pytest.mark.parametrize("seed", [31, 32, 33, 34, 35, 36])
def test_large_suffix_fuzz(seed):
    """Round 5: suffix-mode LargeKmers differential fuzz — random alphabets,
    repeat-seeded genomes (multi-round refinement), random strand config,
    all pinned to the uint32 engine at kmer_len=None AND a random bounded
    kmer_len."""
    rng = np.random.default_rng(seed)
    alphabet = ["ACGT", "ACGTN"][seed % 2]
    seq_list = _random_seq_list(rng, alphabet, int(rng.integers(1, 4)), 6, 90)
    if seed % 3 == 0:
        # plant a repeat so refinement rounds actually run
        name0, s0 = seq_list[0]
        unit = s0[: min(40, len(s0))]
        seq_list[0] = (name0, (unit * 4 + s0)[:300])
    both = bool(seed % 2 == 0 and alphabet == "ACGT")
    track = both and bool(seed % 4 == 0)
    if both:
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="both")
        km = Kmers.from_strand(
            sc, min_kmer_len=1, max_kmer_len=None, source_strand="both",
            track_strands_separately=track,
        )
    else:
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
    km.sort()
    lk = LargeKmers.from_records(
        seq_list, 1, None, both_strands=both, track_strands_separately=track
    )
    lk.sort(make_mesh(int(rng.choice([2, 4]))))
    np.testing.assert_array_equal(
        lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
    )
    kq = int(rng.integers(2, 7))
    for K in (None, kq):
        c1, t1 = lk.get_kmer_group_counts(K, max_counts_bin=30)
        c2, t2 = km.get_kmer_group_counts(K, max_counts_bin=30)
        np.testing.assert_array_equal(
            np.asarray(c1)[:31].astype(np.int64), np.asarray(c2)[:31]
        )
        assert t1 == t2
