"""The gather-free fresh-sort path (ops/sort.sort_positions_dense).

While a Kmers' _init_geometry is live its index is the canonical dense
start set, so Kmers.sort() builds key words as shifted slices of the packed
array over ALL SBA positions and folds non-start rows to the tail — no
per-row gathers (those are ~80% of the gather-based fresh build at 2^24
rows on v5e). These tests pin:

- bit-parity of sort_positions_dense against sort_positions over the
  canonical set (positions, retained lanes, cap lane presence), across
  alphabets, segment layouts, and (min, max) combos incl. the k % 16 == 0
  uniform edge where the cap lane doubles as the invalid discriminator;
- valid_len_all (scatter + cummax) against compute_valid_len on in-segment
  rows and 0 on separators;
- the revcomp-strand end-to-end case: from_strand instances iterate
  segments in record order = DESCENDING revcomp-SBA coordinates, the
  non-ascending-input case that rules out input-order (stable) tie-breaks
  on the gather paths — the dense path must still produce the
  position-ascending tie-break the reference's break_ties=True mode defines.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.ops.keys import (
    cap_lengths,
    compute_seg_ends,
    compute_valid_len,
    pack_rank2_words,
    pack_rank_words,
    valid_len_all,
)
from genome_kmers_tpu.ops.sort import sort_positions, sort_positions_dense

_RNG = np.random.default_rng(7)


def _make_sba(seg_lens, alphabet):
    parts = ["".join(_RNG.choice(list(alphabet), l)) for l in seg_lens]
    sba = "$".join(parts)
    arr = np.frombuffer(sba.encode(), dtype=np.uint8).copy()
    starts, s = [], 0
    for l in seg_lens:
        starts.append(s)
        s += l + 1
    return arr, np.asarray(starts, dtype=np.uint32)


def _canonical_positions(seg_starts, seg_ends, min_len):
    out = []
    for s, e in zip(seg_starts, np.asarray(seg_ends)):
        cnt = int(e) - int(s) + 1 - min_len + 1
        if cnt > 0:
            out.append(np.arange(s, s + cnt, dtype=np.uint32))
    return np.concatenate(out) if out else np.zeros(0, np.uint32)


@pytest.mark.parametrize("alphabet,two_bit_ok", [("ACGT", True), ("ACGTN", False)])
@pytest.mark.parametrize("seg_lens", [[200], [50, 3, 120, 1], [33, 17]])
@pytest.mark.parametrize("mn,mx", [(4, 4), (4, 8), (16, 16), (31, 31), (32, 32), (2, 32), (1, 5)])
def test_dense_matches_gather_path(alphabet, two_bit_ok, seg_lens, mn, mx):
    sba, seg_starts = _make_sba(seg_lens, alphabet)
    seg_starts_j = jnp.asarray(seg_starts)
    seg_ends = compute_seg_ends(seg_starts_j, len(sba))
    positions = _canonical_positions(seg_starts, seg_ends, mn)
    n = len(positions)
    if n <= 1:
        pytest.skip("degenerate")
    use2 = two_bit_ok and mx <= 64
    if not use2 and mx > 32:
        pytest.skip("4-bit single window tops out at 32")
    positions_j = jnp.asarray(positions)
    vl = compute_valid_len(positions_j, seg_starts_j, seg_ends)
    cap = cap_lengths(vl, mx)
    packed2 = pack_rank2_words(jnp.asarray(sba)) if use2 else None
    packed = pack_rank_words(jnp.asarray(sba)) if not use2 else None
    uniform = mn == mx

    want, want_lanes = sort_positions(
        packed, positions_j, cap, mx, packed2=packed2,
        uniform_cap=uniform, return_lanes=True,
    )
    got, got_lanes = sort_positions_dense(
        packed2 if use2 else packed, seg_starts_j, seg_ends, n, mn, mx,
        two_bit=use2, uniform_cap=uniform, return_lanes=True,
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    assert want_lanes["two_bit"] == got_lanes["two_bit"]
    assert want_lanes["built_k"] == got_lanes["built_k"]
    for a, b in zip(want_lanes["words"], got_lanes["words"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (want_lanes["cap"] is None) == (got_lanes["cap"] is None)
    if want_lanes["cap"] is not None:
        np.testing.assert_array_equal(
            np.asarray(want_lanes["cap"]), np.asarray(got_lanes["cap"])
        )


def test_valid_len_all_matches_per_position():
    sba, seg_starts = _make_sba([40, 1, 7, 25], "ACGTN")
    L = len(sba)
    seg_starts_j = jnp.asarray(seg_starts)
    seg_ends = compute_seg_ends(seg_starts_j, L)
    iota = jnp.arange(L, dtype=jnp.uint32)
    got = np.asarray(valid_len_all(seg_starts_j, seg_ends, iota))
    ref = np.asarray(compute_valid_len(iota, seg_starts_j, seg_ends))
    in_seg = np.zeros(L, dtype=bool)
    for s, e in zip(seg_starts, np.asarray(seg_ends)):
        in_seg[int(s) : int(e) + 1] = True
    np.testing.assert_array_equal(got[in_seg], ref[in_seg])
    assert (got[~in_seg] == 0).all()


_COMP = str.maketrans("ACGT", "TGCA")


def _rc(s: str) -> str:
    return s.translate(_COMP)[::-1]


@pytest.mark.parametrize("mn,mx", [(1, 8), (5, 5)])
def test_revcomp_strand_dense_sort_matches_forward_oracle(mn, mx):
    # from_strand rc instances feed NON-ascending initial positions (record
    # order = descending revcomp-SBA coordinates); the dense path must still
    # deliver the position-ascending tie-break.
    rng = np.random.default_rng(9)
    seqs = [
        ("r%d" % i, "".join(rng.choice(list("ACGT"), size=n)))
        for i, n in enumerate((83, 61, 47))
    ]
    sc_rc = SequenceCollection(sequence_list=seqs, strands_to_load="reverse_complement")
    km_rc = Kmers.from_strand(
        sc_rc, min_kmer_len=mn, max_kmer_len=mx, source_strand="reverse_complement"
    )
    km_rc.sort()

    seqs_rc = [(n, _rc(s)) for n, s in reversed(seqs)]
    sc_f = SequenceCollection(sequence_list=seqs_rc, strands_to_load="forward")
    km_f = Kmers(sc_f, min_kmer_len=mn, max_kmer_len=mx)
    km_f.sort()
    np.testing.assert_array_equal(
        km_rc.kmer_sba_start_indices, km_f.kmer_sba_start_indices
    )


@pytest.mark.parametrize("alphabet", ["ACGT", "ACGTN"])
@pytest.mark.parametrize("seg_lens", [[200], [50, 3, 120, 1], [33, 17], [90, 90]])
@pytest.mark.parametrize("mn,mx", [(1, None), (4, None), (1, 40), (2, 33), (1, 100)])
def test_suffix_dense_matches_gather_path(alphabet, seg_lens, mn, mx):
    from genome_kmers_tpu.ops.sort import sort_positions_suffix_dense

    sba, seg_starts = _make_sba(seg_lens, alphabet)
    seg_starts_j = jnp.asarray(seg_starts)
    seg_ends = compute_seg_ends(seg_starts_j, len(sba))
    positions = _canonical_positions(seg_starts, seg_ends, mn)
    n = len(positions)
    if n <= 1:
        pytest.skip("degenerate")
    positions_j = jnp.asarray(positions)
    vl = compute_valid_len(positions_j, seg_starts_j, seg_ends)
    cap = cap_lengths(vl, mx)
    packed = pack_rank_words(jnp.asarray(sba))

    want = sort_positions(packed, positions_j, cap, mx)
    got = sort_positions_suffix_dense(
        packed, seg_starts_j, seg_ends, n, mn, mx
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    if alphabet == "ACGT":
        # 2-bit refinement rounds (round 4: halved key lanes) — dense and
        # gather entries both must equal the 4-bit truth
        packed2 = pack_rank2_words(jnp.asarray(sba))
        got2 = sort_positions_suffix_dense(
            None, seg_starts_j, seg_ends, n, mn, mx, packed2=packed2
        )
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got2))
        got3 = sort_positions(None, positions_j, cap, mx, packed2=packed2)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got3))


@pytest.mark.parametrize("mn,mx", [(1, None), (2, None), (1, 150)])
def test_suffix_2bit_multi_round_repeats(mn, mx):
    """Long planted repeats force several refinement rounds (ties extend
    ~200 bases past the first window); 2-bit rounds == 4-bit rounds ==
    gather truth."""
    from genome_kmers_tpu.ops.keys import pack_rank2_words
    from genome_kmers_tpu.ops.sort import sort_positions_suffix_dense

    rng = np.random.default_rng(31)
    R = "".join(rng.choice(list("ACGT"), size=200))
    seqs = [R + "".join(rng.choice(list("ACGT"), size=40)) + R, R + "TT" + R]
    seg_lens = [len(s) for s in seqs]
    sba = np.frombuffer(("$".join(seqs)).encode(), dtype=np.uint8).copy()
    seg_starts = np.zeros(len(seqs), dtype=np.uint32)
    acc = 0
    for i, s in enumerate(seqs):
        seg_starts[i] = acc
        acc += len(s) + 1
    seg_starts_j = jnp.asarray(seg_starts)
    seg_ends = compute_seg_ends(seg_starts_j, len(sba))
    positions = _canonical_positions(seg_starts, seg_ends, mn)
    n = len(positions)
    positions_j = jnp.asarray(positions)
    vl = compute_valid_len(positions_j, seg_starts_j, seg_ends)
    cap = cap_lengths(vl, mx)
    packed = pack_rank_words(jnp.asarray(sba))
    packed2 = pack_rank2_words(jnp.asarray(sba))

    want = sort_positions(packed, positions_j, cap, mx)
    got_d4 = sort_positions_suffix_dense(packed, seg_starts_j, seg_ends, n, mn, mx)
    got_d2 = sort_positions_suffix_dense(
        None, seg_starts_j, seg_ends, n, mn, mx, packed2=packed2
    )
    got_g2 = sort_positions(None, positions_j, cap, mx, packed2=packed2)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got_d4))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got_d2))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got_g2))


def test_suffix_prefix_doubling_deep_repeats_string_oracle():
    """min_kmer_len=1, max_kmer_len=None on a genome with a 2kb repeat
    planted 5 times: the 2-bit path's prefix-doubling rounds
    (ops/sort._double_round2, O(log repeat) instead of O(repeat/32) window
    rounds) must match both the 4-bit window path and the absolute
    suffix-string oracle."""
    from genome_kmers_tpu.ops.keys import pack_rank2_words
    from genome_kmers_tpu.ops.sort import sort_positions_suffix_dense

    rng = np.random.default_rng(5)
    R = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=2000)
    parts = []
    for _ in range(5):
        parts.append(R)
        parts.append(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=150))
    # two segments so '$' handling is exercised under doubling
    sba = np.concatenate(
        parts[:4] + [np.frombuffer(b"$", dtype=np.uint8).copy()] + parts[4:]
    )
    n_sba = len(sba)
    cut = sum(len(p) for p in parts[:4])
    seg_starts = jnp.asarray(np.array([0, cut + 1], dtype=np.uint32))
    seg_ends = compute_seg_ends(seg_starts, n_sba)
    n = n_sba - 1  # every non-'$' position (min_kmer_len=1)
    packed = pack_rank_words(jnp.asarray(sba))
    packed2 = pack_rank2_words(jnp.asarray(sba))

    want = sort_positions_suffix_dense(packed, seg_starts, seg_ends, n, 1, None)
    got = sort_positions_suffix_dense(
        None, seg_starts, seg_ends, n, 1, None, packed2=packed2
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    s = sba.tobytes().decode()
    ends = np.asarray(seg_ends)
    def suffix(i):
        seg_end = ends[0] if i <= ends[0] else ends[1]
        return s[i : seg_end + 1]
    oracle = sorted((i for i in range(n_sba) if s[i] != "$"), key=suffix)
    np.testing.assert_array_equal(
        np.array(oracle, dtype=np.uint32), np.asarray(got)
    )


def test_suffix_dense_public_api_matches_materialized():
    # unbounded fresh sort routes through the dense first round; forcing
    # position materialization first takes the gather path — identical output
    rng = np.random.default_rng(13)
    seqs = [
        ("r%d" % i, "".join(rng.choice(list("ACGTN"), size=n)))
        for i, n in enumerate((130, 44, 71))
    ]
    for mn, mx in ((1, None), (3, None), (1, 48)):
        km_fresh = Kmers(
            SequenceCollection(sequence_list=seqs, strands_to_load="forward"),
            min_kmer_len=mn, max_kmer_len=mx,
        )
        assert km_fresh._init_geometry is not None
        km_fresh.sort()
        km_mat = Kmers(
            SequenceCollection(sequence_list=seqs, strands_to_load="forward"),
            min_kmer_len=mn, max_kmer_len=mx,
        )
        # assigning the (identical) index clears the geometry -> gather path
        km_mat.kmer_sba_start_indices = km_mat.kmer_sba_start_indices
        assert km_mat._init_geometry is None
        km_mat.sort()
        np.testing.assert_array_equal(
            km_fresh.kmer_sba_start_indices, km_mat.kmer_sba_start_indices
        )


@pytest.mark.parametrize("seg_lens", [[200], [50, 3, 120, 1], [33, 17]])
@pytest.mark.parametrize("mn,k", [(1, 4), (1, 17), (4, 31), (8, 4), (1, 32)])
def test_canonical_dense_matches_gather_kernel(seg_lens, mn, k):
    from genome_kmers_tpu.ops.canonical import (
        canonical_sizes_digest,
        canonical_sizes_digest_dense,
    )
    from genome_kmers_tpu.ops.groups import hist_from_sizes
    from genome_kmers_tpu.ops.sort import _PAD_POS, _bucket, _pad_to

    sba, seg_starts = _make_sba(seg_lens, "ACGT")
    seg_starts_j = jnp.asarray(seg_starts)
    seg_ends = compute_seg_ends(seg_starts_j, len(sba))
    positions = _canonical_positions(seg_starts, seg_ends, mn)
    n = len(positions)
    if n == 0:
        pytest.skip("degenerate")
    packed2 = pack_rank2_words(jnp.asarray(sba))
    mcb = 16

    positions_j = jnp.asarray(positions)
    vl = compute_valid_len(positions_j, seg_starts_j, seg_ends)
    n_pad = _bucket(n)
    positions_p = _pad_to(positions_j, n_pad, _PAD_POS)
    vl_p = _pad_to(vl, n_pad, jnp.uint32(0))
    w_size, w_qual, want_stats = canonical_sizes_digest(
        packed2, positions_p, vl_p, k
    )
    g_size, g_qual, got_stats = canonical_sizes_digest_dense(
        packed2, seg_starts_j, seg_ends, mn, k
    )
    np.testing.assert_array_equal(np.asarray(want_stats), np.asarray(got_stats))
    want_counts = hist_from_sizes(w_size, w_qual, mcb)
    got_counts = hist_from_sizes(g_size, g_qual, mcb)
    np.testing.assert_array_equal(np.asarray(want_counts), np.asarray(got_counts))


def test_canonical_dense_public_api_matches_materialized():
    # fresh instance (geometry live) routes dense; sorting first forces the
    # materialized gather path — outputs must be identical
    rng = np.random.default_rng(11)
    seqs = [
        ("r%d" % i, "".join(rng.choice(list("ACGT"), size=n)))
        for i, n in enumerate((97, 13, 55))
    ]
    for mn, mx, k in ((1, 8, 5), (4, 12, 12), (1, 40, 33)):
        km_fresh = Kmers(
            SequenceCollection(sequence_list=seqs, strands_to_load="forward"),
            min_kmer_len=mn, max_kmer_len=mx,
        )
        assert km_fresh._init_geometry is not None
        h1, t1 = km_fresh.get_canonical_kmer_group_counts(k, max_counts_bin=10)
        km_mat = Kmers(
            SequenceCollection(sequence_list=seqs, strands_to_load="forward"),
            min_kmer_len=mn, max_kmer_len=mx,
        )
        km_mat.sort()  # consumes _init_geometry -> gather path
        assert km_mat._init_geometry is None
        h2, t2 = km_mat.get_canonical_kmer_group_counts(k, max_counts_bin=10)
        np.testing.assert_array_equal(h1, h2)
        assert t1 == t2


def test_dense_path_taken_and_lanes_cached():
    # the fresh bounded-k sort must go dense (geometry live) and leave the
    # same lanes cache the gather path would
    sc = SequenceCollection(
        sequence_list=[("a", "ACGTACGTAAAGGGTTTACGT"), ("b", "TTTACGTACGT")],
        strands_to_load="forward",
    )
    km = Kmers(sc, min_kmer_len=4, max_kmer_len=8)
    assert km._init_geometry is not None
    km.sort()
    assert km._lanes_cache is not None
    assert km._lanes_cache["two_bit"] is True
    assert km._lanes_cache["built_k"] == 8
    # non-uniform (min < max): cap lane retained
    assert km._lanes_cache["cap"] is not None
    counts, total = km.get_kmer_group_counts(4)
    assert int(total) == km.get_kmer_count(4)
