"""Strided-pack ingest: host strided pack + device expansion must be
bit-identical to the direct per-position device pack, and the device cache
must build packed words WITHOUT uploading the byte SBA (the upload-bandwidth
optimization: the strided pack is 1/4 (2-bit) / 1/2 (4-bit) the bytes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_kmers_tpu.ops.keys import (
    expand_strided2,
    expand_strided4,
    pack_rank2_words,
    pack_rank_words,
)
from genome_kmers_tpu.ops.large import pack_rank2_strided_np, pack_rank_strided_np

SIZES = [1, 5, 15, 16, 17, 31, 64, 1000, 4097]


@pytest.mark.parametrize("n", SIZES)
def test_expand2_matches_direct_pack(n):
    rng = np.random.default_rng(n)
    sba = rng.choice(np.frombuffer(b"ACGT$", dtype=np.uint8), size=n)
    direct = np.asarray(pack_rank2_words(jnp.asarray(sba)))
    expanded = np.asarray(expand_strided2(jnp.asarray(pack_rank2_strided_np(sba)), n))
    np.testing.assert_array_equal(direct, expanded)


@pytest.mark.parametrize("n", SIZES)
def test_expand4_matches_direct_pack(n):
    rng = np.random.default_rng(1000 + n)
    sba = rng.choice(np.frombuffer(b"ACGTRYSWKMBDHVN$", dtype=np.uint8), size=n)
    direct = np.asarray(pack_rank_words(jnp.asarray(sba)))
    expanded = np.asarray(expand_strided4(jnp.asarray(pack_rank_strided_np(sba)), n))
    np.testing.assert_array_equal(direct, expanded)


def test_device_cache_builds_packed_words_without_byte_upload():
    from genome_kmers_tpu.sequence_collection import _DeviceCache

    rng = np.random.default_rng(0)
    sba = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=1234)
    dc = _DeviceCache(sba, np.zeros(1, dtype=np.uint32))

    p2 = dc.packed2
    assert dc._sba_dev is None, "packed2 build must not upload the byte SBA"
    np.testing.assert_array_equal(
        np.asarray(p2), np.asarray(pack_rank2_words(jnp.asarray(sba)))
    )

    p4 = dc.packed
    assert dc._sba_dev is None, "packed build must not upload the byte SBA"
    np.testing.assert_array_equal(
        np.asarray(p4), np.asarray(pack_rank_words(jnp.asarray(sba)))
    )


def test_device_cache_packed2_iupac_is_none_without_upload():
    from genome_kmers_tpu.sequence_collection import _DeviceCache

    sba = np.frombuffer(b"ACGTNNACGT", dtype=np.uint8).copy()
    dc = _DeviceCache(sba, np.zeros(1, dtype=np.uint32))
    assert dc.packed2 is None
    assert dc._sba_dev is None


class TestRankBasedScans:
    """Filter scans built from 2-bit packed words must equal the byte-SBA
    scans, and filtered statistics on ACGT genomes must never upload the
    byte SBA."""

    def _random_sba(self, seed, n_segs=4):
        rng = np.random.default_rng(seed)
        parts = []
        for i in range(n_segs):
            m = int(rng.integers(1, 200))
            parts.append(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=m))
        sba = np.concatenate(
            sum(([p, np.frombuffer(b"$", dtype=np.uint8)] for p in parts), [])
        )[:-1]
        seg_starts = np.zeros(n_segs, dtype=np.uint32)
        off = 0
        for i, p in enumerate(parts):
            seg_starts[i] = off
            off += len(p) + 1
        return sba, seg_starts

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_scans_match_byte_versions(self, seed):
        from genome_kmers_tpu.ops.filters import (
            _gc_cumsum,
            _gc_cumsum_ranks2,
            _run_lengths,
            _run_lengths_ranks2,
        )
        from genome_kmers_tpu.sequence_collection import _DeviceCache

        sba, seg_starts = self._random_sba(seed)
        dc = _DeviceCache(sba, seg_starts)
        sba_dev = jnp.asarray(sba)
        np.testing.assert_array_equal(
            np.asarray(_gc_cumsum_ranks2(dc.packed2)), np.asarray(_gc_cumsum(sba_dev))
        )
        np.testing.assert_array_equal(
            np.asarray(_run_lengths_ranks2(dc.packed2, dc.is_dollar)),
            np.asarray(_run_lengths(sba_dev)),
        )
        np.testing.assert_array_equal(
            np.asarray(dc.gc_cumsum), np.asarray(_gc_cumsum(sba_dev))
        )
        np.testing.assert_array_equal(
            np.asarray(dc.run_len), np.asarray(_run_lengths(sba_dev))
        )
        assert dc._sba_dev is None, "rank-based scans must not upload the bytes"

    def test_filtered_stats_never_upload_bytes_on_acgt(self):
        from genome_kmers_tpu import Kmers, SequenceCollection
        from genome_kmers_tpu.ops.filters import (
            crispr_ngg_pam_filter,
            gen_kmer_gc_content_filter_func,
            gen_kmer_homopolymer_filter_func,
            gen_no_ambiguous_bases_filter,
        )

        rng = np.random.default_rng(5)
        seqs = ["".join(rng.choice(list("ACGT"), size=n)) for n in (400, 260)]
        sc = SequenceCollection(
            sequence_list=[(f"chr{i}", s) for i, s in enumerate(seqs)],
            strands_to_load="forward",
        )
        km = Kmers(sc, min_kmer_len=23, max_kmer_len=23)
        km.sort()
        for f in (
            gen_kmer_gc_content_filter_func(0.3, 0.7, 23),
            gen_kmer_homopolymer_filter_func(3, 23),
            gen_no_ambiguous_bases_filter(23),
            crispr_ngg_pam_filter,
        ):
            km.get_kmer_count(23, kmer_filter_func=f)
            km.get_kmer_group_counts(23, kmer_filter_func=f)
        dc = sc.device_cache("forward")
        assert dc._sba_dev is None, "filtered stats on ACGT must not upload bytes"
