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
