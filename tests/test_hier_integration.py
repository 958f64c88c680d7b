"""Hierarchical (node, local) meshes through the PUBLIC API — round-5
integration of parallel/hier.py's two-stage exchange into every mesh sort
family (VERDICT round-4 item 3).

``Kmers.sort(mesh=)`` / ``LargeKmers.sort(mesh)`` now accept a 2-D
``(node, local)`` mesh (parallel.hier.make_mesh2): shard-level math is
identical (jax linearizes tuple collective axes row-major = global shard
order), and the sample sort's exchange becomes the two-stage node-aggregated
all_to_all — stage A over the ``node`` axis (DCN on a real pod), stage B
over ``local`` (ICI). Every output must be BYTE-IDENTICAL to the flat 1-D
mesh at the same total device count.
"""

import jax
import numpy as np
import pytest

from genome_kmers_tpu import Kmers, LargeKmers, SequenceCollection
from genome_kmers_tpu.ops.filters import GcContentFilter
from genome_kmers_tpu.parallel.distributed import make_mesh
from genome_kmers_tpu.parallel.hier import make_mesh2

# the whole battery scales with the virtual device count, so
# GKT_TEST_DEVICES=16/32 re-runs it at larger meshes (the committed 16/32
# runs are recorded in RESULTS.md, VERDICT round-4 item 3 done criterion)
_N = None  # resolved lazily (jax initializes after conftest)


def _ndev():
    global _N
    if _N is None:
        _N = len(jax.devices())
    return _N


def _shapes():
    n = _ndev()
    return [(2, n // 2), (n // 2, 2)]


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(2)
    seqs = [
        ("a", "".join(rng.choice(list("ACGT"), 4000))),
        ("b", "".join(rng.choice(list("ACGT"), 3000))),
    ]
    return seqs, SequenceCollection(sequence_list=seqs, strands_to_load="forward")


@pytest.mark.parametrize("shape_idx", [0, 1])
class TestHierByteIdentity:
    def test_dense_bounded(self, genome, shape_idx):
        shape = _shapes()[shape_idx]
        _, sc = genome
        km_f = Kmers(sc, min_kmer_len=8, max_kmer_len=31)
        km_f.sort(mesh=make_mesh(_ndev()))
        km_h = Kmers(sc, min_kmer_len=8, max_kmer_len=31)
        km_h.sort(mesh=make_mesh2(*shape))
        np.testing.assert_array_equal(
            km_f.kmer_sba_start_indices, km_h.kmer_sba_start_indices
        )
        cf, tf = km_f.get_kmer_group_counts(8, max_counts_bin=30)
        ch, th = km_h.get_kmer_group_counts(8, max_counts_bin=30)
        np.testing.assert_array_equal(np.asarray(cf), np.asarray(ch))
        assert int(tf) == int(th)
        filt = GcContentFilter(0.3, 0.7, 8)
        cf, tf = km_f.get_kmer_group_counts(8, kmer_filter_func=filt,
                                            max_counts_bin=30)
        ch, th = km_h.get_kmer_group_counts(8, kmer_filter_func=filt,
                                            max_counts_bin=30)
        np.testing.assert_array_equal(np.asarray(cf), np.asarray(ch))
        assert int(tf) == int(th)
        # distributed queries over the retained 2-D layout
        qs = ["ACGTACGT", "TTTTTTTT"]
        np.testing.assert_array_equal(
            km_f.count_queries(qs, 8), km_h.count_queries(qs, 8)
        )

    def test_ragged_custom_positions(self, genome, shape_idx):
        shape = _shapes()[shape_idx]
        _, sc = genome
        rng = np.random.default_rng(9)
        km0 = Kmers(sc, min_kmer_len=8, max_kmer_len=31)
        pos = np.asarray(km0.kmer_sba_start_indices)
        rng.shuffle(pos)
        km_f = Kmers(sc, min_kmer_len=8, max_kmer_len=31)
        km_f.kmer_sba_start_indices = pos.copy()
        km_f.sort(mesh=make_mesh(_ndev()))
        km_h = Kmers(sc, min_kmer_len=8, max_kmer_len=31)
        km_h.kmer_sba_start_indices = pos.copy()
        km_h.sort(mesh=make_mesh2(*shape))
        np.testing.assert_array_equal(
            km_f.kmer_sba_start_indices, km_h.kmer_sba_start_indices
        )

    def test_unbounded(self, genome, shape_idx):
        shape = _shapes()[shape_idx]
        _, sc = genome
        km_f = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
        km_f.sort(mesh=make_mesh(_ndev()))
        km_h = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
        km_h.sort(mesh=make_mesh2(*shape))
        np.testing.assert_array_equal(
            km_f.kmer_sba_start_indices, km_h.kmer_sba_start_indices
        )
        cf, tf = km_f.get_kmer_group_counts(None, max_counts_bin=30)
        ch, th = km_h.get_kmer_group_counts(None, max_counts_bin=30)
        np.testing.assert_array_equal(np.asarray(cf), np.asarray(ch))
        assert int(tf) == int(th)

    def test_canonical(self, genome, shape_idx):
        shape = _shapes()[shape_idx]
        _, sc = genome
        km = Kmers(sc, min_kmer_len=8, max_kmer_len=31)
        km.sort()
        cf, tf = km.get_canonical_kmer_group_counts(8, max_counts_bin=30,
                                                    mesh=make_mesh(_ndev()))
        ch, th = km.get_canonical_kmer_group_counts(8, max_counts_bin=30,
                                                    mesh=make_mesh2(*shape))
        np.testing.assert_array_equal(np.asarray(cf), np.asarray(ch))
        assert int(tf) == int(th)

    def test_large_suffix(self, genome, shape_idx):
        shape = _shapes()[shape_idx]
        seqs, _ = genome
        lk_f = LargeKmers.from_records(seqs, 1, None)
        lk_f.sort(make_mesh(_ndev()))
        lk_h = LargeKmers.from_records(seqs, 1, None)
        lk_h.sort(make_mesh2(*shape))
        np.testing.assert_array_equal(
            lk_f.sorted_positions(), lk_h.sorted_positions()
        )
        cf, tf = lk_f.get_kmer_group_counts(None, max_counts_bin=30)
        ch, th = lk_h.get_kmer_group_counts(None, max_counts_bin=30)
        np.testing.assert_array_equal(cf, ch)
        assert tf == th


def test_checkpoint_across_mesh_shapes(genome, tmp_path):
    """A layout sorted on a 2-D mesh checkpoints and restores onto a 1-D
    mesh (and vice versa) — mesh shape is a runtime property, not part of
    the checkpoint contract."""
    seqs, _ = genome
    lk = LargeKmers.from_records(seqs, 4, 31)
    lk.sort(make_mesh2(2, 4))
    want_c, want_t = lk.get_kmer_group_counts(31, max_counts_bin=30)
    lk.save_checkpoint(tmp_path / "ck2d")
    lk2 = LargeKmers.from_records(seqs, 4, 31)
    lk2.load_checkpoint(tmp_path / "ck2d", make_mesh(4))
    c, t = lk2.get_kmer_group_counts(31, max_counts_bin=30)
    np.testing.assert_array_equal(c, want_c)
    assert t == want_t
    lk3 = LargeKmers.from_records(seqs, 4, 31)
    lk3.load_checkpoint(tmp_path / "ck2d", make_mesh2(4, 2))
    c3, t3 = lk3.get_kmer_group_counts(31, max_counts_bin=30)
    np.testing.assert_array_equal(c3, want_c)
    assert t3 == want_t


def test_three_axis_mesh_rejected(genome):
    import jax
    from jax.sharding import Mesh

    _, sc = genome
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh3 = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2), ("a", "b", "c"))
    km = Kmers(sc, min_kmer_len=8, max_kmer_len=31)
    with pytest.raises(NotImplementedError, match="1-D.*or 2-D"):
        km.sort(mesh=mesh3)


def test_non_pow2_2d_mesh(genome):
    """(3, 2) and (2, 3) node/local splits over 6 of the 8 virtual devices
    — non-power-of-2 hierarchies stay byte-identical to the flat 6-device
    mesh (splitter math and the two-stage exchange have no pow2
    assumptions)."""
    if _ndev() < 6:
        pytest.skip("needs 6 devices")
    _, sc = genome
    km_f = Kmers(sc, min_kmer_len=8, max_kmer_len=31)
    km_f.sort(mesh=make_mesh(6))
    for shape in [(3, 2), (2, 3)]:
        km_h = Kmers(sc, min_kmer_len=8, max_kmer_len=31)
        km_h.sort(mesh=make_mesh2(*shape))
        np.testing.assert_array_equal(
            km_f.kmer_sba_start_indices, km_h.kmer_sba_start_indices
        )
