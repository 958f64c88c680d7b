"""Unbounded (suffix-mode) and beyond-word-limit group statistics on the
mesh — VERDICT round-3 item 2: ``get_kmer_group_counts(mesh=, kmer_len=None)``
and kmer_len past the key-word limits must equal the single-chip engine,
via converged refinement run ids (parallel.sample_sort.
distributed_adjacent_gids; a suffix-mode ``sort(mesh=...)`` retains its run
ids for zero-round reuse). Reference semantics: unbounded compare-to-segment-
end, reference kmers.py:315-316, 391-393."""

import numpy as np

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.ops.filters import gen_kmer_gc_content_filter_func
from genome_kmers_tpu.parallel import make_mesh

def test_unbounded_mesh_stats_parity():
    rng = np.random.default_rng(12)
    # repeats => real multi-member suffix groups
    core = "".join(rng.choice(list("ACGT"), size=200))
    seqs = [
        ("r1", core + "".join(rng.choice(list("ACGT"), size=900)) + core),
        ("r2", core[:150] + "".join(rng.choice(list("ACGT"), size=500))),
        ("r3", "".join(rng.choice(list("ACGT"), size=400, p=[0.7, 0.1, 0.1, 0.1]))),
    ]
    mesh = make_mesh(8)


    def ref(seqs, min_k, max_k, kmer_len, **kw):
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
        km.sort()
        return km, km.get_kmer_group_counts(kmer_len, max_counts_bin=30, **kw)


    # 1. suffix-mode sort(mesh) + suffix stats (gid_full reuse)
    sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
    km_m = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
    km_m.sort(mesh=mesh)
    assert km_m._dist_cache is not None and km_m._dist_cache.gid_full is not None
    km_s, (c_ref, t_ref) = ref(seqs, 1, None, None)
    c_m, t_m = km_m.get_kmer_group_counts(None, max_counts_bin=30, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(c_m), np.asarray(c_ref))
    assert t_m == t_ref
    print("1. suffix mesh stats (gid_full reuse) ok:", t_m)

    # bounded kmer_len on the suffix-sorted mesh cache (word path still works)
    c_m2, t_m2 = km_m.get_kmer_group_counts(5, max_counts_bin=30, mesh=mesh)
    c_r2, t_r2 = km_s.get_kmer_group_counts(5, max_counts_bin=30)
    np.testing.assert_array_equal(np.asarray(c_m2), np.asarray(c_r2))
    assert t_m2 == t_r2
    print("2. bounded stats on suffix mesh cache ok:", t_m2)

    # 3. filtered suffix stats on mesh (plane mask + compaction + fresh gids) —
    #    min_kmer_len=8 so the k=8 GC window never truncates (it raises there,
    #    by reference semantics)
    f = gen_kmer_gc_content_filter_func(0.25, 0.75, 8)
    km_f1 = Kmers(SequenceCollection(sequence_list=seqs, strands_to_load="forward"),
                  min_kmer_len=8, max_kmer_len=None)
    km_f1.sort()
    km_f2 = Kmers(SequenceCollection(sequence_list=seqs, strands_to_load="forward"),
                  min_kmer_len=8, max_kmer_len=None)
    km_f2.sort(mesh=mesh)
    cf_r, tf_r = km_f1.get_kmer_group_counts(None, kmer_filter_func=f, max_counts_bin=30)
    cf_m, tf_m = km_f2.get_kmer_group_counts(None, kmer_filter_func=f, max_counts_bin=30, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(cf_m), np.asarray(cf_r))
    assert tf_m == tf_r
    print("3. filtered suffix mesh stats ok:", tf_m)

    # 4. kmer_len=None stats on a BOUNDED-sorted mesh cache (adjacency walk parity)
    sc2 = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
    km_b = Kmers(sc2, min_kmer_len=1, max_kmer_len=12)
    km_b.sort(mesh=mesh)
    km_b1 = Kmers(SequenceCollection(sequence_list=seqs, strands_to_load="forward"), min_kmer_len=1, max_kmer_len=12)
    km_b1.sort()
    cb_m, tb_m = km_b.get_kmer_group_counts(None, max_counts_bin=30, mesh=mesh)
    cb_r, tb_r = km_b1.get_kmer_group_counts(None, max_counts_bin=30)
    np.testing.assert_array_equal(np.asarray(cb_m), np.asarray(cb_r))
    assert tb_m == tb_r
    print("4. suffix stats on bounded mesh cache ok:", tb_m)

    # 5. beyond-limit kmer_len on a 4-bit (IUPAC) genome: limit is 32
    seqs_n = [
        ("n1", core + "N" + core + "".join(rng.choice(list("ACGTN"), size=300))),
        ("n2", "".join(rng.choice(list("ACGT"), size=500))),
    ]
    sc_n = SequenceCollection(sequence_list=seqs_n, strands_to_load="forward")
    km_n = Kmers(sc_n, min_kmer_len=1, max_kmer_len=40)
    km_n.sort(mesh=mesh)
    assert km_n._dist_cache is not None and km_n._dist_cache.gid_full_k == 40
    km_n1 = Kmers(SequenceCollection(sequence_list=seqs_n, strands_to_load="forward"), min_kmer_len=1, max_kmer_len=40)
    km_n1.sort()
    cn_m, tn_m = km_n.get_kmer_group_counts(40, max_counts_bin=30, mesh=mesh)
    cn_r, tn_r = km_n1.get_kmer_group_counts(40, max_counts_bin=30)
    np.testing.assert_array_equal(np.asarray(cn_m), np.asarray(cn_r))
    assert tn_m == tn_r
    print("5. beyond-limit k=40 (4-bit, gid_full reuse) ok:", tn_m)
    # and a DIFFERENT beyond-limit kmer_len (fresh refinement on the cache)
    cn_m2, tn_m2 = km_n.get_kmer_group_counts(35, max_counts_bin=30, mesh=mesh)
    cn_r2, tn_r2 = km_n1.get_kmer_group_counts(35, max_counts_bin=30)
    np.testing.assert_array_equal(np.asarray(cn_m2), np.asarray(cn_r2))
    assert tn_m2 == tn_r2
    print("6. beyond-limit k=35 (fresh refinement) ok:", tn_m2)

    # 7. no-cache path: single-chip sorted, then mesh stats at kmer_len=None
    km_sc = Kmers(SequenceCollection(sequence_list=seqs, strands_to_load="forward"), min_kmer_len=1, max_kmer_len=None)
    km_sc.sort()
    cs_m, ts_m = km_sc.get_kmer_group_counts(None, max_counts_bin=30, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(cs_m), np.asarray(c_ref))
    assert ts_m == t_ref
    print("7. no-cache mesh suffix stats ok:", ts_m)

    # 8. get_kmer_count mesh parity at None
    assert km_m.get_kmer_count(None, mesh=mesh, min_group_size=2) == km_s.get_kmer_count(None, min_group_size=2)
    print("8. count parity ok")



def test_unbounded_overflow_retry_parity():
    """The fused refinement round's overflow-retry path (capacity doubling
    through _refine_round_jit, gid re-threading after a failed attempt)
    must stay exact — an absurdly small capacity_factor forces retries on
    every round. Repeat-heavy genome so multiple refinement rounds run."""
    import jax.numpy as jnp

    from genome_kmers_tpu.ops.keys import (
        compute_seg_ends,
        pack_rank2_words,
        pack_rank_words,
    )
    from genome_kmers_tpu.ops.sort import sort_positions_suffix_dense
    from genome_kmers_tpu.parallel.sample_sort import (
        sample_sort_positions_unbounded,
    )

    rng = np.random.default_rng(31)
    unit = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=80)
    sba = np.concatenate([np.tile(unit, 6),
                          rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                                     size=300)])
    n_bp = len(sba)
    seg_starts = jnp.zeros(1, dtype=jnp.uint32)
    seg_ends = compute_seg_ends(seg_starts, n_bp)
    packed = pack_rank_words(jnp.asarray(sba))
    packed2 = pack_rank2_words(jnp.asarray(sba))
    positions = jnp.arange(n_bp, dtype=jnp.uint32)
    expected = np.asarray(
        sort_positions_suffix_dense(packed, seg_starts, seg_ends, n_bp, 1,
                                    None)
    )
    mesh = make_mesh(4)
    for p2 in (packed2, None):
        got = np.asarray(
            sample_sort_positions_unbounded(
                packed, positions, seg_starts, seg_ends, mesh, packed2=p2,
                n_samples=4, capacity_factor=0.05,
            )
        )
        assert np.array_equal(got, expected)
