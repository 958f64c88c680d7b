"""Worker for the localhost multi-process distributed tests.

Launched N times by tests/test_multiprocess.py with
``python mp_worker.py <port> <num_processes> <process_id> <outdir>``.
Each process joins a jax.distributed cluster over 127.0.0.1, builds a mesh
spanning every process, and runs the full distributed pipeline — sample sort
-> ragged group histogram -> count queries -> sharded checkpoint save +
restore onto a different-size mesh — asserting exact equality against a
pure-Python oracle computed locally. This is the only way the
``jax.process_count() > 1`` branch of ``put_global``
(parallel/distributed.py) ever executes; single-process tests cannot reach
it.

Exit code 0 + an ``ok`` result file mean every check passed.
"""

import json
import os
import sys
import traceback


def main() -> int:
    port, n_procs, pid, outdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_procs,
        process_id=pid,
    )
    assert jax.process_count() == n_procs, jax.process_count()

    import numpy as np
    from jax.experimental import multihost_utils

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))

    from oracle import expected_kmers

    from genome_kmers_tpu.ops.keys import (
        compute_seg_ends,
        pack_rank2_words,
        pack_rank_words,
    )
    from genome_kmers_tpu.parallel import (
        distributed_count_queries,
        distributed_group_size_histogram_ragged,
        make_mesh,
        sample_sort_positions_ragged,
    )
    from genome_kmers_tpu.parallel.checkpoint import (
        load_sharded_index,
        save_sharded_index,
    )

    results = {"process_count": jax.process_count(), "device_count": jax.device_count()}

    def gather_valid(rag_pos, rag_pad):
        pos = multihost_utils.process_allgather(rag_pos, tiled=True)
        pad = multihost_utils.process_allgather(rag_pad, tiled=True)
        return np.asarray(pos)[np.asarray(pad) == 0]

    def oracle_hist(sorted_kmers, min_gs, max_gs, max_bin):
        counts = np.zeros(max_bin + 1, dtype=np.int64)
        total = 0
        i = 0
        while i < len(sorted_kmers):
            j = i
            while j < len(sorted_kmers) and sorted_kmers[j] == sorted_kmers[i]:
                j += 1
            size = j - i
            if size >= min_gs and (max_gs is None or size <= max_gs):
                counts[min(size, max_bin)] += 1
                total += size
            i = j
        return counts, total

    # Two configs: IUPAC genome on the 4-bit path, ACGT genome on the 2-bit
    # path (cap rides as an explicit key lane there).
    rng = np.random.default_rng(20260817)
    configs = []
    for name, alphabet, k in (("iupac_k5", "ACGTN", 5), ("acgt_k9", "ACGT", 9)):
        seqs = []
        for r, length in enumerate((97, 53, 71)):
            seqs.append(
                ("rec%d" % r, "".join(rng.choice(list(alphabet), size=length)))
            )
        configs.append((name, seqs, k))

    mesh = make_mesh()  # every global device
    results["mesh_devices"] = mesh.devices.size

    for name, seqs, k in configs:
        min_kmer_len = 1
        sba_str = "$".join(s for _, s in seqs)
        sba = np.frombuffer(sba_str.encode(), dtype=np.uint8).copy()
        seg_starts = np.zeros(len(seqs), dtype=np.uint32)
        acc = 0
        for i, (_, s) in enumerate(seqs):
            seg_starts[i] = acc
            acc += len(s) + 1

        import jax.numpy as jnp

        packed = np.asarray(pack_rank_words(jnp.asarray(sba)))
        two_bit = "N" not in sba_str
        packed2 = np.asarray(pack_rank2_words(jnp.asarray(sba))) if two_bit else None
        seg_ends = np.asarray(compute_seg_ends(jnp.asarray(seg_starts), len(sba)))

        unsorted_idx, _, sorted_kmers, sorted_idx = expected_kmers(
            seqs, min_kmer_len, k
        )
        positions = unsorted_idx.astype(np.uint32)

        # --- distributed sample sort (ragged device layout) ---
        rag_pos, rag_pad = sample_sort_positions_ragged(
            packed, positions, seg_starts, seg_ends, k, mesh, packed2=packed2
        )
        got_sorted = gather_valid(rag_pos, rag_pad)
        assert got_sorted.tolist() == sorted_idx, f"{name}: sorted order mismatch"

        # --- ragged distributed histogram, stitched across shard edges ---
        for min_gs, max_gs in ((1, None), (2, 4)):
            counts, total = distributed_group_size_histogram_ragged(
                packed,
                rag_pos,
                rag_pad,
                seg_starts,
                seg_ends,
                k,
                mesh,
                min_group_size=min_gs,
                max_group_size=max_gs,
                max_counts_bin=50,
                packed2=packed2,
            )
            exp_counts, exp_total = oracle_hist(sorted_kmers, min_gs, max_gs, 50)
            assert np.array_equal(np.asarray(counts).astype(np.int64), exp_counts), (
                f"{name}: histogram mismatch (min={min_gs}, max={max_gs})"
            )
            assert int(total) == exp_total, f"{name}: total mismatch"

        # --- distributed count queries over the sharded sorted index ---
        present = [s for s in sorted_kmers if len(s) == k][:3]
        queries = list(dict.fromkeys(present)) + ["A" * k]
        got_q = distributed_count_queries(
            packed, rag_pos, rag_pad, seg_starts, seg_ends, queries, k, mesh
        )
        exp_q = np.array([sorted_kmers.count(q) for q in queries], dtype=np.uint32)
        assert np.array_equal(np.asarray(got_q), exp_q), f"{name}: query mismatch"

        # --- hierarchical two-stage exchange: node axis == process
        # boundary (the realistic DCN split), intra-node fan-out second ---
        if two_bit:
            from genome_kmers_tpu.parallel.hier import (
                make_mesh2,
                sample_sort_positions_ragged_hier,
            )

            per_proc = [
                [d for d in jax.devices() if d.process_index == p]
                for p in range(jax.process_count())
            ]
            flat_devs = [d for row in per_proc for d in row]
            mesh2 = make_mesh2(
                len(per_proc), len(per_proc[0]), devices=flat_devs
            )
            rag_pos_h, rag_pad_h = sample_sort_positions_ragged_hier(
                packed, positions, seg_starts, seg_ends, k, mesh2,
                packed2=packed2,
            )
            got_h = gather_valid(rag_pos_h, rag_pad_h)
            assert got_h.tolist() == sorted_idx, f"{name}: hier sort mismatch"
            results["hier_exchange"] = {
                "nodes": len(per_proc), "local": len(per_proc[0]),
            }

        results[name] = {
            "n_kmers": int(len(positions)),
            "total": int(exp_total),
        }

    # --- unbounded (suffix-mode) mesh sort + ext_gid stats across the real
    # process boundary (round 5): a repeat-bearing genome so refinement
    # rounds actually execute, pinned against a suffix-string oracle ---
    from genome_kmers_tpu.parallel import sample_sort_positions_unbounded

    unit = "".join(rng.choice(list("ACGT"), size=40))
    rep_seq = unit * 6 + "".join(rng.choice(list("ACGT"), size=37))
    sba_u = np.frombuffer(rep_seq.encode(), dtype=np.uint8).copy()
    ss_u = np.zeros(1, dtype=np.uint32)
    se_u = np.array([len(sba_u) - 1], dtype=np.uint32)
    import jax.numpy as jnp

    packed_u = np.asarray(pack_rank_words(jnp.asarray(sba_u)))
    packed2_u = np.asarray(pack_rank2_words(jnp.asarray(sba_u)))
    pos_u = np.arange(len(sba_u), dtype=np.uint32)
    rag_pos_u, rag_pad_u, gid_u = sample_sort_positions_unbounded(
        packed_u, jnp.asarray(pos_u), jnp.asarray(ss_u), jnp.asarray(se_u),
        mesh, packed2=jnp.asarray(packed2_u), return_ragged=True,
    )
    suffixes = [rep_seq[p:] for p in range(len(rep_seq))]
    want_suffix_order = [
        p for _, p in sorted((s, p) for p, s in enumerate(suffixes))
    ]
    got_u = gather_valid(rag_pos_u, rag_pad_u)
    assert got_u.tolist() == want_suffix_order, "unbounded sort mismatch"
    counts_u, total_u = distributed_group_size_histogram_ragged(
        packed_u, rag_pos_u, rag_pad_u, ss_u, se_u, None, mesh,
        max_counts_bin=50, packed2=packed2_u, ext_gid=gid_u,
    )
    # distinct suffixes of one segment: every group is a singleton
    assert int(total_u) == len(rep_seq)
    assert int(np.asarray(counts_u)[1]) == len(rep_seq)
    results["unbounded_n"] = len(rep_seq)

    # --- sharded checkpoint: save on the full mesh, restore onto a smaller
    # mesh (one device per process) ---
    ckpt_dir = os.path.join(outdir, "ckpt")
    save_sharded_index(ckpt_dir, rag_pos, {"config": name}, packed_genome=None)
    one_per_proc = [
        [d for d in jax.devices() if d.process_index == p][0]
        for p in range(jax.process_count())
    ]
    mesh_b = make_mesh(devices=one_per_proc)
    restored, _, meta = load_sharded_index(ckpt_dir, mesh=mesh_b)
    assert restored.sharding.mesh.devices.size == len(one_per_proc)
    n_real = int(meta["__n_real__"])
    got_restored = np.asarray(
        multihost_utils.process_allgather(restored, tiled=True)
    )[:n_real]
    want = np.asarray(multihost_utils.process_allgather(rag_pos, tiled=True))
    assert np.array_equal(got_restored, want), "checkpoint round-trip mismatch"
    results["ckpt_mesh_b_devices"] = len(one_per_proc)

    results["ok"] = True
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(results, f)
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        sys.exit(1)
