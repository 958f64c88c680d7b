#!/usr/bin/env python
"""Stress soak: oracle-parity and distributed-parity sweeps over random
genomes/parameters. Usage: python tools/run_soak.py [n_oracle] [n_dist]
(defaults 150/40; run from the repo root)."""
import sys as _sys
N_ORACLE = int(_sys.argv[1]) if len(_sys.argv) > 1 else 150
N_DIST = int(_sys.argv[2]) if len(_sys.argv) > 2 else 40
import os
os.environ['JAX_PLATFORMS']='cpu'
N_DEV = int(os.environ.get('GKT_TEST_DEVICES', '8'))
os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')+f' --xla_force_host_platform_device_count={N_DEV}'
import jax; jax.config.update('jax_platforms','cpu')
import sys; sys.path.insert(0, 'tests')
import numpy as np, jax.numpy as jnp
from test_fuzz import random_case
from oracle import expected_kmers
from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.parallel import make_mesh, sample_sort_positions
from genome_kmers_tpu.ops.sort import sort_positions
from genome_kmers_tpu.ops.keys import cap_lengths, compute_valid_len

fails = 0
for seed in range(224, 224 + N_ORACLE):
    seq_list, min_k, max_k = random_case(seed)
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k); km.sort()
    _, _, _, exp_idx = expected_kmers(seq_list, min_k, max_k)
    if list(km.kmer_sba_start_indices) != exp_idx:
        print("FAIL", seed, min_k, max_k); fails += 1
print(f"oracle soak: {N_ORACLE-fails}/{N_ORACLE} ok", flush=True)

# random mesh SIZE per case (2..N_DEV devices; GKT_TEST_DEVICES raises the pool)
dfails = 0
mesh_rng = np.random.default_rng(77)
for seed in range(500, 500 + N_DIST):
    mesh = make_mesh(int(mesh_rng.integers(2, N_DEV + 1)))
    seq_list, min_k, max_k = random_case(seed)
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    dc = sc.device_cache("forward")
    pos = jnp.asarray(km.kmer_sba_start_indices)
    cap = cap_lengths(compute_valid_len(pos, dc.seg_starts, dc.seg_ends), max_k)
    truth = np.asarray(sort_positions(dc.packed, pos, cap, max_k, packed2=dc.packed2 if (max_k and max_k<=64) else None))
    got = np.asarray(sample_sort_positions(dc.packed, pos, dc.seg_starts, dc.seg_ends, max_k, mesh, packed2=dc.packed2))
    if not np.array_equal(got, truth):
        print("DFAIL", seed, min_k, max_k); dfails += 1
print(f"distributed soak (incl. suffix/long-k): {N_DIST-dfails}/{N_DIST} ok")

# filtered-stats soak: random library filters vs the scalar-oracle walk
# (flag-plane path engaged through the public API; raise parity included)
N_FILT = int(_sys.argv[3]) if len(_sys.argv) > 3 else 60
from oracle import expected_hist
from genome_kmers_tpu.ops.filters import (
    GcContentFilter, HomopolymerFilter, NoAmbiguousBasesFilter,
)

ffails = 0
for seed in range(900, 900 + N_FILT):
    seq_list, min_k, max_k = random_case(seed)
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k); km.sort()
    rng = np.random.default_rng(seed * 7 + 1)
    hi = max_k if max_k is not None else min(len(s) for _, s in seq_list)
    k = int(rng.integers(min_k, hi + 1))
    which = seed % 3
    if which == 0:
        lo_f, hi_f = sorted(rng.random(2))
        filt = GcContentFilter(float(lo_f), float(hi_f), k)
    elif which == 1:
        filt = HomopolymerFilter(int(rng.integers(1, k + 2)), k)
    else:
        filt = NoAmbiguousBasesFilter(k)
    sba = km._host_sba()
    _, _, sorted_kmers, _ = expected_kmers(seq_list, min_k, max_k)
    sorted_pos = list(km.kmer_sba_start_indices)

    exp_err = got_err = None
    exp = got = None
    try:
        # the oracle evaluates the scalar filter at every sorted position;
        # truncation raises exactly where the reference's walk would
        keep_mask = [None] * len(sorted_pos)
        for i, p in enumerate(sorted_pos):
            keep_mask[i] = bool(filt(sba, "+", int(p)))
        exp = expected_hist(sorted_kmers, k, keep=lambda i: keep_mask[i])
    except ValueError as e:
        exp_err = str(e)
    try:
        got = km.get_kmer_group_counts(k, kmer_filter_func=filt)
    except ValueError as e:
        got_err = str(e)
    ok = (exp_err == got_err) if (exp_err or got_err) else (
        np.array_equal(np.asarray(got[0], dtype=np.int64), exp[0])
        and int(got[1]) == int(exp[1])
    )
    if not ok:
        print("FFAIL", seed, type(filt).__name__, k, exp_err, got_err); ffails += 1
print(f"filtered soak: {N_FILT-ffails}/{N_FILT} ok")
