"""Headline benchmark: k=31 sorted k-mer index build throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "large_n"}.

The reference publishes no kmers.sort() numbers (BASELINE.md); its documented
scale is "whole-genome calculations can take hours" for a ~3.1 Gbp genome
(reference docs/overview.rst:20-21). We take the charitable end of that —
2 hours for 3.1e9 k-mers ≈ 430e3 kmers/s — as the baseline denominator, and
override it with a directly measured number when a BASELINE_MEASURED.json
(schema: {"kmers_per_s": N}) exists at the repo root. The reference cannot
execute in this image (no numba), so no measuring tool ships; drop the file
in by hand if a measured number becomes available.

Timing method: each measurement dispatches a CHAIN of sorts (output positions
feed the next sort — lax.sort is data-oblivious, so a sorted input costs the
same) and forces completion with ONE scalar transfer at the end. On the
remote axon backend a host transfer costs ~31 ms; timing single sorts against
it understates throughput ~7% at the default size. Per-sort time =
t_chain / CHAIN amortizes that to <1%.

Env overrides: GKT_BENCH_BP (default 2**24), GKT_BENCH_K (default 31),
GKT_BENCH_REPS (default 3), GKT_BENCH_CHAIN (default 3), GKT_BENCH_LARGE
(default 1: also measure BP=2**27 — the scaling cliff track; 0 to skip),
GKT_BENCH_FILTERED (default 1: also measure the warm GC-filtered
group-count query through the public API; 0 to skip).
The default size matches per-chip shard granularity in multi-chip production
runs (a 3.1-Gbp genome over a v5p-16 gives ~16M-kmer shards); measured
single-chip scaling: ~43M kmers/s at 2^24 kmers, ~16M at 2^27 (lax.sort is
O(n log^2 n) — per-shard sizes near 2^24 are the throughput sweet spot;
scale via the mesh, docs/development.md).
"""

import json
import os
import threading
import time

import numpy as np

DEFAULT_BASELINE_KMERS_PER_S = 430e3
LARGE_BP = 2**27


def measure(n_bp: int, k: int, reps: int, chain: int) -> float:
    """Median amortized fresh-index-build throughput (kmers/s) at one size.

    Measures what ``Kmers.sort()`` runs on a fresh index: the gather-free
    dense build (ops/sort.sort_positions_dense — shifted-slice key words +
    scatter/cummax valid_len + one stable lax.sort), which replaced the
    per-row key gathers that used to be ~80% of the build."""
    import jax
    import jax.numpy as jnp

    from genome_kmers_tpu.ops.keys import (
        compute_seg_ends,
        pack_rank2_words,
        pack_rank_words,
    )
    from genome_kmers_tpu.ops.sort import sort_positions_dense

    rng = np.random.default_rng(0)
    sba = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n_bp)

    sba_dev = jnp.asarray(sba)
    use2 = k <= 32
    packed_dev = pack_rank2_words(sba_dev) if use2 else pack_rank_words(sba_dev)
    seg_starts = jnp.zeros(1, dtype=jnp.uint32)
    seg_ends = compute_seg_ends(seg_starts, n_bp)
    n_kmers = n_bp - k + 1

    def run_chain(n_sorts):
        # Each link rebuilds the full sorted index (the dense build ignores
        # prior positions), with the previous result folded into seg_ends as
        # a zero-valued data dependency so links execute sequentially.
        # A scalar-digest transfer forces real device completion; on remote
        # backends block_until_ready can return before execution finishes
        # (measured: 2.8 ms "sorts" of 16M keys), so never time against it.
        se = seg_ends
        p = None
        for _ in range(n_sorts):
            p = sort_positions_dense(
                packed_dev, seg_starts, se, n_kmers, k, k,
                two_bit=use2, uniform_cap=True,
            )
            se = seg_ends + (p[0] & jnp.uint32(0))
        return float(jnp.sum(p))

    # two discarded runs: compile (or persistent-cache load, .jax_cache) then
    # steady-state warmup — same hygiene as the reference's discard_first_run
    # (reference profiling.py:128-131)
    run_chain(1)
    run_chain(1)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_chain(chain)
        times.append((time.perf_counter() - t0) / chain)
    return n_kmers / float(np.median(times))


def measure_filtered(n_bp: int, k: int, reps: int) -> float:
    """Median filtered group-count query time through the PUBLIC API (warm).

    Measures the marginal cost of ``get_kmer_group_counts(k, GC filter)`` on
    an already-sorted index: lanes flags (ops/filters lanes_spec) evaluate
    the filter directly on the retained sorted key lanes inside one fused
    program with the survivor histogram — zero genome gathers — and the
    speculative stage-2 histogram rides the single ~1 KB digest transfer.
    Returns kmers/s (n_kmers / t)."""
    from genome_kmers_tpu import Kmers, SequenceCollection
    from genome_kmers_tpu.ops.filters import GcContentFilter

    rng = np.random.default_rng(0)
    ranks = rng.integers(0, 4, n_bp).astype(np.uint8)
    seq = np.frombuffer(b"ACGT", dtype=np.uint8)[ranks].tobytes().decode("ascii")
    sc = SequenceCollection(sequence_list=[("chr1", seq)], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=k, max_kmer_len=k)
    km.sort()
    filt = GcContentFilter(0.3, 0.7, k)
    n_kmers = n_bp - k + 1

    km.get_kmer_group_counts(k, kmer_filter_func=filt)  # compile + plane build
    km.get_kmer_group_counts(k, kmer_filter_func=filt)  # steady-state warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        km.get_kmer_group_counts(k, kmer_filter_func=filt)
        times.append(time.perf_counter() - t0)
    return n_kmers / float(np.median(times))


def measure_suffix(n_bp: int, reps: int, chain: int) -> float:
    """Median suffix-mode (max_kmer_len=None) fresh-build throughput
    (suffixes/s) — the iterative-refinement path Kmers.sort() takes, with
    the round-4 2-bit folded first round. Chain links pay the per-round
    resolve sync each, like real sorts do."""
    import jax.numpy as jnp

    from genome_kmers_tpu.ops.keys import compute_seg_ends, pack_rank2_words
    from genome_kmers_tpu.ops.sort import sort_positions_suffix_dense

    rng = np.random.default_rng(0)
    sba = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n_bp)
    packed2 = pack_rank2_words(jnp.asarray(sba))
    seg_starts = jnp.zeros(1, dtype=jnp.uint32)
    seg_ends = compute_seg_ends(seg_starts, n_bp)

    def run_chain(n_sorts):
        se = seg_ends
        p = None
        for _ in range(n_sorts):
            p = sort_positions_suffix_dense(
                None, seg_starts, se, n_bp, 1, None, packed2=packed2
            )
            se = seg_ends + (p[0] & jnp.uint32(0))
        return float(jnp.sum(p))

    run_chain(1)
    run_chain(1)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_chain(chain)
        times.append((time.perf_counter() - t0) / chain)
    return n_bp / float(np.median(times))


def main():
    n_bp = int(os.environ.get("GKT_BENCH_BP", 2**24))
    k = int(os.environ.get("GKT_BENCH_K", 31))
    reps = int(os.environ.get("GKT_BENCH_REPS", 3))
    chain = int(os.environ.get("GKT_BENCH_CHAIN", 3))

    import jax

    # Persistent compilation cache: remote TPU compiles of the sort pipeline
    # run ~2.5-8 min per shape; caching them makes repeat benchmark runs
    # (including the driver's) start in seconds. Verified to hit across
    # processes on axon (second bench process reaches first measurement in
    # seconds, not minutes).
    from genome_kmers_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    # Device health watchdog: a wedged chip (e.g. a stuck device-side loop
    # from ANOTHER session — see CLAUDE.md on axon while_loop) makes every
    # transfer hang forever, which would hang the whole benchmark run. A
    # trivial transfer must complete before we commit to the real runs;
    # otherwise emit ONE machine-readable error line and exit hard (the
    # hung transfer thread cannot be interrupted from Python).
    health_budget_s = float(os.environ.get("GKT_BENCH_HEALTH_TIMEOUT", 600))
    done = threading.Event()
    probe_exc = []

    def _probe():
        import jax.numpy as jnp

        try:
            float(jnp.sum(jnp.arange(1024, dtype=jnp.float32)))
        except Exception as e:  # a raising probe is NOT a wedged chip —
            # report the real traceback immediately instead of waiting out
            # the watchdog and mislabeling it "device unresponsive"
            probe_exc.append(f"{type(e).__name__}: {e}")
        done.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not done.wait(health_budget_s) or probe_exc:
        err = (
            f"health probe failed: {probe_exc[0]}"
            if probe_exc
            else (
                f"device unresponsive: trivial transfer did not complete in "
                f"{health_budget_s:.0f}s (backend {jax.default_backend()})"
            )
        )
        print(json.dumps({
            "metric": f"k{k}_sorted_index_build_throughput",
            "value": 0,
            "unit": "kmers/s/chip",
            "vs_baseline": 0,
            "error": err,
        }))
        os._exit(3)

    kmers_per_s = measure(n_bp, k, reps, chain)

    baseline = DEFAULT_BASELINE_KMERS_PER_S
    measured_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(measured_path):
        with open(measured_path) as f:
            m = json.load(f)
        baseline = float(m.get("kmers_per_s", baseline))

    out = {
        "metric": f"k{k}_sorted_index_build_throughput",
        "value": round(kmers_per_s, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(kmers_per_s / baseline, 3),
    }

    # large-N track: the single-chip scaling cliff, measured every round so
    # the per-shard sweet-spot guidance stays backed by data
    if os.environ.get("GKT_BENCH_LARGE", "1") != "0" and n_bp < LARGE_BP:
        try:
            large = measure(LARGE_BP, k, max(1, reps - 1), 1)
            out["large_n"] = {
                "bp": LARGE_BP,
                "value": round(large, 1),
                "unit": "kmers/s/chip",
                "vs_baseline": round(large / baseline, 3),
            }
        except Exception as e:  # never lose the headline line to the cliff
            out["large_n"] = {"error": f"{type(e).__name__}: {e}"}

    # filtered track: steady-state filtered group-count query (public API,
    # cached flag plane) — the measured win of the one-gather filter design
    if os.environ.get("GKT_BENCH_FILTERED", "1") != "0":
        try:
            filt = measure_filtered(n_bp, k, max(1, reps - 1))
            out["filtered"] = {
                "bp": n_bp,
                "value": round(filt, 1),
                "unit": "kmers/s/chip (GC-filtered group counts, warm query)",
            }
        except Exception as e:
            out["filtered"] = {"error": f"{type(e).__name__}: {e}"}

    # suffix track: unbounded (max_kmer_len=None) fresh index build — the
    # reference's min_kmer_len=1 suffix-like mode, via the round-4 2-bit
    # folded refinement (ops/sort.sort_positions_suffix_dense)
    if os.environ.get("GKT_BENCH_SUFFIX", "1") != "0":
        try:
            # full reps (median-of-3 by default): each chain link pays the
            # per-round ~31 ms resolve sync on axon, so this track is more
            # transfer-jitter-sensitive than the headline — two reps left a
            # ~12% builder-vs-driver gap in round 4 (BENCH_r04 128.9M vs the
            # measured 146M); a 3-sample median absorbs one outlier rep
            sfx = measure_suffix(n_bp, reps, max(1, chain - 1))
            out["suffix"] = {
                "bp": n_bp,
                "value": round(sfx, 1),
                "unit": "suffixes/s/chip (max_kmer_len=None fresh build)",
            }
        except Exception as e:
            out["suffix"] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
