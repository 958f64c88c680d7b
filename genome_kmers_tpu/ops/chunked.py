"""Two-level single-chip sort for very large position arrays.

``jax.lax.sort`` throughput peaks near ~16M rows on v5e and degrades
O(n log² n) beyond (43M kmers/s at 2^24 rows vs 16M/s at 2^27), and a single
giant sort's workspace bounds the largest index one chip can build. This
splits the problem the same way the distributed sample sort splits it across
shards — but across sequential chunks on ONE chip:

  1. sort each chunk of ``chunk_rows`` (hits the compiled sweet-spot shape);
  2. pick global splitters from per-chunk samples (one tiny sort);
  3. locate each splitter in every sorted chunk (vectorized multiword
     binary search — gathers only);
  4. concatenate, per bucket, the matching contiguous slice of every chunk
     (host-coordinated slicing; sizes sync once), and sort each bucket
     (shape-bucketed, so compiles amortize);
  5. concatenate the buckets.

The partition compares full (words, cap, position) rows, so it is exact even
for fully degenerate keys (positions are unique), mirroring
parallel/sample_sort.py. Requires one-window keys (k <= 32 on the 4-bit
path, <= 64 on the 2-bit path); larger/unbounded k stays on the iterative
refinement path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .keys import build_key2_words, build_key_words
from .sort import _cdiv, sort_positions


def _words_of(packed, packed2, positions, cap, n_words, two_bit):
    if two_bit:
        return build_key2_words(packed2, positions, cap, n_words, jnp.uint32(0))
    return build_key_words(packed, positions, cap, n_words, jnp.uint32(0))


def _lex_less(a: tuple, b: tuple):
    lt = jnp.zeros(jnp.broadcast_shapes(a[0].shape, b[0].shape), dtype=bool)
    eq = jnp.ones_like(lt)
    for wa, wb in zip(a, b):
        lt = lt | (eq & (wa < wb))
        eq = eq & (wa == wb)
    return lt


def _rows_of(packed, packed2, positions, caps, n_words, two_bit):
    words = _words_of(packed, packed2, positions, caps, n_words, two_bit)
    return words + (caps, positions)


def _searchsorted_rows(hay: tuple, needles: tuple, n: int):
    """Insertion index of each needle row into the sorted haystack rows."""
    nq = needles[0].shape[0]
    lo = jnp.zeros(nq, dtype=jnp.int32)
    hi = jnp.full(nq, n, dtype=jnp.int32)
    rounds = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    for _ in range(rounds):
        active = lo < hi
        mid = (lo + hi) >> 1
        probe = tuple(jnp.take(w, mid, mode="clip") for w in hay)
        go_right = _lex_less(probe, needles)
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return lo


def sort_positions_chunked(
    packed,
    positions,
    cap_fn,
    max_kmer_len: int,
    packed2=None,
    uniform_cap: bool = False,
    chunk_rows: int = 1 << 24,
    n_samples_per_chunk: int = 512,
) -> jax.Array:
    """Sort a large position array in two levels.

    ``cap_fn(positions) -> caps`` derives compare caps for any position order
    (caps must always travel with their positions). Falls through to the
    plain sort when the input fits one chunk.
    """
    n = positions.shape[0]
    if n <= chunk_rows:
        return sort_positions(
            packed, positions, cap_fn(positions), max_kmer_len,
            packed2=packed2, uniform_cap=uniform_cap,
        )
    two_bit = packed2 is not None
    limit = 64 if two_bit else 32
    if max_kmer_len is None or max_kmer_len > limit:
        raise NotImplementedError("chunked sort requires one-window keys")
    n_words = _cdiv(max_kmer_len, 16 if two_bit else 8)
    n_chunks = _cdiv(n, chunk_rows)

    # 1. sort chunks (the last may be shorter; sort_positions shape-buckets)
    chunks = []
    for c in range(n_chunks):
        part = positions[c * chunk_rows : min((c + 1) * chunk_rows, n)]
        chunks.append(
            sort_positions(packed, part, cap_fn(part), max_kmer_len,
                           packed2=packed2, uniform_cap=uniform_cap)
        )

    # 2. splitters from regular-stride samples of every sorted chunk
    sample_pos = []
    for ch in chunks:
        m = ch.shape[0]
        s = min(n_samples_per_chunk, m)
        stride = max(m // s, 1)
        idx = (jnp.arange(s, dtype=jnp.int32) * stride + stride // 2) % m
        sample_pos.append(jnp.take(ch, idx))
    samp = jnp.concatenate(sample_pos)
    samp_rows = _rows_of(packed, packed2, samp, cap_fn(samp), n_words, two_bit)
    samp_sorted = jax.lax.sort(samp_rows, num_keys=len(samp_rows))
    total_s = samp.shape[0]
    pick = jnp.asarray(
        [(b + 1) * total_s // n_chunks for b in range(n_chunks - 1)], dtype=jnp.int32
    )
    splitters = tuple(jnp.take(w, pick, mode="clip") for w in samp_sorted)

    # 3. splitter location in every chunk -> bucket boundaries (host sync)
    bounds = np.zeros((n_chunks, n_chunks + 1), dtype=np.int64)
    for c, ch in enumerate(chunks):
        rows = _rows_of(packed, packed2, ch, cap_fn(ch), n_words, two_bit)
        ins = _searchsorted_rows(rows, splitters, ch.shape[0])
        bounds[c, 1:n_chunks] = np.asarray(ins)
        bounds[c, n_chunks] = ch.shape[0]

    # 4. gather + sort each bucket
    out = []
    for b in range(n_chunks):
        parts = [
            chunks[c][int(bounds[c, b]) : int(bounds[c, b + 1])]
            for c in range(n_chunks)
            if bounds[c, b + 1] > bounds[c, b]
        ]
        if not parts:
            continue
        bucket = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        out.append(
            sort_positions(packed, bucket, cap_fn(bucket), max_kmer_len,
                           packed2=packed2, uniform_cap=uniform_cap)
        )
    return jnp.concatenate(out) if len(out) > 1 else out[0]
