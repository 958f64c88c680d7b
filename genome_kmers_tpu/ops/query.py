"""Streaming count queries against a sorted k-mer index — EXTENSION.

Given a sorted position array (Kmers.sort()), counts occurrences of query
k-mers via vectorized lower/upper-bound binary search on the packed key
space: log2(N) rounds, each one gather+compare over all queries at once
(BASELINE.json config 5: "streaming count queries against the distributed
sorted index"). No reference analog — the reference can only count by
walking groups (kmers.py:994-1083).

Works on the 4-bit key space so it supports the full IUPAC alphabet; query
identity matches ``get_kmers(kmer_len=L)`` group identity (L-base compare
with the '$'-terminates-early rule).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import RANK_TABLE
from .keys import build_key_words


def encode_query_words(queries: list[str], kmer_len: int) -> tuple[np.ndarray, ...]:
    """Pack query strings into 4-bit rank words (host side).

    Every query must have length kmer_len (shorter queries are not a k-mer of
    the index's compare length and would never match a full-length group).
    """
    n_words = -(-kmer_len // 8)
    out = [np.zeros(len(queries), dtype=np.uint32) for _ in range(n_words)]
    for qi, q in enumerate(queries):
        if len(q) != kmer_len:
            raise ValueError(
                f"query '{q}' length ({len(q)}) does not match kmer_len ({kmer_len})"
            )
        b = q.encode()
        for w in range(n_words):
            acc = 0
            for j in range(8):
                idx = 8 * w + j
                r = int(RANK_TABLE[b[idx]]) if idx < kmer_len else 0
                if idx < kmer_len and r == 0:
                    raise ValueError(f"query '{q}' contains a non-IUPAC character")
                acc = (acc << 4) | r
            out[w][qi] = acc
    return tuple(out)


def encode_query2_words(queries: list[str], kmer_len: int):
    """Pack query strings into 2-bit rank words (16 bases/word, host side) —
    the key space of the 2-bit packs (ops/keys.pack_rank2_words and the
    large strided pack). Non-ACGT queries cannot exist in an ACGT-only
    genome, so instead of raising they are flagged: returns
    ``(words_tuple, matchable_bool_array)`` and the caller zeroes the
    unmatchable queries' counts.
    """
    from .encoding import RANK2_TABLE

    n_words = -(-kmer_len // 16)
    out = [np.zeros(len(queries), dtype=np.uint32) for _ in range(n_words)]
    ok = np.ones(len(queries), dtype=bool)
    acgt = frozenset(b"ACGT")
    for qi, q in enumerate(queries):
        if len(q) != kmer_len:
            raise ValueError(
                f"query '{q}' length ({len(q)}) does not match kmer_len ({kmer_len})"
            )
        b = q.encode()
        if set(b) - acgt:
            ok[qi] = False
            continue
        for w in range(n_words):
            acc = 0
            for j in range(16):
                idx = 16 * w + j
                r = int(RANK2_TABLE[b[idx]]) if idx < kmer_len else 0
                acc = (acc << 2) | r
            out[w][qi] = acc
    return tuple(out), ok


def _lex_less(a: tuple, b: tuple) -> jax.Array:
    """a < b over word tuples (lexicographic, unsigned)."""
    lt = jnp.zeros(a[0].shape, dtype=bool)
    eq = jnp.ones(a[0].shape, dtype=bool)
    for wa, wb in zip(a, b):
        lt = lt | (eq & (wa < wb))
        eq = eq & (wa == wb)
    return lt


@partial(jax.jit, static_argnames=("n_words", "n_rounds", "upper"))
def _bound_search(packed, sorted_pos, cap_len, q_words, n_words, n_rounds, upper):
    """Vectorized lower/upper bound over the sorted key space.

    Index keys are built on the fly per probe (one gather per word per round)
    instead of materializing N keys — O(Q log N) gathers total.
    """
    n = sorted_pos.shape[0]
    nq = q_words[0].shape[0]
    lo = jnp.zeros(nq, dtype=jnp.int32)
    hi = jnp.full(nq, n, dtype=jnp.int32)

    def body(_, state):
        lo, hi = state
        active = lo < hi
        mid = (lo + hi) >> 1
        pos = jnp.take(sorted_pos, mid, mode="clip")
        cap = jnp.take(cap_len, mid, mode="clip")
        kw = build_key_words(packed, pos, cap, n_words, jnp.uint32(0))
        if upper:
            # advance while key[mid] <= query  <=>  not (query < key[mid])
            go_right = ~_lex_less(q_words, kw)
        else:
            # advance while key[mid] < query
            go_right = _lex_less(kw, q_words)
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_rounds, body, (lo, hi))
    return lo


def count_queries(
    packed: jax.Array,
    sorted_positions: jax.Array,
    cap_len: jax.Array,
    q_words: tuple,
    kmer_len: int,
) -> np.ndarray:
    """Occurrence count per query k-mer (uint32 array, len == num queries).

    ``cap_len`` must be aligned with ``sorted_positions`` and capped at
    kmer_len, so index keys compare exactly like
    ``get_compare_sba_kmers_func(kmer_len)`` (reference kmers.py:285-292).
    """
    n = sorted_positions.shape[0]
    nq = q_words[0].shape[0]
    if n == 0:
        return np.zeros(nq, dtype=np.uint32)
    if n >= 2**31:
        # int32 search bounds; indexes past 2^31 would overflow
        raise NotImplementedError("count_queries supports indexes up to 2^31 entries")
    n_words = -(-kmer_len // 8)
    n_rounds = max(1, int(np.ceil(np.log2(n))) + 1)
    # bucket the query count to the next power of two (floor 128) so nearby
    # batch sizes share one compiled program (remote compiles cost minutes;
    # a 2-query call after a 100-query call must not recompile) — pad
    # queries are all-zero keys whose counts are sliced away
    nq_pad = max(128, 1 << max(0, int(np.ceil(np.log2(max(nq, 1))))))
    q_words = tuple(
        jnp.asarray(np.pad(np.asarray(w), (0, nq_pad - nq))) for w in q_words
    )
    lo = _bound_search(
        packed, sorted_positions, cap_len, q_words, n_words, n_rounds, upper=False
    )
    hi = _bound_search(
        packed, sorted_positions, cap_len, q_words, n_words, n_rounds, upper=True
    )
    # slice the bucket padding away on host: a device-side [:nq] is an eager
    # XLA program compiled per nq, which would defeat the bucketing
    return np.asarray((hi - lo).astype(jnp.uint32))[:nq]
