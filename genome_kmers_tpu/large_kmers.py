"""LargeKmers: a first-class k-mer index for the 64-bit regime — EXTENSION.

The reference hard-fails above 2^32 k-mers (reference kmers.py:805-808), and
``Kmers`` here preserves that error for parity. ``LargeKmers`` is the
supported path past the ceiling (a both-strand human genome is ~6.2G
k-mers): the genome lives as a strided 2-bit (ACGT) or 4-bit (IUPAC) pack —
0.25/0.5 bytes per base, built streaming so the ASCII SBA never
materializes whole — positions are uint64 ((hi, lo) uint32 pairs on
device), and every statistic accumulates exactly in uint64. The machinery
is ``ops/large.py`` + ``parallel/large.py`` (see docs/algorithm.md, "The
64-bit large regime"); this class packages it behind the familiar
``sort`` / ``get_kmer_group_counts`` / ``get_kmer_count`` surface.

The regime is distributed by design: ``sort`` requires a
``jax.sharding.Mesh`` (a 1-device mesh works). ``max_kmer_len`` may be any
bound — or ``None`` for SUFFIX MODE (compare to each segment's end,
reference kmers.py:315-316): one-window builds (<= 64 bases on the 2-bit
pack, <= 32 on 4-bit) sort in a single exchange, anything longer runs the
pair-gid iterative refinement
(parallel.sample_sort.sample_sort_positions_large_unbounded). A
``both_strands=True`` index additionally supports
``track_strands_separately`` (strand-split group statistics — the large
analog of ``Kmers.from_strand``'s extra boundary term).

Memory note: the host position array is 8 bytes per k-mer (~50 GB for a
both-strand human genome). At that scale run multi-host so each process
holds only its shard, or pass an explicit ``positions`` subset to
``sort`` (e.g. one strand, one chromosome range, or a sample).
"""

from __future__ import annotations

from typing import Iterable, Union

import numpy as np

from .ops.large import fuse64_np, pack_rank2_strided_np, pack_rank_strided_np

_DOLLAR = ord("$")
_ACGT = frozenset(b"ACGT")
# streaming pack chunk: a multiple of both 8 and 16 bases per word
_CHUNK = 1 << 24


def _is_acgt_only(seq: bytes) -> bool:
    return not (set(seq) - _ACGT)


class LargeKmers:
    """64-bit-regime k-mer index over a strided genome pack (EXTENSION)."""

    def __init__(
        self,
        packed_words: np.ndarray,
        seg_starts_u64: np.ndarray,
        seg_ends_u64: np.ndarray,
        min_kmer_len: int,
        max_kmer_len: Union[int, None],
        two_bit: bool = True,
        record_names: Union[list, None] = None,
    ) -> None:
        limit = 64 if two_bit else 32
        if min_kmer_len < 1 or (
            max_kmer_len is not None and min_kmer_len > max_kmer_len
        ):
            raise ValueError(
                f"min_kmer_len ({min_kmer_len}) must be in [1, max_kmer_len]"
            )
        # suffix mode (max_kmer_len=None) / beyond-one-window bounds take
        # the pair-gid iterative-refinement sort; one-window bounds take the
        # single-exchange sample sort with retained lanes
        self._one_window = max_kmer_len is not None and max_kmer_len <= limit
        self.packed_words = np.asarray(packed_words, dtype=np.uint32)
        self.seg_starts = np.asarray(seg_starts_u64, dtype=np.uint64)
        self.seg_ends = np.asarray(seg_ends_u64, dtype=np.uint64)
        if len(self.seg_starts) != len(self.seg_ends) or len(self.seg_starts) == 0:
            raise ValueError("segment starts/ends must be non-empty and aligned")
        self.min_kmer_len = int(min_kmer_len)
        self.max_kmer_len = None if max_kmer_len is None else int(max_kmer_len)
        self.two_bit = bool(two_bit)
        self.record_names = record_names
        seg_kmers = (
            self.seg_ends.astype(np.int64) - self.seg_starts.astype(np.int64) + 1
        ) - self.min_kmer_len + 1
        if (seg_kmers < 1).any():
            raise ValueError(
                f"min_kmer_len ({min_kmer_len}) must be <= the shortest sequence length"
            )
        self._seg_kmers = seg_kmers
        self.num_kmers = int(seg_kmers.sum())
        # ((hi, lo), is_pad, mesh, n_real, sorted_lanes) after sort()
        self._sorted = None
        self._is_sorted = False
        self._custom_positions = False
        self._n_fwd_records = None  # set by from_records(both_strands=True)
        self._track_strands = False  # from_records(track_strands_separately=)
        # converged refinement run-id pairs: {identity_kmer_len: (ghi, glo)}
        # — identity None = full suffix; rebuilt lazily after a restore
        self._gid_cache = {}

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #

    @classmethod
    def from_records(
        cls,
        records: Iterable,
        min_kmer_len: int,
        max_kmer_len: Union[int, None],
        both_strands: bool = False,
        two_bit: Union[bool, None] = None,
        track_strands_separately: bool = False,
    ) -> "LargeKmers":
        """Build streaming from ``(name, sequence)`` pairs (str or bytes).

        Records are packed chunk-by-chunk with '$' separators — the
        concatenated ASCII SBA never materializes. ``both_strands=True``
        appends every record's reverse complement as additional segments
        (the large-regime analog of ``Kmers.from_strand(source_strand=
        "both")`` — equal strings from the two strands share groups);
        ``track_strands_separately=True`` additionally splits every group
        by strand (the large analog of the uint32 engine's extra boundary
        term — the reference declares the flag but raises, reference
        kmers.py:689-692, and cannot reach this scale at all). Within an
        equal-string run the position tie-break orders all "+" rows (the
        forward segments, lower coordinates) before all "-" rows, so
        strand-split groups stay contiguous — one extra identity lane in
        the distributed stats, not an extra sort pass.
        ``two_bit=None`` autodetects by scanning the records first, so
        ``records`` must be re-iterable (a list); pass an explicit bool to
        stream a one-shot iterator.
        """
        if track_strands_separately and not both_strands:
            raise ValueError(
                "track_strands_separately can only be true if both_strands is True"
            )
        if two_bit is None or both_strands:
            records = list(records)
        if two_bit is None:
            two_bit = all(
                _is_acgt_only(s.encode() if isinstance(s, str) else bytes(s))
                for _, s in records
            )

        pack = pack_rank2_strided_np if two_bit else pack_rank_strided_np
        comp = bytes.maketrans(b"ACGTRYSWKMBDHVN$", b"TGCAYRSWMKVHDBN$")
        # the pack tables map any disallowed byte to rank 0 — the Kmers path
        # rejects such bytes in SequenceCollection validation, so the same
        # gate must run here or lowercase/soft-masked input silently
        # corrupts the sort (uppercase IUPAC only; ACGT only on 2-bit)
        allowed = _ACGT if two_bit else frozenset(b"ACGTRYSWKMBDHVN")

        def byte_stream():
            first = True
            for name, seq in records:
                sb = seq.encode() if isinstance(seq, str) else bytes(seq)
                yield name, sb, first
                first = False
            if both_strands:
                for name, seq in reversed(records):
                    sb = seq.encode() if isinstance(seq, str) else bytes(seq)
                    yield name, sb.translate(comp)[::-1], False

        word_chunks = []
        buf = bytearray()
        starts, ends, names = [], [], []
        offset = 0
        for name, sb, first in byte_stream():
            if len(sb) == 0:
                raise ValueError(f"record ({name}) has an empty sequence")
            bad = set(sb) - allowed
            if bad:
                raise ValueError(
                    f"record ({name}) contains disallowed characters "
                    f"{sorted(chr(b) for b in bad)} "
                    f"({'ACGT only on the 2-bit pack' if two_bit else 'uppercase IUPAC only'})"
                )
            if not first:
                buf += b"$"
                offset += 1
            starts.append(offset)
            ends.append(offset + len(sb) - 1)
            names.append(name)
            buf += sb
            offset += len(sb)
            while len(buf) >= _CHUNK:
                chunk = np.frombuffer(bytes(buf[:_CHUNK]), dtype=np.uint8)
                word_chunks.append(pack(chunk, extra_words=0))
                del buf[:_CHUNK]
        if buf:
            chunk = np.frombuffer(bytes(buf), dtype=np.uint8)
            word_chunks.append(pack(chunk, extra_words=0))
        # funnel-shift key builds read up to 8 words past the last position
        word_chunks.append(np.zeros(8, dtype=np.uint32))
        packed_words = np.concatenate(word_chunks)

        out = cls(
            packed_words,
            np.asarray(starts, dtype=np.uint64),
            np.asarray(ends, dtype=np.uint64),
            min_kmer_len,
            max_kmer_len,
            two_bit=two_bit,
            record_names=names,
        )
        if both_strands:
            out._n_fwd_records = len(names) // 2
            out._track_strands = bool(track_strands_separately)
        return out

    @classmethod
    def from_fasta(
        cls,
        fasta_file_path,
        min_kmer_len: int,
        max_kmer_len: Union[int, None],
        both_strands: bool = False,
        two_bit: Union[bool, None] = None,
        track_strands_separately: bool = False,
    ) -> "LargeKmers":
        """Build straight from a FASTA file — the large-regime ingestion
        entry point: records stream out of the file
        (io.fasta.iter_fasta_records — same parsing rules as the
        SequenceCollection loader: uppercase, CR stripped, Bowtie-style
        names, empty sequences and duplicate names rejected) into the
        chunked strided pack, so the '$'-joined byte SBA never
        materializes and segment coordinates are uint64 from the start
        (a SequenceCollection would overflow past 2^32 bases). Pass an
        explicit ``two_bit`` with ``both_strands=False`` to keep the
        stream one-shot (autodetect and both_strands buffer the record
        list — O(genome) host bytes either way, since the raw file is
        read whole)."""
        from .io.fasta import iter_fasta_records

        return cls.from_records(
            iter_fasta_records(fasta_file_path), min_kmer_len, max_kmer_len,
            both_strands=both_strands, two_bit=two_bit,
            track_strands_separately=track_strands_separately,
        )

    @classmethod
    def from_sequence_collection(
        cls, seq_coll, min_kmer_len: int, max_kmer_len: Union[int, None],
        both_strands: bool = False, track_strands_separately: bool = False,
    ) -> "LargeKmers":
        """Build from an existing (host-sized) SequenceCollection — useful
        when an index was prototyped with ``Kmers`` and the workload then
        outgrows the uint32 ceiling (e.g. switching on both_strands)."""
        records = [
            (name, bytes(seq_coll.forward_sba[s : e + 1]))
            for name, s, e in seq_coll.iter_records("forward")
        ]
        return cls.from_records(
            records, min_kmer_len, max_kmer_len, both_strands=both_strands,
            two_bit=None, track_strands_separately=track_strands_separately,
        )

    # ------------------------------------------------------------------ #
    # index
    # ------------------------------------------------------------------ #

    def build_positions(self) -> np.ndarray:
        """Every k-mer start position (uint64, segment order) — 8 B/k-mer
        on host; see the module docstring's memory note."""
        out = np.empty(self.num_kmers, dtype=np.uint64)
        write = 0
        for s, n in zip(self.seg_starts, self._seg_kmers):
            out[write : write + n] = np.arange(s, s + np.uint64(n), dtype=np.uint64)
            write += int(n)
        return out

    def _dense_positions_for_sort(self):
        """The canonical dense start set in the cheapest form the sort
        accepts: DEVICE (hi, lo) pairs below 2^31 rows (one iota +
        searchsorted — no host array, no 24 B/row link upload, which
        dominates remote-link wall-clock), host uint64 beyond."""
        if self.num_kmers < (1 << 31):
            from .ops.large import build_dense_positions_pairs

            pairs, n = build_dense_positions_pairs(
                self.seg_starts, self.seg_ends, self.min_kmer_len
            )
            assert n == self.num_kmers
            return pairs
        return self.build_positions()

    def __len__(self) -> int:
        return self.num_kmers

    def sort(self, mesh, positions: Union[np.ndarray, None] = None) -> None:
        """Distributed 64-bit sample sort of the index over ``mesh``.

        One-window bounds (<= 64 bases 2-bit / <= 32 4-bit) take the single
        sample-sort exchange (parallel.sample_sort_positions_large_ragged);
        the sorted layout — positions, pad flags, AND the sorted key
        lanes — stays device-resident, so every statistics/filter/query
        call afterwards runs gather-free over the retained lanes.

        Suffix mode (``max_kmer_len=None``) and longer bounds take the
        pair-gid iterative refinement
        (parallel.sample_sort_positions_large_unbounded); the converged run
        ids are retained as the built-identity group structure, so stats at
        ``kmer_len=None`` need zero refinement rounds.

        ``positions`` optionally restricts the index to an explicit uint64
        subset."""
        from .parallel.sample_sort import (
            sample_sort_positions_large_ragged,
            sample_sort_positions_large_unbounded,
        )

        if positions is None:
            pos = self._dense_positions_for_sort()
            self._custom_positions = False
        else:
            pos = np.asarray(positions, dtype=np.uint64)
            self._custom_positions = True
        n_real = int(pos[0].shape[0]) if isinstance(pos, tuple) else len(pos)
        self._gid_cache = {}
        if self._one_window:
            (hi, lo), is_pad, lanes = sample_sort_positions_large_ragged(
                self.packed_words, pos, self.seg_starts, self.seg_ends,
                self.max_kmer_len, mesh, two_bit=self.two_bit,
                return_lanes=True,
            )
            self._sorted = ((hi, lo), is_pad, mesh, n_real, lanes)
        else:
            (hi, lo), is_pad, gid = sample_sort_positions_large_unbounded(
                self.packed_words, pos, self.seg_starts, self.seg_ends,
                mesh, two_bit=self.two_bit, max_kmer_len=self.max_kmer_len,
            )
            self._sorted = ((hi, lo), is_pad, mesh, n_real, None)
            # built identity (suffix when max_kmer_len is None) comes free
            self._gid_cache[self.max_kmer_len] = gid
        self._is_sorted = True

    def sorted_positions(self) -> np.ndarray:
        """Globally sorted positions as host uint64, pads removed."""
        if not self._is_sorted:
            raise ValueError("LargeKmers must be sorted first. Run sort(mesh).")
        (hi, lo), is_pad, _, n_real, _ = self._sorted
        pad = np.asarray(is_pad)
        keep = pad == 0
        out = fuse64_np(np.asarray(hi)[keep], np.asarray(lo)[keep])
        assert out.shape[0] == n_real
        return out

    # ------------------------------------------------------------------ #
    # statistics (uint64-exact)
    # ------------------------------------------------------------------ #

    @property
    def sba_len(self) -> int:
        """Total conceptual SBA length (last segment end + 1) — can exceed
        2^32; only ever handled as a Python int / uint64 on host."""
        return int(self.seg_ends[-1]) + 1

    def _require_sorted(self, what="get_kmer_group_counts"):
        if not self._is_sorted:
            raise AssertionError(
                f"The kmers must be sorted when calling {what}"
            )

    def _check_kmer_len(self, kmer_len):
        if kmer_len is None:
            # reference parity (round 5): kmer_len=None means UNBOUNDED
            # suffix comparison in group identity — on ANY build, exactly
            # like the uint32 engine and the reference comparator
            # (reference kmers.py:315-316: max_kmer_len=None compares to
            # the segment end). Extraction lengths clamp to max_kmer_len
            # separately (_row_lens).
            return None
        if kmer_len < 1 or (
            self.max_kmer_len is not None and kmer_len > self.max_kmer_len
        ):
            raise ValueError(
                f"kmer_len ({kmer_len}) must be in [1, max_kmer_len ({self.max_kmer_len})]"
            )
        return kmer_len

    def _row_lens(self, pos, seg_e) -> np.ndarray:
        """Per-row extraction lengths for ``kmer_len=None``: natural length
        (to the segment end) clamped at ``max_kmer_len`` — the uint32
        engine's ``get_kmer_str(num, None)`` rule."""
        lens = (seg_e - pos + np.uint64(1)).astype(np.int64)
        if self.max_kmer_len is not None:
            lens = np.minimum(lens, np.int64(self.max_kmer_len))
        return lens

    @property
    def _lanes_k(self) -> int:
        """Built length of the retained/rebuilt key lanes: the bounded
        max_kmer_len when it fits one window, else one full window — lane
        filters and bounded-k fast paths evaluate at this length."""
        limit = 64 if self.two_bit else 32
        return self.max_kmer_len if self._one_window else limit

    def _strand_split(self) -> Union[int, None]:
        """uint64 position threshold splitting "+" rows from "-" rows for
        track_strands_separately group identity, or None."""
        if not self._track_strands:
            return None
        return int(self.seg_starts[self._n_fwd_records])

    def _ensure_gid(self, kmer_len) -> tuple:
        """Converged (hi, lo) run-id pair at ``kmer_len`` identity (None =
        full suffix) over the sorted layout, via window refinement
        (parallel.distributed_adjacent_gids_large), cached per identity.
        The identity the sort itself converged on is retained by ``sort``
        for free; a restored checkpoint rebuilds lazily here. The cache
        holds the BUILT identity plus at most one query identity (a gid
        pair is 8 B/row of device memory — unbounded growth across many
        distinct beyond-window identities would OOM at this regime's
        scale), evicting the previous query identity on a new one."""
        if kmer_len not in self._gid_cache:
            from .parallel.sample_sort import distributed_adjacent_gids_large

            (hi, lo), is_pad, mesh, _, _ = self._sorted
            for stale in [
                k for k in self._gid_cache if k != self.max_kmer_len
            ]:
                del self._gid_cache[stale]
            self._gid_cache[kmer_len] = distributed_adjacent_gids_large(
                self.packed_words, hi, lo, is_pad, self.seg_starts,
                self.seg_ends, kmer_len, mesh, two_bit=self.two_bit,
            )
        return self._gid_cache[kmer_len]

    def _identity_kwargs(self, kmer_len) -> dict:
        """Group-identity arguments for a large stats call: in-kernel key
        words for one-window ``kmer_len``; converged run ids (``ext_gid``)
        for suffix (None) / beyond-window identity."""
        limit = 64 if self.two_bit else 32
        if kmer_len is None or kmer_len > limit:
            return {"kmer_len": None, "ext_gid": self._ensure_gid(kmer_len)}
        return {"kmer_len": kmer_len, "ext_gid": None}

    def _ensure_lanes(self):
        """Retained sorted key lanes (words + cap) at ``_lanes_k``,
        rebuilding them once from the sorted positions when absent — a
        restored checkpoint (or an unbounded-mode sort, which retains run
        ids instead of lanes) has no in-process one-window sort to retain
        lanes from."""
        (hi, lo), is_pad, mesh, n_real, lanes = self._sorted
        if lanes is None:
            from .parallel.large import rebuild_large_lanes

            lanes = rebuild_large_lanes(
                self.packed_words, hi, lo, is_pad, self.seg_starts,
                self.seg_ends, self._lanes_k, mesh, self.two_bit,
            )
            self._sorted = ((hi, lo), is_pad, mesh, n_real, lanes)
        return lanes

    def _cap_covers_min_k(self) -> bool:
        """True when every (real) sorted row has valid_len >= min_kmer_len —
        canonical construction guarantees it; an explicit ``positions``
        subset passed to ``sort`` may not, so it gets verified against the
        retained cap lane once (the CRISPR PAM lanes flags depend on it)."""
        if not self._custom_positions:
            return True
        if self.min_kmer_len > self._lanes_k:
            return False  # the cap lane saturates below min_kmer_len
        import jax.numpy as jnp

        _, is_pad, _, _, _ = self._sorted
        lanes = self._ensure_lanes()
        cap_lane = lanes[-1]
        valid = np.asarray(is_pad) == 0
        if not valid.any():
            return True
        mn = int(jnp.min(jnp.where(jnp.asarray(is_pad) == 0,
                                   cap_lane, jnp.uint32(0xFFFFFFFF))))
        return mn >= self.min_kmer_len

    def _filter_mask(self, kmer_filter_func, kmer_len):
        """Sharded survivor mask for a library filter, evaluated on the
        retained sorted lanes (parallel.large.large_lanes_filter_flags), or
        None for keep-all. Raises the filter's reference error if any real
        row is invalid; raises NotImplementedError for filters the lanes
        cannot express (the large regime has no byte SBA to fall back to).
        """
        import jax.numpy as jnp

        from .ops.filters import KeepAllFilter, KmerFilter
        from .parallel.large import large_lanes_filter_flags

        if kmer_filter_func is None or isinstance(kmer_filter_func, KeepAllFilter):
            return None
        if not isinstance(kmer_filter_func, KmerFilter):
            raise NotImplementedError(
                "the large regime supports the library KmerFilter classes "
                "only (filters evaluate on packed key lanes; arbitrary "
                "callables would need a byte SBA, which never materializes "
                "past 2^32)"
            )
        (hi, lo), is_pad, mesh, _, _ = self._sorted
        lanes = self._ensure_lanes()
        bpw = 16 if self.two_bit else 8
        lanes_k = self._lanes_k
        nwb = -(-lanes_k // bpw)
        words = tuple(lanes[:nwb])
        cap_lane = lanes[nwb]
        base = max(0, self.sba_len - (1 << 31))
        lanes_dict = {
            "two_bit": self.two_bit,
            "built_k": lanes_k,
            "words": words,
            "cap": cap_lane,
            "cap_cover_check": self._cap_covers_min_k,
        }
        spec = kmer_filter_func.lanes_spec(
            lanes_dict, self.sba_len - base, self.min_kmer_len
        )
        if spec is None:
            raise NotImplementedError(
                f"filter {type(kmer_filter_func).__name__} cannot be "
                f"evaluated on the large index's key lanes at this "
                f"configuration (lane length {lanes_k}, "
                f"min_kmer_len={self.min_kmer_len})"
            )
        flags_fn, params, msgs = spec
        mask, err = large_lanes_filter_flags(
            words, cap_lane, hi, lo, is_pad, jnp.asarray(params), flags_fn,
            base, lanes_k,
        )
        err = np.asarray(err)
        if len(err) and int(err[0]):
            # digest positions are proxy (rebased) coordinates
            raise ValueError(msgs[int(err[1])](int(err[2]) + base))
        return mask

    def get_kmer_group_counts(
        self,
        kmer_len: Union[int, None] = None,
        kmer_filter_func=None,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        max_counts_bin: int = 1000000,
    ) -> tuple[np.ndarray, int]:
        """Group-size histogram (uint64) + exact total over the sorted
        sharded layout (parallel.distributed_group_size_histogram_large_
        ragged), gather-free over the retained sorted lanes. Any bounded
        ``kmer_len <= max_kmer_len`` is exact (the sorted order refines
        every shorter-prefix order); ``kmer_len=None`` means UNBOUNDED
        suffix identity on ANY build (compare to each segment's end —
        reference kmers.py:315-316, matching the uint32 engine's walk),
        via converged refinement run ids (retained by a suffix-mode sort,
        window-refined otherwise). ``kmer_filter_func``: a library
        KmerFilter — survivors are counted in unfiltered group identity,
        the reference's previous-survivor walk semantics (reference
        kmers.py:597-601). With ``track_strands_separately`` groups
        additionally split by strand."""
        from .parallel.large import distributed_group_size_histogram_large_ragged

        self._require_sorted()
        kmer_len = self._check_kmer_len(kmer_len)
        if max_counts_bin <= 0:
            raise ValueError(f"max_counts_bin ({max_counts_bin}) must be >= 1")
        mask = self._filter_mask(kmer_filter_func, kmer_len)
        (hi, lo), is_pad, mesh, _, lanes = self._sorted
        idk = self._identity_kwargs(kmer_len)
        return distributed_group_size_histogram_large_ragged(
            self.packed_words, hi, lo, is_pad, self.seg_starts, self.seg_ends,
            idk["kmer_len"], mesh, min_group_size=min_group_size,
            max_group_size=max_group_size, max_counts_bin=max_counts_bin,
            two_bit=self.two_bit, sorted_words=lanes,
            built_k=self._lanes_k if lanes is not None else None, mask=mask,
            ext_gid=idk["ext_gid"], strand_split=self._strand_split(),
        )

    def get_kmer_count(
        self,
        kmer_len: Union[int, None] = None,
        kmer_filter_func=None,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
    ) -> int:
        """Total k-mers in qualifying groups (exact uint64)."""
        _, total = self.get_kmer_group_counts(
            kmer_len, kmer_filter_func=kmer_filter_func,
            min_group_size=min_group_size,
            max_group_size=max_group_size, max_counts_bin=1,
        )
        return total

    # ------------------------------------------------------------------ #
    # canonical (strand-collapsed) statistics
    # ------------------------------------------------------------------ #

    def get_canonical_kmer_group_counts(
        self,
        kmer_len: int,
        max_counts_bin: int = 1000000,
        mesh=None,
        positions: Union[np.ndarray, None] = None,
    ) -> tuple[np.ndarray, int]:
        """Group-size histogram over CANONICAL (min(kmer, revcomp)) k-mers —
        the large-regime analog of Kmers.get_canonical_kmer_group_counts.
        Runs its own canonical sample sort (the canonical order differs per
        kmer_len); only full-length k-mers participate. ACGT genomes ride
        the 2-bit lanes (kmer_len <= 64); IUPAC genomes the 4-bit lanes
        (kmer_len <= 32; round 5 — was NotImplementedError). ``mesh``
        defaults to the mesh ``sort`` ran on; ``positions`` optionally
        restricts to an explicit uint64 subset (the full canonical start
        set is 8 B/k-mer of host memory)."""
        from .parallel.large import distributed_group_size_histogram_large_ragged
        from .parallel.sample_sort import sample_sort_canonical_large_ragged

        if self._n_fwd_records is not None:
            raise NotImplementedError(
                "canonical statistics are defined on a single-strand index "
                "(a both-strand index already contains each k-mer's reverse "
                "complement)"
            )
        limit = 64 if self.two_bit else 32
        if kmer_len is None or kmer_len < 1 or kmer_len > limit:
            raise ValueError(f"kmer_len ({kmer_len}) must be in [1, {limit}]")
        if max_counts_bin <= 0:
            raise ValueError(f"max_counts_bin ({max_counts_bin}) must be >= 1")
        if mesh is None:
            if self._sorted is None:
                raise ValueError(
                    "pass mesh= (or sort(mesh) first) so the canonical "
                    "pipeline knows its device mesh"
                )
            mesh = self._sorted[2]
        pos = (
            self._dense_positions_for_sort()
            if positions is None
            else np.asarray(positions, dtype=np.uint64)
        )
        (hi, lo), is_pad, can_lanes = sample_sort_canonical_large_ragged(
            self.packed_words, pos, self.seg_starts,
            self.seg_ends, kmer_len, mesh, two_bit=self.two_bit,
        )
        # group identity = the retained canonical words (full-length rows
        # only, so no cap lane rides along)
        return distributed_group_size_histogram_large_ragged(
            self.packed_words, hi, lo, is_pad, self.seg_starts, self.seg_ends,
            kmer_len, mesh, max_counts_bin=max_counts_bin,
            two_bit=self.two_bit, sorted_words=can_lanes, built_k=kmer_len,
        )

    # ------------------------------------------------------------------ #
    # streaming count queries
    # ------------------------------------------------------------------ #

    def count_queries(
        self, queries: list, kmer_len: Union[int, None] = None
    ) -> np.ndarray:
        """Occurrence counts (uint64) per query string via distributed
        binary search over the sorted large index
        (parallel.distributed_count_queries_large). Query identity matches
        ``kmer_len``-base group identity; defaults to the first query's
        length; any kmer_len <= max_kmer_len is exact. On the 2-bit pack,
        non-ACGT queries return 0 (they cannot occur in an ACGT genome)."""
        from .parallel.query import distributed_count_queries_large

        self._require_sorted("count_queries")
        if not queries:
            return np.zeros(0, dtype=np.uint64)
        if kmer_len is None:
            kmer_len = len(queries[0])
        kmer_len = self._check_kmer_len(kmer_len)
        limit = 64 if self.two_bit else 32
        if kmer_len > limit:
            raise NotImplementedError(
                f"count_queries requires kmer_len <= {limit} (query keys "
                f"are one-window; the sorted order itself supports any "
                f"kmer_len)"
            )
        (hi, lo), is_pad, mesh, _, _ = self._sorted
        return distributed_count_queries_large(
            self.packed_words, hi, lo, is_pad, self.seg_starts, self.seg_ends,
            queries, kmer_len, mesh, two_bit=self.two_bit,
        )

    def count_queries_canonical(
        self, queries: list, kmer_len: Union[int, None] = None
    ) -> np.ndarray:
        """Strand-collapsed occurrence counts: forward hits + reverse-
        complement hits (once, for palindromes). Uppercase IUPAC queries
        (round 5 — was ACGT-only)."""
        from .ops.encoding import iupac_revcomp_strs

        if self._n_fwd_records is not None:
            raise NotImplementedError(
                "canonical queries are defined on a single-strand index; "
                "count_queries on a both-strand index already counts both "
                "strands"
            )
        if not queries:
            return np.zeros(0, dtype=np.uint64)
        rcs = iupac_revcomp_strs(queries)
        fwd = self.count_queries(queries, kmer_len)
        rc = self.count_queries(rcs, kmer_len)
        is_palindrome = np.array([q == r for q, r in zip(queries, rcs)])
        return fwd + np.where(is_palindrome, 0, rc).astype(np.uint64)

    # ------------------------------------------------------------------ #
    # bulk extraction (host-materializing — see the memory note up top)
    # ------------------------------------------------------------------ #

    def _rows_for_arrays(self, kmer_len, kmer_filter_func, min_group_size,
                         max_group_size):
        """Host per-row arrays over the sorted layout, pads stripped, in
        global sorted order: (positions u64, survivor mask, boundary,
        expanded survivor-group sizes, group qualifies)."""
        from .parallel.large import distributed_group_size_histogram_large_ragged

        mask_dev = self._filter_mask(kmer_filter_func, kmer_len)
        (hi, lo), is_pad, mesh, n_real, lanes = self._sorted
        idk = self._identity_kwargs(kmer_len)
        _, _, rows = distributed_group_size_histogram_large_ragged(
            self.packed_words, hi, lo, is_pad, self.seg_starts, self.seg_ends,
            idk["kmer_len"], mesh, min_group_size=min_group_size,
            max_group_size=max_group_size, max_counts_bin=1,
            two_bit=self.two_bit, sorted_words=lanes,
            built_k=self._lanes_k if lanes is not None else None,
            mask=mask_dev, return_rows=True,
            ext_gid=idk["ext_gid"], strand_split=self._strand_split(),
        )
        pad = np.asarray(is_pad)
        keep = pad == 0
        pos = fuse64_np(np.asarray(hi)[keep], np.asarray(lo)[keep])
        boundary = np.asarray(rows["boundary"])[keep].astype(bool)
        s64 = fuse64_np(np.asarray(rows["s_hi"])[keep], np.asarray(rows["s_lo"])[keep])
        qualifies = np.asarray(rows["qualifies"])[keep].astype(bool)
        surv = (
            np.ones(len(pos), dtype=bool)
            if mask_dev is None
            else np.asarray(mask_dev)[keep].astype(bool)
        )
        assert len(pos) == n_real
        # expand boundary-row group sizes / qualification to every row
        b_idx = np.flatnonzero(boundary)
        counts_per_group = np.diff(np.concatenate([b_idx, [len(pos)]]))
        gst = np.repeat(s64[b_idx], counts_per_group)
        gq = np.repeat(qualifies[b_idx], counts_per_group)
        return pos, surv, boundary, counts_per_group, b_idx, gst, gq

    def get_kmers(
        self,
        kmer_len: Union[int, None] = None,
        one_based_seq_index: bool = False,
        kmer_filter_func=None,
        kmer_info_to_yield: str = "minimum",
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        yield_first_n: Union[int, None] = None,
    ):
        """Generator analog of ``Kmers.get_kmers`` (reference
        kmers.py:869-992) for the 64-bit regime — same tuple shapes:
        ``(kmer_num, group_size_yielded, group_size_total)`` for
        "minimum", ``(kmer_num, strand, chrom, seq_start_idx, kmer_len,
        group_size_yielded, group_size_total)`` for "full", same lazy
        per-row beyond-segment raise (valid prefix rows are yielded
        first). One large-regime DIVERGENCE, a class-wide invariant: a
        sorted index is required (``sort(mesh)`` first — the uint32
        engine can walk unsorted indexes). ``kmer_len=None`` means
        unbounded-suffix group identity with "full" yielding per-row
        natural lengths clamped at ``max_kmer_len``, matching ``Kmers``.
        Backed by the bulk arrays (one vectorized pass, then a host
        loop); prefer the arrays directly at scale."""
        self._require_sorted("get_kmers")
        if kmer_info_to_yield not in ("minimum", "full"):
            raise ValueError(
                f"kmer_info_to_yield ({kmer_info_to_yield}) not recognized"
            )
        nums, pos, gsy, gst = self.get_kmers_arrays(
            kmer_len, kmer_filter_func, min_group_size, max_group_size,
            yield_first_n,
        )
        if kmer_info_to_yield == "minimum":
            for i in range(len(nums)):
                yield (int(nums[i]), int(gsy[i]), int(gst[i]))
            return
        kmer_len = self._check_kmer_len(kmer_len)
        record_num, strand, seq_idx, seg_e = self._record_cols(
            pos, nums, kmer_len, one_based_seq_index, check=False
        )
        names = self.record_names
        if kmer_len is None:
            # per-row natural lengths clamped at max_kmer_len (the uint32
            # engine's rule), never beyond-segment
            viol = np.zeros(len(nums), dtype=bool)
            row_len = self._row_lens(pos, seg_e)
        else:
            viol = pos + np.uint64(kmer_len - 1) > seg_e
            row_len = None
        for i in range(len(nums)):
            if viol[i]:
                # parity with the uint32 engine's per-row check: the valid
                # prefix has already been yielded when this fires
                raise ValueError(
                    f"kmer_len ({kmer_len}) for kmer_num ({int(nums[i])}) extends beyond the end of the segment"
                )
            rn = int(record_num[i])
            yield (
                int(nums[i]),
                str(strand[i]),
                names[rn] if names is not None else str(rn),
                int(seq_idx[i]),
                kmer_len if row_len is None else int(row_len[i]),
                int(gsy[i]),
                int(gst[i]),
            )

    def get_kmers_arrays(
        self,
        kmer_len: Union[int, None] = None,
        kmer_filter_func=None,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        yield_first_n: Union[int, None] = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Bulk array analog of Kmers.get_kmers_arrays for the large
        regime: (kmer_nums int64, sba_start_indices uint64,
        group_size_yielded, group_size_total) in yield order — survivors of
        qualifying groups, first ``yield_first_n`` per group. kmer_num is
        the row's index in the globally sorted order. NOTE: materializes
        O(rows) host memory; at multi-billion-row scale slice the work via
        group-size bounds or run the histogram APIs instead."""
        self._require_sorted("get_kmers_arrays")
        kmer_len = self._check_kmer_len(kmer_len)
        pos, surv, boundary, counts_per_group, b_idx, gst, gq = (
            self._rows_for_arrays(
                kmer_len, kmer_filter_func, min_group_size, max_group_size
            )
        )
        svc = np.cumsum(surv.astype(np.int64))
        start_excl = np.repeat(svc[b_idx] - surv[b_idx].astype(np.int64),
                               counts_per_group)
        rank = svc - 1 - start_excl  # survivor rank within group (survivors)
        yielded = surv & gq
        if yield_first_n is not None:
            yielded &= rank < yield_first_n
        sel = np.flatnonzero(yielded)
        gst_sel = gst[sel].astype(np.int64)
        if yield_first_n is None:
            gsy = gst_sel
        else:
            gsy = np.minimum(gst_sel, np.int64(yield_first_n))
        return sel.astype(np.int64), pos[sel], gsy, gst_sel

    def get_kmers_full_arrays(
        self,
        kmer_len: Union[int, None] = None,
        one_based_seq_index: bool = False,
        kmer_filter_func=None,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        yield_first_n: Union[int, None] = None,
    ) -> dict:
        """Full-info bulk arrays (large-regime analog of
        Kmers.get_kmers_full_arrays): kmer_num, record_num, strand,
        seq_start_idx, kmer_len, group_size_yielded, group_size_total.
        For a ``both_strands=True`` index, reverse-complement segments
        report strand "-", forward-convention seq_start_idx, and
        record_num into the original record list."""
        kmer_len = self._check_kmer_len(kmer_len)
        nums, pos, gsy, gst = self.get_kmers_arrays(
            kmer_len, kmer_filter_func, min_group_size, max_group_size,
            yield_first_n,
        )
        record_num, strand, seq_idx, seg_e = self._record_cols(
            pos, nums, kmer_len, one_based_seq_index
        )
        return {
            "kmer_num": nums,
            "record_num": record_num,
            "strand": strand,
            "seq_start_idx": seq_idx,
            # kmer_len None: per-row natural lengths clamped at max_kmer_len
            "kmer_len": (
                np.full(len(pos), kmer_len, dtype=np.int64)
                if kmer_len is not None
                else self._row_lens(pos, seg_e)
            ),
            "group_size_yielded": gsy,
            "group_size_total": gst,
        }

    def _record_cols(self, pos, nums, kmer_len, one_based=False, check=True):
        """(record_num int64, strand U1, seq_start_idx, seg_e) for sorted
        rows, with the beyond-segment raise (first offending row, by
        ``nums``; ``check=False`` skips it so lazy callers can yield the
        valid prefix first) — shared by get_kmers_full_arrays, get_kmers,
        and to_csv. For a ``both_strands=True`` index, reverse-complement
        segments report strand "-", forward-convention seq_start_idx, and
        record_num into the original record list."""
        starts = self.seg_starts.astype(np.uint64)
        seg_ids = np.searchsorted(starts, pos, side="right") - 1
        seg_s = starts[seg_ids]
        seg_e = self.seg_ends.astype(np.uint64)[seg_ids]
        base = np.uint64(1 if one_based else 0)
        n_fwd = self._n_fwd_records
        if n_fwd is not None:
            rc_row = seg_ids >= n_fwd
            strand = np.where(rc_row, "-", "+").astype("U1")
            seq_idx = np.where(rc_row, seg_e - pos, pos - seg_s) + base
            record_num = np.where(rc_row, 2 * n_fwd - 1 - seg_ids, seg_ids)
        else:
            strand = np.full(len(pos), "+", dtype="U1")
            seq_idx = pos - seg_s + base
            record_num = seg_ids
        if (
            check
            and kmer_len is not None
            and (pos + np.uint64(kmer_len - 1) > seg_e).any()
        ):
            bad = int(nums[np.flatnonzero(pos + np.uint64(kmer_len - 1) > seg_e)[0]])
            raise ValueError(
                f"kmer_len ({kmer_len}) for kmer_num ({bad}) extends beyond the end of the segment"
            )
        return record_num.astype(np.int64), strand, seq_idx, seg_e

    def get_kmer_strs(self, kmer_nums, kmer_len: Union[int, None] = None) -> list:
        """Decode many k-mers at once from the strided pack (no byte SBA
        exists in this regime). kmer_num indexes the globally sorted
        order. In suffix mode ``kmer_len=None`` decodes each row at its
        natural length (to the segment end), matching
        ``Kmers.get_kmer_strs(None)``."""
        from .ops.large import decode_strided_np, decode_strided_var_np

        self._require_sorted("get_kmer_strs")
        kmer_len = self._check_kmer_len(kmer_len)
        nums = np.asarray(kmer_nums, dtype=np.int64)
        if nums.size == 0:
            return []
        if (nums < 0).any() or (nums >= self._sorted[3]).any():
            raise ValueError("kmer_num out of bounds")
        pos = self.sorted_positions()[nums]
        starts = self.seg_starts.astype(np.uint64)
        seg_ids = np.searchsorted(starts, pos, side="right") - 1
        seg_e = self.seg_ends.astype(np.uint64)[seg_ids]
        if kmer_len is None:
            lens = self._row_lens(pos, seg_e)
            data, offsets = decode_strided_var_np(
                self.packed_words, pos, lens, self.two_bit
            )
            b = data.tobytes()
            return [
                b[offsets[r] : offsets[r + 1]].decode("ascii")
                for r in range(len(pos))
            ]
        if (pos + np.uint64(kmer_len - 1) > seg_e).any():
            bad = int(nums[np.flatnonzero(pos + np.uint64(kmer_len - 1) > seg_e)[0]])
            raise ValueError(
                f"kmer_len ({kmer_len}) for kmer_num ({bad}) extends beyond the end of the segment"
            )
        block = decode_strided_np(self.packed_words, pos, kmer_len, self.two_bit)
        block = np.ascontiguousarray(block)
        return block.view(f"S{kmer_len}").ravel().astype(f"U{kmer_len}").tolist()

    def get_kmer_str(self, kmer_num: int, kmer_len: Union[int, None] = None) -> str:
        """Single-k-mer decode (see ``get_kmer_strs``)."""
        return self.get_kmer_strs([int(kmer_num)], kmer_len)[0]

    def to_csv(self, kmer_len, output_file_path, fields=["kmer"]) -> None:
        """CSV output for the 64-bit regime — EXTENSION twice over: the
        reference's to_csv is an empty stub (reference kmers.py:1733-1737)
        and its engine hard-fails past 2^32 kmers (kmers.py:805-808).
        Same fields and byte-identical output as Kmers.to_csv on genomes
        both engines can hold (tests/test_large_api.py). In suffix mode
        ``kmer_len=None`` writes each row's natural-length suffix (variable
        width, matching Kmers.to_csv(None) — output is O(sum of suffix
        lengths), sane only for modest genomes). Columnar throughout:
        strided bulk decode for the kmer column + the shared pyarrow C CSV
        writer (io/csv_out.py), no per-row Python loop. NOTE: materializes
        O(rows) host memory — at multi-billion-row scale extract a
        filtered slice first (``get_kmers_full_arrays(kmer_filter_func=,
        min_group_size=, max_group_size=, yield_first_n=)`` +
        ``get_kmer_strs``) instead of writing every row."""
        from .io.csv_out import write_csv_columnar
        from .ops.large import decode_strided_np, decode_strided_var_np

        allowed = {"kmer", "kmer_num", "chrom", "start", "strand", "group_size"}
        bad = set(fields) - allowed
        if bad:
            raise ValueError(f"unrecognized fields: {sorted(bad)}")
        self._require_sorted("to_csv")
        kmer_len = self._check_kmer_len(kmer_len)
        fset = set(fields)
        need_full = bool({"chrom", "start", "strand"} & fset)
        names = self.record_names
        record_num = strand_col = seq_idx = gst = seg_e = None
        if "group_size" not in fset:
            # lean path: default group params yield every row in sorted
            # order — skip the group-geometry pass entirely
            nums = np.arange(self._sorted[3], dtype=np.int64)
            pos = self.sorted_positions()
            if need_full or "kmer" in fset:
                # _record_cols raises the Kmers.to_csv lean-path
                # beyond-segment error (first offending row)
                record_num, strand_col, seq_idx, seg_e = self._record_cols(
                    pos, nums, kmer_len
                )
        else:
            # group_size rides the group-geometry pass; ONE pipeline pass
            # serves positions AND sizes (mirrors Kmers.to_csv: no
            # beyond-segment raise unless record columns / kmer decode
            # actually need the segment extents)
            nums, pos, _, gst = self.get_kmers_arrays(kmer_len)
            if need_full or "kmer" in fset:
                record_num, strand_col, seq_idx, seg_e = self._record_cols(
                    pos, nums, kmer_len
                )
        var_kmer = None
        cols = {}
        for field in dict.fromkeys(fields):
            if field == "kmer":
                if kmer_len is None:
                    # per-row natural-length (clamped at max_kmer_len)
                    # decode into an arrow-style (data, offsets) column
                    lens = self._row_lens(pos, seg_e)
                    var_kmer = decode_strided_var_np(
                        self.packed_words, pos, lens, self.two_bit
                    )
                    cols[field] = var_kmer
                    continue
                block = np.ascontiguousarray(
                    decode_strided_np(self.packed_words, pos, kmer_len,
                                      self.two_bit)
                )
                cols[field] = block.view(f"S{kmer_len}").ravel()
            elif field == "kmer_num":
                cols[field] = nums
            elif field == "chrom":
                cols[field] = record_num  # id; names applied in the writer
            elif field == "start":
                cols[field] = seq_idx.astype(np.int64)
            elif field == "strand":
                cols[field] = strand_col
            elif field == "group_size":
                cols[field] = gst
        if "chrom" in cols and names is None:
            # zero-row output (fully-filtered index): header-only CSV, no ids
            names = (
                [str(i) for i in range(int(cols["chrom"].max()) + 1)]
                if len(cols["chrom"])
                else []
            )
        write_csv_columnar(cols, fields, names, kmer_len, var_kmer,
                           output_file_path)
    # ------------------------------------------------------------------ #
    # sharded checkpointing
    # ------------------------------------------------------------------ #

    def save_checkpoint(self, path) -> None:
        """Checkpoint the sorted sharded layout via orbax (every host
        writes its own shards; see parallel/checkpoint.py). The genome pack
        and segment tables are the constructor's inputs and are NOT saved —
        rebuild the LargeKmers the same way, then ``load_checkpoint``."""
        from .parallel.checkpoint import save_large_kmers

        self._require_sorted("save_checkpoint")
        save_large_kmers(self, path)

    def load_checkpoint(self, path, mesh) -> None:
        """Restore a sorted layout onto ``mesh`` (any device count — shards
        re-compact locally after the resharded restore). The retained-lanes
        fast path rebuilds lazily; statistics fall back to the in-kernel
        strided key build until then."""
        from .parallel.checkpoint import load_large_kmers

        load_large_kmers(self, path, mesh)
        # converged run ids are not persisted; suffix/beyond-window group
        # identity rebuilds lazily via _ensure_gid (window refinement over
        # the restored layout)
        self._gid_cache = {}
