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
``jax.sharding.Mesh`` (a 1-device mesh works) and a bounded
``max_kmer_len`` (<= 64 on the 2-bit path, <= 32 on 4-bit).

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
        max_kmer_len: int,
        two_bit: bool = True,
        record_names: Union[list, None] = None,
    ) -> None:
        limit = 64 if two_bit else 32
        if max_kmer_len is None or max_kmer_len > limit:
            raise NotImplementedError(
                f"the large regime requires a bounded max_kmer_len <= {limit}"
                f" ({'2' if two_bit else '4'}-bit pack)"
            )
        if min_kmer_len < 1 or min_kmer_len > max_kmer_len:
            raise ValueError(
                f"min_kmer_len ({min_kmer_len}) must be in [1, max_kmer_len]"
            )
        self.packed_words = np.asarray(packed_words, dtype=np.uint32)
        self.seg_starts = np.asarray(seg_starts_u64, dtype=np.uint64)
        self.seg_ends = np.asarray(seg_ends_u64, dtype=np.uint64)
        if len(self.seg_starts) != len(self.seg_ends) or len(self.seg_starts) == 0:
            raise ValueError("segment starts/ends must be non-empty and aligned")
        self.min_kmer_len = int(min_kmer_len)
        self.max_kmer_len = int(max_kmer_len)
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
        self._sorted = None  # ((hi, lo), is_pad, mesh) after sort()
        self._is_sorted = False

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #

    @classmethod
    def from_records(
        cls,
        records: Iterable,
        min_kmer_len: int,
        max_kmer_len: int,
        both_strands: bool = False,
        two_bit: Union[bool, None] = None,
    ) -> "LargeKmers":
        """Build streaming from ``(name, sequence)`` pairs (str or bytes).

        Records are packed chunk-by-chunk with '$' separators — the
        concatenated ASCII SBA never materializes. ``both_strands=True``
        appends every record's reverse complement as additional segments
        (the large-regime analog of ``Kmers.from_strand(source_strand=
        "both")`` — equal strings from the two strands share groups).
        ``two_bit=None`` autodetects by scanning the records first, so
        ``records`` must be re-iterable (a list); pass an explicit bool to
        stream a one-shot iterator.
        """
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

        return cls(
            packed_words,
            np.asarray(starts, dtype=np.uint64),
            np.asarray(ends, dtype=np.uint64),
            min_kmer_len,
            max_kmer_len,
            two_bit=two_bit,
            record_names=names,
        )

    @classmethod
    def from_sequence_collection(
        cls, seq_coll, min_kmer_len: int, max_kmer_len: int,
        both_strands: bool = False,
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
            two_bit=None,
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

    def __len__(self) -> int:
        return self.num_kmers

    def sort(self, mesh, positions: Union[np.ndarray, None] = None) -> None:
        """Distributed 64-bit sample sort of the index over ``mesh``
        (parallel.sample_sort_positions_large_ragged); the sorted layout
        stays device-resident for the statistics calls. ``positions``
        optionally restricts the index to an explicit uint64 subset."""
        from .parallel.sample_sort import sample_sort_positions_large_ragged

        pos = self.build_positions() if positions is None else np.asarray(
            positions, dtype=np.uint64
        )
        (hi, lo), is_pad = sample_sort_positions_large_ragged(
            self.packed_words, pos, self.seg_starts, self.seg_ends,
            self.max_kmer_len, mesh, two_bit=self.two_bit,
        )
        self._sorted = ((hi, lo), is_pad, mesh, len(pos))
        self._is_sorted = True

    def sorted_positions(self) -> np.ndarray:
        """Globally sorted positions as host uint64, pads removed."""
        if not self._is_sorted:
            raise ValueError("LargeKmers must be sorted first. Run sort(mesh).")
        (hi, lo), is_pad, _, n_real = self._sorted
        pad = np.asarray(is_pad)
        keep = pad == 0
        out = fuse64_np(np.asarray(hi)[keep], np.asarray(lo)[keep])
        assert out.shape[0] == n_real
        return out

    # ------------------------------------------------------------------ #
    # statistics (uint64-exact)
    # ------------------------------------------------------------------ #

    def get_kmer_group_counts(
        self,
        kmer_len: Union[int, None] = None,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        max_counts_bin: int = 1000000,
    ) -> tuple[np.ndarray, int]:
        """Group-size histogram (uint64) + exact total over the sorted
        sharded layout (parallel.distributed_group_size_histogram_large_
        ragged). ``kmer_len`` defaults to ``max_kmer_len``; any
        ``kmer_len <= max_kmer_len`` is exact (the sorted order refines
        every shorter-prefix order)."""
        from .parallel.large import distributed_group_size_histogram_large_ragged

        if not self._is_sorted:
            raise AssertionError(
                "The kmers must be sorted when calling get_kmer_group_counts"
            )
        if kmer_len is None:
            kmer_len = self.max_kmer_len
        if kmer_len < 1 or kmer_len > self.max_kmer_len:
            raise ValueError(
                f"kmer_len ({kmer_len}) must be in [1, max_kmer_len ({self.max_kmer_len})]"
            )
        if max_counts_bin <= 0:
            raise ValueError(f"max_counts_bin ({max_counts_bin}) must be >= 1")
        (hi, lo), is_pad, mesh, _ = self._sorted
        return distributed_group_size_histogram_large_ragged(
            self.packed_words, hi, lo, is_pad, self.seg_starts, self.seg_ends,
            kmer_len, mesh, min_group_size=min_group_size,
            max_group_size=max_group_size, max_counts_bin=max_counts_bin,
            two_bit=self.two_bit,
        )

    def get_kmer_count(
        self,
        kmer_len: Union[int, None] = None,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
    ) -> int:
        """Total k-mers in qualifying groups (exact uint64)."""
        _, total = self.get_kmer_group_counts(
            kmer_len, min_group_size=min_group_size,
            max_group_size=max_group_size, max_counts_bin=1,
        )
        return total
