"""Native C++ sidecar tests: byte-identical parity with the NumPy paths.

The native layer is a pure accelerator with automatic fallback, so every test
also passes when the toolchain is unavailable (skipped)."""

import numpy as np
import pytest

from genome_kmers_tpu.io.fasta import parse_fasta_bytes
from genome_kmers_tpu.native import (
    get_lib,
    parse_fasta_bytes_native,
    reverse_complement_native,
)
from genome_kmers_tpu.ops.encoding import COMPLEMENT_TABLE

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")

FASTAS = [
    b">chr1\nATCGAATTAG\n",
    b">chr1\nATCGAATTAG\n>chr2\nGGATCTTGCATT\n>chr3\nGTGATTGACCCCT\n",
    b">chr1\nATCGA\nATTAG\n>chr2 desc here\nGGAT\nCTTGCATT\n",
    b">chr1\r\nATCG\r\nAATT\r\n>chr2\r\nGGCC\r\n",
    b">chr1\natcgaattag\n",
    b">chr1\nATCG",  # no trailing newline
    b">a\nA\n>b\nC\n>c\nG\n",
]


@pytest.mark.parametrize("data", FASTAS)
def test_parse_parity(data):
    sba_np, starts_np, names_np = parse_fasta_bytes(data)
    sba_nat, starts_nat, header_spans = parse_fasta_bytes_native(data)
    assert np.array_equal(sba_nat, sba_np)
    assert np.array_equal(starts_nat, starts_np)
    from genome_kmers_tpu.io.fasta import _get_fasta_record_name

    names_nat = [_get_fasta_record_name(data[int(s) : int(e)].decode()) for s, e in header_spans]
    assert names_nat == names_np


def test_parse_empty_sequence_error():
    with pytest.raises(ValueError):
        parse_fasta_bytes_native(b">chr1\nATCG\n>chr2\n>chr3\nGGCC\n")


def test_reverse_complement_parity():
    rng = np.random.default_rng(5)
    chars = np.frombuffer(b"ACGTRYSWKMBDHVN$", dtype=np.uint8)
    sba = rng.choice(chars, size=10001)
    expected = COMPLEMENT_TABLE[sba][::-1].copy()
    got = reverse_complement_native(sba, COMPLEMENT_TABLE)
    assert np.array_equal(got, expected)


def test_end_to_end_fasta_init_uses_native(tmp_path):
    """SequenceCollection FASTA init routes through the native parser and
    stays output-identical to the seq_list path."""
    from genome_kmers_tpu import SequenceCollection

    p = tmp_path / "g.fasta"
    p.write_text(">c1\nATCGAATTAG\n>c2\nGGATCTTGCATT\n")
    a = SequenceCollection(fasta_file_path=p, strands_to_load="both")
    b = SequenceCollection(
        sequence_list=[("c1", "ATCGAATTAG"), ("c2", "GGATCTTGCATT")], strands_to_load="both"
    )
    assert a == b


class TestMultithreadedParse:
    @pytest.mark.parametrize("data", FASTAS)
    def test_small_inputs_parity(self, data):
        """Force the MT path on tiny inputs; must match the NumPy parser."""
        from genome_kmers_tpu.native import _parse_fasta_bytes_mt

        lib = get_lib()
        sba_np, starts_np, names_np = parse_fasta_bytes(data)
        res = _parse_fasta_bytes_mt(data, lib)
        assert res is not None
        sba_mt, starts_mt, header_spans = res
        assert np.array_equal(sba_mt, sba_np)
        assert np.array_equal(starts_mt, starts_np)

    def test_large_input_parity(self):
        """Multi-record 20 MB input through the real >8MB MT path."""
        rng = np.random.default_rng(12)
        parts = []
        for i in range(7):
            n = int(rng.integers(1, 4 * 10**6))
            seq = rng.choice(np.frombuffer(b"ACGTacgtN", dtype=np.uint8), size=n)
            body = bytes(seq)
            # wrap lines at 61 chars with some CRLF records
            nl = b"\r\n" if i % 3 == 0 else b"\n"
            wrapped = nl.join(body[j : j + 61] for j in range(0, n, 61))
            parts.append(b">rec" + str(i).encode() + b" desc\n" + wrapped + nl)
        data = b"".join(parts)
        assert len(data) > 8 << 20
        from genome_kmers_tpu.native import parse_fasta_bytes_native

        sba_np, starts_np, names_np = parse_fasta_bytes(data)
        sba_nat, starts_nat, header_spans = parse_fasta_bytes_native(data)
        assert np.array_equal(sba_nat, sba_np)
        assert np.array_equal(starts_nat, starts_np)

    def test_mt_empty_sequence_error(self):
        from genome_kmers_tpu.native import _parse_fasta_bytes_mt

        lib = get_lib()
        with pytest.raises(ValueError):
            _parse_fasta_bytes_mt(b">a\nACGT\n>b\n>c\nGG\n", lib)


class TestPackStrided:
    """Native strided rank pack must be bit-identical to the NumPy pack."""

    @pytest.mark.parametrize("n", [0, 1, 15, 16, 17, 1000, 4097])
    @pytest.mark.parametrize("bits", [2, 4])
    def test_pack_parity(self, n, bits):
        from genome_kmers_tpu.native import pack_strided_native
        from genome_kmers_tpu.ops.encoding import RANK2_TABLE, RANK_TABLE

        rng = np.random.default_rng(n * 7 + bits)
        sba = rng.choice(np.frombuffer(b"ACGTN$", dtype=np.uint8), size=n)
        table = RANK2_TABLE if bits == 2 else RANK_TABLE
        bpw = 32 // bits
        nat = pack_strided_native(sba, table, bits)
        assert nat is not None
        ranks = table[sba].astype(np.uint32)
        pad = (-len(ranks)) % bpw
        if pad:
            ranks = np.concatenate([ranks, np.zeros(pad, dtype=np.uint32)])
        grid = ranks.reshape(-1, bpw)
        word = np.zeros(grid.shape[0], dtype=np.uint32)
        for j in range(bpw):
            word |= grid[:, j] << np.uint32(32 - bits - bits * j)
        ref = np.concatenate([word, np.zeros(8, dtype=np.uint32)])
        np.testing.assert_array_equal(nat, ref)


class TestDecodeRows:
    """Native bulk k-mer decode must be byte-identical to the NumPy
    per-offset gather in Kmers._decode_block_bytes."""

    @pytest.mark.parametrize("n", [0, 1, 7, 100_000])
    @pytest.mark.parametrize("k", [1, 5, 31])
    def test_decode_parity(self, n, k):
        from genome_kmers_tpu.native import decode_rows_native

        rng = np.random.default_rng(n * 13 + k)
        sba = rng.choice(np.frombuffer(b"ACGTN$", dtype=np.uint8), size=max(n + k + 10, 64))
        pos = rng.integers(0, len(sba) - k + 1, size=n).astype(np.int64)
        nat = decode_rows_native(sba, pos, k)
        assert nat is not None
        ref = np.empty((n, k), dtype=np.uint8)
        for j in range(k):
            ref[:, j] = sba[pos + j]
        np.testing.assert_array_equal(nat, ref)

    def test_decode_bounds_guard(self):
        from genome_kmers_tpu.native import decode_rows_native

        sba = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
        with pytest.raises(IndexError):
            decode_rows_native(sba, np.array([6], dtype=np.int64), 5)
        with pytest.raises(IndexError):
            decode_rows_native(sba, np.array([-1], dtype=np.int64), 3)


class TestDecodeRowsVar:
    """Native variable-width decode must match the NumPy repeat-gather."""

    @pytest.mark.parametrize("n", [0, 1, 9, 50_000])
    def test_var_decode_parity(self, n):
        from genome_kmers_tpu.native import decode_rows_var_native

        rng = np.random.default_rng(n * 3 + 1)
        sba = rng.choice(np.frombuffer(b"ACGTN$", dtype=np.uint8), size=max(n + 40, 64))
        lens = rng.integers(0, 30, size=n).astype(np.int64)
        pos = rng.integers(0, len(sba) - 30, size=n).astype(np.int64)
        nat = decode_rows_var_native(sba, pos, lens)
        assert nat is not None
        data, offsets = nat
        exp_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=exp_off[1:])
        np.testing.assert_array_equal(offsets, exp_off)
        total = int(exp_off[-1])
        idx = np.repeat(pos - exp_off[:-1], lens) + np.arange(total, dtype=np.int64)
        np.testing.assert_array_equal(data, sba[idx])

    def test_var_decode_bounds_guard(self):
        from genome_kmers_tpu.native import decode_rows_var_native

        sba = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
        with pytest.raises(IndexError):
            decode_rows_var_native(
                sba, np.array([6], dtype=np.int64), np.array([5], dtype=np.int64)
            )
        with pytest.raises(ValueError):
            decode_rows_var_native(
                sba, np.array([0], dtype=np.int64), np.array([-1], dtype=np.int64)
            )
