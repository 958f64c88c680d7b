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
