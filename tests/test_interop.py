"""HDF5 schema interoperability: a checkpoint laid out exactly as the
reference's _save_hdf5 writes it (same groups/datasets/sentinels — verified
against reference kmers.py:1400-1433 and sequence_collection.py:1331-1365)
must load into this framework and serve queries. The reference itself cannot
run in this image (no numba), so the file is synthesized with h5py."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from genome_kmers_tpu import Kmers, SequenceCollection


def write_reference_style_file(path, seq_list, min_k, max_k, sorted_indices):
    """Emit the byte-identical schema the reference's save() produces."""
    parts = []
    for i, (_, seq) in enumerate(seq_list):
        parts.append(seq)
    sba_str = "$".join(parts)
    sba = np.frombuffer(sba_str.encode(), dtype=np.uint8)
    starts = np.zeros(len(seq_list), dtype=np.uint32)
    off = 0
    for i, (_, seq) in enumerate(seq_list):
        starts[i] = off
        off += len(seq) + 1

    with h5py.File(path, "w") as f:
        grp = f.create_group("kmers")
        grp["min_kmer_len"] = min_k
        grp["max_kmer_len"] = 0 if max_k is None else max_k  # None sentinel
        grp["kmer_source_strand"] = "forward"
        grp["track_strands_separately"] = False
        grp["_is_initialized"] = True
        grp["_is_set"] = False
        grp["_is_sorted"] = True
        grp["kmer_sba_start_indices"] = np.asarray(sorted_indices, dtype=np.uint32)

        sc = f.create_group("seq_coll")
        sc["forward_sba"] = sba
        sc["_forward_sba_seg_starts"] = starts
        sc["forward_record_names"] = [name for name, _ in seq_list]
        sc["revcomp_sba"] = np.array([], dtype=np.uint8)  # None sentinel
        sc["_revcomp_sba_seg_starts"] = []
        sc["revcomp_record_names"] = []
        sc["_strands_loaded"] = "forward"
        sc["_fasta_file_path"] = ""  # None sentinel


SEQ_LIST = [("chr1", "ATCGAATTAG"), ("chr2", "GGATCTTGCATT"), ("chr3", "GTGATTGACCCCT")]


def test_load_reference_style_checkpoint(tmp_path):
    # the sorted index the reference would have produced for k=3
    ours = Kmers(
        SequenceCollection(sequence_list=SEQ_LIST, strands_to_load="forward"),
        min_kmer_len=3,
        max_kmer_len=3,
    )
    ours.sort()
    path = str(tmp_path / "ref_style.h5")
    write_reference_style_file(path, SEQ_LIST, 3, 3, ours.kmer_sba_start_indices)

    km = Kmers()
    km.load(path)
    assert km.min_kmer_len == 3 and km.max_kmer_len == 3
    assert km._is_sorted and not km._is_set
    assert km.seq_coll.strands_loaded() == "forward"
    assert km.seq_coll.forward_record_names == ["chr1", "chr2", "chr3"]
    # full query surface on the loaded index
    assert km.get_kmer_count(3) == len(km)
    strs = [km.get_kmer_str(i, 3) for i in range(len(km))]
    assert strs == sorted(strs)
    hist, total = km.get_kmer_group_counts(3, max_counts_bin=10)
    assert total == len(km)
    assert km == ours


def test_none_sentinels_round_trip(tmp_path):
    """max_kmer_len=None -> 0 sentinel; revcomp arrays empty."""
    ours = Kmers(
        SequenceCollection(sequence_list=SEQ_LIST, strands_to_load="forward"),
        min_kmer_len=2,
        max_kmer_len=None,
    )
    path = str(tmp_path / "ref_none.h5")
    write_reference_style_file(path, SEQ_LIST, 2, None, ours.kmer_sba_start_indices)
    km = Kmers()
    km.load(path)
    assert km.max_kmer_len is None
    assert km.seq_coll.revcomp_sba is None
    assert km.seq_coll._revcomp_sba_seg_starts is None
    assert np.array_equal(km.kmer_sba_start_indices, ours.kmer_sba_start_indices)
    # our writer produces the same schema back
    out = str(tmp_path / "ours.h5")
    km.save(out, include_sequence_collection=True)
    with h5py.File(out) as f:
        assert set(f["kmers"].keys()) == {
            "min_kmer_len", "max_kmer_len", "kmer_source_strand",
            "track_strands_separately", "_is_initialized", "_is_set",
            "_is_sorted", "kmer_sba_start_indices",
        }
        assert set(f["seq_coll"].keys()) == {
            "forward_sba", "_forward_sba_seg_starts", "forward_record_names",
            "revcomp_sba", "_revcomp_sba_seg_starts", "revcomp_record_names",
            "_strands_loaded", "_fasta_file_path",
        }
        assert f["kmers"]["max_kmer_len"][()] == 0
