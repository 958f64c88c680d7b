// Native FASTA -> sequence-byte-array parser.
//
// The reference parses FASTA with a per-line Python loop at ~40 Mbp/s
// (reference sequence_collection.py:476-576).  At TPU ingest rates that
// parser dominates wall-clock (SURVEY.md §7.3-5), so the hot byte work —
// stripping headers/newlines, uppercasing, inserting '$' separators —
// lives here as a single linear scan; Python keeps only the (tiny) record
// name handling.  Exposed as extern "C" for ctypes.
//
// Contract (mirrors io/fasta.py parse_fasta_bytes):
//   * records separated by '$' in the output; no trailing separator
//   * sequence bytes uppercased; '\r' and '\n' dropped
//   * gk_fasta_stats returns per-record sequence lengths so the caller can
//     validate empty sequences and allocate exactly.

#include <cstdint>
#include <cstring>

namespace {

inline uint8_t upper(uint8_t c) {
    return (c >= 'a' && c <= 'z') ? static_cast<uint8_t>(c - 32) : c;
}

}  // namespace

extern "C" {

// Pass 1: count records and per-record sequence lengths.
//   data/n:       raw file bytes
//   seq_lens_out: capacity max_records; filled with per-record bp counts
//   returns number of records, or -1 if more than max_records.
int64_t gk_fasta_stats(const uint8_t* data, int64_t n, int64_t* seq_lens_out,
                       int64_t max_records) {
    int64_t num_records = 0;
    int64_t i = 0;
    bool at_line_start = true;
    bool in_header = false;
    while (i < n) {
        uint8_t c = data[i];
        if (at_line_start) {
            in_header = (c == '>');
            if (in_header) {
                if (num_records >= max_records) return -1;
                seq_lens_out[num_records++] = 0;
            }
            at_line_start = false;
        }
        if (c == '\n') {
            at_line_start = true;
        } else if (!in_header && c != '\r') {
            if (num_records > 0) seq_lens_out[num_records - 1]++;
        }
        i++;
    }
    return num_records;
}

// Pass 2: fill the '$'-separated, uppercased SBA.
//   sba_out must have capacity sum(seq_lens) + num_records - 1.
//   header_starts_out/header_ends_out (capacity num_records) receive the
//   byte offsets of each header line (exclusive of '\n' and '\r').
//   Returns bytes written, or -1 on logic error.
int64_t gk_fasta_fill(const uint8_t* data, int64_t n, uint8_t* sba_out,
                      int64_t sba_capacity, int64_t* header_starts_out,
                      int64_t* header_ends_out) {
    int64_t out = 0;
    int64_t i = 0;
    int64_t record = 0;
    bool at_line_start = true;
    bool in_header = false;
    while (i < n) {
        uint8_t c = data[i];
        if (at_line_start) {
            in_header = (c == '>');
            if (in_header) {
                if (record > 0) {
                    if (out >= sba_capacity) return -1;
                    sba_out[out++] = '$';
                }
                header_starts_out[record] = i;
                record++;
            }
            at_line_start = false;
        }
        if (c == '\n') {
            if (in_header) {
                int64_t e = i;
                if (e > 0 && data[e - 1] == '\r') e--;
                header_ends_out[record - 1] = e;
            }
            at_line_start = true;
            in_header = false;
        } else if (!in_header && c != '\r') {
            if (out >= sba_capacity) return -1;
            sba_out[out++] = upper(c);
        }
        i++;
    }
    if (in_header) {  // file ends inside a header line without newline
        header_ends_out[record - 1] = n;
    }
    return out;
}

// Validate alphabet against an allowed-bytes table (256 entries, 1 = ok).
// Returns the first offending byte value, or -1 if all allowed.
int64_t gk_validate_alphabet(const uint8_t* sba, int64_t n,
                             const uint8_t* allowed) {
    for (int64_t i = 0; i < n; i++) {
        if (!allowed[sba[i]]) return sba[i];
    }
    return -1;
}

// Reverse complement: out[i] = table[in[n-1-i]].  table is a 256-entry map.
void gk_reverse_complement(const uint8_t* in, int64_t n, const uint8_t* table,
                           uint8_t* out) {
    for (int64_t i = 0; i < n; i++) {
        out[i] = table[in[n - 1 - i]];
    }
}

}  // extern "C"
