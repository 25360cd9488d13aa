// needletail_tpu native framer: SIMD-speed FASTA/FASTQ record scanning and
// padded-batch filling for the TPU ingest path.
//
// Semantics mirror the reference framers exactly (needletail
// src/parser/fastq.rs, src/parser/fasta.rs): strict 4-line FASTQ records
// ('@' start, '+' separator, seq/qual length equality with trailing-\r trim,
// quality *characters* deliberately unvalidated), FASTA records delimited by
// lines starting with '>'.  Incomplete tails and EOF edge cases are left to
// the Python layer; this module only frames complete records — the hot 99%.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>

namespace {

inline const uint8_t* find_nl(const uint8_t* p, const uint8_t* end) {
    return static_cast<const uint8_t*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
}

// Length of [b, e) after removing one trailing '\r' (trim_cr, ref
// utils.rs:12-18).
inline int64_t trimmed_len(const uint8_t* b, const uint8_t* e) {
    int64_t n = e - b;
    if (n > 0 && e[-1] == '\r') --n;
    return n;
}

}  // namespace

extern "C" {

// Error kinds (match needletail_tpu.errors.ParseErrorKind ordering)
enum NtError : int32_t {
    NT_OK = 0,
    NT_INVALID_START = 1,
    NT_INVALID_SEPARATOR = 2,
    NT_UNEQUAL_LENGTHS = 3,
};

// Scan complete FASTQ records.
//
//   buf/len   : window anchored at a record start
//   recs      : int64[cap*5] out — (start, seq, sep, qual, end) per record,
//               offsets relative to buf; `end` is the index of the record's
//               final newline (all() == buf[start:end])
//   cap       : max records to emit
//   consumed  : out, byte offset one past the last emitted record
//   err       : out, NtError; framing stops at the offending record
//   err_rec   : out, (start<<32)|stage data packed? -- kept simple: start
//               offset of the record that failed validation
//
// Returns number of complete, valid records framed.
int64_t nt_scan_fastq(const uint8_t* buf, int64_t len, int64_t* recs,
                      int64_t cap, int64_t* consumed, int32_t* err,
                      int64_t* err_rec) {
    const uint8_t* base = buf;
    const uint8_t* end = buf + len;
    const uint8_t* p = buf;
    int64_t n = 0;
    *err = NT_OK;
    *err_rec = -1;
    while (n < cap) {
        const uint8_t* n1 = find_nl(p, end);
        if (!n1) break;
        const uint8_t* n2 = find_nl(n1 + 1, end);
        if (!n2) break;
        const uint8_t* n3 = find_nl(n2 + 1, end);
        if (!n3) break;
        const uint8_t* n4 = find_nl(n3 + 1, end);
        if (!n4) break;
        // validate (ref fastq.rs:240-285)
        if (*p != '@') {
            *err = NT_INVALID_START;
            *err_rec = p - base;
            break;
        }
        if (n2[1] != '+') {  // separator line starts one past the 2nd newline
            *err = NT_INVALID_SEPARATOR;
            *err_rec = p - base;
            break;
        }
        int64_t seq_len = trimmed_len(n1 + 1, n2);
        int64_t qual_len = trimmed_len(n3 + 1, n4);
        if (seq_len != qual_len) {
            *err = NT_UNEQUAL_LENGTHS;
            *err_rec = p - base;
            break;
        }
        int64_t* r = recs + n * 5;
        r[0] = p - base;       // start ('@')
        r[1] = (n1 + 1) - base;  // seq line start
        r[2] = (n2 + 1) - base;  // separator line start
        r[3] = (n3 + 1) - base;  // quality line start
        r[4] = n4 - base;        // final newline index
        ++n;
        p = n4 + 1;
    }
    *consumed = p - base;
    return n;
}

// Scan complete FASTA records (record ends when the next line starts '>').
//
//   recs : int64[cap*3] out — (start, first_nl, end) per record where
//          `first_nl` is the header-terminating newline offset and `end` is
//          the offset of the newline before the next '>' (all() ==
//          buf[start:end]); first_nl == end means a header-only record.
int64_t nt_scan_fasta(const uint8_t* buf, int64_t len, int64_t* recs,
                      int64_t cap, int64_t* consumed) {
    const uint8_t* base = buf;
    const uint8_t* end = buf + len;
    const uint8_t* p = buf;
    int64_t n = 0;
    while (n < cap) {
        // find the record terminator: "\n>" with the '>' in-bounds
        const uint8_t* first_nl = nullptr;
        const uint8_t* q = p;
        const uint8_t* term = nullptr;
        while (true) {
            const uint8_t* nl = find_nl(q, end);
            if (!nl || nl + 1 >= end) {
                term = nullptr;
                break;
            }
            if (!first_nl) first_nl = nl;
            if (nl[1] == '>') {
                term = nl;
                break;
            }
            q = nl + 1;
        }
        if (!term) break;
        if (!first_nl) break;  // cannot happen if term found, defensive
        int64_t* r = recs + n * 3;
        r[0] = p - base;
        r[1] = first_nl - base;
        r[2] = term - base;
        ++n;
        p = term + 1;
    }
    *consumed = p - base;
    return n;
}

// Fill a padded batch from scanned FASTQ records: copy sequence and quality
// lines (with trailing-\r trimmed) into [cap_rows, max_len] row-major
// buffers and write lengths.  Rows beyond `n` are left untouched (caller
// zero-initializes).  Returns the number of rows whose sequence exceeded
// max_len (0 means all fit; offending rows are truncated NOT copied).
int64_t nt_fill_fastq_batch(const uint8_t* buf, const int64_t* recs,
                            int64_t n, uint8_t* seq_out, uint8_t* qual_out,
                            int32_t* lengths, int64_t max_len) {
    int64_t overflow = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t* r = recs + i * 5;
        const uint8_t* sb = buf + r[1];
        // sequence line spans [r[1], r[2]-1) — r[2]-1 is its '\n'
        int64_t slen = trimmed_len(sb, buf + r[2] - 1);
        if (slen > max_len) {
            ++overflow;
            lengths[i] = 0;
            continue;
        }
        memcpy(seq_out + i * max_len, sb, static_cast<size_t>(slen));
        if (qual_out) {
            const uint8_t* qb = buf + r[3];
            memcpy(qual_out + i * max_len, qb, static_cast<size_t>(slen));
        }
        lengths[i] = static_cast<int32_t>(slen);
    }
    return overflow;
}

// Fill a padded batch from scanned FASTA records: copy each record's
// sequence span (between the header newline and the record end) into
// [cap_rows, max_len] rows, skipping '\n' and '\r' bytes (the batched form
// of the newline-stripping seq() accessor, ref fasta.rs:66-99).
// Returns the number of rows whose stripped sequence exceeded max_len
// (those rows get length 0 and are not copied).
int64_t nt_fill_fasta_batch(const uint8_t* buf, const int64_t* recs,
                            int64_t n, uint8_t* seq_out, int32_t* lengths,
                            int64_t max_len) {
    int64_t overflow = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t* r = recs + i * 3;
        const uint8_t* p = buf + r[1] + 1;  // first byte after header newline
        const uint8_t* end = buf + r[2];    // record-terminating newline
        uint8_t* out = seq_out + i * max_len;
        int64_t len = 0;
        bool bad = false;
        while (p < end && !bad) {
            const uint8_t* nl = static_cast<const uint8_t*>(
                memchr(p, '\n', static_cast<size_t>(end - p)));
            const uint8_t* line_end = nl ? nl : end;
            // strip every '\r' in the line too, like the memchr2-based
            // seq() (ref fasta.rs:76-98); almost always zero hits
            while (p < line_end) {
                const uint8_t* cr = static_cast<const uint8_t*>(
                    memchr(p, '\r', static_cast<size_t>(line_end - p)));
                const uint8_t* stop = cr ? cr : line_end;
                int64_t seg = stop - p;
                if (len + seg > max_len) {
                    ++overflow;
                    bad = true;
                    break;
                }
                memcpy(out + len, p, static_cast<size_t>(seg));
                len += seg;
                p = stop + 1;
            }
            p = line_end + 1;
        }
        lengths[i] = bad ? 0 : static_cast<int32_t>(len);
    }
    return overflow;
}

// Fill a padded id plane from scanned records: id bytes are the header
// line minus its leading marker byte ('@'/'>') with a trailing '\r'
// trimmed.  Works for both layouts: FASTQ recs (stride 5, header newline
// at r[1]-1 => end_adjust 1) and FASTA recs (stride 3, header newline at
// r[1] => end_adjust 0).  The caller sizes id_max to the chunk's longest
// id, so truncation cannot occur; the return value counts truncated rows
// defensively.
int64_t nt_fill_ids(const uint8_t* buf, const int64_t* recs, int64_t n,
                    int64_t stride, int64_t end_adjust, uint8_t* id_out,
                    int32_t* id_lens, int64_t id_max) {
    int64_t overflow = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t* r = recs + i * stride;
        const uint8_t* b = buf + r[0] + 1;
        const uint8_t* e = buf + r[1] - end_adjust;
        int64_t len = trimmed_len(b, e);
        if (len > id_max) {
            ++overflow;
            len = id_max;
        }
        if (len > 0) memcpy(id_out + i * id_max, b, static_cast<size_t>(len));
        id_lens[i] = static_cast<int32_t>(len);
    }
    return overflow;
}

// Pack record ids '\n'-separated into one contiguous buffer (ids cannot
// contain '\n'), so Python materializes the whole id list with a single
// bytes.split — no per-record interpreter work.  Returns bytes written
// (every id followed by one '\n'); the caller must size `out` to at least
// sum(header line lengths) + n.
int64_t nt_pack_ids(const uint8_t* buf, const int64_t* recs, int64_t n,
                    int64_t stride, int64_t end_adjust, uint8_t* out) {
    uint8_t* w = out;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t* r = recs + i * stride;
        const uint8_t* b = buf + r[0] + 1;
        const uint8_t* e = buf + r[1] - end_adjust;
        int64_t len = trimmed_len(b, e);
        if (len > 0) memcpy(w, b, static_cast<size_t>(len));
        w += len;
        *w++ = '\n';
    }
    return w - out;
}

// Longest newline/CR-stripped sequence length across scanned FASTA
// records — sizes batch rows to true sequence length instead of the raw
// span (which over-pads wrapped FASTA by the newline fraction).
int64_t nt_fasta_max_len(const uint8_t* buf, const int64_t* recs, int64_t n) {
    int64_t best = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t* r = recs + i * 3;
        const uint8_t* p = buf + r[1] + 1;
        const uint8_t* end = buf + r[2];
        if (p > end) continue;
        int64_t len = end - p;
        const uint8_t* q = p;
        while ((q = find_nl(q, end)) != nullptr) {
            --len;
            ++q;
        }
        q = p;
        while ((q = static_cast<const uint8_t*>(
                    memchr(q, '\r', static_cast<size_t>(end - q)))) != nullptr) {
            --len;
            ++q;
        }
        if (len > best) best = len;
    }
    return best;
}

// Count newlines in [buf, buf+len) — utility for line accounting.
int64_t nt_count_newlines(const uint8_t* buf, int64_t len) {
    int64_t count = 0;
    const uint8_t* p = buf;
    const uint8_t* end = buf + len;
    while ((p = find_nl(p, end)) != nullptr) {
        ++count;
        ++p;
    }
    return count;
}

}  // extern "C"
