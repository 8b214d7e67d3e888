// yaha_tpu native host library: high-throughput I/O path.
//
// TPU-native equivalents of the reference's host-side C components
// (SURVEY.md section 2.3): the nib2 codec (Compress.c), the FASTA/FASTQ
// query parser (Query.c:102-228), and the SAM record serializer fast path
// (AlignOutput.c:115-321).  Batch-oriented, in-memory APIs designed for a
// feeder thread filling device batches, exposed through a C ABI consumed
// via ctypes (yaha_tpu/native/host.py).  Semantics are kept byte-parity
// with the Python implementations (cross-tested in tests/test_native.py).
//
// Build: tools/build_native.sh  ->  yaha_tpu/native/libyaha_host.so
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <string>
#include <vector>

extern "C" {

// ---------- shared ----------

void yt_free(void* p) { free(p); }

// char -> 4-bit code table (Math.c:141-152 values; >=128 maps to X=14).
static uint8_t four_bit_codes[256];
static char four_bit_chars[17] = "TCAGNBDHKMRSVWXY";
static uint8_t four_bit_comp[16] = {2, 3, 0, 1, 4, 12, 7, 6,
                                    9, 8, 15, 11, 5, 13, 14, 10};

static void init_tables() {
    static bool done = false;
    if (done) return;
    for (int i = 0; i < 256; i++) four_bit_codes[i] = 14;
    const char* bases = "ABCDGHKMNRSTUVWY";
    const uint8_t codes[] = {2, 5, 1, 6, 3, 7, 8, 9, 4, 10, 11, 0, 0, 12,
                             13, 15};
    for (int i = 0; bases[i]; i++) {
        four_bit_codes[(uint8_t)bases[i]] = codes[i];
        four_bit_codes[(uint8_t)(bases[i] + 32)] = codes[i];
    }
    done = true;
}

// ---------- nib2 codec ----------

// FASTA -> nib2, matching compressFile (Compress.c:220-329): bytes 0-31
// skipped, names stop at first space, sequences padded with X codes to a
// 4-byte boundary, version-2 header.
int yt_compress_fasta(const uint8_t* in, int64_t n, uint8_t** out,
                      int64_t* out_n) {
    init_tables();
    std::vector<std::string> names;
    std::vector<int64_t> seq_starts, seq_lengths;
    std::vector<uint8_t> bases;  // packed
    int64_t i = 0;
    int64_t base_count = 0;
    bool in_seq = false;
    auto finalize = [&]() {
        if (!in_seq) return;
        if (base_count & 1) {
            bases.back() |= 14;  // X pad nibble
        }
        while (bases.size() & 3) bases.push_back(0xEE);
        seq_lengths.push_back(base_count);
        base_count = 0;
    };
    while (i < n) {
        uint8_t c = in[i];
        if (c <= 31) { i++; continue; }
        if (c == '>') {
            finalize();
            int64_t nl = i + 1;
            while (nl < n && in[nl] != '\n') nl++;
            std::string name((const char*)in + i + 1, nl - i - 1);
            size_t sp = name.find(' ');
            if (sp != std::string::npos) name.resize(sp);
            names.push_back(name);
            seq_starts.push_back((int64_t)bases.size());
            in_seq = true;
            i = nl + 1;
            continue;
        }
        uint8_t code = four_bit_codes[c];
        if (base_count & 1) bases.back() |= code;
        else bases.push_back(code << 4);
        base_count++;
        i++;
    }
    finalize();

    int64_t seq_count = (int64_t)names.size();
    int64_t tot_name = 0;
    for (auto& s : names) tot_name += (int64_t)s.size();
    int64_t tot_name_pad = (tot_name + 3) & ~3LL;
    int64_t preamble = 20 + 16 * seq_count + tot_name_pad;
    int64_t total = preamble + (int64_t)bases.size();
    uint8_t* buf = (uint8_t*)malloc(total);
    if (!buf) return -1;
    uint32_t* u = (uint32_t*)buf;
    u[0] = 0x01020304u;
    u[1] = 2;
    u[2] = (uint32_t)preamble;
    u[3] = (uint32_t)seq_count;
    int64_t name_off = 0;
    for (int64_t k = 0; k < seq_count; k++) {
        u[4 + 4 * k + 0] = (uint32_t)seq_starts[k];
        u[4 + 4 * k + 1] = (uint32_t)seq_lengths[k];
        u[4 + 4 * k + 2] = (uint32_t)name_off;
        u[4 + 4 * k + 3] = (uint32_t)names[k].size();
        name_off += (int64_t)names[k].size();
    }
    u[4 + 4 * seq_count] = 0;  // mask block count
    uint8_t* p = buf + 16 + 16 * seq_count + 4;
    for (auto& s : names) { memcpy(p, s.data(), s.size()); p += s.size(); }
    memset(p, 0, tot_name_pad - tot_name);
    p += tot_name_pad - tot_name;
    memcpy(p, bases.data(), bases.size());
    *out = buf;
    *out_n = total;
    return 0;
}

// nib2 packed bytes -> one 4-bit code per output byte.
int yt_unpack_nib2(const uint8_t* in, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; i++) {
        out[2 * i] = in[i] >> 4;
        out[2 * i + 1] = in[i] & 0xF;
    }
    return 0;
}

// ---------- FASTA/FASTQ query parser ----------

// Parse a whole query file into flat batch arrays, replicating
// readNextQuery semantics (Query.c:102-228): ids (spaces->underscores,
// truncated at 200), sequence bytes with embedded newlines stripped,
// FASTQ quality with the @-after-newline heuristic, skip-with-warning for
// over-length/short/mismatched records, stop at a zero-length record.
//
// Outputs (malloc'd, caller frees with yt_free):
//   ids:     concatenated id bytes;       id_offs:  n_reads+1 int64
//   seqs:    concatenated sequence bytes; seq_offs: n_reads+1 int64
//   quals:   concatenated quality bytes (empty if FASTA)
int yt_parse_queries(const uint8_t* in, int64_t n, int fastq,
                     int64_t max_query_len, int64_t word_len,
                     uint8_t** ids, int64_t** id_offs,
                     uint8_t** seqs, int64_t** seq_offs,
                     uint8_t** quals, int64_t* n_reads) {
    std::vector<uint8_t> id_buf, seq_buf, qual_buf;
    std::vector<int64_t> id_off{0}, seq_off{0};
    const int MAX_ID = 200;
    int64_t pos = 1;  // first '>'/'@' consumed by format sniff
    int64_t count = 0;
    while (pos <= n && pos < n) {
        // ID line.
        int64_t nl = pos;
        while (nl < n && in[nl] != '\n') nl++;
        int64_t id_len = nl - pos;
        int64_t id_take = id_len > MAX_ID ? MAX_ID : id_len;
        size_t id_base = id_buf.size();
        for (int64_t k = 0; k < id_take; k++) {
            uint8_t c = in[pos + k];
            id_buf.push_back(c == ' ' ? '_' : c);
        }
        pos = nl + 1;
        // Sequence.
        uint8_t brk = fastq ? '+' : '>';
        int64_t seq_end = pos;
        while (seq_end < n && in[seq_end] != brk) seq_end++;
        size_t seq_base = seq_buf.size();
        for (int64_t k = pos; k < seq_end; k++)
            if (in[k] != '\n') seq_buf.push_back(in[k]);
        int64_t seq_len = (int64_t)(seq_buf.size() - seq_base);
        pos = seq_end + 1;
        bool fail = false;
        size_t qual_base = qual_buf.size();
        if (fastq) {
            // Skip rest of '+' line.
            while (pos < n && in[pos] != '\n') pos++;
            pos++;
            int64_t qstart = pos;
            // Quality until '@' preceded by a newline inside the region.
            int64_t at = pos;
            while (at < n) {
                if (in[at] == '@' && at > qstart && in[at - 1] == '\n')
                    break;
                at++;
            }
            for (int64_t k = qstart; k < at && k < n; k++)
                if (in[k] != '\n') qual_buf.push_back(in[k]);
            pos = at < n ? at + 1 : n;
            int64_t qual_len = (int64_t)(qual_buf.size() - qual_base);
            if (seq_len > max_query_len || qual_len > max_query_len)
                fail = true;
            else if (seq_len != qual_len) {
                fprintf(stderr,
                        "Warning.  Query sequence (%lld) and quality score "
                        "sequence (%lld) have different lengths in fastq "
                        "file.  Query will be skipped.\n",
                        (long long)seq_len, (long long)qual_len);
                fail = true;
            }
        } else if (seq_len > max_query_len) {
            fprintf(stderr,
                    "Warning.  Query sequence exceeds maximum length of "
                    "%lld.  Query will be skipped.\n",
                    (long long)max_query_len);
            fail = true;
        }
        if (fail) {
            id_buf.resize(id_base);
            seq_buf.resize(seq_base);
            qual_buf.resize(qual_base);
            continue;
        }
        if (seq_len == 0) {
            // Reference semantics: a zero-length record ends processing.
            id_buf.resize(id_base);
            seq_buf.resize(seq_base);
            qual_buf.resize(qual_base);
            break;
        }
        if (seq_len < word_len) {
            fprintf(stderr, "Query length must be at least wordlen bases "
                            "long. Query will be skipped.\n");
            id_buf.resize(id_base);
            seq_buf.resize(seq_base);
            qual_buf.resize(qual_base);
            continue;
        }
        id_off.push_back((int64_t)id_buf.size());
        seq_off.push_back((int64_t)seq_buf.size());
        count++;
    }
    auto dup = [](const std::vector<uint8_t>& v) {
        uint8_t* p = (uint8_t*)malloc(v.size() ? v.size() : 1);
        memcpy(p, v.data(), v.size());
        return p;
    };
    auto dup64 = [](const std::vector<int64_t>& v) {
        int64_t* p = (int64_t*)malloc(v.size() * sizeof(int64_t));
        memcpy(p, v.data(), v.size() * sizeof(int64_t));
        return p;
    };
    *ids = dup(id_buf);
    *id_offs = dup64(id_off);
    *seqs = dup(seq_buf);
    *seq_offs = dup64(seq_off);
    *quals = dup(qual_buf);
    *n_reads = count;
    return 0;
}

// ---------- SAM serializer fast path ----------

// Render CIGAR + MD for one alignment from run-length op arrays
// (AlignOutput.c:162-273 semantics: M/R merged in CIGAR; MD with the
// '0'-after-delete hack).  ops are the op chars 'M','R','I','D','H','S';
// genome_codes indexed from ref_off for R/D runs.
int yt_format_cigar_md(const uint8_t* ops, const int32_t* lens, int64_t n,
                       const uint8_t* genome_codes, int64_t ref_off,
                       char** cigar_out, char** md_out) {
    init_tables();
    std::string cigar, md;
    char tmp[32];
    int64_t matches = 0;
    for (int64_t k = 0; k < n; k++) {
        char op = (char)ops[k];
        if (op == 'M' || op == 'R') {
            matches += lens[k];
            continue;
        }
        if (matches > 0) {
            snprintf(tmp, sizeof tmp, "%lldM", (long long)matches);
            cigar += tmp;
            matches = 0;
        }
        snprintf(tmp, sizeof tmp, "%d%c", lens[k], op);
        cigar += tmp;
    }
    if (matches > 0) {
        snprintf(tmp, sizeof tmp, "%lldM", (long long)matches);
        cigar += tmp;
    }

    matches = 0;
    char previous = 'U';
    int64_t cur = ref_off;
    for (int64_t k = 0; k < n; k++) {
        char op = (char)ops[k];
        int32_t len = lens[k];
        if (op == 'M') {
            matches += len;
            cur += len;
        } else if (op == 'R') {
            if (matches > 0) {
                snprintf(tmp, sizeof tmp, "%lld", (long long)matches);
                md += tmp;
                matches = 0;
            }
            if (previous == 'D') md += '0';
            for (int32_t t = 0; t < len; t++)
                md += four_bit_chars[genome_codes[cur + t]];
            cur += len;
        } else if (op == 'D') {
            if (matches > 0) {
                snprintf(tmp, sizeof tmp, "%lld", (long long)matches);
                md += tmp;
                matches = 0;
            }
            md += '^';
            for (int32_t t = 0; t < len; t++)
                md += four_bit_chars[genome_codes[cur + t]];
            cur += len;
        }
        previous = op;
    }
    if (matches > 0) {
        snprintf(tmp, sizeof tmp, "%lld", (long long)matches);
        md += tmp;
    }
    *cigar_out = strdup(cigar.c_str());
    *md_out = strdup(md.c_str());
    return 0;
}

// Reverse-complement chars for a batch of reads (reverse buffers,
// Query.c:158-168 semantics: canonical uppercase complement chars).
int yt_revcomp_codes(const uint8_t* codes, int64_t n, uint8_t* rev_codes,
                     uint8_t* rev_chars) {
    init_tables();
    for (int64_t i = 0; i < n; i++) {
        uint8_t rc = four_bit_comp[codes[n - 1 - i] & 0xF];
        rev_codes[i] = rc;
        rev_chars[i] = (uint8_t)four_bit_chars[rc];
    }
    return 0;
}

int yt_map_codes(const uint8_t* chars, int64_t n, uint8_t* codes) {
    init_tables();
    for (int64_t i = 0; i < n; i++) codes[i] = four_bit_codes[chars[i]];
    return 0;
}

}  // extern "C"
