// fem_tpu native host library: mapping sort + traceback + SAM emission.
//
// The device pipeline returns a small accepted-hit set per batch; this
// module performs the host-side tail of the mapping loop at C++ speed:
// per-read stable mapping sort (key semantics of reference src/align.c:53),
// banded Myers re-run + CIGAR/MD traceback (src/align.c:279-544), and SAM
// text formatting matching htslib's record rendering (src/align.c:546-632,
// src/output_queue.c:83). Behavior is validated byte-for-byte against the
// Python golden model (fem_tpu/golden/model.py) in tests.
//
// Fresh implementation: structured around flat batch buffers and a single
// output string, not the reference's per-record bam1_t construction.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

uint8_t char_to_code_table[256];
uint8_t nt16_table[256];
const char* kNt16Chars = "=ACMGRSVTWYHKDBN";
const char code_to_char_tbl[8] = {'A', 'C', 'G', 'T', 'N', 'N', 'N', 'N'};

struct TableInit {
  TableInit() {
    memset(char_to_code_table, 4, sizeof(char_to_code_table));
    const char* b = "ACGT";
    for (int i = 0; i < 4; ++i) {
      char_to_code_table[(uint8_t)b[i]] = (uint8_t)i;
      char_to_code_table[(uint8_t)(b[i] + 32)] = (uint8_t)i;
    }
    memset(nt16_table, 15, sizeof(nt16_table));
    for (int i = 0; i < 16; ++i) {
      uint8_t c = (uint8_t)kNt16Chars[i];
      nt16_table[c] = (uint8_t)i;
      if (c >= 'A' && c <= 'Z') nt16_table[c + 32] = (uint8_t)i;
    }
    nt16_table[(uint8_t)'U'] = 8;
    nt16_table[(uint8_t)'u'] = 8;
  }
} table_init;

inline uint8_t c2c(uint8_t c) { return char_to_code_table[c]; }

struct MappingRec {
  uint8_t direction;
  uint8_t edit_distance;
  int32_t sid;
  uint64_t band_pos;   // in-chromosome band start
  int32_t end_offset;  // end position relative to band start
  uint64_t key;        // sort key (src/align.c:53)
};

// Banded Myers storing per-column D0/HP for traceback (src/align.c:303-338).
// pattern/text are raw chars; the DP runs on codes, classification on chars.
void run_myers_planes(const uint8_t* pattern, const uint8_t* text, int L,
                      int e, std::vector<uint32_t>& D0s,
                      std::vector<uint32_t>& HPs) {
  uint32_t Peq[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 2 * e; ++i) Peq[c2c(pattern[i])] |= 1u << i;
  const uint32_t hb = 1u << (2 * e);
  uint32_t VP = 0, VN = 0;
  for (int i = 0; i < L; ++i) {
    Peq[c2c(pattern[i + 2 * e])] |= hb;
    uint32_t X = Peq[c2c(text[i])] | VN;
    uint32_t D0 = ((VP + (X & VP)) ^ VP) | X;
    uint32_t HN = VP & D0;
    uint32_t HP = VN | ~(VP | D0);
    X = D0 >> 1;
    VN = X & HP;
    VP = HN | ~(X | HP);
    D0s[i] = D0;
    HPs[i] = HP;
    for (int a = 0; a < 5; ++a) Peq[a] >>= 1;
  }
}

void append_int(std::string& out, int64_t v) {
  char buf[24];
  int n = snprintf(buf, sizeof(buf), "%lld", (long long)v);
  out.append(buf, n);
}

// CIGAR/MD traceback; returns mapping start relative to band start.
// Mirrors generate_alignment + generate_MD_tag (src/align.c:279-544).
int generate_alignment(const uint8_t* pattern, const uint8_t* text, int L,
                       int ed, int end_pos, int e,
                       std::vector<std::pair<char, int>>& cigar,
                       std::string& md) {
  cigar.clear();
  md.clear();
  int start = end_pos - L + 1;
  // Fast path: chars all equal -> single "<L>M" (src/align.c:288-300).
  bool clean = true;
  for (int i = 0; i < L; ++i)
    if (text[i] != pattern[start + i]) { clean = false; break; }
  if (clean) {
    cigar.emplace_back('M', L);
  } else {
    static thread_local std::vector<uint32_t> D0s, HPs;
    D0s.resize(L);
    HPs.resize(L);
    run_myers_planes(pattern, text, L, e, D0s, HPs);
    int bit = end_pos - L + 1;
    int tp = L - 1;
    int errs = 0;
    int end = end_pos;
    char pre;
    int pre_n = 1;
    auto d0 = [&]() { return (D0s[tp] >> bit) & 1u; };
    auto hp = [&]() { return (HPs[tp] >> bit) & 1u; };
    // Rightmost column (src/align.c:345-368).
    if (d0() && pattern[end] == text[tp]) {
      --tp; --end; pre = 'M';
    } else if (!d0()) {
      --tp; --end; ++errs; pre = 'S';
    } else if (d0() && hp()) {
      --tp; ++bit; ++errs; pre = 'S'; ++start;
    } else {
      abort();  // a deletion cannot end the alignment
    }
    std::vector<char> ops;
    std::vector<int> lens;
    while (tp >= 0) {
      if (errs == ed) break;
      if (d0() && pattern[end] == text[tp]) {
        --tp; --end;
        if (pre != 'M') { ops.push_back(pre); lens.push_back(pre_n); pre = 'M'; pre_n = 1; }
        else ++pre_n;
      } else if (!d0()) {
        --tp; --end; ++errs;
        if (pre == 'S') ++pre_n;
        else if (pre != 'M') { ops.push_back(pre); lens.push_back(pre_n); pre = 'M'; pre_n = 1; }
        else ++pre_n;
      } else if (d0() && hp()) {
        --tp; ++bit; ++errs;
        if (pre == 'S') ++pre_n;
        else if (pre != 'I') { ops.push_back(pre); lens.push_back(pre_n); pre = 'I'; pre_n = 1; }
        else ++pre_n;
        ++start;
      } else {
        --bit; --end; ++errs;
        if (pre != 'D') { ops.push_back(pre); lens.push_back(pre_n); pre = 'D'; pre_n = 1; }
        else ++pre_n;
        --start;
      }
    }
    if (tp >= 0) {  // budget consumed: the rest are matches (src/align.c:445-459)
      if (pre != 'M') {
        ops.push_back(pre); lens.push_back(pre_n);
        ops.push_back('M'); lens.push_back(tp + 1);
      } else {
        ops.push_back('M'); lens.push_back(pre_n + tp + 1);
      }
    } else {
      ops.push_back(pre); lens.push_back(pre_n);
    }
    // Fold trailing substitution run, emit reversed (src/align.c:465-496).
    size_t lo = 0;
    if (ops[0] == 'S') { lens[1] += lens[0]; lo = 1; }
    for (size_t i = ops.size(); i-- > lo;) {
      char op = ops[i] == 'S' ? 'M' : ops[i];
      // 'S' only survives at index 0 which is folded; anything else is M/I/D.
      cigar.emplace_back(op, lens[i]);
    }
  }
  // MD tag (src/align.c:501-544).
  const uint8_t* ref = pattern + start;
  int rp = 0, qp = 0, matches = 0;
  for (auto& [op, n] : cigar) {
    if (op == 'M') {
      for (int i = 0; i < n; ++i) {
        if (ref[rp] == text[qp]) {
          ++matches;
        } else {
          if (matches) { append_int(md, matches); matches = 0; }
          md.push_back((char)ref[rp]);
        }
        ++rp; ++qp;
      }
    } else if (op == 'I') {
      qp += n;
    } else {  // D
      if (matches) { append_int(md, matches); matches = 0; }
      md.push_back('^');
      for (int i = 0; i < n; ++i) md.push_back((char)ref[rp++]);
    }
  }
  if (matches) append_int(md, matches);
  return start;
}

}  // namespace

extern "C" {

// Emit SAM records for a batch. Mappings are grouped per read via
// map_counts and must be in generation order (+ strand candidates then
// - strand, each ascending) — the stable sort here reproduces the
// radix-sorted emission order (src/align.c:56-57).
//
// Returns a malloc'd buffer in *out_buf (length *out_len); caller frees
// with fem_free. Returns 0 on success.
int fem_emit_batch(
    const uint8_t* ref_blob, const int64_t* ref_offsets, const int64_t* ref_lens,
    const uint8_t* ref_names_blob, const int64_t* ref_name_offsets,
    int32_t /*num_refs*/,
    const uint8_t* names_blob, const int64_t* name_offsets,
    const uint8_t* seqs_blob, const int64_t* seq_offsets,
    const uint8_t* quals_blob,
    int32_t num_reads,
    const int32_t* map_counts,
    const uint8_t* m_dir, const uint8_t* m_ed, const int32_t* m_sid,
    const int64_t* m_pos, const int32_t* m_end,
    int32_t error_threshold,
    uint8_t** out_buf, int64_t* out_len) {
  std::string out;
  out.reserve(1 << 20);
  std::vector<MappingRec> recs;
  std::vector<uint8_t> neg;
  std::vector<std::pair<char, int>> cigar;
  std::string md;
  int64_t mi0 = 0;
  const int e = error_threshold;
  for (int32_t r = 0; r < num_reads; ++r) {
    int32_t cnt = map_counts[r];
    if (cnt == 0) continue;
    const uint8_t* seq = seqs_blob + seq_offsets[r];
    const uint8_t* qual = quals_blob + seq_offsets[r];
    const int L = (int)(seq_offsets[r + 1] - seq_offsets[r]);
    recs.clear();
    for (int32_t i = 0; i < cnt; ++i) {
      MappingRec m;
      m.direction = m_dir[mi0 + i];
      m.edit_distance = m_ed[mi0 + i];
      m.sid = m_sid[mi0 + i];
      m.band_pos = (uint64_t)m_pos[mi0 + i];
      m.end_offset = m_end[mi0 + i];
      uint64_t cand = ((uint64_t)m.sid << 32) | m.band_pos;
      m.key = ((uint64_t)m.edit_distance << 60) |
              ((uint64_t)m.direction << 59) |
              ((cand + (uint64_t)m.end_offset) & ((1ull << 59) - 1));
      recs.push_back(m);
    }
    mi0 += cnt;
    std::stable_sort(recs.begin(), recs.end(),
                     [](const MappingRec& a, const MappingRec& b) {
                       return a.key < b.key;
                     });
    // Negative-strand chars (src/sequence_batch.h:90-98).
    neg.resize(L);
    for (int i = 0; i < L; ++i)
      neg[i] = (uint8_t)code_to_char_tbl[(3 ^ c2c(seq[L - 1 - i])) & 7];

    for (size_t k = 0; k < recs.size(); ++k) {
      const MappingRec& m = recs[k];
      const uint8_t* pattern = ref_blob + ref_offsets[m.sid] + m.band_pos;
      const uint8_t* text = m.direction ? neg.data() : seq;
      int start =
          generate_alignment(pattern, text, L, m.edit_distance,
                             m.end_offset, e, cigar, md);
      int64_t pos0 = (int64_t)m.band_pos + start;
      int flag = (m.direction ? 16 : 0) | (k > 0 ? 256 : 0);
      // QNAME FLAG RNAME POS MAPQ CIGAR RNEXT PNEXT TLEN SEQ QUAL NM MD
      out.append((const char*)(names_blob + name_offsets[r]),
                 name_offsets[r + 1] - name_offsets[r]);
      out.push_back('\t');
      append_int(out, flag);
      out.push_back('\t');
      out.append((const char*)(ref_names_blob + ref_name_offsets[m.sid]),
                 ref_name_offsets[m.sid + 1] - ref_name_offsets[m.sid]);
      out.push_back('\t');
      append_int(out, pos0 + 1);
      out.append("\t255\t");
      for (auto& [op, n] : cigar) {
        append_int(out, n);
        out.push_back(op);
      }
      out.append("\t*\t0\t0\t");
      if (k == 0) {
        // SEQ: nt16 round trip of the *forward* read (src/align.c:79,619-621).
        for (int i = 0; i < L; ++i)
          out.push_back(kNt16Chars[nt16_table[seq[i]]]);
        out.push_back('\t');
        out.append((const char*)qual, L);
      } else {
        out.append("*\t*");  // secondary: l_qseq = 0 (src/align.c:85)
      }
      out.append("\tNM:i:");
      append_int(out, m.edit_distance);
      out.append("\tMD:Z:");
      out.append(md);
      out.push_back('\n');
    }
  }
  *out_len = (int64_t)out.size();
  *out_buf = (uint8_t*)malloc(out.size());
  if (!*out_buf) return 1;
  memcpy(*out_buf, out.data(), out.size());
  return 0;
}

void fem_free(uint8_t* p) { free(p); }

}  // extern "C"
