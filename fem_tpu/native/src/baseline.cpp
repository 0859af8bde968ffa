// fem_baseline — standalone CPU all-mapping short-read mapper.
//
// Purpose: (a) a fast differential oracle for large-scale testing of the
// TPU engine (the original reference binary cannot be built here: its
// htslib submodule is not vendored), and (b) the measured CPU baseline for
// bench.py's vs_baseline ratio.
//
// Implements the pinned reference behavior (see fem_tpu/golden/model.py
// for the cited spec): succinct window/step hash index, group seeding with
// optimal prefix q-gram selection, q-gram pigeonhole filtering with greedy
// +-e dedup, banded Myers verification (<=7 errors, 3e early exit),
// CIGAR/MD traceback and SAM text output. Fresh C++17 code organized as a
// single translation unit over flat std::vector state.
//
// Usage:
//   fem_baseline index <k> <step> <ref.fa> <out.index>
//   fem_baseline map -e E -a A -t T --ref R --index I --read1 Q -o OUT

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include "align_core.h"

using namespace femtpu;

namespace {

// ---------------------------------------------------------------- sequence IO

struct Sequences {
  std::vector<std::string> names;
  std::vector<std::string> seqs;
  std::vector<std::string> quals;  // empty for FASTA
};

class GzLineReader {
 public:
  explicit GzLineReader(const char* path) : f_(gzopen(path, "rb")) {
    if (!f_) {
      fprintf(stderr, "cannot open %s\n", path);
      exit(1);
    }
    buf_.resize(1 << 20);
  }
  ~GzLineReader() {
    if (f_) gzclose(f_);
  }
  bool getline(std::string& out) {
    out.clear();
    while (true) {
      if (pos_ >= len_) {
        len_ = gzread(f_, buf_.data(), (unsigned)buf_.size());
        pos_ = 0;
        if (len_ <= 0) return !out.empty();
      }
      char* nl = (char*)memchr(buf_.data() + pos_, '\n', len_ - pos_);
      if (nl) {
        size_t n = nl - (buf_.data() + pos_);
        out.append(buf_.data() + pos_, n);
        pos_ += n + 1;
        if (!out.empty() && out.back() == '\r') out.pop_back();
        return true;
      }
      out.append(buf_.data() + pos_, len_ - pos_);
      pos_ = len_;
    }
  }

 private:
  gzFile f_;
  std::vector<char> buf_;
  int pos_ = 0, len_ = 0;
};

void load_fasta(const char* path, Sequences& out) {
  GzLineReader r(path);
  std::string line;
  while (r.getline(line)) {
    if (line.empty()) continue;
    if (line[0] == '>') {
      size_t sp = line.find_first_of(" \t", 1);
      out.names.emplace_back(line.substr(1, sp == std::string::npos
                                                 ? std::string::npos
                                                 : sp - 1));
      out.seqs.emplace_back();
    } else if (!out.seqs.empty()) {
      out.seqs.back() += line;
    }
  }
}

// Streaming FASTQ batch reader.
class FastqStream {
 public:
  explicit FastqStream(const char* path) : r_(path) {}
  // Fills up to `max` records; returns count.
  size_t next_batch(size_t max, Sequences& out) {
    out.names.clear();
    out.seqs.clear();
    out.quals.clear();
    std::string line;
    while (out.seqs.size() < max && r_.getline(line)) {
      if (line.empty()) continue;
      if (line[0] != '@') {
        fprintf(stderr, "malformed FASTQ header\n");
        exit(1);
      }
      size_t sp = line.find_first_of(" \t", 1);
      out.names.emplace_back(
          line.substr(1, sp == std::string::npos ? std::string::npos : sp - 1));
      std::string seq;
      while (r_.getline(line) && !line.empty() && line[0] != '+') seq += line;
      std::string qual;
      while (qual.size() < seq.size() && r_.getline(line)) qual += line;
      out.seqs.push_back(std::move(seq));
      out.quals.push_back(std::move(qual));
    }
    return out.seqs.size();
  }

 private:
  GzLineReader r_;
};

// --------------------------------------------------------------------- index

struct Index {
  int32_t k = 12;
  int32_t step = 3;
  std::vector<uint32_t> lookup;  // 4^k + 1
  std::vector<uint64_t> occ;     // seqid<<32 | pos, bucket-sorted

  uint32_t freq(uint32_t h) const { return lookup[h + 1] - lookup[h]; }
  const uint64_t* occs(uint32_t h) const { return occ.data() + lookup[h]; }
};

inline uint32_t hash_at(const char* s, size_t pos, int k) {
  uint32_t h = 0;
  for (int i = 0; i < k; ++i) {
    uint8_t b = c2c((uint8_t)s[pos + i]);
    h = (h << 2) | (b < 4 ? b : 0);
  }
  return h & ((1u << (2 * k)) - 1);
}

void build_index(const Sequences& ref, int k, int step, Index& index) {
  index.k = k;
  index.step = step;
  size_t buckets = (size_t)1 << (2 * k);
  index.lookup.assign(buckets + 1, 0);
  // Pass 1: counts.
  for (auto& s : ref.seqs) {
    if ((int64_t)s.size() < k) continue;
    for (size_t p = 0; p + k - 1 < s.size(); p += step)
      ++index.lookup[hash_at(s.data(), p, k) + 1];
  }
  for (size_t i = 1; i <= buckets; ++i) index.lookup[i] += index.lookup[i - 1];
  // Pass 2: fill with per-bucket cursors; entries arrive in (seqid, pos)
  // ascending order, so buckets come out position-sorted.
  index.occ.resize(index.lookup[buckets]);
  std::vector<uint32_t> cursor(index.lookup.begin(), index.lookup.end() - 1);
  for (size_t sid = 0; sid < ref.seqs.size(); ++sid) {
    const std::string& s = ref.seqs[sid];
    if ((int64_t)s.size() < k) continue;
    for (size_t p = 0; p + k - 1 < s.size(); p += step) {
      uint32_t h = hash_at(s.data(), p, k);
      index.occ[cursor[h]++] = ((uint64_t)sid << 32) | (uint32_t)p;
    }
  }
}

void save_index(const Index& index, const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) { fprintf(stderr, "cannot write %s\n", path); exit(1); }
  fwrite(&index.k, 4, 1, f);
  fwrite(&index.step, 4, 1, f);
  fwrite(index.lookup.data(), 4, index.lookup.size(), f);
  uint64_t n = index.occ.size();
  fwrite(&n, 8, 1, f);
  fwrite(index.occ.data(), 8, n, f);
  fclose(f);
}

void load_index(const char* path, Index& index) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
  if (fread(&index.k, 4, 1, f) != 1 || fread(&index.step, 4, 1, f) != 1) {
    fprintf(stderr, "bad index header\n"); exit(1);
  }
  size_t buckets = (size_t)1 << (2 * index.k);
  index.lookup.resize(buckets + 1);
  if (fread(index.lookup.data(), 4, buckets + 1, f) != buckets + 1) {
    fprintf(stderr, "truncated lookup\n"); exit(1);
  }
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fprintf(stderr, "bad occ size\n"); exit(1); }
  index.occ.resize(n);
  if (fread(index.occ.data(), 8, n, f) != n) {
    fprintf(stderr, "truncated occ\n"); exit(1);
  }
  fclose(f);
}

// ------------------------------------------------------------------ mapping

struct Params {
  int e = 2;
  int a = 1;
  int threads = 1;
};

struct Stats {
  uint64_t reads = 0, mapped = 0, cand_pre = 0, cand = 0, mappings = 0;
  void operator+=(const Stats& o) {
    reads += o.reads; mapped += o.mapped; cand_pre += o.cand_pre;
    cand += o.cand; mappings += o.mappings;
  }
};

struct SeedSel {
  uint32_t hash;
  int start;
  uint32_t freq;
};

// Optimal prefix q-gram DP (uint32-wrapping; ties prefer horizontal).
// Returns min total; fills `picked` in traceback order.
uint32_t select_qgrams(const Index& index, int S, int span, int ng,
                       const uint32_t* freqs, std::vector<int>& picked) {
  picked.clear();
  int rows = S + 1;
  int cols = ng - S * span + 2;
  if (cols < 2) return (uint32_t)index.occ.size();  // degenerate (defined)
  static thread_local std::vector<uint32_t> M;
  static thread_local std::vector<uint8_t> D;
  M.assign((size_t)rows * cols, 0);
  D.assign((size_t)rows * cols, 3);
  for (int r = 1; r < rows; ++r) M[(size_t)r * cols] = (uint32_t)index.occ.size();
  for (int r = 1; r < rows; ++r) {
    for (int c = 1; c < cols; ++c) {
      int p = c + (r - 1) * span - 1;
      uint32_t vert = M[(size_t)(r - 1) * cols + c] + freqs[p];
      uint32_t horiz = M[(size_t)r * cols + c - 1];
      if (vert < horiz) {
        M[(size_t)r * cols + c] = vert;
        D[(size_t)r * cols + c] = 2;
      } else {
        M[(size_t)r * cols + c] = horiz;
        D[(size_t)r * cols + c] = 1;
      }
    }
  }
  int r = rows - 1, c = cols - 1;
  while (D[(size_t)r * cols + c] != 3) {
    if (D[(size_t)r * cols + c] == 2) {
      picked.push_back(c + (r - 1) * span - 1);
      --r;
    } else {
      --c;
    }
  }
  return M[(size_t)rows * cols - 1];
}

// Per-group candidate generation: k-way merge of the selected seeds'
// filtered diagonal positions (last seed truncated at the running merge's
// maximum), pigeonhole vote, then greedy merge-dedup into `cands`.
void group_candidates(const Index& index, const Params& P,
                      std::vector<SeedSel>& sel, std::vector<uint64_t>& cands,
                      std::vector<uint64_t>& merged,
                      std::vector<uint64_t>& scratch) {
  // Stable sort by frequency (selection order preserved on ties).
  std::stable_sort(sel.begin(), sel.end(),
                   [](const SeedSel& x, const SeedSel& y) {
                     return x.freq < y.freq;
                   });
  merged.clear();
  size_t n = sel.size();
  // Seeds 0..n-2: full sorted union of filtered diagonal positions.
  for (size_t si = 0; si + 1 < n; ++si) {
    const uint64_t* o = index.occs(sel[si].hash);
    scratch.clear();
    for (uint32_t i = 0; i < sel[si].freq; ++i) {
      if ((uint32_t)o[i] >= (uint32_t)sel[si].start)
        scratch.push_back(o[i] - sel[si].start);
    }
    size_t mid = merged.size();
    merged.insert(merged.end(), scratch.begin(), scratch.end());
    std::inplace_merge(merged.begin(), merged.begin() + mid, merged.end());
  }
  // Last (highest-frequency) seed: only positions <= max of the others.
  if (n) {
    size_t si = n - 1;
    if (!merged.empty()) {
      uint64_t cap = merged.back();
      const uint64_t* o = index.occs(sel[si].hash);
      scratch.clear();
      for (uint32_t i = 0; i < sel[si].freq; ++i) {
        if ((uint32_t)o[i] >= (uint32_t)sel[si].start) {
          uint64_t v = o[i] - sel[si].start;
          if (v <= cap) scratch.push_back(v);
          else break;  // positions ascend within a bucket
        }
      }
      size_t mid = merged.size();
      merged.insert(merged.end(), scratch.begin(), scratch.end());
      std::inplace_merge(merged.begin(), merged.begin() + mid, merged.end());
    }
  }
  // Pigeonhole vote: keep p iff more than `a` positions lie in [p, p+e].
  scratch.clear();
  size_t m = merged.size();
  for (size_t i = 0; i < m; ++i) {
    if ((size_t)P.a + i < m && merged[i + P.a] <= merged[i] + (uint64_t)P.e)
      scratch.push_back(merged[i]);
    else if (P.a == 0)
      scratch.push_back(merged[i]);
  }
  // Greedy +-e dedup over the sorted union with the running candidates.
  merged.clear();
  std::merge(cands.begin(), cands.end(), scratch.begin(), scratch.end(),
             std::back_inserter(merged));
  cands.clear();
  for (uint64_t v : merged)
    if (cands.empty() || v > cands.back() + (uint64_t)P.e) cands.push_back(v);
}

struct Mapping {
  uint8_t dir;
  uint8_t ed;
  uint64_t cand;  // seqid<<32 | band start
  int32_t end;
  uint64_t key() const {
    return ((uint64_t)ed << 60) | ((uint64_t)dir << 59) |
           ((cand + (uint64_t)end) & ((1ull << 59) - 1));
  }
};

class Mapper {
 public:
  Mapper(const Sequences& ref, const Index& index, const Params& params)
      : ref_(ref), index_(index), P_(params) {}

  // Maps one read; appends SAM lines to `out`.
  void map_read(const std::string& name, const std::string& seq,
                const std::string& qual, Stats& st, std::string& out) {
    st.reads += 1;
    int L = (int)seq.size();
    // Negative strand chars.
    neg_.resize(L);
    for (int i = 0; i < L; ++i)
      neg_[i] = Tables::kCodeToChar[(3 ^ c2c((uint8_t)seq[L - 1 - i])) & 7];
    mappings_.clear();
    for (int dir = 0; dir < 2; ++dir) {
      const char* text = dir ? neg_.data() : seq.data();
      cands_.clear();
      uint32_t pre = generate_candidates(text, L);
      st.cand_pre += pre;
      st.cand += cands_.size();
      verify(text, L, (uint8_t)dir, st);
    }
    if (mappings_.empty()) return;
    st.mapped += 1;
    emit(name, seq, qual, out);
  }

 private:
  uint32_t generate_candidates(const char* text, int L) {
    const int k = index_.k, step = index_.step;
    int span = (k + step - 1) / step;
    int S = P_.e + 1 + P_.a;
    int num_seeds = L - k + 1;
    if (num_seeds <= 0) return 0;
    if (S > num_seeds / step) return 0;
    hashes_.resize(num_seeds);
    uint32_t mask = (1u << (2 * k)) - 1;
    uint32_t h = 0;
    int ambig = 0;
    for (int i = 0; i < k; ++i) {
      uint8_t b = c2c((uint8_t)text[i]);
      h = ((h << 2) | (b < 4 ? b : 0)) & mask;
    }
    hashes_[0] = h;
    for (int i = 1; i < num_seeds; ++i) {
      uint8_t b = c2c((uint8_t)text[i + k - 1]);
      if (b < 4) {
        h = ((h << 2) | b) & mask;
      } else {
        h = (h << 2) & mask;
        ++ambig;
      }
      hashes_[i] = h;
    }
    if (ambig > P_.e) return 0;
    cands_.clear();
    uint32_t pre_total = 0;
    for (int si = 0; si < step; ++si) {
      int ng = (num_seeds - si) / step;
      freqs_.resize(ng);
      for (int p = 0; p < ng; ++p)
        freqs_[p] = index_.freq(hashes_[si + p * step]);
      pre_total += select_qgrams(index_, S, span, ng, freqs_.data(), picked_);
      if ((int)picked_.size() < S) continue;  // degenerate group
      sel_.clear();
      for (int p : picked_) {
        int pos = si + p * step;
        sel_.push_back({hashes_[pos], pos, freqs_[p]});
      }
      group_candidates(index_, P_, sel_, cands_, merged_, scratch_);
    }
    // Range filter + band-start shift.
    size_t w = 0;
    for (uint64_t c : cands_) {
      uint32_t sid = (uint32_t)(c >> 32);
      uint32_t pos = (uint32_t)c;
      uint64_t len = ref_.seqs[sid].size();
      if (pos >= (uint32_t)P_.e && (uint64_t)pos + L + P_.e < len)
        cands_[w++] = c - (uint64_t)P_.e;
    }
    cands_.resize(w);
    return pre_total;
  }

  void verify(const char* text, int L, uint8_t dir, Stats& st) {
    for (uint64_t c : cands_) {
      uint32_t sid = (uint32_t)(c >> 32);
      uint32_t pos = (uint32_t)c;
      const uint8_t* pattern = (const uint8_t*)ref_.seqs[sid].data() + pos;
      int end = 0;
      int ed = banded_edit_distance(pattern, (const uint8_t*)text, L, P_.e, &end);
      if (ed <= P_.e) {
        mappings_.push_back({dir, (uint8_t)ed, c, end});
        st.mappings += 1;
      }
    }
  }

  void emit(const std::string& name, const std::string& seq,
            const std::string& qual, std::string& out) {
    std::stable_sort(mappings_.begin(), mappings_.end(),
                     [](const Mapping& x, const Mapping& y) {
                       return x.key() < y.key();
                     });
    int L = (int)seq.size();
    const Tables& tbl = tables();
    for (size_t k = 0; k < mappings_.size(); ++k) {
      const Mapping& m = mappings_[k];
      uint32_t sid = (uint32_t)(m.cand >> 32);
      uint64_t band = (uint32_t)m.cand;
      const uint8_t* pattern = (const uint8_t*)ref_.seqs[sid].data() + band;
      const uint8_t* text =
          m.dir ? (const uint8_t*)neg_.data() : (const uint8_t*)seq.data();
      int start = generate_alignment(pattern, text, L, m.ed, m.end, P_.e,
                                     cigar_, md_);
      int flag = (m.dir ? 16 : 0) | (k > 0 ? 256 : 0);
      out.append(name);
      out.push_back('\t');
      append_int(out, flag);
      out.push_back('\t');
      out.append(ref_.names[sid]);
      out.push_back('\t');
      append_int(out, (int64_t)band + start + 1);
      out.append("\t255\t");
      for (auto& [op, n] : cigar_) {
        append_int(out, n);
        out.push_back(op);
      }
      out.append("\t*\t0\t0\t");
      if (k == 0) {
        for (int i = 0; i < L; ++i)
          out.push_back(Tables::kNt16Chars[tbl.nt16[(uint8_t)seq[i]]]);
        out.push_back('\t');
        out.append(qual.empty() ? std::string(L, 'I') : qual);
      } else {
        out.append("*\t*");
      }
      out.append("\tNM:i:");
      append_int(out, m.ed);
      out.append("\tMD:Z:");
      out.append(md_);
      out.push_back('\n');
    }
  }

  const Sequences& ref_;
  const Index& index_;
  Params P_;
  std::vector<uint32_t> hashes_, freqs_;
  std::vector<int> picked_;
  std::vector<SeedSel> sel_;
  std::vector<uint64_t> cands_, merged_, scratch_;
  std::vector<char> neg_;
  std::vector<Mapping> mappings_;
  std::vector<std::pair<char, int>> cigar_;
  std::string md_;
};

// ------------------------------------------------------------------ drivers

int index_main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr, "Usage: fem_baseline index <k> <step> <ref> <out>\n");
    return 1;
  }
  int k = atoi(argv[1]), step = atoi(argv[2]);
  Sequences ref;
  load_fasta(argv[3], ref);
  Index index;
  build_index(ref, k, step, index);
  fprintf(stderr, "Collected %zu seeds.\n", index.occ.size());
  save_index(index, argv[4]);
  return 0;
}

int map_main(int argc, char** argv) {
  Params P;
  const char* ref_path = nullptr;
  const char* index_path = nullptr;
  const char* reads_path = nullptr;
  const char* out_path = nullptr;
  for (int i = 1; i < argc; ++i) {
    std::string s = argv[i];
    auto next = [&]() { return argv[++i]; };
    if (s == "-e") P.e = atoi(next());
    else if (s == "-a") P.a = atoi(next());
    else if (s == "-t") P.threads = atoi(next());
    else if (s == "--ref") ref_path = next();
    else if (s == "--index") index_path = next();
    else if (s == "--read1") reads_path = next();
    else if (s == "-o") out_path = next();
  }
  if (!ref_path || !index_path || !reads_path || !out_path || P.e < 0 ||
      P.e > 7 || P.a < 0 || P.a > 2 || P.threads < 1) {
    fprintf(stderr, "bad args\n");
    return 1;
  }
  Sequences ref;
  load_fasta(ref_path, ref);
  Index index;
  load_index(index_path, index);
  FILE* out = fopen(out_path, "wb");
  if (!out) { fprintf(stderr, "cannot write %s\n", out_path); return 1; }
  {
    std::string hdr;
    for (size_t i = 0; i < ref.names.size(); ++i) {
      hdr += "@SQ\tSN:" + ref.names[i] +
             "\tLN:" + std::to_string(ref.seqs[i].size()) + "\n";
    }
    fwrite(hdr.data(), 1, hdr.size(), out);
  }
  FastqStream reads(reads_path);
  Stats total;
  const size_t kBatch = 10000;
  Sequences batch;
  std::string sam;
  while (reads.next_batch(kBatch, batch)) {
    size_t n = batch.seqs.size();
    int T = P.threads;
    std::vector<Stats> st(T);
    std::vector<std::string> outs(T);
    std::vector<std::thread> threads;
    size_t per = (n + T - 1) / T;
    for (int t = 0; t < T; ++t) {
      threads.emplace_back([&, t]() {
        Mapper mapper(ref, index, P);
        size_t lo = t * per, hi = std::min(n, lo + per);
        for (size_t i = lo; i < hi; ++i)
          mapper.map_read(batch.names[i], batch.seqs[i], batch.quals[i],
                          st[t], outs[t]);
      });
    }
    for (auto& th : threads) th.join();
    for (int t = 0; t < T; ++t) {
      total += st[t];
      fwrite(outs[t].data(), 1, outs[t].size(), out);
    }
    if (batch.seqs.size() < kBatch) break;
  }
  fclose(out);
  fprintf(stderr, "The number of read: %" PRIu64 "\n", total.reads);
  fprintf(stderr, "The number of mapped read: %" PRIu64 "\n", total.mapped);
  fprintf(stderr,
          "The number of candidate before additional q-gram filter: %" PRIu64
          "\n",
          total.cand_pre);
  fprintf(stderr, "The number of candidate: %" PRIu64 "\n", total.cand);
  fprintf(stderr, "The number of mapping: %" PRIu64 "\n", total.mappings);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "Usage: fem_baseline <index|map> ...\n");
    return 1;
  }
  if (!strcmp(argv[1], "index")) return index_main(argc - 1, argv + 1);
  if (!strcmp(argv[1], "map")) return map_main(argc - 1, argv + 1);
  fprintf(stderr, "unknown command %s\n", argv[1]);
  return 1;
}
