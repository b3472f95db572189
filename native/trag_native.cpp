// trag_native — native host-side runtime for trueno-rag-tpu.
//
// The device (TPU) owns all scoring math; this library owns the hot
// host-side string path: BM25 tokenization and inverted-index
// construction for bulk index builds. Semantics match
// trueno_rag_tpu/text.py exactly: split on non-[0-9A-Za-z] bytes,
// lowercase, drop stopwords, drop tokens shorter than min_len. (The
// Python tokenizer's regex uses ASCII classes, so UTF-8 multibyte
// sequences are separators there too — byte-level scanning here is
// equivalent.)
//
// Hot-path design: every token costs ONE string hash — the vocabulary
// map interns terms to int ids (stopwords intern to -1), per-document
// term frequencies accumulate by sorting the small id vector, and
// postings are int-keyed vectors per term. Export emits the CSR
// snapshot (term-major rows/tfs + indptr + vocabulary + per-row doc
// lengths) in BM25Index's device-layout format.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libtrag_native.so trag_native.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Builder {
  int min_len = 2;
  std::unordered_set<std::string> stopwords;
  // term -> interned id; stopwords and short tokens intern to -1
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::string> terms;                       // id -> term
  std::vector<std::vector<std::pair<int32_t, int32_t>>> postings;  // id -> (row, tf)
  std::unordered_map<int32_t, int32_t> doc_len;
  int64_t total_len = 0;
  int64_t total_postings = 0;

  // reusable per-doc scratch
  std::vector<int32_t> tid_scratch;
  std::string tok_scratch;

  // export staging
  std::vector<int32_t> export_order;  // sorted term ids
  int64_t vocab_bytes = 0;
  bool prepared = false;

  int32_t intern(const std::string &tok) {
    auto it = vocab.find(tok);
    if (it != vocab.end()) return it->second;
    int32_t id = -1;
    if (static_cast<int>(tok.size()) >= min_len && !stopwords.count(tok)) {
      id = static_cast<int32_t>(terms.size());
      terms.push_back(tok);
      postings.emplace_back();
    }
    vocab.emplace(tok, id);
    return id;
  }

  void prepare_export() {
    if (prepared) return;
    export_order.resize(terms.size());
    for (size_t i = 0; i < terms.size(); ++i) export_order[i] = static_cast<int32_t>(i);
    std::sort(export_order.begin(), export_order.end(),
              [&](int32_t a, int32_t b) { return terms[a] < terms[b]; });
    vocab_bytes = 0;
    total_postings = 0;
    int64_t live_terms = 0;
    for (auto id : export_order) {
      if (postings[id].empty()) continue;  // term fully removed
      vocab_bytes += static_cast<int64_t>(terms[id].size());
      total_postings += static_cast<int64_t>(postings[id].size());
      ++live_terms;
    }
    // compact export_order to live terms only
    std::vector<int32_t> live;
    live.reserve(live_terms);
    for (auto id : export_order)
      if (!postings[id].empty()) live.push_back(id);
    export_order.swap(live);
    prepared = true;
  }
};

inline bool is_alnum_ascii(unsigned char c) {
  return (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z');
}

// Tokenize into interned ids; returns count of kept tokens.
int32_t tokenize_into(Builder *b, const char *text, int64_t len, std::vector<int32_t> *out) {
  std::string &tok = b->tok_scratch;
  tok.clear();
  int32_t count = 0;
  const char *p = text;
  const char *end = text + len;
  while (p <= end) {
    unsigned char c = (p < end) ? static_cast<unsigned char>(*p) : 0;
    if (p < end && is_alnum_ascii(c)) {
      tok.push_back(static_cast<char>((c >= 'A' && c <= 'Z') ? c + 32 : c));
    } else {
      if (!tok.empty()) {
        int32_t id = b->intern(tok);
        if (id >= 0) {
          ++count;
          if (out) out->push_back(id);
        }
        tok.clear();
      }
      if (p >= end) break;
    }
    ++p;
  }
  return count;
}

}  // namespace

extern "C" {

void *trag_bm25_create(const char *stopwords_blob, int64_t blob_len, int min_len) {
  auto *b = new Builder();
  b->min_len = min_len;
  const char *p = stopwords_blob;
  const char *end = stopwords_blob + blob_len;
  while (p < end) {
    const char *nl = static_cast<const char *>(memchr(p, '\n', end - p));
    size_t n = nl ? static_cast<size_t>(nl - p) : static_cast<size_t>(end - p);
    if (n > 0) b->stopwords.emplace(p, n);
    p += n + 1;
  }
  return b;
}

void trag_bm25_destroy(void *h) { delete static_cast<Builder *>(h); }

int32_t trag_bm25_add_doc(void *h, const char *text, int64_t len, int32_t row) {
  auto *b = static_cast<Builder *>(h);
  b->prepared = false;
  auto &tids = b->tid_scratch;
  tids.clear();
  int32_t count = tokenize_into(b, text, len, &tids);
  std::sort(tids.begin(), tids.end());
  for (size_t i = 0; i < tids.size();) {
    size_t j = i + 1;
    while (j < tids.size() && tids[j] == tids[i]) ++j;
    b->postings[tids[i]].emplace_back(row, static_cast<int32_t>(j - i));
    i = j;
  }
  b->doc_len[row] += count;
  b->total_len += count;
  return count;
}

void trag_bm25_add_batch(void *h, const char *buf, const int64_t *offsets,
                         const int32_t *rows_in, int32_t n_docs,
                         int32_t *counts_out) {
  for (int32_t i = 0; i < n_docs; ++i) {
    counts_out[i] = trag_bm25_add_doc(h, buf + offsets[i],
                                      offsets[i + 1] - offsets[i], rows_in[i]);
  }
}

int64_t trag_bm25_total_postings(void *h) {
  auto *b = static_cast<Builder *>(h);
  b->prepare_export();
  return b->total_postings;
}

int64_t trag_bm25_vocab_size(void *h) {
  auto *b = static_cast<Builder *>(h);
  b->prepare_export();
  return static_cast<int64_t>(b->export_order.size());
}

int64_t trag_bm25_vocab_bytes(void *h) {
  auto *b = static_cast<Builder *>(h);
  b->prepare_export();
  return b->vocab_bytes;
}

int64_t trag_bm25_num_docs(void *h) {
  return static_cast<int64_t>(static_cast<Builder *>(h)->doc_len.size());
}

int64_t trag_bm25_total_len(void *h) {
  return static_cast<Builder *>(h)->total_len;
}

// Export the CSR snapshot. Buffer sizes come from the query calls above.
// Postings per term are emitted row-ascending; a row that was added
// twice for the same term (re-add without remove) keeps both entries'
// sum — BM25Index forbids that path by materializing first.
void trag_bm25_export(void *h, int32_t *rows, float *tfs, int64_t *indptr,
                      char *vocab_buf, int64_t *vocab_offsets,
                      int32_t *dl_rows, int32_t *dl_vals) {
  auto *b = static_cast<Builder *>(h);
  b->prepare_export();
  int64_t pos = 0;
  int64_t vpos = 0;
  int64_t ti = 0;
  for (auto id : b->export_order) {
    indptr[ti] = pos;
    vocab_offsets[ti] = vpos;
    const std::string &t = b->terms[id];
    memcpy(vocab_buf + vpos, t.data(), t.size());
    vpos += static_cast<int64_t>(t.size());
    auto plist = b->postings[id];  // copy; keep builder intact
    std::sort(plist.begin(), plist.end());
    for (auto &rp : plist) {
      rows[pos] = rp.first;
      tfs[pos] = static_cast<float>(rp.second);
      ++pos;
    }
    ++ti;
  }
  indptr[ti] = pos;
  vocab_offsets[ti] = vpos;
  std::map<int32_t, int32_t> sorted_dl(b->doc_len.begin(), b->doc_len.end());
  int64_t di = 0;
  for (auto &kv : sorted_dl) {
    dl_rows[di] = kv.first;
    dl_vals[di] = kv.second;
    ++di;
  }
}

int32_t trag_tokenize_count(void *h, const char *text, int64_t len) {
  auto *b = static_cast<Builder *>(h);
  // NOTE: interns terms as a side effect (cheap, keeps one code path)
  return tokenize_into(b, text, len, nullptr);
}

}  // extern "C"
