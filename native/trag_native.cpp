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
  std::vector<std::string> terms;                       // id -> term
  std::vector<std::vector<std::pair<int32_t, int32_t>>> postings;  // id -> (row, tf)
  std::unordered_map<int32_t, int32_t> doc_len;
  int64_t total_len = 0;
  int64_t total_postings = 0;
  // bulk ingest adds docs in ascending row order, so every term's
  // posting list is ALREADY row-ascending and export can stream it
  // without the per-term copy+sort (6M pairs at 100k chunks)
  int32_t last_row = -1;
  bool rows_ascending = true;

  // Open-addressing interner (token -> id; stopwords intern to -1).
  // unordered_map<string,...> re-hashed every token with std::hash — a
  // second full pass over the bytes; here tokenization hands us the
  // FNV-1a hash it computed while scanning, and lookups are one probe
  // chain over flat arrays (measured 1.5x on the 50k-chunk bulk build).
  // Keys live in `arena` for the equality check on (rare) collisions.
  std::vector<uint64_t> slot_hash;  // 0 = empty slot
  std::vector<int32_t> slot_id;
  std::vector<uint32_t> slot_off;   // key bytes: arena[off, off+len)
  std::vector<uint32_t> slot_len;
  std::string arena;
  size_t slot_mask = 0;
  size_t n_interned = 0;

  // reusable per-doc scratch
  std::vector<int32_t> tid_scratch;
  std::vector<char> low_scratch;  // lowered token bytes (raw scratch)

  // export staging
  std::vector<int32_t> export_order;  // sorted term ids
  int64_t vocab_bytes = 0;
  bool prepared = false;

  Builder() { table_init(1 << 15); }

  void table_init(size_t cap) {
    slot_hash.assign(cap, 0);
    slot_id.assign(cap, -1);
    slot_off.assign(cap, 0);
    slot_len.assign(cap, 0);
    slot_mask = cap - 1;
  }

  void table_grow() {
    std::vector<uint64_t> oh(std::move(slot_hash));
    std::vector<int32_t> oi(std::move(slot_id));
    std::vector<uint32_t> oo(std::move(slot_off));
    std::vector<uint32_t> ol(std::move(slot_len));
    table_init((slot_mask + 1) * 2);
    for (size_t s = 0; s < oh.size(); ++s) {
      if (oh[s] == 0) continue;
      size_t i = oh[s] & slot_mask;
      while (slot_hash[i] != 0) i = (i + 1) & slot_mask;
      slot_hash[i] = oh[s];
      slot_id[i] = oi[s];
      slot_off[i] = oo[s];
      slot_len[i] = ol[s];
    }
  }

  int32_t intern(const char *s, size_t n, uint64_t h) {
    if (h == 0) h = 0x9e3779b97f4a7c15ULL;  // reserve 0 for empty slots
    size_t i = h & slot_mask;
    while (slot_hash[i] != 0) {
      if (slot_hash[i] == h && slot_len[i] == n &&
          memcmp(arena.data() + slot_off[i], s, n) == 0)
        return slot_id[i];
      i = (i + 1) & slot_mask;
    }
    int32_t id = -1;
    std::string tok(s, n);
    if (!stopwords.count(tok)) {
      id = static_cast<int32_t>(terms.size());
      terms.push_back(std::move(tok));
      postings.emplace_back();
    }
    slot_hash[i] = h;
    slot_id[i] = id;
    slot_off[i] = static_cast<uint32_t>(arena.size());
    slot_len[i] = static_cast<uint32_t>(n);
    arena.append(s, n);
    if (++n_interned * 4 > (slot_mask + 1) * 3) table_grow();
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

// byte -> lowered byte for token characters, 0 for separators
// (UTF-8 continuation bytes have the high bit set -> 0, matching the
// Python tokenizer's ASCII character classes)
struct LowerTable {
  unsigned char t[256];
  LowerTable() {
    for (int c = 0; c < 256; ++c) {
      unsigned char u = static_cast<unsigned char>(c);
      if (is_alnum_ascii(u))
        t[c] = (u >= 'A' && u <= 'Z') ? u + 32 : u;
      else
        t[c] = 0;
    }
  }
};
const LowerTable kLower;

// Tokenize into interned ids; returns count of kept tokens. One pass:
// the byte table lowers/classifies (no branchy uppercase test), kept
// bytes append to a raw pre-sized scratch (no std::string bounds
// logic), and the FNV-1a hash accumulates during the scan so the
// interner never re-reads the token; tokens under min_len skip the
// table entirely (they can never be kept).
int32_t tokenize_into(Builder *b, const char *text, int64_t len, std::vector<int32_t> *out) {
  constexpr uint64_t kFnvBasis = 1469598103934665603ULL;
  constexpr uint64_t kFnvPrime = 1099511628211ULL;
  std::vector<char> &low = b->low_scratch;
  if (static_cast<int64_t>(low.size()) < len) low.resize(len);
  char *buf = low.data();
  int64_t ti = 0;  // current token = buf[0, ti)
  uint64_t h = kFnvBasis;
  int32_t count = 0;
  for (int64_t i = 0; i <= len; ++i) {
    unsigned char lc = (i < len) ? kLower.t[static_cast<unsigned char>(text[i])] : 0;
    if (lc) {
      buf[ti++] = static_cast<char>(lc);
      h = (h ^ lc) * kFnvPrime;
    } else if (ti) {
      if (ti >= b->min_len) {
        int32_t id = b->intern(buf, static_cast<size_t>(ti), h);
        if (id >= 0) {
          ++count;
          if (out) out->push_back(id);
        }
      }
      ti = 0;
      h = kFnvBasis;
    }
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
  if (row < b->last_row) b->rows_ascending = false;
  b->last_row = row;
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
    if (b->rows_ascending) {  // already row-ascending: stream in place
      for (const auto &rp : b->postings[id]) {
        rows[pos] = rp.first;
        tfs[pos] = static_cast<float>(rp.second);
        ++pos;
      }
    } else {
      auto plist = b->postings[id];  // copy; keep builder intact
      std::sort(plist.begin(), plist.end());
      for (auto &rp : plist) {
        rows[pos] = rp.first;
        tfs[pos] = static_cast<float>(rp.second);
        ++pos;
      }
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
