// Reference-equivalent native baseline.
//
// The reference is pure Rust and this image has no Rust toolchain, so a
// measured head-to-head runs THIS faithful C++ re-implementation of the
// reference's algorithms instead (same data structures and loop
// structure, -O2, single thread, no fast-math — the same compiler class
// LLVM gives rustc):
//
//   - BM25Index: hash map term -> Vec<(doc, tf)>; tokenizer = split on
//     non-alphanumeric, lowercase, drop stopwords, drop len<2
//     (index.rs:111-124); add() recomputes avg_doc_length EVERY insert
//     (index.rs:157-164 — the reference's published O(N^2) build);
//     search() = candidate union of posting lists, then for each
//     candidate, for each query term, a LINEAR SCAN of that term's
//     posting list (term_frequency, index.rs:127-133), score>0 filter,
//     sort desc, truncate k (index.rs:212-243).
//   - VectorStore: hash map id -> vector<f32>; per-query scalar cosine
//     against every stored vector, sort desc, truncate (index.rs:386-412).
//   - Hybrid query: dense top-50 + sparse top-50 + RRF k=60 fuse
//     (fusion.rs:65-84) + top-10, per retrieve.rs:175-220.
//
// Workloads:
//   1. the reference's own criterion shapes (benches/retrieval.rs:18-133)
//   2. the repo bench.py hybrid shape: 100k chunks, 384-d, synthetic
//      Zipf postings, 6 query terms — the number bench.py's
//      vs_baseline divides by.
//
// Build+run: make ref-baseline

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <random>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

using Clock = std::chrono::steady_clock;

static const char* STOPWORDS[] = {
    "a","an","and","are","as","at","be","by","for","from","has","he","in",
    "is","it","its","of","on","that","the","to","was","were","will","with",
    "this","but","they","have","had","what","when","where","who","which",
    "why","how","all","would","there","their","we","him","been","if","more",
    "can","her","like","time","no","just","them","these","so","some","into",
    "than","then","now","only","over","also","after","our","well","even",
    "because","any","those","very","her","his","she","you","your","i","me",
    "my","do","does","did","not","or","such","both","each","few","most",
    "other","same","own","too","s","t","don","should",
};

struct Tokenizer {
  std::unordered_set<std::string> stop;
  Tokenizer() {
    for (auto* w : STOPWORDS) stop.insert(w);
  }
  std::vector<std::string> run(const std::string& text) const {
    std::vector<std::string> out;
    std::string cur;
    for (char c : text) {
      if (std::isalnum(static_cast<unsigned char>(c))) {
        cur.push_back(std::tolower(static_cast<unsigned char>(c)));
      } else if (!cur.empty()) {
        if (cur.size() >= 2 && !stop.count(cur)) out.push_back(cur);
        cur.clear();
      }
    }
    if (cur.size() >= 2 && !stop.count(cur)) out.push_back(cur);
    return out;
  }
};

struct BM25Index {
  // term -> posting list of (doc, tf) — the reference's HashMap layout
  std::unordered_map<std::string, std::vector<std::pair<int, uint32_t>>> postings;
  std::unordered_map<std::string, uint32_t> doc_freqs;
  std::unordered_map<int, uint32_t> doc_lengths;
  double avg_doc_length = 0.0;
  int doc_count = 0;
  double k1 = 1.2, b = 0.75;
  // the reference recomputes the mean over ALL docs on every add
  // (index.rs:157-164) — O(N) per insert. Faithful by default; the
  // 100k workload flips this off after sampling the build rate so the
  // query benchmark still gets a real index in reasonable time.
  bool faithful_avg_recompute = true;
  Tokenizer tok;

  void add(int doc, const std::string& text) {
    auto terms = tok.run(text);
    std::unordered_map<std::string, uint32_t> tf;
    for (auto& t : terms) tf[t]++;
    for (auto& [t, f] : tf) {
      postings[t].push_back({doc, f});
      doc_freqs[t]++;
    }
    doc_lengths[doc] = (uint32_t)terms.size();
    doc_count++;
    if (faithful_avg_recompute) {
      double total = 0.0;
      for (auto& [d, len] : doc_lengths) total += len;
      avg_doc_length = doc_lengths.empty() ? 0.0 : total / doc_lengths.size();
    }
  }

  // linear scan of the term's posting list (index.rs:127-133)
  uint32_t term_frequency(const std::string& term, int doc) const {
    auto it = postings.find(term);
    if (it == postings.end()) return 0;
    for (auto& [d, f] : it->second)
      if (d == doc) return f;
    return 0;
  }

  double idf(const std::string& term) const {
    auto it = doc_freqs.find(term);
    double df = it == doc_freqs.end() ? 0.0 : it->second;
    return std::log((doc_count - df + 0.5) / (df + 0.5) + 1.0);
  }

  std::vector<std::pair<int, float>> search(const std::string& query, int k) const {
    auto terms = tok.run(query);
    std::unordered_set<int> candidates;
    for (auto& t : terms) {
      auto it = postings.find(t);
      if (it == postings.end()) continue;
      for (auto& [d, f] : it->second) candidates.insert(d);
    }
    std::vector<std::pair<int, float>> scored;
    for (int doc : candidates) {
      double score = 0.0;
      double dl = doc_lengths.at(doc);
      for (auto& t : terms) {
        uint32_t f = term_frequency(t, doc);
        if (!f) continue;
        double denom = f + k1 * (1.0 - b + b * dl / std::max(avg_doc_length, 1e-9));
        score += idf(t) * f * (k1 + 1.0) / std::max(denom, 1e-9);
      }
      if (score > 0.0) scored.push_back({doc, (float)score});
    }
    std::sort(scored.begin(), scored.end(),
              [](auto& a, auto& b) { return a.second > b.second; });
    if ((int)scored.size() > k) scored.resize(k);
    return scored;
  }
};

struct VectorStore {
  std::unordered_map<int, std::vector<float>> vectors;
  void insert(int id, std::vector<float> v) { vectors[id] = std::move(v); }
  // scalar cosine like embed.rs:310-342 / index.rs:439-462
  static float cosine(const std::vector<float>& a, const std::vector<float>& b) {
    if (a.size() != b.size()) return 0.0f;
    float dot = 0, na = 0, nb = 0;
    for (size_t i = 0; i < a.size(); i++) {
      dot += a[i] * b[i];
      na += a[i] * a[i];
      nb += b[i] * b[i];
    }
    if (na == 0.0f || nb == 0.0f) return 0.0f;
    return dot / (std::sqrt(na) * std::sqrt(nb));
  }
  std::vector<std::pair<int, float>> search(const std::vector<float>& q, int k) const {
    std::vector<std::pair<int, float>> scored;
    scored.reserve(vectors.size());
    for (auto& [id, v] : vectors) scored.push_back({id, cosine(q, v)});
    std::sort(scored.begin(), scored.end(),
              [](auto& a, auto& b) { return a.second > b.second; });
    if ((int)scored.size() > k) scored.resize(k);
    return scored;
  }
};

static double now_s() {
  return std::chrono::duration<double>(Clock::now().time_since_epoch()).count();
}

template <class F>
double time_it(F&& f, int iters) {
  double t0 = now_s();
  for (int i = 0; i < iters; i++) f();
  return (now_s() - t0) / iters;
}

int main() {
  // ---- 1. reference criterion shapes (benches/retrieval.rs) ----------
  {
    std::vector<std::string> chunks;
    for (int i = 0; i < 1000; i++)
      chunks.push_back("Document " + std::to_string(i) +
                       " contains information about machine learning and artificial intelligence");
    double dt = time_it(
        [&] {
          BM25Index idx;
          for (int i = 0; i < 1000; i++) idx.add(i, chunks[i]);
        },
        5);
    printf("{\"metric\": \"ref_equiv_bm25_index_1000_chunks_ms\", \"value\": %.3f}\n", dt * 1e3);
    printf("{\"metric\": \"ref_equiv_bm25_build_chunks_per_s\", \"value\": %.1f}\n", 1000.0 / dt);
  }
  {
    BM25Index idx;
    for (int i = 0; i < 1000; i++)
      idx.add(i, "Document " + std::to_string(i) + " about topic " +
                     std::to_string(i % 100) + " with keywords");
    double dt10 = time_it([&] { idx.search("topic keywords", 10); }, 50);
    printf("{\"metric\": \"ref_equiv_bm25_search_top10_ms\", \"value\": %.3f}\n", dt10 * 1e3);
  }
  {
    VectorStore store;
    for (int i = 0; i < 1000; i++) {
      std::vector<float> e(128, 0.0f);
      e[i % 128] = 1.0f;
      store.insert(i, std::move(e));
    }
    std::vector<float> q(128, 1.0f);
    double dt = time_it([&] { store.search(q, 10); }, 200);
    printf("{\"metric\": \"ref_equiv_vector_search_1000x128_top10_ms\", \"value\": %.4f}\n", dt * 1e3);
  }

  // ---- 2. the bench.py hybrid shape: 100k chunks, 384-d --------------
  {
    const int N = 100000, D = 384, VOCAB = 50000, TERMS_PER_DOC = 60, QTERMS = 6;
    std::mt19937 rng(0);
    std::normal_distribution<float> nd(0.f, 1.f);
    std::uniform_int_distribution<int> ud(0, VOCAB - 1);
    // Zipf-ish term ids like bench.py's synthesizer
    std::vector<double> cdf(VOCAB);
    double acc = 0;
    for (int t = 0; t < VOCAB; t++) {
      acc += 1.0 / std::pow(t + 1, 0.9);
      cdf[t] = acc;
    }
    for (auto& c : cdf) c /= acc;
    std::uniform_real_distribution<double> ur(0.0, 1.0);
    auto zipf = [&] {
      return (int)(std::lower_bound(cdf.begin(), cdf.end(), ur(rng)) - cdf.begin());
    };

    VectorStore store;
    BM25Index bm25;
    double t0 = now_s();
    for (int i = 0; i < N; i++) {
      std::vector<float> v(D);
      float n2 = 0;
      for (auto& x : v) {
        x = nd(rng);
        n2 += x * x;
      }
      float inv = 1.0f / std::sqrt(n2);
      for (auto& x : v) x *= inv;
      store.insert(i, std::move(v));
      std::string text;
      for (int t = 0; t < TERMS_PER_DOC; t++)
        text += "w" + std::to_string(zipf()) + " ";
      bm25.add(i, text);
      if (i == 2000) {
        // the O(N^2) avgdl recompute makes the full faithful build take
        // far too long at 100k — report the measured per-chunk rate at
        // the 2k prefix, then switch the recompute off so the QUERY
        // benchmark (the headline) runs on a real 100k index. The
        // switch only HELPS the reference's numbers.
        double per = (now_s() - t0) / 2001.0;
        printf("{\"metric\": \"ref_equiv_build_ms_per_chunk_at_2k\", \"value\": %.4f}\n", per * 1e3);
        bm25.faithful_avg_recompute = false;
      }
    }
    // rebuild mean once, exactly
    {
      double total = 0;
      for (auto& [d, len] : bm25.doc_lengths) total += len;
      bm25.avg_doc_length = total / bm25.doc_lengths.size();
    }

    // queries: 6 random vocab terms + a unit dense vector
    const int NQ = 40;
    std::vector<std::string> qtexts;
    std::vector<std::vector<float>> qvecs;
    for (int i = 0; i < NQ; i++) {
      std::string qt;
      for (int t = 0; t < QTERMS; t++) qt += "w" + std::to_string(ud(rng)) + " ";
      qtexts.push_back(qt);
      std::vector<float> v(D);
      for (auto& x : v) x = nd(rng);
      qvecs.push_back(v);
    }
    int qi = 0;
    double dt = time_it(
        [&] {
          int i = qi++ % NQ;
          auto dres = store.search(qvecs[i], 50);
          auto sres = bm25.search(qtexts[i], 50);
          // RRF k=60 (fusion.rs:65-84)
          std::unordered_map<int, float> fused;
          for (size_t r = 0; r < dres.size(); r++)
            fused[dres[r].first] += 1.0f / (60.0f + r + 1.0f);
          for (size_t r = 0; r < sres.size(); r++)
            fused[sres[r].first] += 1.0f / (60.0f + r + 1.0f);
          std::vector<std::pair<int, float>> out(fused.begin(), fused.end());
          std::sort(out.begin(), out.end(),
                    [](auto& a, auto& b) { return a.second > b.second; });
          if (out.size() > 10) out.resize(10);
        },
        NQ);
    printf("{\"metric\": \"ref_equiv_hybrid_query_ms_100k\", \"value\": %.3f}\n", dt * 1e3);
    printf("{\"metric\": \"ref_equiv_hybrid_qps_100k\", \"value\": %.1f}\n", 1.0 / dt);
  }
  return 0;
}
