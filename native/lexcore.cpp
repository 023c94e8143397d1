// lexcore: native host-side runtime for the lexical path.
//
// The TPU owns the dense retrieval matmul (ops/dense.py); the lexical side
// (BM25 postings scoring, name tokenization, candidate top-k) runs on the
// host CPU per query. The reference delegates this to vendored native code
// (scipy CSC kernels under bm25s); this framework ships its own:
//
//   le_bm25_score   CSR postings accumulation with the exact bm25+ math of
//                   index/bm25.py (idf precomputed by the caller)
//   le_topk         partial-selection top-k over a score vector
//                   (descending, ties by ascending index — matches
//                   Bm25Index.retrieve's lexsort semantics)
//   le_tokenize_spaced
//                   batch tokenizer: dots/underscores/camelCase splits +
//                   ASCII lowercasing (tokenization.py parity; non-ASCII
//                   callers stay on the Python path)
//
// Exposed as a plain C ABI consumed via ctypes (native/__init__ loader).

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <array>
#include <cstring>
#include <numeric>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// Accumulate BM25 scores for one query over token-major CSR postings.
//
//   indptr       [n_vocab + 1]  postings offsets per token id
//   doc_indices  [nnz]          document row per posting
//   tf_values    [nnz]          term frequency per posting (float32)
//   doc_lengths  [n_docs]       document lengths (float64)
//   query_tokens [n_query]      token ids (int64; out-of-vocab = -1)
//   scores       [n_docs]       output, caller-zeroed (float64)
//
// method: 0 = bm25+ (delta tail added for every doc), 1 = lucene,
//         2 = robertson.
void le_bm25_score(const int64_t* indptr, const int32_t* doc_indices,
                   const float* tf_values, const double* doc_lengths,
                   int64_t n_docs, double avgdl, const double* idf,
                   const int64_t* query_tokens, int64_t n_query, double k1,
                   double b, double delta, int32_t method, double* scores) {
  double constant = 0.0;
  const double k1b = k1 * (1.0 - b);
  const double k1b_over_avgdl = avgdl > 0.0 ? k1 * b / avgdl : 0.0;
  for (int64_t qi = 0; qi < n_query; ++qi) {
    const int64_t tid = query_tokens[qi];
    if (tid < 0) continue;
    const double idf_t = idf[tid];
    if (method == 0) constant += idf_t * delta;
    const int64_t lo = indptr[tid];
    const int64_t hi = indptr[tid + 1];
    for (int64_t p = lo; p < hi; ++p) {
      const int32_t doc = doc_indices[p];
      const double tf = static_cast<double>(tf_values[p]);
      const double denom = k1b + k1b_over_avgdl * doc_lengths[doc] + tf;
      const double tfc =
          (method == 2) ? tf / denom : (k1 + 1.0) * tf / denom;
      scores[doc] += idf_t * tfc;
    }
  }
  if (constant != 0.0) {
    for (int64_t d = 0; d < n_docs; ++d) scores[d] += constant;
  }
}

// Top-k selection: descending score, ties broken by ascending index.
// Writes k indices to out_indices and their scores to out_scores.
void le_topk(const double* scores, int64_t n, int64_t k, int64_t* out_indices,
             double* out_scores) {
  if (k > n) k = n;
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  auto better = [scores](int64_t a, int64_t b) {
    if (scores[a] != scores[b]) return scores[a] > scores[b];
    return a < b;
  };
  // Measured A/B (round 3): partial_sort wins. A value-based nth_element +
  // collection scan ran 1.53 ms vs 1.10 ms here on realistic BM25 score
  // vectors (n=300k, k=1000, most entries at the delta constant) and
  // 4.29 ms vs 1.70 ms on gaussian scores — the heap rarely admits new
  // elements after warm-up, while a partition always pays the full pass.
  std::partial_sort(order.begin(), order.begin() + k, order.end(), better);
  for (int64_t i = 0; i < k; ++i) {
    out_indices[i] = order[i];
    out_scores[i] = scores[order[i]];
  }
}

// Spaced tokenization of one ASCII string: '.'/'_' -> separators, a split
// before each upper following a lower, lowercase output, word chars only.
// Token boundaries are written as offsets into `out` (NUL-joined tokens).
// Returns the number of tokens, or -1 if `out` is too small.
int64_t le_tokenize_spaced(const char* text, int64_t len, char* out,
                           int64_t out_capacity, int64_t* token_starts,
                           int64_t max_tokens) {
  int64_t n_tokens = 0;
  int64_t w = 0;
  bool in_token = false;
  unsigned char prev = 0;
  for (int64_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    bool boundary = false;
    if (in_token && std::islower(prev) && std::isupper(c)) {
      boundary = true;  // camelCase split
    }
    if (std::isalnum(c)) {
      if (!in_token || boundary) {
        if (in_token) {
          if (w >= out_capacity) return -1;
          out[w++] = '\0';
        }
        if (n_tokens >= max_tokens) return -1;
        token_starts[n_tokens++] = w;
        in_token = true;
      }
      if (w >= out_capacity) return -1;
      out[w++] = static_cast<char>(std::tolower(c));
    } else {
      if (in_token) {
        if (w >= out_capacity) return -1;
        out[w++] = '\0';
        in_token = false;
      }
    }
    prev = c;
  }
  if (in_token) {
    if (w >= out_capacity) return -1;
    out[w++] = '\0';
  }
  return n_tokens;
}

// Reciprocal-rank fusion of two candidate lists for one query
// (engine semantics, reference search/engine.py:263-300):
//
//   rank each signal's candidates by score descending (ties keep input
//   order — the engine feeds dict-insertion order); absent signal =>
//   rank = len(signal)+1; fused = 1/bm25_rank + 1/sem_rank; output sorted
//   by fused score descending, ties keeping candidate order (bm25 list
//   order, then unseen semantic candidates).
//
// out_ids/out_scores must hold nb+ns entries. Returns the fused count
// (deduplicated union size).
int64_t le_rrf_fuse(const int64_t* bm25_ids, const double* bm25_scores,
                    int64_t nb, const int64_t* sem_ids,
                    const double* sem_scores, int64_t ns, int64_t* out_ids,
                    double* out_scores) {
  auto ranks_of = [](const double* scores, int64_t n) {
    std::vector<int64_t> order(n);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [scores](int64_t a, int64_t b) {
                       return scores[a] > scores[b];
                     });
    std::vector<int64_t> rank(n);
    for (int64_t r = 0; r < n; ++r) rank[order[r]] = r + 1;
    return rank;
  };
  const std::vector<int64_t> bm25_rank = ranks_of(bm25_scores, nb);
  const std::vector<int64_t> sem_rank = ranks_of(sem_scores, ns);

  // Candidate union in first-seen order: bm25 list, then new semantic ids.
  // Arithmetic matches the Python engine exactly: one sum of two
  // reciprocals per candidate (no incremental updates that would drift a
  // ulp and reorder ties differently from the fallback path).
  std::vector<int64_t> ids;
  std::vector<double> fused;
  ids.reserve(nb + ns);
  fused.reserve(nb + ns);
  std::vector<std::pair<int64_t, int64_t>> sem_pos(ns);  // (id, sem index)
  for (int64_t i = 0; i < ns; ++i) sem_pos[i] = {sem_ids[i], i};
  std::sort(sem_pos.begin(), sem_pos.end());
  std::vector<char> sem_used(ns, 0);
  const double default_bm25 = 1.0 / static_cast<double>(nb + 1);
  const double default_sem = 1.0 / static_cast<double>(ns + 1);
  for (int64_t i = 0; i < nb; ++i) {
    const int64_t id = bm25_ids[i];
    double sem_part = default_sem;
    auto it = std::lower_bound(sem_pos.begin(), sem_pos.end(),
                               std::make_pair(id, static_cast<int64_t>(-1)));
    if (it != sem_pos.end() && it->first == id) {
      sem_part = 1.0 / static_cast<double>(sem_rank[it->second]);
      sem_used[it->second] = 1;
    }
    ids.push_back(id);
    fused.push_back(1.0 / static_cast<double>(bm25_rank[i]) + sem_part);
  }
  for (int64_t i = 0; i < ns; ++i) {
    if (sem_used[i]) continue;
    ids.push_back(sem_ids[i]);
    fused.push_back(default_bm25 + 1.0 / static_cast<double>(sem_rank[i]));
  }
  const int64_t total = static_cast<int64_t>(ids.size());
  std::vector<int64_t> order(total);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&fused](int64_t a, int64_t b) {
    return fused[a] > fused[b];
  });
  for (int64_t i = 0; i < total; ++i) {
    out_ids[i] = ids[order[i]];
    out_scores[i] = fused[order[i]];
  }
  return total;
}

// Dependency boost over the RRF top-n (engine semantics, reference
// engine.py:302-358): count, for each candidate, how many of the top-n
// candidates list it as a dependency; dep_rank = (max_count - count) + 1
// for counted candidates else max_count+1 (or n+1 when nothing is
// counted); boosted = 1/rrf_rank + 1/dep_rank, output sorted descending
// (stable in rrf order).
//
//   top_ids      [n]      candidate declaration ids in RRF order
//   top_n                 the boost-window parameter (default dep_rank is
//                         top_n+1 even when fewer candidates exist —
//                         reference engine.py:352)
//   dep_indptr   [max_id+2] global CSR offsets indexed BY DECLARATION ID
//   dep_targets  [nnz]    dependency target declaration ids
//   max_id                largest indexable id (ids above are dep-free)
void le_dep_boost(const int64_t* top_ids, int64_t n, int64_t top_n,
                  const int64_t* dep_indptr, const int64_t* dep_targets,
                  int64_t max_id, int64_t* out_ids, double* out_scores) {
  std::vector<std::pair<int64_t, int64_t>> pos(n);  // (id, index)
  for (int64_t i = 0; i < n; ++i) pos[i] = {top_ids[i], i};
  std::sort(pos.begin(), pos.end());
  std::vector<int64_t> counts(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t id = top_ids[i];
    if (id < 0 || id > max_id) continue;
    for (int64_t p = dep_indptr[id]; p < dep_indptr[id + 1]; ++p) {
      const int64_t target = dep_targets[p];
      auto it = std::lower_bound(
          pos.begin(), pos.end(),
          std::make_pair(target, static_cast<int64_t>(-1)));
      if (it != pos.end() && it->first == target) counts[it->second] += 1;
    }
  }
  int64_t max_count = 0;
  for (int64_t i = 0; i < n; ++i) max_count = std::max(max_count, counts[i]);
  std::vector<double> boosted(n);
  for (int64_t i = 0; i < n; ++i) {
    double dep_rank;
    if (max_count > 0 && counts[i] > 0) {
      dep_rank = static_cast<double>(max_count - counts[i] + 1);
    } else {
      dep_rank =
          static_cast<double>(max_count > 0 ? max_count + 1 : top_n + 1);
    }
    boosted[i] = 1.0 / static_cast<double>(i + 1) + 1.0 / dep_rank;
  }
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&boosted](int64_t a, int64_t b) {
                     return boosted[a] > boosted[b];
                   });
  for (int64_t i = 0; i < n; ++i) {
    out_ids[i] = top_ids[order[i]];
    out_scores[i] = boosted[order[i]];
  }
}

}  // extern "C"

// ----------------------------------------------------------------------
// Fuzzy name scoring: difflib.SequenceMatcher(None, a, b).ratio() parity.
//
// Ratcliff-Obershelp over Unicode code points, including difflib's autojunk
// rule (elements of b occurring in more than 1% of b when len(b) >= 200 are
// excluded from matching-anchor candidates but can extend a match in the
// second extension pass). The engine's final fusion calls this for every
// (query, candidate-name) pair of a batch — thousands of pure-Python
// SequenceMatcher runs per 128-query step otherwise.
// ----------------------------------------------------------------------

namespace {

struct B2J {
    std::unordered_map<uint32_t, std::vector<int32_t>> map;
};

void build_b2j(const uint32_t* b, int64_t lb, B2J& out) {
    out.map.clear();
    for (int32_t j = 0; j < lb; ++j) out.map[b[j]].push_back(j);
    if (lb >= 200) {
        // Autojunk: popular elements (>1% of b) lose their anchor entries in
        // b2j, exactly like CPython's bpopular pruning. They are NOT junk for
        // the extension loops below — with isjunk=None, difflib's bjunk set
        // is empty, so extension runs over any equal code points.
        const int64_t threshold = lb / 100 + 1;
        for (auto it = out.map.begin(); it != out.map.end();) {
            if (static_cast<int64_t>(it->second.size()) > threshold) {
                it = out.map.erase(it);
            } else {
                ++it;
            }
        }
    }
}

struct Match {
    int32_t i, j, size;
};

// difflib.SequenceMatcher.find_longest_match, junk-free (None junk fn),
// autojunk-aware.
Match longest_match(const uint32_t* a, const uint32_t* b, const B2J& b2j,
                    int32_t alo, int32_t ahi, int32_t blo, int32_t bhi) {
    int32_t besti = alo, bestj = blo, bestsize = 0;
    std::unordered_map<int32_t, int32_t> j2len, newj2len;
    for (int32_t i = alo; i < ahi; ++i) {
        newj2len.clear();
        auto it = b2j.map.find(a[i]);
        if (it != b2j.map.end()) {
            for (int32_t j : it->second) {
                if (j < blo) continue;
                if (j >= bhi) break;
                int32_t k = 1;
                auto prev = j2len.find(j - 1);
                if (prev != j2len.end()) k = prev->second + 1;
                newj2len[j] = k;
                if (k > bestsize) {
                    besti = i - k + 1;
                    bestj = j - k + 1;
                    bestsize = k;
                }
            }
        }
        std::swap(j2len, newj2len);
    }
    // Extension: with isjunk=None difflib's bjunk is empty, so both of its
    // extension passes reduce to extending over ANY equal code points —
    // popular (autojunk) elements included; bpopular never gates extension
    // in CPython, it only pruned the anchor map above.
    while (besti > alo && bestj > blo && a[besti - 1] == b[bestj - 1]) {
        --besti;
        --bestj;
        ++bestsize;
    }
    while (besti + bestsize < ahi && bestj + bestsize < bhi &&
           a[besti + bestsize] == b[bestj + bestsize]) {
        ++bestsize;
    }
    return {besti, bestj, bestsize};
}

double ratio_one(const uint32_t* a, int64_t la, const uint32_t* b, int64_t lb) {
    if (la + lb == 0) return 1.0;  // difflib: 2*0/0 -> its _calculate_ratio
    B2J b2j;
    build_b2j(b, lb, b2j);
    int64_t matches = 0;
    std::vector<std::array<int32_t, 4>> queue{
        {0, static_cast<int32_t>(la), 0, static_cast<int32_t>(lb)}};
    while (!queue.empty()) {
        auto [alo, ahi, blo, bhi] = queue.back();
        queue.pop_back();
        Match m = longest_match(a, b, b2j, alo, ahi, blo, bhi);
        if (m.size) {
            matches += m.size;
            if (alo < m.i && blo < m.j) queue.push_back({alo, m.i, blo, m.j});
            if (m.i + m.size < ahi && m.j + m.size < bhi)
                queue.push_back({m.i + m.size, ahi, m.j + m.size, bhi});
        }
    }
    return 2.0 * static_cast<double>(matches) / static_cast<double>(la + lb);
}

}  // namespace

extern "C" {

// Batch fuzzy ratios. Sequences are UTF-32 code points, concatenated:
//   a_data/b_data   code-point buffers
//   a_offsets       [n + 1] offsets into a_data (pair p = [off[p], off[p+1]))
//   b_offsets       [n + 1] offsets into b_data
//   out             [n] ratios
// Pairs are split across up to 8 threads (pure C++, no GIL).
void le_fuzzy_batch(const uint32_t* a_data, const int64_t* a_offsets,
                    const uint32_t* b_data, const int64_t* b_offsets,
                    int64_t n, double* out) {
    const int64_t hw = static_cast<int64_t>(std::thread::hardware_concurrency());
    // Thread spawns cost ~50us each; a 50-pair call (one query's rerank
    // candidates) is faster inline than fanned out.
    const int64_t n_threads =
        n < 512 ? 1
                : std::max<int64_t>(1, std::min<int64_t>({8, hw, n / 64}));
    auto worker = [&](int64_t t) {
        for (int64_t p = t; p < n; p += n_threads) {
            out[p] = ratio_one(a_data + a_offsets[p], a_offsets[p + 1] - a_offsets[p],
                               b_data + b_offsets[p], b_offsets[p + 1] - b_offsets[p]);
        }
    };
    if (n_threads == 1) {
        worker(0);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int64_t t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
}

const char* le_version() { return "lexcore 0.3.0"; }

}  // extern "C"
