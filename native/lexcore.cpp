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
#include <cstring>
#include <numeric>
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

const char* le_version() { return "lexcore 0.2.0"; }

}  // extern "C"
