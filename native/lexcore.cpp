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

const char* le_version() { return "lexcore 0.1.0"; }

}  // extern "C"
