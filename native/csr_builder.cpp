// Native CSR term-index builder for the BM25 path.
//
// The hot host-side loop of corpus ingestion: tokenize every chunk
// (CJK char uni+bigrams + ASCII word runs — mirroring
// rag_challenge_2_tpu/utils/tokenize.py exactly), hash tokens with
// FNV-1a 64 (identical constants to the Python side), accumulate
// per-chunk term frequencies, and emit the term-major CSR arrays the
// device kernel consumes (index/schema.py SparseIndex).
//
// The Python fallback (index/build.py _build_sparse) is pure-dict Python
// and is the bottleneck at million-chunk scale; this builder replaces it
// when the shared library is present (utils/native.py loads it via ctypes).
//
// Input text must already be NFKC-normalized and lower-cased by the
// caller (Python's unicodedata does this at C speed); this keeps the two
// tokenizers byte-identical without an ICU dependency.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

constexpr uint64_t FNV_OFFSET = 0xcbf29ce484222325ULL;
constexpr uint64_t FNV_PRIME = 0x100000001b3ULL;

inline uint64_t fnv1a(const char* data, size_t len) {
  uint64_t h = FNV_OFFSET;
  for (size_t i = 0; i < len; ++i) {
    h ^= static_cast<unsigned char>(data[i]);
    h *= FNV_PRIME;
  }
  return h;
}

// UTF-8 decode one codepoint; returns bytes consumed.
inline int decode_utf8(const char* s, size_t len, uint32_t* cp) {
  unsigned char c = s[0];
  if (c < 0x80) { *cp = c; return 1; }
  if ((c >> 5) == 0x6 && len >= 2) {
    *cp = ((c & 0x1f) << 6) | (s[1] & 0x3f);
    return 2;
  }
  if ((c >> 4) == 0xe && len >= 3) {
    *cp = ((c & 0x0f) << 12) | ((s[1] & 0x3f) << 6) | (s[2] & 0x3f);
    return 3;
  }
  if ((c >> 3) == 0x1e && len >= 4) {
    *cp = ((c & 0x07) << 18) | ((s[1] & 0x3f) << 12) | ((s[2] & 0x3f) << 6) |
          (s[3] & 0x3f);
    return 4;
  }
  *cp = 0xfffd;
  return 1;
}

// Matches the _CJK ranges in utils/tokenize.py:
// 0x3400-0x4DBF, 0x4E00-0x9FFF, 0xF900-0xFAFF.
inline bool is_cjk(uint32_t cp) {
  return (cp >= 0x3400 && cp <= 0x4dbf) || (cp >= 0x4e00 && cp <= 0x9fff) ||
         (cp >= 0xf900 && cp <= 0xfaff);
}

// ASCII word chars per the Python regex [a-z0-9].
inline bool is_word(uint32_t cp) {
  return (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9');
}

// Tokenize one normalized UTF-8 string, invoking emit(ptr, len) per token
// in emission order (a CJK run's unigrams first, then its bigrams —
// matching utils/tokenize.py `tokenize`).
template <typename Emit>
void tokenize(const char* s, size_t len, Emit&& emit) {
  size_t i = 0;
  while (i < len) {
    uint32_t cp;
    int n = decode_utf8(s + i, len - i, &cp);
    if (is_cjk(cp)) {
      std::vector<std::pair<size_t, int>> run;  // (offset, bytelen)
      size_t j = i;
      while (j < len) {
        uint32_t c2;
        int n2 = decode_utf8(s + j, len - j, &c2);
        if (!is_cjk(c2)) break;
        run.emplace_back(j, n2);
        j += n2;
      }
      for (auto& [off, nb] : run) emit(s + off, static_cast<size_t>(nb));
      for (size_t r = 0; r + 1 < run.size(); ++r)
        emit(s + run[r].first,
             static_cast<size_t>(run[r].second + run[r + 1].second));
      i = j;
    } else if (is_word(cp)) {
      // the python regex: [a-z0-9]+(?:\.[0-9]+)?
      size_t j = i;
      while (j < len) {
        uint32_t c2;
        int n2 = decode_utf8(s + j, len - j, &c2);
        if (!is_word(c2)) break;
        j += n2;
      }
      if (j < len && s[j] == '.') {
        size_t k = j + 1, digits = 0;
        while (k < len && s[k] >= '0' && s[k] <= '9') { ++k; ++digits; }
        if (digits > 0) j = k;
      }
      emit(s + i, j - i);
      i = j;
    } else {
      i += n;
    }
  }
}

struct CsrResult {
  std::vector<int64_t> indptr;     // [V+1]
  std::vector<int32_t> chunk_ids;  // [nnz]
  std::vector<float> tf;           // [nnz]
  std::vector<float> df;           // [V]
  std::vector<float> chunk_len;    // [n_chunks]
};

CsrResult* g_result = nullptr;

}  // namespace

extern "C" {

// Phase 1: build. texts = concatenated UTF-8 buffer; offsets[n+1] frames
// each chunk. Returns nnz; result cached until csr_collect.
int64_t csr_build(const char* texts, const int64_t* offsets, int32_t n_chunks,
                  int32_t vocab_bits) {
  delete g_result;
  g_result = new CsrResult();
  const uint32_t V = 1u << vocab_bits;
  const uint32_t mask = V - 1;

  std::vector<std::vector<std::pair<int32_t, uint32_t>>> postings(V);
  g_result->chunk_len.assign(n_chunks, 0.f);
  g_result->df.assign(V, 0.f);

  std::unordered_map<uint32_t, uint32_t> tf_map;
  for (int32_t c = 0; c < n_chunks; ++c) {
    tf_map.clear();
    uint32_t n_tokens = 0;
    tokenize(texts + offsets[c],
             static_cast<size_t>(offsets[c + 1] - offsets[c]),
             [&](const char* d, size_t l) {
               uint32_t id = static_cast<uint32_t>(fnv1a(d, l)) & mask;
               ++tf_map[id];
               ++n_tokens;
             });
    g_result->chunk_len[c] = static_cast<float>(n_tokens);
    for (auto& [term, count] : tf_map) {
      postings[term].emplace_back(c, count);
      g_result->df[term] += 1.f;
    }
  }

  g_result->indptr.assign(V + 1, 0);
  int64_t nnz = 0;
  for (uint32_t t = 0; t < V; ++t) {
    nnz += static_cast<int64_t>(postings[t].size());
    g_result->indptr[t + 1] = nnz;
  }
  g_result->chunk_ids.resize(nnz);
  g_result->tf.resize(nnz);
  int64_t pos = 0;
  for (uint32_t t = 0; t < V; ++t) {
    for (auto& [c, count] : postings[t]) {
      g_result->chunk_ids[pos] = c;
      g_result->tf[pos] = static_cast<float>(count);
      ++pos;
    }
  }
  return nnz;
}

// Phase 2: copy out into caller-allocated buffers, then free.
void csr_collect(int64_t* indptr_out, int32_t* chunk_ids_out, float* tf_out,
                 float* df_out, float* chunk_len_out) {
  if (!g_result) return;
  std::memcpy(indptr_out, g_result->indptr.data(),
              g_result->indptr.size() * sizeof(int64_t));
  std::memcpy(chunk_ids_out, g_result->chunk_ids.data(),
              g_result->chunk_ids.size() * sizeof(int32_t));
  std::memcpy(tf_out, g_result->tf.data(), g_result->tf.size() * sizeof(float));
  std::memcpy(df_out, g_result->df.data(), g_result->df.size() * sizeof(float));
  std::memcpy(chunk_len_out, g_result->chunk_len.data(),
              g_result->chunk_len.size() * sizeof(float));
  delete g_result;
  g_result = nullptr;
}

// Batch query tokenizer: hashed ids of the first max_terms tokens per text,
// -1 padded (contract of ops/bm25.py encode_queries).
void tokenize_queries(const char* texts, const int64_t* offsets,
                      int32_t n_texts, int32_t vocab_bits, int32_t max_terms,
                      int32_t* ids_out) {
  const uint32_t mask = (1u << vocab_bits) - 1;
  for (int32_t q = 0; q < n_texts; ++q) {
    std::vector<int32_t> ids;
    tokenize(texts + offsets[q],
             static_cast<size_t>(offsets[q + 1] - offsets[q]),
             [&](const char* d, size_t l) {
               ids.push_back(
                   static_cast<int32_t>(static_cast<uint32_t>(fnv1a(d, l)) & mask));
             });
    for (int32_t t = 0; t < max_terms; ++t)
      ids_out[q * max_terms + t] =
          (t < static_cast<int32_t>(ids.size())) ? ids[t] : -1;
  }
}

}  // extern "C"
