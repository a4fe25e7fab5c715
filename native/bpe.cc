// Native byte-level BPE merge engine.
//
// The per-text hot loop of tokenization — applying ranked merges to each
// pre-token until none apply — is pure hash-map + array churn that Python
// executes one pair-lookup at a time. This library runs it over a flattened
// batch of pre-tokens in one call. The cold path (parsing tokenizer.json,
// regex pre-tokenization, byte<->unicode alphabet) stays in Python
// (ssp_x_vit_tpu/llm/tokenizer.py), which also carries a pure-Python
// fallback of this loop with identical semantics.
//
// The reference stack delegates all tokenization to HF AutoTokenizer
// (src/utilities.py loadModel); this is the rebuild's native-runtime
// counterpart for the encode path. C ABI only (ctypes; no Python.h).

#include <climits>
#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct BpeEngine {
  // (left_id << 32 | right_id) -> merge rank
  std::unordered_map<uint64_t, int32_t> rank;
  // merge rank -> merged token id
  std::vector<int32_t> merged;
};

inline uint64_t pair_key(int32_t l, int32_t r) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(l)) << 32) |
         static_cast<uint32_t>(r);
}

}  // namespace

extern "C" {

void* bpe_init(int64_t n_merges, const int32_t* left, const int32_t* right,
               const int32_t* merged_ids) {
  auto* e = new BpeEngine();
  e->rank.reserve(static_cast<size_t>(n_merges) * 2);
  e->merged.resize(n_merges);
  for (int64_t i = 0; i < n_merges; ++i) {
    e->rank.emplace(pair_key(left[i], right[i]), static_cast<int32_t>(i));
    e->merged[i] = merged_ids[i];
  }
  return e;
}

void bpe_free(void* h) { delete static_cast<BpeEngine*>(h); }

// Encode a batch of pre-tokens.
//   syms:        flattened initial symbol ids (one per byte-level char)
//   offsets:     [n_words + 1] word boundaries into syms
//   out:         output ids buffer, capacity >= offsets[n_words]
//   out_offsets: [n_words + 1] word boundaries into out
// Returns total output length.
int64_t bpe_encode_batch(void* h, const int32_t* syms, const int64_t* offsets,
                         int64_t n_words, int32_t* out, int64_t* out_offsets) {
  auto* e = static_cast<BpeEngine*>(h);
  int64_t w = 0;
  std::vector<int32_t> buf;
  for (int64_t wi = 0; wi < n_words; ++wi) {
    const int64_t a = offsets[wi], b = offsets[wi + 1];
    buf.assign(syms + a, syms + b);
    // classic lowest-rank-first merge loop (words are short; the O(n^2)
    // scan matches the canonical GPT-2/HF implementation's behavior)
    while (buf.size() >= 2) {
      int32_t best = INT32_MAX;
      int64_t pos = -1;
      for (size_t i = 0; i + 1 < buf.size(); ++i) {
        auto it = e->rank.find(pair_key(buf[i], buf[i + 1]));
        if (it != e->rank.end() && it->second < best) {
          best = it->second;
          pos = static_cast<int64_t>(i);
        }
      }
      if (pos < 0) break;
      buf[pos] = e->merged[best];
      buf.erase(buf.begin() + pos + 1);
    }
    out_offsets[wi] = w;
    for (int32_t id : buf) out[w++] = id;
  }
  out_offsets[n_words] = w;
  return w;
}

}  // extern "C"
