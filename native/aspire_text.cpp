// aspire_text: native tokenization core for the aspire_tpu data pipeline.
//
// The reference retokenizes every training example with the Python HF
// tokenizer on every epoch (src/learning/batchers.py:61-252) -- the CPU-side
// hot loop of training.  This library implements the BERT BasicTokenizer +
// WordPiece pipeline (greedy longest-match-first with "##" continuations)
// with a C ABI consumed via ctypes (no pybind11 in this image).
//
// Scope/divergence notes (documented, validated in tests):
//  * ASCII lowercasing and ASCII punctuation splitting match HF exactly.
//  * Non-ASCII UTF-8 codepoints are treated as opaque letter characters (no
//    unicode lowercasing/NFD accent stripping, no CJK spacing) -- identical
//    behaviour on the ASCII scientific text this pipeline feeds.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC aspire_text.cpp -o libaspire_text.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <fstream>

namespace {

struct Vocab {
    std::unordered_map<std::string, int32_t> token2id;
    int32_t unk_id = 0;
    int32_t max_chars_per_word = 100;
};

inline bool is_ascii_space(unsigned char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0b;
}

inline bool is_ascii_punct(unsigned char c) {
    // HF _is_punctuation for ASCII: the four punct ranges.
    return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
           (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

inline bool is_control(unsigned char c) {
    return c < 32 && !is_ascii_space(c);
}

// Split text into "words": whitespace-separated, punctuation split out as
// single-char words; optional ASCII lowercasing.
void basic_tokenize(const char* text, bool lowercase,
                    std::vector<std::string>* words) {
    std::string cur;
    for (const unsigned char* p = (const unsigned char*)text; *p; ++p) {
        unsigned char c = *p;
        if (is_control(c)) continue;
        if (is_ascii_space(c)) {
            if (!cur.empty()) { words->push_back(cur); cur.clear(); }
        } else if (c < 128 && is_ascii_punct(c)) {
            if (!cur.empty()) { words->push_back(cur); cur.clear(); }
            words->push_back(std::string(1, (char)c));
        } else {
            if (lowercase && c >= 'A' && c <= 'Z') c = c - 'A' + 'a';
            cur.push_back((char)c);
        }
    }
    if (!cur.empty()) words->push_back(cur);
}

// Count UTF-8 codepoints (HF caps words at max_chars_per_word CODEPOINTS).
size_t utf8_len(const std::string& s) {
    size_t n = 0;
    for (unsigned char c : s) if ((c & 0xC0) != 0x80) ++n;
    return n;
}

// Greedy longest-match-first WordPiece on one word.
void wordpiece(const Vocab& v, const std::string& word,
               std::vector<int32_t>* out) {
    if (utf8_len(word) > (size_t)v.max_chars_per_word) {
        out->push_back(v.unk_id);
        return;
    }
    std::vector<int32_t> pieces;
    size_t start = 0;
    while (start < word.size()) {
        size_t end = word.size();
        int32_t cur_id = -1;
        while (start < end) {
            std::string sub = word.substr(start, end - start);
            if (start > 0) sub = "##" + sub;
            auto it = v.token2id.find(sub);
            if (it != v.token2id.end()) { cur_id = it->second; break; }
            // back off one full UTF-8 codepoint
            do { --end; } while (end > start && (word[end] & 0xC0) == 0x80);
        }
        if (cur_id < 0) {  // no piece matched -> whole word is UNK
            out->push_back(v.unk_id);
            return;
        }
        pieces.push_back(cur_id);
        start = end;
    }
    out->insert(out->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

void* at_load_vocab(const char* path, const char* unk_token) {
    std::ifstream f(path);
    if (!f.good()) return nullptr;
    auto* v = new Vocab();
    std::string line;
    int32_t idx = 0;
    while (std::getline(f, line)) {
        // strip trailing \r
        while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
            line.pop_back();
        v->token2id.emplace(line, idx++);
    }
    auto it = v->token2id.find(unk_token ? unk_token : "[UNK]");
    v->unk_id = (it != v->token2id.end()) ? it->second : 0;
    return v;
}

void at_free_vocab(void* vocab) { delete (Vocab*)vocab; }

int32_t at_vocab_size(void* vocab) {
    return (int32_t)((Vocab*)vocab)->token2id.size();
}

int32_t at_token_id(void* vocab, const char* token) {
    auto& v = *(Vocab*)vocab;
    auto it = v.token2id.find(token);
    return it != v.token2id.end() ? it->second : -1;
}

// Tokenize one text. Returns number of ids written (<= max_out; truncates).
int32_t at_tokenize(void* vocab, const char* text, int32_t lowercase,
                    int32_t* out_ids, int32_t max_out) {
    auto& v = *(Vocab*)vocab;
    std::vector<std::string> words;
    basic_tokenize(text, lowercase != 0, &words);
    std::vector<int32_t> ids;
    ids.reserve(64);
    for (const auto& w : words) wordpiece(v, w, &ids);
    int32_t n = (int32_t)ids.size();
    if (n > max_out) n = max_out;
    std::memcpy(out_ids, ids.data(), n * sizeof(int32_t));
    return n;
}

// Tokenize a batch of texts (concatenated, NUL-separated) into a flat id
// buffer with per-text counts.  texts: n_texts NUL-terminated strings placed
// back to back.  Returns total ids written.
int32_t at_tokenize_batch(void* vocab, const char* texts, int32_t n_texts,
                          int32_t lowercase, int32_t* out_ids,
                          int32_t* out_counts, int32_t max_total) {
    const char* p = texts;
    int32_t total = 0;
    for (int32_t i = 0; i < n_texts; ++i) {
        int32_t n = at_tokenize(vocab, p, lowercase, out_ids + total,
                                max_total - total);
        out_counts[i] = n;
        total += n;
        p += std::strlen(p) + 1;
    }
    return total;
}

// Pack one document's sentence token streams into the model's flat arrays,
// applying the 500-token truncate-final-sentence rule and the +1 CLS offset
// (reference contract, ex_aspire_consent.py:107-181).
//
// sent_ids_flat/sent_counts: concatenated per-sentence token ids (title is
// sentence 0).  Outputs:
//   out_tokens: [CLS] + kept ids + [SEP]   (returns its length)
//   out_sent_labels: same length; -1 for CLS/SEP/title, else sentence index
//   *out_num_sents: number of kept abstract sentences (title excluded)
int32_t at_pack_doc(const int32_t* sent_ids_flat, const int32_t* sent_counts,
                    int32_t n_sents, int32_t max_num_toks,
                    int32_t cls_id, int32_t sep_id,
                    int32_t* out_tokens, int32_t* out_sent_labels,
                    int32_t* out_num_sents) {
    int32_t cur_len = 0;   // content tokens kept so far
    int32_t kept_sents = 0;
    out_tokens[0] = cls_id;
    out_sent_labels[0] = -1;
    int32_t w = 1;
    const int32_t* src = sent_ids_flat;
    for (int32_t s = 0; s < n_sents; ++s) {
        int32_t len = sent_counts[s];
        int32_t keep = len;
        bool last = false;
        if (cur_len + len > max_num_toks) {
            keep = max_num_toks - cur_len;
            last = true;
        }
        if (keep > 0) {
            for (int32_t i = 0; i < keep; ++i) {
                out_tokens[w] = src[i];
                out_sent_labels[w] = (s == 0) ? -1 : (s - 1);
                ++w;
            }
            cur_len += keep;
            if (s > 0) ++kept_sents;
        }
        src += len;
        if (last) break;
    }
    out_tokens[w] = sep_id;
    out_sent_labels[w] = -1;
    ++w;
    *out_num_sents = kept_sents;
    return w;
}

}  // extern "C"
