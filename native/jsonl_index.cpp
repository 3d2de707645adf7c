// Fast JSONL manifest indexer — native half of the data layer's lazy
// byte-offset index mode (reference: data_utils.py:475-603, which scans
// manifests in Python and broadcasts a pickled index).  Here a single
// buffered C++ pass records line offsets and pre-extracts the two fields
// the filters need (duration, text length), so dataset construction over
// large manifests never materialises records in Python.
//
// Build: g++ -O3 -shared -fPIC -o libjsonl_index.so jsonl_index.cpp
// ABI (ctypes):
//   int64 jsonl_index(const char* path,
//                     int64* offsets, int64* lengths,
//                     double* durations, int64* text_lens,
//                     int64 capacity);
//     returns number of lines indexed (< 0 on error); for each line i:
//     offsets[i]   = byte offset of line start
//     lengths[i]   = byte length of the line (excluding newline)
//     durations[i] = value of a top-level "duration" number field (or -1)
//     text_lens[i] = UTF-8 codepoint count of a top-level "text" field (or -1)
//   int64 jsonl_count(const char* path);  // number of non-empty lines

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

// Minimal scan for a top-level string/number field inside one JSON line.
// Exact JSON parsing is unnecessary: manifests are machine-written
// single-level objects.  Returns pointer just past the matched key's ':'
// or nullptr.
const char* find_field(const char* line, size_t len, const char* key) {
    const size_t klen = std::strlen(key);
    for (size_t i = 0; i + klen + 3 < len; ++i) {
        if (line[i] == '"' && std::memcmp(line + i + 1, key, klen) == 0 &&
            line[i + 1 + klen] == '"') {
            size_t j = i + klen + 2;
            while (j < len && (line[j] == ' ' || line[j] == ':')) {
                if (line[j] == ':') return line + j + 1;
                ++j;
            }
        }
    }
    return nullptr;
}

double parse_duration(const char* line, size_t len) {
    const char* p = find_field(line, len, "duration");
    if (!p) return -1.0;
    return std::strtod(p, nullptr);
}

// count UTF-8 codepoints of a JSON string value starting at p (after ':')
int64_t count_text_codepoints(const char* line, size_t len) {
    const char* p = find_field(line, len, "text");
    if (!p) return -1;
    const char* end = line + len;
    while (p < end && *p != '"') ++p;
    if (p >= end) return -1;
    ++p;
    int64_t count = 0;
    // 4 hex digits -> value, or -1
    auto hex4 = [](const char* q, const char* end) -> int {
        if (q + 4 > end) return -1;
        int v = 0;
        for (int k = 0; k < 4; ++k) {
            char h = q[k];
            v <<= 4;
            if (h >= '0' && h <= '9') v |= h - '0';
            else if (h >= 'a' && h <= 'f') v |= h - 'a' + 10;
            else if (h >= 'A' && h <= 'F') v |= h - 'A' + 10;
            else return -1;
        }
        return v;
    };
    while (p < end && *p != '"') {
        unsigned char c = static_cast<unsigned char>(*p);
        if (c == '\\') {
            // \uXXXX is ONE codepoint (json.dumps default ensure_ascii=True
            // writes all CJK this way); a \uD800-\uDBFF + \uDC00-\uDFFF
            // surrogate pair is also one — matching Python len() after
            // json.loads, the contract with the pure-Python fallback
            if (p + 1 < end && p[1] == 'u') {
                int v = hex4(p + 2, end);
                p += (v >= 0) ? 6 : 2;
                if (v >= 0xD800 && v <= 0xDBFF && p + 6 <= end &&
                    p[0] == '\\' && p[1] == 'u') {
                    int w = hex4(p + 2, end);
                    if (w >= 0xDC00 && w <= 0xDFFF) p += 6;
                }
            } else {
                p += 2;  // simple escape: \" \\ \n ...
            }
            ++count;
            continue;
        }
        // count only UTF-8 lead bytes
        if ((c & 0xC0) != 0x80) ++count;
        ++p;
    }
    return count;
}

}  // namespace

extern "C" {

int64_t jsonl_count(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::vector<char> buf(1 << 20);
    int64_t lines = 0;
    bool line_has_content = false;
    size_t n;
    while ((n = std::fread(buf.data(), 1, buf.size(), f)) > 0) {
        for (size_t i = 0; i < n; ++i) {
            if (buf[i] == '\n') {
                if (line_has_content) ++lines;
                line_has_content = false;
            } else if (buf[i] != '\r' && buf[i] != ' ') {
                line_has_content = true;
            }
        }
    }
    if (line_has_content) ++lines;
    std::fclose(f);
    return lines;
}

int64_t jsonl_index(const char* path, int64_t* offsets, int64_t* lengths,
                    double* durations, int64_t* text_lens, int64_t capacity) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;

    std::vector<char> line;
    line.reserve(1 << 16);
    std::vector<char> buf(1 << 20);
    int64_t count = 0;
    int64_t file_pos = 0;
    int64_t line_start = 0;
    size_t n;
    auto flush_line = [&]() {
        if (line.empty()) {
            line_start = file_pos + 1;
            return;
        }
        bool blank = true;
        for (char c : line) {
            if (c != ' ' && c != '\r' && c != '\t') { blank = false; break; }
        }
        if (!blank) {
            if (count >= capacity) { count = -2; return; }
            offsets[count] = line_start;
            lengths[count] = static_cast<int64_t>(line.size());
            durations[count] = parse_duration(line.data(), line.size());
            text_lens[count] = count_text_codepoints(line.data(), line.size());
            ++count;
        }
        line.clear();
        line_start = file_pos + 1;
    };

    while ((n = std::fread(buf.data(), 1, buf.size(), f)) > 0) {
        for (size_t i = 0; i < n; ++i, ++file_pos) {
            if (buf[i] == '\n') {
                flush_line();
                if (count == -2) { std::fclose(f); return -2; }
            } else {
                line.push_back(buf[i]);
            }
        }
    }
    // final unterminated line
    ++file_pos;
    flush_line();
    std::fclose(f);
    return count;
}

}  // extern "C"
