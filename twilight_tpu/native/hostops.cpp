// Native host-side alignment helpers (ctypes).
//
// pairwise_global: affine-gap global alignment with free end gaps on two
// letter-index strings, used to re-align simultaneously-gappy column blocks
// (reference semantics: alignment-helper.cpp:243-322). Implemented natively
// because the DP must run in float32 with the reference's exact operation
// order and tie-breaking; Python-level f32 emulation is ~100x slower.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 hostops.cpp -o libhostops.so
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

inline float max3(float a, float b, float c) {
    return std::max(a, std::max(b, c));
}

}  // namespace

extern "C" {

// seq1/seq2: letter indices (row/col into matrix). matrix: msize*msize f32.
// out: caller-allocated int8 buffer of capacity >= m+n. Returns path length.
int64_t pairwise_global(const int32_t* seq1, int64_t m,
                        const int32_t* seq2, int64_t n,
                        const float* matrix, int32_t msize,
                        float gap_open, float gap_extend,
                        int8_t* out) {
    const float NEG = -1e9f;
    std::vector<float> M((m + 1) * (n + 1), 0.0f);
    std::vector<float> X((m + 1) * (n + 1), 0.0f);
    std::vector<float> Y((m + 1) * (n + 1), 0.0f);
    std::vector<int8_t> tb((m + 1) * (n + 1), 0);
    auto at = [&](int64_t i, int64_t j) { return i * (n + 1) + j; };

    for (int64_t i = 1; i <= m; ++i) {
        M[at(i, 0)] = 0.0f;
        X[at(i, 0)] = M[at(i, 0)];
        Y[at(i, 0)] = NEG;
        tb[at(i, 0)] = 2;
    }
    for (int64_t j = 1; j <= n; ++j) {
        M[at(0, j)] = 0.0f;
        Y[at(0, j)] = M[at(0, j)];
        X[at(0, j)] = NEG;
        tb[at(0, j)] = 1;
    }
    for (int64_t i = 1; i <= m; ++i) {
        for (int64_t j = 1; j <= n; ++j) {
            float base = matrix[seq1[i - 1] * msize + seq2[j - 1]];
            float diag = max3(M[at(i - 1, j - 1)], X[at(i - 1, j - 1)],
                              Y[at(i - 1, j - 1)]);
            float mm = base + diag;
            float xx = std::max(M[at(i - 1, j)] + gap_open,
                                X[at(i - 1, j)] + gap_extend);
            float yy = std::max(M[at(i, j - 1)] + gap_open,
                                Y[at(i, j - 1)] + gap_extend);
            M[at(i, j)] = mm;
            X[at(i, j)] = xx;
            Y[at(i, j)] = yy;
            float best = max3(mm, xx, yy);
            // tie-break: match first, then gap-in-reference (1), then 2
            int8_t d;
            if (best == mm) d = 0;
            else if (best == yy) d = 1;
            else d = 2;
            tb[at(i, j)] = d;
        }
    }
    int64_t i = m, j = n, len = 0;
    while (i > 0 || j > 0) {
        int8_t d = tb[at(i, j)];
        out[len++] = d;
        if (d == 0) { --i; --j; }
        else if (d == 1) { --j; }
        else { --i; }
    }
    std::reverse(out, out + len);
    return len;
}

// Apply an alignment path to a batch of byte rows (the updateAlignment char
// shuffle, reference alignment-helper.cpp:389-447). keep_code0/1: the two
// path codes that consume an input char (0/2 for reference side, 0/1 for
// query side). rows: num_rows * in_stride bytes in, num_rows * aln_len out.
void apply_path_chars(const int8_t* aln, int64_t aln_len,
                      const uint8_t* rows_in, int64_t in_stride,
                      uint8_t* rows_out, int64_t num_rows,
                      int32_t keep_code_a, int32_t keep_code_b,
                      uint8_t gap_char) {
    std::vector<int64_t> src(aln_len);
    int64_t org = 0;
    for (int64_t k = 0; k < aln_len; ++k) {
        if (aln[k] == keep_code_a || aln[k] == keep_code_b) src[k] = org++;
        else src[k] = -1;
    }
    for (int64_t r = 0; r < num_rows; ++r) {
        const uint8_t* in = rows_in + r * in_stride;
        uint8_t* out = rows_out + r * aln_len;
        for (int64_t k = 0; k < aln_len; ++k) {
            out[k] = (src[k] >= 0) ? in[src[k]] : gap_char;
        }
    }
}

// Weighted per-sequence profile accumulation (the hot loop of
// calculateProfile, reference alignment-helper.cpp:23-34). Float semantics
// are load-bearing: each column add is f32(double(acc) + double(w)),
// sequence-by-sequence in member order — identical to the Python loop in
// pipeline/helpers.py it replaces, ~60x faster.
// rows: nseq pointers to length-`length` byte rows; lut: 256-entry letter
// index table; profile: length*psize f32, updated in place.
void accumulate_profile(const uint8_t** rows, const float* weights,
                        int64_t nseq, const uint8_t* lut, int64_t length,
                        int64_t psize, float* profile) {
    for (int64_t s = 0; s < nseq; ++s) {
        const double w = (double)weights[s];
        const uint8_t* row = rows[s];
        for (int64_t k = 0; k < length; ++k) {
            float* cell = profile + k * psize + lut[row[k]];
            *cell = (float)((double)*cell + w);
        }
    }
}

// Apply an alignment path to many byte rows given per-row input pointers
// (updateAlignment char shuffle, reference alignment-helper.cpp:389-447).
// src_map: aln_len precomputed source indices (-1 = gap). rows_out is one
// contiguous num_rows*aln_len block the caller slices into per-seq views.
void apply_path_rows(const int64_t* src_map, int64_t aln_len,
                     const uint8_t** rows_in, uint8_t* rows_out,
                     int64_t num_rows, uint8_t gap_char) {
    for (int64_t r = 0; r < num_rows; ++r) {
        const uint8_t* in = rows_in[r];
        uint8_t* out = rows_out + r * aln_len;
        for (int64_t k = 0; k < aln_len; ++k) {
            const int64_t s = src_map[k];
            out[k] = (s >= 0) ? in[s] : gap_char;
        }
    }
}

// Sort permutation for the deferred-realign node list. The reference sorts
// fallback nodes with std::sort and a (alnNum desc, alnLen desc) comparator
// (progressive.cpp:282-286); std::sort is NOT stable, and the permutation
// of equal keys is libstdc++'s introsort order — which the byte-identical
// bar requires us to reproduce exactly. Running the same comparator through
// the same std::sort over the same input order yields that permutation.
void sort_fallback_perm(const int32_t* nums, const int32_t* lens,
                        int32_t* idx, int64_t n) {
    for (int64_t i = 0; i < n; ++i) idx[i] = (int32_t)i;
    std::sort(idx, idx + n, [&](int32_t a, int32_t b) {
        if (nums[a] == nums[b]) return lens[a] > lens[b];
        return nums[a] > nums[b];
    });
}

}  // extern "C"
