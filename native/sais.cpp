// SA-IS suffix array construction (induced sorting), C++17.
//
// Native replacement for the index-construction hot path: the reference
// builds its BWT with sais-lite / BWT-SW (is.c, bwt_gen/); we build the
// suffix array with our own SA-IS and derive the BWT in Python.  O(n) time;
// handles genome-scale inputs where the NumPy prefix-doubling fallback is
// too slow.  Classic formulation with an explicit unique sentinel, so the
// output order matches `shorter prefix-suffix first` (is.c semantics).
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// SA-IS over T[0..n-1] with values in [1, K) and T[n-1] == 0 the unique
// smallest sentinel.  SA receives n entries.
void sais_core(const int64_t* T, int64_t* SA, int64_t n, int64_t K) {
    std::vector<bool> is_s(n);
    is_s[n - 1] = true;
    for (int64_t i = n - 2; i >= 0; --i)
        is_s[i] = T[i] < T[i + 1] || (T[i] == T[i + 1] && is_s[i + 1]);

    auto is_lms = [&](int64_t i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

    std::vector<int64_t> bkt(K, 0);
    for (int64_t i = 0; i < n; ++i) ++bkt[T[i]];
    std::vector<int64_t> cur(K);

    auto bucket_ends = [&]() {
        int64_t sum = 0;
        for (int64_t c = 0; c < K; ++c) { sum += bkt[c]; cur[c] = sum; }
    };
    auto bucket_starts = [&]() {
        int64_t sum = 0;
        for (int64_t c = 0; c < K; ++c) { cur[c] = sum; sum += bkt[c]; }
    };

    auto induce = [&]() {
        bucket_starts();
        for (int64_t i = 0; i < n; ++i) {
            int64_t j = SA[i];
            if (j > 0 && !is_s[j - 1]) SA[cur[T[j - 1]]++] = j - 1;
        }
        bucket_ends();
        for (int64_t i = n - 1; i >= 0; --i) {
            int64_t j = SA[i];
            if (j > 0 && is_s[j - 1]) SA[--cur[T[j - 1]]] = j - 1;
        }
    };

    // step 1: LMS suffixes at bucket ends, then induce
    std::memset(SA, -1, sizeof(int64_t) * n);
    bucket_ends();
    for (int64_t i = 1; i < n; ++i)
        if (is_lms(i)) SA[--cur[T[i]]] = i;
    induce();

    // step 2: name LMS substrings in sorted order
    std::vector<int64_t> lms_sorted;
    lms_sorted.reserve(n / 2 + 1);
    for (int64_t i = 0; i < n; ++i)
        if (SA[i] > 0 && is_lms(SA[i])) lms_sorted.push_back(SA[i]);
    std::vector<int64_t> name(n, -1);
    int64_t names = 0, prev = -1;
    for (int64_t p : lms_sorted) {
        bool diff = prev < 0;
        for (int64_t d = 0; !diff; ++d) {
            if (T[p + d] != T[prev + d] || is_s[p + d] != is_s[prev + d]) {
                diff = true;
                break;
            }
            if (d > 0 && (is_lms(p + d) || is_lms(prev + d))) {
                diff = !(is_lms(p + d) && is_lms(prev + d));
                break;
            }
        }
        if (diff) { ++names; prev = p; }
        name[p] = names - 1;
    }

    // reduced problem in text order (always ends at the sentinel LMS)
    std::vector<int64_t> pos1, s1;
    for (int64_t i = 1; i < n; ++i)
        if (is_lms(i)) { pos1.push_back(i); s1.push_back(name[i]); }
    int64_t n1 = (int64_t)s1.size();

    std::vector<int64_t> SA1(n1);
    if (names < n1) {
        // recurse: sentinel of the reduced string is its last LMS (the
        // text sentinel position), whose name is unique smallest (0)
        sais_core(s1.data(), SA1.data(), n1, names);
    } else {
        for (int64_t i = 0; i < n1; ++i) SA1[s1[i]] = i;
    }

    // step 3: place LMS in final order, induce
    std::memset(SA, -1, sizeof(int64_t) * n);
    bucket_ends();
    for (int64_t x = n1 - 1; x >= 0; --x) {
        int64_t j = pos1[SA1[x]];
        SA[--cur[T[j]]] = j;
    }
    induce();
}

}  // namespace

extern "C" {

// T: n bytes.  SA out: n int64.  Suffix order: lexicographic with the
// shorter suffix first on prefix ties.  Returns 0 on success.
int sais_u8(const uint8_t* T, int64_t* SA, int64_t n) {
    if (n < 0) return -1;
    if (n == 0) return 0;
    // append explicit sentinel, shift alphabet by +1
    std::vector<int64_t> T2(n + 1);
    for (int64_t i = 0; i < n; ++i) T2[i] = (int64_t)T[i] + 1;
    T2[n] = 0;
    std::vector<int64_t> SA2(n + 1);
    sais_core(T2.data(), SA2.data(), n + 1, 257);
    // SA2[0] is the sentinel suffix; drop it
    std::memcpy(SA, SA2.data() + 1, sizeof(int64_t) * n);
    return 0;
}

}  // extern "C"
