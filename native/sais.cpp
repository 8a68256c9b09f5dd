// SA-IS: linear-time suffix array by induced sorting (Nong, Zhang & Chan),
// implemented from scratch for integer alphabets.
//
// Role: host-side suffix sorting for index construction — the same job
// libdivsufsort / prefix-free parsing performs inside the reference's
// mumemto stage (thirdparty/CMakeLists.txt:51-69, SURVEY §2.2).  The input
// is the int32 sort-rank text of oracle.concat_collection (distinct
// separator ranks), end-of-string sorting smaller than every symbol.
//
// Differential-tested against the NumPy prefix-doubling oracle and the
// device suffix array.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using std::vector;

// s: integer string of length n over alphabet [0, K); SA: output length n.
void sais_core(const int64_t* s, int64_t* SA, int64_t n, int64_t K) {
    if (n == 0) return;
    if (n == 1) { SA[0] = 0; return; }

    // classify: t[i] = 1 if suffix i is S-type
    vector<uint8_t> t(n);
    t[n - 1] = 1;  // last suffix is S by the sentinel convention
    for (int64_t i = n - 2; i >= 0; --i)
        t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);

    auto is_lms = [&](int64_t i) {
        return i > 0 && t[i] && !t[i - 1];
    };

    // bucket sizes
    vector<int64_t> bkt(K);
    auto get_buckets = [&](bool end) {
        std::fill(bkt.begin(), bkt.end(), 0);
        for (int64_t i = 0; i < n; ++i) ++bkt[s[i]];
        int64_t sum = 0;
        for (int64_t c = 0; c < K; ++c) {
            sum += bkt[c];
            bkt[c] = end ? sum : sum - bkt[c];
        }
    };

    auto induce = [&]() {
        // L-type from left
        get_buckets(false);
        for (int64_t i = 0; i < n; ++i) {
            int64_t j = SA[i] - 1;
            if (SA[i] > 0 && !t[j]) SA[bkt[s[j]]++] = j;
        }
        // S-type from right
        get_buckets(true);
        for (int64_t i = n - 1; i >= 0; --i) {
            int64_t j = SA[i] - 1;
            if (SA[i] > 0 && t[j]) SA[--bkt[s[j]]] = j;
        }
    };

    // stage 1: place LMS suffixes at bucket ends, induce
    std::fill(SA, SA + n, -1);
    get_buckets(true);
    for (int64_t i = n - 1; i >= 1; --i)
        if (is_lms(i)) SA[--bkt[s[i]]] = i;
    induce();

    // compact sorted LMS positions into SA[0..n1)
    int64_t n1 = 0;
    for (int64_t i = 0; i < n; ++i)
        if (is_lms(SA[i])) SA[n1++] = SA[i];

    // name LMS substrings
    std::fill(SA + n1, SA + n, -1);
    int64_t name = 0, prev = -1;
    for (int64_t i = 0; i < n1; ++i) {
        int64_t pos = SA[i];
        bool diff = false;
        if (prev == -1) {
            diff = true;
        } else {
            for (int64_t d = 0; d < n; ++d) {
                int64_t a = pos + d, b = prev + d;
                if (a == n || b == n) { diff = (a != b); break; }
                if (s[a] != s[b] || t[a] != t[b]) { diff = true; break; }
                if (d > 0 && (is_lms(a) || is_lms(b))) {
                    diff = !(is_lms(a) && is_lms(b));
                    break;
                }
            }
        }
        if (diff) { ++name; prev = pos; }
        SA[n1 + pos / 2] = name - 1;
    }
    // gather names in text order
    for (int64_t i = n - 1, j = n - 1; i >= n1; --i)
        if (SA[i] >= 0) SA[j--] = SA[i];

    // stage 2: sort the reduced problem
    int64_t* s1 = SA + n - n1;
    if (name < n1) {
        sais_core(s1, SA, n1, name);
    } else {
        for (int64_t i = 0; i < n1; ++i) SA[s1[i]] = i;
    }

    // stage 3: map reduced SA back to LMS positions, induce final order
    vector<int64_t> lms(n1);
    for (int64_t i = 0, j = 0; i < n; ++i)
        if (is_lms(i)) lms[j++] = i;
    for (int64_t i = 0; i < n1; ++i) SA[i] = lms[SA[i]];
    std::fill(SA + n1, SA + n, -1);
    get_buckets(true);
    for (int64_t i = n1 - 1; i >= 0; --i) {
        int64_t j = SA[i];
        SA[i] = -1;
        SA[--bkt[s[j]]] = j;
    }
    induce();
}

}  // namespace

extern "C" {

// Suffix array of an int64 rank text with values >= 1 (values in [1, K));
// end-of-string compares smaller than every symbol — realized by appending
// a unique 0 sentinel internally (SA-IS requires it).
void suffix_array_sais(const int64_t* s, int64_t n, int64_t K, int64_t* sa_out) {
    if (n == 0) return;
    vector<int64_t> s2(n + 1);
    std::memcpy(s2.data(), s, n * sizeof(int64_t));
    s2[n] = 0;
    vector<int64_t> sa2(n + 1);
    sais_core(s2.data(), sa2.data(), n + 1, K);
    // sa2[0] == n (the sentinel); the rest is the answer
    std::memcpy(sa_out, sa2.data() + 1, n * sizeof(int64_t));
}

}  // extern "C"
