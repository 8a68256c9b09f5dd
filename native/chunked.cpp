// Chunked (beyond-one-host-RAM) index construction kernels.
//
// Role: the reference reaches pangenome scale through prefix-free parsing
// inside its mumemto fork (thirdparty/CMakeLists.txt:89-108) because a
// monolithic suffix array of the concatenation does not fit RAM.  This
// module is the from-scratch equivalent capability with a different
// decomposition: the collection is split into document chunks, each chunk
// gets a local SA-IS suffix array (native/sais.cpp), and chunk BWTs are
// merged by rank — never materializing a global SA — with the LCP array
// recovered afterwards directly from the merged RLBWT.
//
// The three kernels:
//
// 1. bwt_merge_ranks — for every suffix of chunk B, the number of suffixes
//    of the accumulated collection A that precede it, via the classic
//    backward-extension recurrence  k(i) = C_A[c] + rank_c(BWT_A, k(i+1))
//    with c = B[i], walked independently per document (each suffix's order
//    is decided at or before its own document's terminator because
//    terminators are pairwise distinct and rank below every real symbol —
//    oracle.concat_collection semantics).  The base case k(terminator of
//    any B document) = (number of A terminators): A documents all precede
//    B documents, and terminator-led suffixes sort below everything else.
//
// 2. bwt_merge_emit — stable interleave of BWT_A (run-compressed) with
//    BWT_B (in chunk suffix order) keyed by the sorted insertion ranks,
//    emitting merged runs and, optionally, the merged per-rank document-id
//    array.  Terminators are stored as byte 1 in every BWT; identity is
//    never needed (rank queries only touch real symbols) — chunk-local
//    BWTs equal the global BWT restricted to chunk suffixes because every
//    chunk ends with a terminator.
//
// 3. lcp_from_rlbwt — LCP array from the merged RLBWT by the BFS of
//    Beller, Gog, Ohlebusch & Schnattinger (JDA 2013): pop an omega-
//    interval at depth l, enumerate the symbols present in BWT[lo, hi)
//    (a run scan, cheap on an RLBWT), and for each child c-interval set
//    LCP[end] = l when unset, pushing the child at depth l+1.  Terminator
//    extensions are never pushed: the longest common prefix of two
//    suffixes can contain no terminator (each occurs once), so every
//    LCP-setting interval is terminator-free; boundaries inside the
//    terminator block are patched to 0 directly.
//
// Differential-tested against the monolithic SA-IS path
// (tests/test_chunked.py): merged runs == rle(bwt(SA)), doc array ==
// SA-derived, LCP == Kasai.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

using std::vector;

// Dense symbol classes: class 0 = terminator (byte 1), classes 1..K = real
// symbols in byte order, 255 = absent.  `classes` is a 256-entry map.

struct RunIndex {
    vector<int64_t> cum;   // run starts; cum[r] = n
    vector<int64_t> occ;   // occ[j*K + (c-1)] = # of class c in BWT[0, cum[j])
    vector<int64_t> C;     // C[c] = # suffixes starting with class < c
    vector<uint8_t> cls;   // dense class per run
    int64_t r = 0, n = 0, K = 0;

    void build(const uint8_t* heads, const int64_t* lens, int64_t r_,
               const uint8_t* classes, int64_t K_) {
        r = r_;
        K = K_;
        cum.assign(r + 1, 0);
        cls.assign(r, 0);
        occ.assign((size_t)r * K, 0);
        vector<int64_t> counts(K + 1, 0);
        vector<int64_t> running(K, 0);
        for (int64_t j = 0; j < r; ++j) {
            cum[j + 1] = cum[j] + lens[j];
            uint8_t c = classes[heads[j]];
            cls[j] = c;
            for (int64_t q = 0; q < K; ++q)
                occ[(size_t)j * K + q] = running[q];
            counts[c] += lens[j];
            if (c >= 1) running[c - 1] += lens[j];
        }
        n = cum[r];
        C.assign(K + 2, 0);
        for (int64_t c = 0; c <= K; ++c) C[c + 1] = C[c] + counts[c];
    }

    // run containing position p (0 <= p < n)
    inline int64_t run_of(int64_t p) const {
        return (int64_t)(std::upper_bound(cum.begin(), cum.end(), p)
                         - cum.begin()) - 1;
    }

    // occurrences of real class c (1..K) in BWT[0, p), 0 <= p <= n
    inline int64_t rank(int64_t c, int64_t p) const {
        if (p <= 0) return 0;
        int64_t j = run_of(std::min(p, n) - 1);
        int64_t base = occ[(size_t)j * K + (c - 1)];
        if (cls[j] == c) base += std::min(p, n) - cum[j];
        return base;
    }
};

}  // namespace

extern "C" {

// kpos[i] = number of A-suffixes preceding the suffix of B starting at i.
// doc_starts has ndocsB+1 entries; document d occupies
// [doc_starts[d], doc_starts[d+1]) and its LAST position is its terminator.
void bwt_merge_ranks(const uint8_t* headsA, const int64_t* lensA, int64_t rA,
                     const uint8_t* classes, int64_t K,
                     const uint8_t* textB, int64_t nB,
                     const int64_t* doc_starts, int64_t ndocsB,
                     int64_t* kpos_out) {
    RunIndex A;
    A.build(headsA, lensA, rA, classes, K);
    const int64_t nsepA = A.C[1];  // class-0 (terminator) count
    (void)nB;

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int64_t d = 0; d < ndocsB; ++d) {
        int64_t lo = doc_starts[d], hi = doc_starts[d + 1];
        int64_t k = nsepA;
        kpos_out[hi - 1] = k;  // the terminator suffix
        for (int64_t i = hi - 2; i >= lo; --i) {
            int64_t c = classes[textB[i]];
            k = A.C[c] + A.rank(c, k);
            kpos_out[i] = k;
        }
    }
}

// Stable interleave of run-compressed BWT_A with BWT_B (chunk suffix
// order) keyed by non-decreasing insertion ranks karr.  heads_out/lens_out
// need capacity rA + nB runs; doc_out (when with_doc) capacity nA + nB.
// Returns the merged run count.
int64_t bwt_merge_emit(const uint8_t* headsA, const int64_t* lensA,
                       int64_t rA, int64_t nA,
                       const uint8_t* bwtB, const int64_t* karr, int64_t nB,
                       const uint16_t* docA, const uint16_t* docB,
                       int32_t with_doc,
                       uint8_t* heads_out, int64_t* lens_out,
                       uint16_t* doc_out) {
    int64_t rout = 0;
    auto emit = [&](uint8_t ch, int64_t len) {
        if (len <= 0) return;
        if (rout > 0 && heads_out[rout - 1] == ch) {
            lens_out[rout - 1] += len;
        } else {
            heads_out[rout] = ch;
            lens_out[rout] = len;
            ++rout;
        }
    };

    int64_t ja = 0;           // current A run
    int64_t a_pos = 0;        // global A position consumed so far
    int64_t a_run_off = 0;    // consumed inside run ja
    int64_t out_pos = 0;      // merged positions emitted (doc_out cursor)
    auto emit_A_until = [&](int64_t target) {
        if (with_doc && target > a_pos) {
            std::memcpy(doc_out + out_pos, docA + a_pos,
                        (size_t)(target - a_pos) * sizeof(uint16_t));
            out_pos += target - a_pos;
        }
        while (a_pos < target) {
            int64_t take = std::min(lensA[ja] - a_run_off, target - a_pos);
            emit(headsA[ja], take);
            a_pos += take;
            a_run_off += take;
            if (a_run_off == lensA[ja]) { ++ja; a_run_off = 0; }
        }
    };

    for (int64_t t = 0; t < nB; ++t) {
        emit_A_until(karr[t]);
        emit(bwtB[t], 1);
        if (with_doc) doc_out[out_pos++] = docB[t];
    }
    emit_A_until(nA);
    return rout;
}

// LCP array from a run-length BWT (Beller et al. BFS).  nsep = number of
// terminators (class 0); lcp_out has n entries, lcp_out[0] = 0 and
// lcp_out[i] = lcp(suffix at rank i-1, suffix at rank i) for i >= 1.
void lcp_from_rlbwt(const uint8_t* heads, const int64_t* lens, int64_t r,
                    int64_t nsep, const uint8_t* classes, int64_t K,
                    int32_t* lcp_out) {
    RunIndex A;
    A.build(heads, lens, r, classes, K);
    const int64_t n = A.n;
    if (n == 0) return;
    std::fill(lcp_out, lcp_out + n, -1);
    // "boundary n" sentinel: intervals touching the right edge still get
    // pushed exactly once (the published algorithm's LCP[n] slot).
    int32_t end_slot = -1;

    // term = the interval's string ENDS with a (merged) terminator: such
    // omega-$ groups carry one suffix per document sharing exactly omega,
    // so every inner boundary is |omega| = |string|-1 — the same value as
    // the end boundary — and gets batch-set when the group is generated.
    // (A terminator can appear in an LCP-setter string only as its LAST
    // character: the common prefix itself is terminator-free.)
    struct IV { int64_t lo, hi; bool term; };
    vector<IV> cur, nxt;

    // depth-0: children of the root are the class blocks [C[c], C[c+1]).
    lcp_out[0] = 0;
    for (int64_t c = 0; c <= K; ++c) {
        int64_t lo = A.C[c], hi = A.C[c + 1];
        if (lo == hi) continue;
        if (hi < n) {
            if (lcp_out[hi] < 0) lcp_out[hi] = 0;
        } else {
            end_slot = 0;
        }
        cur.push_back({lo, hi, c == 0});
    }
    // boundaries inside the terminator block: terminators are pairwise
    // distinct, so adjacent terminator-led suffixes share no prefix.
    for (int64_t i = 1; i < nsep && i < n; ++i) lcp_out[i] = 0;

    int64_t depth = 1;
    while (!cur.empty()) {
        nxt.clear();
        const bool parallel_level = cur.size() >= 256;
#ifdef _OPENMP
        int nthreads = parallel_level ? omp_get_max_threads() : 1;
#else
        int nthreads = 1;
#endif
        vector<vector<IV>> locals(nthreads);
        // within one level intervals are pairwise disjoint, so child
        // boundary writes are disjoint — no races on lcp_out; end_slot can
        // only be claimed by one interval per level.
#ifdef _OPENMP
#pragma omp parallel num_threads(nthreads) if (parallel_level)
#endif
        {
#ifdef _OPENMP
            int tid = omp_get_thread_num();
#else
            int tid = 0;
#endif
            vector<IV>& out = locals[tid];
            vector<int64_t> rlo(K + 1), rhi(K + 1);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 64)
#endif
            for (size_t q = 0; q < cur.size(); ++q) {
                const int64_t lo = cur[q].lo, hi = cur[q].hi;
                const bool term = cur[q].term;
                // per-class ranks at lo, then a run scan up to hi
                int64_t j = A.run_of(lo);
                for (int64_t c = 1; c <= K; ++c) {
                    rlo[c] = A.occ[(size_t)j * K + (c - 1)];
                    rhi[c] = rlo[c];
                }
                if (A.cls[j] >= 1) rlo[A.cls[j]] += lo - A.cum[j];
                while (A.cum[j] < hi) {
                    if (A.cls[j] >= 1) {
                        int64_t end = std::min(hi, A.cum[j + 1]);
                        rhi[A.cls[j]] =
                            A.occ[(size_t)j * K + (A.cls[j] - 1)]
                            + (end - A.cum[j]);
                    }
                    ++j;
                    if (j >= A.r) break;
                }
                // left-extend by real symbols only: a terminator prepended
                // to a nonempty string can never be a common prefix (each
                // terminator occurs once) — the root already emitted the
                // terminator block.
                for (int64_t c = 1; c <= K; ++c) {
                    if (rhi[c] <= rlo[c]) continue;
                    int64_t clo = A.C[c] + rlo[c];
                    int64_t chi = A.C[c] + rhi[c];
                    bool any = false;
                    if (term) {
                        for (int64_t p = clo + 1; p < chi; ++p)
                            if (lcp_out[p] < 0) {
                                lcp_out[p] = (int32_t)depth;
                                any = true;
                            }
                    }
                    if (chi < n) {
                        if (lcp_out[chi] < 0) {
                            lcp_out[chi] = (int32_t)depth;
                            any = true;
                        }
                    } else {
                        if (end_slot < 0) end_slot = (int32_t)depth;
                        // right-edge intervals (prefixes of the largest
                        // suffix — exactly one per level) and terminator
                        // groups always extend: their descendants' sets
                        // are unreachable any other way, and the extra
                        // work is bounded by |largest suffix| resp. n.
                        any = true;
                    }
                    if (any || term) out.push_back({clo, chi, term});
                }
            }
        }
        for (auto& v : locals)
            nxt.insert(nxt.end(), v.begin(), v.end());
        cur.swap(nxt);
        ++depth;
    }
}

}  // extern "C"
