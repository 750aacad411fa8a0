// Native BWA-SW DAG x trie core — a 1:1 port of the Python
// models/bwasw.py bsw2_core (itself the faithful port of
// bwtsw2_core.c:87-594): connectivity pre-pass, the stack of target-trie
// entries with per-entry cell arrays, z-best heap pruning, duplicate
// removal, pending-entry merges, and hit capture.  The SA->coordinate
// resolution (drand48 tie-breaks, float32 mask arithmetic) stays in
// Python.
//
// Everything here must stay bit-identical to the Python core — the
// byte-identical bwasw SAM tests are the contract.  Cell/entry layout
// and iteration order mirror the Python literally.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <atomic>
#include <cstdlib>
#include <unordered_map>
#include <vector>

// env-gated op counters (NABWA_BSW_COUNTS): cumulative across calls.
// The atomics MUST be branch-gated: unconditional increments bounce one
// cache line across all phase-A threads (measured 350 -> 200 reads/s)
static std::atomic<long long> g_cnt_nodes{0}, g_cnt_cells{0},
    g_cnt_occ{0}, g_cnt_hash{0}, g_cnt_expand{0};
static const bool g_cnt_on = []() {
    const char* e = getenv("NABWA_BSW_COUNTS");
    return e != nullptr && *e;
}();
extern "C" void bsw2_counts(long long* out) {
    out[0] = g_cnt_nodes.load();
    out[1] = g_cnt_cells.load();
    out[2] = g_cnt_occ.load();
    out[3] = g_cnt_hash.load();
    out[4] = g_cnt_expand.load();
}

namespace {

constexpr int32_t MINUS_INF = -0x3FFFFFFF;

// ---- genome FM occ4 over the interleaved-Occ layout (bwt.c:155-216),
// same routines as dfsgap.cpp ----

static inline void word_cnt123(uint32_t v, uint32_t* c1, uint32_t* c2,
                               uint32_t* c3) {
    uint32_t lo = v & 0x55555555u, hi = (v >> 1) & 0x55555555u;
    *c1 += (uint32_t)__builtin_popcount(lo & ~hi);
    *c2 += (uint32_t)__builtin_popcount(hi & ~lo);
    *c3 += (uint32_t)__builtin_popcount(hi & lo);
}

// two adjacent words per popcountll (same trick as dfsgap.cpp:83-121)
static inline void word_cnt123_pair(uint32_t va, uint32_t vb, uint32_t* c1,
                                    uint32_t* c2, uint32_t* c3) {
    uint64_t v = ((uint64_t)va << 32) | vb;
    uint64_t lo = v & 0x5555555555555555ull,
             hi = (v >> 1) & 0x5555555555555555ull;
    *c1 += (uint32_t)__builtin_popcountll(lo & ~hi);
    *c2 += (uint32_t)__builtin_popcountll(hi & ~lo);
    *c3 += (uint32_t)__builtin_popcountll(hi & lo);
}

static inline uint32_t part_mask(int kk) {
    return ~((1u << ((15 - (kk & 15)) << 1)) - 1u);
}

struct GFm {
    const uint32_t* bwt;
    uint32_t primary;
    const uint32_t* L2;
    uint32_t seq_len;
};

static void g_occ4_raw(const GFm& fm, uint32_t k, uint32_t cnt[4]) {
    if (k >= fm.primary) --k;
    const uint32_t* p = fm.bwt + (k / 128) * 12;
    const uint32_t* w = p + 4;
    int kk = (int)(k % 128);
    int wi = kk / 16;
    uint32_t c1 = 0, c2 = 0, c3 = 0;
    int j = 0;
    for (; j + 1 < wi; j += 2)
        word_cnt123_pair(w[j], w[j + 1], &c1, &c2, &c3);
    for (; j < wi; ++j)
        word_cnt123(w[j], &c1, &c2, &c3);
    word_cnt123(w[wi] & part_mask(kk), &c1, &c2, &c3);
    cnt[0] = p[0] + (uint32_t)(kk + 1) - c1 - c2 - c3;
    cnt[1] = p[1] + c1;
    cnt[2] = p[2] + c2;
    cnt[3] = p[3] + c3;
}

static void g_occ4_edge(const GFm& fm, uint32_t k, uint32_t cnt[4]) {
    if (k == (uint32_t)-1) {
        for (int c = 0; c < 4; ++c) cnt[c] = 0;
        return;
    }
    if (k == fm.seq_len) {
        for (int c = 0; c < 4; ++c) cnt[c] = fm.L2[c + 1] - fm.L2[c];
        return;
    }
    g_occ4_raw(fm, k, cnt);
}

static void g_two_occ4(const GFm& fm, uint32_t k, uint32_t l,
                       uint32_t cnt_k[4], uint32_t cnt_l[4]) {
    // bwt_2occ4's shared-checkpoint shortcut (bwt.c:179-216): once the
    // interval narrows, k and l usually land in the same 128-bp block —
    // count [0..k] once and extend by the (k..l] delta instead of
    // re-walking the block (was ~30% of the bwasw core's genome-FM time)
    uint32_t ka = k >= fm.primary ? k - 1 : k;
    uint32_t la = l >= fm.primary ? l - 1 : l;
    if (k == (uint32_t)-1 || k == fm.seq_len || l == fm.seq_len
        || (ka >> 7) != (la >> 7)) {
        g_occ4_edge(fm, k, cnt_k);
        g_occ4_edge(fm, l, cnt_l);
        return;
    }
    const uint32_t* p = fm.bwt + (ka >> 7) * 12;
    const uint32_t* w = p + 4;
    int kk = (int)(ka & 127), ll = (int)(la & 127);
    int wk = kk / 16, wl = ll / 16;
    uint32_t c1 = 0, c2 = 0, c3 = 0;
    for (int j = 0; j < wk; ++j)
        word_cnt123(w[j], &c1, &c2, &c3);
    word_cnt123(w[wk] & part_mask(kk), &c1, &c2, &c3);
    cnt_k[0] = p[0] + (uint32_t)(kk + 1) - c1 - c2 - c3;
    cnt_k[1] = p[1] + c1;
    cnt_k[2] = p[2] + c2;
    cnt_k[3] = p[3] + c3;
    // extend to [0..ll]: bits (kk..ll] only
    if (wl == wk) {
        word_cnt123(w[wl] & part_mask(ll) & ~part_mask(kk),
                    &c1, &c2, &c3);
    } else {
        word_cnt123(w[wk] & ~part_mask(kk), &c1, &c2, &c3);
        for (int j = wk + 1; j < wl; ++j)
            word_cnt123(w[j], &c1, &c2, &c3);
        word_cnt123(w[wl] & part_mask(ll), &c1, &c2, &c3);
    }
    cnt_l[0] = p[0] + (uint32_t)(ll + 1) - c1 - c2 - c3;
    cnt_l[1] = p[1] + c1;
    cnt_l[2] = p[2] + c2;
    cnt_l[3] = p[3] + c3;
}

// ---- target (read) bwtl occ4 via the cumulative table ----

struct TFm {
    const int64_t* sa;      // [n+1]
    const int64_t* L2;      // [5]
    const int32_t* cum;     // [(n+1)*4], inclusive prefix counts
    int primary;
    int n;                  // seq_len
};

static inline void t_occ4(const TFm& t, int64_t k, int64_t cnt[4]) {
    if (k == -1 || k == 0xFFFFFFFFll) {
        cnt[0] = cnt[1] = cnt[2] = cnt[3] = 0;
        return;
    }
    if (k == t.n) {
        for (int c = 0; c < 4; ++c) cnt[c] = t.L2[c + 1] - t.L2[c];
        return;
    }
    if (k >= t.primary) --k;
    const int32_t* row = t.cum + (k + 1) * 4;
    for (int c = 0; c < 4; ++c) cnt[c] = row[c];
}

// ---- cells / entries ----

struct Cell {
    uint32_t qk, ql;
    int32_t I, D, G;
    int32_t pj;
    int32_t qlen, tlen;
    int32_t ppos, upos;
    int32_t cpos[4];
};

struct Entry {
    uint32_t tk, tl;
    std::vector<Cell> array;
};

struct CHit {
    int64_t k, l, flag, n_seeds, len, G, G2, beg, end;
};

static inline uint64_t key64(uint32_t k, uint32_t l) {
    return ((uint64_t)k << 32) | l;
}

// open-addressing (k,l)->{pending_pos,count} map: the std::unordered_map
// here was ~15% of the DAG core (766k ops per 150 reads).  Sentinel ~0
// is unreachable (l < 2^32-1 for any indexable genome).
struct FlatMap {
    std::vector<uint64_t> keys;
    std::vector<std::pair<int, int>> vals;
    size_t mask = 0, count = 0;
    static inline uint64_t hsh(uint64_t x) {
        x ^= x >> 33;
        x *= 0xff51afd7ed558ccdULL;
        x ^= x >> 33;
        x *= 0xc4ceb9fe1a85ec53ULL;
        x ^= x >> 33;
        return x;
    }
    void reset(size_t n) {
        size_t c = 64;
        while (c < 2 * n) c <<= 1;
        keys.assign(c, ~0ull);
        vals.assign(c, {0, 0});
        mask = c - 1;
        count = 0;
    }
    std::pair<int, int>* find(uint64_t k) {
        size_t i = hsh(k) & mask;
        while (keys[i] != ~0ull) {
            if (keys[i] == k) return &vals[i];
            i = (i + 1) & mask;
        }
        return nullptr;
    }
    std::pair<int, int>& get(uint64_t k) {   // find-or-insert
        if (2 * (count + 1) > keys.size()) {
            std::vector<uint64_t> ok;
            std::vector<std::pair<int, int>> ov;
            ok.swap(keys);
            ov.swap(vals);
            keys.assign(ok.size() * 2, ~0ull);
            vals.assign(ov.size() * 2, {0, 0});
            mask = keys.size() - 1;
            for (size_t j = 0; j < ok.size(); ++j) {
                if (ok[j] == ~0ull) continue;
                size_t i = hsh(ok[j]) & mask;
                while (keys[i] != ~0ull) i = (i + 1) & mask;
                keys[i] = ok[j];
                vals[i] = ov[j];
            }
        }
        size_t i = hsh(k) & mask;
        while (keys[i] != ~0ull) {
            if (keys[i] == k) return vals[i];
            i = (i + 1) & mask;
        }
        keys[i] = k;
        ++count;
        return vals[i] = {0, 0};
    }
};


// ks_heapadjust (ksort.h), max-heap wrt <, over int32 values
static void heapadjust(int i, int n, int32_t* l) {
    int k = i;
    int32_t tmp = l[i];
    for (;;) {
        k = (k << 1) + 1;
        if (k >= n) break;
        if (k != n - 1 && l[k] < l[k + 1]) ++k;
        if (l[k] < tmp) break;
        l[i] = l[k];
        i = k;
    }
    l[i] = tmp;
}

// fill_cell (bwtsw2_core.c:401-413): c1 = I source, p = D source,
// par = G source; returns the new G
static inline int32_t fill_cell(int32_t q, int32_t r, int32_t qr,
                                int32_t match_score, Cell* x,
                                const Cell* c1, const Cell* p,
                                const Cell* par) {
    int32_t G = par ? par->G + match_score : MINUS_INF;
    if (c1) {
        x->I = (c1->I > c1->G - q) ? c1->I - r : c1->G - qr;
        if (x->I > G) G = x->I;
    } else {
        x->I = MINUS_INF;
    }
    if (p) {
        x->D = (p->D > p->G - q) ? p->D - r : p->G - qr;
        if (x->D > G) G = x->D;
    } else {
        x->D = MINUS_INF;
    }
    x->G = G;
    return G;
}

// cut_tail (bwtsw2_core.c:122-145): zero all but the T best-G live cells
// (ties kept up to the count threshold, matching the Python n>=T rule)
static void cut_tail(Entry* u, int T) {
    if ((int)u->array.size() <= T) return;
    std::vector<int32_t> a;
    a.reserve(u->array.size());
    for (const Cell& p : u->array)
        if (p.ql && p.G > 0) a.push_back(-p.G);
    if ((int)a.size() <= T) return;
    std::nth_element(a.begin(), a.begin() + T, a.end());
    int32_t x = -a[T];
    int n = 0;
    for (Cell& p : u->array) {
        if (p.G == x) ++n;
        if (p.G < x || (p.G == x && n >= T)) {
            p.qk = p.ql = 0;
            p.G = 0;
            if (p.ppos >= 0) u->array[p.ppos].cpos[p.pj] = -1;
        }
    }
}

// remove_duplicate (bwtsw2_core.c:147-172)
static void remove_duplicate(Entry* u) {
    std::unordered_map<uint64_t, std::pair<int, int64_t>> h;
    h.reserve(u->array.size() * 2);
    for (int i = 0; i < (int)u->array.size(); ++i) {
        Cell& p = u->array[i];
        if (p.ql == 0) continue;
        uint64_t key = key64(p.qk, p.ql);
        int j = -1;
        auto it = h.find(key);
        if (it != h.end()) {
            int64_t vG = it->second.second;
            if ((vG & 0xFFFFFFFFll) >= p.G) {
                j = i;
            } else {
                j = it->second.first;
                it->second = {i, (int64_t)p.G};
            }
        } else {
            h[key] = {i, (int64_t)p.G};
        }
        if (j >= 0) {
            Cell& p2 = u->array[j];
            p2.qk = p2.ql = 0;
            p2.G = 0;
            if (p2.ppos >= 0) u->array[p2.ppos].cpos[p2.pj] = -3;
        }
    }
}

// merge_entry (bwtsw2_core.c:174-191): v appended into u with fixups
static void merge_entry(Entry* u, Entry* v) {
    int off = (int)u->array.size();
    for (Cell& p : v->array) {
        if (p.ppos >= 0) p.ppos += off;
        for (int d = 0; d < 4; ++d)
            if (p.cpos[d] >= 0) p.cpos[d] += off;
    }
    u->array.insert(u->array.end(), v->array.begin(), v->array.end());
}

// save_hits (bwtsw2_core.c:211-233); hits is [2n] with the Python's
// negative-index quirk replicated (k == 0 -> beg = -1 -> slots 2n-2)
static void save_hits(const TFm& t, int thres, CHit* hits, Entry* u) {
    int64_t nslots = 2 * (int64_t)t.n;
    for (const Cell& p : u->array) {
        if (p.G < thres) continue;
        for (uint32_t k = u->tk; k <= u->tl; ++k) {
            int64_t beg = k ? t.sa[k] : -1;
            int64_t end = beg + p.tlen;
            int64_t i0 = beg * 2, i1 = beg * 2 + 1;
            if (i0 < 0) i0 += nslots;        // Python hits[-2]
            if (i1 < 0) i1 += nslots;        // Python hits[-1]
            CHit* q = nullptr;
            if (p.G > hits[i0].G) {
                hits[i1] = hits[i0];
                std::memset(&hits[i0], 0, sizeof(CHit));
                q = &hits[i0];
            } else if (p.G > hits[i1].G) {
                std::memset(&hits[i1], 0, sizeof(CHit));
                q = &hits[i1];
            }
            if (q) {
                q->k = p.qk;
                q->l = p.ql;
                q->len = p.qlen;
                q->G = p.G;
                q->beg = beg;
                q->end = end;
                q->G2 = (q->k == q->l) ? 0 : q->G;
                q->flag = q->n_seeds = 0;
            }
        }
    }
}

// save_narrow_hits (bwtsw2_core.c:236-258)
static void save_narrow_hits(const TFm& t, Entry* u,
                             std::vector<CHit>* b1, int thr, int IS) {
    for (Cell& p : u->array) {
        if (p.G >= thr && (int64_t)p.ql - p.qk + 1 <= (int64_t)IS) {
            CHit q;
            std::memset(&q, 0, sizeof(q));
            q.k = p.qk;
            q.l = p.ql;
            q.len = p.qlen;
            q.G = p.G;
            q.G2 = 0;
            q.beg = t.sa[u->tk];
            q.end = q.beg + p.tlen;
            q.flag = 0;
            b1->push_back(q);
            p.qk = p.ql = 0;
            p.G = 0;
            if (p.ppos >= 0) u->array[p.ppos].cpos[p.pj] = -3;
        }
    }
}

}  // namespace

extern "C" {

// Returns 0; -1 if b1 overflowed b1_cap (caller falls back).  hits_out:
// int64 [2*t_n][9] (k,l,flag,n_seeds,len,G,G2,beg,end), zero-initialized
// by the caller; b1_out same layout, *b1_n receives the count.
int bsw2_core_u32(const int64_t* t_sa, const int64_t* t_l2,
                  const int32_t* t_cum, int t_primary, int t_n,
                  const uint32_t* g_bwt, uint32_t g_primary,
                  const uint32_t* g_l2, uint32_t g_seq_len,
                  int a, int b, int q, int r, int bw, int z, int thr,
                  int IS, int64_t* hits_out, int64_t* b1_out,
                  int64_t b1_cap, int64_t* b1_n) {
    TFm t{t_sa, t_l2, t_cum, t_primary, t_n};
    GFm g{g_bwt, g_primary, g_l2, g_seq_len};
    int32_t qr = q + r;

    // connectivity pre-pass (bwtsw2_core.c:87-120): in-degree per
    // interval; value = {pending_pos, count}
    FlatMap chash;
    chash.reset((size_t)(2 * t.n + 16));
    {
        std::vector<std::pair<int64_t, int64_t>> st;
        st.emplace_back(0, t.n);
        int64_t ck[4], cl[4];
        while (!st.empty()) {
            auto [k, l] = st.back();
            st.pop_back();
            t_occ4(t, k - 1, ck);
            t_occ4(t, l, cl);
            for (int j = 0; j < 4; ++j) {
                int64_t nk = t.L2[j] + ck[j] + 1;
                int64_t nl = t.L2[j] + cl[j];
                if (nk > nl) continue;
                uint64_t key = key64((uint32_t)nk, (uint32_t)nl);
                auto* it = chash.find(key);
                if (it == nullptr) {
                    chash.get(key) = {0, 1};
                    st.emplace_back(nk, nl);
                } else {
                    ++it->second;
                }
            }
        }
    }

    std::vector<Entry*> stack0;
    std::vector<Entry*> pending_list;   // 1-based positions in chash vals
    CHit* hits = (CHit*)hits_out;
    std::vector<CHit> b1;

    // Entry pool: new/delete per DAG node was ~10% of the core (the
    // reference uses a mempool the same way, bwtsw2_core.c:58-85);
    // recycled entries keep their array capacity
    std::vector<Entry*> pool;
    auto ent_new = [&](uint32_t k, uint32_t l) -> Entry* {
        if (!pool.empty()) {
            Entry* e = pool.back();
            pool.pop_back();
            e->tk = k;
            e->tl = l;
            e->array.clear();
            return e;
        }
        return new Entry{k, l, {}};
    };
    auto ent_free = [&](Entry* e) { pool.push_back(e); };

    Entry* u0 = ent_new(0, (uint32_t)t.n);
    {
        Cell x;
        std::memset(&x, 0, sizeof(x));
        x.I = x.D = MINUS_INF;
        x.G = 0;
        x.qk = 0;
        x.ql = g.seq_len;
        x.ppos = x.upos = -1;
        x.cpos[0] = x.cpos[1] = x.cpos[2] = x.cpos[3] = -1;
        u0->array.push_back(x);
    }
    stack0.push_back(u0);

    std::vector<int32_t> heap((size_t)z, 0);

    while (!stack0.empty()) {
        Entry* v = stack0.back();
        stack0.pop_back();
        if (g_cnt_on) g_cnt_nodes += 1;
        int old_n = (int)v->array.size();
        for (Cell& p : v->array) {
            if (p.ql == 0) continue;
            if (p.tlen - p.qlen > bw || p.qlen - p.tlen > bw) {
                p.qk = p.ql = 0;
                if (p.ppos >= 0) v->array[p.ppos].cpos[p.pj] = -5;
            }
        }

        int64_t tck[4], tcl[4];
        t_occ4(t, (int64_t)v->tk - 1, tck);
        t_occ4(t, (int64_t)v->tl, tcl);
        for (int tj = 0; tj < 4; ++tj) {
            int64_t k64 = t.L2[tj] + tck[tj] + 1;
            int64_t l64 = t.L2[tj] + tcl[tj];
            if (k64 > l64) continue;
            auto& slot = chash.get(key64((uint32_t)k64, (uint32_t)l64));
            if (g_cnt_on) g_cnt_hash += 1;
            slot.second -= 1;
            Entry* u = ent_new((uint32_t)k64, (uint32_t)l64);
            std::fill(heap.begin(), heap.end(), 0);
            // csm[pj] = score_mat[tj][pj]
            int32_t csm[4];
            for (int pj = 0; pj < 4; ++pj)
                csm[pj] = (tj == pj) ? a : -b;

            for (int i = 0; i < (int)v->array.size(); ++i) {
                // v->array only grows at this iteration's expansion
                // tail, so one pointer serves every earlier access (the
                // old per-access re-indexing defeated register
                // allocation through the realloc-aliasing barrier)
                Cell* vi = &v->array[i];
                if (vi->ql == 0) continue;
                if (g_cnt_on) g_cnt_cells += 1;
                Cell x;
                std::memset(&x, 0, sizeof(x));
                x.I = x.D = MINUS_INF;
                x.G = MINUS_INF;
                bool is_added = false;
                vi->upos = x.upos = -1;
                int32_t ppos = vi->ppos;
                if (ppos >= 0) {
                    int32_t par_upos = v->array[ppos].upos;
                    const Cell* c1 = par_upos >= 0 ? &u->array[par_upos]
                                                   : nullptr;
                    if (fill_cell(q, r, qr, csm[vi->pj], &x, c1,
                                  vi, &v->array[ppos]) > 0) {
                        x.ppos = par_upos;
                        vi->upos = (int32_t)u->array.size();
                        u->array.push_back(x);
                        if (x.ppos >= 0)
                            u->array[x.ppos].cpos[vi->pj] = vi->upos;
                        is_added = true;
                    }
                } else {
                    x.D = (vi->D > vi->G - q) ? vi->D - r : vi->G - qr;
                    if (x.D > 0) {
                        x.G = x.D;
                        x.I = MINUS_INF;
                        x.ppos = -1;
                        vi->upos = (int32_t)u->array.size();
                        u->array.push_back(x);
                        is_added = true;
                    }
                }
                if (is_added) {
                    Cell& xu = u->array[vi->upos];
                    xu.cpos[0] = xu.cpos[1] = xu.cpos[2] = xu.cpos[3] = -1;
                    xu.pj = vi->pj;
                    xu.qk = vi->qk;
                    xu.ql = vi->ql;
                    xu.qlen = vi->qlen;
                    xu.tlen = vi->tlen + 1;
                    x = xu;
                    if (x.G > -heap[0]) {
                        heap[0] = -x.G;
                        heapadjust(0, z, heap.data());
                    }
                }
                if ((x.G > qr && x.G >= -heap[0]) || i < old_n) {
                    bool has_gap = false;
                    for (int d = 0; d < 4; ++d)
                        if (vi->cpos[d] == -1) has_gap = true;
                    if (has_gap) {
                        uint32_t qck[4], qcl[4];
                        g_two_occ4(g, (uint32_t)(vi->qk - 1),
                                   vi->ql, qck, qcl);
                        if (g_cnt_on) {
                            g_cnt_occ += 1;
                            g_cnt_expand += 1;
                        }
                        Cell proto;
                        std::memset(&proto, 0, sizeof(proto));
                        proto.G = proto.I = proto.D = MINUS_INF;
                        proto.qlen = vi->qlen + 1;
                        proto.ppos = i;
                        proto.tlen = vi->tlen;
                        proto.upos = -1;
                        proto.cpos[0] = proto.cpos[1] = proto.cpos[2] =
                            proto.cpos[3] = -1;
                        for (int qj = 0; qj < 4; ++qj) {
                            if (vi->cpos[qj] != -1) continue;
                            uint32_t nk = (uint32_t)(g.L2[qj] + qck[qj]
                                                     + 1);
                            uint32_t nl = g.L2[qj] + qcl[qj];
                            if (nk > nl) {
                                vi->cpos[qj] = -2;
                                continue;
                            }
                            Cell y = proto;
                            y.qk = nk;
                            y.ql = nl;
                            y.pj = qj;
                            vi->cpos[qj] = (int32_t)v->array.size();
                            v->array.push_back(y);
                            // push may realloc: refresh the hoisted ptr
                            vi = &v->array[i];
                        }
                    }
                }
            }
            if (!u->array.empty())
                save_hits(t, thr, hits, u);
            // push u to stack or pending (bwtsw2_core.c:546-580)
            int pos = slot.first, cnt = slot.second;
            if (pos) {
                Entry* w = pending_list[pos - 1];
                if (!u->array.empty()) {
                    if (w->array.size() < u->array.size()) {
                        std::swap(pending_list[pos - 1], u);
                        w = pending_list[pos - 1];
                    }
                    merge_entry(w, u);
                }
                if (cnt == 0) {
                    remove_duplicate(w);
                    save_narrow_hits(t, w, &b1, thr, IS);
                    cut_tail(w, z);
                    stack0.push_back(w);
                    pending_list[pos - 1] = nullptr;
                }
                ent_free(u);
            } else if (cnt) {
                if (!u->array.empty()) {
                    pending_list.push_back(u);
                    slot.first = (int)pending_list.size();
                } else {
                    ent_free(u);
                }
            } else {
                save_narrow_hits(t, u, &b1, thr, IS);
                cut_tail(u, z);
                stack0.push_back(u);
            }
        }
        ent_free(v);
    }
    for (Entry* e : pending_list)
        delete e;
    for (Entry* e : pool)
        delete e;

    if ((int64_t)b1.size() > b1_cap) {
        *b1_n = (int64_t)b1.size();
        return -1;
    }
    std::memcpy(b1_out, b1.data(), b1.size() * sizeof(CHit));
    *b1_n = (int64_t)b1.size();
    return 0;
}

}  // extern "C"
