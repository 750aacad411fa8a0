"""BWA-SW long-read engine (bwtsw2_*), scalar-exact implementation.

SW between the prefix DAG of the read (a per-read light FM-index, bwt_lite)
and the prefix trie of the genome (the main FM-index): explicit stack of
per-target-interval entries carrying DP cells, Z-best heap pruning,
connectivity-merged traversal, narrow-hit capture, chaining filter, left and
right extension, CIGAR via banded global DP, adaptive per-read T/band, and
the print_hits SAM output (bwtsw2_core.c, bwtsw2_chain.c, bwtsw2_aux.c).

This is the host reference engine (bit-identical SAM vs `bwa bwasw`); the
extension/DP stages are the designated Pallas offload for long-read batches
(SURVEY §2.5, §5.7).
"""

import math

import numpy as np

from ..refmodel.fm_scalar import ScalarFm


class _NativeOccFm(ScalarFm):
    """ScalarFm with the hot occ4/two_occ4 answered by the native kernel
    (bit-exact — cross-checked in test_native; the pure-Python ScalarFm
    remains the independent oracle)."""

    def __init__(self, fm):
        super().__init__(fm.bwt, fm.primary, fm.l2, fm.seq_len, fm.sa,
                         fm.sa_intv)
        from ..index.native import OccNative
        self._occ = OccNative(fm.bwt, fm.primary, fm.l2, fm.seq_len)

    def occ4(self, k):
        return self._occ.occ4(k & 0xFFFFFFFF)

    def two_occ4(self, k, l):
        return self._occ.two_occ4(k & 0xFFFFFFFF, l & 0xFFFFFFFF)


def _fast_fm(fm):
    from ..index import native as native_mod
    if native_mod._load() is not None:
        return _NativeOccFm(fm)
    return ScalarFm(fm.bwt, fm.primary, fm.l2, fm.seq_len, fm.sa,
                    fm.sa_intv)
from ..refmodel.stdaln_scalar import aln_global_core, path2cigar32, AlnParam
from ..refmodel.extend_scalar import aln_extend_core
from ..utils.ksort import introsort, ksmall, heapadjust
from ..index.pack import NT4

MINUS_INF = -0x3FFFFFFF
MASK_LEVEL = 0.90

NT_COMP = {c: r for c, r in zip("ACGTNacgtn-", "TGCANtgcan-")}


class Bsw2Opt:
    """bsw2opt_t defaults (bsw2_init_opt, bwtsw2_aux.c:48-57)."""

    def __init__(self):
        self.a = 1
        self.b = 3
        self.q = 5
        self.r = 2
        self.t = 30
        self.bw = 50
        self.z = 1
        self.is_ = 3
        self.t_seeds = 5
        self.hard_clip = 0
        self.mask_level = np.float32(0.50)
        self.yita = 5.5
        self.coef = 5.5
        self.qr = self.q + self.r
        self.chunk_size = 10000000

    def copy(self):
        import copy
        return copy.copy(self)


class Bwtl:
    """bwtl_t (bwt_lite.c:9-54): full-SA FM-index of one read."""

    def __init__(self, seq):
        from ..index.sa import suffix_array

        n = len(seq)
        self.seq_len = n
        sa = suffix_array(np.asarray(seq, dtype=np.uint8))
        self.sa = np.concatenate(([n], sa)).astype(np.int64)
        s = np.zeros(n + 1, dtype=np.uint8)
        self.primary = 0
        for i in range(n + 1):
            if self.sa[i] == 0:
                self.primary = i
            else:
                s[i] = seq[self.sa[i] - 1]
        for i in range(self.primary, n):
            s[i] = s[i + 1]
        self.bwt = s[:n]
        # occ checkpoints every 16
        self.occ16 = np.zeros(((n + 15) // 16, 4), dtype=np.int64)
        c = np.zeros(4, dtype=np.int64)
        for i in range(n):
            if i % 16 == 0:
                self.occ16[i // 16] = c
            c[self.bwt[i]] += 1
        self.L2 = np.zeros(5, dtype=np.int64)
        self.L2[1:] = np.cumsum(c)
        # cumulative occ per position (scalar convenience; occ(k) inclusive)
        self.cum = np.zeros((n + 1, 4), dtype=np.int64)
        for i in range(n):
            self.cum[i + 1] = self.cum[i]
            self.cum[i + 1][self.bwt[i]] += 1

    def occ4(self, k):
        """bwtl_occ4 semantics (k inclusive row index; -1 → zeros)."""
        if k == -1 or k == 0xFFFFFFFF:
            return np.zeros(4, dtype=np.int64)
        if k == self.seq_len:
            return (self.L2[1:5] - self.L2[0:4]).copy()
        if k >= self.primary:
            k -= 1
        return self.cum[k + 1].copy()

    def two_occ4(self, k, l):
        return self.occ4(k), self.occ4(l)


class Cell:
    __slots__ = ("qk", "ql", "I", "D", "G", "pj", "qlen", "tlen", "ppos",
                 "upos", "cpos")

    def __init__(self):
        self.qk = 0
        self.ql = 0
        self.I = MINUS_INF
        self.D = MINUS_INF
        self.G = MINUS_INF
        self.pj = 0
        self.qlen = 0
        self.tlen = 0
        self.ppos = -1
        self.upos = -1
        self.cpos = [-1, -1, -1, -1]


class Entry:
    __slots__ = ("tk", "tl", "array")

    def __init__(self, tk=0, tl=0):
        self.tk = tk
        self.tl = tl
        self.array = []


class Hit:
    """bsw2hit_t."""

    __slots__ = ("k", "l", "flag", "n_seeds", "len", "G", "G2", "beg", "end")

    def __init__(self):
        self.k = 0
        self.l = 0
        self.flag = 0
        self.n_seeds = 0
        self.len = 0
        self.G = 0
        self.G2 = 0
        self.beg = 0
        self.end = 0

    def copy(self):
        h = Hit.__new__(Hit)
        h.k = self.k
        h.l = self.l
        h.flag = self.flag
        h.n_seeds = self.n_seeds
        h.len = self.len
        h.G = self.G
        h.G2 = self.G2
        h.beg = self.beg
        h.end = self.end
        return h


def _hitG_lt(a, b):
    return a.G > b.G


def bsw2_connectivity(bwtl):
    """bsw2_connectivity (bwtsw2_core.c:87-120): in-degree count per
    (k,l) interval of the read's DAG."""
    h = {}
    stack = [(0, bwtl.seq_len)]
    while stack:
        k, l = stack.pop()
        cntk, cntl = bwtl.two_occ4(k - 1, l)
        for j in range(4):
            nk = int(bwtl.L2[j] + cntk[j] + 1)
            nl = int(bwtl.L2[j] + cntl[j])
            if nk > nl:
                continue
            key = (nk, nl)
            if key not in h:
                h[key] = 1
                stack.append(key)
            else:
                h[key] += 1
    return h


def cut_tail(u, T):
    """cut_tail (bwtsw2_core.c:122-145)."""
    if len(u.array) <= T:
        return
    a = [-p.G for p in u.array if p.ql and p.G > 0]
    if len(a) <= T:
        return
    x = -ksmall(a, T, lambda p, q: p < q)
    n = 0
    for p in u.array:
        if p.G == x:
            n += 1
        if p.G < x or (p.G == x and n >= T):
            p.qk = p.ql = 0
            p.G = 0
            if p.ppos >= 0:
                u.array[p.ppos].cpos[p.pj] = -1


def remove_duplicate(u):
    """remove_duplicate (bwtsw2_core.c:147-172)."""
    h = {}
    for i, p in enumerate(u.array):
        if p.ql == 0:
            continue
        key = (p.qk, p.ql)
        j = -1
        if key in h:
            vi, vG = h[key]
            if (vG & 0xFFFFFFFF) >= p.G:
                j = i
            else:
                j = vi
                h[key] = (i, p.G)
        else:
            h[key] = (i, p.G)
        if j >= 0:
            p2 = u.array[j]
            p2.qk = p2.ql = 0
            p2.G = 0
            if p2.ppos >= 0:
                u.array[p2.ppos].cpos[p2.pj] = -3
    return


def merge_entry(u, v):
    """merge_entry (bwtsw2_core.c:174-191): v appended to u with index
    fixups."""
    off = len(u.array)
    for p in v.array:
        if p.ppos >= 0:
            p.ppos += off
        for d in range(4):
            if p.cpos[d] >= 0:
                p.cpos[d] += off
    u.array.extend(v.array)


def save_hits(bwtl, thres, hits, u):
    """save_hits (bwtsw2_core.c:211-233).  hits: list[2*seq_len] of Hit."""
    for p in u.array:
        if p.G < thres:
            continue
        for k in range(u.tk, u.tl + 1):
            beg = int(bwtl.sa[k]) if k else -1
            end = beg + p.tlen
            q = None
            if p.G > hits[beg * 2].G:
                hits[beg * 2 + 1] = hits[beg * 2]
                q = hits[beg * 2] = Hit()
            elif p.G > hits[beg * 2 + 1].G:
                q = hits[beg * 2 + 1] = Hit()
            if q is not None:
                q.k = p.qk
                q.l = p.ql
                q.len = p.qlen
                q.G = p.G
                q.beg = beg
                q.end = end
                q.G2 = 0 if q.k == q.l else q.G
                q.flag = q.n_seeds = 0


def save_narrow_hits(bwtl, u, b1, t, IS):
    """save_narrow_hits (bwtsw2_core.c:236-258)."""
    for p in u.array:
        if p.G >= t and p.ql - p.qk + 1 <= IS:
            q = Hit()
            q.k = p.qk
            q.l = p.ql
            q.len = p.qlen
            q.G = p.G
            q.G2 = 0
            q.beg = int(bwtl.sa[u.tk])
            q.end = q.beg + p.tlen
            q.flag = 0
            b1.append(q)
            p.qk = p.ql = 0
            p.G = 0
            if p.ppos >= 0:
                u.array[p.ppos].cpos[p.pj] = -3


def resolve_duphits(fm, b, IS):
    """bsw2_resolve_duphits (bwtsw2_core.c:261-327).  fm: ScalarFm genome
    index or None.  b: list of Hit (mutated)."""
    if not b:
        return b
    if fm is not None:
        # collect all SA rows first: one native invPsi batch walk instead
        # of a Python walk per row (values identical; expansion order kept)
        rows = []
        for p in b:
            if p.l - p.k + 1 <= IS:
                rows.extend(range(p.k, p.l + 1))
            elif p.G > 0:
                rows.append(p.k)
        vals = None
        from ..index.native import bwt_sa_batch
        if rows:
            vals = bwt_sa_batch(fm.bwt, fm.primary, fm.L2, fm.seq_len,
                                fm.sa_arr, fm.sa_intv,
                                np.asarray(rows, dtype=np.uint32))
        if vals is None:
            vals = [fm.sa(k) for k in rows]
        else:
            vals = [int(v) for v in vals]
        new = []
        vi = 0
        for p in b:
            if p.l - p.k + 1 <= IS:
                for k in range(p.k, p.l + 1):
                    h = p.copy()
                    h.k = vals[vi]
                    vi += 1
                    h.l = 0
                    new.append(h)
            elif p.G > 0:
                h = p.copy()
                h.k = vals[vi]
                vi += 1
                h.l = 0
                h.flag |= 1
                new.append(h)
        b = new
    introsort(b, _hitG_lt)
    n = len(b)
    stop = n
    i = 1
    while i < n:
        p = b[i]
        if p.G == 0:
            stop = i
            break
        for j in range(i):
            q = b[j]
            compatible = True
            if q.G == 0:
                continue
            if p.l == 0 and q.l == 0:
                qol = min(p.end, q.end) - max(p.beg, q.beg)
                if qol < 0:
                    qol = 0
                if (np.float32(qol) / np.float32(p.end - p.beg)
                        > np.float32(MASK_LEVEL)
                        or np.float32(qol) / np.float32(q.end - q.beg)
                        > np.float32(MASK_LEVEL)):
                    tol = min(p.k + p.len, q.k + q.len) - max(p.k, q.k)
                    if (tol / p.len > MASK_LEVEL
                            or tol / q.len > MASK_LEVEL):
                        compatible = False
            if not compatible:
                p.G = 0
                break
        i += 1
    return [h for h in b[:stop] if h.G != 0]


def resolve_query_overlaps(b, mask_level, rng):
    """bsw2_resolve_query_overlaps (bwtsw2_core.c:329-378)."""
    if not b:
        return b
    introsort(b, _hitG_lt)
    G0 = b[0].G
    i = 1
    while i < len(b) and b[i].G == G0:
        i += 1
    j = int(i * rng.drand48())
    if j:
        b[0], b[j] = b[j], b[0]
    n = len(b)
    stop = n
    for i in range(1, n):
        p = b[i]
        all_compat = True
        if p.G == 0:
            stop = i
            break
        for j in range(i):
            q = b[j]
            if q.G == 0:
                continue
            tol = 0
            qol = min(p.end, q.end) - max(p.beg, q.beg)
            if qol < 0:
                qol = 0
            if p.l == 0 and q.l == 0:
                tol = min(p.k + p.len, q.k + q.len) - max(p.k, q.k)
                if tol < 0:
                    tol = 0
            fol = np.float32(qol) / min(p.end - p.beg, q.end - q.beg)
            compatible = fol < mask_level or (
                tol > 0 and qol < p.end - p.beg and qol < q.end - q.beg)
            if not compatible:
                if q.G2 < p.G:
                    q.G2 = p.G
                all_compat = False
        if not all_compat:
            p.G = 0
    return [h for h in b[:stop] if h.G != 0]


def fill_cell(opt, match_score, c):
    """fill_cell (bwtsw2_core.c:401-413).  c = [cur, I-src, D-src, G-src]."""
    G = c[3].G + match_score if c[3] is not None else MINUS_INF
    if c[1] is not None:
        c[0].I = c[1].I - opt.r if c[1].I > c[1].G - opt.q \
            else c[1].G - opt.qr
        if c[0].I > G:
            G = c[0].I
    else:
        c[0].I = MINUS_INF
    if c[2] is not None:
        c[0].D = c[2].D - opt.r if c[2].D > c[2].G - opt.q \
            else c[2].G - opt.qr
        if c[0].D > G:
            G = c[0].D
    else:
        c[0].D = MINUS_INF
    c[0].G = G
    return G


def _bsw2_core_native(opt, target, query_fm):
    """Native DAG x trie core (native/bsw2core.cpp, bit-exact with the
    Python loop below); returns (hits_list, b1_list) or None."""
    from ..index import native as native_mod
    lib = native_mod._load()
    if lib is None:
        return None
    n = target.seq_len
    t_cum = np.ascontiguousarray(target.cum, dtype=np.int32).reshape(-1)
    t_sa = np.ascontiguousarray(target.sa, dtype=np.int64)
    t_l2 = np.ascontiguousarray(target.L2, dtype=np.int64)
    g_l2 = np.ascontiguousarray(query_fm.L2, dtype=np.uint32)
    g_bwt = np.ascontiguousarray(query_fm.bwt, dtype=np.uint32)
    hits_out = np.zeros((2 * n, 9), dtype=np.int64)
    cap = 16 * n + 64
    b1_out = np.zeros((cap, 9), dtype=np.int64)
    b1_n = np.zeros(1, dtype=np.int64)
    rc = lib.bsw2_core_u32(
        t_sa, t_l2, t_cum, int(target.primary), int(n),
        g_bwt, np.uint32(query_fm.primary), g_l2,
        np.uint32(query_fm.seq_len),
        int(opt.a), int(opt.b), int(opt.q), int(opt.r), int(opt.bw),
        int(opt.z), int(opt.t), int(opt.is_),
        hits_out.reshape(-1), b1_out.reshape(-1), cap, b1_n)
    if rc != 0:
        return None

    def mk(row):
        h = Hit.__new__(Hit)
        (h.k, h.l, h.flag, h.n_seeds, h.len, h.G, h.G2, h.beg,
         h.end) = row
        return h

    hits = [mk(r) for r in hits_out.tolist()]
    b1 = [mk(r) for r in b1_out[:int(b1_n[0])].tolist()]
    return hits, b1


def bsw2_core(opt, target, query_fm):
    """bsw2_core (bwtsw2_core.c:429-594).  target: Bwtl (read);
    query_fm: ScalarFm (genome).  Returns (b_hits_list, b1_narrow_list)."""
    nat = _bsw2_core_native(opt, target, query_fm)
    if nat is not None:
        hits, b1 = nat
        b = resolve_duphits(query_fm, hits, opt.is_)
        b1 = resolve_duphits(query_fm, b1, opt.is_)
        return b, b1
    chash = bsw2_connectivity(target)
    score_mat = [[opt.a if i == j else -opt.b for j in range(4)]
                 for i in range(4)]
    stack0 = []
    pending = {}    # key -> Entry (slot id emulation via dict by interval)
    pending_list = []  # emulate kv index: 1-based positions
    n_pending = 0

    # init entry
    u0 = Entry(0, target.seq_len)
    x = Cell()
    x.G = 0
    x.qk = 0
    x.ql = query_fm.seq_len
    u0.array.append(x)
    stack0.append(u0)

    heap_size = opt.z
    hits = [Hit() for _ in range(target.seq_len * 2)]
    b1 = []

    chash_val = {k: [0, v] for k, v in chash.items()}  # [pending_pos, cnt]

    while stack0:
        v = stack0.pop()
        old_n = len(v.array)
        for p in v.array:
            if p.ql == 0:
                continue
            if p.tlen - p.qlen > opt.bw or p.qlen - p.tlen > opt.bw:
                p.qk = p.ql = 0
                if p.ppos >= 0:
                    v.array[p.ppos].cpos[p.pj] = -5

        tcntk, tcntl = target.two_occ4(v.tk - 1, v.tl)
        for tj in range(4):
            k = int(target.L2[tj] + tcntk[tj] + 1)
            l = int(target.L2[tj] + tcntl[tj])
            if k > l:
                continue
            slot = chash_val[(k, l)]
            slot[1] -= 1
            u = Entry(k, l)
            heap = [0] * heap_size
            csm = score_mat[tj]
            i = 0
            while i < len(v.array):
                p = v.array[i]
                if p.ql == 0:
                    i += 1
                    continue
                x = Cell()
                is_added = False
                p.upos = x.upos = -1
                if p.ppos >= 0:
                    par = v.array[p.ppos]
                    c1 = u.array[par.upos] if par.upos >= 0 else None
                    if fill_cell(opt, csm[p.pj], [x, c1, p, par]) > 0:
                        x.ppos = par.upos
                        p.upos = len(u.array)
                        u.array.append(x)
                        if x.ppos >= 0:
                            u.array[x.ppos].cpos[p.pj] = p.upos
                        is_added = True
                else:
                    x.D = p.D - opt.r if p.D > p.G - opt.q else p.G - opt.qr
                    if x.D > 0:
                        x.G = x.D
                        x.I = MINUS_INF
                        x.ppos = -1
                        p.upos = len(u.array)
                        u.array.append(x)
                        is_added = True
                if is_added:
                    x.cpos = [-1, -1, -1, -1]
                    x.pj = p.pj
                    x.qk = p.qk
                    x.ql = p.ql
                    x.qlen = p.qlen
                    x.tlen = p.tlen + 1
                    if x.G > -heap[0]:
                        heap[0] = -x.G
                        heapadjust(0, heap_size, heap, lambda a, b: a < b)
                if (x.G > opt.qr and x.G >= -heap[0]) or i < old_n:
                    if -1 in p.cpos:
                        qcntk, qcntl = query_fm.two_occ4(
                            (p.qk - 1) & 0xFFFFFFFF, p.ql)
                        for qj in range(4):
                            if p.cpos[qj] != -1:
                                continue
                            nk = query_fm.L2[qj] + int(qcntk[qj]) + 1
                            nl = query_fm.L2[qj] + int(qcntl[qj])
                            if nk > nl:
                                p.cpos[qj] = -2
                                continue
                            y = Cell()
                            y.G = y.I = y.D = MINUS_INF
                            y.qk = nk
                            y.ql = nl
                            y.pj = qj
                            y.qlen = p.qlen + 1
                            y.ppos = i
                            y.tlen = p.tlen
                            y.cpos = [-1, -1, -1, -1]
                            p.cpos[qj] = len(v.array)
                            v.array.append(y)
                i += 1
            if u.array:
                save_hits(target, opt.t, hits, u)
            # push u to stack or pending (bwtsw2_core.c:546-580)
            pos, cnt = slot
            if pos:
                w = pending_list[pos - 1]
                if u.array:
                    if len(w.array) < len(u.array):
                        pending_list[pos - 1], u = u, w
                        w = pending_list[pos - 1]
                    merge_entry(w, u)
                if cnt == 0:
                    remove_duplicate(w)
                    save_narrow_hits(target, w, b1, opt.t, opt.is_)
                    cut_tail(w, opt.z)
                    stack0.append(w)
                    pending_list[pos - 1] = None
                    n_pending -= 1
            elif cnt:
                if u.array:
                    n_pending += 1
                    pending_list.append(u)
                    slot[0] = len(pending_list)
            else:
                save_narrow_hits(target, u, b1, opt.t, opt.is_)
                cut_tail(u, opt.z)
                stack0.append(u)

    # final SA→coordinate resolution (bwtsw2_core.c:585-586)
    b = resolve_duphits(query_fm, hits, opt.is_)
    b1 = resolve_duphits(query_fm, b1, opt.is_)
    return b, b1


# ---------------------------------------------------------------------------
# bwtsw2_chain.c — chaining filter
# ---------------------------------------------------------------------------

class _Chain:
    __slots__ = ("tbeg", "tend", "qbeg", "qend", "flag", "idx", "chain")

    def __init__(self):
        self.tbeg = self.tend = 0
        self.qbeg = self.qend = 0
        self.flag = 0
        self.idx = 0
        self.chain = -1


def _hsaip_lt(a, b):
    return a.qbeg < b.qbeg


def _chaining(opt, shift, z, chain):
    """chaining (bwtsw2_chain.c:16-42)."""
    introsort(z, _hsaip_lt)
    m = 0
    for p in z:
        k = m - 1
        while k >= 0:
            q = chain[shift_idx(chain, k)] if False else chain[k]
            x = p.qbeg - q.qbeg
            y = p.tbeg - q.tbeg
            if y > 0 and x - y <= opt.bw and y - x <= opt.bw:
                if p.qend > q.qend:
                    q.qend = p.qend
                if p.tend > q.tend:
                    q.tend = p.tend
                q.chain += 1
                p.chain = shift + k
                break
            k -= 1
        if k < 0:
            c = _Chain()
            c.tbeg, c.tend = p.tbeg, p.tend
            c.qbeg, c.qend = p.qbeg, p.qend
            c.flag = p.flag
            c.chain = 1
            c.idx = p.chain = shift + m
            chain.append(c)
            m += 1
    return m


def chain_filter(opt, length, b):
    """bsw2_chain_filter (bwtsw2_chain.c:44-107).  b = [hits0, hits1]
    (narrow hits of the two strands); returns filtered lists."""
    n = [len(b[0]), len(b[1])]
    if n[0] + n[1] == 0:
        return b
    z = [[], []]
    for k in range(2):
        for i, p in enumerate(b[k]):
            q = _Chain()
            q.flag = k
            q.idx = i
            q.tbeg, q.tend = p.k, p.k + p.len
            q.chain = -1
            q.qbeg, q.qend = p.beg, p.end
            z[k].append(q)
    chain = []
    m0 = _chaining(opt, 0, z[0], chain)
    chain1 = []
    m1 = _chaining(opt, m0, z[1], chain1)
    for p in chain1:
        tmp = p.qbeg
        p.qbeg = length - p.qend
        p.qend = length - tmp
    chain = chain + chain1
    flag = [0] * (m0 + m1)
    introsort(chain, _hsaip_lt)
    for k in range(1, m0 + m1):
        p = chain[k]
        for j in range(k):
            q = chain[j]
            if flag[q.idx]:
                continue
            if q.qend >= p.qend and q.chain > p.chain * opt.t_seeds * 2:
                flag[p.idx] = 1
                break
    for k in range(2):
        for p in z[k]:
            if flag[p.chain]:
                b[k][p.idx].G = 0
    for k in range(2):
        b[k] = [h for h in b[k] if h.G]
    return b


def shift_idx(chain, k):  # helper kept trivial for clarity
    return k


# ---------------------------------------------------------------------------
# bwtsw2_aux.c — extension, cigar, merging, SAM
# ---------------------------------------------------------------------------

def _gen_ap(opt):
    """__gen_ap (bwtsw2_aux.c:69-76): 5x5 matrix, gap_end = r."""
    m = np.full((5, 5), -opt.b, dtype=np.int64)
    for i in range(4):
        m[i, i] = opt.a
    return AlnParam(opt.q, opt.r, opt.r, m, 5, opt.bw)


def _hit_end_lt(a, b):
    return a.end > b.end


def _left_target(opt, p, lq, pac, l_pac, is_rev, rquery):
    """Upstream-reference window + query segment for one left extension
    (bwtsw2_aux.c:96-117).  Depends only on p's own pre-extension fields."""
    lt = ((p.beg + 1) // 2 * opt.a + opt.r) // opt.r + lq
    if lt > p.k:
        lt = p.k
    # upstream ref, reversed (k = p.k-1 down to 1; k=0 not considered,
    # the C FIXME)
    idxs = np.arange(p.k - 1, max(p.k - 1 - lt, 0), -1)
    if is_rev:
        tgt = pac[l_pac - 1 - idxs] if len(idxs) else np.zeros(0, np.uint8)
    else:
        tgt = pac[idxs] if len(idxs) else np.zeros(0, np.uint8)
    qseg = rquery[lq - p.beg:lq] if p.beg else rquery[lq:lq]
    return tgt, qseg


def extend_left(opt, b, query_seq, lq, pac, l_pac, is_rev, use_device=True):
    """bsw2_extend_left (bwtsw2_aux.c:80-129).  b: list of Hit.

    The per-hit extension inputs depend only on that hit's own
    pre-extension fields, so all extensions run as ONE device batch
    upfront (ops.dp.extend_batch); the coverage/n_seeds bookkeeping that
    decides WHICH results apply still walks hits in the C's order."""
    par = _gen_ap(opt)
    introsort(b, _hit_end_lt)
    rquery = query_seq[::-1]
    ext_res = {}
    if use_device and b:
        jobs = []
        idxs_d = []
        for i, p in enumerate(b):
            if p.l or p.k == 0:
                continue
            tgt, qseg = _left_target(opt, p, lq, pac, l_pac, is_rev, rquery)
            jobs.append((tgt, qseg))
            idxs_d.append(i)
        if jobs:
            from ..ops.dp import extend_batch
            for i, r in zip(idxs_d, extend_batch(
                    jobs, par, [b[i].G for i in idxs_d])):
                ext_res[i] = r
    for i, p in enumerate(b):
        p.n_seeds = 1
        if p.l or p.k == 0:
            continue
        score = 0
        for j in range(i):
            q = b[j]
            if q.beg <= p.beg and q.k <= p.k and q.k + q.len >= p.k + p.len:
                if q.n_seeds < (1 << 14) - 2:
                    q.n_seeds += 1
                score += 1
        if score:
            continue
        if i in ext_res:
            score, ei, ej = ext_res[i]
        else:
            tgt, qseg = _left_target(opt, p, lq, pac, l_pac, is_rev, rquery)
            score, ei, ej, _ = aln_extend_core(tgt, qseg, par, p.G,
                                               want_path=False)
        if score > p.G:
            p.G = score
            p.len += ei
            p.beg -= ej
            p.k -= ei


def extend_rght(opt, b, query_seq, lq, pac, l_pac, is_rev,
                use_device=True):
    """bsw2_extend_rght (bwtsw2_aux.c:131-164): hits are independent, so
    the whole list extends as one device batch."""
    par = _gen_ap(opt)
    jobs = []
    live = []
    for p in b:
        if p.l:
            continue
        lt = ((lq - p.beg + 1) // 2 * opt.a + opt.r) // opt.r + lq
        hi = min(p.k + lt, l_pac)
        if is_rev:
            idxs = np.arange(p.k, hi)
            tgt = pac[l_pac - 1 - idxs] if len(idxs) else np.zeros(0, np.uint8)
        else:
            tgt = pac[p.k:hi]
        jobs.append((tgt, query_seq[p.beg:lq]))
        live.append(p)
    if not jobs:
        return
    if use_device:
        from ..ops.dp import extend_batch
        results = extend_batch(jobs, par, [1] * len(jobs))
    else:
        results = [aln_extend_core(t, q, par, 1, want_path=False)[:3]
                   for t, q in jobs]
    for p, (score, ei, ej) in zip(live, results):
        if score >= p.G:
            p.G = score
            p.len = ei
            p.end = ej + p.beg


def gen_cigar(opt, lq, seqs, pac, b, use_device=True):
    """gen_cigar (bwtsw2_aux.c:167-216).  Returns list of cigars (op,len).
    All hits' banded-global DPs run as one device batch."""
    par = _gen_ap(opt)
    cigars = [None] * len(b)
    jobs = []
    metas = []
    for i, p in enumerate(b):
        if p.l:
            cigars[i] = []
            continue
        beg = lq - p.end if (p.flag & 0x10) else p.beg
        end = lq - p.beg if (p.flag & 0x10) else p.end
        query = seqs[1 if (p.flag & 0x10) else 0][beg:end]
        target = pac[p.k:p.k + p.len]
        jobs.append((target, query))
        metas.append((i, p, beg, end))
    if use_device and jobs:
        from ..ops.dp import banded_global_batch
        paths = [path for _, path in banded_global_batch(jobs, par)]
    else:
        paths = [aln_global_core(t, q, par)[1] for t, q in jobs]
    for (i, p, beg, end), path in zip(metas, paths):
        cig = path2cigar32(path)
        if beg != 0 or end < lq:
            if beg != 0:
                cig = [(4, beg)] + cig
            if end < lq:
                cig = cig + [(4, lq - end)]
        cigars[i] = cig
    return cigars


def merge_hits(b, l, is_reverse):
    """merge_hits (bwtsw2_aux.c:230-250): b[1] folded into b[0]."""
    for p in b[1]:
        if is_reverse:
            x = p.beg
            p.beg = l - p.end
            p.end = l - x
            p.flag |= 0x10
        b[0].append(p)
    b[1] = []
    return b[0]


def flag_fr(b):
    """flag_fr (bwtsw2_aux.c:279-300)."""
    for p in b[0]:
        p.flag |= 0x10000
    for p in b[1]:
        p.flag |= 0x20000
    for p in b[0]:
        for q in b[1]:
            if (q.beg == p.beg and q.end == p.end and q.k == p.k
                    and q.len == p.len and q.G == p.G):
                q.flag |= 0x30000
                p.flag |= 0x30000
                break


def aln1_core(opt, bns, pac, target_fm, l, seqs, is_rev, rng):
    """bsw2_aln1_core (bwtsw2_aux.c:252-276)."""
    bb = []
    for k in range(2):
        query = Bwtl(seqs[k])
        hits_all, hits_narrow = bsw2_core(opt, query, target_fm)
        bb.append([hits_all, hits_narrow])
    b = [bb[0][1], bb[1][1]]
    b = chain_filter(opt, l, b)
    bb[0][1], bb[1][1] = b[0], b[1]
    out = []
    for k in range(2):
        extend_left(opt, bb[k][1], seqs[k], l, pac, bns.l_pac, is_rev)
        merged = merge_hits([bb[k][0], bb[k][1]], l, 0)
        merged = resolve_duphits(None, merged, 0)
        extend_rght(opt, merged, seqs[k], l, pac, bns.l_pac, is_rev)
        out.append(merged)
    merged = merge_hits(out, l, 1)
    merged = resolve_query_overlaps(merged, opt.mask_level, rng)
    return merged


def fix_cigar(bns, p, cigar):
    """fix_cigar (bwtsw2_aux.c:312-382): split alignments bridging two
    reference sequences.  Mutates p; returns new cigar."""
    from . import samse as se

    seqid, _ = se.coor_pac2real(bns, p.k, p.len)
    coor = p.k - bns.anns[seqid].offset
    refl = bns.anns[seqid].length
    x, y = coor, 0
    for op, ln in cigar:
        if op in (1, 4, 5):
            y += ln
        elif op == 2:
            x += ln
        else:
            x += ln
            y += ln
    lq = y
    if x <= refl:
        return cigar
    nc = 0
    mq = [0, 0]
    nlen = [0, 0]
    cn = []
    kk = 0
    x, y = coor, 0
    for op, ln in cigar:
        if op in (4, 5, 1):
            y += ln
            cn.append((op, ln))
        elif op == 2:
            if x + ln >= refl and nc == 0:
                cn.append((4, lq - y))
                nc = len(cn)
                cn.append((4, y))
                kk = p.k + (x + ln - refl)
                nlen[0] = x - coor
                nlen[1] = p.len - nlen[0] - ln
            else:
                cn.append((op, ln))
            x += ln
        elif op == 0:
            if x + ln >= refl and nc == 0:
                cn.append((0, refl - x))
                cn.append((4, lq - y - (refl - x)))
                nc = len(cn)
                mq[0] += refl - x
                cn.append((4, y + (refl - x)))
                if x + ln - refl:
                    cn.append((0, x + ln - refl))
                mq[1] += x + ln - refl
                kk = bns.anns[seqid].offset + refl
                nlen[0] = refl - coor
                nlen[1] = p.len - nlen[0]
            else:
                cn.append((op, ln))
                mq[1 if nc else 0] += ln
            x += ln
            y += ln
    if mq[0] > mq[1]:
        p.len = nlen[0]
        return cn[:nc]
    p.k = kk
    p.len = nlen[1]
    return cn[nc:]


def print_hits(bns, opt, name, seq_str, qual_str, b, cigars):
    """print_hits (bwtsw2_aux.c:386-451) — returns SAM text chunk."""
    from . import samse as se

    out = []
    if b is None or len(b) == 0:
        line = "%s\t4\t*\t0\t0\t*\t*\t0\t0\t%s" % (name, seq_str)
        line += "\t%s" % qual_str if qual_str else "\t*"
        out.append(line + "\n")
        return "".join(out)
    lq = len(seq_str)
    for i, p in enumerate(b):
        seqid, coor, nn = -1, -1, 0
        cig = cigars[i]
        if p.l == 0:
            cig = cigars[i] = fix_cigar(bns, p, cig)
            seqid, nn = se.coor_pac2real(bns, p.k, p.len)
            coor = p.k - bns.anns[seqid].offset
        line = "%s\t%d" % (name, p.flag & 0x10)
        line += "\t%s\t%d" % (bns.anns[seqid].name if seqid >= 0 else "*",
                              coor + 1)
        if p.l == 0:
            c = np.float32(1.0)
            subo = p.G2 if p.G2 > opt.t else opt.t
            if (p.flag >> 16) in (1, 2):
                c = np.float32(c * np.float32(.5))
            if p.n_seeds < 2:
                c = np.float32(c * np.float32(.2))
            qual = int(float(c) * (p.G - subo) * (250.0 / p.G
                                                  + 0.03 / opt.a) + .499)
            if qual > 250:
                qual = 250
            if p.flag & 1:
                qual = 0
            line += "\t%d\t" % qual
            ops = "MIDNHHP" if opt.hard_clip else "MIDNSHP"
            line += "".join("%d%c" % (ln, ops[op]) for op, ln in cig)
        else:
            line += "\t0\t*"
        line += "\t*\t0\t0\t"
        beg, end = 0, lq
        if opt.hard_clip:
            if cig and cig[0][0] == 4:
                beg += cig[0][1]
            if cig and cig[-1][0] == 4:
                end -= cig[-1][1]
        if p.flag & 0x10:
            line += "".join(NT_COMP.get(seq_str[lq - 1 - j], "N")
                            for j in range(beg, end))
        else:
            line += seq_str[beg:end]
        if qual_str:
            line += "\t"
            if p.flag & 0x10:
                line += "".join(qual_str[lq - 1 - j] for j in range(beg, end))
            else:
                line += qual_str[beg:end]
        else:
            line += "\t*"
        line += "\tAS:i:%d\tXS:i:%d\tXF:i:%d\tXE:i:%d\tXN:i:%d" % (
            p.G, p.G2, p.flag >> 16, p.n_seeds, nn)
        if p.l:
            line += "\tXI:i:%d" % (p.l - p.k + 1)
        out.append(line + "\n")
    return "".join(out)


def aln_one(opt0, bns, pac, fms, name, read_str, qual_str, rng):
    """bsw2_aln_core body for one read (bwtsw2_aux.c:460-527).
    fms = (fwd ScalarFm, rev ScalarFm).  Returns SAM text."""
    l = len(read_str)
    opt = opt0.copy()
    if opt.t < math.log(l) * opt.coef:
        opt.t = int(math.log(l) * opt.coef + .499)
    k = (l * opt.a - 2 * opt.q) // (2 * opt.r + opt.a)
    i = (l * opt.a - opt.a - opt.t) // opt.r
    if k > i:
        k = i
    if k < 1:
        k = 1
    opt.bw = min(opt0.bw, k)

    seq = np.zeros(l, dtype=np.uint8)      # seq[0]
    seq1 = np.zeros(l, dtype=np.uint8)     # seq[1] (revcomp)
    rseq0 = np.zeros(l, dtype=np.uint8)
    rseq1 = np.zeros(l, dtype=np.uint8)
    n_amb = 0
    for i in range(l):
        c = int(NT4[ord(read_str[i])])
        if c >= 4:
            c = int(rng.drand48() * 4)
            n_amb += 1
        seq[i] = c
        seq1[l - 1 - i] = 3 - c
        rseq0[l - 1 - i] = c
        rseq1[i] = 3 - c
    if l - n_amb < opt.t:
        return print_hits(bns, opt, name, read_str, qual_str, None, None)

    b0 = aln1_core(opt, bns, pac, fms[0], l, (seq, seq1), 0, rng)
    need_rev = any(h.n_seeds < opt.t_seeds for h in b0)
    if need_rev:
        b1 = aln1_core(opt, bns, pac, fms[1], l, (rseq0, rseq1), 1, rng)
        for p in b1:
            x = p.beg
            p.beg = l - p.end
            p.end = l - x
            if p.l == 0:
                p.k = bns.l_pac - (p.k + p.len)
        pair = [b0, b1]
        flag_fr(pair)
        b0 = merge_hits(pair, l, 0)
        b0 = resolve_duphits(None, b0, 0)
        b0 = resolve_query_overlaps(b0, opt.mask_level, rng)
    cigars = gen_cigar(opt, l, (seq, seq1), pac, b0)
    return print_hits(bns, opt, name, read_str, qual_str, b0, cigars)


def _adjusted_opt(opt0, l):
    """Per-read t/bw adjustment (bwtsw2_aux.c:472-485); print_hits reads
    the adjusted t for the mapQ subo floor."""
    opt = opt0.copy()
    if opt.t < math.log(l) * opt.coef:
        opt.t = int(math.log(l) * opt.coef + .499)
    k = (l * opt.a - 2 * opt.q) // (2 * opt.r + opt.a)
    i = (l * opt.a - opt.a - opt.t) // opt.r
    if k > i:
        k = i
    if k < 1:
        k = 1
    opt.bw = min(opt0.bw, k)
    return opt


def _bwasw_native_batch(index, reads, opt, rng):
    """Whole-orbit native driver (native/bsw2aln.cpp): threaded rng-free
    alignment phase + sequential drand48 replay, bit-identical to the
    per-read Python path.  Returns list of SAM chunks or None."""
    import os

    from ..index import native as native_mod

    lib = native_mod._load()
    if lib is None or not hasattr(lib, "bsw2_aln_batch"):
        return None
    if any(len(s) == 0 for _, s, _ in reads):
        return None  # keep the Python path's exception behavior
    fwd, rev = index.fwd, index.rev
    codes = np.concatenate([
        NT4[np.frombuffer(s.encode(), dtype=np.uint8)] for _, s, _ in reads
    ]).astype(np.uint8)
    offs = np.zeros(len(reads) + 1, dtype=np.int64)
    np.cumsum([len(s) for _, s, _ in reads], out=offs[1:])
    iopt = np.array([opt.a, opt.b, opt.q, opt.r, opt.t, opt.bw, opt.z,
                     opt.is_, opt.t_seeds, opt.hard_clip], dtype=np.int32)
    state = np.array([rng.x], dtype=np.uint64)
    hits_cap = 64 * len(reads) + 1024
    hit_cnt = np.zeros(len(reads), dtype=np.int64)
    hits = np.zeros((hits_cap, 9), dtype=np.int64)
    cig_cap = 8192 * len(reads) + 65536
    cig = np.zeros((cig_cap, 2), dtype=np.int32)
    cig_cnt = np.zeros(hits_cap, dtype=np.int64)
    nth = int(os.environ.get("NABWA_BWASW_THREADS",
                             os.environ.get("NABWA_THREADS", "0")))
    htot = lib.bsw2_aln_batch(
        np.ascontiguousarray(fwd.bwt, dtype=np.uint32),
        np.uint32(fwd.primary),
        np.ascontiguousarray(fwd.l2, dtype=np.uint32),
        np.uint32(fwd.seq_len),
        np.ascontiguousarray(fwd.sa, dtype=np.uint32),
        np.int32(fwd.sa_intv),
        np.ascontiguousarray(rev.bwt, dtype=np.uint32),
        np.uint32(rev.primary),
        np.ascontiguousarray(rev.l2, dtype=np.uint32),
        np.uint32(rev.seq_len),
        np.ascontiguousarray(rev.sa, dtype=np.uint32),
        np.int32(rev.sa_intv),
        np.ascontiguousarray(index.pac, dtype=np.uint8),
        np.int64(index.bns.l_pac),
        codes, offs, np.int64(len(reads)),
        iopt, np.float32(opt.mask_level), float(opt.coef),
        state, np.int32(nth),
        hit_cnt, hits.reshape(-1), np.int64(hits_cap),
        cig.reshape(-1), np.int64(cig_cap), cig_cnt)
    if htot < 0:
        return None
    rng.x = int(state[0])
    bns = index.bns
    out = []
    hi = 0
    ci = 0
    for ri, (name, seq_str, qual_str) in enumerate(reads):
        n = int(hit_cnt[ri])
        opt_l = _adjusted_opt(opt, len(seq_str))
        if n == 0:
            out.append(print_hits(bns, opt_l, name, seq_str, qual_str,
                                  None, None))
            continue
        b = []
        cigars = []
        for _ in range(n):
            row = hits[hi]
            h = Hit.__new__(Hit)
            (h.k, h.l, h.flag, h.n_seeds, h.len, h.G, h.G2, h.beg,
             h.end) = (int(row[0]), int(row[1]), int(row[2]), int(row[3]),
                       int(row[4]), int(row[5]), int(row[6]), int(row[7]),
                       int(row[8]))
            b.append(h)
            npairs = int(cig_cnt[hi])
            cigars.append([(int(op), int(ln))
                           for op, ln in cig[ci:ci + npairs]])
            ci += npairs
            hi += 1
        out.append(print_hits(bns, opt_l, name, seq_str, qual_str, b,
                              cigars))
    return out


def bwasw(index, reads, opt=None, rng=None):
    """Full bwasw over (name, seq, qual) tuples.  Returns SAM text
    (including @SQ header lines like bsw2_aln, bwtsw2_aux.c:606-607)."""
    from ..utils.rand48 import Rand48

    opt = opt or Bsw2Opt()
    rng = rng or Rand48(11)   # srand48(11), bwtsw2_main.c:19
    bns = index.bns
    pac = index.pac
    out = []
    for a in bns.anns:
        out.append("@SQ\tSN:%s\tLN:%d\n" % (a.name, a.length))
    reads = list(reads)
    import os
    if os.environ.get("NABWA_BWASW_OBJ") != "1":
        nat = _bwasw_native_batch(index, reads, opt, rng)
        if nat is not None:
            out.extend(nat)
            return "".join(out)
    fms = (_fast_fm(index.fwd), _fast_fm(index.rev))
    for name, seq_str, qual_str in reads:
        out.append(aln_one(opt, bns, pac, fms, name, seq_str, qual_str, rng))
    return "".join(out)
