"""sampe workflow — bwa_sai2sam_pe_core semantics (bwape.c:660-762).

Per chunk: SE hit selection (drand48-order faithful) + batched positions →
insert-size inference → candidate-position pairing sweep → mate rescue via
banded local SW → gapped refinement → interleaved SAM emission.  Outputs
byte-identical SAM vs reference `bwa sampe`.
"""

import math

import numpy as np

from ..constants import (BWA_TYPE_NO_MATCH, BWA_TYPE_UNIQUE, BWA_TYPE_REPEAT,
                         BWA_TYPE_MATESW, BWA_AVG_ERR, SAM_FPD, SAM_FR1,
                         SAM_FR2, SAM_FPP, BWA_PET_STD, BWA_PET_SOLID)
from ..refmodel.aln_scalar import cal_maxdiff
from ..refmodel.stdaln_scalar import ALN_PARAM_BWA, FROM_M, FROM_I, FROM_D, FROM_S
from ..refmodel.local_aln_scalar import aln_local_core
from ..refmodel.dfs_scalar import aln_score  # noqa: F401  (parity doc)
from . import samse as se

OUTLIER_BOUND = 2.0     # bwape.h:34
MIN_HASH_WIDTH = 1000   # bwape.h:31
SW_MIN_MATCH_LEN = 20   # bwape.h:36
SW_MIN_MAPQ = 17        # bwape.h:37

_NEG1 = 0xFFFFFFFF
_U64MAX = (1 << 64) - 1


def hash_64(key):
    """hash_64 (bwape.c:43-54), 64-bit wrapping."""
    M = _U64MAX
    key = (key + (~(key << 32) & M)) & M
    key ^= key >> 22
    key = (key + (~(key << 13) & M)) & M
    key ^= key >> 8
    key = (key + (key << 3)) & M
    key ^= key >> 15
    key = (key + (~(key << 27) & M)) & M
    key ^= key >> 31
    return key


def _clog(x):
    """C log(): log(0) = -inf instead of raising."""
    return -math.inf if x == 0.0 else math.log(x)


def _cint(x):
    """C (int) conversion of a double on x86: out-of-range/inf/nan
    saturate to INT_MIN via cvttsd2si."""
    if math.isnan(x) or math.isinf(x) or not (-2**31 <= x < 2**31):
        return -2**31
    return int(x)


class IsizeInfo:
    """isize_info_t (bwape.h:16-20)."""

    def __init__(self):
        self.avg = -1.0
        self.std = -1.0
        self.ap_prior = 0.0
        self.low = 0
        self.high = 0
        self.high_bayesian = 0


def infer_isize(states, ap_prior, L):
    """infer_isize (bwape.c:74-178).  states: (states0, states1)."""
    isizes = []
    max_len = 1
    for s0, s1 in zip(*states):
        if s0.mapQ >= 20 and s1.mapQ >= 20:
            if s0.pos < s1.pos:
                x = s1.pos + s1.len - s0.pos
            else:
                x = s0.pos + s0.len - s1.pos
            if x < 100000:
                isizes.append(x)
        max_len = max(max_len, s0.len, s1.len)
    return infer_isize_core(isizes, max_len, ap_prior, L)


def infer_isize_core(isizes, max_len, ap_prior, L):
    """infer_isize numeric core over the collected candidate lengths
    (also fed columnar by post_native.sampe_bytes)."""
    ii = IsizeInfo()
    tot = len(isizes)
    if tot < 20:
        return ii, -1
    isizes = np.sort(np.asarray(isizes, dtype=np.uint64))
    p25 = int(isizes[int(tot * 0.25 + 0.5)])
    p50 = int(isizes[int(tot * 0.50 + 0.5)])
    p75 = int(isizes[int(tot * 0.75 + 0.5)])
    tmp = int(p25 - OUTLIER_BOUND * (p75 - p25) + .499)
    ii.low = tmp if tmp > max_len else max_len
    ii.high = int(p75 + OUTLIER_BOUND * (p75 - p25) + .499)
    sel = isizes[(isizes >= ii.low) & (isizes <= ii.high)]
    n = len(sel)
    x = int(sel.sum())
    ii.avg = x / n
    # Sequential double accumulation in sorted order, starting from the C's
    # ii->std = -1.0 initialisation (bwape.c:84,125) — the rounding order is
    # part of the output contract (std feeds rescue windows and pairing).
    std_acc = -1.0
    skewness = 0.0
    kurtosis = 0.0
    for v in sel.tolist():
        tmp = (v - ii.avg) * (v - ii.avg)
        std_acc += tmp
        skewness += tmp * (v - ii.avg)
        kurtosis += tmp * tmp
    # C float semantics, not Python's: sqrt(negative) must yield NaN (a
    # zero-variance library drives std_acc to its -1.0 init, bwape.c:125)
    # and flow through to the isnan reset below (bwape.c:168) instead of
    # raising, and the div-by-zero prints are inf/nan, not exceptions
    var = std_acc / n
    with np.errstate(divide="ignore", invalid="ignore"):
        kurtosis = float(np.float64(kurtosis) / n / np.float64(var * var)
                         - 3)
        ii.std = float(np.sqrt(np.float64(var)))
        skewness = float(np.float64(skewness) / n
                         / np.float64(ii.std ** 3))
    y = 1.0
    while y < 10.0:
        if .5 * math.erfc(y / math.sqrt(2)) < ap_prior / L * (y * ii.std
                                                              + ii.avg):
            break
        y += 0.01
    hb = y * ii.std + ii.avg + .499
    # (bwtint_t)(NaN) on x86-64: cvttsd2si -> INT64_MIN, truncated to 0
    ii.high_bayesian = 0 if math.isnan(hb) else int(hb)
    n_ap = int((isizes > ii.high_bayesian).sum())
    ii.ap_prior = .01 * (n_ap + .01) / tot
    if ii.ap_prior < ap_prior:
        ii.ap_prior = ap_prior
    if math.isnan(ii.std) or p75 > 100000:
        ii.low = ii.high = ii.high_bayesian = 0
        ii.avg = ii.std = -1.0
        return ii, -1
    return ii, 0


def pairing(p, d_arr, alns, popt, s_mm, ii):
    """pairing (bwape.c:180-293).  p = (state0, state1); d_arr = sorted
    uint64 keys pos<<32|k<<1|j; alns = (alns0, alns1) hit dict lists."""
    max_len = max(p[0].read.full_len, p[1].read.full_len)
    o_score = subo_score = _U64MAX
    o_n = subo_n = 0
    o_pos = [_U64MAX, _U64MAX]
    last_pos = [[_U64MAX, _U64MAX], [_U64MAX, _U64MAX]]
    cnt_chg = 0

    def aux(u, v):
        nonlocal o_score, subo_score, o_n, subo_n
        if u == _U64MAX:
            return
        l = (v >> 32) + p[v & 1].len - (u >> 32)
        if not ((v >> 32) > (u >> 32) and l >= max_len):
            return
        if not ((ii.high and l <= ii.high_bayesian)
                or (ii.high == 0 and l <= popt.max_isize)):
            return
        s = (alns[v & 1][(v & 0xFFFFFFFF) >> 1][6]
             + alns[u & 1][(u & 0xFFFFFFFF) >> 1][6])
        s *= 10
        if ii.high:
            s += int(-4.343 * math.log(
                .5 * math.erfc(abs(l - ii.avg) / ii.std / math.sqrt(2)))
                + .499)
        s = ((s << 32) | (hash_64(((u >> 32) << 32) | (v >> 32))
                          & 0xFFFFFFFF)) & _U64MAX
        if (s >> 32) == (o_score >> 32):
            o_n += 1
        elif (s >> 32) < (o_score >> 32):
            subo_n += o_n
            o_n = 1
        else:
            subo_n += 1
        if s < o_score:
            subo_score = o_score
            o_score = s
            o_pos[u & 1] = u
            o_pos[v & 1] = v
        elif s < subo_score:
            subo_score = s

    if popt.type == BWA_PET_STD:
        for x in d_arr:
            x = int(x)
            strand = alns[x & 1][(x & 0xFFFFFFFF) >> 1][3]
            if strand == 1:
                y = 1 - (x & 1)
                aux(last_pos[y][1], x)
                aux(last_pos[y][0], x)
            else:
                last_pos[x & 1][0] = last_pos[x & 1][1]
                last_pos[x & 1][1] = x
    elif popt.type == BWA_PET_SOLID:
        for x in d_arr:
            x = int(x)
            strand = alns[x & 1][(x & 0xFFFFFFFF) >> 1][3]
            if (strand ^ x) & 1:
                y = 1 - (x & 1)
                aux(last_pos[y][1], x)
                aux(last_pos[y][0], x)
            else:
                last_pos[x & 1][0] = last_pos[x & 1][1]
                last_pos[x & 1][1] = x
    else:
        raise NotImplementedError("pairing type")

    if o_score != _U64MAX:
        mapQ_p = 0
        if o_n == 1:
            if subo_score == _U64MAX:
                mapQ_p = 29
            elif (subo_score >> 32) - (o_score >> 32) > s_mm * 10:
                mapQ_p = 23
            else:
                n = min(subo_n, 255)
                mapQ_p = ((subo_score >> 32) - (o_score >> 32)) // 2 \
                    - se.G_LOG_N[n]
                if mapQ_p < 0:
                    mapQ_p = 0
        rr = [alns[o_pos[0] & 1][(o_pos[0] & 0xFFFFFFFF) >> 1][3],
              alns[o_pos[1] & 1][(o_pos[1] & 0xFFFFFFFF) >> 1][3]]
        ok0 = p[0].pos == (o_pos[0] >> 32) and p[0].strand == rr[0]
        ok1 = p[1].pos == (o_pos[1] >> 32) and p[1].strand == rr[1]
        if ok0 and ok1:
            if p[0].mapQ > 0 and p[1].mapQ > 0:
                mq = min(p[0].mapQ + p[1].mapQ, 60)
                p[0].mapQ = p[1].mapQ = mq
            else:
                if p[0].mapQ == 0:
                    p[0].mapQ = min(mapQ_p + 7, p[1].mapQ)
                if p[1].mapQ == 0:
                    p[1].mapQ = min(mapQ_p + 7, p[0].mapQ)
        elif ok0:  # end 1 moved
            p[1].seQ = 0
            p[1].mapQ = min(p[0].mapQ, mapQ_p)
        elif ok1:  # end 0 moved
            p[0].seQ = 0
            p[0].mapQ = min(p[1].mapQ, mapQ_p)
        else:  # both moved
            p[0].seQ = p[1].seQ = 0
            mapQ_p = max(mapQ_p - 20, 0)
            p[0].mapQ = p[1].mapQ = mapQ_p
        for j in (0, 1):
            w = o_pos[j]
            r = alns[w & 1][(w & 0xFFFFFFFF) >> 1]
            qq = p[j]
            qq.extra_flag |= SAM_FPP
            if qq.pos != (w >> 32) or qq.strand != r[3]:
                qq.n_mm, qq.n_gapo, qq.n_gape = r[0], r[1], r[2]
                qq.strand = r[3]
                qq.score = r[6]
                qq.pos = w >> 32
                if qq.mapQ > 0:
                    cnt_chg += 1
    return cnt_chg


def sw_core_gen(l_pac, pac, seq_codes, beg, reglen):
    """bwa_sw_core (bwape.c:433-517) as a generator: yields the one
    local-SW job (ref_seq, seq_codes) and expects (score, path) sent
    back, so callers can batch the quadratic DP across records.  Returns
    (cigar, new_beg, cnt) or (None, beg, 0)."""
    length = len(seq_codes)
    if reglen < SW_MIN_MATCH_LEN or l_pac - beg < length:
        return None, beg, 0
    x = int((np.asarray(seq_codes) >= 4).sum())
    if x / length >= 0.25 or length - x < SW_MIN_MATCH_LEN:
        return None, beg, 0
    hi = min(beg + reglen, l_pac)
    ref_seq = pac[beg:hi]
    score, path = yield (ref_seq, seq_codes)
    if score < 0 or path is None:
        return None, beg, 0
    from ..refmodel.stdaln_scalar import path2cigar32
    cigar = path2cigar32(path)
    n_cigar = len(cigar)
    if n_cigar == 0:
        return None, beg, 0
    x = y = 0
    for op, ln in cigar:
        if op == FROM_M:
            x += ln
            y += ln
        elif op == FROM_D:
            x += ln
        else:
            y += ln
    if x < SW_MIN_MATCH_LEN or y < SW_MIN_MATCH_LEN:
        return None, beg, 0
    # update cigar and coordinate (bwape.c:476-493)
    first = path[-1]   # start cell
    beg += (first[1] if first[1] else 1) - 1
    start = (first[2] if first[2] else 1) - 1
    end = path[0][2]
    if start:
        cigar = [(FROM_S, start)] + cigar
    if end < length:
        cigar = cigar + [(FROM_S, length - end)]
    # recompute counts (bwape.c:495-513)
    n_mm = n_gapo = n_gape = 0
    xx = (first[1] - 1) if first[1] else 0
    yy = (first[2] - 1) if first[2] else 0
    for op, ln in cigar:
        if op == FROM_M:
            for l in range(ln):
                if ref_seq[xx + l] < 4 and seq_codes[yy + l] < 4 \
                        and ref_seq[xx + l] != seq_codes[yy + l]:
                    n_mm += 1
            xx += ln
            yy += ln
        elif op == FROM_D:
            xx += ln
            n_gapo += 1
            n_gape += ln - 1
        elif op == FROM_I:
            yy += ln
            n_gapo += 1
            n_gape += ln - 1
    cnt = (n_mm << 16) | (n_gapo << 8) | n_gape
    return cigar, beg, cnt


def _drive(gen, solver):
    """Run a local-SW generator to completion with `solver(job)`."""
    try:
        job = next(gen)
        while True:
            job = gen.send(solver(job))
    except StopIteration as s:
        return s.value


def sw_core(l_pac, pac, seq_codes, beg, reglen):
    """Sequential bwa_sw_core over the scalar kernel."""
    return _drive(
        sw_core_gen(l_pac, pac, seq_codes, beg, reglen),
        lambda j: aln_local_core(j[0], j[1], ALN_PARAM_BWA, _thres=1)[:2])


def paired_sw1(bns, pac, p, popt, ii, counters):
    """Sequential bwa_paired_sw1 over the scalar local-SW kernel."""
    _drive(
        paired_sw1_gen(bns, pac, p, popt, ii, counters),
        lambda j: aln_local_core(j[0], j[1], ALN_PARAM_BWA, _thres=1)[:2])


def paired_sw_batch(bns, pac, pairs, popt, iis, counters):
    """bwa_paired_sw rescue loop (bwape.c:635-658) with the local-SW DPs
    batched on device: drives one paired_sw1 generator per pair in
    lockstep rounds, solving each round's job set through
    ops.dp.local_sw_batch (device forward lattice + host banded reverse
    + device banded-global paths).  Results are identical to the
    sequential loop — jobs are pure functions of pre-rescue state.

    iis: one isize_info per pair (bam2bam's per-read-group infos), or a
    single info applied to all (sampe's batch estimate)."""
    from ..ops.dp import local_sw_batch

    if not isinstance(iis, (list, tuple)):
        iis = [iis] * len(pairs)
    live = []
    for p, ii in zip(pairs, iis):
        g = paired_sw1_gen(bns, pac, p, popt, ii, counters)
        try:
            live.append((g, next(g)))
        except StopIteration:
            pass
    while live:
        jobs = [j for _, j in live]
        solved = local_sw_batch(jobs, ALN_PARAM_BWA, thres=1)
        nxt = []
        for (g, _), (score, path, _s) in zip(live, solved):
            try:
                nxt.append((g, g.send((score, path))))
            except StopIteration:
                pass
        live = nxt


def paired_sw1_gen(bns, pac, p, popt, ii, counters):
    """bwa_paired_sw1 (bwape.c:519-633); local-SW DPs via yield."""
    if not ((p[0].mapQ >= SW_MIN_MAPQ or p[1].mapQ >= SW_MIN_MAPQ)
            and (p[0].extra_flag & SAM_FPP) == 0):
        return
    is_singleton = 1 if (p[0].type == BWA_TYPE_NO_MATCH
                         or p[1].type == BWA_TYPE_NO_MATCH) else 0
    counters["n_tot"][is_singleton] += 1
    mq_adjust = [255, 255]
    cigar = [None, None]
    beg = [0, 0]
    end = [0, 0]
    cnt = [0, 0]
    if popt.type not in (BWA_PET_STD, BWA_PET_SOLID):
        return
    for k in (0, 1):
        ref = p[1 - k]
        mate = p[k]
        if ref.type == BWA_TYPE_NO_MATCH:
            return
        rd = mate.read
        def rght_coor():
            # __set_rght_coor (bwape.c:531-536): a is truncated to int64
            # first; b is computed from the truncated a
            a = int(ref.pos + ii.avg - 3 * ii.std - mate.len * 1.5)
            b = int(a + 6 * ii.std + 2 * mate.len)
            if a < ref.pos + ref.len:
                a = ref.pos + ref.len
            if b > bns.l_pac:
                b = bns.l_pac
            return a, b

        def left_coor():
            # __set_left_coor (bwape.c:538-543)
            a = int(ref.pos + ref.len - ii.avg - 3 * ii.std - mate.len * 0.5)
            b = int(a + 6 * ii.std + 2 * mate.len)
            if a < 0:
                a = 0
            if b > ref.pos:
                b = ref.pos
            return a, b

        if popt.type == BWA_PET_STD:
            if ref.strand == 0:
                a, b = rght_coor()
                seq = rd.rseq
            else:
                a, b = left_coor()
                seq = rd.seq[::-1]  # forward orientation
        else:  # BWA_PET_SOLID (bwape.c:574-585)
            if ref.strand == 0:
                a, b = left_coor() if k == 0 else rght_coor()
                seq = rd.rseq[::-1]
            else:
                a, b = rght_coor() if k == 0 else left_coor()
                seq = rd.seq
        beg[k], end[k] = a, b
        cigar[k], beg[k], cnt[k] = yield from sw_core_gen(
            bns.l_pac, pac, seq, beg[k], end[k] - beg[k])
        if cigar[k] and p[k].type != BWA_TYPE_NO_MATCH:
            # re-evaluate (bwape.c:588-600)
            clip = 0
            if cigar[k][0][0] == FROM_S:
                clip += cigar[k][0][1]
            if cigar[k][-1][0] == FROM_S:
                clip += cigar[k][-1][1]
            s_old = int((p[k].n_mm * 9 + p[k].n_gapo * 13
                         + p[k].n_gape * 2) / 3. * 8. + .499)
            s_new = int((((cnt[k] >> 16) * 9 + ((cnt[k] >> 8) & 0xFF) * 13
                          + (cnt[k] & 0xFF) * 2 + clip * 3) / 3. * 8.)
                        + .499)
            # C adds the raw double to the int accumulator; ap_prior may be
            # 0 in bam2bam's null_ii (log(0) = -inf, x86 int conversion
            # saturates to INT_MIN)
            s_old = _cint(s_old + (-4.343 * _clog(ii.ap_prior / bns.l_pac)))
            s_new += int(-4.343 * math.log(.5 * math.erfc(1.5 / math.sqrt(2))
                                           + .499))
            if s_old < s_new:
                mq_adjust[k] = s_new - s_old
                cigar[k] = None
            else:
                mq_adjust[k] = s_old - s_new

    k = -1
    mapQ = 0
    if cigar[0] and cigar[1]:
        k = 0 if p[0].mapQ < p[1].mapQ else 1
        mapQ = abs(p[1].mapQ - p[0].mapQ)
    elif cigar[0]:
        k = 0
        mapQ = p[1].mapQ
    elif cigar[1]:
        k = 1
        mapQ = p[0].mapQ
    if k >= 0 and p[k].pos != beg[k]:
        counters["n_mapped"][is_singleton] += 1
        tmp = int(p[1 - k].mapQ) - p[k].mapQ // 2 - 8
        if tmp <= 0:
            tmp = 1
        if mapQ > tmp:
            mapQ = tmp
        p[k].mapQ = p[1 - k].mapQ = mapQ
        p[k].seQ = p[1 - k].seQ = min(p[1 - k].seQ, mapQ)
        if p[k].mapQ > mq_adjust[k]:
            p[k].mapQ = mq_adjust[k]
        if p[k].seQ > mq_adjust[k]:
            p[k].seQ = mq_adjust[k]
        p[k].cigar = cigar[k]
        # __set_fixed (bwape.c:545-553)
        p[k].type = BWA_TYPE_MATESW
        p[k].pos = beg[k]
        p[k].seQ = p[1 - k].seQ
        p[k].strand = (1 - p[1 - k].strand) if popt.type == BWA_PET_STD \
            else p[1 - k].strand
        p[k].n_mm = cnt[k] >> 16
        p[k].n_gapo = (cnt[k] >> 8) & 0xFF
        p[k].n_gape = cnt[k] & 0xFF
        p[k].extra_flag |= SAM_FPP
        p[1 - k].extra_flag |= SAM_FPP


def sampe(engine, reads, per_read_alns, gopt, popt, rng, rg_id=None,
          last_ii=None, pos_memo=None, ntpac=None):
    """Full sampe for one chunk.

    reads: (reads0, reads1); per_read_alns: (alns0, alns1).
    Returns (sam_lines, ii) — ii feeds the next chunk's last_ii.
    """
    from . import post_native
    res = post_native.sampe_bytes(engine, reads, per_read_alns, gopt,
                                  popt, rng, rg_id=rg_id, last_ii=last_ii,
                                  pos_memo=pos_memo, ntpac=ntpac)
    if res is not None:
        return res

    bns = engine.index.bns
    pac = engine.index.pac
    fwd, rev = engine.index.fwd, engine.index.rev
    n = len(reads[0])
    assert len(reads[1]) == n
    if pos_memo is None:
        pos_memo = {}

    # --- SE phase (bwape.c:316-338): drand48 order is j inner, i outer ---
    states = ([], [])
    for i in range(n):
        for j in (0, 1):
            s = se.SeqState(reads[j][i])
            s.extra_flag |= SAM_FPD | (SAM_FR1 if j == 0 else SAM_FR2)
            se.aln2seq_core(per_read_alns[j][i], s, rng, set_main=True,
                            n_multi=0)
            states[j].append(s)

    def batch_positions(jobs):
        """jobs: list of (strand, sa_row, length); returns positions."""
        if not jobs:
            return np.zeros(0, dtype=np.uint32)
        rows_f = [(i, t) for i, t in enumerate(jobs) if t[0] == 1]
        rows_r = [(i, t) for i, t in enumerate(jobs) if t[0] == 0]
        out = np.zeros(len(jobs), dtype=np.uint32)
        if rows_f:
            res = engine.sa_rows(1, np.array([t[1] for _, t in rows_f],
                                             dtype=np.uint32))
            for (i, t), v in zip(rows_f, res):
                out[i] = v
        if rows_r:
            res = engine.sa_rows(0, np.array([t[1] for _, t in rows_r],
                                             dtype=np.uint32))
            for (i, t), v in zip(rows_r, res):
                out[i] = (rev.seq_len - (int(v) + t[2])) & _NEG1
        return out

    se_jobs = []
    se_refs = []
    for i in range(n):
        for j in (0, 1):
            s = states[j][i]
            if s.type in (BWA_TYPE_UNIQUE, BWA_TYPE_REPEAT):
                se_jobs.append((s.strand, s.sa, s.len))
                se_refs.append(s)
    for s, v in zip(se_refs, batch_positions(se_jobs)):
        s.pos = int(v)
        max_diff = cal_maxdiff(s.len, BWA_AVG_ERR, gopt.fnr) \
            if gopt.fnr > 0.0 else gopt.max_diff
        s.seQ = s.mapQ = se.approx_mapQ(s, max_diff)

    # --- infer isize (bwape.c:341-346) ---
    ii, ret = infer_isize(states, popt.ap_prior, fwd.seq_len)
    if ii.avg < 0.0 and last_ii is not None and last_ii.avg > 0.0:
        ii = last_ii
    if popt.force_isize:
        ii.low = ii.high = 0
        ii.avg = ii.std = -1.0

    # --- PE phase: interval expansion + pairing (bwape.c:349-398) ---
    # first pass: collect all SA rows needing conversion (memoized wide
    # intervals keyed (k,l), first-encounter length — bwape.c:372-387)
    expand_jobs = []   # (strand, row, len) in deterministic order
    pair_plans = []
    for i in range(n):
        p = (states[0][i], states[1][i])
        both = all(s.type in (BWA_TYPE_UNIQUE, BWA_TYPE_REPEAT) for s in p)
        plan = None
        if both:
            n_occ = [sum(h[5] - h[4] + 1 for h in per_read_alns[j][i])
                     for j in (0, 1)]
            if n_occ[0] <= popt.max_occ and n_occ[1] <= popt.max_occ:
                plan = []
                for j in (0, 1):
                    for ki, h in enumerate(per_read_alns[j][i]):
                        width = h[5] - h[4] + 1
                        key = (h[4], h[5])
                        if width >= MIN_HASH_WIDTH:
                            if key not in pos_memo:
                                pos_memo[key] = ("pending", len(expand_jobs),
                                                 width)
                                for l in range(h[4], h[5] + 1):
                                    expand_jobs.append(
                                        (h[3], l, p[j].len))
                            plan.append((j, ki, h, "memo", key))
                        else:
                            plan.append((j, ki, h, "direct",
                                         len(expand_jobs)))
                            for l in range(h[4], h[5] + 1):
                                expand_jobs.append((h[3], l, p[j].len))
        pair_plans.append(plan)

    expanded = batch_positions(expand_jobs)
    # resolve memo pendings
    for key, val in list(pos_memo.items()):
        if isinstance(val, tuple) and val[0] == "pending":
            _, off, width = val
            pos_memo[key] = expanded[off:off + width].copy()

    cnt_chg = 0
    for i in range(n):
        plan = pair_plans[i]
        p = (states[0][i], states[1][i])
        if plan is not None:
            d_arr = []
            for j, ki, h, kind, ref in plan:
                if kind == "memo":
                    positions = pos_memo[ref]
                else:
                    width = h[5] - h[4] + 1
                    positions = expanded[ref:ref + width]
                d_arr.append((np.asarray(positions, dtype=np.uint64) << 32)
                             | np.uint64((ki << 1) | j))
            d_arr = np.sort(np.concatenate(d_arr)) if d_arr else \
                np.empty(0, dtype=np.uint64)
            cnt_chg += pairing(p, d_arr,
                               (per_read_alns[0][i], per_read_alns[1][i]),
                               popt, gopt.s_mm, ii)

        # multi hits (bwape.c:400-413)
        if popt.N_multi or popt.n_multi:
            for j in (0, 1):
                s = p[j]
                if s.type != BWA_TYPE_NO_MATCH:
                    if (not (s.extra_flag & SAM_FPP)
                            and p[1 - j].type != BWA_TYPE_NO_MATCH):
                        nm = popt.n_multi \
                            if s.c1 + s.c2 - 1 > popt.N_multi \
                            else popt.N_multi
                    else:
                        nm = popt.n_multi
                    se.aln2seq_core(per_read_alns[j][i], s, rng,
                                    set_main=False, n_multi=nm)

    # multi positions (inline bwt_sa in the reference, bwape.c:407-410)
    multi_jobs = []
    multi_refs = []
    for i in range(n):
        for j in (0, 1):
            s = states[j][i]
            for m in s.multi:
                multi_jobs.append((m["strand"], m["pos"], s.len))
                multi_refs.append(m)
    for m, v in zip(multi_refs, batch_positions(multi_jobs)):
        m["pos"] = int(v)

    # --- mate rescue (bwa_paired_sw, bwape.c:635-658), SW DPs batched
    # on device across the whole chunk ---
    counters = {"n_tot": [0, 0], "n_mapped": [0, 0]}
    if popt.is_sw and ii.avg >= 0.0:
        paired_sw_batch(bns, pac,
                        [(states[0][i], states[1][i]) for i in range(n)],
                        popt, ii, counters)

    # --- refine + MD + trim-correct per end (bwape.c:725-726) ---
    for j in (0, 1):
        se.refine_gapped(bns, pac, states[j], ntpac=ntpac)

    # --- print interleaved with the bc concat quirk (bwape.c:731-740) ---
    for i in range(n):
        p0, p1 = states[0][i], states[1][i]
        if p0.read.bc or p1.read.bc:
            bc = p0.read.bc + p1.read.bc
            p0.read.bc = bc
            p1.read.bc = bc
    from . import post_native
    flat = [states[j][i] for i in range(n) for j in (0, 1)]
    mate_idx = np.arange(2 * n, dtype=np.int64) ^ 1
    blob = post_native.emit_states(bns, flat, mate_idx, gopt.mode,
                                   gopt.max_top2, rg_id=rg_id)
    if blob is not None:
        return blob, ii
    lines = []
    for i in range(n):
        p0, p1 = states[0][i], states[1][i]
        lines.append(se.print_sam1(bns, p0, p1, gopt.mode, gopt.max_top2,
                                   rg_id=rg_id))
        lines.append(se.print_sam1(bns, p1, p0, gopt.mode, gopt.max_top2,
                                   rg_id=rg_id))
    return lines, ii
