"""Native pe_pairing_batch / se_multi_batch vs the Python oracles.

Randomized pairs drive the native sweep and models.sampe.pairing over
identical inputs; every state mutation (mapQ/seQ/pos/strand/counts/flag)
and the cnt_chg tally must match exactly.
"""

import numpy as np
import pytest

from nabwa_tpu.constants import (SAM_FPD, SAM_FPP, BWA_TYPE_NO_MATCH,
                                 BWA_TYPE_UNIQUE, BWA_TYPE_REPEAT)
from nabwa_tpu.index import native as native_mod
from nabwa_tpu.models import sampe as pe
from nabwa_tpu.models import samse as se
from nabwa_tpu.models.post_native import (NF, F_TYPE, F_STRAND, F_POS,
                                          F_MAPQ, F_SEQ_Q, F_C1, F_C2,
                                          F_NMM, F_NGO, F_NGE, F_LEN,
                                          F_FULL_LEN, F_XFLAG, F_SCORE,
                                          F_SA)
from nabwa_tpu.options import PeOpt


class _Read:
    def __init__(self, full_len):
        self.full_len = full_len


class _St:
    pass


def _mk_case(rng, ii, popt):
    """One random pair: states + alns + expanded position lists."""
    n_hits = (int(rng.integers(1, 4)), int(rng.integers(1, 4)))
    alns = ([], [])
    keys = []
    for j in (0, 1):
        for ki in range(n_hits[j]):
            w = int(rng.integers(1, 4))
            k0 = int(rng.integers(0, 1000))
            score = int(rng.integers(0, 40))
            strand = int(rng.integers(0, 2))
            alns[j].append((int(rng.integers(0, 3)), int(rng.integers(0, 2)),
                            int(rng.integers(0, 2)), strand, k0, k0 + w - 1,
                            score))
            for _ in range(w):
                pos = int(rng.integers(0, 5000))
                keys.append((pos << 32) | (ki << 1) | j)
    states = []
    for j in (0, 1):
        s = _St()
        s.read = _Read(int(rng.integers(30, 60)))
        s.len = s.read.full_len
        s.pos = int(rng.integers(0, 5000))
        s.strand = int(rng.integers(0, 2))
        s.mapQ = int(rng.integers(0, 40))
        s.seQ = s.mapQ
        s.n_mm = s.n_gapo = s.n_gape = 0
        s.score = 0
        s.extra_flag = SAM_FPD
        s.type = BWA_TYPE_UNIQUE
        states.append(s)
    return states, alns, np.array(sorted(keys), dtype=np.uint64)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pairing_native_matches_python(seed):
    lib = native_mod._load()
    if lib is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(seed)
    popt = PeOpt()
    ii = pe.IsizeInfo()
    ii.avg, ii.std = 900.0, 120.0
    ii.low, ii.high = 300, 1500
    ii.high_bayesian = 2000

    n = 300
    cases = [_mk_case(rng, ii, popt) for _ in range(n)]

    # --- native run over the whole batch ---
    state = np.zeros((2 * n, NF), dtype=np.int64)
    recs_l = []
    counts = np.zeros(2 * n, dtype=np.int32)
    keys_l = []
    key_off = np.zeros(n + 1, dtype=np.int64)
    for i, (sts, alns, keys) in enumerate(cases):
        for j in (0, 1):
            row = 2 * i + j
            s = sts[j]
            state[row, F_TYPE] = s.type
            state[row, F_STRAND] = s.strand
            state[row, F_POS] = s.pos
            state[row, F_MAPQ] = s.mapQ
            state[row, F_SEQ_Q] = s.seQ
            state[row, F_LEN] = s.len
            state[row, F_FULL_LEN] = s.read.full_len
            state[row, F_XFLAG] = s.extra_flag
            counts[row] = len(alns[j])
            for h in alns[j]:
                recs_l.append(((h[0] & 0xFF) | ((h[1] & 0xFF) << 8)
                               | ((h[2] & 0xFF) << 16) | ((h[3] & 1) << 24),
                               h[4], h[5], h[6]))
        keys_l.append(keys)
        key_off[i + 1] = key_off[i] + len(keys)
    recs = np.array(recs_l, dtype=np.uint32).reshape(-1)
    hit_off = np.zeros(2 * n + 1, dtype=np.int64)
    np.cumsum(counts, out=hit_off[1:])
    flat_keys = np.concatenate(keys_l).astype(np.uint64)
    cnt_native = lib.pe_pairing_batch(
        n, flat_keys, key_off, recs, 4 * hit_off, state.reshape(-1),
        0, popt.max_isize, 3,
        np.full(n, ii.high, dtype=np.int64),
        np.full(n, ii.high_bayesian, dtype=np.int64),
        np.full(n, float(ii.avg), dtype=np.float64),
        np.full(n, float(ii.std), dtype=np.float64))

    # --- python oracle per pair ---
    cnt_py = 0
    for i, (sts, alns, keys) in enumerate(cases):
        cnt_py += pe.pairing(sts, keys, alns, popt, 3, ii)
        for j in (0, 1):
            row = 2 * i + j
            s = sts[j]
            assert state[row, F_MAPQ] == s.mapQ, (i, j, "mapQ")
            assert state[row, F_SEQ_Q] == s.seQ, (i, j, "seQ")
            assert state[row, F_POS] == s.pos, (i, j, "pos")
            assert state[row, F_STRAND] == s.strand, (i, j, "strand")
            assert state[row, F_NMM] == s.n_mm, (i, j, "nmm")
            assert state[row, F_NGO] == s.n_gapo
            assert state[row, F_NGE] == s.n_gape
            assert state[row, F_SCORE] == s.score
            assert state[row, F_XFLAG] == s.extra_flag, (i, j, "flag")
    assert cnt_native == cnt_py


def test_multi_native_matches_python():
    lib = native_mod._load()
    if lib is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(11)
    n = 200
    recs_l, counts, caps = [], np.zeros(n, dtype=np.int32), \
        np.zeros(n, dtype=np.int32)
    state = np.zeros((n, NF), dtype=np.int64)
    alns_all = []
    for i in range(n):
        na = int(rng.integers(0, 4))
        counts[i] = na
        caps[i] = int(rng.integers(0, 6))
        alns = []
        for _ in range(na):
            w = int(rng.integers(1, 4))
            k0 = int(rng.integers(0, 100))
            alns.append((int(rng.integers(0, 3)), int(rng.integers(0, 2)),
                         int(rng.integers(0, 2)), int(rng.integers(0, 2)),
                         k0, k0 + w - 1, int(rng.integers(0, 9))))
            recs_l.append(((alns[-1][0] & 0xFF) | ((alns[-1][1] & 0xFF) << 8)
                           | ((alns[-1][2] & 0xFF) << 16)
                           | ((alns[-1][3] & 1) << 24),
                           alns[-1][4], alns[-1][5], alns[-1][6]))
        alns_all.append(alns)
        state[i, F_SA] = int(rng.integers(0, 103))
        state[i, F_TYPE] = BWA_TYPE_UNIQUE if na else BWA_TYPE_NO_MATCH
    recs = (np.array(recs_l, dtype=np.uint32).reshape(-1)
            if recs_l else np.zeros(0, dtype=np.uint32))
    stride = 6 + 1
    mpos = np.zeros(n * stride, dtype=np.uint64)
    mgap = np.zeros(n * stride, dtype=np.int32)
    mmm = np.zeros(n * stride, dtype=np.int32)
    mstr = np.zeros(n * stride, dtype=np.int32)
    mn = np.zeros(n, dtype=np.int32)
    lib.se_multi_batch(n, recs, counts, state.reshape(-1), caps, stride,
                       mpos, mgap, mmm, mstr, mn)
    from nabwa_tpu.utils.rand48 import Rand48
    for i in range(n):
        s = se.SeqState.__new__(se.SeqState)
        s.sa = int(state[i, F_SA])
        s.multi = []
        s.n_multi = 0
        s.type = int(state[i, F_TYPE])
        if caps[i] > 0 and counts[i] > 0:
            se.aln2seq_core(alns_all[i], s, Rand48(1), set_main=False,
                            n_multi=int(caps[i]))
        assert mn[i] == len(s.multi), i
        for m in range(mn[i]):
            o = i * stride + m
            mu = s.multi[m]
            assert mpos[o] == mu["pos"]
            assert mgap[o] == mu["gap"]
            assert mmm[o] == mu["mm"]
            assert mstr[o] == mu["strand"]
