"""Device DP kernels vs the scalar stdaln oracle (randomized property
tests): identical score AND identical traceback path on every pair."""

import numpy as np
import pytest

from nabwa_tpu.ops.dp import banded_global_batch
from nabwa_tpu.refmodel.stdaln_scalar import (aln_global_core, AlnParam,
                                              ALN_PARAM_BWA, ALN_SM_MAQ,
                                              ALN_SM_BLAST)


def _mutate(rng, seq, err, ins, dele):
    out = []
    for c in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(rng.integers(0, 4))
        if rng.random() < err:
            out.append((c + rng.integers(1, 4)) % 4)
        else:
            out.append(c)
    return np.array(out, dtype=np.uint8)


def _random_pairs(seed, n, l1min, l1max, with_n=False):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(n):
        l1 = int(rng.integers(l1min, l1max))
        ref = rng.integers(0, 4, size=l1).astype(np.uint8)
        read = _mutate(rng, ref, 0.05, 0.02, 0.02)
        if len(read) == 0:
            read = ref[:1].copy()
        if with_n and rng.random() < 0.5 and len(read) > 2:
            read[rng.integers(0, len(read))] = 4
        pairs.append((ref, read))
    return pairs


@pytest.mark.parametrize("seed,params", [
    (11, ALN_PARAM_BWA),
    (12, AlnParam(26, 9, 5, ALN_SM_MAQ, 5, 13)),     # narrow band
    (13, AlnParam(5, 2, 2, ALN_SM_BLAST, 5, 50)),    # blast params
    (14, AlnParam(26, 9, -1, ALN_SM_MAQ, 5, 50)),    # gap_end<0 fallback
])
def test_banded_global_matches_oracle(seed, params):
    pairs = _random_pairs(seed, 24, 5, 90, with_n=True)
    # unequal lengths both directions + degenerate cases
    pairs.append((pairs[0][1], pairs[0][0]))
    pairs.append((np.array([1], np.uint8), np.array([1], np.uint8)))
    pairs.append((np.array([], np.uint8), np.array([2], np.uint8)))
    got = banded_global_batch(pairs, params)
    for i, (a, b) in enumerate(pairs):
        want_score, want_path = aln_global_core(a, b, params)
        g_score, g_path = got[i]
        assert g_score == want_score, \
            f"pair {i}: score {g_score} != {want_score}"
        assert g_path == [(int(c), int(x), int(y)) for c, x, y in want_path],\
            f"pair {i}: path mismatch"


def test_banded_global_window_shapes():
    # refine_gapped-shaped inputs: ref window slightly longer than read
    rng = np.random.default_rng(77)
    pairs = []
    for _ in range(16):
        l2 = int(rng.integers(20, 120))
        read = rng.integers(0, 4, size=l2).astype(np.uint8)
        pad = int(rng.integers(0, 10))
        ref = np.concatenate([rng.integers(0, 4, size=pad),
                              _mutate(rng, read, 0.03, 0.01, 0.01),
                              rng.integers(0, 4, size=pad)]).astype(np.uint8)
        pairs.append((ref, read))
    got = banded_global_batch(pairs, ALN_PARAM_BWA)
    for i, (a, b) in enumerate(pairs):
        want = aln_global_core(a, b, ALN_PARAM_BWA)
        assert got[i][0] == want[0]
        assert got[i][1] == [(int(c), int(x), int(y)) for c, x, y in want[1]]


def test_extend_matches_oracle():
    from nabwa_tpu.ops.dp import extend_batch
    from nabwa_tpu.refmodel.extend_scalar import aln_extend_core

    rng = np.random.default_rng(55)
    jobs = []
    g0s = []
    for t in range(30):
        l2 = int(rng.integers(4, 80))
        q = rng.integers(0, 4, size=l2).astype(np.uint8)
        tgt = _mutate(rng, q, 0.06, 0.03, 0.03)
        ext = rng.integers(0, 4, size=int(rng.integers(0, 40))).astype(
            np.uint8)
        tgt = np.concatenate([tgt, ext]).astype(np.uint8)
        if len(tgt) == 0:
            tgt = q[:1].copy()
        if rng.random() < 0.3 and l2 > 2:
            q = q.copy()
            q[rng.integers(0, l2)] = 4
        jobs.append((tgt, q))
        g0s.append(int(rng.integers(1, 60)))
    jobs.append((np.array([], np.uint8), np.array([1], np.uint8)))
    g0s.append(5)
    # bwasw parameters (a=1,b=3,q=5,r=2 -> matrix built like _gen_ap)
    m = np.full((5, 5), -3, dtype=np.int64)
    np.fill_diagonal(m, 1)
    m[4, :] = 0
    m[:, 4] = 0
    par = AlnParam(5, 2, -1, m, 5, 50)
    got = extend_batch(jobs, par, g0s)
    for i, (tgt, q) in enumerate(jobs):
        want = aln_extend_core(tgt, q, par, g0s[i], want_path=False)
        assert got[i] == (want[0], want[1], want[2]), \
            f"job {i}: {got[i]} != {want[:3]}"


def test_local_sw_batch_vs_oracle():
    """local_sw_batch == aln_local_core on mate-rescue-shaped jobs:
    ref windows ~(6*std + 2L) with the read placed inside with errors,
    plus junk-window cases (read absent) and short overlaps."""
    from nabwa_tpu.ops.dp import local_sw_batch
    from nabwa_tpu.refmodel.local_aln_scalar import aln_local_core

    rng = np.random.default_rng(424)
    jobs = []
    for t in range(48):
        wlen = int(rng.integers(60, 420))
        ref = rng.integers(0, 4, size=wlen).astype(np.uint8)
        if t % 4 == 3:
            read = rng.integers(0, 4, size=int(
                rng.integers(20, 80))).astype(np.uint8)  # junk
        else:
            rl = int(rng.integers(20, min(100, wlen)))
            start = int(rng.integers(0, wlen - rl + 1))
            read = _mutate(rng, ref[start:start + rl], 0.06, 0.03, 0.03)
            if len(read) == 0:
                read = ref[:1].copy()
        jobs.append((ref, read))
    jobs.append((np.zeros(0, np.uint8), jobs[0][1]))   # len-0 edge

    got = local_sw_batch(jobs, ALN_PARAM_BWA, thres=1)
    for i, (a, b) in enumerate(jobs):
        want = aln_local_core(a, b, ALN_PARAM_BWA, _thres=1)
        assert got[i][0] == want[0], f"job {i} score"
        assert got[i][1] == want[1], f"job {i} path"
