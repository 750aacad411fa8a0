"""Device occ/width/exact-match/sa kernels vs the scalar oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from nabwa_tpu.index import sa as samod
from nabwa_tpu.refmodel.fm_scalar import ScalarFm
from nabwa_tpu.ops import occ as occ_ops
from nabwa_tpu.ops.sa_lookup import sa_lookup, inv_psi


@pytest.fixture(scope="module")
def small_fm():
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=3001).astype(np.uint8)
    bwt, primary, l2, sa_full = samod.bwt_from_codes(codes)
    words = samod.pack_bwt_words(bwt)
    inter = samod.interleave_occ(words, bwt, len(codes))
    sa_samp = samod.cal_sa_sample(sa_full, len(codes), 32)
    fm = ScalarFm(inter, primary, l2, len(codes), sa=sa_samp, sa_intv=32)
    dev = {
        "bwt": jnp.asarray(inter.view(np.int32)),
        "l2": jnp.asarray(l2.view(np.int32)),
        "primary": np.int32(primary),
        "seq_len": np.int32(len(codes)),
        "sa": jnp.asarray(sa_samp.view(np.int32)),
    }
    return codes, fm, dev


def test_occ4_matches_scalar(small_fm):
    codes, fm, dev = small_fm
    n = fm.seq_len
    rng = np.random.default_rng(6)
    ks = np.concatenate([
        rng.integers(0, n + 1, size=300),
        [0, 1, n - 1, n, fm.primary, fm.primary - 1, fm.primary + 1],
        [0xFFFFFFFF],
    ]).astype(np.uint32)
    got = np.asarray(occ_ops.occ4(dev["bwt"], dev["primary"],
                                  dev["seq_len"], jnp.asarray(ks)))
    want = np.stack([fm.occ4(int(k)) for k in ks])
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_occ_single_base(small_fm):
    codes, fm, dev = small_fm
    n = fm.seq_len
    rng = np.random.default_rng(7)
    ks = rng.integers(0, n + 1, size=200).astype(np.uint32)
    cs = rng.integers(0, 4, size=200).astype(np.int32)
    got = np.asarray(occ_ops.occ(dev["bwt"], dev["l2"], dev["primary"],
                                 dev["seq_len"], jnp.asarray(ks),
                                 jnp.asarray(cs)))
    want = np.array([fm.occ(int(k), int(c)) for k, c in zip(ks, cs)])
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_match_exact(small_fm):
    codes, fm, dev = small_fm
    rng = np.random.default_rng(8)
    B, L = 64, 24
    queries = np.zeros((B, L), dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for b in range(B):
        ln = int(rng.integers(8, L + 1))
        start = int(rng.integers(0, fm.seq_len - ln))
        q = codes[start:start + ln].astype(np.int32)
        if b % 7 == 0:  # inject mismatches/Ns
            q[int(rng.integers(0, ln))] = int(rng.integers(0, 5))
        queries[b, :ln] = q
        lengths[b] = ln
    n, k, l = occ_ops.match_exact(dev["bwt"], dev["l2"], dev["primary"],
                                  dev["seq_len"], jnp.asarray(queries),
                                  jnp.asarray(lengths))
    n, k, l = map(np.asarray, (n, k, l))
    for b in range(B):
        wn, wk, wl = fm.match_exact(queries[b, :lengths[b]].tolist())
        assert n[b] == wn
        if wn:
            assert (k[b], l[b]) == (wk, wl)


def test_cal_width(small_fm):
    codes, fm, dev = small_fm
    rng = np.random.default_rng(9)
    B, L = 32, 20
    queries = rng.integers(0, 4, size=(B, L)).astype(np.int32)
    queries[0, 5] = 4  # an N
    lengths = np.full(B, L, dtype=np.int32)
    lengths[3] = 11
    w, bid = occ_ops.cal_width(dev["bwt"], dev["l2"], dev["primary"],
                               dev["seq_len"], jnp.asarray(queries),
                               jnp.asarray(lengths))
    w, bid = np.asarray(w), np.asarray(bid)
    for b in range(B):
        ln = lengths[b]
        # scalar reference of bwt_cal_width (bwtaln.c:52-76)
        k, l, cur = 0, fm.seq_len, 0
        for i in range(ln):
            c = queries[b, i]
            if c < 4:
                ok = fm.occ(k - 1, c)
                ol = fm.occ(l, c)
                k = fm.L2[c] + ok + 1
                l = fm.L2[c] + ol
            if k > l or c > 3:
                k, l = 0, fm.seq_len
                cur += 1
            assert w[b, i] == l - k + 1, (b, i)
            assert bid[b, i] == cur, (b, i)
        assert w[b, ln] == 0
        assert bid[b, ln] == cur + 1


def test_sa_lookup(small_fm):
    codes, fm, dev = small_fm
    rng = np.random.default_rng(10)
    ks = rng.integers(0, fm.seq_len + 1, size=128).astype(np.uint32)
    got = np.asarray(sa_lookup(dev["bwt"], dev["l2"], dev["primary"],
                               dev["seq_len"], dev["sa"], 32,
                               jnp.asarray(ks))).view(np.uint32)
    want = np.array([fm.sa(int(k)) for k in ks], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)
