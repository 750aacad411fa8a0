"""Native C++ SA-IS vs the NumPy prefix-doubling suffix array."""

import numpy as np
import pytest

from nabwa_tpu.index import native
from nabwa_tpu.index import sa as samod


def _doubling(codes):
    """The pure-NumPy reference (previous suffix_array body)."""
    s = np.asarray(codes, dtype=np.int64)
    n = len(s)
    if n <= 1:
        return np.arange(n, dtype=np.int64)
    rank = s.copy()
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.cumsum(changed)
        if new_rank[-1] == n - 1:
            return order
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank
        k <<= 1


def test_native_available():
    assert native.have_native(), "native sais failed to build"


@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (100, 2), (1000, 3),
                                    (100000, 4)])
def test_sais_matches_doubling(n, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    got = native.suffix_array_native(codes)
    want = _doubling(codes)
    np.testing.assert_array_equal(got, want)


def test_sais_repetitive():
    # repetitive inputs exercise the recursion + tie semantics
    for pattern in [b"\x00" * 500, b"\x00\x01" * 300,
                    b"\x02\x02\x01\x02\x02\x01" * 100,
                    b"\x03\x02\x01\x00" * 250]:
        codes = np.frombuffer(pattern, dtype=np.uint8).copy()
        np.testing.assert_array_equal(native.suffix_array_native(codes),
                                      _doubling(codes))


def test_index_build_uses_native(tmp_path):
    from tests import genomes
    from nabwa_tpu.index.build import build_index
    from tests import refbin

    fa, _ = genomes.random_genome(30000, seed=7, n_frac=0.01)
    (tmp_path / "g.fa").write_bytes(fa)
    (tmp_path / "r.fa").write_bytes(fa)
    build_index(str(tmp_path / "g.fa"))
    refbin.run_bwa(["index", str(tmp_path / "r.fa")])
    for ext in (".bwt", ".rbwt", ".sa", ".rsa"):
        assert (tmp_path / ("g.fa" + ext)).read_bytes() == \
            (tmp_path / ("r.fa" + ext)).read_bytes(), ext


def test_native_dp_kernels_match_scalar():
    """Native aln_global/aln_extend (native/stdaln.cpp) vs the scalar
    oracles, scores AND paths."""
    from nabwa_tpu.refmodel.stdaln_scalar import (aln_global_core,
                                                  ALN_PARAM_BWA)
    from nabwa_tpu.refmodel.extend_scalar import aln_extend_core
    from nabwa_tpu.index.native import (aln_global_native,
                                        aln_extend_native, have_native)
    from nabwa_tpu.ops.dp import _path_from_ctypes

    if not have_native():
        import pytest
        pytest.skip("no native library")
    rng = np.random.default_rng(23)
    ap = ALN_PARAM_BWA
    for t in range(60):
        l1 = int(rng.integers(1, 80))
        l2 = int(rng.integers(1, 80))
        s1 = rng.integers(0, 5, l1).astype(np.uint8)
        s2 = rng.integers(0, 5, l2).astype(np.uint8)
        if t % 2:
            m = min(l1, l2)
            s2[:m] = s1[:m]
            for _ in range(int(rng.integers(0, 4))):
                s2[int(rng.integers(0, m))] = int(rng.integers(0, 4))
        want = aln_global_core(s1, s2, ap)
        score, cts = aln_global_native(s1, s2, ap.matrix, ap.row,
                                       ap.gap_open, ap.gap_ext,
                                       ap.gap_end, ap.band_width)
        assert want[0] == score and \
            want[1] == _path_from_ctypes(cts, l1, l2), t
        g0 = int(rng.integers(1, 60))
        we = aln_extend_core(s1, s2, ap, g0, want_path=True)
        score, ei, ej, cts = aln_extend_native(
            s1, s2, ap.matrix, ap.row, ap.gap_open, ap.gap_ext,
            ap.band_width, g0, want_path=True)
        assert (we[0], we[1], we[2]) == (score, ei, ej), t
        gp = _path_from_ctypes(cts, ei, ej) if cts is not None else None
        assert we[3] == gp, t


def test_native_occ4_matches_scalar():
    """OccNative (two_occ4_u32) vs ScalarFm on a random genome, incl. the
    -1 / seq_len edge rows."""
    from tests import genomes
    from nabwa_tpu.index import sa as samod
    from nabwa_tpu.refmodel.fm_scalar import ScalarFm
    from nabwa_tpu.index.native import OccNative, have_native

    if not have_native():
        import pytest
        pytest.skip("no native library")
    rng = np.random.default_rng(29)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    bwt, primary, l2, samp = samod.bwt_and_sample_from_codes(codes)
    words = samod.pack_bwt_words(bwt)
    inter = samod.interleave_occ(words, bwt, len(codes))
    fm = ScalarFm(inter, primary, l2, len(codes))
    nat = OccNative(inter, primary, l2, len(codes))
    rows = list(rng.integers(0, len(codes), 200)) + \
        [0xFFFFFFFF, len(codes), 0, len(codes) - 1]
    for k in rows:
        for l in (k, min(int(k) + 13, len(codes)), len(codes)):
            wk, wl = fm.two_occ4(int(k), int(l))
            gk, gl = nat.two_occ4(int(k), int(l))
            np.testing.assert_array_equal(wk, gk)
            np.testing.assert_array_equal(wl, gl)
        np.testing.assert_array_equal(fm.occ4(int(k)), nat.occ4(int(k)))
