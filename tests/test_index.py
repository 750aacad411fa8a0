"""Index construction: byte-identical files vs the reference `bwa index`."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index import fmindex
from nabwa_tpu.utils.rand48 import Rand48

from . import refbin, genomes

EXTS = [".pac", ".rpac", ".ann", ".amb", ".bwt", ".rbwt", ".sa", ".rsa"]


def test_rand48_matches_posix():
    # golden values from glibc lrand48 after srand48(11)
    r = Rand48(11)
    seq = [r.lrand48() for _ in range(6)]
    r2 = Rand48(11)
    arr = r2.lrand48_array(6)
    assert list(arr.astype(int)) == seq
    # continuation after a vectorized run stays in sync
    a = Rand48(99)
    b = Rand48(99)
    _ = a.lrand48_array(17)
    for _ in range(17):
        b.lrand48()
    assert a.lrand48() == b.lrand48()


@pytest.mark.parametrize("n,n_frac,n_seqs,lc", [
    (4096, 0.0, 1, 0.0),
    (10000, 0.02, 3, 0.1),
    (65536, 0.01, 2, 0.0),
    (4097, 0.0, 1, 0.0),   # l_pac % 4 != 0
])
def test_index_files_bit_identical(tmp_path, n, n_frac, n_seqs, lc):
    fa, _ = genomes.random_genome(n, seed=n, n_frac=n_frac, n_seqs=n_seqs,
                                  lowercase_frac=lc)
    (tmp_path / "ref.fa").write_bytes(fa)
    (tmp_path / "ours.fa").write_bytes(fa)

    refbin.run_bwa(["index", str(tmp_path / "ref.fa")])
    build_index(str(tmp_path / "ours.fa"))

    for ext in EXTS:
        a = (tmp_path / ("ref.fa" + ext)).read_bytes()
        b = (tmp_path / ("ours.fa" + ext)).read_bytes()
        assert a == b, f"{ext} differs ({len(a)} vs {len(b)} bytes)"


def test_index_roundtrip_load(tmp_path):
    fa, _ = genomes.random_genome(8192, seed=3, n_frac=0.01)
    (tmp_path / "g.fa").write_bytes(fa)
    build_index(str(tmp_path / "g.fa"))
    idx = fmindex.BwaIndex.load(str(tmp_path / "g.fa"))
    assert idx.fwd.seq_len == idx.bns.l_pac
    assert idx.rev.seq_len == idx.bns.l_pac
    assert idx.fwd.sa[0] == 0xFFFFFFFF
    # pac round trip: reverse pac is the reverse of pac
    assert np.array_equal(idx.pac[::-1],
                          __import__("nabwa_tpu.index.pack", fromlist=["read_pac"]).read_pac(str(tmp_path / "g.fa.rpac")))


@pytest.mark.parametrize("n,block", [
    (4097, 100),           # partial tail block, many blocks
    (100000, 8192),
])
def test_incremental_bwt_index_bit_identical(tmp_path, monkeypatch,
                                             n, block):
    """The blockwise incremental builder (native/bwtgen.cpp, the
    low-memory bwt_gen-parity path chosen above 50 Mbp) must produce the
    same eight index files as the SA-IS path — which is itself
    bit-identical with the reference (test above)."""
    from nabwa_tpu.index import native as native_mod
    if not native_mod.have_native():
        pytest.skip("native library unavailable")
    fa, _ = genomes.random_genome(n, seed=n + 1, n_frac=0.01, n_seqs=2)
    (tmp_path / "a.fa").write_bytes(fa)
    (tmp_path / "b.fa").write_bytes(fa)
    monkeypatch.delenv("NABWA_BWT_INC", raising=False)
    build_index(str(tmp_path / "a.fa"))
    monkeypatch.setenv("NABWA_BWT_INC", "1")
    monkeypatch.setenv("NABWA_BWT_INC_BLOCK", str(block))
    build_index(str(tmp_path / "b.fa"))
    for ext in EXTS:
        a = (tmp_path / ("a.fa" + ext)).read_bytes()
        b = (tmp_path / ("b.fa" + ext)).read_bytes()
        assert a == b, f"{ext} differs"


def test_incremental_bwt_repetitive_ties():
    """R-tie comparator: repeat structures spanning block boundaries
    (poly-A, short tandem periods) sort identically to SA-IS."""
    from nabwa_tpu.index import native as native_mod
    from nabwa_tpu.index import sa as samod
    if not native_mod.have_native():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    cases = [
        np.zeros(5000, np.uint8),
        np.tile(np.array([0, 1], np.uint8), 3000),
        np.tile(rng.integers(0, 4, 7).astype(np.uint8), 2000),
    ]
    for codes in cases:
        ref_bwt, ref_prim, _, _ = samod.bwt_from_codes(codes)
        bwt, prim = native_mod.bwt_inc_native(codes, 97)
        assert prim == ref_prim
        assert np.array_equal(bwt, ref_bwt)
