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
