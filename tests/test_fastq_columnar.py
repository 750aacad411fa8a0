"""Columnar native FASTQ parse (native/fastq.cpp + io.fastq.ReadBatch)
vs the generic Python reader: identical Read fields on trimming,
Illumina-1.3 shift, Casava filtering, /1-/2 name strips and comments —
and identical samse SAM bytes when the columnar batch feeds the native
post pipeline."""

import numpy as np
import pytest

from nabwa_tpu.constants import (BWA_MODE_COMPREAD, BWA_MODE_IL13,
                                 BWA_MODE_CFY)
from nabwa_tpu.index import native as native_mod
from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.io import fastq
from nabwa_tpu.models import post_native
from nabwa_tpu.models.aln import AlnEngine
from nabwa_tpu.options import GapOpt
from nabwa_tpu.utils.rand48 import Rand48

from . import genomes

pytestmark = pytest.mark.skipif(not native_mod.have_native(),
                                reason="native library unavailable")


def _mk_fq(tmp_path, n=60, seed=5, comments=True, long_short_mix=True):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        L = int(rng.integers(30, 120)) if long_short_mix else 75
        seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=L,
                               p=[.24, .24, .24, .24, .04]).astype(np.uint8))
        qual = bytes(rng.integers(35, 74, size=L).astype(np.uint8))
        suffix = b"/1" if i % 3 == 0 else (b"/2" if i % 3 == 1 else b"")
        com = b""
        if comments and i % 2:
            # every other read Casava-filtered
            com = b" 1:Y:0:ATC" if i % 4 == 1 else b" 1:N:0:ATC"
        recs.append(b"@r%d%s%s\n%s\n+\n%s\n"
                    % (i, suffix, com, seq, qual))
    p = tmp_path / "c.fq"
    p.write_bytes(b"".join(recs))
    return str(p)


def _pull_both(path, mode, trim_qual):
    col = fastq.ColumnarFastq.open(path, mode)
    assert col is not None
    got = col.pull(1 << 20, trim_qual)
    assert got is not None, "native parse rejected the input"
    want = fastq.read_fastq_batch(fastq.iter_fastq(path), 1 << 20,
                                  mode=mode, trim_qual=trim_qual)
    return got, want


def _assert_reads_equal(got, want):
    assert len(got) == len(want)
    for i, w in enumerate(want):
        g = got[i]
        assert g.name == w.name, i
        np.testing.assert_array_equal(g.seq, w.seq, err_msg=f"seq {i}")
        np.testing.assert_array_equal(g.rseq, w.rseq, err_msg=f"rseq {i}")
        np.testing.assert_array_equal(g.qual, w.qual, err_msg=f"qual {i}")
        np.testing.assert_array_equal(g.full_codes, w.full_codes)
        assert g.full_len == w.full_len and g.clip_len == w.clip_len, i


@pytest.mark.parametrize("mode,trim", [
    (BWA_MODE_COMPREAD, 0),
    (BWA_MODE_COMPREAD, 20),
    (BWA_MODE_COMPREAD | BWA_MODE_IL13, 15),
    (BWA_MODE_COMPREAD | BWA_MODE_CFY, 0),
    (0, 0),                      # color-space: no complement
])
def test_parse_matches_python(tmp_path, mode, trim):
    path = _mk_fq(tmp_path)
    got, want = _pull_both(path, mode, trim)
    _assert_reads_equal(got, want)


def test_windows_and_columns(tmp_path):
    path = _mk_fq(tmp_path, n=40, comments=False)
    col = fastq.ColumnarFastq.open(path, BWA_MODE_COMPREAD)
    w1 = col.pull(25, 0)
    w2 = col.pull(25, 0)
    it = fastq.iter_fastq(path)
    want1 = fastq.read_fastq_batch(it, 25)
    want2 = fastq.read_fastq_batch(it, 25)
    _assert_reads_equal(w1, want1)
    _assert_reads_equal(w2, want2)
    # columnar accessors vs per-read fields on a non-zero-based window
    nf, no = w2.name_bytes()
    for i, r in enumerate(want2):
        assert nf[no[i]:no[i + 1]].tobytes().decode() == r.name
    strand = np.arange(len(w2)) % 2
    flat, off = w2.aligned_codes(strand)
    for i, r in enumerate(want2):
        want_codes = r.rseq if strand[i] else r.seq[::-1]
        np.testing.assert_array_equal(flat[off[i]:off[i + 1]], want_codes)


def test_samse_bytes_columnar_identical(tmp_path):
    fa, seqs = genomes.random_genome(30000, seed=21, n_frac=0.002)
    (tmp_path / "g.fa").write_bytes(fa)
    build_index(str(tmp_path / "g.fa"))
    g = b"".join(l for l in fa.split(b"\n") if not l.startswith(b">"))
    g = g.replace(b"N", b"A")
    fq_b = genomes.sample_reads(g, 50, 60, seed=22, err_rate=0.03)
    (tmp_path / "r.fq").write_bytes(fq_b)

    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    opt = GapOpt()
    eng = AlnEngine(idx, opt)
    col = fastq.ColumnarFastq.open(str(tmp_path / "r.fq"), opt.mode)
    batch = col.pull(1 << 20, 0)
    obj = fastq.read_fastq_batch(fastq.iter_fastq(str(tmp_path / "r.fq")),
                                 1 << 20)
    res = eng.run_chunk(obj)
    alns = [a for a, hw in res]
    b1 = post_native.samse_bytes(eng, batch, alns, opt,
                                 rng=Rand48(idx.bns.seed))
    b2 = post_native.samse_bytes(eng, obj, alns, opt,
                                 rng=Rand48(idx.bns.seed))
    assert b1 is not None and b1 == b2


def test_sampe_bytes_columnar_identical(tmp_path):
    from nabwa_tpu.models import sampe as pe
    from nabwa_tpu.options import PeOpt

    fa, seqs = genomes.random_genome(40000, seed=31, n_frac=0.002)
    (tmp_path / "g.fa").write_bytes(fa)
    build_index(str(tmp_path / "g.fa"))
    g = b"".join(l for l in fa.split(b"\n") if not l.startswith(b">"))
    g = g.replace(b"N", b"A")
    rng = np.random.default_rng(32)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    f1, f2 = [], []
    for i in range(40):
        isz = max(160, int(rng.normal(250, 30)))
        start = int(rng.integers(0, len(g) - isz))
        frag = g[start:start + isz]
        r1, r2 = bytearray(frag[:70]), \
            bytearray(frag[-70:].translate(comp)[::-1])
        for r in (r1, r2):
            for _ in range(int(rng.integers(0, 3))):
                p = int(rng.integers(0, 70))
                r[p] = b"ACGT"[int(rng.integers(0, 4))]
        if i % 9 == 4:    # shred a mate to force rescue
            for _ in range(25):
                p = int(rng.integers(0, 70))
                r2[p] = b"ACGT"[int(rng.integers(0, 4))]
        q = b"I" * 70
        f1.append(b"@p%d/1\n%s\n+\n%s\n" % (i, bytes(r1), q))
        f2.append(b"@p%d/2\n%s\n+\n%s\n" % (i, bytes(r2), q))
    (tmp_path / "p1.fq").write_bytes(b"".join(f1))
    (tmp_path / "p2.fq").write_bytes(b"".join(f2))

    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    gopt, popt = GapOpt(), PeOpt()
    eng = AlnEngine(idx, gopt)
    objs, batches, alns = [], [], []
    for e in (1, 2):
        path = str(tmp_path / f"p{e}.fq")
        obj = fastq.read_fastq_batch(fastq.iter_fastq(path), 1 << 20)
        col = fastq.ColumnarFastq.open(path, gopt.mode)
        batch = col.pull(1 << 20, 0)
        assert batch is not None and len(batch) == len(obj)
        objs.append(obj)
        batches.append(batch)
        alns.append([a for a, hw in eng.run_chunk(obj)])
    r1, ii1 = pe.sampe(eng, tuple(batches), tuple(alns), gopt, popt,
                       Rand48(idx.bns.seed))
    r2, ii2 = pe.sampe(eng, tuple(objs), tuple(alns), gopt, popt,
                       Rand48(idx.bns.seed))
    assert isinstance(r1, bytes) and r1 == r2
