"""Native samse post-processing (native/post.cpp + models/post_native.py)
vs the per-read Python oracle (models/samse.samse): identical SAM text on
inputs that exercise multi-hits/XA, ambiguity holes in MD/XN, multiple
contigs, quality trimming, and unmapped reads."""

import numpy as np
import pytest

from nabwa_tpu.index import native as native_mod
from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.io import fastq
from nabwa_tpu.models import post_native
from nabwa_tpu.models import samse as se
from nabwa_tpu.models.aln import AlnEngine
from nabwa_tpu.options import GapOpt
from nabwa_tpu.utils.rand48 import Rand48

from . import genomes

pytestmark = pytest.mark.skipif(not native_mod.have_native(),
                                reason="native library unavailable")


def _run_both(tmp_path, *, glen=40_000, n_reads=120, read_len=48,
              err=0.03, n_frac=0.002, n_seqs=2, trim_qual=0, n_occ=3,
              rg_id=None, seed=77, with_repeat=True):
    fa, seqs = genomes.random_genome(glen, seed=seed, n_frac=n_frac,
                                     n_seqs=n_seqs)
    if with_repeat:
        # a tandem block so some reads land REPEAT hits (XA + X0>1)
        block = seqs[0][1000:1080]
        fa = fa.replace(seqs[0][:200], block * 2 + seqs[0][200:400][:40],
                        1)
    (tmp_path / "g.fa").write_bytes(fa)
    build_index(str(tmp_path / "g.fa"))
    g = b"".join(l for l in fa.split(b"\n") if not l.startswith(b">"))
    g = g.replace(b"N", b"A")
    fq = genomes.sample_reads(g, n_reads, read_len, seed=seed + 1,
                              err_rate=err)
    # degrade tail quals so trim_qual bites
    if trim_qual:
        lines = fq.split(b"\n")
        for i in range(3, len(lines), 4):
            if lines[i]:
                lines[i] = lines[i][:-8] + b"########"[:8]
        fq = b"\n".join(lines)
    (tmp_path / "r.fq").write_bytes(fq)

    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    opt = GapOpt()
    opt.trim_qual = trim_qual
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(tmp_path / "r.fq")),
                                   1 << 20, mode=opt.mode,
                                   trim_qual=trim_qual)
    eng = AlnEngine(idx, opt)
    res = eng.run_chunk(reads)
    alns = [a for a, hw in res]

    rng1 = Rand48(idx.bns.seed)
    want = [l + "\n" for l in se.samse(eng, reads, alns, opt, n_occ=n_occ,
                                       rng=rng1, rg_id=rg_id)]
    rng2 = Rand48(idx.bns.seed)
    blob = post_native.samse_bytes(eng, reads, alns, opt, n_occ=n_occ,
                                   rng=rng2, rg_id=rg_id)
    assert blob is not None
    got = blob.decode("latin1").splitlines(keepends=True)
    assert len(got) == len(want)
    for i, (a, b) in enumerate(zip(got, want)):
        assert a == b, f"line {i} ({reads[i].name}):\n got {a!r}\nwant {b!r}"
    # the drand48 stream must advance identically
    assert rng1.x == rng2.x


def test_native_samse_matches_oracle(tmp_path):
    _run_both(tmp_path)


def test_native_samse_trimming_and_rg(tmp_path):
    _run_both(tmp_path, trim_qual=20, rg_id="rgX", n_reads=80, seed=99)


def test_native_samse_no_multi(tmp_path):
    _run_both(tmp_path, n_occ=0, n_reads=60, seed=13, n_frac=0.01)


def test_threaded_emit_md_identical(tmp_path, monkeypatch):
    """NABWA_POST_THREADS forces the range-parallel md_batch/sam_emit_batch
    path (auto mode self-caps below 2048 rows); output must stay
    byte-identical to the Python oracle on the same multi-hit input."""
    monkeypatch.setenv("NABWA_POST_THREADS", "3")
    _run_both(tmp_path, n_reads=150, seed=41)
