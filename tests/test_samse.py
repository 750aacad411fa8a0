"""End-to-end samse: byte-identical SAM vs reference `bwa aln | samse`."""

import subprocess

import numpy as np
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.models.aln import AlnEngine
from nabwa_tpu.models import samse as samse_mod
from nabwa_tpu.io import fastq, sai
from nabwa_tpu.options import GapOpt
from nabwa_tpu.utils.rand48 import Rand48

from . import refbin, genomes


def run_pipeline(tmp_path, glen, n_reads, read_len, err=0.0, indel=0.0,
                 seed=11, aln_args=(), samse_args=(), opt=None, n_occ=3,
                 n_frac=0.0, trim_qual=0):
    fa, seqs = genomes.random_genome(glen, seed=seed, n_frac=n_frac)
    genome_seq = b"".join(seqs)
    # sample reads only from non-N stretch: use full seq; reads over N
    # regions exercise the N handling
    fq = genomes.sample_reads(seqs[0], n_reads, read_len, seed=seed + 1,
                              err_rate=err, indel_rate=indel)
    (tmp_path / "g.fa").write_bytes(fa)
    (tmp_path / "r.fq").write_bytes(fq)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])
    refbin.run_bwa(["aln"] + list(aln_args) +
                   [str(tmp_path / "g.fa"), str(tmp_path / "r.fq"),
                    "-f", str(tmp_path / "ref.sai")])
    refbin.run_bwa(["samse"] + list(samse_args) +
                   [str(tmp_path / "g.fa"), str(tmp_path / "ref.sai"),
                    str(tmp_path / "r.fq"), "-f", str(tmp_path / "ref.sam")])
    ref_sam = (tmp_path / "ref.sam").read_text()

    opt = opt or GapOpt()
    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(tmp_path / "r.fq")),
                                   1 << 20, mode=opt.mode,
                                   trim_qual=opt.trim_qual)
    eng = AlnEngine(idx, opt)
    results = eng.run_chunk(reads)
    per_read = [alns for alns, hw in results]
    header = samse_mod.sam_header(idx.bns, version="ref")
    rng = Rand48(idx.bns.seed)
    lines = samse_mod.samse(eng, reads, per_read, opt, n_occ=n_occ, rng=rng)
    our_sam = header + "".join(l + "\n" for l in lines)
    return ref_sam, our_sam


def _diff_check(ref_sam, our_sam):
    if ref_sam != our_sam:
        rl = ref_sam.splitlines()
        ol = our_sam.splitlines()
        for i, (a, b) in enumerate(zip(rl, ol)):
            assert a == b, f"line {i}:\nref: {a}\nour: {b}"
        assert len(rl) == len(ol), f"line count {len(rl)} vs {len(ol)}"


def test_samse_exact_36bp(tmp_path):
    ref_sam, our_sam = run_pipeline(tmp_path, 20000, 60, 36)
    _diff_check(ref_sam, our_sam)


def test_samse_mismatch_50bp(tmp_path):
    ref_sam, our_sam = run_pipeline(tmp_path, 30000, 80, 50, err=0.03,
                                    seed=71)
    _diff_check(ref_sam, our_sam)


def test_samse_gapped(tmp_path):
    ref_sam, our_sam = run_pipeline(
        tmp_path, 30000, 60, 100, err=0.02, indel=0.6, seed=83,
        aln_args=["-n", "4", "-o", "1"],
        opt=GapOpt(max_diff=4, fnr=-1.0, max_gapo=1))
    _diff_check(ref_sam, our_sam)


def test_samse_with_ns_in_genome(tmp_path):
    ref_sam, our_sam = run_pipeline(tmp_path, 20000, 60, 40, err=0.02,
                                    seed=97, n_frac=0.02)
    _diff_check(ref_sam, our_sam)


def test_samse_repeats_and_multi(tmp_path):
    # duplicated genome halves -> repeat hits, XA tags, drand48 sampling
    import numpy as _np
    rng = _np.random.default_rng(5)
    half = rng.integers(0, 4, size=8000)
    seq = _np.concatenate([half, half])
    fa_seq = _np.frombuffer(b"ACGT", dtype=_np.uint8)[seq]
    fa = b">dup chrom\n" + b"\n".join(
        fa_seq.tobytes()[i:i + 70] for i in range(0, len(seq), 70)) + b"\n"
    fq = genomes.sample_reads(fa_seq.tobytes(), 50, 36, seed=6)
    (tmp_path / "g.fa").write_bytes(fa)
    (tmp_path / "r.fq").write_bytes(fq)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])
    refbin.run_bwa(["aln", str(tmp_path / "g.fa"), str(tmp_path / "r.fq"),
                    "-f", str(tmp_path / "ref.sai")])
    refbin.run_bwa(["samse", str(tmp_path / "g.fa"),
                    str(tmp_path / "ref.sai"), str(tmp_path / "r.fq"),
                    "-f", str(tmp_path / "ref.sam")])
    ref_sam = (tmp_path / "ref.sam").read_text()

    opt = GapOpt()
    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(tmp_path / "r.fq")),
                                   1 << 20)
    eng = AlnEngine(idx, opt)
    per_read = [alns for alns, hw in eng.run_chunk(reads)]
    header = samse_mod.sam_header(idx.bns, version="ref")
    lines = samse_mod.samse(eng, reads, per_read, opt,
                            rng=Rand48(idx.bns.seed))
    our_sam = header + "".join(l + "\n" for l in lines)
    _diff_check(ref_sam, our_sam)
