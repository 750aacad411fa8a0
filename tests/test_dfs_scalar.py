"""Scalar DFS oracle vs reference `bwa aln` .sai output (bit-level)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.refmodel.fm_scalar import ScalarFm
from nabwa_tpu.refmodel.aln_scalar import aln_batch
from nabwa_tpu.io import fastq, sai
from nabwa_tpu.options import GapOpt

from . import refbin, genomes


def _prep(tmp_path, glen=20000, n_reads=60, read_len=36, err=0.0, indel=0.0,
          seed=11, aln_args=()):
    fa, seqs = genomes.random_genome(glen, seed=seed)
    fq = genomes.sample_reads(seqs[0], n_reads, read_len, seed=seed + 1,
                              err_rate=err, indel_rate=indel)
    (tmp_path / "g.fa").write_bytes(fa)
    (tmp_path / "r.fq").write_bytes(fq)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])
    refbin.run_bwa(["aln"] + list(aln_args) +
                   [str(tmp_path / "g.fa"), str(tmp_path / "r.fq"),
                    "-f", str(tmp_path / "ref.sai")])
    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    fms = (ScalarFm(idx.fwd.bwt, idx.fwd.primary, idx.fwd.l2,
                    idx.fwd.seq_len, idx.fwd.sa, idx.fwd.sa_intv),
           ScalarFm(idx.rev.bwt, idx.rev.primary, idx.rev.l2,
                    idx.rev.seq_len, idx.rev.sa, idx.rev.sa_intv))
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(tmp_path / "r.fq")),
                                   1 << 20)
    return fms, reads, tmp_path / "ref.sai"


def _compare(fms, reads, ref_sai, opt):
    ref_opt, ref_alns = sai.read_sai(str(ref_sai))
    got = aln_batch(fms, reads, opt)
    assert len(got) == len(ref_alns)
    for i, ((alns, hw), ref_recs) in enumerate(zip(got, ref_alns)):
        want = sai.aln_records_to_tuples(ref_recs)
        have = [tuple(h) for h in alns]
        assert have == want, f"read {i} ({reads[i].name}): {have} != {want}"


def test_exact_reads_36bp(tmp_path):
    fms, reads, ref_sai = _prep(tmp_path)
    _compare(fms, reads, ref_sai, GapOpt())


def test_mismatch_reads(tmp_path):
    fms, reads, ref_sai = _prep(tmp_path, n_reads=80, read_len=50, err=0.03,
                                seed=23)
    _compare(fms, reads, ref_sai, GapOpt())


def test_gapped_n4_o1(tmp_path):
    fms, reads, ref_sai = _prep(tmp_path, n_reads=50, read_len=100, err=0.02,
                                indel=0.5, seed=31, aln_args=["-n", "4", "-o", "1"])
    opt = GapOpt(max_diff=4, fnr=-1.0, max_gapo=1)
    _compare(fms, reads, ref_sai, opt)


def test_seeded_search(tmp_path):
    # read_len > seed_len triggers the seed-width pruning path
    fms, reads, ref_sai = _prep(tmp_path, n_reads=40, read_len=75, err=0.03,
                                seed=47, aln_args=["-l", "20"])
    opt = GapOpt(seed_len=20)
    _compare(fms, reads, ref_sai, opt)


def test_gap_extensions_e6(tmp_path):
    fms, reads, ref_sai = _prep(tmp_path, n_reads=40, read_len=80, err=0.02,
                                indel=0.8, seed=53,
                                aln_args=["-e", "6", "-n", "5"])
    opt = GapOpt(max_diff=5, fnr=-1.0)
    opt.max_gape = 6
    opt.mode &= ~0x01  # -e clears BWA_MODE_GAPE (bwtaln.c:342-345)
    _compare(fms, reads, ref_sai, opt)
