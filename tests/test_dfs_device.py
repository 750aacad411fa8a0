"""Batched device DFS vs reference `bwa aln` .sai output."""

import numpy as np
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.models.aln import AlnEngine
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
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(tmp_path / "r.fq")),
                                   1 << 20)
    return idx, reads, tmp_path / "ref.sai"


def _compare(idx, reads, ref_sai, opt, **eng_kw):
    ref_opt, ref_alns = sai.read_sai(str(ref_sai))
    eng = AlnEngine(idx, opt, **eng_kw)
    got = eng.run_chunk(reads)
    assert len(got) == len(ref_alns)
    n_fallback = 0
    for i, ((alns, hw), ref_recs) in enumerate(zip(got, ref_alns)):
        want = sai.aln_records_to_tuples(ref_recs)
        have = [tuple(h) for h in alns]
        assert have == want, f"read {i} ({reads[i].name}): {have} != {want}"
    return n_fallback


def test_device_exact_36bp(tmp_path):
    idx, reads, ref_sai = _prep(tmp_path)
    _compare(idx, reads, ref_sai, GapOpt())


def test_device_mismatch(tmp_path):
    idx, reads, ref_sai = _prep(tmp_path, n_reads=48, read_len=50, err=0.03,
                                seed=23)
    _compare(idx, reads, ref_sai, GapOpt())


def test_device_gapped(tmp_path):
    idx, reads, ref_sai = _prep(tmp_path, n_reads=32, read_len=100, err=0.02,
                                indel=0.5, seed=31,
                                aln_args=["-n", "4", "-o", "1"])
    _compare(idx, reads, ref_sai, GapOpt(max_diff=4, fnr=-1.0, max_gapo=1))


def test_device_seeded(tmp_path):
    idx, reads, ref_sai = _prep(tmp_path, n_reads=32, read_len=75, err=0.03,
                                seed=47, aln_args=["-l", "20"])
    _compare(idx, reads, ref_sai, GapOpt(seed_len=20))


def test_device_small_stack_fallback(tmp_path):
    # tiny device stack forces the scalar fallback path for some reads
    idx, reads, ref_sai = _prep(tmp_path, n_reads=24, read_len=60, err=0.04,
                                seed=59)
    _compare(idx, reads, ref_sai, GapOpt(), stack_cap=64)
