"""bam2bam single-host: identical decompressed BAM vs reference
`bwa bam2bam -g ref -t 1` (sequential two-pass path)."""

import subprocess

import numpy as np
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.models.aln import AlnEngine
from nabwa_tpu.models import bam2bam as b2b
from nabwa_tpu.io import bam as bamio
from nabwa_tpu.options import GapOpt, PeOpt
from nabwa_tpu.utils.rand48 import Rand48

from . import refbin, genomes
from .test_sampe import make_pairs


def make_input_bam(path, fq1, fq2, singles_fq=None, rg=True):
    """Unaligned BAM: interleaved pairs (+ optional singletons)."""
    recs = []

    def fq_records(fq):
        lines = fq.strip().split(b"\n")
        for i in range(0, len(lines), 4):
            yield (lines[i][1:].decode().split("/")[0],
                   lines[i + 1].decode(), lines[i + 3].decode())

    tags = b"RGZrg1\x00" if rg else b""
    for (n1, s1, q1), (n2, s2, q2) in zip(fq_records(fq1), fq_records(fq2)):
        assert n1 == n2
        recs.append(bamio.sam_to_bamrec(
            n1, bamio.BAM_FPAIRED | bamio.BAM_FREAD1 | bamio.BAM_FUNMAP | 8,
            -1, -1, 0, [], -1, -1, 0, s1, q1, tags))
        recs.append(bamio.sam_to_bamrec(
            n2, bamio.BAM_FPAIRED | bamio.BAM_FREAD2 | bamio.BAM_FUNMAP | 8,
            -1, -1, 0, [], -1, -1, 0, s2, q2, tags))
    if singles_fq:
        for n, s, q in fq_records(singles_fq):
            recs.append(bamio.sam_to_bamrec(
                n, bamio.BAM_FUNMAP, -1, -1, 0, [], -1, -1, 0, s, q, tags))
    # unmapped records: tid=-1 → bin/pos conventions
    for r in recs:
        r.bin = 0
    bamio.make_bam(path, [], recs,
                   text="@HD\tVN:1.4\n@RG\tID:rg1\tSM:test\n")
    return len(recs)


def dump_records(path):
    rd = bamio.BamReader(path)
    out = []
    while True:
        r = rd.read1()
        if r is None:
            break
        out.append((r.tid, r.pos, r.bin, r.qual, r.flag, r.l_qname,
                    r.n_cigar, r.l_qseq, r.mtid, r.mpos, r.isize,
                    bytes(r.data)))
    return rd.text, out


def test_bam2bam_sequential(tmp_path):
    fa, seqs = genomes.random_genome(50000, seed=201)
    fq1, fq2 = make_pairs(seqs[0], 80, 50, 250, 30, 202, err_rate=0.01,
                          frac_broken=0.15)
    singles = genomes.sample_reads(seqs[0], 20, 40, seed=203, err_rate=0.02)
    (tmp_path / "g.fa").write_bytes(fa)
    make_input_bam(str(tmp_path / "in.bam"), fq1, fq2, singles)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])

    argv = ["bam2bam", "-g", str(tmp_path / "g.fa"), "-t", "1",
            "--temp-dir", str(tmp_path), "-f", str(tmp_path / "ref.bam"),
            str(tmp_path / "in.bam")]
    bwa = refbin.ensure_bwa()
    subprocess.run([bwa] + argv, check=True, capture_output=True)

    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    opt, popt = GapOpt(), PeOpt()
    eng = AlnEngine(idx, opt)
    b2b.bam2bam(eng, str(tmp_path / "in.bam"), str(tmp_path / "our.bam"),
                opt, popt, Rand48(idx.bns.seed), argv=argv, version="ref")

    ref_text, ref_recs = dump_records(str(tmp_path / "ref.bam"))
    our_text, our_recs = dump_records(str(tmp_path / "our.bam"))
    assert ref_text == our_text
    assert len(ref_recs) == len(our_recs)
    for i, (a, b) in enumerate(zip(ref_recs, our_recs)):
        assert a == b, f"record {i}:\nref: {a}\nour: {b}"
