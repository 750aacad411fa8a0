"""End-to-end sampe: byte-identical SAM vs reference `bwa aln ×2 | sampe`."""

import numpy as np
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.models.aln import AlnEngine
from nabwa_tpu.models import samse as samse_mod
from nabwa_tpu.models import sampe as sampe_mod
from nabwa_tpu.io import fastq
from nabwa_tpu.options import GapOpt, PeOpt
from nabwa_tpu.utils.rand48 import Rand48

from . import refbin, genomes


def make_pairs(genome_seq, n_pairs, read_len, isize_mean, isize_std, seed,
               err_rate=0.0, indel_rate=0.0, frac_broken=0.0):
    """Proper FR pairs + a fraction of broken/distant mates."""
    comp = dict(zip(b"ACGT", b"TGCA"))
    rng = np.random.default_rng(seed)
    g = np.frombuffer(genome_seq, dtype=np.uint8)
    fq1, fq2 = [], []
    for i in range(n_pairs):
        isize = max(int(rng.normal(isize_mean, isize_std)), read_len + 10)
        start = int(rng.integers(0, len(g) - isize - 1))
        frag = g[start:start + isize]
        r1 = bytearray(frag[:read_len].tobytes())
        r2 = bytearray(frag[-read_len:].tobytes())
        r2 = bytearray(comp.get(b, b) for b in reversed(r2))
        for r in (r1, r2):
            for j in range(read_len):
                if rng.random() < err_rate:
                    r[j] = genomes.BASES[int(rng.integers(0, 4))]
        if frac_broken > 0 and rng.random() < frac_broken:
            # scramble read 2 so it cannot map -> mate rescue territory
            mode = rng.random()
            if mode < 0.5:
                for j in range(0, read_len, 2):
                    r2[j] = genomes.BASES[int(rng.integers(0, 4))]
            else:  # move it far away (discordant)
                far = int(rng.integers(0, len(g) - read_len))
                r2 = bytearray(g[far:far + read_len].tobytes())
        q1 = bytes([33 + int(q) for q in rng.integers(25, 40, read_len)])
        q2 = bytes([33 + int(q) for q in rng.integers(25, 40, read_len)])
        fq1.append(b"@pair%d/1\n%s\n+\n%s\n" % (i, bytes(r1), q1))
        fq2.append(b"@pair%d/2\n%s\n+\n%s\n" % (i, bytes(r2), q2))
    return b"".join(fq1), b"".join(fq2)


def run_pe(tmp_path, glen=60000, n_pairs=120, read_len=50, err=0.01,
           seed=301, frac_broken=0.1, aln_args=(), sampe_args=(),
           opt=None, popt=None):
    fa, seqs = genomes.random_genome(glen, seed=seed)
    fq1, fq2 = make_pairs(seqs[0], n_pairs, read_len, 250, 30, seed + 1,
                          err_rate=err, frac_broken=frac_broken)
    (tmp_path / "g.fa").write_bytes(fa)
    (tmp_path / "r1.fq").write_bytes(fq1)
    (tmp_path / "r2.fq").write_bytes(fq2)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])
    for end in (1, 2):
        refbin.run_bwa(["aln"] + list(aln_args) +
                       [str(tmp_path / "g.fa"), str(tmp_path / f"r{end}.fq"),
                        "-f", str(tmp_path / f"r{end}.sai")])
    refbin.run_bwa(["sampe"] + list(sampe_args) +
                   [str(tmp_path / "g.fa"),
                    str(tmp_path / "r1.sai"), str(tmp_path / "r2.sai"),
                    str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"),
                    "-f", str(tmp_path / "ref.sam")])
    ref_sam = (tmp_path / "ref.sam").read_text()

    opt = opt or GapOpt()
    popt = popt or PeOpt()
    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    eng = AlnEngine(idx, opt)
    reads = []
    alns = []
    for end in (1, 2):
        rd = fastq.read_fastq_batch(
            fastq.iter_fastq(str(tmp_path / f"r{end}.fq")), 1 << 20,
            mode=opt.mode, trim_qual=opt.trim_qual)
        reads.append(rd)
        alns.append([a for a, hw in eng.run_chunk(rd)])
    rng = Rand48(idx.bns.seed)
    lines, ii = sampe_mod.sampe(eng, tuple(reads), tuple(alns), opt, popt,
                                rng)
    our_sam = samse_mod.sam_header(idx.bns, version="ref") \
        + (lines.decode("latin1") if isinstance(lines, bytes)
           else "".join(l + "\n" for l in lines))
    return ref_sam, our_sam


def _diff(ref_sam, our_sam):
    if ref_sam != our_sam:
        rl, ol = ref_sam.splitlines(), our_sam.splitlines()
        for i, (a, b) in enumerate(zip(rl, ol)):
            assert a == b, f"line {i}:\nref: {a}\nour: {b}"
        assert len(rl) == len(ol)


def test_sampe_basic(tmp_path):
    ref_sam, our_sam = run_pe(tmp_path)
    _diff(ref_sam, our_sam)


def test_sampe_no_rescue(tmp_path):
    ref_sam, our_sam = run_pe(tmp_path, seed=401, sampe_args=["-s"],
                              popt=PeOpt(is_sw=0))
    _diff(ref_sam, our_sam)


def test_sampe_repeats(tmp_path):
    # duplicated genome -> repeat pairing, hash memoization path
    rng = np.random.default_rng(17)
    half = rng.integers(0, 4, size=15000)
    seq = np.concatenate([half, half, rng.integers(0, 4, size=15000)])
    fa_seq = np.frombuffer(b"ACGT", dtype=np.uint8)[seq]
    fa = b">dup\n" + b"\n".join(
        fa_seq.tobytes()[i:i + 70] for i in range(0, len(seq), 70)) + b"\n"
    fq1, fq2 = make_pairs(fa_seq.tobytes(), 100, 40, 200, 25, 19,
                          err_rate=0.01, frac_broken=0.05)
    (tmp_path / "g.fa").write_bytes(fa)
    (tmp_path / "r1.fq").write_bytes(fq1)
    (tmp_path / "r2.fq").write_bytes(fq2)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])
    for end in (1, 2):
        refbin.run_bwa(["aln", str(tmp_path / "g.fa"),
                        str(tmp_path / f"r{end}.fq"),
                        "-f", str(tmp_path / f"r{end}.sai")])
    refbin.run_bwa(["sampe", str(tmp_path / "g.fa"),
                    str(tmp_path / "r1.sai"), str(tmp_path / "r2.sai"),
                    str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"),
                    "-f", str(tmp_path / "ref.sam")])
    ref_sam = (tmp_path / "ref.sam").read_text()
    opt, popt = GapOpt(), PeOpt()
    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    eng = AlnEngine(idx, opt)
    reads, alns = [], []
    for end in (1, 2):
        rd = fastq.read_fastq_batch(
            fastq.iter_fastq(str(tmp_path / f"r{end}.fq")), 1 << 20)
        reads.append(rd)
        alns.append([a for a, hw in eng.run_chunk(rd)])
    lines, _ = sampe_mod.sampe(eng, tuple(reads), tuple(alns), opt, popt,
                               Rand48(idx.bns.seed))
    our_sam = samse_mod.sam_header(idx.bns, version="ref") \
        + (lines.decode("latin1") if isinstance(lines, bytes)
           else "".join(l + "\n" for l in lines))
    _diff(ref_sam, our_sam)
