"""bwasw long-read engine: byte-identical SAM vs reference `bwa bwasw`."""

import numpy as np
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.models import bwasw as bw

from . import refbin, genomes


def make_long_reads(genome_seq, n_reads, read_len, seed, err=0.02,
                    indel=0.3, chimera=0.1, with_n=0.1):
    comp = dict(zip(b"ACGT", b"TGCA"))
    rng = np.random.default_rng(seed)
    g = np.frombuffer(genome_seq, dtype=np.uint8)
    out = []
    for i in range(n_reads):
        start = int(rng.integers(0, len(g) - read_len))
        r = bytearray(g[start:start + read_len].tobytes())
        for j in range(len(r)):
            p = rng.random()
            if p < err:
                r[j] = genomes.BASES[int(rng.integers(0, 4))]
        if rng.random() < indel:
            pos = int(rng.integers(20, len(r) - 20))
            ln = int(rng.integers(1, 8))
            if rng.random() < 0.5:
                del r[pos:pos + ln]
            else:
                ins = bytes(genomes.BASES[int(rng.integers(0, 4))]
                            for _ in range(ln))
                r[pos:pos] = ins
        if rng.random() < chimera:
            far = int(rng.integers(0, len(g) - 200))
            r[-150:] = g[far:far + 150].tobytes()
        if rng.random() < with_n:
            pos = int(rng.integers(0, len(r) - 5))
            r[pos:pos + 3] = b"NNN"
        if rng.random() < 0.5:
            r = bytearray(comp.get(b, b) for b in reversed(r))
        qual = bytes([33 + int(q) for q in rng.integers(15, 40, len(r))])
        out.append(b"@lr%d\n%s\n+\n%s\n" % (i, bytes(r), qual))
    return b"".join(out)


def test_bwasw_500bp(tmp_path):
    fa, seqs = genomes.random_genome(80000, seed=601, n_seqs=2)
    fq = make_long_reads(seqs[0], 25, 500, 602)
    (tmp_path / "g.fa").write_bytes(fa)
    (tmp_path / "r.fq").write_bytes(fq)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])
    res = refbin.run_bwa(["bwasw", str(tmp_path / "g.fa"),
                          str(tmp_path / "r.fq")])
    ref_sam = res.stdout.decode()

    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    reads = []
    lines = fq.decode().strip().split("\n")
    for i in range(0, len(lines), 4):
        reads.append((lines[i][1:], lines[i + 1], lines[i + 3]))
    our_sam = bw.bwasw(idx, reads)
    if ref_sam != our_sam:
        rl, ol = ref_sam.splitlines(), our_sam.splitlines()
        for i, (a, b) in enumerate(zip(rl, ol)):
            assert a == b, f"line {i}:\nref: {a}\nour: {b}"
        assert len(rl) == len(ol), f"{len(rl)} vs {len(ol)} lines"


def test_bwasw_1kb(tmp_path):
    fa, seqs = genomes.random_genome(120000, seed=701)
    fq = make_long_reads(seqs[0], 12, 1000, 702, err=0.03, indel=0.5)
    (tmp_path / "g.fa").write_bytes(fa)
    (tmp_path / "r.fq").write_bytes(fq)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])
    res = refbin.run_bwa(["bwasw", str(tmp_path / "g.fa"),
                          str(tmp_path / "r.fq")])
    ref_sam = res.stdout.decode()
    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    reads = []
    lines = fq.decode().strip().split("\n")
    for i in range(0, len(lines), 4):
        reads.append((lines[i][1:], lines[i + 1], lines[i + 3]))
    our_sam = bw.bwasw(idx, reads)
    if ref_sam != our_sam:
        rl, ol = ref_sam.splitlines(), our_sam.splitlines()
        for i, (a, b) in enumerate(zip(rl, ol)):
            assert a == b, f"line {i}:\nref: {a}\nour: {b}"
        assert len(rl) == len(ol)
