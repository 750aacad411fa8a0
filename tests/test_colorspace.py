"""Color-space (SOLiD) pipeline vs the reference: index -c byte-identical,
aln -c .sai identical, samse SAM (cs2nt decoding) byte-identical."""

import subprocess

import numpy as np
import pytest

from nabwa_tpu import cli
from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.io import fastq, sai
from nabwa_tpu.models.aln import AlnEngine
from nabwa_tpu.models import samse as se
from nabwa_tpu.options import GapOpt
from nabwa_tpu.utils.rand48 import Rand48
from nabwa_tpu.constants import BWA_MODE_COMPREAD

from . import refbin, genomes

# color code of adjacent base pair, nst_color_space_table semantics
_NT4 = {65: 0, 67: 1, 71: 2, 84: 3}
_CS = [4, 0, 0, 1, 0, 2, 3, 4, 0, 3, 2, 4, 1, 4, 4, 4]


def _to_colors(nt_bytes):
    """Color string (ACGT-encoded like solid2fastq output) of a nt read."""
    codes = [_NT4[b] for b in nt_bytes]
    cols = [_CS[(1 << codes[i]) | (1 << codes[i + 1])]
            for i in range(len(codes) - 1)]
    return bytes(b"ACGT"[c] for c in cols)


def _make_color_reads(g, n_reads, read_len, seed, err=0.02):
    rng = np.random.default_rng(seed)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    out = []
    for i in range(n_reads):
        start = int(rng.integers(0, len(g) - read_len - 1))
        frag = g[start:start + read_len + 1]
        if rng.random() < 0.5:
            frag = frag.translate(comp)[::-1]
        cols = bytearray(_to_colors(frag))
        for j in range(len(cols)):
            if rng.random() < err:   # color error
                cols[j] = b"ACGT"[int(rng.integers(0, 4))]
        qual = bytes(33 + int(rng.integers(20, 40))
                     for _ in range(len(cols)))
        out.append(b"@cs%d\n%s\n+\n%s\n" % (i, bytes(cols), qual))
    return b"".join(out)


@pytest.fixture(scope="module")
def colorenv(tmp_path_factory):
    d = tmp_path_factory.mktemp("cs")
    fa, seqs = genomes.random_genome(50000, seed=61, n_frac=0.005)
    (d / "g.fa").write_bytes(fa)
    (d / "r.fa").write_bytes(fa)
    fq = _make_color_reads(seqs[0], 70, 35, seed=62)
    (d / "cs.fq").write_bytes(fq)
    refbin.run_bwa(["index", "-c", str(d / "r.fa")])
    build_index(str(d / "g.fa"), color=True)
    return d


def test_color_index_identical(colorenv):
    d = colorenv
    for ext in (".nt.pac", ".nt.ann", ".nt.amb", ".pac", ".ann", ".amb",
                ".rpac", ".bwt", ".rbwt", ".sa", ".rsa"):
        assert (d / ("g.fa" + ext)).read_bytes() == \
            (d / ("r.fa" + ext)).read_bytes(), ext


def test_color_aln_samse_identical(colorenv):
    d = colorenv
    refbin.run_bwa(["aln", "-c", str(d / "r.fa"), str(d / "cs.fq"),
                    "-f", str(d / "ref.sai")])
    refbin.run_bwa(["samse", str(d / "r.fa"), str(d / "ref.sai"),
                    str(d / "cs.fq"), "-f", str(d / "ref.sam")])
    ref_sam = (d / "ref.sam").read_text()

    opt = GapOpt()
    opt.mode &= ~BWA_MODE_COMPREAD
    idx = BwaIndex.load(str(d / "g.fa"))
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(d / "cs.fq")),
                                   1 << 20, mode=opt.mode)
    eng = AlnEngine(idx, opt)
    results = eng.run_chunk(reads)

    # .sai parity first
    ref_opt, ref_alns = sai.read_sai(str(d / "ref.sai"))
    for i, ((alns, hw), recs) in enumerate(zip(results, ref_alns)):
        want = sai.aln_records_to_tuples(recs)
        have = [tuple(h) for h in alns]
        assert have == want, f"read {i}"

    from nabwa_tpu.index.pack import read_pac
    ntpac = read_pac(str(d / "g.fa.nt.pac"))
    per_read = [alns for alns, hw in results]
    rng = Rand48(idx.bns.seed)
    header = se.sam_header(idx.bns, version="ref")
    lines = se.samse(eng, reads, per_read, opt, rng=rng, ntpac=ntpac)
    our_sam = header + "".join(l + "\n" for l in lines)
    if ref_sam != our_sam:
        for i, (a, b) in enumerate(zip(ref_sam.splitlines(),
                                       our_sam.splitlines())):
            assert a == b, f"line {i}:\nref: {a}\nour: {b}"
        assert len(ref_sam.splitlines()) == len(our_sam.splitlines())


def test_color_sampe_identical(colorenv, tmp_path):
    """Paired color reads through sampe (SOLiD orientation + cs2nt)."""
    d = colorenv
    fa = (d / "g.fa").read_bytes()
    g = b"".join(l for l in fa.split(b"\n") if not l.startswith(b">"))
    rng = np.random.default_rng(63)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    fq1, fq2 = [], []
    for i in range(50):
        isz = int(rng.normal(200, 20))
        start = int(rng.integers(0, len(g) - isz - 2))
        frag1 = g[start:start + 31]
        frag2 = g[start + isz - 31:start + isz]
        # SOLiD F3/R3: same strand orientation
        c1 = bytearray(_to_colors(frag1.replace(b"N", b"A")))
        c2 = bytearray(_to_colors(frag2.replace(b"N", b"A")))
        for c in (c1, c2):
            if rng.random() < 0.4:
                j = int(rng.integers(0, len(c)))
                c[j] = b"ACGT"[int(rng.integers(0, 4))]
        q = b"I" * 30
        fq1.append(b"@p%d/1\n%s\n+\n%s\n" % (i, bytes(c1), q))
        fq2.append(b"@p%d/2\n%s\n+\n%s\n" % (i, bytes(c2), q))
    (tmp_path / "r1.fq").write_bytes(b"".join(fq1))
    (tmp_path / "r2.fq").write_bytes(b"".join(fq2))

    # NOTE: the reference's color sampe segfaults whenever mate rescue
    # runs — bwa_paired_sw passes its NULL _pacseq (never loaded in color
    # mode, bwape.c:692-701) into bwa_paired_sw1 (bwape.c:652).  Golden
    # comparison therefore runs with -s (rescue off); our implementation
    # does support color rescue (it has a real pac).
    for e in (1, 2):
        refbin.run_bwa(["aln", "-c", str(d / "r.fa"),
                        str(tmp_path / f"r{e}.fq"),
                        "-f", str(tmp_path / f"r{e}.sai")])
    refbin.run_bwa(["sampe", "-s", str(d / "r.fa"),
                    str(tmp_path / "r1.sai"), str(tmp_path / "r2.sai"),
                    str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"),
                    "-f", str(tmp_path / "ref.sam")])
    ref_sam = (tmp_path / "ref.sam").read_text()

    from nabwa_tpu.cli import main as cli_main
    out = tmp_path / "got.sam"
    rc = cli_main(["sampe", "-s", str(d / "g.fa"),
                   str(tmp_path / "r1.sai"), str(tmp_path / "r2.sai"),
                   str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"),
                   "-f", str(out)])
    assert rc == 0
    our_sam = out.read_text()
    # normalize @PG version line (stub build uses "ref" version string)
    ref_l = ref_sam.splitlines()
    our_l = our_sam.splitlines()
    ref_l = [l for l in ref_l if not l.startswith("@PG")]
    our_l = [l for l in our_l if not l.startswith("@PG")]
    assert len(ref_l) == len(our_l)
    for i, (a, b) in enumerate(zip(ref_l, our_l)):
        assert a == b, f"line {i}:\nref: {a}\nour: {b}"
