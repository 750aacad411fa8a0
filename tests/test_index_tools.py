"""Index-tool subcommands (pac2bwt/bwtupdate/bwt2sa) and stdsw vs the
reference binary (main.c:52-57,60)."""

import subprocess
import sys

import pytest

from nabwa_tpu import cli

from . import refbin, genomes


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("idxtools")
    fa, seqs = genomes.random_genome(40000, seed=31, n_frac=0.01)
    (d / "g.fa").write_bytes(fa)
    refbin.run_bwa(["fa2pac", str(d / "g.fa"), str(d / "ref")])
    return d


def test_pac2bwt_bwtupdate_bwt2sa_chain(workdir):
    d = workdir
    refbin.run_bwa(["pac2bwt", str(d / "ref.pac"), str(d / "ref.bwt")])
    assert cli.main(["pac2bwt", str(d / "ref.pac"), str(d / "got.bwt")]) == 0
    assert (d / "got.bwt").read_bytes() == (d / "ref.bwt").read_bytes()

    # pac2bwtgen: same plain-BWT output by construction
    assert cli.main(["pac2bwtgen", str(d / "ref.pac"),
                     str(d / "gen.bwt")]) == 0
    assert (d / "gen.bwt").read_bytes() == (d / "ref.bwt").read_bytes()

    refbin.run_bwa(["bwtupdate", str(d / "ref.bwt")])
    assert cli.main(["bwtupdate", str(d / "got.bwt")]) == 0
    assert (d / "got.bwt").read_bytes() == (d / "ref.bwt").read_bytes()

    refbin.run_bwa(["bwt2sa", "-i", "16", str(d / "ref.bwt"),
                    str(d / "ref.sa")])
    assert cli.main(["bwt2sa", "-i", "16", str(d / "got.bwt"),
                     str(d / "got.sa")]) == 0
    assert (d / "got.sa").read_bytes() == (d / "ref.sa").read_bytes()


def _stdsw_ref(args):
    refbin.ensure_bwa()
    return subprocess.run([str(refbin.BWA), "stdsw"] + args,
                          capture_output=True, check=True).stdout


def _stdsw_ours(args, capsys):
    rc = cli.main(["stdsw"] + args)
    assert rc == 0
    return capsys.readouterr().out.encode()


def test_stdsw_local_both_strands(tmp_path, capsys):
    fa, seqs = genomes.random_genome(800, seed=51)
    long_fa = tmp_path / "long.fa"
    long_fa.write_bytes(fa)
    # short queries: slices of the long sequence with edits, both strands
    g = seqs[0]
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    shorts = []
    s1 = bytearray(g[100:180])
    s1[40] = ord("A") if s1[40] != ord("A") else ord("C")
    shorts.append((b"q1", bytes(s1)))
    shorts.append((b"q2", g[300:390].translate(comp)[::-1]))
    s3 = bytearray(g[500:560])
    del s3[20:23]
    shorts.append((b"q3", bytes(s3)))
    short_fa = tmp_path / "short.fa"
    short_fa.write_bytes(b"".join(b">%s\n%s\n" % (n, s) for n, s in shorts))

    args = ["-T", "20", str(long_fa), str(short_fa)]
    want = _stdsw_ref(args)
    got = _stdsw_ours(args, capsys)
    assert got == want


def test_stdsw_global(tmp_path, capsys):
    # single pair, fresh process heap -> the reference's uninitialized
    # subo prints 0 reproducibly for the first alignment
    fa, seqs = genomes.random_genome(200, seed=52)
    long_fa = tmp_path / "long.fa"
    long_fa.write_bytes(fa)
    s = bytearray(seqs[0][50:150])
    s[10] = ord("G") if s[10] != ord("G") else ord("T")
    short_fa = tmp_path / "short.fa"
    short_fa.write_bytes(b">q\n" + bytes(s) + b"\n")
    args = ["-g", "-f", str(long_fa), str(short_fa)]
    want = _stdsw_ref(args)
    got = _stdsw_ours(args, capsys)
    assert got == want


def test_aln_bam_input(tmp_path):
    """aln -b -1/-2/-0 BAM input vs the reference (bwa_read_bam,
    bwaseqio.c:125-165), including a reverse-strand pre-mapped record."""
    from .test_bam2bam import make_input_bam
    from nabwa_tpu.index.build import build_index

    fa, seqs = genomes.random_genome(30000, seed=81)
    (tmp_path / "g.fa").write_bytes(fa)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])
    fq1 = genomes.sample_reads(seqs[0], 40, 60, seed=82, err_rate=0.02)
    fq2 = genomes.sample_reads(seqs[0], 40, 60, seed=83, err_rate=0.02)
    make_input_bam(str(tmp_path / "in.bam"), fq1, fq2)

    for flags in (["-b", "-1"], ["-b", "-2"], ["-b"]):
        # fresh outputs: a stale .sai triggers -f recovery mode
        (tmp_path / "ref.sai").unlink(missing_ok=True)
        refbin.run_bwa(["aln"] + flags + [str(tmp_path / "g.fa"),
                       str(tmp_path / "in.bam"),
                       "-f", str(tmp_path / "ref.sai")])
        got = tmp_path / "got.sai"
        got.unlink(missing_ok=True)
        assert cli.main(["aln"] + flags + [str(tmp_path / "g.fa"),
                        str(tmp_path / "in.bam"),
                        "-f", str(got)]) == 0
        assert got.read_bytes() == (tmp_path / "ref.sai").read_bytes(), flags


def test_stdsw_protein(tmp_path, capsys):
    """-p protein mode (aln_param_aa2aa + blosum62 + aa table)."""
    rng = __import__("numpy").random.default_rng(91)
    aas = b"ARNDCQEGHILKMFPSTWYV"
    long_seq = bytes(aas[int(rng.integers(0, 20))] for _ in range(300))
    s = bytearray(long_seq[40:120])
    s[10] = ord("W") if s[10] != ord("W") else ord("C")
    s[30] = ord("H") if s[30] != ord("H") else ord("K")
    (tmp_path / "long.fa").write_bytes(b">prot\n" + long_seq + b"\n")
    (tmp_path / "short.fa").write_bytes(b">q\n" + bytes(s) + b"\n")
    args = ["-p", "-T", "30", str(tmp_path / "long.fa"),
            str(tmp_path / "short.fa")]
    want = _stdsw_ref(args)
    got = _stdsw_ours(args, capsys)
    assert got == want
