"""Distributed bam2bam: the chunk-lease scheduler drives the REAL pipeline.

Invariants mirrored from the reference mux (run_io_multiplexor,
bam2bam.c:1462-1715): output identical to the sequential run under (a) many
workers, (b) small chunks, (c) injected chunk failures with redelivery, and
(d) an 8-device dp mesh for the device phase.
"""

import threading

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.models.aln import AlnEngine
from nabwa_tpu.models import bam2bam as b2b
from nabwa_tpu.options import GapOpt, PeOpt
from nabwa_tpu.utils.rand48 import Rand48

from . import refbin, genomes
from .test_sampe import make_pairs
from .test_bam2bam import make_input_bam, dump_records


@pytest.fixture(scope="module")
def b2b_input(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("b2bdist")
    fa, seqs = genomes.random_genome(50000, seed=301)
    fq1, fq2 = make_pairs(seqs[0], 70, 50, 250, 30, 302, err_rate=0.01,
                          frac_broken=0.1)
    singles = genomes.sample_reads(seqs[0], 18, 40, seed=303, err_rate=0.02)
    (tmp_path / "g.fa").write_bytes(fa)
    make_input_bam(str(tmp_path / "in.bam"), fq1, fq2, singles)
    refbin.run_bwa(["index", str(tmp_path / "g.fa")])
    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    return tmp_path, idx


def run_b2b(tmp_path, idx, name, **kw):
    opt, popt = GapOpt(), PeOpt()
    eng = kw.pop("engine", None) or AlnEngine(idx, opt)
    out = str(tmp_path / name)
    b2b.bam2bam(eng, str(tmp_path / "in.bam"), out, opt, popt,
                Rand48(idx.bns.seed), argv=["bam2bam"], version="ref", **kw)
    return dump_records(out)


def test_dist_matches_sequential(b2b_input, tmp_path):
    tmp, idx = b2b_input
    base = run_b2b(tmp, idx, "seq.bam", n_workers=1)
    dist = run_b2b(tmp, idx, "dist.bam", n_workers=4, chunk_size=16)
    assert base == dist


def test_dist_with_injected_failures(b2b_input, tmp_path):
    """Worker 0 fails the first attempt of every chunk it picks up; worker 1
    is a straggler.  Redelivery must produce identical output."""
    tmp, idx = b2b_input
    base = run_b2b(tmp, idx, "seq2.bam", n_workers=1)

    filed = {}
    lock = threading.Lock()

    def chaotic(wid, fn):
        def wrapped(cid, payload):
            if wid == 0:
                with lock:
                    first = ("a", cid) not in filed
                    filed[("a", cid)] = True
                if first:
                    raise RuntimeError("injected chunk loss")
            if wid == 1:
                import time
                time.sleep(0.02)
            return fn(cid, payload)
        return wrapped

    dist = run_b2b(tmp, idx, "chaos.bam", n_workers=4, chunk_size=8,
                   worker_wrapper=chaotic)
    assert base == dist


def test_counter_rng_chunk_invariant(b2b_input, tmp_path):
    """rng_mode='counter': output must be identical for different chunk
    geometries (order-independent determinism, SURVEY §2.7 caveat)."""
    tmp, idx = b2b_input
    a = run_b2b(tmp, idx, "ctr_a.bam", n_workers=1, chunk_size=1000,
                rng_mode="counter")
    b = run_b2b(tmp, idx, "ctr_b.bam", n_workers=4, chunk_size=7,
                rng_mode="counter")
    assert a == b


def test_mesh_dp_matches_single_device(b2b_input, tmp_path):
    """The device DFS sharded over an 8-device dp mesh must reproduce the
    single-device BAM record-for-record."""
    tmp, idx = b2b_input
    base = run_b2b(tmp, idx, "seq3.bam", n_workers=1)
    devs = np.array(jax.devices()[:8])
    assert len(devs) == 8
    mesh = Mesh(devs, ("dp",))
    eng = AlnEngine(idx, GapOpt(), mesh=mesh)
    dist = run_b2b(tmp, idx, "mesh.bam", n_workers=2, chunk_size=32,
                   engine=eng)
    assert base == dist
