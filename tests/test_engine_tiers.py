"""Engine-level device-tier selection (VERDICT r4 weak #2).

Round 4 shipped a NameError inside `AlnEngine._device_init`'s HBM branch
(models/aln.py:214) that no test reached: the Pallas kernels were covered
in interpret mode, but only by calling them directly, bypassing the
engine's tier gates.  These tests drive `AlnEngine.run_chunk` THROUGH
`_device_init` and `_run_device` on each Pallas tier (table thresholds
monkeypatched down so a 30 kbp genome lands on the HBM tier), in
interpret mode on CPU, and require results bit-identical to the jnp
engine.  The `NABWA_PALLAS_BB` env knob parsing is exercised on both the
set and default paths.
"""

import numpy as np
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.io import fastq
from nabwa_tpu.models.aln import AlnEngine
from nabwa_tpu.options import GapOpt

from . import genomes


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("engine_tiers")
    fa, seqs = genomes.random_genome(30000, seed=501)
    fq = genomes.sample_reads(seqs[0], 24, 75, seed=502,
                              err_rate=0.02, indel_rate=0.4)
    (tmp / "g.fa").write_bytes(fa)
    (tmp / "r.fq").write_bytes(fq)
    build_index(str(tmp / "g.fa"))
    idx = BwaIndex.load(str(tmp / "g.fa"))
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(tmp / "r.fq")),
                                   1 << 20)
    return idx, reads


def _results(idx, reads, **kw):
    opt = GapOpt(max_diff=4, fnr=-1.0, max_gapo=2)
    eng = AlnEngine(idx, opt, host_frac=0, **kw)
    return eng, eng.run_chunk(list(reads), device_batch=64)


def test_engine_hbm_tier(small_index, monkeypatch):
    """30 kbp genome forced onto the HBM tier; run_chunk must travel
    _device_init's HBM branch (the round-4 crash site) and the refill
    kernel, and match the jnp engine bit-exactly."""
    idx, reads = small_index
    monkeypatch.setenv("NABWA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("NABWA_PALLAS_BB", "8")
    monkeypatch.setattr(AlnEngine, "PALLAS_MAX_TABLE", 0)

    _, ref = _results(idx, reads, use_pallas=False)
    eng, pal = _results(idx, reads, use_pallas=True)
    assert eng._pal_hbm, "HBM tier not selected"
    assert eng.PALLAS_BB == 8, "NABWA_PALLAS_BB not honored"
    assert ref == pal


def test_engine_hbm_tier_default_bb(small_index, monkeypatch):
    """Default-BB parsing of the HBM branch (no env var set): the exact
    line that crashed round 4 (then models/aln.py:214)."""
    idx, reads = small_index
    monkeypatch.setenv("NABWA_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("NABWA_PALLAS_BB", raising=False)
    monkeypatch.setattr(AlnEngine, "PALLAS_MAX_TABLE", 0)

    opt = GapOpt(max_diff=4, fnr=-1.0, max_gapo=2)
    eng = AlnEngine(idx, opt, host_frac=0, use_pallas=True)
    eng._device_init()
    assert eng._pal_hbm
    assert eng.PALLAS_BB == 128


@pytest.mark.parametrize("mode", ["0", "1"])
def test_engine_hbm_fetch_modes(small_index, monkeypatch, mode):
    """Fetch modes 0 (legacy guarded issue + sequential drain) and 1
    (unconditional issue + unrolled drain) must stay bit-identical to
    the jnp engine; modes 2-3 clamp to 1 under interpret and are
    covered on hardware by scripts/ab_device.py."""
    idx, reads = small_index
    monkeypatch.setenv("NABWA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("NABWA_PALLAS_BB", "8")
    monkeypatch.setenv("NABWA_PALLAS_FETCH2", mode)
    monkeypatch.setattr(AlnEngine, "PALLAS_MAX_TABLE", 0)

    _, ref = _results(idx, reads, use_pallas=False)
    eng, pal = _results(idx, reads, use_pallas=True)
    assert eng._pal_hbm and eng._pal_fetch2 == int(mode)
    assert ref == pal


def test_engine_vmem_tier(small_index, monkeypatch):
    """Default thresholds: 30 kbp fits VMEM; table-resident tier (MXU
    one-hot path for small tables) must also match the jnp engine."""
    idx, reads = small_index
    monkeypatch.setenv("NABWA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("NABWA_PALLAS_BB", "8")

    _, ref = _results(idx, reads, use_pallas=False)
    eng, pal = _results(idx, reads, use_pallas=True)
    assert eng._pal_table is not None and not eng._pal_hbm
    assert ref == pal
