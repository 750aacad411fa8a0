"""Benchmark: aligned reads/s/chip for the aln engine on real TPU hardware,
vs the reference C bwa single-thread on the same host and data.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": R}
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The axon sitecustomize imports jax at interpreter start, so env-var config
# (JAX_COMPILATION_CACHE_DIR) is read before this file runs — only
# jax.config.update takes effect.  Without it every bench process pays the
# full multi-minute remote compile.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

WORK = pathlib.Path("/tmp/nabwa_bench64")
# chromosome scale (chr20-class): the genome no longer fits VMEM, so the
# device path exercises the HBM-resident Pallas DFS tier (VERDICT r2 #1)
# and the index build exercises the blockwise incremental BWT builder
GLEN = 64_000_000
# chunk long enough that the host drain window exceeds the device link's
# fixed latency — below ~16k reads the hybrid split correctly leaves the
# (30 ms RTT) tunnel idle and the chip contributes nothing
N_READS = 32768
READ_LEN = 100
# large fixed device slices: every device sync costs a ~30 ms tunnel
# round trip, so the hybrid split hands the device a few big slices
# (one compile bucket) and overlaps the host drain with their queue.
# 2048 measured best of 1024/2048/4096 with the mode-3 refill kernel
# (9.3k vs 7.8k/8.7k device-only, r5)
DEVICE_BATCH = int(os.environ.get("NABWA_BENCH_BATCH", "2048"))
STACK_CAP = int(os.environ.get("NABWA_BENCH_STACK", "256"))


def setup_data():
    from tests import genomes
    from nabwa_tpu.index.build import build_index

    WORK.mkdir(exist_ok=True)
    fa_path = WORK / "g.fa"
    fq_path = WORK / "r.fq"
    if not (WORK / "g.fa.bwt").exists():
        fa, seqs = genomes.random_genome(GLEN, seed=99)
        fa_path.write_bytes(fa)
        build_index(str(fa_path))
    if (not fq_path.exists()
            or fq_path.read_bytes().count(b"\n") != 4 * N_READS):
        fa_txt = fa_path.read_bytes()
        seq = b"".join(l for l in fa_txt.split(b"\n")
                       if not l.startswith(b">"))
        from tests import genomes as g2
        fq = g2.sample_reads(seq, N_READS, READ_LEN, seed=100, err_rate=0.01)
        fq_path.write_bytes(fq)
    return fa_path, fq_path


def bench_ours(fa_path, fq_path):
    from nabwa_tpu.index.fmindex import BwaIndex
    from nabwa_tpu.models.aln import AlnEngine
    from nabwa_tpu.io import fastq
    from nabwa_tpu.options import GapOpt

    idx = BwaIndex.load(str(fa_path))
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(fq_path)), 1 << 22)
    eng = AlnEngine(idx, GapOpt(), stack_cap=STACK_CAP)
    # warm-up / compile: a device-only chunk compiles the slice bucket the
    # timed run reuses (excluded from the rate EMA), a second one measures
    # the clean device rate, then one hybrid chunk warms the native engine
    eng.host_frac = 0.0
    eng.run_chunk(reads[:DEVICE_BATCH], device_batch=DEVICE_BATCH)
    eng.run_chunk(reads[:4 * DEVICE_BATCH], device_batch=DEVICE_BATCH)
    eng.host_frac = 0.5
    eng.run_chunk(reads[:4 * DEVICE_BATCH], device_batch=DEVICE_BATCH)
    # median of 3: the shared-vCPU host and the device tunnel both jitter
    # (+-30% observed run to run)
    rates = []
    for _ in range(3):
        t0 = time.time()
        res = eng.run_chunk(reads, device_batch=DEVICE_BATCH)
        dt = time.time() - t0
        rates.append(len(reads) / dt)
    n_hit = sum(1 for a, hw in res if a)
    extra = {
        "device_only_reads_per_sec": round(getattr(eng, "_dev_rate", 0.0), 1),
        "host_native_reads_per_sec": round(getattr(eng, "_host_rate", 0.0),
                                           1),
    }
    return sorted(rates)[1], n_hit, extra


def bench_reference(fa_path, fq_path):
    """Single-thread reference `bwa aln` wall time on the same data.

    The output .sai is always unlinked first: a stale file from a previous
    run would trigger the reference's recovery mode (attempt_recovery,
    bwtaln.c:259-297), which either aborts ("EOF while skipping done work")
    or times a recovery-skip run instead of a real alignment run — this is
    what left round 1 with no recorded benchmark number.
    """
    sys.path.insert(0, str(pathlib.Path(__file__).parent / "tests"))
    from tests.refbin import ensure_bwa

    bwa = ensure_bwa()
    ref_fa = WORK / "ref_g.fa"
    ref_sai = WORK / "ref.sai"
    if not (WORK / "ref_g.fa.bwt").exists():
        ref_fa.write_bytes(fa_path.read_bytes())
        subprocess.run([bwa, "index", str(ref_fa)], check=True,
                       capture_output=True)
    rates = []
    for _ in range(3):
        ref_sai.unlink(missing_ok=True)
        t0 = time.time()
        subprocess.run([bwa, "aln", str(ref_fa), str(fq_path), "-f",
                        str(ref_sai)], check=True, capture_output=True)
        dt = time.time() - t0
        rates.append(N_READS / dt)
    return sorted(rates)[1]


def _device_alive(timeout_s=420, attempts=2):
    """Probe the device link in a subprocess: a hung tunnel blocks any
    in-process jax call forever (observed), which must not take the
    benchmark down with it.  Fresh-process device attach through the
    stdio-multiplexed tunnel costs 75-420 s on this deployment (measured
    r5, high variance) — a single 120 s probe misclassifies a live chip
    as down and silently benches host-native only, so probe generously
    and retry once."""
    code = "import jax, jax.numpy as jnp; print(int(jnp.arange(8).sum()))"
    for _ in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0 and b"28" in r.stdout:
                return True
        except Exception:
            pass
    return False


def main():
    fa_path, fq_path = setup_data()
    mode = "hybrid"
    if not _device_alive():
        # device link down: run host-native only (results identical);
        # jax must be pinned to CPU before its first backend use or the
        # engine's own device_put would hang too
        jax.config.update("jax_platforms", "cpu")
        os.environ["NABWA_FORCE_NATIVE"] = "1"
        mode = "host-native (device link down)"
    ref_rps = bench_reference(fa_path, fq_path)
    ours_rps, n_hit, extra = bench_ours(fa_path, fq_path)
    extra["mode"] = mode
    if mode != "hybrid":
        extra["host_native_reads_per_sec"] = round(ours_rps, 1)
    # value = the self-tuned hybrid engine (chip + host cores vs the
    # single-thread reference process); the extra keys report each
    # engine's standalone rate for transparency — through a high-latency
    # tunnel the split may correctly leave the chip share at zero
    print(json.dumps({
        "metric": "aln_reads_per_sec_per_chip",
        "value": round(ours_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(ours_rps / ref_rps, 3),
        # the reference binary is timed in the SAME run on the same host
        # and data, so vs_baseline is a paired ratio (VERDICT r3 #8):
        # the cross-round reference rate moved 7.8-13.7k on this shared box
        "ref_reads_per_sec": round(ref_rps, 1),
        **extra,
    }))


if __name__ == "__main__":
    main()
