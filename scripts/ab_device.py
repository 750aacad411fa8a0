"""A/B device-only aln rate at 64 Mbp for kernel variants via env knobs.

  NABWA_PALLAS_FETCH2=0 python scripts/ab_device.py
  NABWA_PALLAS_FETCH2=1 python scripts/ab_device.py

Uses the bench genome/reads (/tmp/nabwa_bench64); prints reads/s
device-only (median of 3 timed chunks after a warm-up compile).
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

WORK = pathlib.Path("/tmp/nabwa_bench64")
N = int(os.environ.get("NREADS", "8192"))
BATCH = int(os.environ.get("NABWA_BENCH_BATCH", "1024"))


def main():
    from nabwa_tpu.index.fmindex import BwaIndex
    from nabwa_tpu.models.aln import AlnEngine
    from nabwa_tpu.io import fastq
    from nabwa_tpu.options import GapOpt

    idx = BwaIndex.load(str(WORK / "g.fa"))
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(WORK / "r.fq")),
                                   N)
    eng = AlnEngine(idx, GapOpt(),
                    stack_cap=int(os.environ.get("NABWA_BENCH_STACK",
                                                 "256")))
    eng.host_frac = 0.0
    # count reads that overflow every device tier and drain on the host
    # CPU (a small stack cap must not fake a device win)
    fallback = {"n": 0}
    orig_drain = eng._drain_native

    def counting_drain(fb_reads, *a, **kw):
        fallback["n"] += len(fb_reads)
        return orig_drain(fb_reads, *a, **kw)
    eng._drain_native = counting_drain
    eng.run_chunk(reads[:BATCH], device_batch=BATCH)   # compile
    rates = []
    for _ in range(3):
        t0 = time.time()
        eng.run_chunk(reads, device_batch=BATCH)
        rates.append(len(reads) / (time.time() - t0))
    print({"fetch2": os.environ.get("NABWA_PALLAS_FETCH2", "1"),
           "bb": eng.PALLAS_BB, "stack": eng.stack_cap,
           "device_rps": round(sorted(rates)[1], 1),
           "host_fallback_reads": fallback["n"],
           "all": [round(r, 1) for r in rates]})


if __name__ == "__main__":
    main()
