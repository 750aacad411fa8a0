"""nabwa_tpu — a TPU-native short-read aligner with the capabilities of
mpieva/network-aware-bwa (BWA 0.5.x + distributed bam2bam).

Brand-new design for JAX/XLA/Pallas on TPU:

- The FM-index (BWT with interleaved Occ checkpoints, sampled suffix array,
  2-bit packed reference) lives in HBM as flat uint32/int32 arrays, replicated
  per chip (reference structure: bwt.h:43-59).
- Search kernels are batched, fixed-iteration masked loops over read batches
  (the reference's per-read bounded DFS, bwtgap.c:104-266, becomes a lockstep
  SIMD search engine; divergence is flattened, not threaded).
- Distribution is jax.sharding/pjit data-parallelism over reads plus a
  host-side chunk scheduler replacing the ZeroMQ bam2bam layer
  (bam2bam.c:1462-1715).

Layout:
  index/     index construction + on-disk format parity (bntseq.c, bwtmisc.c,
             bwtio.c, is.c equivalents)
  ops/       device compute kernels (occ/rank, DFS search, banded DP, SA
             lookup) — jnp reference paths and Pallas TPU kernels
  models/    workflow drivers (aln, samse, sampe, bwasw, bam2bam)
  refmodel/  exact scalar NumPy model of the reference semantics (test oracle
             and host fallback for pathological reads)
  io/        FASTQ/SAM/BAM/.sai readers and writers
  parallel/  mesh/sharding helpers and the distributed chunk scheduler
  utils/     rand48 LCG, logging, timers
"""

__version__ = "0.1.0"
