"""Microbenchmark: per-DMA issue/limit cost of HBM row fetches inside a
Pallas kernel — the primitive the HBM-resident DFS tier leans on.

Measures a kernel that loops T times; each iteration issues N async
copies of one [1, 128] int32 row (512 B) from an HBM-resident table at
pseudorandom rows, then waits for all of them.  Varying N at fixed T
separates per-copy cost from per-iteration overhead.

  ROWS=100000 T=64 python scripts/probe_dma.py
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("ROWS", "100000"))
T = int(os.environ.get("T", "64"))


def make(N, T, n_rows, unroll, src="reg"):
    """src: where the DMA row index comes from —
    reg: scalar LCG in registers; vmem: per-iteration vector compute
    written to VMEM scratch, scalar-read back per copy; smem: same vector
    compute staged VMEM->SMEM by one DMA, scalar-read from SMEM."""
    def kern(tab_ref, out_ref, stage, rowv, rows_s, sem, sem2):
        def body(t, seed):
            if src != "reg":
                # vector "computation" of this iteration's N row indices
                iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                v = (iota * 12345 + t * 1103515245) % n_rows
                rowv[:, :] = v
                if src == "smem":
                    cp = pltpu.make_async_copy(rowv, rows_s, sem2)
                    cp.start()
                    cp.wait()

            def issue(i, s):
                if src == "reg":
                    s = (s * 1103515245 + 12345) & 0x7FFFFFFF
                    r = s % n_rows
                elif src in ("vmem", "cond"):
                    r = rowv[i // 128, i % 128]
                else:
                    r = rows_s[i // 128, i % 128]
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(r, 1), :],
                    stage.at[pl.ds(i, 1), :], sem).start()
                if src == "cond":
                    # the DFS kernel's conditional second copy (pl.when
                    # around a VMEM-read predicate), mimicked exactly
                    r2 = rowv[(i // 128 + 1) % 8, i % 128]

                    @pl.when(r2 >= 0)
                    def _():
                        pltpu.make_async_copy(
                            tab_ref.at[pl.ds(r2 % n_rows, 1), :],
                            stage.at[pl.ds((i + N) % (2 * N), 1), :],
                            sem).start()
                return s

            def drain(i, s):
                if src == "reg":
                    s = (s * 1103515245 + 12345) & 0x7FFFFFFF
                    r = s % n_rows
                elif src in ("vmem", "cond"):
                    r = rowv[i // 128, i % 128]
                else:
                    r = rows_s[i // 128, i % 128]
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(r, 1), :],
                    stage.at[pl.ds(i, 1), :], sem).wait()
                if src == "cond":
                    r2 = rowv[(i // 128 + 1) % 8, i % 128]

                    @pl.when(r2 >= 0)
                    def _():
                        pltpu.make_async_copy(
                            tab_ref.at[pl.ds(r2 % n_rows, 1), :],
                            stage.at[pl.ds((i + N) % (2 * N), 1), :],
                            sem).wait()
                return s

            s1 = jax.lax.fori_loop(0, N, issue, seed, unroll=unroll)
            jax.lax.fori_loop(0, N, drain, seed, unroll=unroll)
            return s1

        final = jax.lax.fori_loop(0, T, body, jnp.int32(1), unroll=False)
        out_ref[0, 0] = final + stage[0, 0]

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((max(N, 8), 128), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )


def main():
    tab = jnp.asarray(np.arange(ROWS * 128, dtype=np.int32)
                      .reshape(ROWS, 128))
    for N in (64, 128):
        for unroll in (True, False):
            for src in ("reg", "vmem", "cond"):
                f = jax.jit(make(N, T, ROWS, unroll, src))
                r = f(tab)
                r.block_until_ready()
                t0 = time.time()
                r = f(tab)
                r.block_until_ready()
                dt = time.time() - t0
                per_iter = dt / T
                per_copy = per_iter / N
                print(f"N={N:4d} unroll={int(unroll)} src={src:4s}  "
                      f"{per_iter*1e6:9.1f} us/iter  "
                      f"{per_copy*1e6:7.2f} us/copy")


if __name__ == "__main__":
    main()
