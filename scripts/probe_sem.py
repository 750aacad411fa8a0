"""Probe the DMA-semaphore increment per [1,128]-i32 copy: issue K
copies, read the semaphore, wait it back down.  Tells whether a bulk
pltpu.semaphore_wait(sem, K*A) can replace K sequential drain waits."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = int(os.environ.get("K", "4"))


def kernel(table_ref, out_ref, stage, sem):
    for i in range(K):
        pltpu.make_async_copy(table_ref.at[pl.ds(i, 1), :],
                              stage.at[pl.ds(i, 1), :], sem).start()
    out_ref[0] = pltpu.semaphore_read(sem)   # right after issue
    for i in range(K):
        pltpu.make_async_copy(table_ref.at[pl.ds(0, 1), :],
                              stage.at[pl.ds(0, 1), :], sem).wait()
        out_ref[1 + i] = pltpu.semaphore_read(sem)


def main():
    table = jnp.arange(16 * 128, dtype=jnp.int32).reshape(16, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((K + 2,), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(table)
    print("sem post-issue then after each wait:", np.asarray(out))


if __name__ == "__main__":
    main()
