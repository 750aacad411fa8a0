"""Micro: per-op cost of [64,1] column ops vs [1,128] row ops vs
[64,128] tile ops inside a pallas while loop — quantifies the
reads-on-lanes transpose payoff for the DFS kernel.
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

T = int(os.environ.get("T", "2000"))
K = int(os.environ.get("K", "64"))      # dependent ops per iteration


def make(shape):
    def kern(x_ref, o_ref):
        x0 = x_ref[:, :]

        def body(carry):
            it, v = carry
            for _ in range(K):
                v = (v * 3 + 1) ^ (v >> 2)      # 3 dependent ops
            return it + 1, v

        def cond(c):
            return c[0] < T

        _, v = jax.lax.while_loop(cond, body, (jnp.int32(0), x0))
        o_ref[:, :] = v

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(shape, lambda: (0, 0))],
        out_specs=pl.BlockSpec(shape, lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
    )


for shape in [(64, 1), (8, 128), (64, 128), (1, 128), (64, 256)]:
    f = jax.jit(make(shape))
    x = jnp.zeros(shape, jnp.int32)
    f(x).block_until_ready()
    t0 = time.time()
    f(x).block_until_ready()
    dt = time.time() - t0
    per_op = dt / (T * K * 3)
    print(f"{str(shape):10s}  {dt*1e3:7.1f} ms  {per_op*1e9:8.2f} ns/op")
