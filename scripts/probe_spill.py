"""Spill-pressure probe: K INDEPENDENT live values mutated per loop
iteration, shaped [64,1] (column: 8 vregs each) vs [1,128] (row: 1 vreg)
vs [64,128] (tile).  If columns are ~8x slower per value, the DFS
kernel's cost is vreg spill traffic, and the reads-on-lanes transpose
pays ~8x on the scalar sections.
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl

T = int(os.environ.get("T", "2000"))
K = int(os.environ.get("K", "24"))      # independent live values


def make(shape, K):
    def kern(x_ref, o_ref):
        x0 = x_ref[:, :]
        vals0 = tuple(x0 + i for i in range(K))

        def body(carry):
            it = carry[0]
            vs = carry[1:]
            # each value mutated with a cross-value term so none fold
            nvs = tuple((v * 3 + 1) ^ (vs[(i + 1) % K] >> 2)
                        for i, v in enumerate(vs))
            return (it + 1,) + nvs

        def cond(c):
            return c[0] < T

        fin = jax.lax.while_loop(cond, body, (jnp.int32(0),) + vals0)
        acc = fin[1]
        for v in fin[2:]:
            acc = acc + v
        o_ref[:, :] = acc

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(shape, lambda: (0, 0))],
        out_specs=pl.BlockSpec(shape, lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
    )


for shape in [(64, 1), (1, 128), (8, 128), (64, 128)]:
    f = jax.jit(make(shape, K))
    x = jnp.zeros(shape, jnp.int32)
    f(x).block_until_ready()
    t0 = time.time()
    f(x).block_until_ready()
    dt = time.time() - t0
    print(f"{str(shape):10s} K={K}  {dt*1e3:7.1f} ms  "
          f"{dt*1e6/T:6.2f} us/iter")
