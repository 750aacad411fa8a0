"""Probe which Mosaic/Pallas primitives the axon TPU backend supports,
and at what cost — drives the design of the Pallas DFS kernel.

Run ON TPU (no conftest):  python scripts/probe_pallas.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())


def timeit(f, *args, n=20):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n, r


# ---------------------------------------------------------------- probe 1
# dynamic-sublane row load in a fori loop: stage[i] = table[rowidx[i]]
def probe_rowload():
    NROW, BB = 4096, 256

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            r = idx_ref[i, 0]
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, BB, body, 0)

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BB, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)

    idx = jnp.asarray(np.random.randint(0, NROW, (BB, 1)), jnp.int32)
    table = jnp.asarray(np.arange(NROW * 128).reshape(NROW, 128) % 9973,
                        jnp.int32)
    dt, r = timeit(run, idx, table)
    ok = np.array_equal(np.asarray(r), np.asarray(table)[np.asarray(idx)[:, 0]])
    print(f"probe1 rowload fori BB={BB}: {dt*1e6:.1f}us  ok={ok}")


# ---------------------------------------------------------------- probe 2
# scalar read from SMEM-passed array driving the load (scalar prefetch style)
def probe_smem_idx():
    NROW, BB = 4096, 256

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            r = idx_ref[i]          # idx in SMEM
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, BB, body, 0)

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BB, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)

    idx = jnp.asarray(np.random.randint(0, NROW, (BB,)), jnp.int32)
    table = jnp.asarray(np.arange(NROW * 128).reshape(NROW, 128) % 9973,
                        jnp.int32)
    dt, r = timeit(run, idx, table)
    ok = np.array_equal(np.asarray(r), np.asarray(table)[np.asarray(idx)])
    print(f"probe2 smem-idx rowload BB={BB}: {dt*1e6:.1f}us  ok={ok}")


# ---------------------------------------------------------------- probe 3
# popcount on the VPU inside pallas
def probe_popcount():
    def kernel(x_ref, o_ref):
        o_ref[:] = jax.lax.population_count(x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        )(x)

    x = jnp.asarray(np.random.randint(0, 1 << 30, (256, 128)), jnp.int32)
    try:
        dt, r = timeit(run, x)
        want = np.vectorize(
            lambda v: bin(int(np.uint32(v))).count("1"))(np.asarray(x))
        ok = np.array_equal(np.asarray(r), want)
        print(f"probe3 popcount: {dt*1e6:.1f}us  ok={ok}")
    except Exception as e:
        print("probe3 popcount FAILED:", str(e)[:200])


# ---------------------------------------------------------------- probe 4
# while_loop inside the kernel with VMEM scratch state
def probe_while_scratch():
    BB, S = 256, 128

    def kernel(x_ref, o_ref, pool_ref):
        pool_ref[:] = x_ref[:]

        def cond(c):
            return c[0] < 50

        def body(c):
            i, acc = c
            m = pool_ref[:].min(axis=1, keepdims=True)
            pool_ref[:] = jnp.where(pool_ref[:] == m, pool_ref[:] + 7,
                                    pool_ref[:])
            return i + 1, acc + m.sum()

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((BB, S), jnp.int32)],
        )(x)

    x = jnp.asarray(np.random.randint(0, 1000, (BB, S)), jnp.int32)
    try:
        dt, r = timeit(run, x)
        print(f"probe4 while+scratch 50 iters: {dt*1e6:.1f}us  "
              f"({dt/50*1e6:.2f}us/iter) r={np.asarray(r)[0,0]}")
    except Exception as e:
        print("probe4 FAILED:", str(e)[:300])


# ---------------------------------------------------------------- probe 4b
# same loop but NO scalar reduction in the carry — vector-only body,
# vector accumulator; isolates the cost of cross-lane reductions per iter.
def probe_while_vector_only():
    BB, S = 256, 128

    def kernel(x_ref, o_ref, pool_ref, acc_ref):
        pool_ref[:] = x_ref[:]
        acc_ref[:] = jnp.zeros((BB, S), jnp.int32)

        def body(i, _):
            m = pool_ref[:].min(axis=1, keepdims=True)
            pool_ref[:] = jnp.where(pool_ref[:] == m, pool_ref[:] + 7,
                                    pool_ref[:])
            acc_ref[:] = acc_ref[:] + m
            return 0

        jax.lax.fori_loop(0, 50, body, 0)
        o_ref[:] = acc_ref[:]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BB, S), jnp.int32),
            scratch_shapes=[pltpu.VMEM((BB, S), jnp.int32),
                            pltpu.VMEM((BB, S), jnp.int32)],
        )(x)

    x = jnp.asarray(np.random.randint(0, 1000, (BB, S)), jnp.int32)
    try:
        dt, r = timeit(run, x)
        print(f"probe4b fori vector-only 50 iters: {dt*1e6:.1f}us  "
              f"({dt/50*1e6:.2f}us/iter)")
    except Exception as e:
        print("probe4b FAILED:", str(e)[:300])


# ---------------------------------------------------------------- probe 4c
# how much does a bigger vector body cost per iter? ~60 elementwise ops on
# [BB,S] per iteration, the DFS push/pop scale.
def probe_body_scale():
    BB, S = 256, 128

    def kernel(x_ref, o_ref, pool_ref):
        pool_ref[:] = x_ref[:]

        def body(i, _):
            p = pool_ref[:]
            for j in range(20):
                p = jnp.where((p & 7) == j % 8, p + j, p)
                p = p ^ (p >> 3)
                p = p + (p << 1)
            pool_ref[:] = p
            return 0

        jax.lax.fori_loop(0, 50, body, 0)
        o_ref[:] = pool_ref[:]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BB, S), jnp.int32),
            scratch_shapes=[pltpu.VMEM((BB, S), jnp.int32)],
        )(x)

    x = jnp.asarray(np.random.randint(0, 1000, (BB, S)), jnp.int32)
    try:
        dt, r = timeit(run, x)
        print(f"probe4c 60-op body 50 iters: {dt*1e6:.1f}us  "
              f"({dt/50*1e6:.2f}us/iter)")
    except Exception as e:
        print("probe4c FAILED:", str(e)[:300])


# ---------------------------------------------------------------- probe 5
# the real question: a DFS-iteration-shaped body: pop (argmin over S),
# occ row loads for every lane, 9-candidate one-hot push — per-iter cost.
def probe_dfs_shape():
    BB, S, NROW = 256, 128, 32768  # ~2Mbp genome, both strands (pow2)

    def kernel(k_ref, table_ref, o_ref, pool_ref, stage_ref, kidx_ref):
        pool_ref[:] = jax.lax.broadcasted_iota(jnp.int32, (BB, S), 1) * 3 \
            + jax.lax.broadcasted_iota(jnp.int32, (BB, S), 0)
        kidx_ref[:] = k_ref[:]

        def cond(c):
            return c[0] < 100

        def body(c):
            it, acc = c
            # pop: min over S + one-hot extract
            mk = pool_ref[:].min(axis=1, keepdims=True)
            pm = pool_ref[:] == mk
            e_k = jnp.where(pm, kidx_ref[:, :S], 0).sum(axis=1)  # fake

            # occ loads: 2 row loads per lane
            def load(i, _):
                r = kidx_ref[i, 0] & (NROW - 1)
                stage_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
                r2 = kidx_ref[i, 1] & (NROW - 1)
                stage_ref[pl.ds(i + BB, 1), :] = table_ref[pl.ds(r2, 1), :]
                return 0
            jax.lax.fori_loop(0, BB, load, 0)

            # occ math: masked popcount over the staged rows
            rows = stage_ref[:BB, :]
            lo = rows & 0x55555555
            hi = (rows >> 1) & 0x55555555
            c1 = jax.lax.population_count(lo).sum(axis=1)
            c3 = jax.lax.population_count(lo & hi).sum(axis=1)

            # push: 9 candidates, one-hot into free slots
            free = pool_ref[:] >= 0x40000000
            frank = jnp.cumsum(free.astype(jnp.int32), axis=1)
            for j in range(9):
                mask_j = free & (frank == j + 1)
                pool_ref[:] = jnp.where(mask_j, it * 9 + j, pool_ref[:])
            # re-free some slots so it keeps going
            pool_ref[:] = jnp.where(pm, 0x7FFFFFFF, pool_ref[:])
            kidx_ref[:] = (kidx_ref[:] + c1[:, None] + c3[:, None]
                           + e_k[:, None]) & (NROW - 1)
            return it + 1, acc + mk.sum()

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = acc

    @jax.jit
    def run(k, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((BB, S), jnp.int32),
                            pltpu.VMEM((2 * BB, 128), jnp.int32),
                            pltpu.VMEM((BB, 128), jnp.int32)],
        )(k, table)

    k = jnp.asarray(np.random.randint(0, NROW, (BB, 128)), jnp.int32)
    table = jnp.asarray(np.random.randint(0, 1 << 30, (NROW, 128)), jnp.int32)
    try:
        dt, r = timeit(run, k, table, n=5)
        print(f"probe5 dfs-shaped 100 iters BB={BB} S={S}: {dt*1e3:.2f}ms "
              f"({dt/100*1e6:.2f}us/iter)")
    except Exception as e:
        print("probe5 FAILED:", str(e)[:400])


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "2", "3", "4", "4b", "4c", "5"]
    fns = {"1": probe_rowload, "2": probe_smem_idx, "3": probe_popcount,
           "4": probe_while_scratch, "4b": probe_while_vector_only,
           "4c": probe_body_scale, "5": probe_dfs_shape}
    for w in which:
        fns[w]()
