"""Round-2 pallas probes: load-loop cost in detail, dynamic lane gather,
scalar-assisted per-lane pushes, lane reductions.

Run ON TPU:  python scripts/probe_pallas2.py [probe...]
"""
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


NROW, BB = 32768, 256


def _table():
    return jnp.asarray(
        np.random.randint(0, 1 << 30, (NROW, 128)), jnp.int32)


# ---------------------------------------------------------------- probe A
# launch overhead: empty-ish kernel
def probe_empty():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(x)

    x = jnp.zeros((8, 128), jnp.int32)
    dt, _ = timeit(run, x, n=50)
    print(f"probeA empty kernel: {dt*1e6:.1f}us")


# ---------------------------------------------------------------- probe B
# row-load loop, full unroll vs none, 2 loads per body (the k/l pair)
def probe_loads(unroll):
    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            r = idx_ref[i, 0]
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
            r2 = idx_ref[i, 1]
            out_ref[pl.ds(i + BB, 1), :] = table_ref[pl.ds(r2, 1), :]
            return 0
        jax.lax.fori_loop(0, BB, body, 0, unroll=unroll)

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2 * BB, 128), jnp.int32),
        )(idx, table)

    idx = jnp.asarray(np.random.randint(0, NROW, (BB, 128)), jnp.int32)
    table = _table()
    try:
        dt, r = timeit(run, idx, table)
        ok = np.array_equal(np.asarray(r)[:BB],
                            np.asarray(table)[np.asarray(idx)[:, 0]])
        print(f"probeB 2x{BB} rowloads unroll={unroll}: {dt*1e6:.1f}us "
              f"({dt/(2*BB)*1e9:.0f}ns/load)  ok={ok}")
    except Exception as e:
        print(f"probeB unroll={unroll} FAILED:", str(e)[:200])


# ---------------------------------------------------------------- probe C
# dynamic lane gather: jnp.take_along_axis along axis=1
def probe_lane_gather():
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    @jax.jit
    def run(x, i):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((BB, 128), jnp.int32),
        )(x, i)

    x = jnp.asarray(np.random.randint(0, 99, (BB, 128)), jnp.int32)
    i = jnp.asarray(np.random.randint(0, 128, (BB, 128)), jnp.int32)
    try:
        dt, r = timeit(run, x, i)
        ok = np.array_equal(np.asarray(r),
                            np.take_along_axis(np.asarray(x), np.asarray(i),
                                               axis=1))
        print(f"probeC take_along_axis lanes: {dt*1e6:.1f}us ok={ok}")
    except Exception as e:
        print("probeC FAILED:", str(e)[:200])


# ---------------------------------------------------------------- probe D
# scalar-assisted push: per lane, read count, conditionally store 5 fields
# x 3 candidates at dynamic slots. The DFS push replacement.
def probe_scalar_push():
    S = 256

    def kernel(c_ref, o_ref, f0, f1, f2, f3, f4, top_ref):
        top_ref[:] = jnp.zeros((BB, 128), jnp.int32)

        def outer(it, _):
            def body(i, _):
                n = c_ref[i, it & 7] & 3        # 0..3 candidates
                t = top_ref[i, 0]

                def push(j, t):
                    def do(t):
                        v = c_ref[i, j]
                        f0[i, t] = v
                        f1[i, t] = v + 1
                        f2[i, t] = v ^ 3
                        f3[i, t] = v - 7
                        f4[i, t] = v * 3
                        return (t + 1) & (S - 1)
                    return jax.lax.cond(j < n, do, lambda t: t, t)

                t = push(0, t)
                t = push(1, t)
                t = push(2, t)
                top_ref[i, 0] = t
                return 0
            jax.lax.fori_loop(0, BB, body, 0)
            return 0

        jax.lax.fori_loop(0, 50, outer, 0)
        o_ref[:] = f0[:, :128] + top_ref[:]

    @jax.jit
    def run(c):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BB, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((BB, S), jnp.int32)] * 5
            + [pltpu.VMEM((BB, 128), jnp.int32)],
        )(c)

    c = jnp.asarray(np.random.randint(0, 1 << 20, (BB, 128)), jnp.int32)
    try:
        dt, r = timeit(run, c, n=5)
        print(f"probeD scalar push 50 iters x {BB} lanes x <=3 cands: "
              f"{dt*1e3:.2f}ms ({dt/50*1e6:.1f}us/iter)")
    except Exception as e:
        print("probeD FAILED:", str(e)[:300])


# ---------------------------------------------------------------- probe E
# lane-axis sum of [512,128] -> [512,1] (occ reduction shape)
def probe_lanereduce():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].sum(axis=1, keepdims=True)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((512, 1), jnp.int32),
        )(x)

    x = jnp.asarray(np.random.randint(0, 99, (512, 128)), jnp.int32)
    dt, r = timeit(run, x)
    ok = np.array_equal(np.asarray(r)[:, 0], np.asarray(x).sum(1))
    print(f"probeE [512,128] lane-sum: {dt*1e6:.1f}us ok={ok}")


# ---------------------------------------------------------------- probe F
# the pop shape: min over S=256 slots + one-hot field extraction x5
def probe_pop():
    S = 256

    def kernel(x_ref, o_ref, key_ref, f_ref):
        key_ref[:] = x_ref[:]
        f_ref[:] = x_ref[:] ^ 21

        def body(it, _):
            mk = key_ref[:].min(axis=1, keepdims=True)
            pm = key_ref[:] == mk
            e1 = jnp.where(pm, f_ref[:], 0).sum(axis=1, keepdims=True)
            key_ref[:] = jnp.where(pm, 0x7FFFFFFF, key_ref[:])
            key_ref[:, :1] = key_ref[:, :1].at[:, :].min(e1)
            return 0

        jax.lax.fori_loop(0, 50, body, 0)
        o_ref[:] = key_ref[:, :128]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BB, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((BB, S), jnp.int32),
                            pltpu.VMEM((BB, S), jnp.int32)],
        )(x)

    x = jnp.asarray(np.random.randint(0, 1 << 20, (BB, S)), jnp.int32)
    try:
        dt, r = timeit(run, x, n=5)
        print(f"probeF pop-shape 50 iters S={S}: {dt*1e3:.2f}ms "
              f"({dt/50*1e6:.1f}us/iter)")
    except Exception as e:
        print("probeF FAILED:", str(e)[:300])


if __name__ == "__main__":
    which = sys.argv[1:] or ["A", "B1", "BU", "C", "D", "E", "F"]
    for w in which:
        if w == "A":
            probe_empty()
        elif w == "B1":
            probe_loads(1)
        elif w == "BU":
            probe_loads(BB)
        elif w == "C":
            probe_lane_gather()
        elif w == "D":
            probe_scalar_push()
        elif w == "E":
            probe_lanereduce()
        elif w == "F":
            probe_pop()
