"""Round-3 pallas probes: reduction strategies, relayouts, scalar-read
bisects, dynamic-trip loops.  Run ON TPU."""
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


def call(kernel, out_shape, scratch=(), **kw):
    @jax.jit
    def run(*a):
        return pl.pallas_call(
            kernel, out_shape=out_shape,
            scratch_shapes=list(scratch), **kw)(*a)
    return run


# P1: scalar read from VMEM at lane 1 (probeB crash bisect)
def p1():
    def kernel(i_ref, t_ref, o_ref):
        def body(i, _):
            r = i_ref[i, 0]
            o_ref[pl.ds(i, 1), :] = t_ref[pl.ds(r, 1), :]
            r2 = i_ref[i, 1]          # lane-1 scalar read — suspect
            o_ref[pl.ds(i + 256, 1), :] = t_ref[pl.ds(r2, 1), :]
            return 0
        jax.lax.fori_loop(0, 256, body, 0)

    run = call(kernel, jax.ShapeDtypeStruct((512, 128), jnp.int32))
    i = jnp.asarray(np.random.randint(0, 4096, (256, 128)), jnp.int32)
    t = jnp.asarray(np.random.randint(0, 99, (4096, 128)), jnp.int32)
    try:
        dt, r = timeit(run, i, t)
        ok = np.array_equal(np.asarray(r)[:256],
                            np.asarray(t)[np.asarray(i)[:, 0]]) and \
            np.array_equal(np.asarray(r)[256:],
                           np.asarray(t)[np.asarray(i)[:, 1]])
        print(f"P1 lane-1 scalar read: {dt*1e6:.1f}us ok={ok}")
    except Exception as e:
        print("P1 FAILED:", str(e)[:150])


# P1b: same but idx arrays are separate [256,1] columns
def p1b():
    def kernel(i_ref, j_ref, t_ref, o_ref):
        def body(i, _):
            r = i_ref[i, 0]
            o_ref[pl.ds(i, 1), :] = t_ref[pl.ds(r, 1), :]
            r2 = j_ref[i, 0]
            o_ref[pl.ds(i + 256, 1), :] = t_ref[pl.ds(r2, 1), :]
            return 0
        jax.lax.fori_loop(0, 256, body, 0)

    run = call(kernel, jax.ShapeDtypeStruct((512, 128), jnp.int32))
    i = jnp.asarray(np.random.randint(0, 4096, (256, 1)), jnp.int32)
    j = jnp.asarray(np.random.randint(0, 4096, (256, 1)), jnp.int32)
    t = jnp.asarray(np.random.randint(0, 99, (4096, 128)), jnp.int32)
    try:
        dt, r = timeit(run, i, j, t)
        ok = np.array_equal(np.asarray(r)[:256],
                            np.asarray(t)[np.asarray(i)[:, 0]]) and \
            np.array_equal(np.asarray(r)[256:],
                           np.asarray(t)[np.asarray(j)[:, 0]])
        print(f"P1b two-col scalar reads 512 loads: {dt*1e6:.1f}us ok={ok}")
    except Exception as e:
        print("P1b FAILED:", str(e)[:150])


# P2: reduction strategies for [256,128] -> per-row min, 50 iterations
def p2():
    def mk(kind):
        def kernel(x_ref, o_ref, s_ref):
            s_ref[:] = x_ref[:]

            def body(i, _):
                v = s_ref[:]
                if kind == "native":
                    m = v.min(axis=1, keepdims=True)
                    s_ref[:] = v + m
                elif kind == "roll":
                    m = v
                    for sh in (64, 32, 16, 8, 4, 2, 1):
                        m = jnp.minimum(m, pltpu.roll(m, sh, 1))
                    s_ref[:] = v + m
                elif kind == "subl":
                    m = v.min(axis=0, keepdims=True)
                    s_ref[:] = v + m
                return 0

            jax.lax.fori_loop(0, 50, body, 0)
            o_ref[:] = s_ref[:]
        return kernel

    x = jnp.asarray(np.random.randint(0, 1 << 20, (256, 128)), jnp.int32)
    for kind in ("native", "roll", "subl"):
        try:
            run = call(mk(kind), jax.ShapeDtypeStruct((256, 128), jnp.int32),
                       scratch=[pltpu.VMEM((256, 128), jnp.int32)])
            dt, _ = timeit(run, x, n=5)
            print(f"P2 min-reduce[{kind}] 50 iters: {dt*1e3:.2f}ms "
                  f"({dt/50*1e6:.1f}us/iter)")
        except Exception as e:
            print(f"P2 [{kind}] FAILED:", str(e)[:150])


# P3: take_along_axis along sublanes (axis=0)
def p3():
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    run = call(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32))
    x = jnp.asarray(np.random.randint(0, 99, (128, 128)), jnp.int32)
    i = jnp.asarray(np.random.randint(0, 128, (8, 128)), jnp.int32)
    try:
        dt, r = timeit(run, x, i)
        ok = np.array_equal(np.asarray(r),
                            np.take_along_axis(np.asarray(x), np.asarray(i), axis=0))
        print(f"P3 take_along_axis sublanes: {dt*1e6:.1f}us ok={ok}")
    except Exception as e:
        print("P3 FAILED:", str(e)[:150])


# P4: reshape [512,16] -> [64,128] (sublane->lane relayout)
def p4():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:, :16].reshape(64, 128)

    run = call(kernel, jax.ShapeDtypeStruct((64, 128), jnp.int32))
    x = jnp.asarray(np.random.randint(0, 99, (512, 128)), jnp.int32)
    try:
        dt, r = timeit(run, x)
        ok = np.array_equal(np.asarray(r),
                            np.asarray(x)[:, :16].reshape(64, 128))
        print(f"P4 reshape [512,16]->[64,128]: {dt*1e6:.1f}us ok={ok}")
    except Exception as e:
        print("P4 FAILED:", str(e)[:150])


# P5: dynamic-trip-count inner fori (while) inside outer loop
def p5():
    def kernel(x_ref, o_ref, s_ref):
        s_ref[:] = x_ref[:]

        def outer(it, _):
            n = (s_ref[0, 0] & 3) + 1

            def inner(j, _):
                s_ref[:] = s_ref[:] + j
                return 0
            jax.lax.fori_loop(0, n, inner, 0)
            return 0

        jax.lax.fori_loop(0, 50, outer, 0)
        o_ref[:] = s_ref[:]

    run = call(kernel, jax.ShapeDtypeStruct((256, 128), jnp.int32),
               scratch=[pltpu.VMEM((256, 128), jnp.int32)])
    x = jnp.asarray(np.random.randint(0, 1 << 20, (256, 128)), jnp.int32)
    try:
        dt, _ = timeit(run, x, n=5)
        print(f"P5 dyn-trip inner fori 50 outers: {dt*1e3:.2f}ms")
    except Exception as e:
        print("P5 FAILED:", str(e)[:150])


# P6: matmul-with-ones lane reduction: [512,128] @ [128,8] -> [512,8] f32
def p6():
    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    run = call(kernel, jax.ShapeDtypeStruct((512, 8), jnp.float32))
    x = jnp.asarray(np.random.randint(0, 99, (512, 128)), jnp.int32)
    w = jnp.asarray(np.ones((128, 8)), jnp.float32)
    try:
        dt, r = timeit(run, x, w)
        ok = np.allclose(np.asarray(r)[:, 0], np.asarray(x).sum(1))
        print(f"P6 matmul-ones reduce [512,128]: {dt*1e6:.1f}us ok={ok}")
    except Exception as e:
        print("P6 FAILED:", str(e)[:150])


# P7: op cost on [1,256] vs [256,1] vs [8,256], 200 chained ops
def p7():
    def mk(shape):
        def kernel(x_ref, o_ref):
            v = x_ref[:]
            for i in range(200):
                v = (v + i) ^ (v >> 2)
            o_ref[:] = v
        return kernel

    for shape in ((1, 256), (256, 1), (8, 256), (8, 512)):
        x = jnp.asarray(np.random.randint(0, 99, shape), jnp.int32)
        try:
            run = call(mk(shape), jax.ShapeDtypeStruct(shape, jnp.int32))
            dt, _ = timeit(run, x)
            print(f"P7 200 ops on {shape}: {dt*1e6:.1f}us")
        except Exception as e:
            print(f"P7 {shape} FAILED:", str(e)[:150])


# P8: broadcast [256,1] * [1? ...] mixed col/row math (the expansion shape)
def p8():
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]          # [256,1] per-read scalars
        b = b_ref[:]          # [256,128] plane
        v = b
        for i in range(30):
            v = jnp.where(v > a, v - a, v + i)
        o_ref[:] = v

    run = call(kernel, jax.ShapeDtypeStruct((256, 128), jnp.int32))
    a = jnp.asarray(np.random.randint(1, 99, (256, 1)), jnp.int32)
    b = jnp.asarray(np.random.randint(0, 99, (256, 128)), jnp.int32)
    try:
        dt, _ = timeit(run, a, b)
        print(f"P8 30 col-broadcast ops on [256,128]: {dt*1e6:.1f}us")
    except Exception as e:
        print("P8 FAILED:", str(e)[:150])


if __name__ == "__main__":
    names = {"1": p1, "1b": p1b, "2": p2, "3": p3, "4": p4, "5": p5,
             "6": p6, "7": p7, "8": p8}
    for w in sys.argv[1:] or list(names):
        names[w]()
