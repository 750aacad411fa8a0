"""DFS-iteration-shaped pallas mock with realistic op mix, measured in a
fresh process (tunnel degrades after failed compiles).  Run ON TPU:

    python scripts/probe_dfs_shape.py [BB] [S] [ITERS]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
S = int(sys.argv[2]) if len(sys.argv) > 2 else 128
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 200
NROW = 4096           # ~2Mbp genome both strands at 16 words/row

print("devices:", jax.devices(), f"BB={BB} S={S} ITERS={ITERS}")


def kernel(seed_ref, table_ref, o_ref,
           key_ref, f0, f1, f2, f3, stage_ref, kcol_ref, lcol_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (BB, S), 1)
    key_ref[:] = seed_ref[:, :S]
    f0[:] = seed_ref[:, :S] ^ 12345
    f1[:] = seed_ref[:, :S] + 7
    f2[:] = seed_ref[:, :S] ^ 999
    f3[:] = seed_ref[:, :S] - 3
    kcol_ref[:] = seed_ref[:, :128]
    lcol_ref[:] = seed_ref[:, :128] + 40

    def body(it, acc):
        # ---- pop: min over lanes, index extract, 4 field gathers ----
        key = key_ref[:]
        mk = key.min(axis=1, keepdims=True)
        am = jnp.where(key == mk, lane, S)
        slot = am.min(axis=1, keepdims=True)            # [BB,1]
        slotb = jnp.broadcast_to(slot, (BB, S))
        e0 = jnp.take_along_axis(f0[:], slotb, axis=1)[:, :1]
        e1 = jnp.take_along_axis(f1[:], slotb, axis=1)[:, :1]
        e2 = jnp.take_along_axis(f2[:], slotb, axis=1)[:, :1]
        e3 = jnp.take_along_axis(f3[:], slotb, axis=1)[:, :1]
        key_ref[:] = jnp.where(lane == slot, 0x7FFFFFFF, key)

        # ---- occ: 2 row loads per read ----
        kcol_ref[:, :1] = (e0 ^ e1) & (NROW - 1)
        lcol_ref[:, :1] = (e2 ^ e3) & (NROW - 1)

        def load(i, _):
            r = kcol_ref[i, 0]
            stage_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
            r2 = lcol_ref[i, 0]
            stage_ref[pl.ds(i + BB, 1), :] = table_ref[pl.ds(r2, 1), :]
            return 0
        jax.lax.fori_loop(0, BB, load, 0)

        # ---- occ math: masked popcounts over both staged banks ----
        rows = stage_ref[:]                              # [2BB,128]
        lanes2 = jax.lax.broadcasted_iota(jnp.int32, (2 * BB, 128), 1)
        rel = lanes2 - ((rows[:, :1] & 7) * 16)
        wordoff = (rows[:, 1:2] >> 4) & 7
        inblk = (rel >= 4) & (rel < 12)
        vm = jnp.where(rel - 4 < wordoff, -1,
                       jnp.where(rel - 4 == wordoff, -65536, 0))
        lo = rows & vm & 0x55555555
        hi = (rows >> 1) & vm & 0x55555555
        p1 = jax.lax.population_count(lo)
        p2 = jax.lax.population_count(hi)
        p3 = jax.lax.population_count(lo & hi)
        tot = jnp.where(inblk, p1 - p3 + p2 + p3 * 2, 0)
        cnt = tot.sum(axis=1, keepdims=True)             # [2BB,1]
        cnt_k = cnt[:BB]
        cnt_l = cnt[BB:]

        # ---- expansion math: ~40 cheap column ops ----
        a = e0 + cnt_k
        b = e1 + cnt_l
        for j in range(10):
            a = jnp.where(a > b, a - b, a + j)
            b = b ^ (a >> 2)
            a = a + (b & 15)
            b = jnp.minimum(b, a + 37)
        # 9 candidate columns
        cands_k = [a + j for j in range(9)]
        cands_v = [((b >> j) & 1) == 0 for j in range(9)]

        # prefix over 9 slots (unrolled adds)
        pref = [jnp.zeros_like(a)]
        for j in range(8):
            pref.append(pref[-1] + cands_v[j].astype(jnp.int32))

        # ---- push: one-hot writes into lowest free slots ----
        free = key_ref[:] == 0x7FFFFFFF
        # frank via segmented doubling (no cumsum): 7 shifted adds
        fr = free.astype(jnp.int32)
        r = fr
        for sh in (1, 2, 4, 8, 16, 32, 64):
            rolled = pltpu.roll(r, sh, 1)
            r = r + jnp.where(lane >= sh, rolled, 0)
        frank = r                                       # inclusive prefix
        for j in range(9):
            mask_j = cands_v[j] & free & (frank == pref[j] + 1)
            key_ref[:] = jnp.where(mask_j, cands_k[j], key_ref[:])
            f0[:] = jnp.where(mask_j, cands_k[j] ^ 1, f0[:])
            f1[:] = jnp.where(mask_j, cands_k[j] + it, f1[:])
            f2[:] = jnp.where(mask_j, cands_k[j] - 2, f2[:])
            f3[:] = jnp.where(mask_j, cands_k[j] * 3, f3[:])
        return acc + cnt_k.sum()

    acc = jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    o_ref[0, 0] = acc


@jax.jit
def run(seed, table):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((BB, S), jnp.int32)] * 5
        + [pltpu.VMEM((2 * BB, 128), jnp.int32)]
        + [pltpu.VMEM((BB, 128), jnp.int32)] * 2,
    )(seed, table)


seed = jnp.asarray(np.random.randint(0, 1 << 20, (BB, max(S, 128))),
                   jnp.int32)
table = jnp.asarray(np.random.randint(0, 1 << 30, (NROW, 128)), jnp.int32)

r = run(seed, table)
jax.block_until_ready(r)
t0 = time.perf_counter()
N = 10
for _ in range(N):
    r = run(seed, table)
jax.block_until_ready(r)
dt = (time.perf_counter() - t0) / N
print(f"dfs-shaped {ITERS} iters BB={BB} S={S}: {dt*1e3:.2f}ms total, "
      f"{dt/ITERS*1e6:.2f}us/iter, "
      f"{BB/(dt/ITERS)/1e6:.1f}M lane-iters/s")
