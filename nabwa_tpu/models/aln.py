"""`aln` workflow driver — the TPU replacement for bwa_cal_sa_reg_gap /
bwa_aln_core (bwtaln.c:93-257).

Batch pipeline per reference chunk (0x40000 reads, bwtaln.c:208):
  host: read prep → pad to device batch
  device: cal_width (fwd+rev, + seed suffix) → DFS engine → hit arrays
  host: unpack to per-read hit lists (append order), scalar fallback for
        overflow-flagged reads, .sai-compatible output
Batch-level option quirks replicated: local max_diff from the chunk's max
read length sizes nothing here, but its max_gapo clamp (bwtaln.c:105) and
the per-read max_diff/seed_len recomputation (bwtaln.c:125-126) do.
"""

import copy
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import BWA_AVG_ERR
from ..ops.dfs import unpack_result
from ..refmodel.aln_scalar import cal_maxdiff, aln_batch as scalar_aln_batch
from ..refmodel.fm_scalar import ScalarFm


def _i32(v):
    """uint32 value → int32 bit pattern scalar."""
    return np.array([v], dtype=np.uint32).view(np.int32)[0]


def _maxdiff_table(fnr, max_len=1024):
    tab = np.zeros(max_len + 1, dtype=np.int32)
    for l in range(1, max_len + 1):
        tab[l] = cal_maxdiff(l, BWA_AVG_ERR, fnr)
    return tab


def plan_device_share(n_reads, device_batch, dev_rate, host_rate,
                      n_cores, dev_lat):
    """The hybrid split policy, as a pure function so tests can pin its
    routing decisions (a kernel regression must not silently re-route all
    work to the host and fake a win).

    Returns n_dev, the number of reads handed to the device this chunk.

    - proportional split from the two rate EMAs, rounded to whole
      device_batch slices;
    - opportunity-cost check: driving the device costs ~one host core of
      runtime/transfer work (measured: the device queue stalls when
      native saturates every core), so the device share must out-produce
      the per-core host rate it displaces — through a high-latency tunnel
      it may not, and the right call is to leave the link idle;
    - latency guard: a device share also pays a fixed tunnel cost
      (dispatch + result round trips); shed slices until the predicted
      device window fits inside the host drain window."""
    n_dev = int(n_reads * dev_rate / (dev_rate + host_rate))
    n_dev = (n_dev // device_batch) * device_batch
    n_dev = min(n_dev, n_reads)
    per_core = host_rate / max(n_cores, 1)
    if dev_rate < 1.1 * per_core:
        n_dev = 0
    while n_dev and (dev_lat + n_dev / dev_rate) > \
            1.1 * (n_reads - n_dev) / host_rate:
        n_dev -= device_batch
    return n_dev


class AlnEngine:
    """Holds device arrays + compiled DFS for one index."""

    # pallas tier geometry: block of 64 reads per grid step (measured
    # fastest of 256/128/64/32 on v5e), retry stack must fit VMEM
    PALLAS_BB = 64
    PALLAS_MAX_TABLE = 10 << 20       # ~10 Mbp genome in VMEM
    PALLAS_MXU_ROWS = 16384           # one-hot matmul gather cutoff
    # HBM-tier genome cap: positions are uint32 bit patterns on int32
    # lanes (ops.u32 semantics inside the kernel), so the tier matches
    # the reference's bwtint_t uint32 range — ~4 Gbp, enforced at
    # bwtindex.c:103-105 (bwt.h:41)
    PALLAS_HBM_MAX_POS = 2**32 - 16
    PALLAS_MAX_STACK = 1024
    # fixed per-chunk device overhead (s): dispatch + result collection
    # round trips over the device link (measured ~30 ms/RTT through the
    # tunnel, a few RTTs per chunk)
    DEV_LAT = 0.12

    def __init__(self, index, opt, stack_cap=256, hits_cap=32,
                 max_iters=2_000_000, retry_stack_cap=1024,
                 retry_hits_cap=128, tier0_max_iters=768, mesh=None,
                 use_pallas="auto", host_frac="auto"):
        """stack_cap is deliberately small: per-DFS-iteration cost on TPU is
        dominated by whole-stack-array traffic, and the observed per-read
        stack high-water is ~250 typical / ~1000 for hard reads.  Reads that
        overflow retry once with retry_stack_cap, then fall back to the
        scalar host model.

        mesh: optional jax.sharding.Mesh with a "dp" axis.  The index is
        replicated per device and read batches are sharded over "dp" (the
        reference replicates the index per process and data-parallelizes
        reads, SURVEY §2.9); jit then partitions the DFS across devices."""
        self.index = index
        self.opt = opt
        self.stack_cap = stack_cap
        self.hits_cap = hits_cap
        self.retry_stack_cap = retry_stack_cap
        self.retry_hits_cap = retry_hits_cap
        self.max_iters = max_iters
        # tier-0 iteration cap: the lockstep batch is tail-bound (one hard
        # read makes every lane iterate), so unfinished reads at the cap
        # re-run in the retry tier instead of stalling the whole batch
        self.tier0_max_iters = tier0_max_iters
        # device/host work split (see run_chunk): starting fraction of
        # each chunk handed to the host's native engine, adapted per
        # chunk toward rate-balanced finish times.  "auto" starts at
        # 0.5 and converges within a couple of chunks; 0 disables.
        import os as _os
        env = _os.environ.get("NABWA_HOST_FRAC")
        if env is not None:
            host_frac = float(env)
        # test hook: run the Pallas tiers in interpret mode on CPU so the
        # engine-level tier selection (_device_init/_run_device) is
        # exercisable without hardware (VERDICT r4 weak #2)
        self._pal_interpret = bool(_os.environ.get("NABWA_PALLAS_INTERPRET"))
        # HBM DFS fetch mode (see dfs_pallas): 0 legacy per-copy
        # guards + sequential drain, 1 unconditional issue + unrolled
        # drain, 2 + single-slab-descriptor drain, 3 + SMEM-staged row
        # indices (default: 5.3k -> 7.8k reads/s device-only at 64 Mbp
        # on v5e — the scalar core reads VMEM an order of magnitude
        # slower than SMEM, and the issue loop does 2*BB such reads)
        try:
            self._pal_fetch2 = int(
                _os.environ.get("NABWA_PALLAS_FETCH2", "3"))
        except ValueError:
            self._pal_fetch2 = 3
        self.host_frac = 0.5 if host_frac == "auto" else float(host_frac)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._repl = NamedSharding(mesh, P())
            self._dp = NamedSharding(mesh, P("dp"))
            self._n_dev = mesh.devices.size
        fwd, rev = index.fwd, index.rev
        assert np.array_equal(fwd.l2, rev.l2), "L2 must match for fwd/rev"
        self.rev_off = len(fwd.bwt)
        self.primary_fwd = _i32(fwd.primary)
        self.primary_rev = _i32(rev.primary)
        self.seq_len = _i32(fwd.seq_len)
        self._scalar_fms = None
        # host-side uint32 views for the native engine: _drain_native must
        # NOT round-trip the device copies (np.asarray on a jax array is a
        # device->host transfer per call on this backend)
        self._host_fwd = np.ascontiguousarray(fwd.bwt, dtype=np.uint32)
        self._host_rev = np.ascontiguousarray(rev.bwt, dtype=np.uint32)
        self._host_l2 = np.ascontiguousarray(fwd.l2, dtype=np.uint32)
        # device arrays + Pallas tables are built lazily on first device
        # use: native-only runs (and worker processes through
        # NABWA_FORCE_NATIVE) never pay the device copies or backend init,
        # and the index files stay mmap-shared across co-located workers
        self._use_pallas = use_pallas
        self._dev = None

    # --- lazy device state -------------------------------------------
    _DEV_ATTRS = ("bwt_fwd", "bwt_rev", "bwt_cat", "l2", "sa_fwd",
                  "sa_rev", "_pal_table", "_pal_mxu", "_pal_hbm",
                  "_pal_params")

    def _device_init(self):
        """Build the device-resident arrays (int32 bit patterns, ops.u32
        rationale) and the Pallas DFS tables on first device use."""
        fwd, rev = self.index.fwd, self.index.rev
        mesh = self.mesh

        def dput(arr):
            a = jnp.asarray(arr)
            return jax.device_put(a, self._repl) if mesh is not None else a

        d = {
            "bwt_fwd": dput(fwd.bwt.view(np.int32)),
            "bwt_rev": dput(rev.bwt.view(np.int32)),
            # bwt_cat (the jnp engine's concatenated view) is built on
            # first use only: the Pallas tiers never touch it, and at
            # 3 Gbp it would be 2.25 GB of dead HBM next to the 3 GB
            # block16 table
            "bwt_cat": None,
            "l2": dput(fwd.l2.view(np.int32)),
            "sa_fwd": dput(fwd.sa.view(np.int32)),
            "sa_rev": dput(rev.sa.view(np.int32)),
            "_pal_table": None,
            "_pal_mxu": False,
            "_pal_hbm": False,
            "_pal_params": None,
        }
        # Pallas DFS kernel (ops/dfs_pallas.py): whole search in one
        # pallas_call with VMEM-resident BWT + stacks — ~2.2x the jnp
        # while-loop engine per tier.  Applicable when the genome's
        # block16 table fits VMEM and we run directly on a TPU backend
        # (the jnp path stays for CPU tests and mesh-sharded runs).
        use_pallas = self._use_pallas
        if use_pallas == "auto":
            use_pallas = (mesh is None
                          and jax.default_backend() == "tpu")
        if use_pallas:
            from ..ops import dfs_pallas
            table, rev_row0 = dfs_pallas.build_table(
                np.concatenate([fwd.bwt.view(np.int32),
                                rev.bwt.view(np.int32)]), self.rev_off)
            if table.nbytes <= self.PALLAS_MAX_TABLE:
                # small genomes: byte-plane table, occ fetches become ONE
                # int8 one-hot matmul on the MXU per iteration instead of
                # 2*BB scalar-core row copies
                if table.shape[0] <= self.PALLAS_MXU_ROWS:
                    d["_pal_table"] = jnp.asarray(
                        dfs_pallas.build_table_i8(table))
                    d["_pal_mxu"] = True
                else:
                    d["_pal_table"] = jnp.asarray(table)
            elif fwd.seq_len < self.PALLAS_HBM_MAX_POS:
                # chromosome/genome scale: the table stays HBM-resident
                # and each iteration DMAs its two 512 B block rows per
                # lane — no VMEM size gate (VERDICT r2 #1).  Position
                # arithmetic runs uint32-on-int32 (ops.u32), so human
                # 3 Gbp indexes run on this tier (VERDICT r3 #2).
                d["_pal_table"] = jnp.asarray(table)
                d["_pal_hbm"] = True
                # wider blocks amortize the per-iteration fixed cost
                # (loop machinery, sweep) over 2x lanes: 6.8k -> 7.8k
                # reads/s at 64 Mbp on v5e; BB=256 exceeds the 16 MB
                # scoped-vmem stack limit
                self.PALLAS_BB = int(os.environ.get("NABWA_PALLAS_BB",
                                                    "128"))
            if d["_pal_table"] is not None:
                d["_pal_params"] = jnp.asarray(dfs_pallas.build_params(
                    fwd.l2.view(np.int32), self.primary_fwd,
                    self.primary_rev, self.seq_len, rev_row0))
        self._dev = d
        return d

    def __getattr__(self, name):
        if name in AlnEngine._DEV_ATTRS:
            d = self.__dict__.get("_dev")
            if d is None:
                d = self._device_init()
            if name == "bwt_cat" and d["bwt_cat"] is None:
                fwd, rev = self.index.fwd, self.index.rev
                cat = jnp.asarray(np.concatenate(
                    [fwd.bwt.view(np.int32), rev.bwt.view(np.int32)]))
                if self.mesh is not None:
                    cat = jax.device_put(cat, self._repl)
                d["bwt_cat"] = cat
            return d[name]
        raise AttributeError(name)

    def _shard_batch(self, arr):
        """Shard a [B, ...] batch array over the dp axis (replicate-free)."""
        a = jnp.asarray(arr)
        if self.mesh is None:
            return a
        return jax.device_put(a, self._dp)

    def scalar_fms(self):
        if self._scalar_fms is None:
            f, r = self.index.fwd, self.index.rev
            self._scalar_fms = (
                ScalarFm(f.bwt, f.primary, f.l2, f.seq_len, f.sa, f.sa_intv),
                ScalarFm(r.bwt, r.primary, r.l2, r.seq_len, r.sa, r.sa_intv))
        return self._scalar_fms

    def run_chunk(self, reads, device_batch=1024, per_read_semantics=False):
        """Process one reference-chunk of reads; returns list of
        (alns, max_entries) in read order.

        per_read_semantics=True mirrors bam2bam's per-record
        bwa_cal_sa_reg_gap calls (bam2bam.c:616,676): the batch-level
        max_gapo clamp (bwtaln.c:105) applies per READ; reads are grouped
        by their clamped max_gapo so each group runs with matching statics.
        """
        opt = self.opt
        if not reads:
            return []
        lens_arr = None
        if not isinstance(reads, list):
            from ..io.fastq import ReadBatch
            if isinstance(reads, ReadBatch):
                # columnar batch: lengths come off the offsets, and the
                # native engine packs seqs straight from the flats
                lens_arr = reads.clip_lens()
            else:
                reads = list(reads)
        max_len = int(lens_arr.max()) if lens_arr is not None \
            else max(r.len for r in reads)
        if opt.fnr > 0.0:
            tab = _maxdiff_table(opt.fnr, max(max_len, 64))
            per_read_maxdiff = tab[lens_arr] if lens_arr is not None \
                else np.array([tab[r.len] for r in reads], dtype=np.int32)
        else:
            per_read_maxdiff = np.full(len(reads), opt.max_diff,
                                       dtype=np.int32)

        results = [None] * len(reads)
        if not per_read_semantics:
            local = copy.copy(opt)
            if opt.fnr > 0.0:
                local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
            if local.max_diff < local.max_gapo:
                local.max_gapo = local.max_diff

            # Heterogeneous overlap: the DFS is a scalar pointer-chase whose
            # TPU rate is bounded by the scalar core's issue rate (two
            # random block fetches per read per step), while the host's
            # threaded native engine (native/dfsgap.cpp) runs the same
            # search bit-exactly.  jax dispatch is async, so the overlap is
            # threadless: dispatch the device share (whole slices, one
            # compile bucket), run the native drain in THIS thread (the C
            # call drops the GIL; the device works through its queue
            # meanwhile), then collect.  Every sync point with the device
            # costs a tunnel round trip (~30 ms measured), so the device
            # share is a few large slices, not a polled work queue; the
            # split fraction comes from per-engine rate EMAs.
            import os as _os
            use_native = self._native_ok()
            if (use_native and self.mesh is None
                    and _os.environ.get("NABWA_FORCE_NATIVE")):
                # operator escape hatch: device link down / undesired
                self._drain_native(reads, per_read_maxdiff, local, results,
                                   list(range(len(reads))))
                return results
            hybrid = (use_native and self.mesh is None and len(reads) >= 256
                      and jax.default_backend() == "tpu"
                      and self.host_frac > 0.0)
            defer = []
            ovf = []
            if hybrid:
                import os as _os
                import time as _time
                dev_rate = getattr(self, "_dev_rate", 8_000.0)
                host_rate = getattr(self, "_host_rate", 25_000.0)
                n_dev = plan_device_share(
                    len(reads), device_batch, dev_rate, host_rate,
                    _os.cpu_count() or 1, self.DEV_LAT)
                env_share = _os.environ.get("NABWA_DEV_SHARE")
                if env_share:
                    # measurement override: pin the device share to a
                    # fixed fraction (policy experiments on hardware)
                    n_dev = min(len(reads),
                                (int(float(env_share) * len(reads))
                                 // device_batch) * device_batch)
                handles = []
                t_disp0 = _time.time()
                for start in range(0, n_dev, device_batch):
                    part = reads[start:start + device_batch]
                    handles.append((start, part, self._run_device(
                        part, per_read_maxdiff[start:start + len(part)],
                        local, results, start, max_len,
                        dispatch_only=True)))
                t_host0 = _time.time()
                if n_dev < len(reads):
                    self._drain_native(
                        reads[n_dev:], per_read_maxdiff[n_dev:], local,
                        results, list(range(n_dev, len(reads))))
                t_host1 = _time.time()
                for start, part, ctx in handles:
                    fb = self._collect_device(ctx, part, results, start)
                    if fb:
                        ovf.extend(start + i for i in fb)
                t_dev1 = _time.time()
                if ovf:
                    self._drain_native([reads[i] for i in ovf],
                                       per_read_maxdiff[ovf], local,
                                       results, ovf)
                # rate EMAs for the next chunk's split.  The host window is
                # always clean (the drain is timed exactly).  The device
                # window (dispatch -> last collect) is only a valid rate
                # measurement when the device outlived the host drain —
                # otherwise the device finished somewhere inside the host
                # window and the quotient just echoes the host time, which
                # would decay the estimate until the device gets no work.
                if n_dev and (t_dev1 - t_host1) > 0.1 * (t_dev1 - t_disp0):
                    r = n_dev / max(t_dev1 - t_disp0, 1e-9)
                    self._dev_rate = (0.5 * dev_rate + 0.5 * r
                                      if hasattr(self, "_dev_rate") else r)
                if n_dev < len(reads):
                    r = (len(reads) - n_dev) / max(t_host1 - t_host0, 1e-9)
                    self._host_rate = (0.5 * host_rate + 0.5 * r
                                       if hasattr(self, "_host_rate")
                                       else r)
                return results

            # Device-only (or CPU/mesh) pipelined tier-0: dispatch EVERY
            # slice's device call up front (jax dispatch is async — the
            # chip works through the queue), then collect in order;
            # overflow reads queue for the retry tier / host drain.
            import os as _os2
            import time as _time
            timing = bool(_os2.environ.get("NABWA_TIMING"))
            t_dev0 = _time.time()
            handles = []
            for start in range(0, len(reads), device_batch):
                part = reads[start:start + device_batch]
                handles.append((start, part, self._run_device(
                    part, per_read_maxdiff[start:start + len(part)],
                    local, results, start, max_len, defer=defer,
                    dispatch_only=True)))
            t_disp = _time.time()
            for start, part, ctx in handles:
                fb = self._collect_device(ctx, part, results, start)
                if not fb:
                    continue
                if use_native:
                    ovf.extend(start + i for i in fb)
                else:
                    # hw sorts the device retry hardest-first below
                    hw = ctx["hw"]
                    defer.extend((start + i, int(hw[i])) for i in fb)
            if timing:
                print(f"[aln.timing] tier0 dispatch {t_disp-t_dev0:.3f}s "
                      f"collect {_time.time()-t_disp:.3f}s "
                      f"ovf={len(ovf)} defer={len(defer)}")
            if self.mesh is None and jax.default_backend() == "tpu":
                # clean device-only rate: seeds the hybrid split estimate.
                # The first device-only chunk per engine is compile-laden
                # (minutes on a cold cache) — never let it into the EMA.
                if getattr(self, "_dev_warmed", False):
                    r = len(reads) / max(_time.time() - t_dev0, 1e-9)
                    self._dev_rate = (0.5 * self._dev_rate + 0.5 * r
                                      if hasattr(self, "_dev_rate") else r)
                self._dev_warmed = True
            if ovf:
                t_n0 = _time.time()
                self._drain_native([reads[i] for i in ovf],
                                   per_read_maxdiff[ovf], local,
                                   results, ovf)
                if timing:
                    print(f"[aln.timing] native drain {len(ovf)} reads "
                          f"{_time.time()-t_n0:.3f}s")
            if defer:
                # retry tier, pipelined like tier-0: dispatch every
                # big-stack slice before collecting any
                t_r0 = _time.time()
                defer.sort(key=lambda t: -t[1])
                idxs = [i for i, _ in defer]
                fb_reads = [reads[i] for i in idxs]
                fb_md = per_read_maxdiff[idxs]
                sub_res = [None] * len(idxs)
                rhandles = []
                for start in range(0, len(fb_reads), device_batch):
                    part = fb_reads[start:start + device_batch]
                    rhandles.append((start, part, self._run_device(
                        part, fb_md[start:start + len(part)], local,
                        sub_res, start, max_len,
                        stack_cap=self.retry_stack_cap,
                        hits_cap=self.retry_hits_cap, tier=1,
                        dispatch_only=True)))
                for start, part, ctx in rhandles:
                    fb = self._collect_device(ctx, part, sub_res, start)
                    if fb:
                        # retry-tier overflow: scalar/native last resort
                        fb_md2 = np.asarray([fb_md[start + i] for i in fb],
                                            dtype=np.int32)
                        self._drain_native([part[i] for i in fb], fb_md2,
                                           local, sub_res,
                                           [start + i for i in fb])
                for i, res in zip(idxs, sub_res):
                    results[i] = res
                if timing:
                    print(f"[aln.timing] device retry {len(idxs)} reads "
                          f"{_time.time()-t_r0:.3f}s")
            return results

        # group by per-read clamped max_gapo (identical almost always)
        groups = {}
        for i, r in enumerate(reads):
            mg = min(opt.max_gapo, per_read_maxdiff[i]) \
                if opt.fnr > 0.0 else \
                (opt.max_gapo if opt.max_diff >= opt.max_gapo
                 else opt.max_diff)
            groups.setdefault(mg, []).append(i)
        # engine choice per group (results are bit-identical either way):
        # the jnp lockstep DFS on the CPU backend is the slowest option by
        # ~2 orders, so groups drain natively there; on TPU the device
        # runs unless measurements say it loses its opportunity cost
        import os as _os
        use_native = self._native_ok() and self.mesh is None and (
            jax.default_backend() != "tpu"
            or bool(_os.environ.get("NABWA_FORCE_NATIVE"))
            or (getattr(self, "_dev_rate", None) is not None
                and getattr(self, "_host_rate", None) is not None
                and self._dev_rate < 1.1 * self._host_rate
                / max(_os.cpu_count() or 1, 1)))
        for mg, idxs in groups.items():
            local = copy.copy(opt)
            local.max_gapo = int(mg)
            local.max_diff = int(per_read_maxdiff[idxs].max())
            sub_reads = [reads[i] for i in idxs]
            sub_md = per_read_maxdiff[idxs]
            sub_res = [None] * len(idxs)
            sub_maxlen = max(r.len for r in sub_reads)
            if use_native:
                self._drain_native(sub_reads, sub_md, local, sub_res,
                                   list(range(len(idxs))))
            else:
                for start in range(0, len(sub_reads), device_batch):
                    part = sub_reads[start:start + device_batch]
                    self._run_device(part, sub_md[start:start + len(part)],
                                     local, sub_res, start, sub_maxlen)
            for i, res in zip(idxs, sub_res):
                results[i] = res
        return results

    def _native_ok(self):
        from ..index import native as native_mod
        return native_mod._load() is not None

    def sa_rows(self, a, rows):
        """Batched bwt_sa (bwt.c:72-81) for SA rows on strand-a's index:
        uint32 rows -> raw uint32 bwt_sa values (callers apply the
        reverse-index coordinate flip).  Routes to the native host walk
        on non-TPU backends / NABWA_FORCE_NATIVE, else the device kernel."""
        import os as _os
        rows = np.ascontiguousarray(rows, dtype=np.uint32)
        if len(rows) == 0:
            return np.zeros(0, dtype=np.uint32)
        fm = self.index.fwd if a else self.index.rev
        use_native = self._native_ok() and (
            bool(_os.environ.get("NABWA_FORCE_NATIVE"))
            or jax.default_backend() != "tpu")
        if use_native:
            from ..index.native import bwt_sa_batch
            out = bwt_sa_batch(
                self._host_fwd if a else self._host_rev,
                fm.primary, self._host_l2, fm.seq_len, fm.sa, fm.sa_intv,
                rows)
            if out is not None:
                return out
        from ..ops.sa_lookup import sa_lookup
        res = sa_lookup(
            self.bwt_fwd if a else self.bwt_rev, self.l2,
            self.primary_fwd if a else self.primary_rev, self.seq_len,
            self.sa_fwd if a else self.sa_rev, fm.sa_intv,
            jnp.asarray(rows.view(np.int32)))
        return np.asarray(res).view(np.uint32)

    def _drain_native(self, fb_reads, fb_maxdiff, local, results, idxs):
        """Solve reads on the host's threaded C++ DFS (bit-exact with the
        device engines); scalar-oracle fallback without the library."""
        from ..index.native import dfs_match_gap_native
        lo = copy.copy(local)
        lo.seed_len = self.opt.seed_len
        fb_maxdiff = np.asarray(fb_maxdiff, dtype=np.int32)
        native = dfs_match_gap_native(
            self._host_fwd, int(self.primary_fwd),
            self._host_rev, int(self.primary_rev),
            self._host_l2, int(self.seq_len),
            fb_reads, fb_maxdiff, lo,
            n_threads=getattr(self, "native_threads", 0))
        if native is not None:
            for i, res in zip(idxs, native):
                results[i] = res
            return
        fms = self.scalar_fms()
        from ..refmodel.dfs_scalar import match_gap
        from ..refmodel.aln_scalar import scalar_cal_width
        for i, r in zip(idxs, fb_reads):
            lo = copy.copy(local)
            if self.opt.fnr > 0.0:
                lo.max_diff = cal_maxdiff(r.len, BWA_AVG_ERR, self.opt.fnr)
            lo.seed_len = self.opt.seed_len \
                if self.opt.seed_len < r.len else 0x7FFFFFFF
            widths_s = (scalar_cal_width(fms[0], r.seq),
                        scalar_cal_width(fms[1], r.rseq))
            seed_w = None
            if r.len > self.opt.seed_len:
                seed_w = (
                    scalar_cal_width(fms[0],
                                     r.seq[r.len - self.opt.seed_len:]),
                    scalar_cal_width(fms[1],
                                     r.rseq[r.len - self.opt.seed_len:]))
            alns, hwv = match_gap(fms, r.len, (r.seq, r.rseq), widths_s,
                                  seed_w, lo, lo.max_diff, local.max_gapo)
            results[i] = (alns, hwv)

    def _collect_device(self, ctx, reads, results, base):
        """Block on one dispatched device call, unpack (ONE host transfer),
        fill `results`; returns the overflow index list (into reads)."""
        out = unpack_result(np.asarray(ctx["out"]), ctx["hits_cap"])
        n_aln = out["n_aln"]
        hit_meta = out["hit_meta"].view(np.uint32)
        hit_k = out["hit_k"].view(np.uint32)
        hit_l = out["hit_l"].view(np.uint32)
        hit_score = out["hit_score"]
        hw = out["hw"]
        ctx["hw"] = hw
        overflow = out["overflow"]
        fallback = []
        meta64 = hit_meta.astype(np.int64)
        nmm_l = (meta64 & 0xFF).tolist()
        ngo_l = ((meta64 >> 8) & 0xFF).tolist()
        nge_l = ((meta64 >> 16) & 0xFF).tolist()
        a_l = ((meta64 >> 24) & 1).tolist()
        k_l = hit_k.astype(np.int64).tolist()
        l_l = hit_l.astype(np.int64).tolist()
        sc_l = hit_score.astype(np.int64).tolist()
        na_l = n_aln.tolist()
        hw_l = hw.tolist()
        for i, r in enumerate(reads):
            if overflow[i]:
                fallback.append(i)
                continue
            na = na_l[i]
            alns = list(zip(nmm_l[i][:na], ngo_l[i][:na], nge_l[i][:na],
                            a_l[i][:na], k_l[i][:na], l_l[i][:na],
                            sc_l[i][:na]))
            results[base + i] = (alns, hw_l[i])
        return fallback

    def _run_device(self, reads, maxdiff, local, results, base, max_len,
                    stack_cap=None, hits_cap=None, tier=0, defer=None,
                    dispatch_only=False, lobotomy=()):
        # Bucket shapes (B to 64s, L to 32s) so recurring batch geometries
        # reuse compiled kernels; padding lanes are len-0 (done immediately).
        stack_cap = stack_cap or self.stack_cap
        hits_cap = hits_cap or self.hits_cap
        B = max(64, -(-len(reads) // 64) * 64)
        L = max(32, -(-max_len // 32) * 32)
        nreads = len(reads)
        maxdiff = np.concatenate(
            [maxdiff, np.zeros(B - nreads, dtype=np.int32)])
        SL = min(local.seed_len, L) if local.seed_len < 0x7FFFFFFF else L
        SL = max(SL, 1)
        seqs = np.full((B, 2, L), 4, dtype=np.int32)
        lengths = np.zeros(B, dtype=np.int32)
        for i, r in enumerate(reads):
            seqs[i, 0, :r.len] = r.seq
            seqs[i, 1, :r.len] = r.rseq
            lengths[i] = r.len
        # seed-suffix extraction (last seed_len bases, bwtaln.c:127-130) on
        # host; everything device-side runs in ONE fused jit call
        has_seed = lengths > local.seed_len if local.seed_len < 0x7FFFFFFF \
            else np.zeros(B, dtype=bool)
        has_seed = np.asarray(has_seed, dtype=bool)
        seed_starts = np.maximum(lengths - (local.seed_len
                                            if local.seed_len < 0x7FFFFFFF
                                            else 0), 0)
        gather_idx = np.minimum(seed_starts[:, None] + np.arange(SL), L - 1)
        sseq = np.stack([np.take_along_axis(seqs[:, 0, :], gather_idx, 1),
                         np.take_along_axis(seqs[:, 1, :], gather_idx, 1)],
                        axis=1)
        slen = np.where(has_seed, min(local.seed_len, SL), 0).astype(np.int32)

        statics = dict(
            s_mm=local.s_mm, s_gapo=local.s_gapo, s_gape=local.s_gape,
            max_gape=local.max_gape, max_gapo=local.max_gapo,
            indel_end_skip=local.indel_end_skip,
            max_del_occ=local.max_del_occ, max_entries=local.max_entries,
            max_top2=local.max_top2, max_seed_diff=local.max_seed_diff,
            seed_len=local.seed_len, mode=local.mode,
            stack_cap=stack_cap, hits_cap=hits_cap,
            max_iters=(self.tier0_max_iters
                       if tier == 0 and self.retry_stack_cap > stack_cap
                       else self.max_iters))
        # the meta packing holds i in 7 bits — gate on the true read
        # length, not the 32-bucketed L (100 bp reads bucket to L=128)
        use_pal = (self._pal_table is not None
                   and int(lengths.max(initial=0)) <= 127
                   and int(maxdiff.max(initial=0)) <= 15
                   and local.max_gapo <= 15 and local.max_gape <= 15
                   and stack_cap <= self.PALLAS_MAX_STACK
                   and B % self.PALLAS_BB == 0)
        if use_pal:
            from ..ops import dfs_pallas
            import os as _os3
            # the HBM tier runs the persistent-occupancy (lane-refill)
            # variant: finished lanes pull the next read instead of
            # no-op iterating until the whole block drains (the lockstep
            # block was ~54% idle at chromosome scale).  Lobotomy probes
            # measure the lockstep kernel.
            refill = (self._pal_hbm and not lobotomy
                      and not _os3.environ.get("NABWA_NO_REFILL"))
            if refill and statics["max_iters"] == self.tier0_max_iters:
                # the tier-0 iteration cap bounds the LOCKSTEP kernel's
                # tail per read; a refill block works through B/BB reads
                # per lane, so scale the budget accordingly (a flat 768
                # cap silently sent most of a 1024-read batch to the
                # host).  Do NOT uncap entirely: a pathological read can
                # pin its lane (observed at stack 64: one lane spun to
                # the 2M global cap, 30 s per block), and the cap is what
                # routes such reads to the retry/host tiers.
                statics["max_iters"] = (self.tier0_max_iters
                                        * max(B // self.PALLAS_BB, 1))
            out = dfs_pallas.aln_device_step_pallas(
                self._pal_table, self._pal_params, self.bwt_fwd,
                self.bwt_rev, self.rev_off, self.primary_fwd,
                self.primary_rev, self.l2, self.seq_len,
                jnp.asarray(seqs), jnp.asarray(lengths),
                jnp.asarray(sseq), jnp.asarray(slen),
                jnp.asarray(has_seed), jnp.asarray(maxdiff),
                BB=self.PALLAS_BB, mxu=self._pal_mxu,
                hbm=self._pal_hbm, refill=refill,
                fetch2=self._pal_fetch2, lobotomy=lobotomy,
                interpret=self._pal_interpret, **statics)
        else:
            from ..ops.dfs import aln_device_step
            out = aln_device_step(
                self.bwt_cat, self.bwt_fwd, self.bwt_rev, self.rev_off,
                self.primary_fwd, self.primary_rev, self.l2, self.seq_len,
                self._shard_batch(seqs), self._shard_batch(lengths),
                self._shard_batch(sseq), self._shard_batch(slen),
                self._shard_batch(has_seed), self._shard_batch(maxdiff),
                **statics)

        ctx = dict(out=out, hits_cap=hits_cap)
        if dispatch_only:
            return ctx

        fallback = self._collect_device(ctx, reads, results, base)
        hw = ctx["hw"]

        if fallback and tier == 0 and self.retry_stack_cap > stack_cap:
            if defer is not None:
                # caller batches retries globally; hw is the sort key
                defer.extend((base + i, int(hw[i])) for i in fallback)
                return
            # second device pass with the big stack for overflow reads only
            fb_reads = [reads[i] for i in fallback]
            fb_maxdiff = np.asarray([maxdiff[i] for i in fallback],
                                    dtype=np.int32)
            sub_results = [None] * len(fb_reads)
            self._run_device(fb_reads, fb_maxdiff, local, sub_results, 0,
                             max_len, stack_cap=self.retry_stack_cap,
                             hits_cap=self.retry_hits_cap, tier=1)
            for i, res in zip(fallback, sub_results):
                results[base + i] = res
            return

        if fallback:
            fb_reads = [reads[i] for i in fallback]
            fb_maxdiff = np.empty(len(fallback), dtype=np.int32)
            for j, r in enumerate(fb_reads):
                fb_maxdiff[j] = (cal_maxdiff(r.len, BWA_AVG_ERR,
                                             self.opt.fnr)
                                 if self.opt.fnr > 0.0 else local.max_diff)
            # pathological reads that overflow even the retry tier drain
            # on the host: threaded native C++ DFS (native/dfsgap.cpp) —
            # an irregular, pointer-chasing search is what scalar cores
            # do best — with the Python scalar oracle as last resort
            self._drain_native(fb_reads, fb_maxdiff, local, results,
                               [base + i for i in fallback])
            return
        return

