"""Host adapter for the Pallas TALCO kernel.

Plays the role of the reference's GPU batch manager
(/root/reference/src/cuda/alignment-gpu.cu:182-450): buckets a level's pairs
by padded length, packs profiles, launches the Pallas grid kernel (one
program per pair), and handles three escalation paths per pair:
  - error 6 (live band outgrew the kernel's static FLEN window): relaunch on
    a wider-window kernel — pairs start small (FLEN=512) because the X-drop
    band is usually narrow, so the common case runs on cheap vectors;
  - errors 1/2 (reference semantics: band collapse/limit): apply the
    reference's retry ladder (task != 0) or defer (task 0);
  - errors 3/4: fall back to the exact NumPy oracle on the host.
"""
from __future__ import annotations

import os
import sys
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import Options, Params


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


# discovery threads that never returned (tunnel outage): interpreter
# teardown with one of these still blocked inside PJRT client setup can
# abort, so cli.main checks this and hard-exits after flushing
_stuck_threads: List = []
_discovery_gave_up = False


def select_devices(devs, option):
    """--devices/--device-index semantics of the reference GPU build
    (cuda/gpu-info.cu:14-61): the count is bounds-checked, an explicit
    index list must match the count, and every index must exist. Invalid
    selections are user errors that exit(1) like the reference — they do
    not fall back to the host kernel."""
    import sys as _sys
    num, idx = option.device_num, option.device_index
    if num is None and idx is None:
        return devs
    maxn = len(devs)
    n = num if num is not None else maxn
    if n < 0 or n > maxn:
        print(f"ERROR: Invalid number of devices. Please request between "
              f"0 and {maxn}.", file=_sys.stderr)
        raise SystemExit(1)
    if idx is not None:
        if len(idx) != n:
            print("ERROR: the number of requested devices does not match "
                  "the number of specified device indexes.",
                  file=_sys.stderr)
            raise SystemExit(1)
        for i in idx:
            if i >= maxn or i < 0:
                print("ERROR: specified device index >= the number of "
                      "devices", file=_sys.stderr)
                raise SystemExit(1)
        chosen = [devs[i] for i in idx]
    else:
        chosen = devs[:n]
    if not chosen:
        # --devices 0: host-only; cli.main skips kernel creation, but a
        # direct DeviceTalco caller must not index an empty list
        raise RuntimeError("0 devices requested")
    print(f"Maximum available devices: {maxn}. Using {len(chosen)} "
          f"devices.", file=_sys.stderr)
    return chosen


def discover_devices(jax_mod, backend: str):
    """jax.local_devices() under a watchdog. The axon TPU tunnel, when
    down, blocks backend setup for 20+ minutes before erroring
    (observed: 'TPU backend setup/compile error (Unavailable)') — a
    --backend auto run must fall back to the host kernel long before
    that. Runs discovery in a daemon thread; on timeout
    (TWILIGHT_DEVICE_INIT_TIMEOUT seconds, default 60 — a healthy
    tunnel discovers in seconds; server-side compiles happen later, at
    first execution) raises RuntimeError, which cli.main treats like
    any other device-init failure."""
    import threading
    global _discovery_gave_up
    timeout_s = float(os.environ.get("TWILIGHT_DEVICE_INIT_TIMEOUT", 60))
    if _discovery_gave_up and not os.environ.get("TWILIGHT_DEVICE_RETRY"):
        # an earlier probe in THIS process already blocked for the full
        # timeout (its daemon thread is still wedged inside PJRT setup);
        # retrying spawns another thread that blocks just as long — a
        # workflow with several opportunistic probes would pay the
        # timeout once per probe against a dead tunnel
        raise RuntimeError(
            "device discovery already timed out in this process "
            "(set TWILIGHT_DEVICE_RETRY=1 to probe again)")
    out: Dict = {}

    def run():
        try:
            if backend in ("cpu", "tpu"):
                out["devs"] = jax_mod.local_devices(backend=backend)
            else:
                out["devs"] = jax_mod.local_devices()
        except Exception as e:
            out["err"] = e

    t = threading.Thread(target=run, daemon=True, name="tw-dev-discover")
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        _stuck_threads.append(t)
        _discovery_gave_up = True
        raise RuntimeError(
            f"device discovery did not return within {timeout_s:.0f} s "
            "(TPU tunnel down?); set TWILIGHT_DEVICE_INIT_TIMEOUT to "
            "wait longer")
    if "err" in out:
        raise out["err"]
    return out["devs"]


class DeviceTalco:
    def __init__(self, option: Options, param: Params):
        import jax  # deferred so numpy-only runs never touch jax
        # test/driver handle: the axon sitecustomize force-sets
        # JAX_PLATFORMS, so subprocesses pin the platform through the
        # config API instead of env vars
        plat = os.environ.get("TWILIGHT_JAX_PLATFORM")
        if plat:
            try:
                jax.config.update("jax_platforms", plat)
                nd = os.environ.get("TWILIGHT_JAX_CPU_DEVICES")
                if nd:
                    jax.config.update("jax_num_cpu_devices", int(nd))
            except Exception:
                pass  # backend already initialized; keep what we have
        self._jax = jax
        self.option = option
        self.param = param
        backend = option.device_backend
        # local_devices, not devices: under jax.distributed (multi-host
        # pods / the two-process gloo tests) jax.devices() includes other
        # hosts' non-addressable devices, which must not enter this
        # host's pairs mesh
        devs = discover_devices(jax, backend)
        devs = select_devices(devs, option)
        self.device = devs[0]
        # persistent compile cache on the TPU path only: CPU AOT
        # artifacts carry host machine features, so caching the
        # virtual-CPU-mesh dryruns sprayed "machine feature mismatch"
        # warnings into later runs (and CPU interpret-mode compiles are
        # cheap anyway)
        if self.device.platform == "tpu":
            cache_dir = os.path.expanduser(
                "~/.cache/twilight_tpu_jax/tpu")
            os.makedirs(cache_dir, exist_ok=True)
            try:
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1)
            except Exception:
                pass
        # Pallas TPU kernels run on CPU devices through interpret mode
        # (bit-identical; used by the virtual-mesh tests and the driver's
        # multi-chip dryrun)
        self.interpret = self.device.platform != "tpu"
        # multi-chip: a 1-D "pairs" mesh over all local devices; canonical
        # buckets are sharded over it with shard_map (the reference's
        # multi-GPU round-robin batch stealing, cuda/alignment-gpu.cu:
        # 231-252, as SPMD data parallelism)
        self.mesh = None
        self.mesh_size = 1
        if len(devs) > 1 and not os.environ.get("TWILIGHT_NO_MESH"):
            from jax.sharding import Mesh
            self.mesh = Mesh(np.array(devs), ("pairs",))
            self.mesh_size = len(devs)
        self._shard_cache: Dict[tuple, tuple] = {}
        # every _kernel request (padlen, flen, batch, leaf) — lets tests
        # and dryrun_multichip assert WHICH kernel routes a workload
        # exercised (leaf / hbm_in padlen>2048 / hbm_tb flen>1024)
        self.kernel_requests: list = []
        self.marker = 1 << 10
        self._orphans: list = []   # fetch threads of abandoned launches
        self.base_flen = 1 << 12          # reference fLen (CPU semantics)
        # starting static FLEN window; tunable for occupancy experiments
        # (smaller window = cheaper (GRP, W) vector ops but more err-6
        # relaunches when a group's union band outgrows it)
        self.init_window = int(os.environ.get("TWILIGHT_INIT_WINDOW",
                                              1 << 9))
        self.max_window = 1 << 15
        # pairs per grouped-kernel program (sublane group). 16 halves the
        # per-diagonal fixed costs per pair (the tb scratch nibble-packs
        # two pairs per byte to stay in VMEM) at the cost of a wider
        # shared union band per group
        # default 16 pairs/program on real devices since round-5 pm:
        # paired RESIDENT-input comparison measured grp16 at −12.7%
        # ms/pair (0.952 vs 1.090, batch 128) — the earlier "neutral"
        # verdicts were taken through the constant H2D term that
        # compressed compute deltas; e2e deferred-config parity and
        # escalation behavior are unchanged (BASELINE.md). Interpret
        # mode still forces 8 (XLA:CPU worker-stack SEGV on the
        # grp-16 protein compile).
        self.grp = int(os.environ.get("TWILIGHT_GRP", 16))
        if self.grp not in (8, 16):
            self.grp = 8
        if self.interpret and self.grp != 8:
            # XLA:CPU segfaults (worker-thread stack overflow) compiling
            # the grp-16 protein kernel in interpret mode; grp 16 is a
            # device-only optimization anyway
            self.grp = 8
        self.p = 6 if option.type == "n" else 22
        self.p8 = 8 if option.type == "n" else 24
        self.matrix_bytes = param.scoring_matrix.astype(np.float32).tobytes()
        self.msize = param.matrix_size
        # start compiling the canonical kernel shape immediately — the
        # device-side compilation (60-90 s when the server cache is cold)
        # then overlaps FASTA reading, tree parsing and the first levels'
        # host work instead of delaying the first launch
        self._warmup()

    def _warmup(self):
        import threading
        if self.interpret:
            return  # interpret mode has no device-side compile to hide

        def _go():
            import time as _t
            t0 = _t.time()
            try:
                # guess the canonical padlen bucket from the first input
                # sequence so the right program gets compiled
                m = 0
                try:
                    from ..seqio.fasta import iter_fasta
                    for _, _, s in iter_fasta(self.option.seq_file):
                        m = len(s)
                        break
                except Exception:
                    pass
                padlen = 2048 if m <= 2048 else (
                    32768 if m <= 32768 else _next_pow2(m))
                w = self.init_window
                batch = self._bucket_batch(padlen) * self.mesh_size
                if batch % self.grp != 0:
                    return
                kern, maxaln, off, tot = self._kernel(padlen, w, batch)
                args = self._pack_batch([], [], [], 0, padlen, w, batch,
                                        [], [], off, tot)
                with self._jax.default_device(self.device):
                    res = kern(*args)
                np.asarray(res[-1] if len(res) > 1 else res[0])
                self._warm_s = _t.time() - t0
            except Exception:
                pass  # warm-up is best-effort

        th = threading.Thread(target=_go)
        th.start()
        self._warm_thread = th
        self._orphans.append(th)

    def _to_device(self, args):
        """Explicit device_put of the big packed profile blocks before
        the jitted call: the tunnel's execute-argument upload path is
        ~25x slower than device_put for the same bytes (measured 159 vs
        74 ms per batch-64 launch, 2026-08-20 — this WAS the round-5
        "dark matter": ~66% of every launch was argument upload, not
        compute). Single-device only; the mesh path feeds shard_map
        host arrays so each shard slices its own block."""
        try:
            if self.mesh is not None and self.mesh_size > 1:
                return args
            j = self._jax
            return tuple(args[:9]) + tuple(
                j.device_put(a, self.device) for a in args[9:])
        except Exception:   # incl. tests built via __new__
            return args

    def _bucket_batch(self, padlen: int) -> int:
        """Canonical per-chip batch for a padded-length bucket: scaled
        down for long buckets so H2D bytes per launch stay roughly
        constant (a 32768-column pair ships 16x the data of a 2048 one),
        kept a multiple of 8 for the grouped kernel."""
        base = max(1, self.option.pair_batch)
        if padlen > 2048:
            g = self.grp
            base = max(g, (base * 2048 // padlen) // g * g)
        return base

    def _kernel(self, padlen: int, flen: int, batch: int,
                leaf: bool = False):
        """Returns (fn, maxaln, off, tot). Prefers the sublane-grouped
        kernel (8 pairs/program, ~8x wavefront throughput) when the
        traceback scratch fits VMEM; falls back to the single-pair kernel
        for wide windows (escalations) or when disabled. When a multi-chip
        mesh exists and the batch divides evenly, the grouped kernel is
        wrapped in shard_map so each chip runs batch/mesh_size pairs."""
        if "kernel_requests" not in self.__dict__:
            # instances built via __new__ (tests) skip __init__
            self.kernel_requests = []
        self.kernel_requests.append((padlen, flen, batch, leaf))
        # escalated windows up to 4096 (nt; 2048 protein — the P8*GRP*W
        # profile scratch doubles the VMEM plan) stay grouped: FLEN > 1024
        # builds the hbm_tb variant whose traceback scratch lives in HBM
        g8_max_flen = 4096 if self.p == 6 else 2048
        if (flen <= g8_max_flen and batch % self.grp == 0
                and padlen <= 32768
                and not os.environ.get("TWILIGHT_NO_G8")):
            # beyond the canonical 2048 bucket the grouped kernel keeps
            # its profile blocks in HBM and DMAs anchor windows on demand
            # (talco_pallas_g8 hbm_in), and the traceback merge is
            # chunked so VMEM temporaries stay O(CHUNK) — 30 kb pairs run
            # grouped at full sublane utilization instead of falling back
            # to the single-pair kernel.
            from . import talco_pallas_g8
            if (self.mesh is not None
                    and batch % (self.grp * self.mesh_size) == 0):
                return self._sharded_g8(padlen, flen, batch, leaf)
            kern, maxaln, off, tot = talco_pallas_g8.get_pallas_kernel_g8(
                padlen, flen, self.p, self.marker, self.matrix_bytes,
                self.msize, batch, leaf=leaf, interpret=self.interpret,
                grp=self.grp)
            return kern, maxaln, off, tot
        from . import talco_pallas
        kern, maxaln = talco_pallas.get_pallas_kernel(
            padlen, flen, self.p, self.marker, self.matrix_bytes,
            self.msize, batch, interpret=self.interpret)
        return kern, maxaln, flen, flen + padlen + flen + 128

    def _sharded_g8(self, padlen: int, flen: int, batch: int, leaf: bool):
        """Grouped kernel under shard_map over the local-device mesh: the
        per-chip program is the same canonical (batch/mesh) grouped kernel,
        inputs/outputs sharded on their leading pair axis, no collectives
        (pairs are independent)."""
        key = (padlen, flen, batch, leaf)
        hit = self._shard_cache.get(key)
        if hit is not None:
            return hit
        import jax
        from jax.sharding import PartitionSpec as P

        from . import talco_pallas_g8
        local, maxaln, off, tot = talco_pallas_g8.get_pallas_kernel_g8(
            padlen, flen, self.p, self.marker, self.matrix_bytes,
            self.msize, batch // self.mesh_size, leaf=leaf,
            interpret=self.interpret, grp=self.grp)
        # check_vma=False: pallas_call outputs carry no vma annotation
        sharded = jax.shard_map(
            lambda *a: local(*a), mesh=self.mesh,
            in_specs=(P("pairs"),) * 11,
            out_specs=(P("pairs"), P("pairs")), check_vma=False)
        out = (jax.jit(sharded), maxaln, off, tot)
        self._shard_cache[key] = out
        return out

    def close(self, timeout: float = 2.0) -> bool:
        """Join collector threads of abandoned launches (a thread blocked in
        np.asarray during interpreter teardown aborts the process). Returns
        False if threads are still alive after the timeout — the caller must
        then hard-exit instead of letting teardown run (cli.main does), so
        a short timeout only trades a clean join for an immediate
        os._exit."""
        deadline = timeout
        for th in self._orphans:
            import time as _t
            t0 = _t.time()
            th.join(timeout=max(deadline, 0.0))
            deadline -= _t.time() - t0
        self._orphans = [t for t in self._orphans if t.is_alive()]
        return not self._orphans

    # align_pairs may pipeline the post phase against this call
    supports_on_final = True

    def __call__(self, prepared, metas, database, option, param,
                 on_final=None) -> List[Optional[np.ndarray]]:
        # reap orphan fetch threads that already finished (non-blocking;
        # joining live ones here would stall the host exactly when it
        # should be stealing work)
        self._orphans = [t for t in self._orphans if t.is_alive()]
        self._stolen_ids: set = set()
        note = on_final or (lambda i, p: None)
        task = database.current_task
        n = len(prepared)
        results: List[Optional[np.ndarray]] = [None] * n

        flen_param = [self.base_flen] * n   # reference ladder state
        xdrop = [int(1000 * -1 * param.gap_extend)] * n
        window = [self.init_window] * n     # static FLEN escalation state

        pending: List[int] = []
        for i, prep in enumerate(prepared):
            lens = prep[4]
            if lens[0] > 0 and lens[1] > 0:
                pending.append(i)
            else:
                note(i, None)  # zero-length side: post handles directly

        # Congestion/sick gates: (a) until the warm-up launch completes,
        # the canonical program may still be compiling server-side — run
        # host-only rather than stall a level behind a 60-90 s compile;
        # (b) when earlier abandoned launches are still in flight, new
        # launches would queue behind them and lose the race too; (c) when
        # the device under-contributed on recent levels (cold compile or
        # tunnel congestion), back off exponentially — concurrent device
        # threads also steal host CPU (they poll during transfers), so a
        # losing device makes the host path slower than running it alone.
        wt = getattr(self, "_warm_thread", None)
        gated = (wt is not None and wt.is_alive()) \
            or len(self._orphans) > 2
        if not gated and getattr(self, "_sick_backoff", 0) > 0:
            self._sick_backoff -= 1
            gated = True
        if gated:
            if os.environ.get("TWILIGHT_PROFILE"):
                print(f"    [dev] gate: {len(self._orphans)} in-flight "
                      f"orphans, backoff={getattr(self, '_sick_backoff', 0)}"
                      "; host-only level", file=sys.stderr)
            from ..pipeline.aligner import host_pool_size
            idxs = [i for i in range(n)
                    if prepared[i][4][0] > 0 and prepared[i][4][1] > 0]
            out: List[Optional[np.ndarray]] = [None] * n
            pool = min(host_pool_size(self.option), max(1, len(idxs)))
            if pool > 1:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=pool) as ex:
                    for i, r in zip(idxs, ex.map(
                            lambda i: self._host_align(
                                prepared[i], metas[i], task), idxs)):
                        out[i] = r
                        note(i, r)
            else:
                for i in idxs:
                    out[i] = self._host_align(prepared[i], metas[i], task)
                    note(i, out[i])
            done = set(idxs)
            for i in range(n):
                if i not in done:
                    note(i, None)
            return out

        max_rounds = 30
        rounds = 0
        while pending and rounds < max_rounds:
            rounds += 1
            buckets: Dict[Tuple[int, int], List[int]] = {}
            for i in pending:
                lens = prepared[i][4]
                # canonical padded lengths: every run compiles the same one
                # or two programs, maximizing device-side compile-cache
                # reuse across levels, runs and datasets
                m = max(lens)
                if m <= 2048:
                    padlen = 2048
                elif m <= 32768:
                    padlen = 32768
                else:
                    padlen = _next_pow2(m)
                w = window[i]
                if min(flen_param[i], min(lens)) > self.max_window \
                        and window[i] > self.max_window:
                    results[i] = None
                    note(i, None)
                    continue
                window[i] = w
                # leaf pairs (two raw sequences, no gappy compaction, no
                # ladder state) use the int-code kernel: one i32 row per
                # side instead of P8 f32 rows -> ~8x less transfer. Only
                # the grouped kernel consumes int8 code rows, so the
                # predicate must mirror _kernel's g8 gate — otherwise
                # (e.g. TWILIGHT_NO_G8, or a --pair-batch not divisible
                # by 8) every leaf launch would fail and silently fall
                # back to host.
                lf_batch = self._bucket_batch(padlen) * \
                    (self.mesh_size if self.mesh is not None else 1)
                g8_ok = (lf_batch % self.grp == 0
                         and not os.environ.get("TWILIGHT_NO_G8"))
                leaf = (g8_ok
                        and w == self.init_window
                        and padlen <= 2048
                        and flen_param[i] == self.base_flen
                        and task == 0
                        and metas[i][2] == 1 and metas[i][3] == 1
                        and not prepared[i][3][0] and not prepared[i][3][1])
                buckets.setdefault((padlen, w, leaf), []).append(i)
            pending = []

            # phase 1: build + pack on the main thread, then hand each
            # launch to its own thread for dispatch AND materialization —
            # on the tunneled backend, even dispatch can block behind slow
            # device work, and np.asarray blocks until results arrive (its
            # is_ready() resolves prematurely, so polling is useless). Both
            # release the GIL, so the main thread steals host work the
            # whole time.
            import queue
            import threading
            import time as _t
            launches = []
            resq: "queue.Queue" = queue.Queue()
            threads = []

            def _run(li, kern, args):
                try:
                    with self._jax.default_device(self.device):
                        args = self._to_device(args)
                        res = kern(*args)
                    # overlap the D2H copies: each np.asarray alone is a
                    # full tunnel round trip (~25-33 ms measured); issuing
                    # both async first collapses them into one (64.7 ->
                    # 37.8 ms/launch, 2026-08-20)
                    try:
                        for r in res:
                            r.copy_to_host_async()
                    except Exception:
                        pass
                    if len(res) > 1:   # grouped kernel: (paths, tail)
                        resq.put((li, (np.asarray(res[0]),
                                       np.asarray(res[1]))))
                    else:              # v1 kernel: embedded tail
                        resq.put((li, np.asarray(res[0])))
                except Exception as exc:  # surface in main thread
                    resq.put((li, exc))

            for (padlen, w, leaf), idxs in buckets.items():
                # one batch shape per bucket → one compilation; escalated
                # (wide-window) buckets run the grouped hbm_tb kernel (or
                # the single-pair kernel past its FLEN limit) at a fixed
                # batch of 32: VMEM per program is batch-independent (the
                # batch is the sequential grid), partial chunks pad with
                # length-1 dummy pairs whose DP exits immediately, and one
                # fixed shape per (padlen, w) keeps the server compile
                # cache warm. On a multi-chip mesh the canonical buckets
                # grow to pair_batch per chip and shard over it.
                if os.environ.get("TWILIGHT_PROFILE") \
                        and w > self.init_window:
                    print(f"    [dev] escalated bucket: padlen={padlen} "
                          f"window={w} pairs={len(idxs)}", file=sys.stderr)
                nm = self.mesh_size if (self.mesh is not None
                                        and w <= self.init_window) else 1
                bs = self._bucket_batch(padlen) * nm \
                    if w <= self.init_window else max(32, self.grp)
                # sort by size so the grouped kernel's 8-pair programs hold
                # similar pairs (the shared band window is their union)
                idxs.sort(key=lambda i: -(prepared[i][4][0]
                                          + prepared[i][4][1]))
                for lo in range(0, len(idxs), bs):
                    chunk = idxs[lo:lo + bs]
                    if nm > 1:
                        # stripe sizes across mesh shards (shard d owns
                        # slots [d*local, (d+1)*local)): balances per-chip
                        # work, keeps each 8-group's sizes similar
                        chunk = [c for d in range(nm) for c in chunk[d::nm]]
                    batch = bs
                    t0 = _t.time()
                    kern, maxaln, off, tot = self._kernel(padlen, w, batch,
                                                          leaf)
                    t1 = _t.time()
                    args = self._pack_batch(chunk, prepared, metas, task,
                                            padlen, w, batch,
                                            flen_param, xdrop, off, tot,
                                            leaf)
                    li = len(launches)
                    launches.append((chunk, None, maxaln, padlen, w, batch,
                                     t1 - t0, _t.time() - t1, 0.0))
                    th = threading.Thread(target=_run, args=(li, kern, args))
                    th.start()
                    threads.append(th)

            # phase 2: steal pairs onto the native host kernel while device
            # results are in flight. Both paths produce bit-identical
            # alignments, so whichever finishes first wins; a launch whose
            # pairs were all stolen is abandoned. Steal from the tail:
            # those results arrive last. On multi-core hosts extra stealer
            # threads drain the stack concurrently (reference: TBB over the
            # pair batch, alignment-cpu.cpp:46) — the native kernel releases
            # the GIL, so they truly run in parallel. A pair enters
            # host_done at CLAIM time; its result may land a moment later,
            # which is safe because both paths produce the same bits and
            # stealers are joined before results are read.
            from ..pipeline.aligner import host_pool_size
            host_done: set = set()
            # TWILIGHT_NO_STEAL pins every pair to the device path (used by
            # the multi-chip dryrun to certify the sharded kernel, and for
            # clean device-side profiling)
            steal_stack = [] if os.environ.get("TWILIGHT_NO_STEAL") \
                else [i for (chunk, *_) in launches for i in chunk]
            steal_lock = threading.Lock()

            def _claim():
                with steal_lock:
                    while steal_stack:
                        cand = steal_stack.pop()
                        if cand not in host_done:
                            host_done.add(cand)
                            return cand
                return None

            def _steal_one(i):
                results[i] = self._host_align(prepared[i], metas[i], task)
                self._stolen_ids.add(i)
                note(i, results[i])

            def _stealer():
                while True:
                    i = _claim()
                    if i is None:
                        return
                    _steal_one(i)

            stealers = []
            for _ in range(min(host_pool_size(self.option) - 1,
                               len(steal_stack))):
                th = threading.Thread(target=_stealer)
                th.start()
                stealers.append(th)

            collected: set = set()
            blocked_s = 0.0
            try:
                while len(collected) < len(launches):
                    try:
                        li, arr = resq.get_nowait()
                    except queue.Empty:
                        i = _claim()
                        if i is not None:
                            _steal_one(i)
                            continue
                        # nothing left to steal; block only if some
                        # uncollected launch still has un-stolen pairs
                        # (stealers may claim the rest meanwhile, hence the
                        # bounded wait)
                        if all(all(p in host_done for p in launches[lj][0])
                               for lj in range(len(launches))
                               if lj not in collected):
                            break
                        tb0 = _t.time()
                        try:
                            li, arr = resq.get(timeout=0.2)
                        except queue.Empty:
                            blocked_s += _t.time() - tb0
                            continue
                        blocked_s += _t.time() - tb0
                    collected.add(li)
                    if isinstance(arr, Exception):
                        # transient device/tunnel failure: run the launch's
                        # un-stolen pairs on the host kernel instead of
                        # aborting the level (both paths produce the same
                        # bits), and back off the device next level
                        print(f"    [dev] launch failed ({arr!r}); "
                              "falling back to host for its pairs",
                              file=sys.stderr)
                        for p in launches[li][0]:
                            with steal_lock:
                                if p in host_done:
                                    continue
                                host_done.add(p)
                            _steal_one(p)
                        continue
                    if all(p in host_done for p in launches[li][0]):
                        continue  # fully stolen; device result redundant
                    self._collect(launches[li], arr, results, prepared,
                                  metas, task, host_done, pending, window,
                                  flen_param, xdrop, note)
            finally:
                # always join stealers and track fetch threads: a raise
                # path that skipped this could leave threads blocked in
                # np.asarray at interpreter teardown (SIGABRT)
                for th in stealers:
                    th.join()
                self._orphans.extend(threads)
            if os.environ.get("TWILIGHT_PROFILE") and blocked_s > 1.0:
                print(f"    [dev] blocked {blocked_s:.1f}s on launches",
                      file=sys.stderr)
        for i in pending:
            results[i] = None
            note(i, None)
        dev_won = sum(1 for r in results if r is not None) \
            - len(self._stolen_ids)
        # throughput gate: when the device contributes under a third of
        # the level's resolved pairs (cold compiles, congested tunnel, or
        # simply a host kernel that is currently faster), back off
        # exponentially and run host-only; the backoff decay retries the
        # device periodically in case the weather improves
        resolved = dev_won + len(self._stolen_ids)
        if resolved > 0 and dev_won * 3 < resolved:
            self._zero_streak = getattr(self, "_zero_streak", 0) + 1
            self._sick_backoff = min(2 ** self._zero_streak, 16)
        else:
            self._zero_streak = 0
            self._sick_backoff = 0
        if os.environ.get("TWILIGHT_PROFILE"):
            print(f"    [dev] level done: device={dev_won} "
                  f"host-stolen={len(self._stolen_ids)} "
                  f"steal_dp={getattr(self, '_steal_s', 0.0):.2f}s "
                  f"backoff={self._sick_backoff}",
                  file=sys.stderr)
            self._steal_s = 0.0
        return results

    def _host_align(self, prep, meta, task):
        """Reference retry ladder on the native host kernel (same result
        bits as the device path; see pipeline/aligner.py)."""
        import time as _t
        t0 = _t.time()
        try:
            return self._host_align_inner(prep, meta, task)
        finally:
            self._steal_s = getattr(self, "_steal_s", 0.0) + _t.time() - t0

    def _host_align_inner(self, prep, meta, task):
        from ..pipeline.aligner import _run_talco_with_retries
        freq_ref, freq_qry, _, _, lens, gap_op, gap_ex = prep
        rnum, qnum = meta[2], meta[3]
        gap_char_zero = (task in (1, 2) or rnum > 10000 or qnum > 10000)
        path, needs_fallback = _run_talco_with_retries(
            freq_ref[:lens[0]], freq_qry[:lens[1]], gap_op, gap_ex,
            (float(rnum), float(qnum)), lens, self.param, gap_char_zero,
            task, self.option)
        return path if not needs_fallback else None

    def _pack_batch_leaf(self, chunk, prepared, metas, padlen, flen,
                         batch, flen_param, xdrop, off, tot):
        """Leaf pairs: ship int32 letter codes (one row per side) instead
        of f32 profiles. Codes come from the consensus bytes, which for a
        one-hot unit-weight leaf profile ARE the raw sequence letters."""
        from ..constants import letter_lut
        lut = letter_lut(self.option.type).astype(np.int32)
        ambig = 4 if self.option.type == "n" else 20
        b = batch
        ref_c = np.full((b, 1, tot), ambig, dtype=np.int8)
        qry_c = np.full((b, 1, tot), ambig, dtype=np.int8)
        ref_len = np.ones(b, dtype=np.int32)
        qry_len = np.ones(b, dtype=np.int32)
        ref_num = np.ones(b, dtype=np.float32)
        qry_num = np.ones(b, dtype=np.float32)
        flen_arr = np.full(b, self.base_flen, dtype=np.int32)
        xdrop_arr = np.full(b, 5000, dtype=np.int32)
        gap_char = np.zeros(b, dtype=np.float32)
        for bi, i in enumerate(chunk):
            _, _, cons, _, lens, _, _ = prepared[i]
            rl, ql = lens
            rc = lut[cons[0][:rl]].astype(np.int8)
            qc = lut[cons[1][:ql]].astype(np.int8)
            ref_c[bi, 0, off + padlen - rl:off + padlen] = rc[::-1]
            qry_c[bi, 0, off:off + ql] = qc
            ref_len[bi] = rl
            qry_len[bi] = ql
            flen_arr[bi] = flen_param[i]
            xdrop_arr[bi] = xdrop[i]
            gap_char[bi] = np.float32(self.param.gap_extend)
        go = np.full(b, self.param.gap_open, dtype=np.float32)
        ge = np.full(b, self.param.gap_extend, dtype=np.float32)
        return (ref_len, qry_len, ref_num, qry_num, flen_arr, xdrop_arr,
                gap_char, go, ge, ref_c, qry_c)

    def _collect(self, launch, out, results, prepared, metas, task,
                 host_done, pending, window, flen_param, xdrop,
                 note=lambda i, p: None):
        """Postprocess one launch's materialized output rows (skipping
        host-stolen pairs): success, window escalation (error 6), or the
        reference retry ladder (errors 1/2)."""
        (chunk, _, maxaln, padlen, w, batch,
         t_build, t_pack, t_disp) = launch
        if os.environ.get("TWILIGHT_PROFILE"):
            print(f"    [dev] bucket p{padlen} w{w} b{batch} "
                  f"n{len(chunk)}: build={t_build:.2f}s "
                  f"pack={t_pack:.2f}s disp={t_disp:.2f}s",
                  file=sys.stderr)
        for bi, i in enumerate(chunk):
            if i in host_done:
                continue
            if isinstance(out, tuple):     # grouped kernel: (paths, tail)
                row = out[0][bi]
                ln = int(out[1][bi, 0])
                e = int(out[1][bi, 1])
            else:                          # v1 kernel: embedded tail
                row = out[bi] if out.ndim == 2 else out[bi, 0]
                ln = int(row[maxaln - 128])
                e = int(row[maxaln - 127])
            if e == 0:
                results[i] = row[:ln].astype(np.int8)
                note(i, results[i])
            elif e == 6:
                if window[i] >= self.max_window:
                    results[i] = None
                    note(i, None)
                else:
                    # escalation step for the static window. Default x4
                    # (512 -> 2048) reaches any band in one relaunch;
                    # TWILIGHT_ESCALATE_FACTOR=2 adds a 1024 rung —
                    # tighter lane occupancy on the escalated kernel
                    # (judge-measured 0.144 at FLEN 2048) at the cost of
                    # an extra relaunch round for the widest pairs.
                    # Bit-exact either way (every route is bit-identical).
                    window[i] = window[i] * max(2, int(os.environ.get(
                        "TWILIGHT_ESCALATE_FACTOR", 4)))
                    pending.append(i)
            elif task == 0 or e in (3, 4):
                results[i] = None
                note(i, None)
            else:
                lens = prepared[i][4]
                if e == 2:
                    flen_param[i] = min(
                        int(flen_param[i] * 1.2) << 1, min(lens))
                elif e == 1:
                    xdrop[i] = int(xdrop[i] * 2)
                    flen_param[i] = min(
                        int(xdrop[i] * 4) << 1, min(lens))
                # ladder growth may need a wider window too
                pending.append(i)

    def _pack_batch(self, chunk, prepared, metas, task, padlen, flen, batch,
                    flen_param, xdrop, off=None, tot=None, leaf=False):
        from . import talco_pallas
        if off is None:
            off = flen
        if tot is None:
            tot = flen + padlen + flen + 128
        b = batch
        if leaf:
            return self._pack_batch_leaf(chunk, prepared, metas, padlen,
                                         flen, batch, flen_param, xdrop,
                                         off, tot)
        ref_rev = np.zeros((b, self.p8, tot), dtype=np.float32)
        qry = np.zeros((b, self.p8, tot), dtype=np.float32)
        ref_len = np.ones(b, dtype=np.int32)
        qry_len = np.ones(b, dtype=np.int32)
        ref_num = np.ones(b, dtype=np.float32)
        qry_num = np.ones(b, dtype=np.float32)
        flen_arr = np.full(b, self.base_flen, dtype=np.int32)
        xdrop_arr = np.full(b, 5000, dtype=np.int32)
        gap_char = np.zeros(b, dtype=np.float32)
        for bi, i in enumerate(chunk):
            freq_ref, freq_qry, _, _, lens, gap_op, gap_ex = prepared[i]
            rnum, qnum = metas[i][2], metas[i][3]
            talco_pallas.pack_pair_into(
                ref_rev[bi], qry[bi],
                freq_ref[:lens[0]], freq_qry[:lens[1]], gap_op, gap_ex,
                padlen, off)
            ref_len[bi] = lens[0]
            qry_len[bi] = lens[1]
            ref_num[bi] = np.float32(rnum)
            qry_num[bi] = np.float32(qnum)
            flen_arr[bi] = flen_param[i]
            xdrop_arr[bi] = xdrop[i]
            zero_gc = (task in (1, 2) or rnum > 10000 or qnum > 10000)
            gap_char[bi] = np.float32(0.0 if zero_gc
                                      else self.param.gap_extend)
        go = np.full(b, self.param.gap_open, dtype=np.float32)
        ge = np.full(b, self.param.gap_extend, dtype=np.float32)
        return (ref_len, qry_len, ref_num, qry_num, flen_arr, xdrop_arr,
                gap_char, go, ge, ref_rev, qry)


_persist_cache: Dict[tuple, "DeviceTalco"] = {}


class LazyDeviceKernel:
    """Non-blocking device-kernel handle for `--backend auto`.

    DeviceTalco construction blocks in backend discovery (up to
    TWILIGHT_DEVICE_INIT_TIMEOUT against a dead tunnel) and schedules
    warm-up compiles — paid BEFORE the first pair aligns when built
    inline. This wrapper builds it in a background thread instead:
    align_pairs treats the kernel as absent while it is still building
    (early leaf levels run on the AVX2 host kernel, which is the right
    engine for them anyway), then starts dispatching to the device the
    level after construction finishes. A failed build downgrades the run
    to host-only exactly like make_device_kernel raising under auto.
    Both engines are bit-identical, so WHERE each level runs never
    changes output bytes."""

    def __init__(self, option: Options, param: Params):
        import sys as _sys
        self._inner = None
        self._err = None

        def _build():
            try:
                inner = DeviceTalco(option, param)
            except BaseException as e:  # incl. SystemExit from selection
                self._err = e
                print(f"[twilight-tpu] device kernel unavailable ({e}); "
                      "using host kernels", file=_sys.stderr)
                return
            self._inner = inner

        self._th = threading.Thread(target=_build, daemon=True)
        self._th.start()

    def poll_ready(self) -> bool:
        """True once the underlying batcher exists; False while building
        or after a failed build (align_pairs then skips the device)."""
        return self._inner is not None

    def __call__(self, *a, **k):
        return self._inner(*a, **k)

    def __getattr__(self, name):
        inner = object.__getattribute__(self, "_inner")
        if inner is None:
            raise AttributeError(name)
        return getattr(inner, name)

    def close(self, timeout: float = 2.0) -> bool:
        self._th.join(0.2)
        inner = self._inner
        if inner is not None:
            return inner.close(timeout)
        # builder still blocked in discovery: caller must hard-exit
        # rather than let teardown join a wedged PJRT thread
        return not self._th.is_alive()


def make_device_kernel(option: Options, param: Params):
    if option.device_backend == "numpy":
        return None
    if (option.device_backend == "auto"
            and option.device_num is None and option.device_index is None
            and not os.environ.get("TWILIGHT_FORCE_DEVICE")
            and not os.environ.get("TWILIGHT_KERNEL_PERSIST")
            and not os.environ.get("TWILIGHT_NO_LAZY")):
        # auto = opportunistic: never let device init delay the host
        # pipeline. Explicit backends/selections keep the blocking build
        # (their errors must surface with the reference's exit semantics);
        # the workflow's persistent cache also stays synchronous.
        return LazyDeviceKernel(option, param)
    if os.environ.get("TWILIGHT_KERNEL_PERSIST"):
        # workflow mode: cli.main runs several times in one process
        # (iterative/placement iterations) — reuse the DeviceTalco so the
        # warm-up, compiled programs and backoff state carry across
        # iterations instead of paying a fresh 60-90 s server compile and
        # an abandoned-thread close() per run
        key = (option.device_backend, option.type, option.pair_batch,
               param.scoring_matrix.tobytes(),
               float(param.gap_open), float(param.gap_extend))
        kern = _persist_cache.get(key)
        if kern is not None:
            kern.option = option
            kern.param = param
            return kern
        kern = DeviceTalco(option, param)
        kern.persistent = True
        _persist_cache[key] = kern
        return kern
    return DeviceTalco(option, param)


def close_persistent(timeout: float = 2.0) -> bool:
    """Join all cached kernels' collector threads (workflow teardown).
    Returns False if any thread is still blocked (caller should os._exit
    after flushing, like cli.main does for its own kernel)."""
    clean = True
    for kern in _persist_cache.values():
        clean = kern.close(timeout) and clean
    _persist_cache.clear()
    return clean
