"""RTT-free Pallas while-loop cost probes (round 5).

The tunnel adds a ~20-30 ms launch floor AND multi-minute weather
phases, so naive kernel micro-benchmarks measure the tunnel, not the
chip. Two defenses, both REQUIRED:
  - trips-delta: run the same program at N and 10N loop trips; the
    difference isolates per-iteration cost from the launch floor;
  - same-phase pairing: alternate the two programs' timed launches
    (like bench_kernel --compare) or re-run the whole probe twice some
    minutes apart — a single bad phase during one program's samples
    fabricates huge deltas (this bit us: a 30-op body first measured
    3825 ns/step, then 166 ns/step — the former was weather).

Measured floors on the v5e (good phase, 2026-08-20):
  - loop carcass (8 carried (8,640) rows + 20 scalar cols): 15-40 ns/step
  - + 3 rolls of carried rows: +138 ns; 64-row scratch roll: +219 ns
  - reductions / selects / tb stores / pl.when regions: ~0 each
  - a 30-op DP-like body (8 rows, 2 rolls, 1 reduction):
      carried rows 137 ns/step, scratch rows 166 ns/step
Production kernel: ~4400 ns/diagonal with a ~250-op body — i.e. the
cost scales with the dependent op volume at ~15-20 cycles/op average,
NOT with any one construct; the probes bound the restructuring headroom
at ~15-30x. See BASELINE.md §Kernel bottleneck.

Usage: python tools/probe_loop_costs.py [carcass|elements|body]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRP, W = 8, 640


def _time(fn):
    np.asarray(fn())
    best = float("inf")
    for _ in range(6):
        t0 = time.time()
        np.asarray(fn())
        best = min(best, time.time() - t0)
    return best


def _delta(build):
    t1 = _time(build(4000))
    t10 = _time(build(40000))
    return 1e9 * (t10 - t1) / 36000


def carcass(n_rows=8, n_cols=20, bodies=2):
    def build(trips):
        def kernel(out_ref):
            rows = {f"r{i}": jnp.full((GRP, W), float(i), jnp.float32)
                    for i in range(n_rows)}
            cols = {f"c{i}": jnp.full((GRP, 1), i, jnp.int32)
                    for i in range(n_cols)}
            st = dict(k=jnp.int32(0), **rows, **cols)

            def body(s):
                out = dict(s)
                out["k"] = s["k"] + 1
                for i in range(n_rows):
                    out[f"r{i}"] = s[f"r{i}"] + jnp.float32(1.0)
                for i in range(n_cols):
                    out[f"c{i}"] = s[f"c{i}"] + 1
                return out

            def many(s):
                for _ in range(bodies):
                    s = body(s)
                return s
            st = lax.while_loop(lambda s: s["k"] < trips, many, st)
            acc = jnp.zeros((GRP, W), jnp.float32)
            for i in range(n_rows):
                acc = acc + st[f"r{i}"]
            if n_cols:
                acc = acc + st["c0"].astype(jnp.float32)
            out_ref[...] = acc
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((GRP, W),
                                                   jnp.float32)))
    print(f"carcass rows={n_rows} cols={n_cols}: "
          f"{_delta(build):.1f} ns/step")


def body(variant="carried"):
    """30-op DP-like body; rows carried in loop state or in VMEM
    scratch."""
    def build(trips):
        def kernel(out_ref, rows_ref):
            def math(r, msp):
                sim = r[0] * 1.1 + r[1] * 0.9 + r[2] * 1.2 \
                    + r[3] * 0.8 + r[4] * 1.3 + r[5] * 0.7
                diag = pltpu.roll(r[0], 1, 1) + sim
                up = r[1] + jnp.float32(-5.0)
                left = pltpu.roll(r[2], 1, 1) + jnp.float32(-3.0)
                m2 = jnp.maximum(jnp.maximum(diag, up), left)
                i_v = jnp.where(left > up, left, up) + sim * 0.1
                d_v = jnp.where(up > diag, up, diag) + sim * 0.2
                s_v = jnp.maximum(m2, jnp.maximum(i_v, d_v))
                c1 = jnp.where(s_v > 0, r[3], r[4])
                c2 = jnp.where(i_v > 0, r[5], r[6])
                c3 = jnp.where(d_v > 0, r[6], r[7])
                mx = jnp.max(s_v, axis=1, keepdims=True)
                return [s_v, i_v, d_v, c1, c2, c3, sim + s_v * 0.01,
                        diag + i_v * 0.01], jnp.maximum(msp, mx)

            if variant == "carried":
                rows = {f"r{i}": jnp.full((GRP, W), float(i) + 1.0,
                                          jnp.float32) for i in range(8)}
                st = dict(k=jnp.int32(0),
                          msp=jnp.full((GRP, 1), -1e3, jnp.float32),
                          **rows)

                def b(s):
                    new, msp = math([s[f"r{i}"] for i in range(8)],
                                    s["msp"])
                    return dict(k=s["k"] + 1, msp=msp,
                                **{f"r{i}": new[i] for i in range(8)})
                st = lax.while_loop(lambda s: s["k"] < trips,
                                    lambda s: b(b(s)), st)
                out_ref[...] = st["r0"] + st["msp"]
            else:
                st = dict(k=jnp.int32(0),
                          msp=jnp.full((GRP, 1), -1e3, jnp.float32))

                def b(s):
                    r = [rows_ref[pl.ds(i * GRP, GRP), :]
                         for i in range(8)]
                    new, msp = math(r, s["msp"])
                    for i in range(8):
                        rows_ref[pl.ds(i * GRP, GRP), :] = new[i]
                    return dict(k=s["k"] + 1, msp=msp)
                st = lax.while_loop(lambda s: s["k"] < trips,
                                    lambda s: b(b(s)), st)
                out_ref[...] = rows_ref[pl.ds(0, GRP), :] + st["msp"]
        return jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((GRP, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8 * GRP, W), jnp.float32)]))
    print(f"body/{variant}: {_delta(build):.1f} ns/step")


def scalar0d(variant="body"):
    """The construct every earlier synthetic MISSED: vector->SCALAR
    (0-d) reductions inside the loop. The production k_body does ~5-7
    of them per while iteration (jnp.any(run) in k_cond; lmin/umax/
    jnp.any(act)/overflow feeding the carried scalar `org`), while all
    earlier probes carried only (GRP, 1) columns and used a pure-scalar
    trip condition. If a 0-d reduction forces a VPU->scalar-core sync,
    each costs ~us and this IS the dark matter.

    variants: cond  — while condition is jnp.any over a carried col
              body  — 3 0-d reductions feed a carried scalar like org
              both  — production shape (cond + body reductions)
    """
    def build(trips):
        def kernel(out_ref):
            lane_w = lax.broadcasted_iota(jnp.int32, (GRP, W), 1)

            def math(r, msp):
                sim = r[0] * 1.1 + r[1] * 0.9 + r[2] * 1.2 \
                    + r[3] * 0.8 + r[4] * 1.3 + r[5] * 0.7
                diag = pltpu.roll(r[0], 1, 1) + sim
                up = r[1] + jnp.float32(-5.0)
                left = pltpu.roll(r[2], 1, 1) + jnp.float32(-3.0)
                m2 = jnp.maximum(jnp.maximum(diag, up), left)
                i_v = jnp.where(left > up, left, up) + sim * 0.1
                d_v = jnp.where(up > diag, up, diag) + sim * 0.2
                s_v = jnp.maximum(m2, jnp.maximum(i_v, d_v))
                c1 = jnp.where(s_v > 0, r[3], r[4])
                c2 = jnp.where(i_v > 0, r[5], r[6])
                c3 = jnp.where(d_v > 0, r[6], r[7])
                mx = jnp.max(s_v, axis=1, keepdims=True)
                return [s_v, i_v, d_v, c1, c2, c3, sim + s_v * 0.01,
                        diag + i_v * 0.01], jnp.maximum(msp, mx)

            rows = {f"r{i}": jnp.full((GRP, W), float(i) + 1.0,
                                      jnp.float32) for i in range(8)}
            st = dict(k=jnp.int32(0), org=jnp.int32(0),
                      run=jnp.ones((GRP, 1), jnp.int32),
                      cnt=jnp.zeros((GRP, 1), jnp.int32),
                      msp=jnp.full((GRP, 1), -1e3, jnp.float32), **rows)

            def b(s):
                org = s["org"]
                # org feeds lane math (like i_arr) so it cannot be DCE'd
                x_rel = lane_w - org % W
                bias = jnp.where(x_rel < 0, jnp.float32(0.0),
                                 jnp.float32(1e-30))
                new, msp = math([s[f"r{i}"] + bias if i == 0
                                 else s[f"r{i}"] for i in range(8)],
                                s["msp"])
                out = dict(k=s["k"] + 1, msp=msp, org=org, run=s["run"],
                           cnt=s["cnt"] + 1,
                           **{f"r{i}": new[i] for i in range(8)})
                if variant in ("body", "both"):
                    alive = msp > jnp.float32(-2e3)          # data-dep
                    nl = jnp.where(alive, (msp
                                           .astype(jnp.int32) & 0x7) + 1,
                                   jnp.int32(2 ** 30))
                    nu = jnp.where(alive, (msp
                                           .astype(jnp.int32) & 0x3),
                                   jnp.int32(0))
                    lmin = jnp.min(nl)                       # 0-d
                    umax = jnp.max(nu)                       # 0-d
                    anyv = jnp.any(alive)                    # 0-d
                    org_n = jnp.where(anyv,
                                      jnp.maximum(org,
                                                  jnp.minimum(lmin,
                                                              umax)),
                                      org)
                    out["org"] = jnp.minimum(org_n, jnp.int32(7))
                # run derives from a carried VECTOR counter, so the
                # cond's jnp.any cannot fold AND the loop reliably runs
                # `trips` steps (an msp-derived gate exited early once
                # the f32 rows overflowed — burned us: cond/both first
                # measured 17/-49 ns/step, both trip counts exiting at
                # the same overflow point)
                out["run"] = (s["cnt"] + 1 < trips).astype(jnp.int32)
                return out

            if variant in ("cond", "both"):
                def cond(s):
                    return jnp.any(s["run"] != 0) & (s["k"] < trips)
            else:
                def cond(s):
                    return s["k"] < trips
            st = lax.while_loop(cond, lambda s: b(b(s)), st)
            out_ref[...] = st["r0"] + st["msp"] \
                + st["org"].astype(jnp.float32)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((GRP, W),
                                                   jnp.float32)))
    print(f"scalar0d/{variant}: {_delta(build):.1f} ns/step")


def deadcode():
    """Program-scope suspect: the DP while loop coexisting with the
    (rarely/never-executed at measurement time) traceback walk + merge
    sections in one Mosaic program. The walk loop here runs ZERO
    iterations and the merge pl.when never fires — any slowdown vs
    body/carried is allocation/scheduling scope, not execution."""
    def build(trips):
        def kernel(out_ref, tbs_ref):
            ln128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)

            def math(r, msp):
                sim = r[0] * 1.1 + r[1] * 0.9 + r[2] * 1.2 \
                    + r[3] * 0.8 + r[4] * 1.3 + r[5] * 0.7
                diag = pltpu.roll(r[0], 1, 1) + sim
                up = r[1] + jnp.float32(-5.0)
                left = pltpu.roll(r[2], 1, 1) + jnp.float32(-3.0)
                m2 = jnp.maximum(jnp.maximum(diag, up), left)
                i_v = jnp.where(left > up, left, up) + sim * 0.1
                d_v = jnp.where(up > diag, up, diag) + sim * 0.2
                s_v = jnp.maximum(m2, jnp.maximum(i_v, d_v))
                c1 = jnp.where(s_v > 0, r[3], r[4])
                c2 = jnp.where(i_v > 0, r[5], r[6])
                c3 = jnp.where(d_v > 0, r[6], r[7])
                mx = jnp.max(s_v, axis=1, keepdims=True)
                return [s_v, i_v, d_v, c1, c2, c3, sim + s_v * 0.01,
                        diag + i_v * 0.01], jnp.maximum(msp, mx)

            rows = {f"r{i}": jnp.full((GRP, W), float(i) + 1.0,
                                      jnp.float32) for i in range(8)}
            st = dict(k=jnp.int32(0),
                      msp=jnp.full((GRP, 1), -1e3, jnp.float32), **rows)

            def b(s):
                new, msp = math([s[f"r{i}"] for i in range(8)], s["msp"])
                return dict(k=s["k"] + 1, msp=msp,
                            **{f"r{i}": new[i] for i in range(8)})
            st = lax.while_loop(lambda s: s["k"] < trips,
                                lambda s: b(b(s)), st)

            # --- dead walk: 8 per-pair scalar while loops, 0 iterations
            mspi = jnp.max(st["msp"]).astype(jnp.int32)
            done = jnp.minimum(mspi, jnp.int32(-1))     # < 0 at runtime
            emit = jnp.int32(0)
            for g in range(8):
                def wstep(s):
                    ftr, idx, n = s
                    blk = tbs_ref[g:g + 1, pl.ds(
                        pl.multiple_of((jnp.clip(idx, 0, 2 ** 20)
                                        // 128) * 128, 128), 128)]
                    v = jnp.sum(jnp.where(
                        ln128 == idx % 128, blk.astype(jnp.int32), 0))
                    return (ftr - 1 - (v & 1), idx - (v & 2) // 2,
                            n + 1)

                res = lax.while_loop(lambda s: s[0] >= 0, wstep,
                                     (done, jnp.int32(5), jnp.int32(0)))
                emit = emit + res[2]

            # --- dead merge: chunked fori_loop under a never-true when
            @pl.when(emit > jnp.int32(10 ** 9))
            def _():
                def chunk(c, _):
                    c0 = jnp.minimum(c * 128, 2048 - 128)
                    c0 = pl.multiple_of((c0 // 128) * 128, 128)
                    old = tbs_ref[0:1, pl.ds(c0, 128)]
                    tbs_ref[0:1, pl.ds(c0, 128)] = \
                        jnp.where(ln128 < emit, jnp.int8(1), old)
                    return 0
                lax.fori_loop(0, 8, chunk, 0)

            out_ref[...] = st["r0"] + st["msp"] \
                + emit.astype(jnp.float32)
        return jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((GRP, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((GRP, 2048), jnp.int8)]))
    print(f"deadcode: {_delta(build):.1f} ns/step")


def nested(with_walk=False):
    """The ONE structural element no synthetic had: the DP while loop
    NESTED inside an outer (tile) while loop whose carried state feeds
    the inner loop's init. The production kernel's k-loop lives inside
    run_tile's t-loop; if Mosaic allocates/spills nested-loop state
    differently, this reproduces the cliff. Outer runs 2 trips.
    with_walk adds dead sibling walk loops in the same outer scope
    (register-allocation competition test)."""
    def build(trips):
        def kernel(out_ref):
            def math(r, msp):
                sim = r[0] * 1.1 + r[1] * 0.9 + r[2] * 1.2 \
                    + r[3] * 0.8 + r[4] * 1.3 + r[5] * 0.7
                diag = pltpu.roll(r[0], 1, 1) + sim
                up = r[1] + jnp.float32(-5.0)
                left = pltpu.roll(r[2], 1, 1) + jnp.float32(-3.0)
                m2 = jnp.maximum(jnp.maximum(diag, up), left)
                i_v = jnp.where(left > up, left, up) + sim * 0.1
                d_v = jnp.where(up > diag, up, diag) + sim * 0.2
                s_v = jnp.maximum(m2, jnp.maximum(i_v, d_v))
                c1 = jnp.where(s_v > 0, r[3], r[4])
                c2 = jnp.where(i_v > 0, r[5], r[6])
                c3 = jnp.where(d_v > 0, r[6], r[7])
                mx = jnp.max(s_v, axis=1, keepdims=True)
                return [s_v, i_v, d_v, c1, c2, c3, sim + s_v * 0.01,
                        diag + i_v * 0.01], jnp.maximum(msp, mx)

            def tile_body(tc):
                t, acc = tc
                rows = {f"r{i}": acc * jnp.float32(0.001)
                        + jnp.float32(i + 1.0) for i in range(8)}
                st = dict(k=jnp.int32(0),
                          msp=jnp.full((GRP, 1), -1e3, jnp.float32),
                          **rows)

                def b(s):
                    new, msp = math([s[f"r{i}"] for i in range(8)],
                                    s["msp"])
                    return dict(k=s["k"] + 1, msp=msp,
                                **{f"r{i}": new[i] for i in range(8)})
                st = lax.while_loop(lambda s: s["k"] < trips,
                                    lambda s: b(b(s)), st)
                emit = jnp.int32(0)
                if with_walk:
                    # dead per-pair scalar walks INSIDE the same outer
                    # scope as the DP loop (production layout)
                    ln128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                    mspi = jnp.max(st["msp"]).astype(jnp.int32)
                    done = jnp.minimum(mspi, jnp.int32(-1))
                    for g in range(8):
                        def wstep(s):
                            ftr, idx, n = s
                            v = jnp.sum(jnp.where(
                                ln128 == idx % 128,
                                jnp.int32(1), 0))
                            return (ftr - 1 - (v & 1), idx - 1, n + 1)
                        res = lax.while_loop(lambda s: s[0] >= 0, wstep,
                                             (done, jnp.int32(5),
                                              jnp.int32(0)))
                        emit = emit + res[2]
                return (t + 1, st["r0"] + st["msp"]
                        + emit.astype(jnp.float32))

            tc = lax.while_loop(lambda tc: tc[0] < 2, tile_body,
                                (jnp.int32(0),
                                 jnp.zeros((GRP, W), jnp.float32)))
            out_ref[...] = tc[1]
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((GRP, W),
                                                   jnp.float32)))
    # outer runs 2x -> report per inner step (2 * 2 * trips bodies)
    t1 = _time(build(4000))
    t10 = _time(build(40000))
    tag = "+walk" if with_walk else ""
    print(f"nested(2 tiles){tag}: "
          f"{1e9 * (t10 - t1) / 72000:.1f} ns/step")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("carcass", "all"):
        carcass()
    if what in ("body", "all"):
        body("carried")
        body("scratch")
    if what in ("scalar0d", "all"):
        body("carried")          # same-phase baseline
        scalar0d("cond")
        scalar0d("body")
        scalar0d("both")
    if what == "deadcode":
        body("carried")          # same-phase baseline
        deadcode()
    if what == "nested":
        body("carried")          # same-phase baseline
        nested()
        nested(with_walk=True)
