"""TALCO-XDrop Pallas TPU kernel, sublane-grouped: 8 pairs per program.

The v1 kernel (talco_pallas.py) runs one pair per grid program on (1, FLEN)
vectors — 1/8 of the VPU's sublanes. This version packs GRP=8 pairs into the
sublane dimension so every elementwise op, reduction, roll and store runs on
full (8, FLEN) tiles, amortizing the wavefront math 8x.

Key design choice that makes grouping possible: the band lives in
**absolute tile-local query coordinates** (lane x of a circular row of width
W holds cell i with x = i mod W, where i indexes the query within the current
tile) instead of the reference's band-relative layout. In absolute
coordinates the diagonal/up/left reads of previous anti-diagonals are the
SAME lane shift for every pair, so one shared `pltpu.roll` serves all 8
pairs — per-pair dynamic shifts (which would force 8 separate reads per
operand per diagonal) never arise. A shared window origin `org` tracks the
union of the 8 pairs' live bands; if that union outgrows FLEN the whole
group reports error 6 and the host escalates those pairs to the single-pair
kernel. Because traceback rows are stored in the same absolute coordinates,
the reference's flattened-address bookkeeping (ftr_length/ftr_lower_limit,
TALCO-XDrop.cpp:134-231) reduces to direct (row=ftr, lane=i mod W) reads.

Pairs in a group run the shared anti-diagonal loop in lockstep with
per-pair masks: each pair has its own band limits, X-drop state,
convergence markers and error code riding in (GRP, 1) columns; a pair that
converges, errors or exhausts its cells freezes (masked writes) while the
rest continue. Tile advancement is per-pair too (different convergence
points); the group's tile loop runs until every pair is done.

Float semantics are identical to the v1 kernel / NumPy oracle / native C++
kernel (the reference's TALCO_SIMD summation order): outputs are
bit-identical alignment paths. Error codes match v1: 0 ok, 1 band collapse,
2 band exceeded fLen, 3 index error, 4 sentinel convergence, 6 static-
window overflow (here: per-group union-band overflow).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .fastmath import exact_div32
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I_BOUNDARY = -2
D_BOUNDARY = -3
I_BOUNDARY_LOW16 = I_BOUNDARY & 0xFFFF
D_BOUNDARY_LOW16 = D_BOUNDARY & 0xFFFF

GRP = 8  # pairs per program (sublane dimension)
TB_RING = 8   # hbm_tb: diagonals per DP-emit slab (two slabs ping-pong)
TB_STG = 64   # hbm_tb: staged traceback window, in diagonals


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel(PADLEN: int, FLEN: int, P: int, MARKER: int,
                 matrix: np.ndarray, debug_k: int = -1,
                 leaf: bool = False, hbm_in: bool = False, grp: int = GRP,
                 hbm_tb: bool = False, ablate: str = ""):
    # ablate: comma-separated cost-attribution switches for tools/
    # bench_kernel.py --ablate / --compare. Subtractive (nosim, nodiv,
    # noconv, nored, noroll, notb, nowalk, nomerge) disable a cost
    # block — outputs are WRONG and (for the DP blocks) iteration
    # counts change. Additive (twosim, twodiv, twored, tworoll, twotb,
    # twocarry, twowalk) do the block's work TWICE with an opaque-zero
    # poison so XLA cannot CSE the duplicate; all but twotb keep
    # outputs bit-identical, so (two - baseline) in an interleaved A/B
    # run attributes that block's cost with the DP intact. A/B config
    # tokens (quad, oct, tbquad, oldred) select bit-identical
    # alternative formulations. Production callers never set this.
    #
    # probeN (e.g. probe2048): PINNED-TRIPS measurement mode — every
    # pair's DP loop runs exactly N diagonals (data-independent exit;
    # the real abort/stop/reached_end dataflow is preserved through an
    # opaque-false poison so the dependency topology is unchanged),
    # one tile per pair, walk/merge clamped small. This makes the
    # subtractive strip tokens (which otherwise change band dynamics
    # and collapse iteration counts) DIRECTLY comparable: every
    # variant steps the same N diagonals, so paired us/diag deltas
    # attribute exactly the stripped construct. Strip tokens meant for
    # probe mode: noband (live-band min/max reductions), noorg (the
    # shared-origin scalar-reduction block), nomax (per-diagonal msp
    # lane max), nokill (X-drop kill select), nomask (per-pair freeze
    # masking of the carried rotation), nolive (band-masked row
    # merges), noanchor (profile re-anchor never fires).
    ab = frozenset(t for t in ablate.split(",") if t)
    probe_n = 0
    for _t in ab:
        if _t.startswith("probe"):
            probe_n = int(_t[5:] or "2048")
    GRP = grp                           # shadow the module default
    # grp == 16: two pairs share each traceback byte (the 4-bit ptr packs
    # pair g in the low nibble, pair g+8 in the high nibble of row
    # ftr*8 + g) so the tb scratch stays (MARKER+1)*8 rows — without the
    # packing a 16-group tb would be 10.5 MB of the 16 MB VMEM by itself
    PACK = grp > 8
    TBR = 8 if PACK else grp            # tb rows per diagonal
    # hbm_tb: escalated wide windows (FLEN > 1024). The (MARKER+1)*TBR x W
    # tb scratch alone would be 17.8 MB of VMEM at FLEN 2048, so it lives
    # in HBM instead: the DP emits pointer rows through a small VMEM ring
    # (RING-diagonal slabs, two buffers ping-ponged by async copies) and
    # the traceback stages STG_D-diagonal windows back on demand. This is
    # what lets escalated pairs keep the 8-pair grouped kernel instead of
    # dropping to the single-pair kernel's 1/8 sublane utilization
    # (reference GPU capacity analogue: msa.hpp:217-218). Pure data
    # movement — bit-identical to the VMEM tb path.
    RING = TB_RING                      # diagonals per emit slab
    STG_D = TB_STG                      # staged traceback window (diags)
    # HBM tb capacity in diagonals: the tail flush writes whole slabs, so
    # round the MARKER+1 stored diagonals up to a slab boundary
    D_ALLOC = _round_up(MARKER + 1, RING)
    SB_MAX = D_ALLOC - STG_D
    W = FLEN + 128                      # circular row width
    WSTG = W + 128                      # anchored window incl. align slack
    # pack layout: profiles are packed with pack_pair_into(..., flen=OFF),
    # i.e. OFF leading zero lanes on each side — wide enough that every
    # anchored scratch read stays inside the buffer with no clamping
    OFF = FLEN + 256
    TOT = OFF + PADLEN + OFF + 128
    MAXALN = _round_up(2 * PADLEN + 2 * MARKER + 64, 128)
    # traceback-merge chunk: out rows are merged CHUNK lanes at a time so
    # VMEM temporaries stay O(CHUNK) instead of O(MAXALN) per pair — the
    # old full-row ops allocated ~10 MB of scoped VMEM across the 8
    # unrolled pairs, blowing the 16 MB plan at the 32768-column bucket
    CHUNK = max(128, min(1024, MAXALN - 128))
    CW = CHUNK + 128
    P8 = _round_up(P, 8)
    # ref profile scratch lookahead margin: the circular ref rows shift by
    # one static lane per diagonal (j = k - i grows with k); the anchor
    # loads M extra low-i lanes so ~M diagonals run between re-anchors
    MARGIN = 64
    mat = [[float(matrix[i, j]) for j in range(matrix.shape[1])]
           for i in range(matrix.shape[0])]

    # DP wavefront rows (S/I/D and the convergence-source rows CS/CI/CD)
    # are LOOP-CARRIED (GRP, W) vectors, not VMEM scratch: the previous
    # two anti-diagonals ride in the while-loop state with freeze-masked
    # rotation (a pair that stops keeps its final rows). This removes the
    # parity-select reads (row_set), the 14 predicated read-modify-write
    # regions per diagonal (write_circ), and the per-tile buffer re-init
    # the round-3 kernel paid — the traceback store and the circular
    # profile windows are the only VMEM scratch left. Band-validity masks
    # guarantee every read lands on a lane the carried row actually wrote,
    # so the path is bit-identical to the scratch formulation (fuzzed vs
    # the NumPy oracle, tools/fuzz_g8.py).
    def kernel(ref_len_a, qry_len_a, ref_num_a, qry_num_a, flen_a, xdrop_a,
               gapchar_a, gapopen_a, gapext_a,
               ref_ref, qry_ref,
               out_ref, tail_ref,
               tb, RefW, QryW, TBS,
               RefStg=None, QryStg=None, dsem=None,
               TbRing=None, TbStage=None, tsem=None,
               dbg_ref=None):
        lane_w = lax.broadcasted_iota(jnp.int32, (GRP, W), 1)
        sub1 = lax.broadcasted_iota(jnp.int32, (GRP, 1), 0)
        lane_c = lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        pid = pl.program_id(0)

        def pvec(arr, dtype=jnp.int32):
            """(GRP, 1) per-pair scalar column from a prefetch array."""
            out = jnp.zeros((GRP, 1), dtype=dtype)
            for g in range(GRP):
                v = arr[pid * GRP + g]
                out = jnp.where(sub1 == g,
                                jnp.full((GRP, 1), v, dtype=dtype), out)
            return out

        ref_len = pvec(ref_len_a)
        qry_len = pvec(qry_len_a)
        ref_num = pvec(ref_num_a, jnp.float32)
        qry_num = pvec(qry_num_a, jnp.float32)
        flen_param = pvec(flen_a)
        xdrop = pvec(xdrop_a)
        gap_char = pvec(gapchar_a, jnp.float32)
        gap_open = pvec(gapopen_a, jnp.float32)
        gap_extend = pvec(gapext_a, jnp.float32)

        denominator = ref_num * qry_num                      # (GRP, 1)
        # Hoisted half of fastmath.exact_div32: the reciprocal and the
        # Veltkamp split of the divisor depend only on the per-pair
        # denominator, which is constant for the whole kernel — computing
        # them once here shortens the per-diagonal serial chain through
        # the division (the remaining per-x ops below are the SAME float
        # operations in the SAME order as exact_div32, so the quotient is
        # bit-identical; fuzzed).
        _dsplit = jnp.float32(4097.0)          # 2**12+1, f32 Veltkamp
        _drecip = jnp.float32(1.0) / denominator
        _db1 = denominator * _dsplit
        _dbh = _db1 - (_db1 - denominator)
        _dbl = denominator - _dbh

        def exact_div_den(x):
            """Correctly-rounded f32 x / denominator (Markstein +
            Dekker, divisor terms precomputed above)."""
            q0 = x * _drecip
            p = q0 * denominator
            a1 = q0 * _dsplit
            ah = a1 - (a1 - q0)
            al = q0 - ah
            err = ((ah * _dbh - p) + ah * _dbl + al * _dbh) + al * _dbl
            resid = (x - p) - err
            return q0 + resid * _drecip

        xdrop_f = xdrop.astype(jnp.float32)
        inf = jnp.float32(2.0) * xdrop_f + jnp.float32(1.0)  # (GRP, 1)
        neg_inf = -inf

        def similarity_leaf(ref_codes, qry_codes):
            """Leaf pairs: profiles are exactly one-hot with unit weight,
            so the expected score reduces to a matrix lookup — bit-equal to
            the freq-path sum (0.0-additions and /1.0 are exact)."""
            sim = jnp.zeros((GRP, W), dtype=jnp.float32)
            nlet = P - 1
            for r in range(nlet):
                row = jnp.float32(0.0) + jnp.zeros((GRP, W), jnp.float32)
                for m in range(nlet):
                    if mat[r][m] != 0.0:
                        row = jnp.where(qry_codes == m,
                                        jnp.float32(mat[r][m]), row)
                sim = jnp.where(ref_codes == r, row, sim)
            return sim

        def similarity(ref_rows, qry_rows):
            """ref_rows/qry_rows: lists of P (GRP, W) circular tiles;
            reproduces the reference's SIMD summation order exactly."""
            num = jnp.zeros((GRP, W), dtype=jnp.float32)
            if P == 6:
                for l in range(5):
                    s = (qry_rows[0] * mat[l][0]) * ref_rows[l]
                    for m in range(1, 5):
                        s = s + (qry_rows[m] * mat[l][m]) * ref_rows[l]
                    num = num + s
                for l in range(5):
                    num = num + (ref_rows[l] * qry_rows[5]) * gap_char
                for m in range(5):
                    num = num + (ref_rows[5] * qry_rows[m]) * gap_char
            else:
                for l in range(21):
                    sumvec = [(qry_rows[m] * mat[l][m]) * ref_rows[l]
                              for m in range(8)]
                    sumvec = [sumvec[j] + (qry_rows[8 + j] * mat[l][8 + j])
                              * ref_rows[l] for j in range(8)]
                    for m in range(16, 21):
                        num = num + (ref_rows[l] * qry_rows[m]) * mat[l][m]
                    s = sumvec[0]
                    for j in range(1, 8):
                        s = s + sumvec[j]
                    num = num + s
                for l in range(21):
                    num = num + (ref_rows[l] * qry_rows[21]) * gap_char
                for m in range(21):
                    num = num + (ref_rows[21] * qry_rows[m]) * gap_char
            if "nodiv" in ab:           # ablation: approximate divide
                return num / denominator
            if "slowdiv" in ab:         # A/B: un-hoisted exact_div32
                return exact_div32(num, denominator)
            return exact_div_den(num)

        def shift1(row):
            """Value at i-1 for every lane (static circular shift).
            Rows are CIRCULAR: lane x holds the cell with absolute query
            index i ≡ x (mod W) — every read below is lane-direct or a
            static shift-by-one, never a dynamic roll."""
            return pltpu.roll(row, 1, 1)

        def hbm_circ(src, g, v, start, i0):
            """(1, W) circular row from an HBM-block row: linear window
            [start, start+W) whose lane t corresponds to absolute index
            i0 + t, rolled so lane (i0+t) %% W holds it. The aligned read
            is 128 lanes wider so the alignment remainder never wraps
            stale lanes into the window."""
            start_al = pl.multiple_of((start // 128) * 128, 128)
            r = start - start_al
            wnd = src[g, v:v + 1, pl.ds(start_al, W + 128)]
            if wnd.dtype == jnp.int8:
                # leaf blocks ship int8 letter codes (4x less transfer);
                # Mosaic rotates 32-bit data only
                wnd = wnd.astype(jnp.int32)
            lin = pltpu.roll(wnd, (W + 128) - r, 1)[:, :W]
            return pltpu.roll(lin, i0 % W, 1)

        def run_tile(tc):
            (ref_idx, qry_idx, tile_no, out_len, last_tile_c, err,
             cells_acc, diag_acc) = tc
            last_tile = last_tile_c != 0
            active0 = jnp.logical_not(last_tile) & (err == 0)   # (GRP,1)
            ref_rem = ref_len - ref_idx
            qry_rem = qry_len - qry_idx
            dflen = jnp.minimum(flen_param, jnp.minimum(ref_rem, qry_rem))
            cell_count = jnp.where(active0, ref_rem + qry_rem - 1, 0)

            # carried DP rows: lvl-1 = previous anti-diagonal (k-1),
            # lvl-2 = the one before (k-2); boundary init matches the old
            # scratch fills. A frozen pair (run gone 0) keeps its final
            # rows — the rotation below is masked per pair.
            neg1f = jnp.full((GRP, W), -1.0, dtype=jnp.float32)
            row_init = dict(
                s1=neg1f, s2=neg1f, i1=neg1f, d1=neg1f,
                cs1=jnp.full((GRP, W), -1, dtype=jnp.int32),
                cs2=jnp.full((GRP, W), -1, dtype=jnp.int32),
                ci1=jnp.full((GRP, W), I_BOUNDARY, dtype=jnp.int32),
                cd1=jnp.full((GRP, W), D_BOUNDARY, dtype=jnp.int32))
            if "twocarry" in ab:
                for j in range(4):
                    row_init[f"x{j}"] = jnp.zeros((GRP, W), jnp.float32)

            # Circular profile scratch: for pair g, letter v, at the
            # anchor diagonal kk with window base qbase (= org):
            #   QryW[v*GRP+g, x] = qry_v(i) for i ≡ x (mod W),
            #       i ∈ [qbase, qbase + W)           — static until re-anchor
            #   RefW[v*GRP+g, x] = ref_v(kk - i) for i ≡ x (mod W),
            #       i ∈ [qbase - MARGIN, qbase - MARGIN + W)
            # Between anchors the qry rows never move; the ref rows shift
            # by ONE static lane per diagonal (j = k - i advances with k),
            # so the MARGIN low-i lanes loaded here cover ~MARGIN diagonals.
            def anchor_hbm(qbase, kk):
                """hbm_in variant: the profile blocks stay in HBM (a
                32768-column block would not fit VMEM); each anchor DMAs
                the 8 pairs' WSTG-wide windows into staging (all 16
                copies in flight together), then lane-rolls them into the
                circular scratch. Bit-identical to the VMEM path — rolls
                are pure data movement."""
                rows = 1 if leaf else P8
                starts = []
                copies = []
                for g in range(GRP):
                    idx = pid * GRP + g
                    qs = OFF + qry_idx[g, 0] + qbase
                    rs = OFF + PADLEN - 1 - ref_idx[g, 0] - kk + qbase \
                        - MARGIN
                    qs_al = pl.multiple_of((qs // 128) * 128, 128)
                    rs_al = pl.multiple_of((rs // 128) * 128, 128)
                    cq = pltpu.make_async_copy(
                        qry_ref.at[idx, :, pl.ds(qs_al, WSTG)],
                        QryStg.at[pl.ds(g * rows, rows), :],
                        dsem.at[2 * g])
                    cr = pltpu.make_async_copy(
                        ref_ref.at[idx, :, pl.ds(rs_al, WSTG)],
                        RefStg.at[pl.ds(g * rows, rows), :],
                        dsem.at[2 * g + 1])
                    cq.start()
                    cr.start()
                    copies.append((cq, cr))
                    starts.append((qs, qs_al, rs, rs_al))

                def circ(stg, start, start_al, i0):
                    wnd = stg
                    if wnd.dtype == jnp.int8:
                        wnd = wnd.astype(jnp.int32)
                    lin = pltpu.roll(wnd, WSTG - (start - start_al),
                                     1)[:, :W]
                    return pltpu.roll(lin, i0 % W, 1)

                for g in range(GRP):
                    cq, cr = copies[g]
                    cq.wait()
                    cr.wait()
                    qs, qs_al, rs, rs_al = starts[g]
                    if leaf:
                        QryW[g:g + 1, :] = circ(QryStg[g:g + 1, :], qs,
                                                qs_al, qbase)
                        RefW[g:g + 1, :] = circ(RefStg[g:g + 1, :], rs,
                                                rs_al, qbase - MARGIN)
                        continue
                    # one shared roll pair per side (all P8 rows share the
                    # shift), then scatter into the letter-major scratch
                    qrolled = circ(QryStg[g * P8:(g + 1) * P8, :], qs,
                                   qs_al, qbase)
                    rrolled = circ(RefStg[g * P8:(g + 1) * P8, :], rs,
                                   rs_al, qbase - MARGIN)
                    for v in range(P8):
                        QryW[v * GRP + g:v * GRP + g + 1, :] = \
                            qrolled[v:v + 1, :]
                        RefW[v * GRP + g:v * GRP + g + 1, :] = \
                            rrolled[v:v + 1, :]

            def anchor_profiles(qbase, kk):
                if hbm_in:
                    anchor_hbm(qbase, kk)
                    return
                for g in range(GRP):
                    qs = OFF + qry_idx[g, 0] + qbase
                    rs = OFF + PADLEN - 1 - ref_idx[g, 0] - kk + qbase \
                        - MARGIN
                    if leaf:
                        # single int32 code row per side
                        QryW[g:g + 1, :] = hbm_circ(qry_ref, g, 0, qs,
                                                    qbase)
                        RefW[g:g + 1, :] = hbm_circ(ref_ref, g, 0, rs,
                                                    qbase - MARGIN)
                        continue
                    # profile letters in rows [0, P); the position-specific
                    # gap open/extend ride in the two spare rows P8-2/P8-1
                    # of the same packed arrays (saves a third HBM operand)
                    for v in list(range(P)) + [P8 - 2, P8 - 1]:
                        QryW[v * GRP + g:v * GRP + g + 1, :] = \
                            hbm_circ(qry_ref, g, v, qs, qbase)
                        RefW[v * GRP + g:v * GRP + g + 1, :] = \
                            hbm_circ(ref_ref, g, v, rs, qbase - MARGIN)

            # NOTE: loop carries hold masks as int32 (0/1) — Mosaic cannot
            # legalize (8,1) i1 vectors in scf.yield
            def k_cond(st):
                return jnp.any(st["run"] != 0)

            # Pre-marker phase: convergence rows are untouched before
            # k == MARKER-1 (seeding) and the reduction over all-(-1)/
            # boundary rows can never converge, so those reads, writes and
            # reductions are skipped entirely for the first MARKER-1
            # diagonals of every tile (with_conv=False) — ~40% less work
            # on the majority of diagonals.
            def k_body(st, with_conv=True, slim=False):
                # slim=True (pre-marker loop only): the four convergence
                # rows cs1/cs2/ci1/cd1 are NOT in the loop state — they
                # are constant (their inits) until diagonal MARKER-1, so
                # the pre-marker loop (~93% of all diagonals at the
                # production marker) carries 4 fewer (GRP, W) rows; the
                # constants are re-attached at the loop boundary.
                # Bit-identical ("fatpre" token restores the full carry
                # for A/B).
                # Carried rows: st["s1"/"i1"/"d1"/"cs1"/"ci1"/"cd1"] hold
                # the previous diagonal's (k-1) post-write rows, st["s2"]/
                # st["cs2"] the one before (k-2). Reads below are gated by
                # exactly the band each diagonal wrote (l1/u1 for k-1,
                # l2/u2 for k-2), so lanes a frozen or out-of-band write
                # skipped are never consumed.
                k = st["k"]
                org = st["org"]
                # opaque zeros for the "two*" additive ablation tokens:
                # float 0.0*k is not constant-foldable (IEEE), so a
                # poisoned duplicate computation cannot be CSE'd away
                # (the original additive tokens duplicated PURE
                # expressions, which XLA de-duplicated — measured ~0)
                zkf = k.astype(jnp.float32) * jnp.float32(0.0)
                zki = zkf.astype(jnp.int32)
                converged_c = st["converged"] != 0
                stopped_c = st["stopped"] != 0
                # `lazystop` A/B token: apply a conv-stop detected at k-1
                # HERE (via the carried stopped flag) instead of inside
                # k-1's run_new, taking the conv reductions off the
                # returned run mask. Bit-identical incl. work counters.
                # MEASURED WORSE on v5e (round 5: baseline 5.084 vs
                # lazystop 5.231 us/diag, +2.9%) — the eager gate stays
                # the default; kept for re-testing on future toolchains.
                run = st["run"] != 0
                if "lazystop" in ab:
                    run = run & jnp.logical_not(stopped_c)

                Lk, Uk = st["lk"], st["uk"]          # band of diagonal k
                Lp1, Up1 = st["l2"], st["u2"]        # band of k-2
                Lp2, Up2 = st["l1"], st["u1"]        # band of k-1
                count = Uk - Lk + 1

                # efficiency accounting: live-band cells and diagonals
                # actually stepped (returned in the tail for DP-cells/s)
                cells_new = st["cells"] + jnp.where(run, count, 0)
                diags_new = st["diags"] + jnp.where(run, 1, 0)

                band_dead = run & (Lk >= Uk + 1)
                band_over = run & (count > dflen)
                abort = band_dead | band_over
                abort_err = jnp.where(band_dead, 1, 2)

                # Re-anchor when the circular ref rows have shifted close
                # to their MARGIN of preloaded low-i lanes, or the qry
                # window no longer covers the live band. Between anchors
                # the qry rows are static and the ref rows move by ONE
                # static lane per diagonal (j = k - i advances with k).
                ldrift = (k - st["anch_k"]) - (org - st["anch_q"])
                rdrift = org - st["anch_q"]
                need_anchor = (ldrift + 8 >= MARGIN) \
                    | (rdrift + FLEN + 8 >= W) | (st["anch_q"] < -1)
                if "noanchor" in ab:    # strip: anchor never fires
                    need_anchor = need_anchor & (zkf != jnp.float32(0.0))

                # stripanchor: remove the anchor REGION from the trace
                # entirely (noanchor only forces the predicate false —
                # the ~7k-op region stays in the IR; an IR census found
                # 92% of the DP body's ops inside the pl.when regions,
                # so region PRESENCE cost needs its own strip)
                if "stripanchor" not in ab:
                    @pl.when(need_anchor)
                    def _():
                        anchor_profiles(org, k)
                if "twoanchor" in ab:
                    # additive: re-anchor twice (poisoned offsets; writes
                    # the same values) — attributes the per-anchor staging
                    # cost (the full-window reads + rolls fire per tile
                    # start and every ~MARGIN diagonals)
                    @pl.when(need_anchor)
                    def _():
                        anchor_profiles(org + zki, k + zki)

                if "noroll" not in ab:  # ablation: static ref window
                    @pl.when(jnp.logical_not(need_anchor))
                    def _():
                        RefW[...] = pltpu.roll(RefW[...], 1, 1)
                if "tworoll" in ab:     # additive: one poisoned extra roll
                    @pl.when(jnp.logical_not(need_anchor))
                    def _():
                        a = RefW[...]
                        extra = pltpu.roll(a + zkf.astype(a.dtype), 1, 1)
                        RefW[...] = jnp.where(k < -1,
                                              pltpu.roll(extra, W - 1, 1),
                                              a)

                anch_q = jnp.where(need_anchor, org, st["anch_q"])
                anch_k = jnp.where(need_anchor, k, st["anch_k"])

                # absolute i per circular lane: the unique i ≡ x (mod W)
                # inside [org, org + W)
                x_rel = lane_w - org % W
                i_arr = org + x_rel + jnp.where(x_rel < 0, W, 0)
                lprime = jnp.maximum(0, k - ref_rem + 1)
                jmax = jnp.minimum(k, ref_rem - 1)
                j_arr = jmax - (i_arr - lprime)
                live = run & (i_arr >= Lk) & (i_arr <= Uk)

                if leaf:
                    qcode = QryW[...]
                    rcode = RefW[...]
                    pos_go_qry = gap_open + jnp.zeros((GRP, W),
                                                      jnp.float32)
                    pos_ge_qry = gap_extend + jnp.zeros((GRP, W),
                                                        jnp.float32)
                    pos_go_ref = pos_go_qry
                    pos_ge_ref = pos_ge_qry
                else:
                    qw = QryW[...]
                    rw = RefW[...]
                    qry_rows = [qw[m * GRP:(m + 1) * GRP] for m in range(P)]
                    ref_rows = [rw[l * GRP:(l + 1) * GRP] for l in range(P)]
                    pos_go_qry = qw[(P8 - 2) * GRP:(P8 - 1) * GRP]
                    pos_ge_qry = qw[(P8 - 1) * GRP:P8 * GRP]
                    pos_go_ref = rw[(P8 - 2) * GRP:(P8 - 1) * GRP]
                    pos_ge_ref = rw[(P8 - 1) * GRP:P8 * GRP]

                diag_valid = (i_arr - 1 >= Lp1) & (i_arr - 1 <= Up1)
                border = (tile_no == 0) & ((i_arr == 0) | (j_arr == 0))
                compute_sim = (k == 0) | diag_valid | border

                if "nosim" in ab:       # ablation: skip similarity math
                    sim = gap_char + jnp.zeros((GRP, W), jnp.float32)
                else:
                    sim = similarity_leaf(rcode, qcode) if leaf \
                        else similarity(ref_rows, qry_rows)
                if "twosim" in ab:      # additive ablation: sim twice
                    # poisoned operand defeats CSE; value is unchanged
                    sim_b = similarity_leaf(rcode + zki, qcode) if leaf \
                        else similarity([ref_rows[0] + zkf]
                                        + list(ref_rows[1:]), qry_rows)
                    sim = jnp.where(k < -1, sim_b, sim)
                if "twodiv" in ab:      # additive ablation: extra divide
                    sim = jnp.where(k < -1,
                                    exact_div32(sim + zkf, denominator),
                                    sim)
                # previous-diagonal circular rows: "at i" is lane-direct,
                # "at i-1" is a static shift by one
                s_diag = shift1(st["s2"])        # S[k-2](i-1)
                s_left = shift1(st["s1"])        # S[k-1](i-1)
                s_up = st["s1"]                  # S[k-1](i)
                d_up = st["d1"]                  # D[k-1](i)
                i_left = shift1(st["i1"])        # I[k-1](i-1)

                if "nocore" in ab:      # strip: affine select cascade ->
                    # minimal recurrence (keeps the carried-row shifts,
                    # the sim edge and the ptr/iptr/dptr shapes)
                    i_val = s_left + pos_go_qry
                    d_val = s_up + pos_go_ref
                    s_val = jnp.maximum(s_diag + sim,
                                        jnp.maximum(i_val, d_val))
                    iptr = i_val >= s_val
                    dptr = d_val >= s_val
                    ptr = (s_val > jnp.float32(0.0)).astype(jnp.int32)
                else:
                    steps = jnp.maximum(
                        0, jnp.maximum(ref_idx + j_arr, qry_idx + i_arr)
                        - 1).astype(jnp.float32)
                    border_val = sim + gap_open + gap_extend * steps
                    origin = (i_arr == 0) & (j_arr == 0)
                    border_val = jnp.where(origin, sim, border_val)

                    with_diag = s_diag + sim
                    m_val = jnp.where(border, border_val,
                                      jnp.where(i_arr - 1 < Lp1, sim,
                                                with_diag))
                    match = jnp.where(compute_sim, m_val, neg_inf)

                    up_valid = (i_arr >= Lp2) & (i_arr <= Up2)
                    left_valid = (i_arr - 1 >= Lp2) & (i_arr - 1 <= Up2)

                    del_op = jnp.where(up_valid, s_up + pos_go_ref,
                                       neg_inf)
                    del_ext = jnp.where(up_valid, d_up + pos_ge_ref,
                                        neg_inf)
                    ins_op = jnp.where(left_valid, s_left + pos_go_qry,
                                       neg_inf)
                    ins_ext = jnp.where(left_valid, i_left + pos_ge_qry,
                                        neg_inf)

                    iptr = ins_ext >= ins_op
                    dptr = del_ext >= del_op
                    i_val = jnp.where(iptr, ins_ext, ins_op)
                    d_val = jnp.where(dptr, del_ext, del_op)

                    m_ge_i = match >= i_val
                    m_ge_d = match >= d_val
                    i_gt_d = i_val > d_val
                    s_val = jnp.where(m_ge_i,
                                      jnp.where(m_ge_d, match, d_val),
                                      jnp.where(i_gt_d, i_val, d_val))
                    ptr = jnp.where(m_ge_i, jnp.where(m_ge_d, 0, 2),
                                    jnp.where(i_gt_d, 1, 2))

                if "nokill" not in ab:  # strip: no X-drop kill select
                    killed = s_val < (st["max_score"] - xdrop_f)
                    s_val = jnp.where(killed, neg_inf, s_val)

                if debug_k >= 0 and dbg_ref is not None:
                    @pl.when(k == debug_k)
                    def _():
                        dbg_ref[0:GRP, :FLEN] = sim[:, :FLEN]
                        dbg_ref[GRP:2 * GRP, :FLEN] = match[:, :FLEN]
                        dbg_ref[2 * GRP:3 * GRP, :FLEN] = i_val[:, :FLEN]
                        dbg_ref[3 * GRP:4 * GRP, :FLEN] = d_val[:, :FLEN]
                        dbg_ref[4 * GRP:5 * GRP, :FLEN] = s_val[:, :FLEN]
                        dbg_ref[5 * GRP:6 * GRP, :FLEN] = \
                            Lk.astype(jnp.float32) + jnp.zeros((GRP, FLEN))
                        dbg_ref[6 * GRP:7 * GRP, :FLEN] = \
                            Uk.astype(jnp.float32) + jnp.zeros((GRP, FLEN))
                        dbg_ref[7 * GRP:8 * GRP, :FLEN] = \
                            pos_go_qry[:, :FLEN]

                if "nomax" in ab:       # strip: per-diag msp lane max
                    msp_new = st["msp"]
                else:
                    mx = jnp.max(jnp.where(live, s_val, neg_inf), axis=1,
                                 keepdims=True)
                    msp_new = jnp.where(run & (st["msp"] < mx), mx,
                                        st["msp"])

                # post-write rows for diagonal k (masked merge onto the
                # carried k-1 rows; lanes outside `live` are never read)
                if "nolive" in ab:      # strip: unmasked row writes
                    s_row, i_row, d_row = s_val, i_val, d_val
                else:
                    s_row = jnp.where(live, s_val, st["s1"])
                    i_row = jnp.where(live, i_val, st["i1"])
                    d_row = jnp.where(live, d_val, st["d1"])

                # convergence-source propagation (skipped pre-marker)
                if with_conv:
                    i_low = i_arr & 0xFFFF
                    ci_left = shift1(st["ci1"])
                    cs_left = shift1(st["cs1"])
                    cd_up = st["cd1"]
                    cs_up = st["cs1"]
                    cs_diag = shift1(st["cs2"])

                    ci_prop = jnp.where(i_arr - 1 >= Lp2, ci_left,
                                        I_BOUNDARY)
                    ci_open = jnp.where(
                        (i_arr - 1 >= Lp2) & (cs_left != -1),
                        cs_left, I_BOUNDARY)
                    ci_new = jnp.where(iptr, ci_prop, ci_open)
                    cd_prop = jnp.where(i_arr >= Lp2, cd_up, D_BOUNDARY)
                    cd_open = jnp.where((i_arr >= Lp2) & (cs_up != -1),
                                        cs_up, D_BOUNDARY)
                    cd_new = jnp.where(dptr, cd_prop, cd_open)
                    cs_new = jnp.where(ptr == 0, cs_diag,
                                       jnp.where(ptr == 1, ci_new, cd_new))

                    cs_row_v = jnp.where(
                        k == MARKER - 1, (3 << 16) | i_low,
                        jnp.where(k == MARKER, i_low, cs_new))
                    ci_row_v = jnp.where(k == MARKER, (1 << 16) | i_low,
                                         ci_new)
                    cd_row_v = jnp.where(k == MARKER, (2 << 16) | i_low,
                                         cd_new)
                    cs_row = jnp.where(live & (k >= MARKER - 1), cs_row_v,
                                       st["cs1"])
                    ci_row = jnp.where(live & (k >= MARKER), ci_row_v,
                                       st["ci1"])
                    cd_row = jnp.where(live & (k >= MARKER), cd_row_v,
                                       st["cd1"])
                elif not slim:
                    cs_row, ci_row, cd_row = st["cs1"], st["ci1"], st["cd1"]

                ptr = ptr | (iptr.astype(jnp.int32) << 2) | \
                    (dptr.astype(jnp.int32) << 3)

                # tb store: rows k*TBR .. k*TBR+TBR-1 (8-aligned); ptr is
                # already lane-circular, so the store is direct. PACK:
                # the 4-bit ptr of pair g+8 rides in the high nibble of
                # pair g's byte (one store either way). hbm_tb: the row
                # goes into the VMEM ring; full RING-diagonal slabs are
                # flushed to the HBM tb by async copies (two slab buffers
                # ping-pong; the previous flush of a buffer is awaited
                # right before its first row is overwritten).
                # striptb: remove the tb-store region from the trace
                # (notb keeps a never-firing region in the IR)
                def _tb_store():
                    k_ftr = jnp.minimum(k, MARKER)
                    v = ((ptr[0:8, :] | (ptr[8:16, :] << 4)) if PACK
                         else ptr).astype(jnp.int8)
                    if not hbm_tb:
                        tb[pl.ds(pl.multiple_of(k_ftr * TBR, 8), TBR),
                           :] = v
                        if "twotb" in ab:
                            # additive: poisoned second store to a fixed
                            # row range (a same-address duplicate would be
                            # dead-store-eliminated). Corrupts diagonal
                            # 0's tb rows — outputs are WRONG, DP
                            # iteration counts are not.
                            tb[pl.ds(0, TBR), :] = \
                                v | zki.astype(jnp.int8)
                        return
                    slot = k_ftr % (2 * RING)
                    for b in range(2):
                        @pl.when((k_ftr % RING == 0)
                                 & (k_ftr >= 2 * RING)
                                 & ((k_ftr // RING) % 2 == b))
                        def _(b=b):
                            pltpu.make_async_copy(
                                TbRing.at[pl.ds(b * RING * TBR,
                                                RING * TBR), :],
                                tb.at[pl.ds(0, RING * TBR), :],
                                tsem.at[b]).wait()
                    TbRing[pl.ds(pl.multiple_of(slot * TBR, 8), TBR),
                           :] = v
                    for b in range(2):
                        @pl.when((k_ftr % RING == RING - 1)
                                 & ((k_ftr // RING) % 2 == b))
                        def _(b=b):
                            dst0 = pl.multiple_of(
                                (k_ftr - (RING - 1)) * TBR, 8)
                            pltpu.make_async_copy(
                                TbRing.at[pl.ds(b * RING * TBR,
                                                RING * TBR), :],
                                tb.at[pl.ds(dst0, RING * TBR), :],
                                tsem.at[b]).start()
                if "striptb" not in ab:
                    pl.when(k <= (MARKER if "notb" not in ab
                                  else -1))(_tb_store)

                if "noband" in ab:      # strip: live-band reductions
                    new_l, new_u = Lk, Uk
                else:
                    alive = live & (s_val > neg_inf)
                    first_alive = jnp.min(
                        jnp.where(alive, i_arr, jnp.int32(2 ** 30)),
                        axis=1, keepdims=True)
                    last_alive = jnp.max(jnp.where(alive, i_arr, -1),
                                         axis=1, keepdims=True)
                    # i_arr >= org >= 0, so the max over alive lanes is
                    # >= 0 iff any lane is alive — one reduction, not two
                    any_alive = last_alive >= 0
                    new_l = jnp.where(any_alive, first_alive, Uk + 1)
                    new_u = jnp.where(any_alive, last_alive, Lk - 1)

                if with_conv:
                    do_track = run & jnp.logical_not(converged_c) & \
                        (k < ref_rem + qry_rem - 2)
                    # Convergence check, reformulated from the reference's
                    # three full-band uniformity reductions into one cs
                    # reduction + one elementwise mask + one all-reduce.
                    # Equivalence (each conv_X = the common in-seg value if
                    # uniform else -1; hit requires conv_i==conv_d==conv_s
                    # ==prev_conv_s != -1): hit ⟺ every in-seg lane has
                    # ci==cd, ci==cs AND cs==prev (prev is a per-pair
                    # scalar, so cs==prev at every lane forces uniformity
                    # of cs, and the chain forces ci/cd uniform too) AND
                    # ci != -1. The empty-band case (length<0) compares
                    # the single clipped-lane values — the same elementwise
                    # mask read at that lane.
                    prev = st["prev_conv_s"]
                    if "nored" in ab:   # ablation: no conv reductions
                        conv_s = prev
                        conv_hit = do_track & (k < -1)
                        conv_value = st["conv_value"]
                        conv_score = st["conv_score"]
                        converged = converged_c
                        prev_conv_s = prev
                        seg_len = None  # unused
                    elif "oldred" in ab:   # A/B: the 4-reduction variant
                        seg_len = new_u - new_l
                        start_c = jnp.clip(new_l, org, org + FLEN - 1)
                        first_mask = i_arr == start_c
                        in_seg = (i_arr >= new_l) & (i_arr <= new_u)
                        cs_first = jnp.sum(
                            jnp.where(first_mask, cs_row, 0),
                            axis=1, keepdims=True)
                        cs_all_eq = jnp.all(
                            jnp.logical_not(in_seg) | (cs_row == cs_first),
                            axis=1, keepdims=True)
                        conv_s = jnp.where(seg_len < 0, cs_first,
                                           jnp.where(cs_all_eq, cs_first,
                                                     jnp.int32(-1)))
                        m_conv = (ci_row == cd_row) & \
                            (ci_row == cs_row) & \
                            (cs_row == prev) & (ci_row != -1)
                        hit_full = jnp.all(
                            jnp.logical_not(in_seg) | m_conv,
                            axis=1, keepdims=True).astype(jnp.int32)
                        hit_first = jnp.sum(
                            jnp.where(first_mask,
                                      m_conv.astype(jnp.int32), 0),
                            axis=1, keepdims=True)
                        conv_hit = do_track & \
                            (jnp.where(seg_len < 0, hit_first,
                                       hit_full) != 0)
                        conv_value = jnp.where(conv_hit, prev,
                                               st["conv_value"])
                        conv_score = jnp.where(conv_hit, msp_new,
                                               st["conv_score"])
                        converged = converged_c | conv_hit
                        prev_conv_s = jnp.where(do_track, conv_s, prev)
                    else:
                        # Default: 3-reduction convergence check (min/max
                        # of cs + all-ok), equivalent to the 4-reduction
                        # block above (and to the reference's 3 uniformity
                        # scans, TALCO-XDrop.cpp conv logic):
                        # - nonempty band: start_c == new_l is in-seg
                        #   (alive lanes satisfy org <= i <= org+FLEN-16),
                        #   so in_seg2 == in_seg; uniformity of cs is
                        #   min==max; "every in-seg lane has cs==prev" ⟺
                        #   uniform & min==prev; ok(=ci==cd==cs) at every
                        #   lane via one min-reduce; ci != -1 ⟺ cs != -1
                        #   under ok ⟺ min != -1.
                        # - empty band (seg_len<0): in_seg2 = {start_c},
                        #   min==max==cs_first trivially, so the SAME
                        #   formula evaluates the reference's single
                        #   clipped-lane checks (conv_s = cs_first
                        #   unconditionally, hit = m_conv at that lane).
                        seg_len = new_u - new_l
                        start_c = jnp.clip(new_l, org, org + FLEN - 1)
                        in_seg2 = ((i_arr >= new_l) & (i_arr <= new_u)) | \
                            (i_arr == start_c)
                        ok_row = ((ci_row == cd_row) &
                                  (ci_row == cs_row)).astype(jnp.int32)
                        mn_cs = jnp.min(
                            jnp.where(in_seg2, cs_row,
                                      jnp.int32(2 ** 31 - 1)),
                            axis=1, keepdims=True)
                        mx_cs = jnp.max(
                            jnp.where(in_seg2, cs_row,
                                      jnp.int32(-2 ** 31)),
                            axis=1, keepdims=True)
                        all_ok = jnp.min(jnp.where(in_seg2, ok_row, 1),
                                         axis=1, keepdims=True)
                        uniform = mn_cs == mx_cs
                        conv_s = jnp.where(
                            seg_len < 0, mn_cs,
                            jnp.where(uniform, mn_cs, jnp.int32(-1)))
                        conv_hit = do_track & (all_ok != 0) & uniform & \
                            (mn_cs == prev) & (mn_cs != -1)
                        if "twored" in ab:   # additive: poisoned duplicate
                            cs_p = cs_row + zki
                            mn_b = jnp.min(
                                jnp.where(in_seg2, cs_p,
                                          jnp.int32(2 ** 31 - 1)),
                                axis=1, keepdims=True)
                            mx_b = jnp.max(
                                jnp.where(in_seg2, cs_p,
                                          jnp.int32(-2 ** 31)),
                                axis=1, keepdims=True)
                            ok_b = jnp.min(
                                jnp.where(in_seg2,
                                          ((ci_row == cd_row) &
                                           (cs_p == ci_row))
                                          .astype(jnp.int32), 1),
                                axis=1, keepdims=True)
                            conv_hit = conv_hit & \
                                ((mn_b * zki + mx_b * zki + ok_b * zki)
                                 == 0)
                        conv_value = jnp.where(conv_hit, prev,
                                               st["conv_value"])
                        conv_score = jnp.where(conv_hit, msp_new,
                                               st["conv_score"])
                        converged = converged_c | conv_hit
                        prev_conv_s = jnp.where(do_track, conv_s, prev)
                else:
                    # pre-marker: CS/CI/CD untouched, reductions would
                    # yield (-1, I_BOUNDARY, D_BOUNDARY) and prev_conv_s
                    # would stay -1 — pass state through unchanged
                    conv_value = st["conv_value"]
                    conv_score = st["conv_score"]
                    converged = converged_c
                    prev_conv_s = st["prev_conv_s"]

                v2 = k + 2 - ref_rem
                nl = jnp.maximum(new_l, jnp.maximum(0, v2))
                nu = jnp.minimum(qry_rem - 1, new_u + 1)

                max_score_new = jnp.where(
                    run, jnp.where(msp_new < 0, jnp.float32(0.0), msp_new),
                    st["max_score"])
                stop = converged & (max_score_new > conv_score) & \
                    jnp.logical_not(abort) & run
                if "nostop" in ab:
                    # ablation: conv reduces still run every diagonal but
                    # feed ONLY the cells accounting (off the run/stop
                    # critical path — `stop` is rebound to a constant with
                    # NO dataflow edge to the reductions). baseline-vs-
                    # nostop vs baseline-vs-nored separates reduce
                    # THROUGHPUT cost from the serial-dependency cost of
                    # gating the next diagonal on this one's reductions.
                    # Outputs WRONG (no early stop).
                    cells_new = cells_new + stop.astype(jnp.int32)
                    stop = jnp.zeros((GRP, 1), jnp.bool_)

                reached_end = (k + 1) >= cell_count
                if "lazystop" in ab:
                    # stop only reaches run via the carried stopped flag
                    run_new = run & jnp.logical_not(abort | reached_end)
                else:
                    run_new = run & jnp.logical_not(abort | stop
                                                    | reached_end)
                if probe_n:
                    # pinned trips: the opaque-false `zb` keeps the
                    # abort/stop/reached -> run dataflow edges (the
                    # dependency topology under test) while the value
                    # exits at exactly k == probe_n - 1
                    zb = zkf != jnp.float32(0.0)
                    run_new = run & jnp.logical_not(
                        (abort | stop | reached_end) & zb) \
                        & ((k + 1) < probe_n)
                kerr_new = jnp.where(abort, abort_err, st["kerr"])
                last_k_new = jnp.where(run, k, st["last_k"])

                # shared origin for k+1 covering the union of active bands
                act = run_new
                if "noorg" in ab:       # strip: org scalar-reduce block
                    org_new = org
                else:
                    lmin = jnp.min(jnp.where(act, nl, jnp.int32(2 ** 30)))
                    umax = jnp.max(jnp.where(act, nu, 0))
                    overflow = jnp.any(act) & (umax - lmin >= FLEN - 8)
                    if probe_n:
                        # keep the overflow dataflow, never exit on it
                        overflow = overflow & (zkf != jnp.float32(0.0))
                    kerr_new = jnp.where(act & overflow, 6, kerr_new)
                    run_new = run_new & jnp.logical_not(overflow)
                    org_c = jnp.maximum(org, umax - (FLEN - 16))
                    org_c = jnp.minimum(org_c, lmin)
                    org_new = jnp.where(jnp.any(act),
                                        jnp.maximum(org_c, org), org)

                # band-limit + carried-row rotation, masked per pair so a
                # frozen pair keeps its final diagonal's rows/limits (the
                # post-loop conv-state read depends on this)
                runm = run
                if "nomask" in ab:      # strip: unmasked rotation — the
                    # freeze selects are removed structurally (a
                    # constant-true (GRP,1) mask trips a Mosaic
                    # replicated-layout legalization error in the while
                    # carry)
                    def rotsel(a, b):
                        return a
                else:
                    def rotsel(a, b):
                        return jnp.where(runm, a, b)
                extra_carry = {}
                if "twocarry" in ab:    # additive: 4 extra carried rows
                    for j in range(4):
                        extra_carry[f"x{j}"] = jnp.minimum(
                            st[f"x{j}"], s_val)
                    # consume so the carries cannot be eliminated; the
                    # condition is never true (s_val >> -1e30)
                    kerr_new = jnp.where(
                        extra_carry["x0"][:, :1] < jnp.float32(-1e30),
                        99, kerr_new)
                conv_rows = {} if slim else dict(
                    cs1=cs_row, ci1=ci_row, cd1=cd_row,
                    cs2=rotsel(st["cs1"], st["cs2"]))
                return dict(
                    k=k + 1, org=org_new, anch_q=anch_q, anch_k=anch_k,
                    lk=rotsel(nl, Lk),
                    uk=rotsel(nu, Uk),
                    l1=rotsel(Lk, Lp2),
                    u1=rotsel(Uk, Up2),
                    l2=rotsel(Lp2, Lp1),
                    u2=rotsel(Up2, Up1),
                    s1=s_row, i1=i_row, d1=d_row,
                    s2=rotsel(st["s1"], st["s2"]),
                    last_k=last_k_new, prev_conv_s=prev_conv_s,
                    converged=converged.astype(jnp.int32),
                    conv_value=conv_value,
                    conv_score=conv_score, max_score=max_score_new,
                    msp=msp_new, kerr=kerr_new,
                    stopped=(stopped_c | stop).astype(jnp.int32),
                    run=run_new.astype(jnp.int32),
                    cells=cells_new, diags=diags_new,
                    **conv_rows, **extra_carry)

            zeros_i = jnp.zeros((GRP, 1), jnp.int32)
            st0 = dict(
                k=jnp.int32(0), org=jnp.int32(0),
                anch_q=jnp.int32(-10), anch_k=jnp.int32(0),
                # initial band slots match the old parity buffers as read
                # at k=0: current band [0,0], k-1 slot [2,-2], k-2 [1,-1]
                lk=zeros_i, uk=zeros_i,
                l1=zeros_i + 2, u1=zeros_i - 2,
                l2=zeros_i + 1, u2=zeros_i - 1,
                last_k=zeros_i, prev_conv_s=zeros_i - 1,
                converged=jnp.zeros((GRP, 1), jnp.int32),
                conv_value=zeros_i,
                conv_score=jnp.zeros((GRP, 1), jnp.float32),
                max_score=jnp.zeros((GRP, 1), jnp.float32),
                msp=neg_inf, kerr=zeros_i,
                stopped=jnp.zeros((GRP, 1), jnp.int32),
                run=(active0 & (cell_count > 0)).astype(jnp.int32),
                cells=cells_acc, diags=diag_acc,
                **row_init)
            # Both loops run UNROLL diagonals per while iteration, dividing
            # the per-iteration fixed costs (condition reduction + the
            # scalar loop-state shuffle). A k_body call after a pair
            # stopped is a masked no-op (writes gated by run/live; tb rows
            # above last_k are never read), so overshooting by up to
            # UNROLL-1 diagonals is safe. The pre-marker loop stops early
            # enough (MARKER-UNROLL) that the convergence seeding diagonal
            # k==MARKER-1 always executes with with_conv=True (last entry
            # k <= MARKER-UNROLL-1 executes through at most MARKER-2).
            # quad/oct are A/B tokens for bench_kernel --compare — bit-
            # identical configs, not ablations.
            UNROLL = 8 if "oct" in ab else (4 if "quad" in ab else 2)

            def k_cond_pre2(st):
                return jnp.any(st["run"] != 0) & (st["k"] < MARKER - UNROLL)

            def dbl(s, with_conv, slim=False):
                # the carried rows ARE the forwarding: each diagonal reads
                # the previous one's rows straight from the state dict
                for _ in range(UNROLL):
                    s = k_body(s, with_conv=with_conv, slim=slim)
                return s

            slim_pre = "fatpre" not in ab
            conv_init = {k_: row_init[k_]
                         for k_ in ("cs1", "cs2", "ci1", "cd1")}
            if slim_pre:
                for k_ in conv_init:
                    del st0[k_]
            st = lax.while_loop(k_cond_pre2,
                                lambda s: dbl(s, False, slim_pre), st0)
            if slim_pre:
                # re-attach the convergence rows at their (unchanged)
                # init values — exactly what the fat carry would hold
                # here (pre-marker bodies pass them through untouched)
                st = {**st, **conv_init}
            conv_on = "noconv" not in ab    # ablation: no conv machinery
            st = lax.while_loop(k_cond, lambda s: dbl(s, conv_on), st)

            if hbm_tb:
                # Flush barrier: every tb row the traceback may read must
                # be in HBM before staging starts. Diagonals [0, K_last]
                # were stored; full slabs 0..issues-1 were flushed in-loop
                # and slabs 0..waits-1 already awaited, leaving at most two
                # outstanding (buffers alternate per slab). The partial
                # tail slab is flushed as a full RING block — rows past
                # K_last are never read (traceback starts at
                # ftr <= min(last_k, MARKER) <= K_last).
                k_exit = st["k"]
                K_last = jnp.minimum(k_exit - 1, MARKER)
                issues = (K_last + 1) // RING
                waits = jnp.maximum(K_last // RING - 1, 0)
                for b in range(2):
                    @pl.when((issues - waits >= 1) & (waits % 2 == b))
                    def _(b=b):
                        pltpu.make_async_copy(
                            TbRing.at[pl.ds(b * RING * TBR,
                                            RING * TBR), :],
                            tb.at[pl.ds(0, RING * TBR), :],
                            tsem.at[b]).wait()
                    @pl.when((issues - waits >= 2) & ((waits + 1) % 2 == b))
                    def _(b=b):
                        pltpu.make_async_copy(
                            TbRing.at[pl.ds(b * RING * TBR,
                                            RING * TBR), :],
                            tb.at[pl.ds(0, RING * TBR), :],
                            tsem.at[b]).wait()
                for b in range(2):
                    @pl.when((K_last >= issues * RING)
                             & (issues % 2 == b))
                    def _(b=b):
                        dst0 = pl.multiple_of(issues * RING * TBR, 8)
                        cp = pltpu.make_async_copy(
                            TbRing.at[pl.ds(b * RING * TBR,
                                            RING * TBR), :],
                            tb.at[pl.ds(dst0, RING * TBR), :],
                            tsem.at[b])
                        cp.start()
                        cp.wait()

            last_k = st["last_k"]
            tile_err = st["kerr"]
            conv_logic = st["stopped"] != 0
            conv_value = st["conv_value"]

            # per-pair cs row at its own last diagonal, first live lane
            # (band-relative offset 0 in the reference). The carried cs1
            # row froze with the pair (masked rotation), so it holds each
            # pair's own last_k row regardless of when the pair stopped;
            # l1/u1 likewise froze at the pair's last band.
            Llast = st["l1"]
            posm = Llast % W
            cs0 = jnp.sum(jnp.where(lane_w == posm, st["cs1"], 0),
                          axis=1, keepdims=True)
            cqi_conv = conv_value & 0xFFFF
            tbs_conv = (conv_value >> 16) & 0xFFFF
            cqi_cs0 = cs0 & 0xFFFF
            tbs_cs0 = (cs0 >> 16) & 0xFFFF

            use_full = jnp.logical_not(conv_logic) & (last_k < MARKER)
            cqi = jnp.where(conv_logic, cqi_conv,
                            jnp.where(use_full, qry_rem - 1, cqi_cs0))
            tb_state = jnp.where(conv_logic, tbs_conv,
                                 jnp.where(use_full, 0, tbs_cs0))
            cri = jnp.where(use_full, ref_rem - 1,
                            MARKER - cqi - jnp.where(tb_state == 3, 1, 0))
            tb_ftr = jnp.where(use_full, last_k,
                               jnp.where(tb_state == 3,
                                         jnp.minimum(last_k, MARKER) - 1,
                                         jnp.minimum(last_k, MARKER)))
            last_tile_new = use_full

            sentinel = (cqi == D_BOUNDARY_LOW16) | (cqi == I_BOUNDARY_LOW16)
            tile_err = jnp.where(active0 & (tile_err == 0) & sentinel, 4,
                                 tile_err)

            reference_idx = jnp.where(active0, ref_idx + cri, ref_idx)
            query_idx = jnp.where(active0, qry_idx + cqi, qry_idx)
            bad_idx = ((ref_len - reference_idx) < 0) | \
                ((qry_len - query_idx) < 0)
            tile_err = jnp.where(active0 & (tile_err == 0) & bad_idx, 3,
                                 tile_err)

            at_ref_end = reference_idx == ref_len - 1
            at_qry_end = query_idx == qry_len - 1
            fill1 = jnp.where(at_ref_end & jnp.logical_not(at_qry_end),
                              qry_len - query_idx - 1, 0)
            fill2 = jnp.where(at_qry_end & jnp.logical_not(at_ref_end),
                              ref_len - reference_idx - 1, 0)
            last_tile_new = last_tile_new | at_ref_end | at_qry_end
            if probe_n:
                # measurement mode: one tile per pair, and the walk/
                # merge driven by the (garbage) post-DP state is clamped
                # small so its cost is near-constant across strip
                # variants (the DP loop is what's being attributed)
                last_tile_new = last_tile_new | (tile_no >= 0)
                cqi = jnp.minimum(cqi, 64)
                cri = jnp.minimum(cri, 64)
                tb_ftr = jnp.minimum(tb_ftr, 64)
                fill1 = jnp.zeros_like(fill1)
                fill2 = jnp.zeros_like(fill2)

            # ---- traceback ------------------------------------------------
            # opaque zero for the twowalk additive token (data-derived so
            # the duplicate walk cannot be CSE'd)
            zwi = (jnp.sum(gap_char) * jnp.float32(0.0)).astype(jnp.int32)
            ln128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            WSTEPS = 4 if "tbquad" in ab else 2

            def decode(tb_value, state):
                """Pointer-byte decode shared by both walk variants:
                returns (direction, next state)."""
                ptr_state = tb_value & 0x03
                dir0 = jnp.where(ptr_state == 0, 0,
                                 jnp.where(ptr_state == 1, 1, 2))
                next0 = jnp.where(
                    ptr_state == 0, 0,
                    jnp.where(ptr_state == 1,
                              jnp.where((tb_value & 0x04) != 0, 1, 0),
                              jnp.where((tb_value & 0x08) != 0, 2, 0)))
                next1 = jnp.where((tb_value & 0x04) != 0, 1, 0)
                next2 = jnp.where((tb_value & 0x08) != 0, 2, 0)
                dir_ = jnp.where(state == 0, dir0,
                                 jnp.where(state == 1, 1, 2))
                nstate = jnp.where(state == 0, next0,
                                   jnp.where(state == 1, next1, next2))
                return dir_, nstate

            # per-pair scalar parameters for the walks and merges
            g_oks, g_tiles, g_outls, g_cqis, g_cris = [], [], [], [], []
            g_tbss, g_ftrs, g_f1s, g_f2s = [], [], [], []
            for g in range(GRP):
                def sc(col, g=g):
                    return jnp.sum(jnp.where(sub1 == g, col, 0))
                ok = (sc(active0.astype(jnp.int32)) > 0) & \
                    (sc(tile_err) == 0)
                if "nowalk" in ab:      # ablation: skip the tb walk
                    ok = ok & (sc(tile_no) < 0)
                g_oks.append(ok)
                g_tiles.append(sc(tile_no))
                g_outls.append(sc(out_len))
                g_cqis.append(sc(cqi))
                g_cris.append(sc(cri))
                g_tbss.append(sc(tb_state) % 3)
                g_ftrs.append(sc(tb_ftr))
                g_f1s.append(sc(fill1))
                g_f2s.append(sc(fill2))

            if "twoscal" in ab:
                # additive: the per-pair scalar extraction block twice
                # (poisoned) — attributes the per-tile cost of pulling 9
                # scalars x GRP pairs out of (GRP,1) columns
                acc = zwi
                for g in range(GRP):
                    def sc2(col, g=g):
                        return jnp.sum(jnp.where(sub1 == g, col + zwi, 0))
                    acc = acc + sc2(tile_no) + sc2(out_len) + sc2(cqi) \
                        + sc2(cri) + sc2(tb_state) + sc2(tb_ftr) \
                        + sc2(fill1) + sc2(fill2) + sc2(tile_err)
                g_tiles[0] = g_tiles[0] + acc * zwi

            def seq_walk(g):
                """One pair's sequential walk (hbm_tb staging capable).
                Returns (q_f, r_f, n_steps)."""
                g_tile_no = g_tiles[g]

                def tb_step(s):
                    # alive-gated so the walk can run WSTEPS per while
                    # iteration (a dead extra step must not advance state
                    # or emit)
                    ftr0_, idx0_, q_i0, r_i0, state0, n0 = s[:6]
                    alive = ftr0_ >= 0
                    ftr, idx, q_i, r_i, state, n = s[:6]
                    ftr_c = jnp.clip(ftr, 0, MARKER)
                    posm = jnp.clip(idx, 0, jnp.int32(2 ** 30)) % W
                    base_c = pl.multiple_of((posm // 128) * 128, 128)
                    if hbm_tb:
                        # staged window: the walk's ftr only decreases, so
                        # a fresh STG_D-diagonal window ending just above
                        # ftr serves ~STG_D-4 steps before the next
                        # (blocking) re-stage
                        sb = s[6]
                        need = alive & ((ftr_c < sb)
                                        | (ftr_c > sb + STG_D - 1))
                        sb_new = jnp.clip(ftr_c - (STG_D - 4), 0, SB_MAX)

                        @pl.when(need)
                        def _():
                            cp = pltpu.make_async_copy(
                                tb.at[pl.ds(
                                    pl.multiple_of(sb_new * TBR, 8),
                                    STG_D * TBR), :],
                                TbStage.at[:, :], tsem.at[2])
                            cp.start()
                            cp.wait()
                        sb = jnp.where(need, sb_new, sb)
                        blk8 = TbStage[
                            pl.ds(pl.multiple_of((ftr_c - sb) * TBR, 8),
                                  TBR),
                            pl.ds(base_c, 128)].astype(jnp.int32)
                    else:
                        blk8 = tb[pl.ds(pl.multiple_of(ftr_c * TBR, 8),
                                        TBR),
                                  pl.ds(base_c, 128)].astype(jnp.int32)
                    blk = blk8[g % TBR:g % TBR + 1, :]
                    tb_value = jnp.sum(
                        jnp.where(ln128 == (posm - base_c), blk, 0))
                    if PACK and g >= 8:
                        # high nibble; the &0x03/&0x04/&0x08 masks in
                        # decode only read bits 0-3, so sign-extension is
                        # inert
                        tb_value = tb_value >> 4
                    dir_, state = decode(tb_value, state)
                    ftr = jnp.where(dir_ == 0, ftr - 2, ftr - 1)
                    idx = jnp.where(dir_ == 2, idx, idx - 1)
                    q_i = jnp.where(dir_ == 2, q_i, q_i - 1)
                    r_i = jnp.where(dir_ == 1, r_i, r_i - 1)
                    # single pass: emit into the scratch row backwards from
                    # its end; the caller rolls the segment into out_ref
                    # once the length is known (saves the counting pass)
                    @pl.when(alive)
                    def _():
                        pos_c = (MAXALN - 1) - n0
                        base = pl.multiple_of((pos_c // 128) * 128, 128)
                        old = TBS[g:g + 1, pl.ds(base, 128)]
                        new = jnp.where(ln128 == (pos_c - base),
                                        dir_.astype(jnp.int8), old)
                        TBS[g:g + 1, pl.ds(base, 128)] = new
                    brk = (g_tile_no == 0) & ((r_i < 0) | (q_i < 0))
                    ftr = jnp.where(brk, jnp.int32(-1), ftr)
                    nxt = (jnp.where(alive, ftr, ftr0_),
                           jnp.where(alive, idx, idx0_),
                           jnp.where(alive, q_i, q_i0),
                           jnp.where(alive, r_i, r_i0),
                           jnp.where(alive, state, state0),
                           jnp.where(alive, n0 + 1, n0))
                    if hbm_tb:
                        nxt = nxt + (sb,)
                    return nxt

                def tb_cond(s):
                    return s[0] >= 0

                def tb_many(s):
                    for _ in range(WSTEPS):
                        s = tb_step(s)
                    return s

                # disabled pairs start at ftr=-1 -> 0 steps
                ftr0 = jnp.where(g_oks[g], g_ftrs[g], jnp.int32(-1))
                tb_init = (ftr0, g_cqis[g], g_cqis[g], g_cris[g],
                           g_tbss[g].astype(jnp.int32), jnp.int32(0))
                if hbm_tb:
                    # out-of-range stage base forces the first stage
                    # (ftr_c <= MARKER < sb)
                    tb_init = tb_init + (jnp.int32(MARKER + STG_D + 1),)
                res = lax.while_loop(tb_cond, tb_many, tb_init)
                n_steps = res[5]
                if "twowalk" in ab:
                    # additive: run the whole walk a second time with a
                    # poisoned (but value-identical) start — re-emits the
                    # same bytes, so outputs stay bit-identical; the
                    # delta is the walk's cost share
                    res2 = lax.while_loop(tb_cond, tb_many,
                                          (ftr0 + zwi,) + tb_init[1:])
                    n_steps = n_steps + res2[5] * zwi
                return res[2], res[3], n_steps

            def comb_walk(poison=None):
                """All GRP pairs walk in ONE lockstep while loop (VMEM tb
                only). Equivalent to GRP seq_walk calls: each pair's
                scalar recurrence is independent and identical; a pair is
                alive contiguously from step 0, so its own step count
                equals the shared counter n on every alive step and the
                emit lane (MAXALN-1 - n) matches seq_walk's; the per-step
                (GRP,128) masked store writes exactly the bytes the
                per-pair (1,128) stores wrote (rows are disjoint).
                Iterations drop from sum(path lengths) to max(path
                lengths) and the loop fixed costs + emit stores amortize
                across the group. Returns [(q_f, r_f, n_steps)] per g."""
                G = GRP
                ftr0 = [jnp.where(g_oks[g], g_ftrs[g], jnp.int32(-1))
                        for g in range(G)]
                if poison is not None:
                    ftr0 = [f + poison for f in ftr0]
                init = ((jnp.int32(0),) + tuple(ftr0)
                        + tuple(g_cqis) + tuple(g_cqis) + tuple(g_cris)
                        + tuple(s.astype(jnp.int32) for s in g_tbss)
                        + tuple(jnp.int32(0) for _ in range(G)))

                def cw_step(s):
                    n = s[0]
                    ftr = list(s[1:1 + G])
                    idx = list(s[1 + G:1 + 2 * G])
                    qi = list(s[1 + 2 * G:1 + 3 * G])
                    ri = list(s[1 + 3 * G:1 + 4 * G])
                    stt = list(s[1 + 4 * G:1 + 5 * G])
                    nst = list(s[1 + 5 * G:1 + 6 * G])
                    dcol = jnp.full((GRP, 1), -1, jnp.int32)
                    for g in range(G):
                        alive = ftr[g] >= 0
                        ftr_c = jnp.clip(ftr[g], 0, MARKER)
                        posm = jnp.clip(idx[g], 0, jnp.int32(2 ** 30)) % W
                        base_c = pl.multiple_of((posm // 128) * 128, 128)
                        blk8 = tb[pl.ds(pl.multiple_of(ftr_c * TBR, 8),
                                        TBR), pl.ds(base_c, 128)]
                        blk = blk8[g % TBR:g % TBR + 1, :] \
                            .astype(jnp.int32)
                        tb_value = jnp.sum(
                            jnp.where(ln128 == (posm - base_c), blk, 0))
                        if PACK and g >= 8:
                            tb_value = tb_value >> 4
                        dir_, nstate = decode(tb_value, stt[g])
                        ftr_n = jnp.where(dir_ == 0, ftr[g] - 2,
                                          ftr[g] - 1)
                        idx_n = jnp.where(dir_ == 2, idx[g], idx[g] - 1)
                        qi_n = jnp.where(dir_ == 2, qi[g], qi[g] - 1)
                        ri_n = jnp.where(dir_ == 1, ri[g], ri[g] - 1)
                        brk = (g_tiles[g] == 0) & \
                            ((ri_n < 0) | (qi_n < 0))
                        ftr_n = jnp.where(brk, jnp.int32(-1), ftr_n)
                        dcol = jnp.where(
                            sub1 == g,
                            jnp.where(alive, dir_, jnp.int32(-1)), dcol)
                        ftr[g] = jnp.where(alive, ftr_n, ftr[g])
                        idx[g] = jnp.where(alive, idx_n, idx[g])
                        qi[g] = jnp.where(alive, qi_n, qi[g])
                        ri[g] = jnp.where(alive, ri_n, ri[g])
                        stt[g] = jnp.where(alive, nstate, stt[g])
                        nst[g] = jnp.where(alive, n + 1, nst[g])
                    # one shared masked emit for the whole group
                    pos_c = (MAXALN - 1) - n
                    base = pl.multiple_of((pos_c // 128) * 128, 128)
                    lng = lax.broadcasted_iota(jnp.int32, (GRP, 128), 1)
                    old = TBS[:, pl.ds(base, 128)]
                    TBS[:, pl.ds(base, 128)] = jnp.where(
                        (lng == (pos_c - base)) & (dcol >= 0),
                        dcol.astype(jnp.int8), old)
                    return ((n + 1,) + tuple(ftr) + tuple(idx)
                            + tuple(qi) + tuple(ri) + tuple(stt)
                            + tuple(nst))

                def cw_cond(s):
                    a = s[1] >= 0
                    for g in range(1, G):
                        a = a | (s[1 + g] >= 0)
                    return a

                def cw_many(s):
                    for _ in range(WSTEPS):
                        s = cw_step(s)
                    return s

                res = lax.while_loop(cw_cond, cw_many, init)
                return [(res[1 + 2 * G + g], res[1 + 3 * G + g],
                         res[1 + 5 * G + g]) for g in range(G)]

            if hbm_tb or "seqwalk" in ab:
                # hbm_tb: the walks share one staging buffer, so pairs
                # must walk one at a time
                walked = [seq_walk(g) for g in range(GRP)]
            else:
                walked = comb_walk()
                if "twowalk" in ab:
                    walked2 = comb_walk(poison=zwi)
                    walked = [(q, r, n + n2 * zwi)
                              for (q, r, n), (_, _, n2)
                              in zip(walked, walked2)]

            emit_cols = []
            for g in range(GRP):
                g_ok = g_oks[g]
                g_tile_no = g_tiles[g]
                g_out_len = g_outls[g]
                g_fill1 = g_f1s[g]
                g_fill2 = g_f2s[g]
                q_f, r_f, n_steps = walked[g]

                rfill = jnp.where(g_tile_no == 0,
                                  jnp.maximum(r_f + 1, 0), 0)
                qfill = jnp.where(g_tile_no == 0,
                                  jnp.maximum(q_f + 1, 0), 0)
                seg_len = n_steps + rfill + qfill
                skip = jnp.where(g_tile_no > 0, 1, 0)
                emit_len = jnp.where(g_ok, seg_len - skip, 0)
                emit_cols.append(emit_len)
                seg_end = g_out_len + seg_len - 1 - skip

                # merge the walked segment + boundary fills into out_ref,
                # CHUNK lanes at a time (never full MAXALN rows — see the
                # CHUNK note above). Scratch pos (MAXALN-1) - n maps to
                # out pos seg_end - n, i.e. out lane p reads scratch lane
                # p + (MAXALN-1-seg_end) — a fixed forward shift, realized
                # per chunk as an aligned window read + small roll.
                @pl.when(g_ok & (jnp.int32(0 if "nomerge" in ab else 1)
                                 != 0))
                def _(seg_end=seg_end, qfill=qfill, n_steps=n_steps,
                      rfill=rfill, emit_len=emit_len, g_out_len=g_out_len,
                      g_fill1=g_fill1, g_fill2=g_fill2, g=g):
                    one8 = jnp.int8(1)
                    two8 = jnp.int8(2)
                    shift = (MAXALN - 1) - seg_end
                    lo = jnp.maximum(g_out_len, seg_end - n_steps + 1)
                    cur0 = g_out_len + emit_len
                    hi = jnp.maximum(seg_end, cur0 + g_fill1 + g_fill2 - 1)

                    def chunk_body(c, _):
                        # clamped restart of the last partial chunk is
                        # idempotent (same masks, same values)
                        c0 = jnp.minimum(c * CHUNK, MAXALN - CHUNK)
                        c0 = pl.multiple_of(c0, 128)
                        ln = lane_c + c0
                        src_start = c0 + shift
                        src_al = jnp.clip((src_start // 128) * 128, 0,
                                          MAXALN - CW)
                        src_al = pl.multiple_of(src_al, 128)
                        wnd = TBS[g:g + 1, pl.ds(src_al, CW)] \
                            .astype(jnp.int32)
                        seg = pltpu.roll(
                            wnd, CW - (src_start - src_al),
                            1)[:, :CHUNK].astype(jnp.int8)
                        old = out_ref[g:g + 1, pl.ds(c0, CHUNK)]
                        v = jnp.where((ln >= lo) & (ln <= seg_end), seg,
                                      old)
                        v = jnp.where((ln >= g_out_len)
                                      & (ln < g_out_len + qfill), one8, v)
                        v = jnp.where((ln >= g_out_len + qfill)
                                      & (ln < g_out_len + qfill + rfill),
                                      two8, v)
                        v = jnp.where((ln >= cur0)
                                      & (ln < cur0 + g_fill1), one8, v)
                        v = jnp.where((ln >= cur0 + g_fill1)
                                      & (ln < cur0 + g_fill1 + g_fill2),
                                      two8, v)
                        out_ref[g:g + 1, pl.ds(c0, CHUNK)] = v
                        return 0

                    lax.fori_loop(g_out_len // CHUNK, hi // CHUNK + 1,
                                  chunk_body, 0)

            emit_vec = jnp.zeros((GRP, 1), jnp.int32)
            for g in range(GRP - 1, -1, -1):
                emit_vec = jnp.where(
                    sub1 == g,
                    jnp.full((GRP, 1), emit_cols[g], jnp.int32), emit_vec)

            cur = jnp.where(active0 & (tile_err == 0),
                            out_len + emit_vec + fill1 + fill2, out_len)
            err_new = jnp.where(active0 & (err == 0), tile_err, err)
            return (reference_idx, query_idx, tile_no + 1, cur,
                    (last_tile | last_tile_new).astype(jnp.int32), err_new,
                    st["cells"], st["diags"])

        def t_cond(tc):
            return jnp.any((tc[4] == 0) & (tc[5] == 0))

        zeros_i = jnp.zeros((GRP, 1), jnp.int32)
        tc0 = (zeros_i, zeros_i, jnp.int32(0), zeros_i,
               jnp.zeros((GRP, 1), jnp.int32), zeros_i, zeros_i, zeros_i)
        tc = lax.while_loop(t_cond, run_tile, tc0)
        out_lens, errs, cells, diags = tc[3], tc[5], tc[6], tc[7]
        ln128 = lax.broadcasted_iota(jnp.int32, (GRP, 128), 1)
        tailv = jnp.where(ln128 == 0, out_lens,
                          jnp.where(ln128 == 1, errs,
                                    jnp.where(ln128 == 2, cells,
                                              jnp.where(ln128 == 3, diags,
                                                        0))))
        tail_ref[:, :] = tailv

    return kernel, MAXALN, W, TOT, P8, OFF


@functools.lru_cache(maxsize=64)
def get_pallas_kernel_g8(padlen: int, flen: int, p: int, marker: int,
                         matrix_bytes: bytes, msize: int, batch: int,
                         debug_k: int = -1, leaf: bool = False,
                         interpret: bool = False, grp: int = GRP,
                         ablate: str = ""):
    """Grouped kernel; batch must be a multiple of grp (grid = batch/grp).
    Returns (fn, MAXALN, OFF, TOT): pack inputs with
    pack_pair_into(..., padlen, flen=OFF) into [batch, P8/8, TOT] buffers.
    fn returns (paths int8 [batch, MAXALN], tail int32 [batch, 128]) with
    [len, err, dp_cells, diagonals] in tail[:, 0:4] — int8 paths keep the
    output block (and the device->host transfer) 4x smaller than the old
    int32-with-embedded-tail rows; cells/diagonals are the exact live-band
    work done, for DP-cells/s efficiency accounting.
    debug_k >= 0 adds a third output dumping that diagonal's rows."""
    assert grp in (8, 16) and batch % grp == 0
    GRP = grp
    matrix = np.frombuffer(matrix_bytes, dtype=np.float32).reshape(msize,
                                                                   msize)
    # above the canonical 2048 bucket a (GRP, P8, TOT) f32 input block no
    # longer fits VMEM (8.8 MB each at 32768); the kernel then keeps the
    # profile blocks in HBM and DMAs anchor windows on demand
    hbm_in = padlen > 2048
    # escalated wide windows: the VMEM tb plan stops at FLEN 1024; wider
    # windows keep the grouped kernel by moving tb to HBM (emit ring +
    # staged traceback — see _make_kernel)
    hbm_tb = flen > 1024
    kernel, MAXALN, W, TOT, P8, OFF = _make_kernel(padlen, flen, p,
                                                       marker, matrix,
                                                       debug_k, leaf,
                                                       hbm_in, grp,
                                                       hbm_tb, ablate)
    # grp == 16 nibble-packs two pairs per tb byte -> 8 rows per diagonal
    TBR = 8 if grp > 8 else grp
    if hbm_tb:
        NFTR8 = _round_up(marker + 1, TB_RING) * TBR
    else:
        NFTR8 = _round_up((marker + 1) * TBR, 8)

    # the hbm_tb off-chip tb store rides as the output at this fixed
    # index (after out/tail and the optional debug dump); binding it by
    # index (not outs[-1]/res[:-1]) makes a future appended output fail
    # loudly instead of silently stealing the tb slot
    tb_out_idx = 2 + (1 if debug_k >= 0 else 0)

    def body(ref_len_a, qry_len_a, ref_num_a, qry_num_a, flen_a, xdrop_a,
             gapchar_a, gapopen_a, gapext_a,
             ref_blk, qry_blk, *rest):
        n_out = 2 + (1 if debug_k >= 0 else 0) + (1 if hbm_tb else 0)
        outs, scratch = rest[:n_out], rest[n_out:]
        out_blk, tail_blk = outs[0], outs[1]
        dbg_blk = outs[2] if debug_k >= 0 else None
        if hbm_tb:
            # Mosaic rejects both ANY and HBM SCRATCH allocations
            # ("Scratch memref allocation only supported for vmem, smem
            # and semaphore_mem"), so the off-chip tb store rides as an
            # extra ANY-space OUTPUT (same pattern as the hbm_in inputs)
            # and is spliced into the kernel's buffer slot here; the
            # caller discards it. Grid steps run sequentially on TPU, so
            # sharing one buffer across pair groups is safe.
            base = (outs[tb_out_idx],) + scratch[:3]
            idx, kw = 3, {}
        else:
            base, idx, kw = scratch[:4], 4, {}
        if hbm_in:
            kw["RefStg"], kw["QryStg"], kw["dsem"] = scratch[idx:idx + 3]
            idx += 3
        if hbm_tb:
            kw["TbRing"], kw["TbStage"], kw["tsem"] = scratch[idx:idx + 3]
            idx += 3
        kernel(ref_len_a, qry_len_a, ref_num_a, qry_num_a, flen_a,
               xdrop_a, gapchar_a, gapopen_a, gapext_a,
               ref_blk, qry_blk, out_blk, tail_blk, *base,
               dbg_ref=dbg_blk, **kw)

    out_specs = [pl.BlockSpec((GRP, MAXALN), lambda i, *_: (i, 0)),
                 pl.BlockSpec((GRP, 128), lambda i, *_: (i, 0))]
    out_shape = [jax.ShapeDtypeStruct((batch, MAXALN), jnp.int8),
                 jax.ShapeDtypeStruct((batch, 128), jnp.int32)]
    if debug_k >= 0:
        out_specs.append(pl.BlockSpec((8 * GRP, flen),
                                      lambda i, *_: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((8 * GRP, flen), jnp.float32))
    if hbm_tb:
        assert len(out_specs) == tb_out_idx, \
            "hbm_tb tb store must sit at tb_out_idx — appending outputs " \
            "after it requires updating tb_out_idx"
        out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        out_shape.append(jax.ShapeDtypeStruct((NFTR8, W), jnp.int8))

    WSTG = W + 128
    if hbm_in:
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY)]
    else:
        in_specs = [
            pl.BlockSpec((GRP, 1, TOT) if leaf else (GRP, P8, TOT),
                         lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((GRP, 1, TOT) if leaf else (GRP, P8, TOT),
                         lambda i, *_: (i, 0, 0)),
        ]
    # DP/convergence wavefront rows are loop-carried vectors (see
    # _make_kernel) — the only VMEM scratch left is the traceback store
    # and the circular profile windows.
    scratch_shapes = [
        # hbm_tb: the off-chip tb store is NOT a scratch — it arrives as
        # an extra ANY-space output (see out_specs above); real Mosaic
        # rejects ANY/HBM scratch allocations even though interpret mode
        # accepted them.
        *([] if hbm_tb else [pltpu.VMEM((NFTR8, W), jnp.int8)]),
        (pltpu.VMEM((GRP, W), jnp.int32) if leaf else
         pltpu.VMEM((P8 * GRP, W), jnp.float32)),  # RefW (+gap rows)
        (pltpu.VMEM((GRP, W), jnp.int32) if leaf else
         pltpu.VMEM((P8 * GRP, W), jnp.float32)),  # QryW (+gap rows)
        pltpu.VMEM((GRP, MAXALN), jnp.int8),       # TBS traceback emit
    ]
    if hbm_in:
        stg_shape = (GRP, WSTG) if leaf else (GRP * P8, WSTG)
        stg_dtype = jnp.int8 if leaf else jnp.float32
        scratch_shapes += [
            pltpu.VMEM(stg_shape, stg_dtype),      # RefStg anchor window
            pltpu.VMEM(stg_shape, stg_dtype),      # QryStg anchor window
            pltpu.SemaphoreType.DMA((2 * GRP,)),
        ]
    if hbm_tb:
        scratch_shapes += [
            pltpu.VMEM((2 * TB_RING * TBR, W), jnp.int8),  # TbRing
            pltpu.VMEM((TB_STG * TBR, W), jnp.int8),       # TbStage
            pltpu.SemaphoreType.DMA((3,)),  # 0/1 ring slabs, 2 stage
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(batch // GRP,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    fn = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )

    # Hosts ship COMPACT [batch, rows, PADLEN] blocks (ref right-aligned at
    # PADLEN, qry left-aligned at 0); the OFF margins the kernel's anchored
    # window reads rely on are all-padding and are added here ON DEVICE by
    # a static jnp.pad. This cuts host->device transfer ~2.3x (the margins
    # were ~56% of the old [batch, rows, TOT] buffers) — the dominant cost
    # of a launch when the chip sits behind a slow link.
    pad_val = (p - 2) if leaf else 0  # ambiguity code / zero frequency

    def padded(*args):
        ref_c, qry_c = args[9], args[10]
        spec = ((0, 0), (0, 0), (OFF, TOT - OFF - padlen))
        ref_blk = jnp.pad(ref_c, spec, constant_values=pad_val)
        qry_blk = jnp.pad(qry_c, spec, constant_values=pad_val)
        res = fn(*args[:9], ref_blk, qry_blk)
        # hbm_tb rides the off-chip tb store as the output at tb_out_idx;
        # the caller must never see it
        if hbm_tb:
            res = res[:tb_out_idx] + res[tb_out_idx + 1:]
        return res

    return jax.jit(padded), MAXALN, 0, padlen
