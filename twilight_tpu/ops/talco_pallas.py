"""TALCO-XDrop profile-profile alignment — Pallas TPU kernel.

The hot DP from ops/talco_jax.py rebuilt as a hand-written TPU kernel: one
grid program per alignment pair, the whole multi-tile anti-diagonal wavefront
(X-drop band, convergence markers, position-specific affine gaps, 4-bit
traceback, sequential on-device traceback walk) running out of VMEM with
zero per-op dispatch overhead. This is the reference CUDA kernel's shape
(/root/reference/src/cuda/device-function.cu: one block per pair, whole tile
loop on device) mapped to the TPU's VPU:

 - band buffers are [8, 3*FLEN] VMEM scratch with FLEN guard pads holding
   each buffer's init value, so the previous diagonal's shifted reads are
   single dynamic lane-slices (no gathers);
 - profiles arrive transposed/reversed/padded ([P, TOT] with positions on
   lanes) so each diagonal's inputs are contiguous slices;
 - the scoring matrix is baked in as immediates; the similarity sum replays
   the reference's SIMD summation order exactly (TALCO-XDrop.cpp:377-433)
   for bit-identical f32 paths;
 - per-pair scalars ride in scalar-prefetch arrays;
 - traceback walks twice: once to size the segment, once writing path codes
   straight into the output row (reversed), so no gather is needed.

Semantics and outputs match ops/talco_jax.py (validated in tests). Error
codes: 0 ok, 1 band collapse, 2 band exceeded fLen, 3 index error,
4 boundary-sentinel convergence (host falls back to the oracle), 6 live band
exceeded the static FLEN window (host escalates to a wider kernel).
"""
from __future__ import annotations

import functools
from typing import Tuple

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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel(PADLEN: int, FLEN: int, P: int, MARKER: int,
                 matrix: np.ndarray):
    W = 3 * FLEN + 256          # guard pads + aligned-window slack
    TOT = FLEN + PADLEN + FLEN + 128
    MAXALN = _round_up(2 * PADLEN + 2 * MARKER + 64, 128)
    NFTR = _round_up(MARKER + 1, 32)
    P8 = _round_up(P, 8)
    mat = [[float(matrix[i, j]) for j in range(matrix.shape[1])]
           for i in range(matrix.shape[0])]

    def similarity(ref_rows, qry_rows, gap_char, denominator):
        num = jnp.zeros((1, FLEN), dtype=jnp.float32)
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
        return exact_div32(num, denominator)

    def kernel(ref_len_a, qry_len_a, ref_num_a, qry_num_a, flen_a, xdrop_a,
               gapchar_a, gapopen_a, gapext_a,
               ref_ref, qry_ref,
               out_ref,
               S, Ib, Db, CS, CI, CD, tb, ftrlen, ftrlow):
        lane = lax.broadcasted_iota(jnp.int32, (1, FLEN), 1)
        lane_out = lax.broadcasted_iota(jnp.int32, (1, MAXALN), 1)
        pid = pl.program_id(0)
        ref_len = ref_len_a[pid]
        qry_len = qry_len_a[pid]
        ref_num = ref_num_a[pid]
        qry_num = qry_num_a[pid]
        flen_param = flen_a[pid]
        xdrop = xdrop_a[pid]
        gap_char = gapchar_a[pid]
        gap_open = gapopen_a[pid]
        gap_extend = gapext_a[pid]

        denominator = ref_num * qry_num
        xdrop_f = xdrop.astype(jnp.float32)
        inf = jnp.float32(2.0) * xdrop_f + jnp.float32(1.0)
        neg_inf = -inf

        WND = FLEN + 128

        def _select(which, items):
            out = items[-1]
            for r in range(len(items) - 2, -1, -1):
                out = jnp.where(which == r, items[r], out)
            return out

        def band_read(buf, which, nrows, c):
            """buf[which, FLEN+c : 2*FLEN+c]: static sublane slices
            (Mosaic forbids dynamic sublane starts) + 128-aligned dynamic
            lane window + a small rotate for the remainder."""
            start = FLEN + c
            start_al = pl.multiple_of((start // 128) * 128, 128)
            r = start - start_al
            wnds = [buf[i:i + 1, pl.ds(start_al, WND)] for i in range(nrows)]
            wnd = _select(which, wnds)
            return pltpu.roll(wnd, WND - r, 1)[:, :FLEN]

        def cur_read(buf, which, nrows):
            """Live window [FLEN, 2*FLEN) of row `which` (static slices)."""
            return _select(which,
                           [buf[i:i + 1, FLEN:2 * FLEN] for i in range(nrows)])

        def store_row(buf, which, nrows, val):
            for r in range(nrows):
                @pl.when(which == r)
                def _(val=val, r=r):
                    buf[r:r + 1, FLEN:2 * FLEN] = val

        def run_tile(tc):
            (ref_idx, qry_idx, tile_no, out_len, last_tile, err) = tc
            ref_rem = ref_len - ref_idx
            qry_rem = qry_len - qry_idx
            dflen = jnp.minimum(flen_param, jnp.minimum(ref_rem, qry_rem))
            cell_count = ref_rem + qry_rem - 1

            S[...] = jnp.full((8, W), -1.0, dtype=jnp.float32)
            Ib[...] = jnp.full((8, W), -1.0, dtype=jnp.float32)
            Db[...] = jnp.full((8, W), -1.0, dtype=jnp.float32)
            CS[...] = jnp.full((8, W), -1, dtype=jnp.int32)
            CI[...] = jnp.full((8, W), I_BOUNDARY, dtype=jnp.int32)
            CD[...] = jnp.full((8, W), D_BOUNDARY, dtype=jnp.int32)

            def k_cond(st):
                return jnp.logical_not(st[-1]) & (st[0] < cell_count)

            def k_body(st):
                (k, L0, L1, L2, U0, U1, U2, last_k, prev_conv_s, converged,
                 conv_value, conv_score, max_score, msp, kerr, stopped,
                 done) = st
                k3 = k % 3
                k3p1 = (k + 1) % 3
                k3p2 = (k + 2) % 3
                k2 = k % 2
                k2p1 = (k + 1) % 2

                def sel3(a0, a1, a2, which):
                    return jnp.where(which == 0, a0,
                                     jnp.where(which == 1, a1, a2))

                Lk = sel3(L0, L1, L2, k3)
                Uk = sel3(U0, U1, U2, k3)
                Lp1 = sel3(L0, L1, L2, k3p1)
                Up1 = sel3(U0, U1, U2, k3p1)
                Lp2 = sel3(L0, L1, L2, k3p2)
                Up2 = sel3(U0, U1, U2, k3p2)
                count = Uk - Lk + 1

                band_dead = Lk >= Uk + 1
                band_over = count > dflen
                # static-window overflow: not a reference error — the host
                # escalates this pair to a wider-FLEN kernel (code 6)
                band_hw = count > FLEN
                abort = band_dead | band_over | band_hw
                abort_err = jnp.where(band_dead, 1,
                                      jnp.where(band_over, 2, 6))

                store_ftr = k <= MARKER
                k_ftr = jnp.minimum(k, MARKER)

                @pl.when(store_ftr)
                def _():
                    ftrlen[k_ftr] = count
                    ftrlow[k_ftr] = Lk

                i_arr = Lk + lane
                lprime = jnp.maximum(0, k - ref_rem + 1)
                jmax = jnp.minimum(k, ref_rem - 1)
                j_arr = jmax - (i_arr - lprime)
                live = lane < count

                c_diag = Lk - Lp1 - 1
                c_up = Lk - Lp2
                offset_diag = lane + c_diag
                offset_up = lane + c_up
                offset_left = offset_up - 1

                # jmax + lprime == k always, so the slice starts are affine
                rev_start = FLEN + PADLEN - 1 - ref_idx - k + Lk
                qry_start = FLEN + qry_idx + Lk

                def prof(buf, v, start):
                    start_al = pl.multiple_of((start // 128) * 128, 128)
                    r = start - start_al
                    wnd = buf[v:v + 1, pl.ds(start_al, WND)]
                    return pltpu.roll(wnd, WND - r, 1)[:, :FLEN]

                ref_rows = [prof(ref_ref, v, rev_start) for v in range(P)]
                qry_rows = [prof(qry_ref, v, qry_start) for v in range(P)]
                pos_go_ref = prof(ref_ref, P8 - 2, rev_start)
                pos_ge_ref = prof(ref_ref, P8 - 1, rev_start)
                pos_go_qry = prof(qry_ref, P8 - 2, qry_start)
                pos_ge_qry = prof(qry_ref, P8 - 1, qry_start)

                diag_valid = (offset_diag >= 0) & (offset_diag <= Up1 - Lp1)
                border = (tile_no == 0) & ((i_arr == 0) | (j_arr == 0))
                compute_sim = (k == 0) | diag_valid | border

                sim = similarity(ref_rows, qry_rows, gap_char, denominator)
                steps = jnp.maximum(
                    0, jnp.maximum(ref_idx + j_arr, qry_idx + i_arr) - 1
                ).astype(jnp.float32)
                border_val = sim + gap_open + gap_extend * steps
                origin = (i_arr == 0) & (j_arr == 0)
                border_val = jnp.where(origin, sim, border_val)

                s_diag = band_read(S, k3p1, 3, c_diag)
                s_up = band_read(S, k3p2, 3, c_up)
                s_left = band_read(S, k3p2, 3, c_up - 1)
                d_up = band_read(Db, k2p1, 2, c_up)
                i_left = band_read(Ib, k2p1, 2, c_up - 1)

                with_diag = s_diag + sim
                m_val = jnp.where(border, border_val,
                                  jnp.where(offset_diag < 0, sim, with_diag))
                match = jnp.where(compute_sim, m_val, neg_inf)

                up_valid = (offset_up >= 0) & (offset_up <= Up2 - Lp2)
                left_valid = (offset_left >= 0) & (offset_left <= Up2 - Lp2)

                del_op = jnp.where(up_valid, s_up + pos_go_ref, neg_inf)
                del_ext = jnp.where(up_valid, d_up + pos_ge_ref, neg_inf)
                ins_op = jnp.where(left_valid, s_left + pos_go_qry, neg_inf)
                ins_ext = jnp.where(left_valid, i_left + pos_ge_qry, neg_inf)

                iptr = ins_ext >= ins_op
                dptr = del_ext >= del_op
                i_val = jnp.where(iptr, ins_ext, ins_op)
                d_val = jnp.where(dptr, del_ext, del_op)

                m_ge_i = match >= i_val
                m_ge_d = match >= d_val
                i_gt_d = i_val > d_val
                s_val = jnp.where(m_ge_i, jnp.where(m_ge_d, match, d_val),
                                  jnp.where(i_gt_d, i_val, d_val))
                ptr = jnp.where(m_ge_i, jnp.where(m_ge_d, 0, 2),
                                jnp.where(i_gt_d, 1, 2))

                killed = s_val < (max_score - xdrop_f)
                s_val = jnp.where(killed, neg_inf, s_val)

                mx = jnp.max(jnp.where(live, s_val, neg_inf))
                msp_new = jnp.where(msp < mx, mx, msp)

                i_cur = cur_read(Ib, k2, 2)
                d_cur = cur_read(Db, k2, 2)
                s_cur = cur_read(S, k3, 3)
                store_row(Ib, k2, 2, jnp.where(live, i_val, i_cur))
                store_row(Db, k2, 2, jnp.where(live, d_val, d_cur))
                store_row(S, k3, 3, jnp.where(live, s_val, s_cur))

                i_low = i_arr & 0xFFFF
                ci_left = band_read(CI, k2p1, 2, c_up - 1)
                cs_left = band_read(CS, k3p2, 3, c_up - 1)
                cd_up = band_read(CD, k2p1, 2, c_up)
                cs_up = band_read(CS, k3p2, 3, c_up)
                cs_diag = band_read(CS, k3p1, 3, c_diag)
                ci_prop = jnp.where(offset_left >= 0, ci_left, I_BOUNDARY)
                ci_open = jnp.where((offset_left >= 0) & (cs_left != -1),
                                    cs_left, I_BOUNDARY)
                ci_new = jnp.where(iptr, ci_prop, ci_open)
                cd_prop = jnp.where(offset_up >= 0, cd_up, D_BOUNDARY)
                cd_open = jnp.where((offset_up >= 0) & (cs_up != -1),
                                    cs_up, D_BOUNDARY)
                cd_new = jnp.where(dptr, cd_prop, cd_open)
                cs_new = jnp.where(ptr == 0, cs_diag,
                                   jnp.where(ptr == 1, ci_new, cd_new))

                cs_cur = cur_read(CS, k3, 3)
                ci_cur = cur_read(CI, k2, 2)
                cd_cur = cur_read(CD, k2, 2)
                cs_row = jnp.where(
                    k == MARKER - 1, (3 << 16) | i_low,
                    jnp.where(k == MARKER, i_low,
                              jnp.where(k >= MARKER + 1, cs_new, cs_cur)))
                ci_row = jnp.where(k == MARKER, (1 << 16) | i_low,
                                   jnp.where(k >= MARKER + 1, ci_new, ci_cur))
                cd_row = jnp.where(k == MARKER, (2 << 16) | i_low,
                                   jnp.where(k >= MARKER + 1, cd_new, cd_cur))
                store_row(CS, k3, 3, jnp.where(live, cs_row, cs_cur))
                store_row(CI, k2, 2, jnp.where(live, ci_row, ci_cur))
                store_row(CD, k2, 2, jnp.where(live, cd_row, cd_cur))

                ptr = ptr | (iptr.astype(jnp.int32) << 2) | \
                    (dptr.astype(jnp.int32) << 3)

                # tb row write: 8-aligned sublane RMW block (positions beyond
                # the live count hold garbage; traceback never reads them)
                @pl.when(store_ftr)
                def _():
                    base = pl.multiple_of((k_ftr // 8) * 8, 8)
                    blk = tb[pl.ds(base, 8), :].astype(jnp.int32)
                    sub = lax.broadcasted_iota(jnp.int32, (8, FLEN), 0)
                    sel = sub == (k_ftr - base)
                    tb[pl.ds(base, 8), :] = jnp.where(
                        sel, ptr, blk).astype(jnp.int8)

                alive = live & (s_val > neg_inf)
                any_alive = jnp.any(alive)
                first_alive = jnp.min(jnp.where(alive, lane, FLEN))
                last_alive = jnp.max(jnp.where(alive, lane, -1))
                new_l = jnp.where(any_alive, Lk + first_alive, Uk + 1)
                new_u = jnp.where(any_alive, Lk + last_alive, Lk - 1)

                def reduction(row, start, length):
                    start_c = jnp.clip(start, 0, FLEN - 1)
                    # single-lane extract without dynamic_slice-on-array
                    first = jnp.sum(jnp.where(lane == start_c, row, 0))
                    in_seg = (lane >= start) & (lane <= start + length)
                    all_eq = jnp.all(jnp.logical_not(in_seg) | (row == first))
                    conv = jnp.where(all_eq, first, jnp.int32(-1))
                    return jnp.where(length < 0, first, conv)

                do_conv = jnp.logical_not(converged) & \
                    (k < ref_rem + qry_rem - 2)
                ci_upd = cur_read(CI, k2, 2)
                cd_upd = cur_read(CD, k2, 2)
                cs_upd = cur_read(CS, k3, 3)
                conv_i = reduction(ci_upd, new_l - Lk, new_u - new_l)
                conv_d = reduction(cd_upd, new_l - Lk, new_u - new_l)
                conv_s = reduction(cs_upd, new_l - Lk, new_u - new_l)
                conv_hit = do_conv & (conv_i == conv_d) & (conv_i == conv_s) \
                    & (prev_conv_s == conv_s) & (conv_i != -1)
                conv_value = jnp.where(conv_hit, prev_conv_s, conv_value)
                conv_score = jnp.where(conv_hit, msp_new, conv_score)
                converged = converged | conv_hit
                prev_conv_s = jnp.where(do_conv, conv_s, prev_conv_s)

                v2 = k + 2 - ref_rem
                nl = jnp.maximum(new_l, jnp.maximum(0, v2))
                nu = jnp.minimum(qry_rem - 1, new_u + 1)
                L0n = jnp.where(k3p1 == 0, nl, L0)
                L1n = jnp.where(k3p1 == 1, nl, L1)
                L2n = jnp.where(k3p1 == 2, nl, L2)
                U0n = jnp.where(k3p1 == 0, nu, U0)
                U1n = jnp.where(k3p1 == 1, nu, U1)
                U2n = jnp.where(k3p1 == 2, nu, U2)

                max_score_new = jnp.where(msp_new < 0, jnp.float32(0.0),
                                          msp_new)
                stop = converged & (max_score_new > conv_score) & \
                    jnp.logical_not(abort)
                return (k + 1, L0n, L1n, L2n, U0n, U1n, U2n,
                        jnp.where(abort, last_k, k), prev_conv_s, converged,
                        conv_value, conv_score, max_score_new, msp_new,
                        jnp.where(abort, abort_err, kerr), stop,
                        abort | stop)

            st0 = (jnp.int32(0), jnp.int32(0), jnp.int32(1), jnp.int32(2),
                   jnp.int32(0), jnp.int32(-1), jnp.int32(-2),
                   jnp.int32(0), jnp.int32(-1), jnp.bool_(False),
                   jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
                   neg_inf, jnp.int32(0), jnp.bool_(False), jnp.bool_(False))
            st = lax.while_loop(k_cond, k_body, st0)
            (_, L0, L1, L2, U0, U1, U2, last_k, prev_conv_s, converged,
             conv_value, conv_score, max_score, msp, kerr, stopped,
             done) = st

            tile_err = kerr
            n_ftr = jnp.minimum(last_k, MARKER) + 1
            conv_logic = stopped

            lk3 = last_k % 3
            cs0 = cur_read(CS, lk3, 3)[0, 0]
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
                               jnp.where(tb_state == 3, n_ftr - 2, n_ftr - 1))
            last_tile_new = use_full

            sentinel = (cqi == D_BOUNDARY_LOW16) | (cqi == I_BOUNDARY_LOW16)
            tile_err = jnp.where((tile_err == 0) & sentinel, 4, tile_err)

            reference_idx = ref_idx + cri
            query_idx = qry_idx + cqi
            bad_idx = ((ref_len - reference_idx) < 0) | \
                ((qry_len - query_idx) < 0)
            tile_err = jnp.where((tile_err == 0) & bad_idx, 3, tile_err)

            at_ref_end = reference_idx == ref_len - 1
            at_qry_end = query_idx == qry_len - 1
            fill1 = jnp.where(at_ref_end & jnp.logical_not(at_qry_end),
                              qry_len - query_idx - 1, 0)
            fill2 = jnp.where(at_qry_end & jnp.logical_not(at_ref_end),
                              ref_len - reference_idx - 1, 0)
            last_tile_new = last_tile_new | at_ref_end | at_qry_end

            # --- traceback: pass 1 counts, pass 2 writes reversed ---------
            def tb_step(s, write, seg_end):
                ftr, idx, q_i, r_i, state, n = s
                ftr_c = jnp.clip(ftr, 0, MARKER)
                off = jnp.clip(idx - ftrlow[ftr_c], 0, FLEN - 1)
                # aligned (8, 128) block read + masked extract
                base_r = pl.multiple_of((ftr_c // 8) * 8, 8)
                base_c = pl.multiple_of((off // 128) * 128, 128)
                blk = tb[pl.ds(base_r, 8),
                         pl.ds(base_c, 128)].astype(jnp.int32)
                sub8 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                ln128 = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                hit = (sub8 == (ftr_c - base_r)) & (ln128 == (off - base_c))
                tb_value = jnp.sum(jnp.where(hit, blk, 0))
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
                state = jnp.where(state == 0, next0,
                                  jnp.where(state == 1, next1, next2))
                ftr = jnp.where(dir_ == 0, ftr - 2, ftr - 1)
                idx = jnp.where(dir_ == 2, idx, idx - 1)
                q_i = jnp.where(dir_ == 2, q_i, q_i - 1)
                r_i = jnp.where(dir_ == 1, r_i, r_i - 1)
                if write:
                    pos = seg_end - n

                    @pl.when(pos >= out_len)
                    def _():
                        # aligned 128-lane RMW scalar store
                        pos_c = jnp.clip(pos, 0, MAXALN - 1)
                        base = pl.multiple_of((pos_c // 128) * 128, 128)
                        ln = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                        old = out_ref[:, pl.ds(base, 128)]
                        new = jnp.where(ln == (pos_c - base), dir_, old)
                        out_ref[:, pl.ds(base, 128)] = new
                n = n + 1
                brk = (tile_no == 0) & ((r_i < 0) | (q_i < 0))
                ftr = jnp.where(brk, jnp.int32(-1), ftr)
                return (ftr, idx, q_i, r_i, state, n)

            def tb_cond(s):
                return s[0] >= 0

            tb_init = (tb_ftr, cqi, cqi, cri,
                       (tb_state % 3).astype(jnp.int32), jnp.int32(0))
            _, _, q_f, r_f, _, n_steps = lax.while_loop(
                tb_cond, lambda s: tb_step(s, False, 0), tb_init)

            rfill = jnp.where(tile_no == 0, jnp.maximum(r_f + 1, 0), 0)
            qfill = jnp.where(tile_no == 0, jnp.maximum(q_f + 1, 0), 0)
            seg_len = n_steps + rfill + qfill
            skip = jnp.where(tile_no > 0, 1, 0)
            emit_len = seg_len - skip
            # forward layout: [qfill 1s][rfill 2s][tb steps reversed]
            # tb step t lands at out_len + (seg_len-1-skip) - t
            seg_end = out_len + seg_len - 1 - skip
            _ = lax.while_loop(tb_cond,
                               lambda s: tb_step(s, True, seg_end), tb_init)

            any_emit = (qfill > 0) | (rfill > 0) | (fill1 > 0) | (fill2 > 0)

            @pl.when(any_emit)
            def _():
                old = out_ref[:, :]
                v = jnp.where((lane_out >= out_len)
                              & (lane_out < out_len + qfill), 1, old)
                v = jnp.where((lane_out >= out_len + qfill)
                              & (lane_out < out_len + qfill + rfill), 2, v)
                cur0 = out_len + emit_len
                v = jnp.where((lane_out >= cur0)
                              & (lane_out < cur0 + fill1), 1, v)
                v = jnp.where((lane_out >= cur0 + fill1)
                              & (lane_out < cur0 + fill1 + fill2), 2, v)
                out_ref[:, :] = v

            cur = out_len + emit_len + fill1 + fill2
            err_new = jnp.where(err == 0, tile_err, err)
            return (reference_idx, query_idx, tile_no + 1, cur,
                    last_tile_new, err_new)

        def t_cond(tc):
            return jnp.logical_not(tc[-2]) & (tc[-1] == 0)

        tc0 = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
               jnp.bool_(False), jnp.int32(0))
        tc = lax.while_loop(t_cond, run_tile, tc0)
        # out_len and err ride in the last aligned block of the output row
        ln128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        tailv = jnp.where(ln128 == 0, tc[3], jnp.where(ln128 == 1, tc[5], 0))
        out_ref[:, MAXALN - 128:] = tailv

    return kernel, MAXALN, NFTR, W, TOT, P8


@functools.lru_cache(maxsize=64)
def get_pallas_kernel(padlen: int, flen: int, p: int, marker: int,
                      matrix_bytes: bytes, msize: int, batch: int,
                      interpret: bool = False):
    matrix = np.frombuffer(matrix_bytes, dtype=np.float32).reshape(msize,
                                                                   msize)
    kernel, MAXALN, NFTR, W, TOT, P8 = _make_kernel(padlen, flen, p, marker,
                                                    matrix)

    def body(ref_len_a, qry_len_a, ref_num_a, qry_num_a, flen_a, xdrop_a,
             gapchar_a, gapopen_a, gapext_a,
             ref_blk, qry_blk, out_blk,
             S, Ib, Db, CS, CI, CD, tb, ftrlen, ftrlow):
        kernel(ref_len_a, qry_len_a, ref_num_a, qry_num_a, flen_a, xdrop_a,
               gapchar_a, gapopen_a, gapext_a,
               ref_blk.at[0], qry_blk.at[0],
               out_blk.at[0],
               S, Ib, Db, CS, CI, CD, tb, ftrlen, ftrlow)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, P8, TOT), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, P8, TOT), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, MAXALN), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, W), jnp.float32),
            pltpu.VMEM((8, W), jnp.float32),
            pltpu.VMEM((8, W), jnp.float32),
            pltpu.VMEM((8, W), jnp.int32),
            pltpu.VMEM((8, W), jnp.int32),
            pltpu.VMEM((8, W), jnp.int32),
            pltpu.VMEM((NFTR, flen), jnp.int8),
            pltpu.SMEM((NFTR,), jnp.int32),
            pltpu.SMEM((NFTR,), jnp.int32),
        ],
    )

    fn = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, 1, MAXALN), jnp.int32),
        ],
        interpret=interpret,
    )
    return jax.jit(fn), MAXALN


def pack_pair_into(ref_rev: np.ndarray, qry: np.ndarray,
                   freq_ref: np.ndarray, freq_qry: np.ndarray,
                   gap_op, gap_ex, padlen: int, flen: int) -> None:
    """In-place packing of one pair's transposed reversed/padded profiles
    into preallocated [P8, TOT] batch rows. The position-specific gap
    open/extend arrays ride in the two spare rows P8-2/P8-1 of the same
    arrays (profiles use only P of the 8-aligned P8 rows), saving a third
    HBM operand and its transfer."""
    p = freq_ref.shape[1]
    p8 = ref_rev.shape[0]
    rl, ql = freq_ref.shape[0], freq_qry.shape[0]
    ref_rev[:p, flen + padlen - rl:flen + padlen] = freq_ref[::-1].T
    qry[:p, flen:flen + ql] = freq_qry.T
    ref_rev[p8 - 2, flen + padlen - rl:flen + padlen] = gap_op[0][::-1]
    ref_rev[p8 - 1, flen + padlen - rl:flen + padlen] = gap_ex[0][::-1]
    qry[p8 - 2, flen:flen + ql] = gap_op[1]
    qry[p8 - 1, flen:flen + ql] = gap_ex[1]


