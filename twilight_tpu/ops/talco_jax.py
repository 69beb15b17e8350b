"""TALCO-XDrop profile-profile alignment — batched JAX device kernel.

TPU-first redesign of the reference DP (/root/reference/src/TALCO-XDrop.cpp,
cuda/device-function.cu): one jitted program runs a BATCH of pair alignments
(vmapped), each as a tiled anti-diagonal wavefront held entirely on device —
band buffers as [FLEN]-lane vectors (VPU), the whole multi-tile loop and the
sequential traceback inside `lax.while_loop`, one host↔device round trip per
launch (the CUDA kernel's shape, reference alignment-gpu.cu:182-450).

Float32 operation order matches the NumPy oracle (ops/talco_np.py), which
matches the reference binary — identical alignment paths on identical inputs
(exact on IEEE backends; validated against the oracle in tests).

Layout per pair (prepared host-side, see pack_pair):
  qry_pad     [FLEN + PADLEN + FLEN, P] f32   query profile, zero-padded
  ref_rev_pad [FLEN + PADLEN + FLEN, P] f32   REVERSED reference profile
  gap arrays  [FLEN + PADLEN + FLEN] f32 × 4  (ref-side ones reversed too)
so every anti-diagonal's cell inputs are contiguous dynamic slices — no
gathers for profiles on the hot path.

Error codes: 0 ok, 1 x-drop band collapse, 2 band exceeded fLen, 3 index
error, 4 boundary-sentinel convergence (host falls back to the oracle).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .fastmath import exact_div32
from jax import lax

I_BOUNDARY = -2
D_BOUNDARY = -3
I_BOUNDARY_LOW16 = I_BOUNDARY & 0xFFFF
D_BOUNDARY_LOW16 = D_BOUNDARY & 0xFFFF


def _similarity(ref_rows, qry_rows, matrix, gap_char, denominator, p):
    """Per-lane expected substitution score; identical f32 op order to
    talco_np.similarity_scores (reference TALCO-XDrop.cpp:377-433)."""
    n = ref_rows.shape[0]
    num = jnp.zeros(n, dtype=jnp.float32)
    if p == 6:
        for l in range(5):
            tmp = (qry_rows[:, :5] * matrix[l, :5]) * ref_rows[:, l:l + 1]
            s = tmp[:, 0]
            for m in range(1, 5):
                s = s + tmp[:, m]
            num = num + s
        for l in range(5):
            num = num + (ref_rows[:, l] * qry_rows[:, 5]) * gap_char
        for m in range(5):
            num = num + (ref_rows[:, 5] * qry_rows[:, m]) * gap_char
    else:
        for l in range(21):
            sumvec = (qry_rows[:, 0:8] * matrix[l, 0:8]) * ref_rows[:, l:l + 1]
            sumvec = sumvec + (qry_rows[:, 8:16] * matrix[l, 8:16]) * ref_rows[:, l:l + 1]
            for m in range(16, 21):
                num = num + (ref_rows[:, l] * qry_rows[:, m]) * matrix[l, m]
            s = sumvec[:, 0]
            for j in range(1, 8):
                s = s + sumvec[:, j]
            num = num + s
        for l in range(21):
            num = num + (ref_rows[:, l] * qry_rows[:, 21]) * gap_char
        for m in range(21):
            num = num + (ref_rows[:, 21] * qry_rows[:, m]) * gap_char
    return exact_div32(num, denominator)


def _reduction(c_row, start, length, lane):
    """Reduction_tree over [start, start+length] inclusive; -1 if unequal.
    length < 0 → c_row[start] (reference TALCO-XDrop.cpp:110-119)."""
    flen = c_row.shape[0]
    start_c = jnp.clip(start, 0, flen - 1)
    first = c_row[start_c]
    in_seg = (lane >= start) & (lane <= start + length)
    all_eq = jnp.all(jnp.where(in_seg, c_row == first, True))
    conv = jnp.where(all_eq, first, jnp.int32(-1))
    return jnp.where(length < 0, first, conv)


def _make_pair_fn(PADLEN: int, FLEN: int, P: int, MARKER: int,
                  matrix: np.ndarray):
    """Build the single-pair alignment function for a static shape config.

    Args of the returned fn (all jnp, per pair):
      ref_rev_pad [TOT, P], qry_pad [TOT, P],
      gor_rev, goq, ger_rev, geq [TOT],
      ref_len, qry_len i32, ref_num, qry_num f32,
      flen_param, xdrop i32, gap_char, gap_open, gap_extend f32
    Returns (out_buf [MAXALN] i8, out_len i32, err i32).
    """
    SEG_MAX = 2 * MARKER + 8
    MAXALN = 2 * PADLEN + 8
    mat = jnp.asarray(matrix, dtype=jnp.float32)
    lane = jnp.arange(FLEN, dtype=jnp.int32)
    lane_seg = jnp.arange(SEG_MAX, dtype=jnp.int32)
    lane_out = jnp.arange(MAXALN, dtype=jnp.int32)

    def align_pair(ref_rev_pad, qry_pad, gor_rev, goq, ger_rev, geq,
                   ref_len, qry_len, ref_num, qry_num, flen_param, xdrop,
                   gap_char, gap_open, gap_extend):
        denominator = ref_num * qry_num
        go_ends = gap_open      # alnType == 0: regular penalties at ends
        ge_ends = gap_extend
        xdrop_f = xdrop.astype(jnp.float32)
        inf = jnp.float32(2.0) * xdrop_f + jnp.float32(1.0)
        neg_inf = -inf

        def tile_fn(carry):
            (ref_idx, qry_idx, tile_no, out_buf, out_len, last_tile,
             err) = carry
            ref_rem = ref_len - ref_idx
            qry_rem = qry_len - qry_idx
            dflen = jnp.minimum(flen_param, jnp.minimum(ref_rem, qry_rem))
            dmax = jnp.maximum(dflen - 1, 0)
            cell_count = ref_rem + qry_rem - 1

            S0 = jnp.full((3, FLEN), jnp.float32(-1.0))
            I0 = jnp.full((2, FLEN), jnp.float32(-1.0))
            D0 = jnp.full((2, FLEN), jnp.float32(-1.0))
            CS0 = jnp.full((3, FLEN), -1, dtype=jnp.int32)
            CI0 = jnp.full((2, FLEN), I_BOUNDARY, dtype=jnp.int32)
            CD0 = jnp.full((2, FLEN), D_BOUNDARY, dtype=jnp.int32)
            L0 = jnp.array([0, 1, 2], dtype=jnp.int32)
            U0 = jnp.array([0, -1, -2], dtype=jnp.int32)
            tb0 = jnp.zeros((MARKER + 1, FLEN), dtype=jnp.int8)
            flen0 = jnp.zeros(MARKER + 1, dtype=jnp.int32)
            flow0 = jnp.zeros(MARKER + 1, dtype=jnp.int32)

            def k_cond(st):
                return jnp.logical_not(st["done"]) & (st["k"] < cell_count)

            def k_body(st):
                """One anti-diagonal. Band-death/overflow (the reference's
                pre-checks) only raise flags here: an erroring tile's whole
                state is discarded by the host, so running the step's writes
                anyway is safe and avoids a vmapped cond (which would
                select-copy every buffer per iteration)."""
                k = st["k"]
                L, U = st["L"], st["U"]
                k3, k3p1, k3p2 = k % 3, (k + 1) % 3, (k + 2) % 3
                k2, k2p1 = k % 2, (k + 1) % 2
                Lk, Uk = L[k3], U[k3]
                count = Uk - Lk + 1
                band_dead = Lk >= Uk + 1
                band_over = count > dflen
                abort = band_dead | band_over
                abort_err = jnp.where(band_dead, 1, 2)
                store_ftr = k <= MARKER
                k_ftr = jnp.clip(k, 0, MARKER)

                ftr_len = st["ftr_len"].at[k_ftr].set(
                    jnp.where(store_ftr, count, st["ftr_len"][k_ftr]))
                ftr_low = st["ftr_low"].at[k_ftr].set(
                    jnp.where(store_ftr, Lk, st["ftr_low"][k_ftr]))

                i_arr = Lk + lane
                lprime = jnp.maximum(0, k - ref_rem + 1)
                jmax = jnp.minimum(k, ref_rem - 1)
                j_arr = jmax - (i_arr - lprime)
                live = lane < count

                c_diag = Lk - L[k3p1] - 1
                c_up = Lk - L[k3p2]
                offset_diag = lane + c_diag
                offset_up = lane + c_up
                offset_left = lane + c_up - 1

                # shifted reads of previous-diagonal rows: the offsets are
                # affine in the lane, so a padded dynamic_slice replaces a
                # (slow) gather; pads carry each buffer's init value so
                # out-of-window reads look never-written
                def shift(row, c, fill):
                    padded = jnp.concatenate([
                        jnp.full(FLEN, fill, row.dtype), row,
                        jnp.full(FLEN, fill, row.dtype)])
                    return lax.dynamic_slice(padded, (FLEN + c,), (FLEN,))

                rev_start = FLEN + PADLEN - 1 - (ref_idx + jmax + lprime - Lk)
                ref_rows = lax.dynamic_slice(ref_rev_pad, (rev_start, 0),
                                             (FLEN, P))
                qry_start = FLEN + qry_idx + Lk
                qry_rows = lax.dynamic_slice(qry_pad, (qry_start, 0), (FLEN, P))
                pos_go_ref = lax.dynamic_slice(gor_rev, (rev_start,), (FLEN,))
                pos_ge_ref = lax.dynamic_slice(ger_rev, (rev_start,), (FLEN,))
                pos_go_qry = lax.dynamic_slice(goq, (qry_start,), (FLEN,))
                pos_ge_qry = lax.dynamic_slice(geq, (qry_start,), (FLEN,))

                diag_valid = (offset_diag >= 0) & \
                    (offset_diag <= U[k3p1] - L[k3p1])
                border = (tile_no == 0) & ((i_arr == 0) | (j_arr == 0))
                compute_sim = (k == 0) | diag_valid | border

                sim = _similarity(ref_rows, qry_rows, mat, gap_char,
                                  denominator, P)
                steps = jnp.maximum(
                    0, jnp.maximum(ref_idx + j_arr, qry_idx + i_arr) - 1
                ).astype(jnp.float32)
                border_val = sim + go_ends + ge_ends * steps
                origin = (i_arr == 0) & (j_arr == 0)
                border_val = jnp.where(origin, sim, border_val)
                S, I, D = st["S"], st["I"], st["D"]
                s_diag = shift(S[k3p1], c_diag, jnp.float32(-1.0))
                s_up = shift(S[k3p2], c_up, jnp.float32(-1.0))
                s_left = shift(S[k3p2], c_up - 1, jnp.float32(-1.0))
                d_up = shift(D[k2p1], c_up, jnp.float32(-1.0))
                i_left = shift(I[k2p1], c_up - 1, jnp.float32(-1.0))

                with_diag = s_diag + sim
                m_val = jnp.where(border, border_val,
                                  jnp.where(offset_diag < 0, sim, with_diag))
                match = jnp.where(compute_sim, m_val, neg_inf)

                up_valid = (offset_up >= 0) & (offset_up <= U[k3p2] - L[k3p2])
                left_valid = (offset_left >= 0) & \
                    (offset_left <= U[k3p2] - L[k3p2])

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
                                jnp.where(i_gt_d, 1, 2)).astype(jnp.int8)

                killed = s_val < (st["max_score"] - xdrop_f)
                s_val = jnp.where(killed, neg_inf, s_val)

                mx = jnp.max(jnp.where(live, s_val, neg_inf))
                max_score_prime = jnp.where(st["msp"] < mx, mx, st["msp"])

                I = I.at[k2].set(jnp.where(live, i_val, I[k2]))
                D = D.at[k2].set(jnp.where(live, d_val, D[k2]))
                S = S.at[k3].set(jnp.where(live, s_val, S[k3]))

                CS, CI, CD = st["CS"], st["CI"], st["CD"]
                i_low = (i_arr & 0xFFFF).astype(jnp.int32)
                ci_left = shift(CI[k2p1], c_up - 1, jnp.int32(I_BOUNDARY))
                cs_left = shift(CS[k3p2], c_up - 1, jnp.int32(-1))
                cd_up = shift(CD[k2p1], c_up, jnp.int32(D_BOUNDARY))
                cs_up = shift(CS[k3p2], c_up, jnp.int32(-1))
                cs_diag = shift(CS[k3p1], c_diag, jnp.int32(-1))
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

                cs_row = jnp.where(
                    k == MARKER - 1, (3 << 16) | i_low,
                    jnp.where(k == MARKER, i_low,
                              jnp.where(k >= MARKER + 1, cs_new, CS[k3])))
                ci_row = jnp.where(k == MARKER, (1 << 16) | i_low,
                                   jnp.where(k >= MARKER + 1, ci_new, CI[k2]))
                cd_row = jnp.where(k == MARKER, (2 << 16) | i_low,
                                   jnp.where(k >= MARKER + 1, cd_new, CD[k2]))
                CS = CS.at[k3].set(jnp.where(live, cs_row, CS[k3]))
                CI = CI.at[k2].set(jnp.where(live, ci_row, CI[k2]))
                CD = CD.at[k2].set(jnp.where(live, cd_row, CD[k2]))

                ptr = ptr | (iptr.astype(jnp.int8) << 2) | \
                    (dptr.astype(jnp.int8) << 3)
                tb = st["tb"].at[k_ftr].set(
                    jnp.where(store_ftr & live, ptr, st["tb"][k_ftr]))

                alive = live & (s_val > neg_inf)
                any_alive = jnp.any(alive)
                first_alive = jnp.argmax(alive).astype(jnp.int32)
                last_alive = jnp.int32(FLEN - 1) - \
                    jnp.argmax(alive[::-1]).astype(jnp.int32)
                new_l = jnp.where(any_alive, Lk + first_alive, Uk + 1)
                new_u = jnp.where(any_alive, Lk + last_alive, Lk - 1)

                do_conv = jnp.logical_not(st["converged"]) & \
                    (k < ref_rem + qry_rem - 2)
                conv_i = _reduction(CI[k2], new_l - Lk, new_u - new_l, lane)
                conv_d = _reduction(CD[k2], new_l - Lk, new_u - new_l, lane)
                conv_s = _reduction(CS[k3], new_l - Lk, new_u - new_l, lane)
                conv_hit = do_conv & (conv_i == conv_d) & (conv_i == conv_s) \
                    & (st["prev_conv_s"] == conv_s) & (conv_i != -1)
                conv_value = jnp.where(conv_hit, st["prev_conv_s"],
                                       st["conv_value"])
                conv_score = jnp.where(conv_hit, max_score_prime,
                                       st["conv_score"])
                converged = st["converged"] | conv_hit
                prev_conv_s = jnp.where(do_conv, conv_s, st["prev_conv_s"])

                v2 = k + 2 - ref_rem
                L = L.at[k3p1].set(jnp.maximum(new_l, jnp.maximum(0, v2)))
                U = U.at[k3p1].set(jnp.minimum(qry_rem - 1, new_u + 1))

                max_score = jnp.where(max_score_prime < 0, jnp.float32(0.0),
                                      max_score_prime)
                stop = converged & (max_score > conv_score)
                return dict(k=k + 1, L=L, U=U, S=S, I=I, D=D, CS=CS, CI=CI,
                            CD=CD, tb=tb, ftr_len=ftr_len, ftr_low=ftr_low,
                            last_k=jnp.where(abort, st["last_k"], k),
                            prev_conv_s=prev_conv_s,
                            converged=converged, conv_value=conv_value,
                            conv_score=conv_score, max_score=max_score,
                            msp=max_score_prime,
                            kerr=jnp.where(abort, abort_err, st["kerr"]),
                            stopped=stop & jnp.logical_not(abort),
                            done=abort | stop)

            st0 = dict(
                k=jnp.int32(0), L=L0, U=U0, S=S0, I=I0, D=D0, CS=CS0,
                CI=CI0, CD=CD0, tb=tb0, ftr_len=flen0, ftr_low=flow0,
                last_k=jnp.int32(0), prev_conv_s=jnp.int32(-1),
                converged=jnp.bool_(False), conv_value=jnp.int32(0),
                conv_score=jnp.float32(0.0), max_score=jnp.float32(0.0),
                msp=neg_inf, kerr=jnp.int32(0), stopped=jnp.bool_(False),
                done=jnp.bool_(False))
            st = lax.while_loop(k_cond, k_body, st0)

            tile_err = st["kerr"]
            last_k = st["last_k"]
            CS = st["CS"]
            tb = st["tb"]
            ftr_len = st["ftr_len"]
            ftr_low = st["ftr_low"]
            n_ftr = jnp.minimum(last_k, MARKER) + 1
            conv_logic = st["stopped"]

            cs0 = CS[last_k % 3][0]
            cqi_conv = st["conv_value"] & 0xFFFF
            tbs_conv = (st["conv_value"] >> 16) & 0xFFFF
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

            # sequential traceback into a scratch segment
            def tb_cond(s):
                return s[0] >= 0

            def tb_body(s):
                ftr, idx, q_i, r_i, state, n, seg = s
                ftr_c = jnp.clip(ftr, 0, MARKER)
                off = jnp.clip(idx - ftr_low[ftr_c], 0, FLEN - 1)
                tb_value = tb[ftr_c, off].astype(jnp.int32)
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
                seg = seg.at[jnp.clip(n, 0, SEG_MAX - 1)].set(
                    dir_.astype(jnp.int8))
                n = n + 1
                brk = (tile_no == 0) & ((r_i < 0) | (q_i < 0))
                ftr = jnp.where(brk, jnp.int32(-1), ftr)
                return (ftr, idx, q_i, r_i, state, n, seg)

            seg0 = jnp.zeros(SEG_MAX, dtype=jnp.int8)
            tb_init = (tb_ftr.astype(jnp.int32), cqi.astype(jnp.int32),
                       cqi.astype(jnp.int32), cri.astype(jnp.int32),
                       (tb_state % 3).astype(jnp.int32), jnp.int32(0), seg0)
            _, _, q_f, r_f, _, n_steps, seg = lax.while_loop(
                tb_cond, tb_body, tb_init)

            rfill = jnp.where(tile_no == 0, jnp.maximum(r_f + 1, 0), 0)
            qfill = jnp.where(tile_no == 0, jnp.maximum(q_f + 1, 0), 0)
            seg = jnp.where((lane_seg >= n_steps)
                            & (lane_seg < n_steps + rfill), jnp.int8(2), seg)
            seg = jnp.where((lane_seg >= n_steps + rfill)
                            & (lane_seg < n_steps + rfill + qfill),
                            jnp.int8(1), seg)
            seg_len = n_steps + rfill + qfill

            skip = jnp.where(tile_no > 0, 1, 0)
            emit_len = seg_len - skip
            src = jnp.clip(seg_len - 1 - skip - (lane_out - out_len),
                           0, SEG_MAX - 1)
            in_rng = (lane_out >= out_len) & (lane_out < out_len + emit_len)
            out_buf = jnp.where(in_rng, seg[src], out_buf)
            cur = out_len + emit_len
            out_buf = jnp.where((lane_out >= cur) & (lane_out < cur + fill1),
                                jnp.int8(1), out_buf)
            cur = cur + fill1
            out_buf = jnp.where((lane_out >= cur) & (lane_out < cur + fill2),
                                jnp.int8(2), out_buf)
            cur = cur + fill2

            # on error: report; output is discarded by the host
            return (reference_idx, query_idx, tile_no + 1, out_buf, cur,
                    last_tile_new, tile_err)

        def cond(c):
            last_tile, err = c[-2], c[-1]
            return jnp.logical_not(last_tile) & (err == 0)

        carry0 = (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                  jnp.zeros(MAXALN, dtype=jnp.int8), jnp.int32(0),
                  jnp.bool_(False), jnp.int32(0))
        carry = lax.while_loop(cond, tile_fn, carry0)
        _, _, _, out_buf, out_len, _, err = carry
        return out_buf, out_len, err

    return align_pair


@functools.lru_cache(maxsize=64)
def get_batch_kernel(padlen: int, flen: int, p: int, marker: int,
                     matrix_bytes: bytes, msize: int):
    """Jitted vmapped batch kernel for one static shape configuration."""
    matrix = np.frombuffer(matrix_bytes, dtype=np.float32).reshape(msize, msize)
    pair_fn = _make_pair_fn(padlen, flen, p, marker, matrix)
    batched = jax.vmap(
        pair_fn,
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None))
    return jax.jit(batched)


def pack_pair(freq_ref: np.ndarray, freq_qry: np.ndarray,
              gap_op: Tuple[np.ndarray, np.ndarray],
              gap_ex: Tuple[np.ndarray, np.ndarray],
              padlen: int, flen: int) -> Tuple[np.ndarray, ...]:
    """Host-side packing: pad + reverse so the kernel's reads are slices."""
    p = freq_ref.shape[1]
    tot = flen + padlen + flen
    ref_rev = np.zeros((tot, p), dtype=np.float32)
    qry = np.zeros((tot, p), dtype=np.float32)
    rl, ql = freq_ref.shape[0], freq_qry.shape[0]
    ref_rev[flen + padlen - rl:flen + padlen] = freq_ref[::-1]
    qry[flen:flen + ql] = freq_qry
    gor = np.zeros(tot, dtype=np.float32)
    ger = np.zeros(tot, dtype=np.float32)
    goq = np.zeros(tot, dtype=np.float32)
    geq = np.zeros(tot, dtype=np.float32)
    gor[flen + padlen - rl:flen + padlen] = gap_op[0][::-1]
    ger[flen + padlen - rl:flen + padlen] = gap_ex[0][::-1]
    goq[flen:flen + ql] = gap_op[1]
    geq[flen:flen + ql] = gap_ex[1]
    return ref_rev, qry, gor, goq, ger, geq
