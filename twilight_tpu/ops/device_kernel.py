"""Host adapter for the batched JAX TALCO kernel.

Plays the role of the reference's GPU batch manager
(/root/reference/src/cuda/alignment-gpu.cu:182-450): buckets a level's pairs
by padded length, packs profiles, launches the vmapped device kernel, and
applies the band/x-drop retry ladder per pair; pairs the device can't handle
(band beyond the static buffer, sentinel convergence) return None and fall
back to the exact NumPy oracle on the host.
"""
from __future__ import annotations

import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import Options, Params


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class DeviceTalco:
    def __init__(self, option: Options, param: Params):
        import os
        import jax  # deferred so numpy-only runs never touch jax
        cache_dir = os.path.expanduser("~/.cache/twilight_tpu_jax")
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception:
            pass
        self._jax = jax
        self.option = option
        self.param = param
        backend = option.device_backend
        if backend in ("cpu", "tpu"):
            self.device = jax.devices(backend)[0]
        else:
            self.device = jax.devices()[0]
        self.marker = 1 << 10
        self.base_flen = 1 << 12
        self.max_static_flen = 1 << 15
        self.p = 6 if option.type == "n" else 22
        self.matrix_bytes = param.scoring_matrix.astype(np.float32).tobytes()
        self.msize = param.matrix_size

    def _kernel(self, padlen: int, flen: int):
        from . import talco_jax
        return talco_jax.get_batch_kernel(padlen, flen, self.p, self.marker,
                                          self.matrix_bytes, self.msize)

    def __call__(self, prepared, metas, database, option, param
                 ) -> List[Optional[np.ndarray]]:
        from . import talco_jax
        task = database.current_task
        n = len(prepared)
        results: List[Optional[np.ndarray]] = [None] * n

        # per-pair ladder state
        flen_param = [self.base_flen] * n
        xdrop = [int(1000 * -1 * param.gap_extend)] * n

        # pairs eligible for the device: nonzero lens (zero-length handled
        # host-side) — everything else goes through the batched kernel
        pending: List[int] = []
        for i, prep in enumerate(prepared):
            lens = prep[4]
            if lens[0] > 0 and lens[1] > 0:
                pending.append(i)

        max_rounds = 20
        rounds = 0
        while pending and rounds < max_rounds:
            rounds += 1
            # bucket by (padlen, static flen)
            buckets: Dict[Tuple[int, int], List[int]] = {}
            deferred: List[int] = []
            for i in pending:
                lens = prepared[i][4]
                padlen = max(_next_pow2(max(lens)), 512)
                dflen_needed = min(flen_param[i], min(lens))
                # one FLEN per padlen bucket (≤4096) to limit compilations;
                # larger bands (ladder growth on long pairs) get pow2 sizes
                if padlen <= 4096:
                    static_flen = padlen
                else:
                    static_flen = max(4096, _next_pow2(dflen_needed))
                static_flen = min(static_flen, self.max_static_flen)
                if dflen_needed > static_flen:
                    results[i] = None  # oracle fallback
                    continue
                buckets.setdefault((padlen, static_flen), []).append(i)
            pending = []

            for (padlen, static_flen), idxs in buckets.items():
                kern = self._kernel(padlen, static_flen)
                bs = max(1, self.option.pair_batch)
                for lo in range(0, len(idxs), bs):
                    chunk = idxs[lo:lo + bs]
                    args = self._pack_batch(chunk, prepared, metas, task,
                                            padlen, static_flen,
                                            flen_param, xdrop)
                    with self._jax.default_device(self.device):
                        out_buf, out_len, err = kern(*args)
                    out_buf = np.asarray(out_buf)
                    out_len = np.asarray(out_len)
                    err = np.asarray(err)
                    for bi, i in enumerate(chunk):
                        e = int(err[bi])
                        if e == 0:
                            ln = int(out_len[bi])
                            results[i] = out_buf[bi, :ln].astype(np.int8)
                        elif task == 0 or e in (3, 4):
                            # task 0: first error → defer (host fallback
                            # path reproduces it); 3/4: oracle decides
                            results[i] = None
                        else:
                            lens = prepared[i][4]
                            if e == 2:
                                flen_param[i] = min(
                                    int(flen_param[i] * 1.2) << 1, min(lens))
                            elif e == 1:
                                xdrop[i] = int(xdrop[i] * 2)
                                flen_param[i] = min(
                                    int(xdrop[i] * 4) << 1, min(lens))
                            pending.append(i)
        for i in pending:
            results[i] = None
        return results

    def _pack_batch(self, chunk, prepared, metas, task, padlen, static_flen,
                    flen_param, xdrop):
        from . import talco_jax
        b = len(chunk)
        tot = static_flen + padlen + static_flen
        ref_rev = np.zeros((b, tot, self.p), dtype=np.float32)
        qry = np.zeros((b, tot, self.p), dtype=np.float32)
        gor = np.zeros((b, tot), dtype=np.float32)
        goq = np.zeros((b, tot), dtype=np.float32)
        ger = np.zeros((b, tot), dtype=np.float32)
        geq = np.zeros((b, tot), dtype=np.float32)
        ref_len = np.zeros(b, dtype=np.int32)
        qry_len = np.zeros(b, dtype=np.int32)
        ref_num = np.zeros(b, dtype=np.float32)
        qry_num = np.zeros(b, dtype=np.float32)
        flen_arr = np.zeros(b, dtype=np.int32)
        xdrop_arr = np.zeros(b, dtype=np.int32)
        gap_char = np.zeros(b, dtype=np.float32)
        for bi, i in enumerate(chunk):
            freq_ref, freq_qry, _, _, lens, gap_op, gap_ex = prepared[i]
            rnum, qnum = metas[i][2], metas[i][3]
            (ref_rev[bi], qry[bi], gor[bi], goq[bi], ger[bi], geq[bi]) = \
                talco_jax.pack_pair(freq_ref[:lens[0]], freq_qry[:lens[1]],
                                    gap_op, gap_ex, padlen, static_flen)
            ref_len[bi] = lens[0]
            qry_len[bi] = lens[1]
            ref_num[bi] = np.float32(rnum)
            qry_num[bi] = np.float32(qnum)
            flen_arr[bi] = flen_param[i]
            xdrop_arr[bi] = xdrop[i]
            zero_gc = (task in (1, 2) or rnum > 10000 or qnum > 10000)
            gap_char[bi] = np.float32(0.0 if zero_gc
                                      else self.param.gap_extend)
        import jax.numpy as jnp
        return (ref_rev, qry, gor, goq, ger, geq, ref_len, qry_len,
                ref_num, qry_num, flen_arr, xdrop_arr, gap_char,
                jnp.float32(self.param.gap_open),
                jnp.float32(self.param.gap_extend))


def make_device_kernel(option: Options, param: Params):
    if option.device_backend == "numpy":
        return None
    return DeviceTalco(option, param)
