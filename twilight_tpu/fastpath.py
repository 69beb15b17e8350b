"""Front-door launch probe (used by bin/twilight-tpu).

The axon PJRT plugin registers itself from sitecustomize at interpreter
startup and drags in jax — a ~3 s per-process tax paid before main()
even runs, whether or not the run ever touches a device. The launcher
script runs this probe in a plugin-free interpreter; exit code 0 means
"this argv cannot use a device under its own rules", in which case the
launcher execs the real CLI plugin-free too (and pins the decision via
TWILIGHT_HOST_ONLY=1 so a borderline re-estimate in the main process
cannot try to initialize a device that was never registered).

Deliberately read-only: options_from_args() creates temp dirs and echoes
config, so the probe rebuilds just the fields cli._small_workload needs
(same rules, cli.py:241-313). Any parse error exits 1 — the real CLI
then produces the user-facing error with the normal environment.
"""
from __future__ import annotations

import sys


def main(argv=None) -> int:
    try:
        import os
        from . import cli
        from .config import Options, Params, detect_mode, detect_type
        args = cli.build_parser().parse_args(argv)
        backend = args.backend
        if backend in ("native", "numpy"):
            return 0
        if args.devices == 0 or args.cpu_only:
            return 0          # --devices 0 = host only (gpu-info.cu:21)
        if backend != "auto":
            return 1          # tpu/cpu force the device: keep the plugin
        opt = Options()
        opt.aln_mode = detect_mode(bool(args.tree), bool(args.sequences),
                                   bool(args.files), bool(args.alignment))
        opt.seq_file = args.sequences or ""
        opt.msa_dir = args.files or ""
        opt.device_backend = backend
        opt.cpu_num = max(0, args.cpu or 0)
        if args.type:
            opt.type = args.type
        else:
            seq_file = opt.seq_file
            if opt.msa_dir:
                entries = sorted(os.listdir(opt.msa_dir))
                seq_file = (os.path.join(opt.msa_dir, entries[0])
                            if entries else "")
            opt.type = detect_type(seq_file) if seq_file else "n"
        param = Params.make(
            opt.type, match=args.match, mismatch=args.mismatch,
            transition=args.transition, gap_open=args.gap_open,
            gap_extend=args.gap_extend, gap_ends=args.gap_ends,
            xdrop_scale=args.xdrop, blosum=args.blosum,
            wildcard=args.wildcard, matrix_file=args.matrix)
        return 0 if (cli._single_core_host()
                     or cli._small_workload(opt, param)) else 1
    except Exception:
        return 1


if __name__ == "__main__":
    sys.exit(main())
