"""bin/twilight-tpu front-door launcher: route selection + byte parity.

The launcher skips the axon PJRT plugin (a ~3 s interpreter-startup tax
from sitecustomize) for runs that cannot use a device — explicit
--backend native/numpy, or --backend auto jobs that cli._small_workload
would route host-only — and execs the CLI unchanged otherwise. Output
bytes must be identical on both routes.
"""
import hashlib
import os
import subprocess
import sys

import pytest

from conftest import REPO

LAUNCHER = os.path.join(REPO, "bin", "twilight-tpu")
P16_MD5 = "8174145594cfcd5404008e233e10ea30"


def _run(args, **kw):
    env = dict(os.environ)
    env.pop("TWILIGHT_HOST_ONLY", None)
    return subprocess.run(args, cwd=REPO, capture_output=True, env=env,
                          timeout=300, **kw)


@pytest.mark.skipif(not os.access(LAUNCHER, os.X_OK),
                    reason="launcher missing")
def test_launcher_auto_small_byte_parity(tmp_path):
    out = tmp_path / "p16.aln"
    r = _run([LAUNCHER, "-t", "tests/data/prot_16.nwk",
              "-i", "tests/data/prot_16.fa", "-o", str(out), "--type", "p"])
    assert r.returncode == 0, r.stderr.decode()[-800:]
    # the plugin-free route must keep the auto path's stderr line
    assert b"small workload" in r.stderr
    assert hashlib.md5(out.read_bytes()).hexdigest() == P16_MD5


@pytest.mark.skipif(not os.access(LAUNCHER, os.X_OK),
                    reason="launcher missing")
def test_launcher_native_byte_parity(tmp_path):
    out = tmp_path / "p16n.aln"
    r = _run([LAUNCHER, "--backend", "native", "-t", "tests/data/prot_16.nwk",
              "-i", "tests/data/prot_16.fa", "-o", str(out), "--type", "p"])
    assert r.returncode == 0, r.stderr.decode()[-800:]
    assert hashlib.md5(out.read_bytes()).hexdigest() == P16_MD5


def test_fastpath_probe_decisions():
    from twilight_tpu import fastpath
    # explicit host backends -> 0 (strip the plugin)
    assert fastpath.main(["--backend", "native", "-t", "x.nwk", "-i", "x.fa",
                          "-o", "/tmp/x.aln"]) == 0
    # device-forcing backends -> 1 (keep the plugin)
    assert fastpath.main(["--backend", "tpu", "-t", "x.nwk", "-i", "x.fa",
                          "-o", "/tmp/x.aln"]) == 1
    # auto + a small real input -> 0
    assert fastpath.main(["-t", os.path.join(REPO, "tests/data/prot_16.nwk"),
                          "-i", os.path.join(REPO, "tests/data/prot_16.fa"),
                          "-o", "/tmp/x.aln", "--type", "p",
                          "--overwrite"]) == 0
    # broken argv -> 1 (the real CLI reports the error)
    assert fastpath.main(["-o", "/tmp/x.aln"]) == 1
