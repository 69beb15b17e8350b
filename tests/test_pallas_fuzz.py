"""Executable form of the CLAUDE.md invariant: fuzz the grouped Pallas
kernel (freq + leaf paths) against the NumPy oracle after any change.

The fast suite runs a small interpret-mode sample (Pallas lowered to jax
ops on CPU — same kernel code, bit-identical semantics). The on-device
run needs the real TPU, which the conftest's CPU pin hides from in-process
tests, so it shells out and is gated behind TWILIGHT_RUN_TPU=1.
"""
import os
import subprocess
import sys

import pytest

from conftest import REPO

FUZZ = os.path.join(REPO, "tools", "fuzz_g8.py")


@pytest.mark.slow
def test_g8_parity_interpret():
    r = subprocess.run(
        [sys.executable, FUZZ, "--n", "8", "--interpret"],
        cwd=REPO, capture_output=True, timeout=900)
    assert r.returncode == 0, r.stderr.decode()[-2000:]


@pytest.mark.skipif(not os.environ.get("TWILIGHT_RUN_TPU"),
                    reason="needs real TPU; set TWILIGHT_RUN_TPU=1")
def test_g8_parity_on_device():
    r = subprocess.run(
        [sys.executable, FUZZ, "--n", "32"],
        cwd=REPO, capture_output=True, timeout=1200)
    assert r.returncode == 0, r.stderr.decode()[-2000:]


@pytest.mark.slow
def test_g8_wide_window_parity_interpret():
    """hbm_tb variant (escalated windows, FLEN > 1024: tb in HBM behind
    an emit ring + staged traceback) — bit-identical to the oracle,
    including marker-crossing convergence (--marker 64 makes short
    interpret cases span many tiles)."""
    r = subprocess.run(
        [sys.executable, FUZZ, "--n", "8", "--interpret", "--wide",
         "--marker", "64", "--paths", "nt"],
        cwd=REPO, capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
