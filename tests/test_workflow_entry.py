"""The workflow driver must be invocable as `python -m
twilight_tpu.workflow.iterative` (round 5: the module had no __main__
guard, so the -m form exited 0 silently doing nothing)."""
import subprocess
import sys


def test_python_m_invocation_runs_main():
    r = subprocess.run(
        [sys.executable, "-m", "twilight_tpu.workflow.iterative",
         "--help"], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    assert "twilight-tpu-workflow" in r.stdout


def test_python_m_invocation_requires_args():
    # without -i/-o argparse must error (exit 2), NOT silently exit 0
    r = subprocess.run(
        [sys.executable, "-m", "twilight_tpu.workflow.iterative"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 2
    assert "required" in r.stderr
