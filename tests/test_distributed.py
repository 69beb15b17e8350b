"""Multi-host subtree dispatch (parallel/distributed.py).

The reference runs divide-and-conquer subtrees serially in one process
(twilight-main.cpp:139-176); here they are balanced across hosts and merged
by host 0 from the shared checkpoint files. Hosts are simulated as
sequential CLI invocations over one temp dir — the assignment is
deterministic, so this exercises exactly the code each real host would run.
"""
import os
import socket
import subprocess
import sys

from twilight_tpu import cli
from twilight_tpu.parallel.distributed import assign_subtrees

from conftest import DATASET, GOLDEN


def test_assignment_balanced_and_deterministic():
    sizes = [("a", 100), ("b", 90), ("c", 50), ("d", 40), ("e", 10)]
    g1 = assign_subtrees(sizes, 2)
    g2 = assign_subtrees(list(reversed(sizes)), 2)
    assert g1 == g2
    loads = [sum(dict(sizes)[n] for n in grp) for grp in g1]
    assert abs(loads[0] - loads[1]) <= 40
    assert sorted(n for grp in g1 for n in grp) == list("abcde")


def test_two_host_run_matches_golden(tmp_path):
    temp = str(tmp_path / "shared")
    base = ["-t", os.path.join(DATASET, "RNASim.nwk"),
            "-i", os.path.join(DATASET, "RNASim.fa"),
            "-m", "200", "-d", temp, "-k", "--hosts", "2",
            "--backend", "native", "--overwrite"]
    out1 = str(tmp_path / "h1.aln")
    assert cli.main(base + ["-o", out1, "--host-id", "1"]) == 0
    assert not os.path.exists(out1)  # only host 0 writes the final MSA
    out0 = str(tmp_path / "h0.aln")
    assert cli.main(base + ["-o", out0, "--host-id", "0"]) == 0
    with open(out0, "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.m200.aln"), "rb") as f2:
        assert f1.read() == f2.read()


def test_two_process_jax_distributed(tmp_path):
    """Real two-process run: gloo CPU collectives, subtree-root states
    exchanged via all-gather (no checkpoint-file polling on the merge
    path), host 0 writes the final MSA — byte-identical to the golden."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    temp = str(tmp_path / "shared")
    runner = os.path.join(os.path.dirname(__file__), "dist_runner.py")
    outs = [str(tmp_path / f"h{i}.aln") for i in range(2)]
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    procs = [subprocess.Popen(
        [sys.executable, runner, port, str(i), outs[i], temp],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"host {i} failed:\n{logs[i]}"
    assert not os.path.exists(outs[1])  # only host 0 writes the final MSA
    with open(outs[0], "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.m200.aln"), "rb") as f2:
        assert f1.read() == f2.read()


def test_two_process_with_device_mesh(tmp_path):
    """Two gloo processes, each running the SHARDED device batcher on its
    own 4-device CPU mesh with stealing off (subtree dispatch x sharded
    grouped kernel x collective root-state exchange — the composition a
    real pod run hits). Host 0's output must equal a single-process
    NumPy-oracle run byte-for-byte."""
    prefix = str(tmp_path / "mini")
    r = subprocess.run(
        [sys.executable, "-m", "twilight_tpu.tools.simulate",
         "-n", "32", "-l", "120", "--seed", "7", "-o", prefix],
        capture_output=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr.decode()[-400:]

    oracle = str(tmp_path / "oracle.aln")
    rc = cli.main(["-t", prefix + ".nwk", "-i", prefix + ".fa",
                   "-m", "10", "-d", str(tmp_path / "otmp"),
                   "--backend", "numpy", "-o", oracle])
    assert rc == 0

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    temp = str(tmp_path / "shared")
    runner = os.path.join(os.path.dirname(__file__), "dist_runner.py")
    outs = [str(tmp_path / f"h{i}.aln") for i in range(2)]
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    procs = [subprocess.Popen(
        [sys.executable, runner, port, str(i), outs[i], temp,
         prefix + ".fa", prefix + ".nwk", "10", "cpu", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"host {i} failed:\n{logs[i][-2000:]}"
    assert not os.path.exists(outs[1])
    with open(outs[0], "rb") as f1, open(oracle, "rb") as f2:
        assert f1.read() == f2.read()


def test_collective_state_roundtrip_single_process():
    """exchange_subtree_states_collective serializes ragged per-subtree
    states through one padded uint8 all-gather; with a single process the
    gather is an identity, so this pins the (de)serialization."""
    import numpy as np

    from twilight_tpu.parallel.distributed import (
        exchange_subtree_states_collective)

    local = {
        3: dict(msa_freq=np.arange(12, dtype=np.float32).reshape(2, 6),
                aln_len=2, aln_num=5, aln_weight=1.25),
        17: dict(msa_freq=np.zeros((4, 6), np.float32),
                 aln_len=4, aln_num=1, aln_weight=0.5),
    }
    out = exchange_subtree_states_collective(local)
    assert set(out) == {3, 17}
    for sid, st in local.items():
        np.testing.assert_array_equal(out[sid]["msa_freq"], st["msa_freq"])
        assert int(out[sid]["aln_len"]) == st["aln_len"]
        assert int(out[sid]["aln_num"]) == st["aln_num"]
        assert float(out[sid]["aln_weight"]) == st["aln_weight"]
