"""Checkpoint/resume of divide-and-conquer subtree state (--resume).

The reference's temp files are only a de-facto restart point (SURVEY §5);
here each finished subtree persists its merge-phase state and --resume
skips it, producing byte-identical output.
"""
import os

from twilight_tpu import cli

from conftest import DATASET, GOLDEN


def test_resume_skips_finished_subtrees(tmp_path, capfd):
    out1 = str(tmp_path / "a.aln")
    temp = str(tmp_path / "ck")
    args = ["-t", os.path.join(DATASET, "RNASim.nwk"),
            "-i", os.path.join(DATASET, "RNASim.fa"),
            "-m", "200", "-d", temp, "-k", "--backend", "native"]
    assert cli.main(args + ["-o", out1]) == 0
    with open(out1, "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.m200.aln"), "rb") as f2:
        assert f1.read() == f2.read()
    states = [f for f in os.listdir(temp) if f.endswith(".state.npz")]
    assert len(states) == 4

    out2 = str(tmp_path / "b.aln")
    assert cli.main(args + ["-o", out2, "--resume", "--overwrite"]) == 0
    err = capfd.readouterr().err
    assert err.count("Resumed subtree") == 4
    with open(out2, "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.m200.aln"), "rb") as f2:
        assert f1.read() == f2.read()
