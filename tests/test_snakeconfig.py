"""Snakemake-style --config surface (workflow/snakeconfig.py): the
reference workflow's `--config TYPE=.. SEQ=.. OUT=..` line must drive
our workflow driver unchanged, including the Snakefile's checkFiles
overwrite guards (reference workflow/Snakefile:6-60)."""
import os

import pytest

from twilight_tpu.workflow import snakeconfig
from twilight_tpu.workflow.snakeconfig import config_to_argv


def test_basic_translation(tmp_path):
    out = str(tmp_path / "o.aln")
    argv = config_to_argv(["--config", "TYPE=n", "SEQ=in.fa", f"OUT={out}",
                           "ITER=4", "INITTREE=maffttree",
                           "ITERTREE=rapidnj", "FINALTREE=fasttree",
                           "KEEP=yes", f"DIR={tmp_path}/wd"])
    assert argv[:6] == ["-i", "in.fa", "-o", out, "-d", f"{tmp_path}/wd"]
    assert ["--type", "n"] == argv[6:8]
    assert ["-n", "4"] == argv[8:10]
    # maffttree maps onto the mafft adapter key
    assert ["--init-tree", "mafft"] == argv[10:12]
    assert ["--iter-tree", "rapidnj"] == argv[12:14]
    assert ["--final-tree", "fasttree"] == argv[14:16]
    assert argv[16:] == ["-k"]


def test_placement_keys(tmp_path):
    out = str(tmp_path / "o.aln")
    argv = config_to_argv(["--config", "TYPE=p", "SEQ=q.fa", f"OUT={out}",
                           "ALN=bb.aln", "TREE=bb.nwk"])
    assert "-a" in argv and argv[argv.index("-a") + 1] == "bb.aln"
    assert "-t" in argv and argv[argv.index("-t") + 1] == "bb.nwk"


def test_overwrite_guards(tmp_path, capsys):
    out = tmp_path / "o.aln"
    out.write_text("x")
    with pytest.raises(SystemExit):
        config_to_argv(["--config", "SEQ=in.fa", f"OUT={out}"])
    assert "already exists" in capsys.readouterr().err
    # OVERWRITE=yes passes
    argv = config_to_argv(["--config", "SEQ=in.fa", f"OUT={out}",
                           "OVERWRITE=yes"])
    assert "-o" in argv
    # existing DIR also refuses
    wd = tmp_path / "wd"
    wd.mkdir()
    with pytest.raises(SystemExit):
        config_to_argv(["--config", "SEQ=in.fa",
                        f"OUT={tmp_path}/new.aln", f"DIR={wd}"])
    assert "another directory name" in capsys.readouterr().err


def test_iter_bounds(tmp_path, capsys):
    with pytest.raises(SystemExit):
        config_to_argv(["--config", "SEQ=in.fa",
                        f"OUT={tmp_path}/a.aln", "ITER=6"])
    assert "above 5" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        config_to_argv(["--config", "SEQ=in.fa", f"OUT={tmp_path}/a.aln",
                        "BOGUS=1"])


def test_missing_out(capsys):
    with pytest.raises(SystemExit):
        config_to_argv(["--config", "SEQ=in.fa"])
    assert "output file name" in capsys.readouterr().err


def test_help_on_empty(capsys):
    with pytest.raises(SystemExit) as e:
        config_to_argv(["--config"])
    assert e.value.code == 0
    assert "Iterative and Placement Mode" in capsys.readouterr().out


def test_end_to_end_config_run(tmp_path, monkeypatch):
    """A full --config invocation drives run_iterative with the
    per-stage tools (mocked run to avoid an alignment)."""
    from twilight_tpu.workflow import iterative as it

    seen = {}

    def fake_run(seq, out, iters, temp, type_, backend, extra, keep,
                 tree_tool="auto", init_tool=None, iter_tool=None,
                 final_tool=None):
        seen.update(seq=seq, out=out, iters=iters, init=init_tool,
                    it=iter_tool, fin=final_tool, keep=keep)

    monkeypatch.setattr(it, "run_iterative", fake_run)
    rc = it.main(["--config", "TYPE=n", "SEQ=in.fa",
                  f"OUT={tmp_path}/o.aln", "ITER=2", "INITTREE=dipper",
                  "ITERTREE=fasttree", "FINALTREE=iqtree", "KEEP=yes"])
    assert rc == 0
    assert seen["seq"] == "in.fa" and seen["iters"] == 2
    assert (seen["init"], seen["it"], seen["fin"]) == (
        "dipper", "fasttree", "iqtree")
    assert seen["keep"] is True
