"""External tree-tool adapters (reference workflow rules/{fasttree,
rapidnj,iqtree}.smk + scripts/{reduceLen,resolveTree}.py as a library).

No real tree tool is installed in CI, so a mock `fasttree` binary on a
temp PATH stands in: the adapter must find it, feed it a gappy-masked
MSA, capture its Newick, and binarize polytomies like resolveTree.py.
"""
import os
import stat
import sys

import numpy as np
import pytest

from twilight_tpu.phylo.tree import Tree
from twilight_tpu.trees import external


def _mock_fasttree(tmp_path, newick):
    exe = tmp_path / "fasttree"
    # echoes a fixed polytomous tree; records its input for inspection
    exe.write_text(
        "#!/bin/sh\n"
        f"cp \"$(eval echo \\${{$#}})\" {tmp_path}/seen_input.fa\n"
        f"echo '{newick}'\n")
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return str(tmp_path)


def test_find_tool_absent(monkeypatch):
    monkeypatch.setenv("PATH", "/nonexistent")
    assert external.find_tool() is None


def test_adapter_runs_mock_and_binarizes(tmp_path, monkeypatch):
    # polytomy: 4 children under the root
    poly = "(A:1,B:1,C:1,D:1);"
    monkeypatch.setenv("PATH", _mock_fasttree(tmp_path, poly)
                       + os.pathsep + os.environ.get("PATH", ""))
    found = external.find_tool("fasttree")
    assert found is not None and found[0] == "fasttree"

    names = ["A", "B", "C", "D"]
    rows = ["AC-G", "AC-G", "AT-G", "GT-A"]  # col 3 is all-gap -> masked
    nwk = external.run_external_tree("fasttree", found[1], names, rows)
    t = Tree()
    t.parse_newick(nwk)
    for node in t.root.collect_post_order():
        assert len(node.children) in (0, 2), "polytomy not binarized"
    leaves = {n.identifier for n in t.root.collect_post_order()
              if n.is_leaf()}
    assert leaves == set(names)

    # the tool must have received the gappy-masked MSA
    seen = (tmp_path / "seen_input.fa").read_text()
    assert "AC-G" not in seen and "ACG" in seen


def test_guide_tree_auto_falls_back(monkeypatch):
    monkeypatch.setenv("PATH", "/nonexistent")
    names = [f"s{i}" for i in range(6)]
    rows = ["ACGTACGTAA", "ACGTACGTAT", "ACGAACGTAA",
            "TCGTACCTAA", "ACGTACGGAA", "ACGTTCGTAA"]
    nwk = external.guide_tree_auto(names, rows, aligned=True)
    t = Tree()
    t.parse_newick(nwk)
    leaves = {n.identifier for n in t.root.collect_post_order()
              if n.is_leaf()}
    assert leaves == set(names)


def test_guide_tree_auto_requested_missing(monkeypatch):
    monkeypatch.setenv("PATH", "/nonexistent")
    with pytest.raises(RuntimeError):
        external.guide_tree_auto(["a", "b"], ["AC", "AC"], aligned=True,
                                 tool="rapidnj")


def test_mask_gappy_columns():
    rows = ["A-C-", "A---", "G-C-"]
    out = external.mask_gappy_columns(rows, threshold=0.95)
    assert out == ["AC", "A-", "GC"]


def _mock_exe(tmp_path, name, script):
    exe = tmp_path / name
    exe.write_text("#!/bin/sh\n" + script)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return str(tmp_path)


def test_raxml_adapter(tmp_path, monkeypatch):
    # raxml rule: masked MSA in, RAxML_bestTree.<name> out in -w dir
    script = (
        'while [ $# -gt 0 ]; do\n'
        '  case "$1" in -w) WD="$2"; shift;; -n) NM="$2"; shift;; esac\n'
        '  shift\ndone\n'
        'echo "(A:1,B:1,C:1,D:1);" > "$WD/RAxML_bestTree.$NM"\n')
    monkeypatch.setenv("PATH", _mock_exe(tmp_path, "raxmlHPC", script)
                       + os.pathsep + os.environ.get("PATH", ""))
    found = external.find_tool("raxml")
    assert found is not None and found[0] == "raxml"
    nwk = external.run_external_tree(
        "raxml", found[1], ["A", "B", "C", "D"],
        ["ACG", "ACG", "ATG", "GTA"])
    t = Tree()
    t.parse_newick(nwk)
    for node in t.root.collect_post_order():
        assert len(node.children) in (0, 2)


def test_mafft_parttree_adapter(tmp_path, monkeypatch):
    # mafft --treeout writes <input>.tree; parttree mode uses bare
    # 1-based sequence numbers (converted like scripts/mafft2nwk.py)
    script = (
        'IN="$(eval echo \\${$#})"\n'
        'printf "(1,(2,\\n3),4\\n);" | head -c 999 > "$IN.tree"\n')
    monkeypatch.setenv("PATH", _mock_exe(tmp_path, "mafft", script)
                       + os.pathsep + os.environ.get("PATH", ""))
    found = external.find_tool("parttree")
    assert found is not None
    names = ["sA", "sB", "sC", "sD"]
    nwk = external.run_external_tree("parttree", found[1], names,
                                     ["ACGT", "ACGA", "ATGT", "GCGT"])
    t = Tree()
    t.parse_newick(nwk)
    leaves = {n.identifier for n in t.root.collect_post_order()
              if n.is_leaf()}
    assert leaves == set(names)


def test_mashtree_adapter(tmp_path, monkeypatch):
    # mashtree gets one FASTA per sequence and writes --outtree
    script = (
        'while [ $# -gt 0 ]; do\n'
        '  case "$1" in --outtree) OUT="$2"; shift;; esac\n'
        '  shift\ndone\n'
        'echo "(sA:1,sB:1,(sC:1,sD:1):1);" > "$OUT"\n')
    monkeypatch.setenv("PATH", _mock_exe(tmp_path, "mashtree", script)
                       + os.pathsep + os.environ.get("PATH", ""))
    found = external.find_tool("mashtree")
    assert found is not None
    names = ["sA", "sB", "sC", "sD"]
    nwk = external.run_external_tree("mashtree", found[1], names,
                                     ["ACGT", "ACGA", "ATGT", "GCGT"])
    t = Tree()
    t.parse_newick(nwk)
    leaves = {n.identifier for n in t.root.collect_post_order()
              if n.is_leaf()}
    assert leaves == set(names)


def test_dipper_dual_mode(tmp_path, monkeypatch):
    # dipper serves both rules/dipper_init.smk (raw, `-i r`) and
    # rules/dipper_iter.smk (MSA, `-i m`) — the adapter must stay
    # selectable for aligned input and pass the right mode flag
    script = (
        'while [ $# -gt 0 ]; do\n'
        '  case "$1" in -i) MODE="$2"; shift;; -O) OUT="$2"; shift;; esac\n'
        '  shift\ndone\n'
        f'echo "$MODE" >> {tmp_path}/modes.txt\n'
        'echo "(sA:1,sB:1,(sC:1,sD:1):1);" > "$OUT"\n')
    monkeypatch.setenv("PATH", _mock_exe(tmp_path, "dipper", script)
                       + os.pathsep + "/usr/bin:/bin")
    names = ["sA", "sB", "sC", "sD"]
    nwk = external.guide_tree_auto(names, ["ACGT", "ACGA", "ATGT", "GCGT"],
                                   aligned=False, tool="dipper")
    assert "sA" in nwk
    nwk = external.guide_tree_auto(names, ["AC-GT", "ACG-A", "AT-GT",
                                           "GC-GT"],
                                   aligned=True, tool="dipper")
    assert "sA" in nwk
    modes = (tmp_path / "modes.txt").read_text().split()
    assert modes == ["r", "m"]


def test_unaligned_probe_order(tmp_path, monkeypatch):
    # guide_tree_auto(aligned=False) must pick an unaligned-input tool
    script = (
        'IN="$(eval echo \\${$#})"\n'
        'printf "1_x\\n2_x\\n" > /dev/null\n'
        'printf "(\\n1_sA\\n,\\n2_sB\\n);" > "$IN.tree"\n')
    monkeypatch.setenv("PATH", _mock_exe(tmp_path, "mafft", script)
                       + os.pathsep + os.environ.get("PATH", ""))
    nwk = external.guide_tree_auto(["sA", "sB"], ["ACGT", "ACGA"],
                                   aligned=False)
    assert "sA" in nwk and "sB" in nwk
    # an aligned-only tool request on raw sequences is an explicit error
    with pytest.raises(RuntimeError):
        external.guide_tree_auto(["a", "b"], ["AC", "AG"], aligned=False,
                                 tool="fasttree")
