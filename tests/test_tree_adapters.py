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
