"""External tree-tool adapters with built-in fallback.

The reference workflow shells out to 9 tree tools through Snakemake rules
(/root/reference/workflow/rules/{fasttree,rapidnj,iqtree,...}.smk), with
scripts/reduceLen.py masking gappy columns first and
scripts/resolveTree.py binarizing polytomies afterwards. This module is
the same capability as a library: probe PATH for a known tool, reproduce
its rule's invocation, binarize the result; callers fall back to the
built-in k-mer/NJ/PartTree estimator (trees/estimate.py) when no tool is
installed.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
from typing import List, Optional, Sequence

import numpy as np

# Probe order mirrors the reference's iter_tree/final_tree options
# (workflow/config.yaml:9-10); each entry lists the executables that
# count as that tool.
TOOL_BINARIES = {
    "fasttree": ["FastTreeMP", "fasttree", "FastTree", "veryfasttree",
                 "VeryFastTree"],
    "rapidnj": ["rapidnj"],
    "iqtree": ["iqtree2", "iqtree"],
}
PROBE_ORDER = ["fasttree", "rapidnj", "iqtree"]


def find_tool(preference: Optional[str] = None
              ) -> Optional[tuple]:
    """(tool_name, exe_path) for the preferred (or first) tool on PATH."""
    order = [preference] if preference and preference != "auto" \
        else PROBE_ORDER
    for tool in order:
        for exe in TOOL_BINARIES.get(tool, [tool]):
            path = shutil.which(exe)
            if path:
                return tool, path
    return None


def mask_gappy_columns(rows: Sequence[str], threshold: float = 0.95
                       ) -> List[str]:
    """Drop columns whose gap fraction >= threshold before tree inference
    (reference workflow/scripts/reduceLen.py)."""
    mat = np.frombuffer("".join(rows).encode("latin-1"),
                        dtype=np.uint8).reshape(len(rows), -1)
    is_gap = (mat == ord("-")) | (mat == ord("."))
    keep = is_gap.mean(axis=0) < threshold
    kept = mat[:, keep]
    return [bytes(r).decode("latin-1") for r in kept]


def run_external_tree(tool: str, exe: str, names: Sequence[str],
                      rows: Sequence[str], type_: str = "n",
                      mask_gappy: float = 0.95, threads: int = 1) -> str:
    """Run one aligned-MSA tree inference exactly like the reference's
    Snakemake rule for `tool`, returning a binarized Newick string."""
    from ..phylo.tree import Tree

    with tempfile.TemporaryDirectory(prefix="twtree_") as td:
        masked = os.path.join(td, "msa.mask.fa")
        use_rows = mask_gappy_columns(rows, mask_gappy) \
            if tool in ("fasttree", "iqtree") else rows
        with open(masked, "w") as f:
            for n, s in zip(names, use_rows):
                f.write(f">{n}\n{s}\n")
        tree_path = os.path.join(td, "out.nwk")
        env = dict(os.environ, OMP_NUM_THREADS=str(threads))
        if tool == "fasttree":
            # rules/fasttree.smk: {exe} {model} -fastest masked > tree
            cmd = [exe] + (["-nt", "-gtr"] if type_ == "n" else []) \
                + ["-fastest", masked]
            with open(tree_path, "w") as out:
                subprocess.run(cmd, stdout=out, stderr=subprocess.DEVNULL,
                               env=env, check=True)
        elif tool == "rapidnj":
            # rules/rapidnj.smk: {exe} msa -i fa -o t -x tree -c threads
            subprocess.run([exe, masked, "-i", "fa", "-o", "t",
                            "-x", tree_path, "-c", str(threads)],
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL, env=env, check=True)
        elif tool == "iqtree":
            # rules/iqtree.smk: {exe} -s masked {model} --threads-max n
            subprocess.run([exe, "-s", masked,
                            "--threads-max", str(threads)],
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL, env=env, check=True)
            shutil.move(masked + ".treefile", tree_path)
        else:
            raise ValueError(f"unknown tree tool: {tool}")
        with open(tree_path) as f:
            newick = f.read().strip()

    # resolveTree.py equivalent: binarize polytomies
    t = Tree()
    t.parse_newick(newick)
    t.convert_to_binary()
    return t.get_newick_string()


def guide_tree_auto(names: Sequence[str], seqs: Sequence[str],
                    aligned: bool, type_: str = "n",
                    tool: str = "auto", threads: int = 1,
                    seed: int = 0) -> str:
    """Guide tree via an external tool when available (aligned input
    only — the reference's tools all consume MSAs), else the built-in
    estimator. tool: 'auto' | 'builtin' | a TOOL_BINARIES key."""
    from .estimate import build_guide_tree

    if tool != "builtin" and aligned:
        found = find_tool(None if tool == "auto" else tool)
        if found:
            tname, exe = found
            try:
                print(f"[twilight-tpu] tree inference via {tname} "
                      f"({exe})", file=sys.stderr)
                return run_external_tree(tname, exe, names, seqs, type_,
                                         threads=threads)
            except Exception as e:
                print(f"[twilight-tpu] {tname} failed ({e}); using "
                      "built-in estimator", file=sys.stderr)
        elif tool != "auto":
            raise RuntimeError(f"requested tree tool '{tool}' not on PATH")
    return build_guide_tree(names, seqs, aligned=aligned, seed=seed)
