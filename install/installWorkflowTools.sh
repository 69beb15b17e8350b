#!/usr/bin/env bash
# Optional external tree tools for the iterative/placement workflows
# (reference analogue: install/installIterative.sh, which conda-installs
# dipper/fasttree/mafft/raxml/iqtree and builds rapidNJ). twilight-tpu
# auto-detects these on PATH (twilight_tpu/trees/external.py) and falls
# back to its built-in k-mer + NJ estimator when absent — the workflows
# run with NO external tools installed; these only swap in the
# reference Snakefile's preferred tree inference programs.
set -euo pipefail

have() { command -v "$1" >/dev/null 2>&1; }

if have conda; then
    conda config --add channels bioconda || true
    conda config --add channels conda-forge || true
    conda install -y fasttree mafft raxml iqtree || true
    conda install -y bioconda::dipper || true
elif have apt-get; then
    sudo apt-get install -y fasttree mafft raxml iqtree || true
else
    echo "no conda/apt found — install fasttree/mafft/raxml/iqtree" \
         "manually, or rely on the built-in estimator" >&2
fi

# rapidNJ has no common package; build from source like the reference
if ! have rapidnj; then
    tmp=$(mktemp -d)
    git clone --depth 1 https://github.com/somme89/rapidNJ.git "$tmp/rapidNJ" \
        && make -C "$tmp/rapidNJ" \
        && sudo install -m755 "$tmp/rapidNJ/bin/rapidnj" /usr/local/bin/ \
        || echo "rapidNJ build skipped" >&2
fi

for t in fasttree rapidnj iqtree raxmlHPC mafft dipper; do
    have "$t" && echo "found: $t"
done
echo "done — twilight-tpu-workflow will auto-detect available tools"
