"""End-to-end golden parity vs the reference binary's outputs.

Goldens in tests/golden/ were produced by the reference CPU binary
(tools/refbuild/build_reference.sh; see BASELINE.md for hashes/timings).
The bar is byte-identical FASTA. Fast configs run always; the full matrix is
marked slow (TWILIGHT_RUN_SLOW=1) and also driven by the /verify skill.
"""
import os

import pytest

from twilight_tpu import cli

from conftest import DATASET, GOLDEN, DATA


def run_cli(args):
    rc = cli.main(args)
    assert rc == 0


def assert_golden(out, name):
    with open(out, "rb") as f1, open(os.path.join(GOLDEN, name), "rb") as f2:
        assert f1.read() == f2.read(), f"output differs from golden {name}"


def test_protein_blosum62(tmp_path):
    out = str(tmp_path / "prot.aln")
    run_cli(["-t", os.path.join(DATA, "prot_16.nwk"),
             "-i", os.path.join(DATA, "prot_16.fa"),
             "-o", out, "--type", "p", "-b", "62", "--backend", "numpy"])
    assert_golden(out, "prot_16.aln")


def test_host_thread_pool_parity(tmp_path, monkeypatch):
    """-C N pools the host DP across worker threads (reference TBB
    parallel_for, alignment-cpu.cpp:46); results must be byte-identical
    to the sequential run regardless of worker count."""
    monkeypatch.setattr(os, "cpu_count", lambda: 4)
    out = str(tmp_path / "prot.aln")
    run_cli(["-t", os.path.join(DATA, "prot_16.nwk"),
             "-i", os.path.join(DATA, "prot_16.fa"),
             "-o", out, "--type", "p", "-b", "62", "--backend", "numpy",
             "-C", "4"])
    assert_golden(out, "prot_16.aln")


@pytest.mark.slow
def test_host_thread_pool_parity_native(tmp_path, monkeypatch):
    monkeypatch.setattr(os, "cpu_count", lambda: 4)
    out = str(tmp_path / "rnasim.aln")
    run_cli(["-t", os.path.join(DATASET, "RNASim.nwk"),
             "-i", os.path.join(DATASET, "RNASim.fa"),
             "-o", out, "--backend", "native", "-C", "4"])
    assert_golden(out, "RNASim.aln")


def test_merge_msas(tmp_path):
    out = str(tmp_path / "merge.aln")
    run_cli(["-f", os.path.join(DATASET, "RNASim_subalignments"),
             "-o", out, "-d", str(tmp_path / "tmp"), "--backend", "numpy"])
    assert_golden(out, "merge.aln")


@pytest.mark.slow
def test_sars20_default(tmp_path):
    out = str(tmp_path / "sars.aln")
    run_cli(["-t", os.path.join(DATASET, "sars_20.nwk"),
             "-i", os.path.join(DATASET, "sars_20.fa"),
             "-o", out, "--backend", "native"])
    assert_golden(out, "sars_20.aln")


@pytest.mark.slow
def test_rnasim_default(tmp_path):
    out = str(tmp_path / "rnasim.aln")
    run_cli(["-t", os.path.join(DATASET, "RNASim.nwk"),
             "-i", os.path.join(DATASET, "RNASim.fa"),
             "-o", out, "--backend", "native"])
    assert_golden(out, "RNASim.aln")


@pytest.mark.slow
def test_rnasim_rooted(tmp_path):
    out = str(tmp_path / "rnasim.aln")
    run_cli(["-t", os.path.join(DATASET, "RNASim.nwk"),
             "-i", os.path.join(DATASET, "RNASim.fa"),
             "-o", out, "--rooted", "--backend", "native"])
    assert_golden(out, "RNASim.rooted.aln")


def test_rnasim_divide_and_conquer(tmp_path):
    # un-gated: the only always-on divide-and-conquer + transitivity-merge
    # golden (~25 s native)
    out = str(tmp_path / "rnasim.aln")
    run_cli(["-t", os.path.join(DATASET, "RNASim.nwk"),
             "-i", os.path.join(DATASET, "RNASim.fa"),
             "-o", out, "-m", "200", "-d", str(tmp_path / "tmp"),
             "--backend", "native"])
    assert_golden(out, "RNASim.m200.aln")


@pytest.mark.slow
def test_place_with_tree(tmp_path):
    out = str(tmp_path / "place.aln")
    run_cli(["-a", os.path.join(DATASET, "RNASim_backbone.aln"),
             "-i", os.path.join(DATASET, "RNASim_sub.fa"),
             "-t", os.path.join(DATASET, "RNASim.nwk"),
             "-o", out, "--backend", "native"])
    assert_golden(out, "place_w_tree.aln")


def test_place_without_tree(tmp_path):
    # un-gated: the only always-on placement-mode golden (~7 s native)
    out = str(tmp_path / "place.aln")
    run_cli(["-a", os.path.join(DATASET, "RNASim_backbone.aln"),
             "-i", os.path.join(DATASET, "RNASim_sub.fa"),
             "-o", out, "-d", str(tmp_path / "tmp"), "--backend", "native"])
    assert_golden(out, "place_wo_tree.aln")


@pytest.mark.slow
def test_prune_flexible_tree(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "prune.aln")
    run_cli(["-t", os.path.join(DATASET, "RNASim.nwk"),
             "-i", os.path.join(DATASET, "RNASim_sub.fa"),
             "-o", out, "--prune", "--write-prune", "--backend", "native"])
    assert_golden(out, "prune.aln")
    with open(tmp_path / "RNASim.nwk.pruned.nwk", "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.nwk.pruned.nwk"), "rb") as f2:
        assert f1.read() == f2.read()


def test_place_with_tree_missing_leaves_errors_cleanly(tmp_path):
    """Tree leaves with no sequence in either input: the reference
    segfaults (sequencedb.cpp:148 path); we fail with a clear error."""
    import itertools

    from twilight_tpu.seqio.fasta import iter_fasta

    sub = str(tmp_path / "sub50.fa")
    with open(sub, "w") as f:
        for n, _, s in itertools.islice(
                iter_fasta(os.path.join(DATASET, "RNASim_sub.fa")), 50):
            f.write(f">{n}\n{s}\n")
    out = str(tmp_path / "place.aln")
    rc = cli.main(["-a", os.path.join(DATASET, "RNASim_backbone.aln"),
                   "-i", sub,
                   "-t", os.path.join(DATASET, "RNASim.nwk"),
                   "-o", out, "--backend", "numpy"])
    assert rc == 1
    assert not os.path.exists(out)
