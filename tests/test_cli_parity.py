"""CLI parity tail: output/temp-dir guards and the reference's stderr
blocks (config echo, verbose matrix dump, sequence summary, progress
trace — option.cpp:174-250, io.cpp:177-198, scoring-matrix.cpp:204-235).

The full line-for-line stderr comparison vs the reference binary (modulo
timing values and file names) was verified on RNASim -m 200 -v; these
tests pin the formats so they don't drift.
"""
import os

import pytest

from twilight_tpu import cli

from conftest import DATASET


def _run(args, capfd):
    rc = cli.main(args)
    cap = capfd.readouterr()
    return rc, cap.out, cap.err


def test_output_exists_guard(tmp_path, capfd):
    out = tmp_path / "o.aln"
    out.write_text("x")
    rc, _, err = _run(["-t", os.path.join(DATASET, "sars_20.nwk"),
                       "-i", os.path.join(DATASET, "sars_20.fa"),
                       "-o", str(out), "--backend", "numpy"], capfd)
    assert rc == 1
    assert f"ERROR: {out} already exists. Please use another file name " \
           "or add --overwrite to overwrite the existing file." in err
    # --overwrite clears the guard (and, like the reference's
    # writability probe, removes the stale file up front)
    rc2 = cli.main(["-f", os.path.join(DATASET, "RNASim_subalignments"),
                    "-o", str(out), "-d", str(tmp_path / "t1"),
                    "--overwrite"])
    assert rc2 == 0 and out.exists()
    capfd.readouterr()


def test_temp_dir_exists_guard(tmp_path, capfd):
    td = tmp_path / "tdir"
    td.mkdir()
    rc, _, err = _run(["-f", os.path.join(DATASET, "RNASim_subalignments"),
                       "-o", str(tmp_path / "m.aln"), "-d", str(td)], capfd)
    assert rc == 1
    assert f"ERROR: {td} already exists." in err


def test_stderr_parity_blocks(tmp_path, capfd):
    out = str(tmp_path / "m.aln")
    td = str(tmp_path / "t")
    rc, outtext, err = _run(
        ["-f", os.path.join(DATASET, "RNASim_subalignments"),
         "-o", out, "-d", td, "-v", "--backend", "numpy"], capfd)
    assert rc == 0
    # stdout: temp-dir line (reference prints via std::cout)
    assert f"{td} created for storing temporary alignments" in outtext
    # config echo
    assert "====== Configuration =======" in err
    assert "Threshold for removing gappy columns: 0.95" in err
    assert "Allowed proportion of ambiguous characters: 10%" in err
    # verbose matrix dump, exact C++ setw(5) formatting
    assert "         A    C    G    T    N" in err
    assert "    A   18   -8   -4   -8    0" in err
    assert "Gap-Open:   -50" in err
    assert "Xdrop:      3000" in err
    # progress trace
    assert "============================" in err
    assert "Total 3 levels." in err
    assert "Alignment on 4 subalignments (length:" in err
    assert "Wrote 4 Alignments (total 579 sequences) to" in err
    assert "Total Execution in" in err


def test_sequence_summary_block(tmp_path, capfd):
    data = os.path.join(os.path.dirname(__file__), "data")
    rc, _, err = _run(["-t", os.path.join(data, "prot_16.nwk"),
                       "-i", os.path.join(data, "prot_16.fa"),
                       "-o", str(tmp_path / "s.aln"), "--type", "p",
                       "--backend", "native"], capfd)
    assert rc == 0
    assert "===== Sequence Summary =====" in err
    assert "Number : 16" in err
    assert "Deferred sequences: 0" in err
    assert "Wrote alignment to" in err
    assert "Finished the alignment in" in err


def test_validation_errors(tmp_path, capfd):
    base = ["-t", os.path.join(DATASET, "sars_20.nwk"),
            "-i", os.path.join(DATASET, "sars_20.fa"),
            "-o", str(tmp_path / "x.aln")]
    for extra, frag in [
            (["-r", "1.5"], "--remove-gappy"),
            (["--max-ambig", "0"], "--max-ambig"),
            (["--min-len", "10", "--length-deviation", "0.1"],
             "--length-deviation cannot be used together"),
            (["-m", "0"], "--max-subtree")]:
        rc, _, err = _run(base + extra, capfd)
        assert rc == 1, extra
        assert frag in err, extra
