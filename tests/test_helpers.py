"""Alignment pre/post helper tests (reference alignment-helper.cpp parity
properties: gappy-column strip/splice roundtrip, PSGP, consensus)."""
import numpy as np

from twilight_tpu.config import Params
from twilight_tpu.pipeline import helpers


class FakeNode:
    def __init__(self, aln_len, aln_num, weight=None):
        self.aln_len = aln_len
        self.aln_num = aln_num
        self.aln_weight = weight if weight is not None else float(aln_num)


def onehot(seq, p=6, num=1.0):
    f = np.zeros((len(seq), p), dtype=np.float32)
    f[np.arange(len(seq)), seq] = num
    return f


def test_remove_gappy_roundtrip():
    """Strip + splice-back must reproduce a pure-gap run as 1/2 steps."""
    p = 6
    rng = np.random.default_rng(1)
    seq_r = rng.integers(0, 4, 40)
    seq_q = rng.integers(0, 4, 40)
    fr = onehot(seq_r)
    fq = onehot(seq_q)
    # make ref columns 10..14 gap-only
    fr[10:15] = 0.0
    fr[10:15, p - 1] = 1.0
    ref, qry = FakeNode(40, 1), FakeNode(40, 1)
    nr, nq, gappy, lens = helpers.remove_gappy_columns(
        fr, fq, (ref, qry), "n", 0.95, 0)
    assert lens == (35, 40)
    assert gappy[0] == [(10, 5)]
    assert gappy[1] == []
    # fake DP path over the compacted profiles: all matches then ins tail
    path = np.zeros(40, dtype=np.int8)
    path[:35] = 0
    path[35:] = 1
    param = Params.make("n")
    cons = (np.full(40, ord("A"), np.uint8), np.full(40, ord("A"), np.uint8))
    full = helpers.add_gappy_columns_back(path, gappy, param, "n", cons)
    # every ref/qry column must be consumed exactly once
    assert int(np.sum(full != 1)) == 40   # ref steps
    assert int(np.sum(full != 2)) == 40   # qry steps


def test_psgp_no_gaps_is_default():
    fr = onehot(np.arange(10) % 4)
    fq = onehot(np.arange(10) % 4)
    param = Params.make("n")
    (op_r, op_q), (ex_r, ex_q) = helpers.calculate_psgp(
        fr, fq, (FakeNode(10, 1), FakeNode(10, 1)), "n", (10, 10), param)
    assert np.all(op_r == np.float32(param.gap_open))
    assert np.all(ex_q == np.float32(param.gap_extend))


def test_psgp_gappy_columns_cheaper():
    """Columns containing gaps get scaled (less negative) penalties."""
    fr = onehot(np.arange(10) % 4, num=1.0)
    # 4-seq profile with 3 gaps in column 5
    fr = fr * 4
    fr[5] = 0
    fr[5, 0] = 1
    fr[5, 5] = 3
    fq = onehot(np.arange(10) % 4)
    param = Params.make("n")
    (op_r, _), (ex_r, _) = helpers.calculate_psgp(
        fr, fq, (FakeNode(10, 4), FakeNode(10, 1)), "n", (10, 10), param)
    assert op_r[5] > np.float32(param.gap_open)  # less negative
    assert ex_r[5] > np.float32(param.gap_extend)
    assert op_r[0] == np.float32(param.gap_open)


def test_consensus_argmax():
    fr = np.zeros((3, 6), np.float32)
    fr[0, 0] = 2.0   # A
    fr[1, 3] = 1.5   # T
    fr[2, 5] = 1.0   # all-gap -> ambiguity letter
    cons = helpers.get_consensus(fr, "n", 3)
    assert bytes(cons[:2]) == b"AT"


def test_update_frequency_merge():
    """Profile merge along a path: gap row absorbs the other side's weight
    (reference alignment-helper.cpp:506-539)."""
    fr = onehot(np.array([0, 1, 2]))
    fq = onehot(np.array([0, 1]))
    ref, qry = FakeNode(3, 1, 1.0), FakeNode(2, 1, 1.0)
    ref.msa_freq = fr
    qry.msa_freq = fq
    path = np.array([0, 0, 2], dtype=np.int8)  # qry shorter: last col del
    helpers.update_frequency((ref, qry), path, (1.0, 1.0))
    merged = ref.msa_freq
    assert merged.shape[0] == 3
    assert merged[0, 0] == 2.0           # A+A
    assert merged[2, 5] == 1.0           # qry contributes gap weight


def test_gappy_runs_vectorized_matches_scalar(rng):
    """_gappy_runs is run-length encoding over the per-column threshold
    test; pin the vectorized form against the obvious scalar loop."""
    from twilight_tpu.pipeline.helpers import _gappy_runs, F32

    def scalar(gap_col, num, threshold, length):
        flags = (gap_col[:length] / F32(num)) > F32(threshold)
        runs, start, run = [], -1, 0
        for i in range(length):
            if flags[i]:
                if start == -1:
                    start, run = i, 1
                else:
                    run += 1
            elif start != -1:
                runs.append((start, run))
                start, run = -1, 0
        if start != -1:
            runs.append((start, run))
        return runs

    for trial in range(200):
        length = int(rng.integers(0, 60))
        num = float(rng.integers(1, 30))
        gap_col = rng.integers(0, int(num) + 1,
                               size=max(length, 1)).astype(np.float32)
        thr = float(rng.choice([0.0, 0.3, 0.95, 1.0]))
        assert _gappy_runs(gap_col, num, thr, length) == \
            scalar(gap_col, num, thr, length)


def test_merge_insertions_vectorized_matches_scalar(rng):
    """merge_insertions re-projects each placed path onto global columns;
    pin the vectorized index math against the obvious scalar walk."""
    from twilight_tpu.config import Options, PLACE_WO_TREE
    from twilight_tpu.core.seqdb import SequenceDB, GAP
    from twilight_tpu.phylo.tree import Node

    for trial in range(30):
        ref_len = int(rng.integers(1, 40))
        n_seqs = int(rng.integers(1, 6))
        db = SequenceDB()
        paths = []
        for s in range(n_seqs):
            # random path with exactly ref_len non-insertion entries
            ents = []
            for _ in range(ref_len):
                for _ in range(int(rng.integers(0, 3))):
                    ents.append(1)
                ents.append(int(rng.choice([0, 2])))
            for _ in range(int(rng.integers(0, 3))):
                ents.append(1)
            path = np.array(ents, dtype=np.int8)
            n_chars = int(np.count_nonzero(path != 2))
            chars = rng.integers(65, 91, size=max(n_chars, 1)).astype(np.uint8)
            db.add_sequence(s, f"q{s}", bytes(chars[:n_chars]).decode(), -1,
                            1.0, False, PLACE_WO_TREE)
            db.subtree_aln[s] = path
            paths.append(path)
        db.subtree_aln[-1] = np.zeros(ref_len, dtype=np.int8)
        olds = [db.sequences[s].aln[:db.sequences[s].len].copy()
                for s in range(n_seqs)]

        # scalar reference walk
        longest = np.zeros(ref_len + 1, dtype=np.int64)
        for path in paths:
            ref_idx, start, ln = 0, -1, 0
            for a in path:
                if a == 1:
                    if start == -1:
                        start = ref_idx
                    ln += 1
                else:
                    if start != -1:
                        longest[start] = max(longest[start], ln)
                        start, ln = -1, 0
                    ref_idx += 1
            if start != -1:
                longest[start] = max(longest[start], ln)
        total_len = ref_len + int(longest.sum())
        expected = []
        for s, path in enumerate(paths):
            ref_aln = []
            for i in range(ref_len + 1):
                ref_aln += [3] * int(longest[i]) + ([0] if i < ref_len else [])
            new = np.full(total_len, ord("."), dtype=np.uint8)
            org_idx = aln_idx = 0
            old = olds[s]
            for k in range(total_len):
                if ref_aln[k] == 0:
                    if path[aln_idx] == 0:
                        new[k] = old[org_idx]
                        aln_idx += 1
                        org_idx += 1
                    elif path[aln_idx] == 2:
                        new[k] = GAP
                        aln_idx += 1
                else:
                    if aln_idx < len(path) and path[aln_idx] == 1:
                        new[k] = old[org_idx]
                        aln_idx += 1
                        org_idx += 1
            expected.append(new)

        root = Node("root", 1.0)
        helpers.merge_insertions(db, root)
        assert root.aln_len == total_len
        for s in range(n_seqs):
            np.testing.assert_array_equal(
                db.sequences[s].aln[:total_len], expected[s],
                err_msg=f"trial {trial} seq {s}")
