"""Leaf-pair packing: the int-code fast path must encode exactly the raw
sequences (ops/device_kernel._pack_batch_leaf; correctness rationale in
ops/talco_pallas_g8.similarity_leaf)."""
import numpy as np

from twilight_tpu.config import Options, Params
from twilight_tpu.constants import letter_lut
from twilight_tpu.ops.device_kernel import DeviceTalco


class _FakeDevice:
    platform = "cpu"


def _make_dt():
    opt = Options(device_backend="numpy")
    param = Params.make("n")
    dt = DeviceTalco.__new__(DeviceTalco)  # skip jax init
    dt.option = opt
    dt.param = param
    dt.base_flen = 1 << 12
    dt.p = 6
    dt.p8 = 8
    dt.grp = 8
    return dt


def test_leaf_codes_match_sequence():
    dt = _make_dt()
    lut = letter_lut("n")
    seq_r = b"ACGTNACGTTGCA"
    seq_q = b"ACGTTACG"
    cons = (np.frombuffer(seq_r, np.uint8), np.frombuffer(seq_q, np.uint8))
    prep = (None, None, cons, ([], []), (len(seq_r), len(seq_q)),
            None, None)
    padlen, flen, off = 2048, 512, 768
    tot = off + padlen + off + 128
    args = dt._pack_batch_leaf([0], [prep], [(0, 0, 1, 1)], padlen, flen,
                               8, [dt.base_flen], [5000], off, tot)
    (rl, ql, rn, qn, fl, xd, gc, go, ge, ref_c, qry_c) = args
    assert rl[0] == len(seq_r) and ql[0] == len(seq_q)
    # qry codes forward at [off, off+ql)
    np.testing.assert_array_equal(
        qry_c[0, 0, off:off + len(seq_q)], lut[cons[1]].astype(np.int32))
    # ref codes reversed at [off+padlen-rl, off+padlen)
    np.testing.assert_array_equal(
        ref_c[0, 0, off + padlen - len(seq_r):off + padlen],
        lut[cons[0]][::-1].astype(np.int32))
    # padding uses the ambiguity code (scoring-matrix zero row)
    assert ref_c[0, 0, 0] == 4 and qry_c[0, 0, -1] == 4


def test_leaf_onehot_sim_equals_matrix(rng):
    """The mathematical premise: for one-hot unit-weight profiles the
    freq-path expected score equals a plain matrix lookup bit-for-bit
    (0.0-additions and division by 1.0 are exact in f32)."""
    from twilight_tpu.ops.talco_np import similarity_scores
    param = Params.make("n")
    m = param.scoring_matrix
    n = 64
    r = rng.integers(0, 5, n)
    q = rng.integers(0, 5, n)
    fr = np.zeros((n, 6), np.float32)
    fq = np.zeros((n, 6), np.float32)
    fr[np.arange(n), r] = 1.0
    fq[np.arange(n), q] = 1.0
    sim = similarity_scores(fr, fq, m, np.float32(-5.0), np.float32(1.0))
    np.testing.assert_array_equal(sim, m[r, q].astype(np.float32))


def test_kernel_routing_by_bucket():
    """Grouped kernel for both canonical buckets (since round 3 the 32768
    bucket runs g8 with HBM-resident inputs + chunked traceback merge, so
    its VMEM plan fits); only escalated wide windows route to the
    single-pair kernel. Distinguished by the packing geometry each
    builder returns: g8 packs at offset 0 into padlen-wide rows, v1 at
    offset flen into flen+padlen+flen+128-wide rows."""
    dt = _make_dt()
    dt.interpret = True
    dt.mesh = None
    dt.mesh_size = 1
    dt.marker = 1 << 10
    dt.msize = dt.param.matrix_size
    dt.matrix_bytes = dt.param.scoring_matrix.astype(np.float32).tobytes()
    _, _, off, tot = dt._kernel(2048, 512, 8)
    assert (off, tot) == (0, 2048), "2048 bucket should use the g8 kernel"
    _, _, off, tot = dt._kernel(32768, 512, 8)
    assert (off, tot) == (0, 32768), \
        "32768 bucket should use the g8 kernel (hbm_in mode)"
    _, _, off, tot = dt._kernel(2048, 2048, 8)
    assert (off, tot) == (0, 2048), \
        "escalated wide windows stay grouped (hbm_tb: tb in HBM)"
    _, _, off, tot = dt._kernel(2048, 8192, 8)
    assert off == 8192 and tot == 8192 + 2048 + 8192 + 128, \
        "beyond the g8 wide limit (4096 nt) the single-pair kernel runs"


def test_discover_devices_watchdog(monkeypatch):
    """Tunnel-outage resilience: jax.local_devices() that never returns
    (observed 20+ min block when the axon tunnel is down) must raise
    within TWILIGHT_DEVICE_INIT_TIMEOUT so --backend auto can fall back
    to the host kernel; a working backend passes through untouched."""
    import time
    from twilight_tpu.ops import device_kernel as dk

    class HungJax:
        @staticmethod
        def local_devices(backend=None):
            time.sleep(60)

    monkeypatch.setenv("TWILIGHT_DEVICE_INIT_TIMEOUT", "0.2")
    n0 = len(dk._stuck_threads)
    t0 = time.time()
    try:
        dk.discover_devices(HungJax, "tpu")
        raise AssertionError("watchdog did not fire")
    except RuntimeError as e:
        assert "did not return" in str(e)
    assert time.time() - t0 < 5
    assert len(dk._stuck_threads) == n0 + 1
    dk._stuck_threads.pop()  # don't poison later tests' cli teardown
    # a second probe in the same process short-circuits instead of
    # blocking for the timeout again...
    try:
        dk.discover_devices(HungJax, "tpu")
        raise AssertionError("give-up cache did not fire")
    except RuntimeError as e:
        assert "already timed out" in str(e)
    # ...unless explicitly asked to retry
    monkeypatch.setenv("TWILIGHT_DEVICE_RETRY", "1")
    try:
        dk.discover_devices(HungJax, "tpu")
        raise AssertionError("watchdog did not fire on retry")
    except RuntimeError as e:
        assert "did not return" in str(e)
    dk._stuck_threads.pop()
    monkeypatch.delenv("TWILIGHT_DEVICE_RETRY")
    dk._discovery_gave_up = False  # test-owned state: unpoison the module

    class OkJax:
        @staticmethod
        def local_devices(backend=None):
            return ["dev0", "dev1"] if backend is None else [backend]

    assert dk.discover_devices(OkJax, "auto") == ["dev0", "dev1"]
    assert dk.discover_devices(OkJax, "cpu") == ["cpu"]

    class ErrJax:
        @staticmethod
        def local_devices(backend=None):
            raise ValueError("no backend")

    try:
        dk.discover_devices(ErrJax, "tpu")
        raise AssertionError("error not propagated")
    except ValueError as e:
        assert "no backend" in str(e)
