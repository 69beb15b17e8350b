"""Lazy device-kernel handle for --backend auto (ops/device_kernel.py
LazyDeviceKernel): construction must not block the caller, align_pairs
must skip the device while it is building, and delegation must work once
ready. The blocking build path (explicit backends, device selection,
workflow persist cache) is pinned too."""
import time

import pytest

from twilight_tpu.config import Options, Params
from twilight_tpu.ops import device_kernel as dk


def _opts(**kw):
    base = dict(device_backend="auto", pair_batch=8)
    base.update(kw)
    return Options(**base)


def test_auto_returns_lazy_and_becomes_ready(monkeypatch):
    monkeypatch.delenv("TWILIGHT_FORCE_DEVICE", raising=False)
    opt = _opts()
    param = Params.make("n")
    t0 = time.time()
    kern = dk.make_device_kernel(opt, param)
    assert isinstance(kern, dk.LazyDeviceKernel)
    # construction returns immediately even though DeviceTalco setup
    # (discovery + warm-up scheduling) may take a while
    assert time.time() - t0 < 5.0
    deadline = time.time() + 120
    while not kern.poll_ready() and time.time() < deadline:
        time.sleep(0.2)
    assert kern.poll_ready(), "builder thread never finished on CPU"
    # delegation reaches the inner batcher (8-device conftest mesh)
    assert kern.mesh_size == 8
    assert kern.supports_on_final
    assert kern.close() is True


def test_explicit_backend_builds_blocking():
    opt = _opts(device_backend="cpu")
    kern = dk.make_device_kernel(opt, Params.make("n"))
    assert isinstance(kern, dk.DeviceTalco)
    kern.close()


def test_device_selection_builds_blocking():
    opt = _opts(device_num=2, device_index=[0, 4])
    kern = dk.make_device_kernel(opt, Params.make("n"))
    assert isinstance(kern, dk.DeviceTalco)
    assert kern.mesh_size == 2
    kern.close()


def test_unready_kernel_skips_device(monkeypatch):
    """align_pairs must treat a still-building kernel as absent."""
    from twilight_tpu.pipeline import aligner

    class Stub:
        calls = 0

        def poll_ready(self):
            return False

        def __call__(self, *a, **k):  # pragma: no cover - must not run
            Stub.calls += 1
            raise AssertionError("unready kernel was invoked")

    # empty pair list: the function returns after the dispatch gate
    aligner.align_pairs([], __import__(
        "twilight_tpu.core.seqdb", fromlist=["SequenceDB"]).SequenceDB(),
        _opts(), Params.make("n"), kernel=Stub())
    assert Stub.calls == 0
