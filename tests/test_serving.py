"""Serving engine: batching correctness, bucketing, stats, error paths."""
import threading
import time

import numpy as np
import pytest

from planer_tpu import models
from planer_tpu.runtime.serving import ServingEngine


@pytest.fixture(scope="module")
def net():
    return models.resnet18(num_classes=8)


def test_single_request(net, rng):
    x = rng.standard_normal((3, 32, 32)).astype(np.float32)
    with ServingEngine(net, buckets=(1, 2, 4), max_delay_ms=1) as eng:
        out = eng.infer(x)
    ref = np.asarray(net.forward(x[None]))[0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_concurrent_requests_batched(net, rng):
    xs = [rng.standard_normal((3, 32, 32)).astype(np.float32)
          for _ in range(16)]
    with ServingEngine(net, buckets=(1, 2, 4, 8), max_delay_ms=30) as eng:
        futs = [eng.submit(x) for x in xs]
        outs = [f.result(timeout=60) for f in futs]
        st = eng.stats()
    # correctness per request
    ref = np.asarray(net.forward(np.stack(xs))) if True else None
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, ref[i], rtol=1e-3, atol=1e-3)
    assert st["requests"] == 16
    # batching actually happened (fewer batches than requests)
    assert st["batches"] < 16
    assert 0 < st["avg_occupancy"] <= 1


def test_padding_to_bucket(net, rng):
    """3 concurrent requests -> bucket 4 with 1 padding row."""
    xs = [rng.standard_normal((3, 32, 32)).astype(np.float32)
          for _ in range(3)]
    with ServingEngine(net, buckets=(4,), max_delay_ms=50) as eng:
        futs = [eng.submit(x) for x in xs]
        [f.result(timeout=60) for f in futs]
        st = eng.stats()
    assert st["batches"] >= 1
    assert st["pad_fraction"] > 0


def test_error_propagation(rng):
    class Broken:
        def __call__(self, x):
            raise RuntimeError("boom")

    with ServingEngine(Broken(), buckets=(1,), max_delay_ms=1) as eng:
        fut = eng.submit(np.zeros((3, 8, 8), np.float32))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=10)


def test_throughput_stats(net, rng):
    with ServingEngine(net, buckets=(1, 2, 4), max_delay_ms=10) as eng:
        for _ in range(5):
            eng.infer(rng.standard_normal((3, 32, 32)).astype(np.float32))
        st = eng.stats()
    assert st["requests"] == 5
    assert st["p50_ms"] > 0 and st["p99_ms"] >= st["p50_ms"]


def test_retry_then_fail(rng):
    calls = [0]

    class Flaky:
        def __call__(self, x):
            calls[0] += 1
            if calls[0] <= 2:
                raise RuntimeError("transient")
            return np.zeros((x.shape[0], 4), np.float32)

    with ServingEngine(Flaky(), buckets=(1,), max_delay_ms=1) as eng:
        out = eng.infer(np.zeros((3, 8, 8), np.float32), retries=3)
    assert out.shape == (4,)
    assert calls[0] == 3


def test_health_check():
    from planer_tpu.parallel.multihost import health_check
    h = health_check(deadline_s=30)
    assert h["healthy"]
    assert all(v["ok"] for v in h["devices"].values())


def test_mixed_shapes_dont_kill_dispatcher(net, rng):
    """Different request shapes batch separately; dispatcher survives."""
    with ServingEngine(net, buckets=(1, 2, 4), max_delay_ms=30) as eng:
        f1 = eng.submit(rng.standard_normal((3, 32, 32)).astype(np.float32))
        f2 = eng.submit(rng.standard_normal((3, 64, 64)).astype(np.float32))
        o1 = f1.result(timeout=60)
        o2 = f2.result(timeout=60)
        assert o1.shape == (8,) and o2.shape == (8,)
        assert eng._thread.is_alive()


def test_close_fails_pending_futures():
    import time as _t

    class Slow:
        def __call__(self, x):
            _t.sleep(0.5)
            return np.zeros((x.shape[0], 2), np.float32)

    eng = ServingEngine(Slow(), buckets=(1,), max_delay_ms=1)
    futs = [eng.submit(np.zeros((3, 4, 4), np.float32)) for _ in range(8)]
    eng.close()
    resolved = 0
    for f in futs:
        try:
            f.result(timeout=10)
            resolved += 1
        except RuntimeError:
            resolved += 1
    assert resolved == 8  # every future resolves (result or close error)


def test_http_server_roundtrip(net, rng):
    import io
    import urllib.request
    from planer_tpu.runtime.http_server import PlanerHTTPServer

    with ServingEngine(net, buckets=(1, 2, 4), max_delay_ms=5) as eng:
        with PlanerHTTPServer(eng, port=0) as srv:
            url = f"http://127.0.0.1:{srv.port}"
            x = rng.standard_normal((3, 32, 32)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, x)
            req = urllib.request.Request(f"{url}/predict", data=buf.getvalue(),
                                         method="POST")
            out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
            ref = np.asarray(net.forward(x[None]))[0]
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
            # stats surface
            import json
            st = json.loads(urllib.request.urlopen(f"{url}/stats").read())
            assert st["requests"] == 1
            # health surface
            h = json.loads(urllib.request.urlopen(f"{url}/health").read())
            assert h["healthy"]
            # bad payload -> 400
            req = urllib.request.Request(f"{url}/predict", data=b"garbage",
                                         method="POST")
            try:
                urllib.request.urlopen(req)
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
