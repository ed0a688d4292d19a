"""Multi-host serving dispatcher: requests flow over a DP group of worker
hosts, health checks are consumed automatically, and a failed host is
evicted while its work is retried on the survivors.

The reference has no distributed components at all (SURVEY §2.1 #26); these
tests validate the mechanism the north star requires, without a cluster:
workers run as threads (fast paths) and as real subprocesses (the
2-process CPU dryrun VERDICT.md round-1 item 4 asks for).
"""
import threading
import time

import numpy as np
import pytest

from planer_tpu.parallel import dispatcher as D


def _toy(x):
    return x.astype(np.float32) * 2.0 + 1.0


def _thread_worker(disp, host_id, net=_toy, health_fn=None):
    t = threading.Thread(
        target=D.run_worker,
        args=(disp.address, net),
        kwargs={"host_id": host_id, "health_fn": health_fn},
        daemon=True)
    t.start()
    return t


def test_requests_flow_across_dp_group():
    with D.Dispatcher(max_delay_ms=1.0, ping_interval_s=0.5,
                      ping_timeout_s=2.0) as disp:
        _thread_worker(disp, "a")
        _thread_worker(disp, "b")
        disp.wait_for_workers(2, timeout_s=10)
        x = np.arange(6, dtype=np.float32)
        for wave in range(6):  # waves -> separate batches -> round robin
            futs = [disp.submit(x + wave + i) for i in range(3)]
            for i, f in enumerate(futs):
                np.testing.assert_allclose(f.result(timeout=10),
                                           (x + wave + i) * 2 + 1)
        st = disp.stats()
        assert st["requests"] == 18
        assert st["dp_size"] == 2
        served = [h for h, s in st["workers"].items() if s["batches"] > 0]
        assert len(served) == 2, f"round robin never reached: {st['workers']}"


def test_tuple_outputs_and_padding():
    def multi(x):
        return x * 2.0, x.sum(axis=tuple(range(1, x.ndim)))

    with D.Dispatcher(buckets=(4,), max_delay_ms=1.0) as disp:
        _thread_worker(disp, "a", net=multi)
        disp.wait_for_workers(1, timeout_s=10)
        x = np.ones((2, 2), np.float32)
        got = disp.submit(x).result(timeout=10)  # padded from 1 -> bucket 4
        assert isinstance(got, tuple)
        np.testing.assert_allclose(got[0], x * 2)
        np.testing.assert_allclose(got[1], 4.0)


def test_batch_errors_strike_out_and_retry_on_survivor():
    calls = {"bad": 0}

    def bad(x):
        calls["bad"] += 1
        raise ValueError("injected failure")

    with D.Dispatcher(max_delay_ms=1.0, ping_interval_s=10,
                      max_strikes=2, retries=4) as disp:
        _thread_worker(disp, "bad", net=bad)
        disp.wait_for_workers(1, timeout_s=10)
        _thread_worker(disp, "good")
        disp.wait_for_workers(2, timeout_s=10)
        x = np.arange(3, dtype=np.float32)
        # waves force multiple batches so round robin reaches the bad host
        # at least max_strikes times; every request must still succeed via
        # retry on the survivor
        for wave in range(8):
            futs = [disp.submit(x + wave + i) for i in range(2)]
            for i, f in enumerate(futs):
                np.testing.assert_allclose(f.result(timeout=20),
                                           (x + wave + i) * 2 + 1)
        deadline = time.monotonic() + 10
        while "bad" in disp.workers() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert disp.workers() == ["good"]
        reasons = [e["reason"] for e in disp.stats()["evictions"]]
        assert any("batch errors" in r for r in reasons)


def test_unhealthy_host_is_evicted_by_health_loop():
    def sick(deadline_s=2.0):
        return {"healthy": False, "devices": {}}

    with D.Dispatcher(max_delay_ms=1.0, ping_interval_s=0.1,
                      ping_timeout_s=1.0) as disp:
        _thread_worker(disp, "sick", health_fn=sick)
        disp.wait_for_workers(1, timeout_s=10)
        deadline = time.monotonic() + 10
        while "sick" in disp.workers() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert "sick" not in disp.workers()
        reasons = [e["reason"] for e in disp.stats()["evictions"]]
        assert any("unhealthy" in r for r in reasons)


@pytest.mark.slow
def test_two_process_dryrun_kill_and_evict():
    """The full artifact: subprocess hosts, kill one by exact PID, verify
    eviction + completion on survivors (VERDICT round-1 item 4)."""
    report = D.dryrun(n_workers=2, n_requests=16)
    assert report["ok"], report
    assert len(report["evictions"]) == 1
    assert report["dp_size_after"] == 1
    served = [h for h, n in report["batch_spread"].items() if n > 0]
    assert len(served) == 2, report["batch_spread"]
