"""Multi-host bring-up and failure detection.

The reference is a single synchronous process (SURVEY §5: no failure
detection anywhere).  Serving-scope mechanisms here:

  * :func:`initialize` — ``jax.distributed.initialize`` with a timeout and a
    clear error (a hung coordinator is the most common multi-host bring-up
    failure), env-var driven like standard TPU pod deployments;
  * :func:`health_check` — device liveness probe: run a tiny jitted add on
    every local device with a deadline; returns per-device status.  It is
    consumed AUTOMATICALLY by parallel.dispatcher: every worker answers the
    dispatcher's periodic pings with this probe's result, and an unhealthy
    (or unresponsive, or erroring) host is evicted from the DP group with
    its in-flight work retried on the survivors (see dispatcher.Dispatcher;
    request-level retry also lives in ServingEngine.submit).
"""
from __future__ import annotations

import os
import queue as _queue
import threading
import time

import numpy as np

__all__ = ["initialize", "health_check"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               timeout_s: float = 120.0):
    """jax.distributed.initialize with a hard timeout.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods jax can also infer them
    from the metadata server.  Raises TimeoutError instead of hanging when
    the coordinator never comes up.
    """
    import jax

    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])

    # daemon thread + queue: a hung initialize must not block our return
    # (a ThreadPoolExecutor context manager would join the stuck worker)
    done: _queue.Queue = _queue.Queue()

    def _run():
        try:
            jax.distributed.initialize(**kwargs)
            done.put((True, None))
        except Exception as e:  # surfaced to the caller below
            done.put((False, e))

    threading.Thread(target=_run, daemon=True).start()
    try:
        ok, err = done.get(timeout=timeout_s)
    except _queue.Empty:
        raise TimeoutError(
            f"jax.distributed.initialize did not complete within "
            f"{timeout_s}s (coordinator "
            f"{kwargs.get('coordinator_address', '<auto>')} unreachable?)"
        ) from None
    if not ok:
        raise err
    import jax as _j
    return {"process_index": _j.process_index(),
            "process_count": _j.process_count(),
            "local_devices": len(_j.local_devices())}


def health_check(deadline_s: float = 10.0) -> dict:
    """Probe every local device with a tiny computation under a deadline."""
    import jax
    import jax.numpy as jnp

    results = {}
    out: _queue.Queue = _queue.Queue()

    def probe(dev):
        try:
            t0 = time.perf_counter()
            x = jax.device_put(jnp.ones((8, 8), jnp.float32), dev)
            float(np.asarray(x + 1).sum())
            out.put((str(dev), {"ok": True,
                                "latency_s": time.perf_counter() - t0}))
        except Exception as e:
            out.put((str(dev), {"ok": False, "error": repr(e)[:200]}))

    devs = jax.local_devices()
    for d in devs:  # daemon threads: a wedged device must not block us
        threading.Thread(target=probe, args=(d,), daemon=True).start()
    deadline = time.monotonic() + deadline_s
    for _ in devs:
        left = deadline - time.monotonic()
        try:
            name, res = out.get(timeout=max(left, 0.001))
            results[name] = res
        except _queue.Empty:
            break
    for d in devs:  # anything that never reported is unhealthy
        results.setdefault(str(d), {"ok": False, "error": "probe timed out"})
    healthy = all(v["ok"] for v in results.values())
    return {"healthy": healthy, "devices": results}
