"""Serving-path benchmark on the real TPU (VERDICT r4 item 7).

Drives runtime/serving.ServingEngine (continuous batching) under concurrent
closed-loop clients and reports p50/p99 request latency, batch occupancy,
and img/s — then states the gap vs the raw on-device program step.

Environment caveat (part of the result, not an excuse): the TPU sits behind
a relay with ~45 ms per-dispatch round trip and ~28 MB/s host<->device
bandwidth, so every `net(batch)` the engine issues pays
  45 ms + batch * 0.6 MB / 28 MB/s
before the ~2 ms on-device step even starts.  The serving numbers below are
therefore RELAY-bound; the engine-overhead component is isolated separately
with a no-op backend (`--fake`), and the gap statement decomposes
  request latency = relay RTT + host transfer + on-device step + engine.

Usage: python experiments/serving_bench.py [n_requests] [clients] [--fake]
Writes experiments/serving_bench.json (merging keys "tpu" / "fake").
"""
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_REQ = int(sys.argv[1]) if len(sys.argv) > 1 else 192
CLIENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
FAKE = "--fake" in sys.argv
SHAPE = (3, 224, 224)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_backend():
    if FAKE:
        # no-op backend: isolates the engine's own queueing/padding/crop
        # overhead from the device path
        def fake_net(x):
            return np.zeros((x.shape[0], 1000), np.float32)
        return fake_net, None
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from planer_tpu import models
    from planer_tpu.quant import calibrate_act_scales
    from planer_tpu.models import eval as ev
    net = models.resnet18()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(4, SHAPE, seed=11, batch=2))
    net.quantize("int8", activations="static")
    net.astype_compute("bfloat16")
    return net, net


def main():
    from planer_tpu.runtime.serving import ServingEngine

    backend, net = build_backend()
    buckets = (1, 2, 4, 8, 16, 32)
    eng = ServingEngine(backend, buckets=buckets, max_delay_ms=5.0)

    # warm every bucket shape first (compiles are minutes through the
    # relay; they must not pollute the latency distribution)
    if not FAKE:
        for b in buckets:
            t0 = time.perf_counter()
            backend(np.zeros((b,) + SHAPE, np.float32))
            log(f"warm bucket {b}: {time.perf_counter()-t0:.1f}s")

    imgs = [np.random.default_rng(i).standard_normal(SHAPE).astype(np.float32)
            for i in range(8)]
    lats = []
    lock = threading.Lock()
    counter = {"n": 0}

    def client():
        while True:
            with lock:
                if counter["n"] >= N_REQ:
                    return
                i = counter["n"]
                counter["n"] += 1
            t0 = time.perf_counter()
            y = eng.infer(imgs[i % len(imgs)])
            dt = time.perf_counter() - t0
            assert np.isfinite(np.asarray(y)).all()
            with lock:
                lats.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    eng_stats = eng.stats()
    eng.close()

    lats.sort()
    rec = {
        "n_requests": N_REQ,
        "clients": CLIENTS,
        "wall_s": round(wall, 2),
        "img_s": round(N_REQ / wall, 1),
        "p50_ms": round(statistics.median(lats) * 1e3, 1),
        "p99_ms": round(lats[max(0, int(len(lats) * 0.99) - 1)] * 1e3, 1),
        "engine_stats": {k: v for k, v in eng_stats.items()
                         if not isinstance(v, dict)},
    }
    log(f"{'fake' if FAKE else 'tpu'}: {rec}")
    path = "experiments/serving_bench.json"
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["fake" if FAKE else "tpu"] = rec
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
