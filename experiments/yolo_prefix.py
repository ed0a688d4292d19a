"""Per-stage time attribution of the quantized YOLO-v3 program (VERDICT r4
item 5: "attribute YOLO's step — heads/upsample/concat glue vs convs").

Same method as profile_prefix.py: truncated flow prefixes, compiled and
timed with the on-device fori_loop difference quotient; successive deltas
attribute the step including all glue.  Boundaries: early backbone, the
three FPN taps (c3/c4/c5), and each detection head.

Usage: python experiments/yolo_prefix.py [batch]
Writes experiments/yolo_prefix_b{batch}.json
"""
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from planer_tpu import models
from planer_tpu.ir import FlowEdge
from planer_tpu.quant import calibrate_act_scales, make_quant_program
from planer_tpu.models import eval as ev

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SIZE = 416


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def truncated(graph, k, ret_layer):
    g = copy.deepcopy(graph)
    last_dst = g.flow[k - 1].dst[0]
    g.flow = g.flow[:k] + [FlowEdge([last_dst], [ret_layer], ["plrst"],
                                    True, True)]
    return g


def time_loop(call, x, n1=10, n2=510, reps=3):
    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = call(x, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(n1)
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9)


def main():
    net = models.yolov3()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(1, (3, SIZE, SIZE),
                                                  seed=11, batch=1))
    net.quantize("int8", activations="static")
    net.astype_compute("bfloat16")
    graph = net.graph
    ret_layer = graph.flow[-1].layers[0]

    want = ["d3.act", "r3.7.add", "r4.7.add", "r5.3.add",
            "det32.out", "det16.out", "det8.out"]
    marks = []
    for i, e in enumerate(graph.flow):
        for ln in e.layers:
            if ln in want:
                marks.append((ln, i + 1))
    marks.append(("full", len(graph.flow)))
    log("boundaries:", marks)

    x = jax.device_put(jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, 3, SIZE, SIZE)).astype(np.float32)))

    results, prev = [], 0.0
    for name, k in marks:
        g = truncated(graph, k, ret_layer) if k < len(graph.flow) else graph
        prog = make_quant_program(g, net.weights, compute_dtype="bfloat16")
        fn_, _ = prog._build_fn({}, [])
        params = prog.params

        @jax.jit
        def loop(x, n, fn_=fn_, params=params):
            def step(i, x):
                out = jax.tree.leaves(fn_(params, x))[0]
                return x + jnp.sum(out).astype(x.dtype) * 1e-30
            return lax.fori_loop(0, n, step, x)

        t0 = time.perf_counter()
        dt = time_loop(loop, x)
        log(f"{name:<12} k={k:<4} cum {dt*1e3:7.3f} ms  "
            f"delta {(dt-prev)*1e3:7.3f} ms   (compile+run "
            f"{time.perf_counter()-t0:.0f}s)")
        results.append({"boundary": name, "edges": k, "cum_ms": dt * 1e3,
                        "delta_ms": (dt - prev) * 1e3})
        prev = dt

    path = f"experiments/yolo_prefix_b{BATCH}.json"
    with open(path, "w") as f:
        json.dump({"batch": BATCH, "stages": results}, f, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
