"""Demo: multi-host sharded serving — the full north-star composition.

On a real pod each host runs this same script; here it runs single-process
on the 8-virtual-device CPU mesh. The pieces compose as:

  multihost.initialize()  -> jax.distributed bring-up (timeout-guarded)
  make_mesh + shard_program -> weights TP-sharded, batch DP over the mesh
  ServingEngine            -> continuous batching into the sharded program
  health_check             -> per-device liveness between batches
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
import jax
# default to the virtual CPU mesh; set PLANER_EXAMPLE_TPU=1 on a real pod
if os.environ.get("PLANER_EXAMPLE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
import numpy as np

import planer_tpu as pt
from planer_tpu import models
from planer_tpu.parallel import make_mesh, shard_program
from planer_tpu.parallel.multihost import health_check

# on a pod: pt.parallel.multihost.initialize(timeout_s=120)
net = models.resnet50(num_classes=128)
net.quantize("int8")
mesh = make_mesh((4, 2), ("data", "model"), devices=jax.devices()[:8])
shard_program(net, mesh)

print("health:", health_check(deadline_s=30)["healthy"])
with pt.ServingEngine(net, buckets=(4, 8, 16), max_delay_ms=10) as eng:
    futs = [eng.submit(np.random.randn(3, 64, 64).astype(np.float32))
            for _ in range(24)]
    outs = [f.result() for f in futs]
    print("served", len(outs), "requests on mesh", dict(mesh.shape))
    print("stats:", eng.stats())
