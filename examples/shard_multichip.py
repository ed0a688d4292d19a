"""Demo: DP x TP sharding over a device mesh (runs on 8 virtual CPU devices
when no multi-chip TPU is attached)."""
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
from planer_tpu import models
from planer_tpu.parallel import make_mesh, shard_program

net = models.resnet18(num_classes=64)
net.quantize("int8")
mesh = make_mesh((2, 4), ("data", "model"), devices=jax.devices()[:8])
shard_program(net, mesh)
x = np.random.randn(8, 3, 64, 64).astype(np.float32)
out = np.asarray(net(x))
print("mesh:", dict(mesh.shape), "out:", out.shape)
