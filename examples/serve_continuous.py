"""Demo: continuous-batching serving front end with shape buckets."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import threading
import numpy as np
import planer_tpu as pt
from planer_tpu import models

net = models.resnet18(num_classes=100)
eng = pt.ServingEngine(net, buckets=(1, 2, 4, 8), max_delay_ms=10)

imgs = [np.random.randn(3, 64, 64).astype(np.float32) for _ in range(32)]
futs = [eng.submit(im) for im in imgs]
outs = [f.result() for f in futs]
print("served", len(outs), "requests;", "stats:", eng.stats())
eng.close()
