"""Demo: ResNet-18 classification (reference readme.md:58-82 flow).

Builds the native ResNet-18, quantizes to INT8 with bf16 compute, and
classifies a synthetic image. Swap in `pt.read_net("resnet18.onnx")` or
`pt.torch2planer(torchvision_model, "resnet18")` for real weights.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import planer_tpu as pt
from planer_tpu import models

net = models.resnet18()
net.quantize("int8").astype_compute("bfloat16")

x = next(models.eval.synthetic_images(1, (3, 224, 224), seed=7, batch=1))
logits = np.asarray(net(x))[0]
top5 = np.argsort(-logits)[:5]
print("top-5 class ids:", top5.tolist())
print("top-5 scores  :", np.round(logits[top5], 3).tolist())
print("timing: use bench.py for on-device step times")
