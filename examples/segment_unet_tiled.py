"""Demo: UNet segmentation with tiled big-image inference
(reference tile() pattern, util.py:291-348)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import planer_tpu as pt
from planer_tpu import models

net = models.unet(in_ch=1, out_ch=1, base=16, depth=3)

big = np.random.default_rng(0).standard_normal((700, 900)).astype(np.float32)

def run_window(img2d):
    out = np.asarray(net(img2d[None, None]))
    return out[0, 0]

seg = pt.tile(window=256, margin=24, glob=8)(run_window)
mask = seg(big)
print("input ", big.shape, "-> mask", mask.shape,
      "range [%.3f, %.3f]" % (mask.min(), mask.max()))
