"""Demo: YOLO-v3 detection — jitted multi-scale heads on device, box decode
+ native C++ NMS on host."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
from planer_tpu import models, native

net = models.yolov3()          # 80 classes, random weights
img = next(models.eval.synthetic_images(1, (3, 416, 416), seed=3, batch=1))
dets = models.yolo_post.detect(net, img, conf_thresh=0.3)
print(f"native NMS: {native.available()}")
print(f"{len(dets[0])} detections: [x1 y1 x2 y2 score class]")
for row in dets[0][:10]:
    print(np.round(row, 1))
