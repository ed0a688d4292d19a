"""Native model zoo: flow-IR builders for the reference's demo families."""
from .builder import GraphBuilder
from .resnet import resnet18, resnet50
from .unet import unet
from .yolov3 import yolov3, YOLO_ANCHORS
from . import eval
from . import yolo_post

__all__ = ["GraphBuilder", "resnet18", "resnet50", "unet", "yolov3",
           "YOLO_ANCHORS", "yolo_post"]
