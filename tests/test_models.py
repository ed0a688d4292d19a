"""Model-level parity: jitted XLA execution vs numpy oracle for the zoo."""
import numpy as np
import pytest

from planer_tpu import models


def _parity(net, x, tol=5e-3):
    ref = net.forward(x, engine="numpy")
    out = net.forward(x)
    if not isinstance(ref, tuple):
        ref, out = (ref,), (out,)
    for r, o in zip(ref, out):
        r, o = np.asarray(r), np.asarray(o)
        assert r.shape == o.shape
        denom = np.abs(r).max() + 1e-9
        assert np.abs(o - r).max() / denom < tol, (
            f"max rel err {np.abs(o - r).max() / denom}")


def test_resnet18_parity(rng):
    net = models.resnet18(num_classes=10)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    _parity(net, x)


def test_resnet18_shapes(rng):
    net = models.resnet18()
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    out = np.asarray(net.forward(x))
    assert out.shape == (2, 1000)


def test_resnet50_parity(rng):
    net = models.resnet50(num_classes=10)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    _parity(net, x)


def test_unet_parity(rng):
    net = models.unet(in_ch=1, out_ch=2, base=8, depth=3)
    x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    _parity(net, x)
    out = np.asarray(net.forward(x))
    assert out.shape == (1, 2, 64, 64)


def test_unet_upsample_variant(rng):
    net = models.unet(in_ch=1, out_ch=1, base=8, depth=2,
                      upsample_mode="upsample")
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    _parity(net, x)


def test_yolov3_heads(rng):
    net = models.yolov3(num_classes=4)
    x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    out = net.forward(x)
    assert isinstance(out, tuple) and len(out) == 3
    shapes = [np.asarray(o).shape for o in out]
    assert shapes[0] == (1, 27, 4, 4)     # stride 32
    assert shapes[1] == (1, 27, 8, 8)     # stride 16
    assert shapes[2] == (1, 27, 16, 16)   # stride 8


@pytest.mark.slow
def test_yolov3_parity(rng):
    net = models.yolov3(num_classes=4)
    x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    _parity(net, x, tol=1e-2)


def test_yolo_decode_and_nms(rng):
    heads = [rng.standard_normal((1, 27, s, s)).astype(np.float32)
             for s in (4, 8, 16)]
    dec = models.yolo_post.decode_heads(heads, img_size=128, num_classes=4)
    total = 3 * (4 * 4 + 8 * 8 + 16 * 16)
    assert dec.shape == (1, total, 9)
    # decode ranges: xy within image bounds, obj/cls in (0,1)
    assert (dec[..., 4:] >= 0).all() and (dec[..., 4:] <= 1).all()
    boxes = np.array([[10, 10, 8, 8], [11, 11, 8, 8], [50, 50, 10, 10]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = models.yolo_post.nms(boxes, scores, iou_thresh=0.45)
    assert 0 in keep and 2 in keep and 1 not in keep


def test_yolov3_detect_pipeline(rng):
    net = models.yolov3(num_classes=4)
    x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    dets = models.yolo_post.detect(net, x, conf_thresh=0.3)
    assert len(dets) == 1
    assert dets[0].ndim == 2 and dets[0].shape[1] == 6


def test_resnet18_quantized(rng):
    net = models.resnet18(num_classes=10)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    net.quantize("int8")
    out = np.asarray(net.forward(x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, f"int8 rel err {rel}"
