import numpy as np
import pytest

from planer_tpu.ir import Graph, pack_weights, unpack_weights


def make_graph():
    d = {
        "input": ["x"],
        "inits": [["w", [4, 3], "float32"], ["b", [4], "float32"]],
        "layers": [["fc", "dense", {}], ["act", "relu", {}],
                   ["return", "return", {}]],
        "flow": [[["x", "w", "b"], ["fc"], "y"],
                 ["y", ["act"], "y2"],
                 ["y2", ["return"], "plrst"]],
    }
    return Graph.from_json_dict(d), d


def test_json_roundtrip():
    g, d = make_graph()
    assert g.to_json_dict() == d
    g2 = Graph.from_json(g.to_json())
    assert g2.to_json_dict() == d


def test_validate_catches_unknown_layer():
    g, _ = make_graph()
    g.flow[0].layers[0] = "nope"
    with pytest.raises(ValueError):
        g.validate()


def test_validate_catches_undefined_tensor():
    g, _ = make_graph()
    g.flow[0].src[0] = "ghost"
    with pytest.raises(ValueError):
        g.validate()


def test_liveness():
    g, _ = make_graph()
    life = g.liveness()
    assert life["x"] == 0 and life["y"] == 1 and life["y2"] == 2


def test_weight_blob_roundtrip(rng):
    g, _ = make_graph()
    w = rng.standard_normal((4, 3)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    blob = pack_weights([w, b])
    out = unpack_weights(g, blob)
    np.testing.assert_array_equal(out[0], w)
    np.testing.assert_array_equal(out[1], b)


def test_weight_blob_mixed_dtypes(rng):
    g, _ = make_graph()
    g.inits = [("w", (2, 2), "int8"), ("b", (3,), "int64"),
               ("s", (), "float32")]
    arrs = [np.arange(4, dtype=np.int8).reshape(2, 2),
            np.array([1, 2, 3], dtype=np.int64),
            np.float32(2.5).reshape(()) if False else np.array(2.5, np.float32)]
    blob = pack_weights(arrs)
    out = unpack_weights(g, blob)
    for a, o in zip(arrs, out):
        np.testing.assert_array_equal(a, o)


def test_short_blob_raises():
    g, _ = make_graph()
    with pytest.raises(ValueError):
        unpack_weights(g, np.zeros(3, np.uint8))
