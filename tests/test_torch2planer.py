"""torch2planer (fx) converter: torch modules -> IR, numerically matching
torch eval-mode outputs."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from planer_tpu.frontend.torch2planer import fx_to_graph, torch2planer
from planer_tpu.ir import unpack_weights
from planer_tpu.runtime.net import Net
from planer_tpu import read_net


def _run_both(model, x, tol=1e-4):
    model = model.eval()
    with torch.no_grad():
        ref = model(torch.from_numpy(x))
    graph, blob = fx_to_graph(model)
    net = Net(graph, unpack_weights(graph, blob))
    out = net.forward(x, engine="numpy")
    if isinstance(ref, (tuple, list)):
        for r, o in zip(ref, out):
            np.testing.assert_allclose(np.asarray(o), r.numpy(),
                                       rtol=tol, atol=tol)
    else:
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   rtol=tol, atol=tol)
    return net


def test_small_cnn(rng):
    model = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1), nn.BatchNorm2d(8), nn.ReLU(),
        nn.MaxPool2d(2), nn.Conv2d(8, 16, 3, padding=1, stride=2),
        nn.ReLU(), nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(16, 5))
    # non-trivial BN stats
    model[1].running_mean.normal_(0, 0.5)
    model[1].running_var.uniform_(0.5, 2.0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    _run_both(model, x)


class ResBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.c1 = nn.Conv2d(c, c, 3, padding=1)
        self.b1 = nn.BatchNorm2d(c)
        self.c2 = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        y = F.relu(self.b1(self.c1(x)))
        return F.relu(self.c2(y) + x)


def test_residual_and_functional(rng):
    model = nn.Sequential(nn.Conv2d(3, 8, 1), ResBlock(8))
    x = rng.standard_normal((1, 3, 12, 12)).astype(np.float32)
    _run_both(model, x)


class UNetMini(nn.Module):
    def __init__(self):
        super().__init__()
        self.d = nn.Conv2d(1, 8, 3, padding=1)
        self.up = nn.ConvTranspose2d(8, 4, 2, stride=2)
        self.pool = nn.MaxPool2d(2)
        self.head = nn.Conv2d(12, 1, 1)

    def forward(self, x):
        a = F.relu(self.d(x))
        b = self.pool(a)
        c = self.up(b)
        d = torch.cat([c, a], 1)
        return torch.sigmoid(self.head(d))


def test_convtranspose_and_cat(rng):
    x = rng.standard_normal((1, 1, 16, 16)).astype(np.float32)
    _run_both(UNetMini(), x)


def test_view_reshape(rng):
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(27, 9)

        def forward(self, x):
            return self.fc(torch.flatten(x, 1))

    x = rng.standard_normal((2, 3, 3, 3)).astype(np.float32)
    _run_both(M(), x)


def test_upsample_and_leaky(rng):
    model = nn.Sequential(nn.Conv2d(2, 4, 1), nn.LeakyReLU(0.1),
                          nn.Upsample(scale_factor=2, mode="nearest"))
    x = rng.standard_normal((1, 2, 5, 5)).astype(np.float32)
    _run_both(model, x)


def test_torch2planer_pla_roundtrip(rng, tmp_path):
    model = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.ReLU(),
                          nn.AdaptiveAvgPool2d(1), nn.Flatten(),
                          nn.Linear(4, 2))
    p = str(tmp_path / "m")
    out_path = torch2planer(model, p)
    assert out_path.endswith(".pla")
    net = read_net(p)
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = model.eval()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(net.forward(x, engine="numpy")),
                               ref, rtol=1e-4, atol=1e-4)


def test_unsupported_module_raises():
    model = nn.Sequential(nn.Conv2d(3, 4, 1), nn.GLU(dim=1))
    with pytest.raises(NotImplementedError):
        fx_to_graph(model)


def test_bilinear_upsample_coordinates(rng):
    """torch bilinear (align_corners=False) uses half-pixel coords; the
    lowering must match torch numerically, not just structurally."""
    for align in (False, True):
        model = nn.Sequential(
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=align))
        x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
        _run_both(model, x, tol=1e-5)


def test_interpolate_functional_bilinear(rng):
    class M(nn.Module):
        def forward(self, x):
            return F.interpolate(x, scale_factor=2, mode="bilinear",
                                 align_corners=False)

    x = rng.standard_normal((1, 2, 5, 5)).astype(np.float32)
    _run_both(M(), x, tol=1e-5)


def test_modern_activations(rng):
    model = nn.Sequential(nn.Conv2d(3, 8, 1), nn.GELU(), nn.Conv2d(8, 8, 1),
                          nn.SiLU(), nn.Conv2d(8, 8, 1), nn.ReLU6(),
                          nn.Hardswish(), nn.Softplus())
    x = rng.standard_normal((1, 3, 6, 6)).astype(np.float32)
    _run_both(model, x, tol=1e-4)


def test_prelu_and_functional_silu(rng):
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(2, 4, 1)
            self.p = nn.PReLU(4)

        def forward(self, x):
            return F.silu(self.p(self.c(x)))

    x = rng.standard_normal((2, 2, 5, 5)).astype(np.float32)
    _run_both(M(), x, tol=1e-4)


def test_functional_avg_pool_positional_padding(rng):
    """F.avg_pool2d(x, 3, 1, 1) — padding positional, torch default
    count_include_pad=True; and the count_include_pad=False variant."""
    class M1(nn.Module):
        def forward(self, x):
            return F.avg_pool2d(x, 3, 1, 1)

    class M2(nn.Module):
        def forward(self, x):
            return F.avg_pool2d(x, 3, stride=1, padding=1,
                                count_include_pad=False)

    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    _run_both(M1(), x, tol=1e-5)
    _run_both(M2(), x, tol=1e-5)


def test_functional_max_pool_positional(rng):
    class M(nn.Module):
        def forward(self, x):
            return F.max_pool2d(x, 2, 2, 0)

    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    _run_both(M(), x, tol=1e-6)


def test_view_size_positional_ok_and_computed_raises(rng):
    """x.view(x.size(0), -1) lowers to reshape [0, -1]; a COMPUTED dynamic
    dim (x.size(0) at the wrong position, or arithmetic) must fail loudly
    instead of silently producing a wrong reshape target."""
    class Ok(nn.Module):
        def forward(self, x):
            return x.view(x.size(0), -1)

    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    _run_both(Ok(), x)

    class Bad(nn.Module):
        def forward(self, x):
            return x.view(x.size(0) * x.size(1), -1)

    from planer_tpu.frontend.torch2planer import torch2planer
    with pytest.raises(NotImplementedError, match="reshape"):
        torch2planer(Bad(), torch.from_numpy(x))

    class Misplaced(nn.Module):
        def forward(self, x):
            # size(1) used at position 0 — NOT keep-input-dim semantics
            return x.view(x.size(1), -1)

    with pytest.raises(NotImplementedError, match="reshape"):
        torch2planer(Misplaced(), torch.from_numpy(x))
