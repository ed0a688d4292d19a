"""Tiled inference: blending parity with whole-image execution."""
import numpy as np

from planer_tpu.utils.tile import tile, grid_slice, make_slice
from planer_tpu.utils.image import resize, mapcoord, uniform_filter, gaussian_filter


def test_make_slice_covers():
    sls = make_slice(100, 40, 10)
    assert sls[0].start == 0 and sls[-1].stop == 100
    cover = np.zeros(100)
    for s in sls:
        cover[s] += 1
    assert (cover >= 1).all()


def test_grid_slice():
    rcs = grid_slice(64, 96, 32, 32, 8)
    assert all(r.stop - r.start == 32 and c.stop - c.start == 32
               for r, c in rcs)


def test_tile_identity_blend(rng):
    """Tiling an identity function must reproduce the input exactly where
    windows overlap (triangular ramp blending, util.py:326-343 semantics)."""
    img = rng.standard_normal((100, 120)).astype(np.float32)
    out = tile(window=48, margin=8, glob=1)(lambda t: t)(img)
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_tile_channels(rng):
    img = rng.standard_normal((80, 80, 3)).astype(np.float32)
    out = tile(window=48, margin=8)(lambda t: t * 2)(img)
    np.testing.assert_allclose(out, img * 2, rtol=1e-5, atol=1e-5)


def test_tile_small_image_no_tiling(rng):
    img = rng.standard_normal((30, 30)).astype(np.float32)
    out = tile(window=64, glob=2)(lambda t: t + 1)(img)
    assert out.shape == (30, 30)


def test_tile_scale_aware(rng):
    """Output scale k=2 (super-resolution style)."""
    img = rng.standard_normal((64, 64)).astype(np.float32)

    def sr(t):
        return np.repeat(np.repeat(t, 2, 0), 2, 1)

    out = tile(window=32, margin=8)(sr)(img)
    assert out.shape == (128, 128)
    np.testing.assert_allclose(out, sr(img), rtol=1e-5, atol=1e-5)


def test_resize_shapes(rng):
    img = rng.standard_normal((20, 30, 3)).astype(np.float32)
    out = resize(img, (40, 15))
    assert out.shape == (40, 15, 3)
    # resize to the same size is identity
    np.testing.assert_allclose(resize(img, (20, 30)), img, rtol=1e-5, atol=1e-6)


def test_mapcoord_identity(rng):
    img = rng.standard_normal((10, 10)).astype(np.float32)
    rs, cs = np.meshgrid(np.arange(10, dtype=np.float32),
                         np.arange(10, dtype=np.float32), indexing="ij")
    np.testing.assert_allclose(mapcoord(img, rs, cs), img, rtol=1e-5, atol=1e-5)


def test_filters_preserve_mean(rng):
    img = rng.standard_normal((32, 32)).astype(np.float32) + 5
    for f in (lambda m: uniform_filter(m, 3), lambda m: gaussian_filter(m, 1.5)):
        out = f(img)
        assert out.shape == img.shape
        assert abs(out.mean() - img.mean()) < 0.1


def test_unet_tiled_vs_whole(rng):
    """SURVEY §4.6: tiled UNet inference approximates whole-image inference;
    with margin >= the receptive-field radius the interior matches tightly
    and the blended overlap error stays small."""
    import jax
    from planer_tpu import models
    net = models.unet(in_ch=1, out_ch=1, base=8, depth=2)
    img = rng.standard_normal((96, 128)).astype(np.float32)

    def run(win2d):
        return np.asarray(net(win2d[None, None].astype(np.float32)))[0, 0]

    whole = run(img)
    tiled = tile(window=64, margin=24, glob=4)(run)(img)
    assert tiled.shape == whole.shape
    # interior pixels (away from window seams' receptive-field truncation)
    err = np.abs(tiled - whole)
    assert np.median(err) < 5e-3, float(np.median(err))
    assert err.mean() < 2e-2, float(err.mean())
