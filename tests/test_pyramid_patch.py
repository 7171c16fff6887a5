import jax.numpy as jnp
import numpy as np

from slam_robot_tpu.ops import patch as patch_ops
from slam_robot_tpu.ops import pyramid as pyr


def lvl_args(lvl):
    return lvl  # (img, w, h)


def raw_level(img):
    """(padded_img, w, h) for a raw [H,W] f32 image, no blurring."""
    img = jnp.asarray(img, jnp.float32)
    return (
        jnp.pad(img, pyr.PAD, mode="edge"),
        img.shape[1],
        img.shape[0],
    )


def test_pyramid_shapes():
    img = np.zeros((480, 640, 3), np.uint8)
    p = pyr.build_pyramid(img, depth=6)
    sizes = list(zip(np.asarray(p.heights).tolist(), np.asarray(p.widths).tolist()))
    assert sizes == [(480, 640), (240, 320), (120, 160), (60, 80), (30, 40), (15, 20)]
    assert p.data.shape == (6, 480 + 16, 640 + 16)


def test_pyramid_constant_image():
    img = np.full((64, 64), 0.5, np.float32)
    p = pyr.build_pyramid(img, depth=3)
    for l in range(3):
        h = int(p.heights[l]) + 2 * pyr.PAD
        w = int(p.widths[l]) + 2 * pyr.PAD
        np.testing.assert_allclose(np.asarray(p.data[l, :h, :w]), 0.5, atol=1e-6)


def test_grey_weights():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 255  # pure red
    g = pyr.to_grey(img)
    np.testing.assert_allclose(np.asarray(g), 0.299, atol=1e-3)


def test_gaussian_kernel_normalized():
    k = pyr.gaussian_kernel(1.1, 5)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, atol=1e-6)
    assert float(k[2]) > float(k[1]) > float(k[0])


def test_extract_integer_center_exact(rng):
    img = rng.uniform(size=(40, 50)).astype(np.float32)
    lvl = raw_level(img)
    p = patch_ops.extract(*lvl_args(lvl), jnp.array([20.0, 15.0]), 13)
    np.testing.assert_allclose(np.asarray(p.data), img[15 - 6 : 15 + 7, 20 - 6 : 20 + 7], atol=1e-6)
    assert bool(jnp.all(p.valid))


def test_extract_half_pixel_average(rng):
    img = rng.uniform(size=(40, 50)).astype(np.float32)
    lvl = raw_level(img)
    p = patch_ops.extract(*lvl_args(lvl), jnp.array([20.5, 15.0]), 13)
    expect = 0.5 * (img[9:22, 14:27] + img[9:22, 15:28])
    np.testing.assert_allclose(np.asarray(p.data), expect, atol=1e-6)


def test_extract_border_validity(rng):
    img = rng.uniform(size=(40, 50)).astype(np.float32)
    lvl = raw_level(img)
    p = patch_ops.extract(*lvl_args(lvl), jnp.array([2.0, 20.0]), 13)  # 4 columns OOB left
    v = np.asarray(p.valid)
    assert not v[:, :4].any() and v[:, 4:].all()


def test_radial_mask_matches_reference_formula():
    m = np.asarray(patch_ops.radial_mask(13, 15.0))
    # mean normalized to 1 (hessian.h:22-28)
    np.testing.assert_allclose(m.mean(), 1.0, atol=1e-6)
    # center-offset convention: r computed about 0.5*size = 6.5
    raw = 1.0 / (15.0 + (6.5 - 6) ** 2 * 2)
    scale = m.mean() * 169 / np.sum(1.0 / (15.0 + ((6.5 - np.arange(13))[None, :] ** 2 + (6.5 - np.arange(13))[:, None] ** 2)))
    np.testing.assert_allclose(m[6, 6], raw * scale, rtol=1e-5)


def test_score_identical_zero(rng):
    img = rng.uniform(size=(40, 50)).astype(np.float32)
    lvl = raw_level(img)
    w = patch_ops.radial_mask(13)
    p = patch_ops.extract(*lvl_args(lvl), jnp.array([20.0, 15.0]), 13)
    assert float(patch_ops.score(p, p, w)) < 1e-8


def test_score_gain_invariant(rng):
    img = rng.uniform(0.2, 0.8, size=(40, 50)).astype(np.float32)
    lvl1 = raw_level(img)
    lvl2 = raw_level(img * 1.7)  # pure gain change
    w = patch_ops.radial_mask(13)
    p1 = patch_ops.extract(*lvl_args(lvl1), jnp.array([20.0, 15.0]), 13)
    p2 = patch_ops.extract(*lvl_args(lvl2), jnp.array([20.0, 15.0]), 13)
    assert float(patch_ops.score(p1, p2, w)) < 1e-6


def test_score_discriminates(rng):
    img = rng.uniform(size=(40, 50)).astype(np.float32)
    lvl = raw_level(img)
    w = patch_ops.radial_mask(13)
    p1 = patch_ops.extract(*lvl_args(lvl), jnp.array([20.0, 15.0]), 13)
    p2 = patch_ops.extract(*lvl_args(lvl), jnp.array([30.0, 25.0]), 13)
    assert float(patch_ops.score(p1, p2, w)) > 0.1
