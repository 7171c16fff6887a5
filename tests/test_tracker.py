import jax
import jax.numpy as jnp
import numpy as np

from slam_robot_tpu.ops import patch as patch_ops
from slam_robot_tpu.ops import pyramid as pyr
from slam_robot_tpu.ops import tracker


def make_texture(rng, h=120, w=160, smooth=2.0):
    """Multi-scale random texture that tracking can lock onto at every
    pyramid level (fine noise + upsampled coarse noise)."""
    img = rng.uniform(size=(h, w)).astype(np.float32)
    img = np.asarray(pyr.blur(jnp.asarray(img), smooth))
    coarse = rng.uniform(size=(h // 16 + 1, w // 16 + 1)).astype(np.float32)
    coarse = np.kron(coarse, np.ones((16, 16), np.float32))[:h, :w]
    coarse = np.asarray(pyr.blur(jnp.asarray(coarse), 3.0))
    return 0.5 * img + 0.5 * coarse


def shift_image(img, dx, dy):
    """Bilinearly sample img at (x - dx, y - dy): features move by (+dx,+dy)."""
    h, w = img.shape
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    xs = np.clip(x - dx, 0, w - 1.001)
    ys = np.clip(y - dy, 0, h - 1.001)
    x0 = xs.astype(int)
    y0 = ys.astype(int)
    fx = xs - x0
    fy = ys - y0
    out = (
        (1 - fy) * (1 - fx) * img[y0, x0]
        + (1 - fy) * fx * img[y0, x0 + 1]
        + fy * (1 - fx) * img[y0 + 1, x0]
        + fy * fx * img[y0 + 1, x0 + 1]
    )
    return out.astype(np.float32)


WEIGHT = patch_ops.radial_mask(13)


def track_one(img_a, img_b, pt, lvls, depth=6):
    pa = pyr.build_pyramid(jnp.asarray(img_a), depth=depth)
    pb = pyr.build_pyramid(jnp.asarray(img_b), depth=depth)
    patches = tracker.get_patch_stack(pa, jnp.asarray(pt, jnp.float32))
    return tracker.track_feature(pb, patches, jnp.asarray(pt, jnp.float32), lvls, WEIGHT)


def test_track_subpixel_shift(rng):
    img = make_texture(rng)
    dx, dy = 0.4, -0.3
    img2 = shift_image(img, dx, dy)
    out, ok = track_one(img, img2, [80.0, 60.0], 3)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(out), [80.0 + dx, 60.0 + dy], atol=0.1)


def test_track_multi_pixel_shift(rng):
    img = make_texture(rng)
    dx, dy = 6.5, -4.25
    img2 = shift_image(img, dx, dy)
    out, ok = track_one(img, img2, [80.0, 60.0], 3)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(out), [80.0 + dx, 60.0 + dy], atol=0.15)


def test_track_large_shift_needs_levels(rng):
    # a 22px shift is unreachable with 10 clamped Newton steps at fine
    # levels alone; the 5-level coarse-to-fine cascade recovers it
    # (matcher retries at more levels for exactly this, matcher.cpp:248)
    img = make_texture(rng, h=240, w=320)
    dx, dy = 22.0, 13.0
    img2 = shift_image(img, dx, dy)
    out5, ok5 = track_one(img, img2, [160.0, 120.0], 5, depth=5)
    assert bool(ok5)
    np.testing.assert_allclose(np.asarray(out5), [160.0 + dx, 120.0 + dy], atol=0.3)


def test_track_gain_bias_change(rng):
    # photometric invariance: brightness scaling between frames
    img = make_texture(rng)
    img2 = shift_image(img, 2.0, 1.0) * 1.5
    out, ok = track_one(img, img2, [80.0, 60.0], 3)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(out), [82.0, 61.0], atol=0.15)


def test_track_out_of_bounds(rng):
    img = make_texture(rng)
    pa = pyr.build_pyramid(jnp.asarray(img), depth=3)
    patches = tracker.get_patch_stack(pa, jnp.array([80.0, 60.0]))
    # start way outside: must fail, not NaN
    out, ok = tracker.track_feature(pa, patches, jnp.array([-50.0, -50.0]), 3, WEIGHT)
    assert not bool(ok)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bidirectional_accepts_true_match(rng):
    img = make_texture(rng)
    img2 = shift_image(img, 3.0, -2.0)
    pa = pyr.build_pyramid(jnp.asarray(img), depth=6)
    pb = pyr.build_pyramid(jnp.asarray(img2), depth=6)
    out, ok = tracker.track_bidirectional(
        pa, pb, jnp.array([80.0, 60.0]), jnp.array([80.0, 60.0]), 3, WEIGHT
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(out), [83.0, 58.0], atol=0.15)


def test_bidirectional_rejects_decorrelated(rng):
    img = make_texture(rng)
    other = make_texture(np.random.default_rng(99))
    pa = pyr.build_pyramid(jnp.asarray(img), depth=6)
    pb = pyr.build_pyramid(jnp.asarray(other), depth=6)
    _, ok = tracker.track_bidirectional(
        pa, pb, jnp.array([80.0, 60.0]), jnp.array([80.0, 60.0]), 3, WEIGHT
    )
    assert not bool(ok)


def test_vmapped_batch_tracking(rng):
    img = make_texture(rng)
    img2 = shift_image(img, 1.5, 2.5)
    pa = pyr.build_pyramid(jnp.asarray(img), depth=6)
    pb = pyr.build_pyramid(jnp.asarray(img2), depth=6)
    pts = jnp.asarray(
        rng.uniform(30, 90, size=(16, 2)).astype(np.float32)
    )
    lvls = jnp.full(16, 3, jnp.int32)

    def one(pt, lv):
        return tracker.track_bidirectional(pa, pb, pt, pt, lv, WEIGHT)

    outs, oks = jax.jit(jax.vmap(one))(pts, lvls)
    assert outs.shape == (16, 2)
    good = np.asarray(oks)
    assert good.mean() > 0.8
    err = np.linalg.norm(np.asarray(outs) - (np.asarray(pts) + np.array([1.5, 2.5])), axis=1)
    assert np.all(err[good] < 0.2)
