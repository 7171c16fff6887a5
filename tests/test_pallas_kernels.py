import jax.numpy as jnp
import numpy as np

from slam_robot_tpu.ops import pyramid as pyr
from slam_robot_tpu.ops.pallas import blur as pblur


def test_pallas_blur_matches_xla(rng):
    img = rng.uniform(size=(48, 64)).astype(np.float32)
    ref = np.asarray(pyr.blur(jnp.asarray(img), 1.1))
    out = np.asarray(pblur.blur(jnp.asarray(img), 1.1, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_blur_constant_preserved(rng):
    img = np.full((32, 40), 0.7, np.float32)
    out = np.asarray(pblur.blur(jnp.asarray(img), 0.8, interpret=True))
    np.testing.assert_allclose(out, 0.7, atol=1e-6)


def test_pallas_blur_reference_resolution(rng):
    img = rng.uniform(size=(480, 640)).astype(np.float32)
    ref = np.asarray(pyr.blur(jnp.asarray(img), 1.1))
    out = np.asarray(pblur.blur(jnp.asarray(img), 1.1, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_pyrdown_matches_xla(rng):
    for h, w in ((48, 64), (47, 63), (480, 640)):
        img = rng.uniform(size=(h, w)).astype(np.float32)
        ref = np.asarray(pyr.pyr_down(jnp.asarray(img)))
        out = np.asarray(pblur.pyr_down(jnp.asarray(img), interpret=True))
        assert out.shape == ref.shape == ((h + 1) // 2, (w + 1) // 2)
        np.testing.assert_allclose(out, ref, atol=1e-5)
