"""Component-level TPU timing: pyramid / matcher / BA / maintenance.

Times each stage of the pipeline separately (own jit each) on the real
device, steady-state, to target optimization work. Not a benchmark — see
bench.py for the headline number.

    python tools/profile_tpu.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=10, warmup=2, **kw):
    import jax

    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from slam_robot_tpu.config import SlamConfig
    from slam_robot_tpu.models import localmap as lm
    from slam_robot_tpu.models import pipeline, renderer, slam
    from slam_robot_tpu.ops import pyramid as pyr
    from slam_robot_tpu.ops import quaternion as quat
    from slam_robot_tpu.utils import synthetic

    cfg = SlamConfig()
    k = jnp.asarray(synthetic.reference_intrinsics(cfg))
    world, bright = renderer.make_world(800, seed=0)
    img = renderer.render(quat.identity(), jnp.zeros(3), k, world, bright,
                          height=cfg.image_height, width=cfg.image_width)
    img = jax.device_put(img)

    print(f"device: {jax.devices()[0]}")

    # pyramid
    t = timeit(lambda: pyr.build_pyramid(img, cfg.pyramid_depth))
    print(f"pyramid:            {t*1000:8.2f} ms")

    # render (sim cost)
    t = timeit(lambda: renderer.render(quat.identity(), jnp.zeros(3), k, world,
                                       bright, height=cfg.image_height,
                                       width=cfg.image_width))
    print(f"render:             {t*1000:8.2f} ms")

    # full pipeline, tracking only
    ps = pipeline.init(cfg)
    ps, _ = pipeline.step(ps, img, cfg, run_slam=False)  # bootstrap (KF)
    t = timeit(lambda: pipeline.step(ps, img, cfg, run_slam=False)[0].map.n_obs, n=5)
    print(f"step (no slam):     {t*1000:8.2f} ms")

    # full pipeline
    ps2 = pipeline.init(cfg)
    for i in range(3):
        ps2, _ = pipeline.step(ps2, img, cfg)
    t = timeit(lambda: pipeline.step(ps2, img, cfg)[0].map.n_obs, n=5)
    print(f"step (full):        {t*1000:8.2f} ms")

    # BA windows on a synthetic map
    scene = synthetic.build_scene(cfg, n_frames=20, n_points=800,
                                  pixel_noise=0.3, point_noise=30.0)
    s = scene.state
    t = timeit(lambda: slam.solve_frames(s, 2, 5, 2.0, cfg)[1].cost, n=5)
    print(f"BA window (2,5):    {t*1000:8.2f} ms")
    t = timeit(lambda: slam.solve_frames(s, 10, 20, 2.0, cfg)[1].cost, n=5)
    print(f"BA window (10,20):  {t*1000:8.2f} ms")

    # maintenance
    t = timeit(lambda: lm.reproject(s)[1])
    print(f"reproject:          {t*1000:8.2f} ms")
    t = timeit(lambda: lm.clean(s, 5.0, cfg)[0].n_obs)
    print(f"clean:              {t*1000:8.2f} ms")
    t = timeit(lambda: lm.apply_epipolar_constraint(s, cfg).n_obs)
    print(f"epipolar:           {t*1000:8.2f} ms")


if __name__ == "__main__":
    main()
