"""Stateful-but-functional subsystems composed from ops/.

- ``localmap``  the world model: fixed-capacity SoA pytree of cameras,
                frames, points and observations + all maintenance ops
- ``matcher``   feature lifecycle: track-forward, keyframe decisions,
                new-feature seeding
- ``slam``      bundle-adjustment windows over the map (solve_frames etc.)
- ``pipeline``  the full per-frame perceive->match->map step
- ``planner``   Dubins shortest paths
- ``vehicle``   bicycle-model dynamics + host actuator shim
- ``renderer``  synthetic camera frames from the landmark map
- ``sim``       closed-loop perceive->plan->act rollouts
"""
