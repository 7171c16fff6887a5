"""Pure geometry and image kernels (no map state).

Everything here is a plain function over jnp arrays, written single-instance
and composed with vmap/jit by callers. These are the numerical foundations:

- ``quaternion``  Eigen-convention (xyzw) quaternion algebra + tangent retraction
- ``projection``  camera model: distortion, plane<->pixel, project/unproject
- ``epipolar``    essential matrix + epipolar residuals
- ``pyramid``     Gaussian image pyramids
- ``patch``       sub-pixel bilinear patch extraction + photometric scoring
- ``tracker``     batched coarse-to-fine Newton patch tracker
- ``corners``     Shi-Tomasi corner detection + occupancy suppression
- ``ba``          Schur-complement Levenberg-Marquardt bundle adjustment
"""
