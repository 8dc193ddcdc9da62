"""Pure-math core: quaternions, spherical harmonics, ray grids, transforms.

Everything here is pure JAX, shape-polymorphic, CPU-testable, and free of
framework state.  These functions define the numerical conventions used by
every other layer (quaternion layout, SH basis, range-image pixel mapping).
"""

from lidar_rt_tpu.core import quaternions, rays, sh, transforms  # noqa: F401
