"""lidar_rt_tpu — a TPU-native differentiable LiDAR re-simulation framework.

A from-scratch JAX/Pallas rebuild of the capabilities of zju3dv/LiDAR-RT
(CVPR 2025, arXiv 2412.15199): dynamic driving scenes represented as 2D
Gaussian surfels (background + per-actor clouds), differentiably ray-traced
against LiDAR scan patterns to produce per-ray depth, intensity, ray-hit and
ray-drop channels, optimized against recorded Waymo / KITTI-360 range images,
with a U-Net ray-drop refinement stage.

Architecture stance (TPU-first, not a port):
  * The reference's OptiX BVH over per-splat proxy triangles exists only to
    locate ray <-> splat-plane intersections.  Those are analytic
    (t = n.(mu - o) / n.d), and LiDAR rays form a structured spherical
    raster, so the engine here is a spherical-tile rasterizer: surfels are
    binned to range-image tiles, hits are composited front-to-back with a
    masked cumulative-transmittance formulation that is fully vectorized
    (no per-ray sequential k-buffer, no atomics).
  * Gradients are hand-derived VJPs accumulated with segment-sums.
  * Scene state lives in fixed-capacity padded pytrees (alive masks), so
    densify/prune never changes jit shapes.
  * Multi-chip scaling shards rays over an ICI mesh with replicated
    Gaussians and gradient psum (see lidar_rt_tpu.parallel).
"""

__version__ = "0.1.0"
