"""Compute ops: the differentiable surfel tracer and its support kernels.

- composite:    semantics-defining dense oracle renderer (pure JAX autodiff)
- geometry:     analytic ray <-> surfel-plane intersection math (shared)
- binning:      surfel -> range-image tile binning for the tiled tracer
- tracer:       public trace() API dispatching dense / Pallas paths
- knn:          Morton-windowed nearest-neighbour queries (scale/normal init)
- chamfer:      tiled bidirectional Chamfer distance
- ssim:         windowed SSIM on range images
"""
