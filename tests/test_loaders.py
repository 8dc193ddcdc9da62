"""Dataset loaders: KITTI-360 fixture tree and hand-encoded Waymo TFRecord."""

import os
import struct
import zlib

import numpy as np
import pytest

from lidar_rt_tpu.config import Args
from lidar_rt_tpu.data import kitti, proto_wire, waymo


# ---------- minimal protobuf ENCODER (test-side mirror of proto_wire) ----
def _varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        out += bytes([b | (0x80 if x else 0)])
        if not x:
            return out


def tag(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def enc_len(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + _varint(len(payload)) + payload


def enc_varint(field: int, v: int) -> bytes:
    return tag(field, 0) + _varint(v)


def enc_double(field: int, v: float) -> bytes:
    return tag(field, 1) + struct.pack("<d", v)


def enc_packed_doubles(field: int, vals) -> bytes:
    return enc_len(field, b"".join(struct.pack("<d", v) for v in vals))


def enc_packed_floats(field: int, vals) -> bytes:
    return enc_len(field, b"".join(struct.pack("<f", v) for v in vals))


def enc_packed_int32(field: int, vals) -> bytes:
    return enc_len(field, b"".join(_varint(v) for v in vals))


def _tfrecord_bytes(records) -> bytes:
    out = b""
    for r in records:
        out += struct.pack("<Q", len(r)) + b"\0" * 4 + r + b"\0" * 4
    return out


def _matrix_float(arr: np.ndarray) -> bytes:
    shape = enc_packed_int32(waymo.F_SHAPE_DIMS, list(arr.shape))
    return (enc_packed_floats(waymo.F_MATRIX_DATA, arr.reshape(-1).tolist())
            + enc_len(waymo.F_MATRIX_SHAPE, shape))


def _make_waymo_frame(h=8, w=32, frame_idx=0) -> bytes:
    rng = np.random.default_rng(frame_idx)
    extrinsic = np.eye(4, dtype=np.float64)
    extrinsic[2, 3] = 2.0
    beams = np.linspace(-0.3, 0.1, h)[::-1]  # descending? stored bottom-up
    calib = (enc_varint(waymo.F_CALIB_NAME, waymo.TOP_LIDAR)
             + enc_packed_doubles(waymo.F_CALIB_BEAM_INCLINATIONS,
                                  beams[::-1].tolist())
             + enc_len(waymo.F_CALIB_EXTRINSIC,
                       enc_packed_doubles(waymo.F_TRANSFORM,
                                          extrinsic.reshape(-1).tolist())))
    context = enc_len(waymo.F_CONTEXT_LASER_CALIBRATIONS, calib)

    pose = np.eye(4, dtype=np.float64)
    pose[0, 3] = frame_idx * 1.5

    ri = np.full((h, w, 4), -1.0, np.float32)
    ri[..., 0] = rng.uniform(2.0, 50.0, (h, w)).astype(np.float32)
    ri[..., 1] = rng.uniform(0.0, 2.0, (h, w)).astype(np.float32)
    ri[0, 0, 0] = -1.0  # a no-return pixel
    ri2 = np.zeros((h, w, 4), np.float32)

    def range_image(arr):
        return enc_len(waymo.F_RI_COMPRESSED,
                       zlib.compress(_matrix_float(arr)))

    laser = (enc_varint(waymo.F_LASER_NAME, waymo.TOP_LIDAR)
             + enc_len(waymo.F_LASER_RI_RETURN1, range_image(ri))
             + enc_len(waymo.F_LASER_RI_RETURN2, range_image(ri2)))

    box = (enc_double(waymo.F_BOX_CX, 10.0 + frame_idx)
           + enc_double(waymo.F_BOX_CY, -2.0)
           + enc_double(waymo.F_BOX_CZ, 0.8)
           + enc_double(waymo.F_BOX_LENGTH, 4.5)
           + enc_double(waymo.F_BOX_WIDTH, 2.0)
           + enc_double(waymo.F_BOX_HEIGHT, 1.6)
           + enc_double(waymo.F_BOX_HEADING, 0.2))
    label = (enc_len(waymo.F_LABEL_BOX, box)
             + enc_varint(waymo.F_LABEL_TYPE, waymo.TYPE_VEHICLE)
             + enc_len(waymo.F_LABEL_ID, b"veh_0"))
    # plus a pedestrian that must be ignored
    ped = (enc_len(waymo.F_LABEL_BOX, box)
           + enc_varint(waymo.F_LABEL_TYPE, 2)
           + enc_len(waymo.F_LABEL_ID, b"ped_0"))

    return (enc_len(waymo.F_FRAME_CONTEXT, context)
            + enc_len(waymo.F_FRAME_POSE,
                      enc_packed_doubles(waymo.F_TRANSFORM,
                                         pose.reshape(-1).tolist()))
            + enc_len(waymo.F_FRAME_LASERS, laser)
            + enc_len(waymo.F_FRAME_LASER_LABELS, label)
            + enc_len(waymo.F_FRAME_LASER_LABELS, ped)), ri


class TestProtoWire:
    def test_varint_roundtrip(self):
        buf = enc_varint(3, 300) + enc_varint(1, 0)
        f = proto_wire.fields(buf)
        assert f[3] == [300] and f[1] == [0]

    def test_packed_doubles(self):
        buf = enc_packed_doubles(2, [1.5, -2.25, 1e9])
        assert proto_wire.packed_doubles(proto_wire.fields(buf), 2) == \
            [1.5, -2.25, 1e9]


class TestWaymoLoader:
    @pytest.fixture()
    def segment_dir(self, tmp_path):
        records = []
        self.gt_ri = []
        for i in range(3):
            rec, ri = _make_waymo_frame(frame_idx=i)
            records.append(rec)
            self.gt_ri.append(ri)
        p = tmp_path / "segment-000.tfrecord"
        p.write_bytes(_tfrecord_bytes(records))
        return str(tmp_path)

    def test_load(self, segment_dir):
        args = Args({"frame_length": [0, 2], "dynamic": True})
        frames, tracks = waymo.load(segment_dir, args)
        assert frames.range1.shape == (3, 8, 32)
        # -1 pixels re-coded to 0; intensity clamped to 1
        assert frames.range1[0, 0, 0] == 0.0
        assert frames.intensity1.max() <= 1.0
        expected_rng = np.where(self.gt_ri[1][..., 0] == -1, 0,
                                self.gt_ri[1][..., 0])
        np.testing.assert_allclose(frames.range1[1], expected_rng)
        # pose = ego2world @ extrinsic
        np.testing.assert_allclose(frames.sensor2world[1, 0, 3], 1.5,
                                   atol=1e-6)
        np.testing.assert_allclose(frames.sensor2world[1, 2, 3], 2.0,
                                   atol=1e-6)
        # only the vehicle label became a track
        assert len(tracks) == 1
        assert tracks[0].object_id == "veh_0"
        np.testing.assert_allclose(np.asarray(tracks[0].size),
                                   [4.5, 2.0, 1.6])
        # box center transformed by ego pose
        np.testing.assert_allclose(
            np.asarray(tracks[0].translations[2]), [12.0 + 1.5 * 2, -2.0,
                                                    0.8], atol=1e-5)
        # cache created and reused
        assert os.path.exists(os.path.join(segment_dir, "cache",
                                           "frame_0_top.npz"))
        frames2, _ = waymo.load(segment_dir, args)
        np.testing.assert_allclose(frames2.range1, frames.range1)


class TestKittiLoader:
    @pytest.fixture()
    def kitti_dir(self, tmp_path):
        seq = "2013_05_28_drive_0000_sync"
        d = tmp_path / "data_3d_raw" / seq / "velodyne_points" / "data"
        d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for f in range(2):
            n = 5000
            az = rng.uniform(-np.pi, np.pi, n)
            incl = rng.uniform(kitti.INC_BOTTOM, kitti.INC_TOP, n)
            r = rng.uniform(2.0, 70.0, n)
            pts = np.stack([r * np.cos(incl) * np.cos(az),
                            r * np.cos(incl) * np.sin(az),
                            r * np.sin(incl),
                            rng.uniform(0, 1, n)], 1).astype(np.float32)
            pts.tofile(str(d / f"{f:010d}.bin"))
        pd = tmp_path / "data_pose" / seq
        pd.mkdir(parents=True)
        with open(pd / "poses.txt", "w") as fp:
            m = np.eye(4)
            fp.write("0 " + " ".join(str(v) for v in m[:3].reshape(-1))
                     + "\n")
            # frame 1 pose missing -> forward-filled
        bd = tmp_path / "data_3d_bboxes" / "train"
        bd.mkdir(parents=True)
        t = np.eye(4)
        t[:3, :3] = np.diag([4.0, 2.0, 1.5])
        t[:3, 3] = [5.0, 1.0, 0.5]
        xml = f"""<objects>
          <object>
            <label>car</label><instanceId>7</instanceId>
            <category>vehicle</category><timestamp>0</timestamp>
            <dynamic>1</dynamic>
            <transform><rows>4</rows><cols>4</cols>
              <data>{' '.join(str(v) for v in t.reshape(-1))}</data>
            </transform>
          </object>
          <object>
            <label>tree</label><instanceId>8</instanceId>
            <category>veg</category><timestamp>0</timestamp>
            <dynamic>0</dynamic>
            <transform><rows>4</rows><cols>4</cols>
              <data>{' '.join(str(v) for v in t.reshape(-1))}</data>
            </transform>
          </object>
        </objects>"""
        (bd / (seq + ".xml")).write_text(xml)
        return str(tmp_path)

    def test_load(self, kitti_dir):
        args = Args({"frame_length": [0, 1], "dynamic": True})
        frames, tracks = kitti.load(kitti_dir, args)
        assert frames.range1.shape == (2, 66, 1030)
        assert (frames.range1 > 0).mean() > 0.02
        # min-depth wins per cell: every nonzero cell <= 80
        assert frames.range1.max() <= kitti.MAX_DEPTH
        # missing pose forward-filled
        np.testing.assert_allclose(frames.sensor2world[0],
                                   frames.sensor2world[1])
        # bbox: car kept (size from SVD singular values), tree skipped
        assert len(tracks) == 1
        np.testing.assert_allclose(np.asarray(tracks[0].size),
                                   [4.0, 2.0, 1.5], atol=1e-5)
        np.testing.assert_allclose(np.asarray(tracks[0].translations[0]),
                                   [5.0, 1.0, 0.5], atol=1e-5)

    def test_raster_roundtrip_projection(self, kitti_dir):
        """Rasterized ranges re-project to the same cells via SensorGrid."""
        args = Args({"frame_length": [0, 0], "dynamic": False})
        frames, _ = kitti.load(kitti_dir, args)
        import jax.numpy as jnp
        from lidar_rt_tpu.core import rays as rays_lib
        rng_img = frames.range1[0]
        pts = np.asarray(frames.points_from_range(
            0, jnp.asarray(rng_img, jnp.float32)))
        mask = rng_img > 0
        r, c, rr = rays_lib.project_points(
            frames.grid, jnp.asarray(pts[mask]),
            jnp.asarray(np.linalg.inv(frames.sensor2world[0])), 1030)
        rows, cols = np.nonzero(mask)
        np.testing.assert_allclose(np.asarray(rr), rng_img[mask], rtol=1e-4)
        assert np.abs(np.asarray(r) - rows).max() < 0.51
        col_err = np.abs((np.asarray(c) - cols + 515) % 1030 - 515)
        assert col_err.max() < 0.51


class TestWriters:
    """Writers (data/writers.py) round-trip through the loaders — the
    format-true rehearsal machinery (synthetic segments at real shapes)."""

    def test_waymo_write_load_roundtrip(self, tmp_path):
        from lidar_rt_tpu.data import writers

        rng = np.random.default_rng(3)
        f_total, h, w = 3, 8, 32
        r1 = rng.uniform(2.0, 60.0, (f_total, h, w)).astype(np.float32)
        r1[:, 0, 0] = 0.0                      # dropped ray
        i1 = rng.uniform(0.0, 1.0, (f_total, h, w)).astype(np.float32)
        i1[r1 == 0] = 0.0
        r2 = np.where(rng.uniform(size=r1.shape) < 0.3,
                      r1 + 2.0, 0.0).astype(np.float32)
        i2 = np.where(r2 > 0, 0.5, 0.0).astype(np.float32)
        ego2world = np.tile(np.eye(4), (f_total, 1, 1))
        ego2world[:, 0, 3] = np.arange(f_total) * 1.5
        extrinsic = np.eye(4)
        extrinsic[2, 3] = 2.0
        beams = np.linspace(-0.3, 0.1, h)
        labels = [[("veh_0", np.array([10.0 + f, -2.0, 0.8]),
                    np.array([4.5, 2.0, 1.6]), 0.2)]
                  for f in range(f_total)]

        writers.write_waymo_segment(
            str(tmp_path), ego2world=ego2world, extrinsic=extrinsic,
            beam_inclinations=beams, range1=r1, intensity1=i1,
            range2=r2, intensity2=i2, labels_per_frame=labels)

        args = Args({"frame_length": [0, f_total - 1], "dynamic": True})
        frames, tracks = waymo.load(str(tmp_path), args)
        np.testing.assert_allclose(frames.range1, r1, rtol=1e-6)
        np.testing.assert_allclose(frames.intensity1, i1, rtol=1e-6)
        np.testing.assert_allclose(frames.range2, r2, rtol=1e-6)
        np.testing.assert_allclose(frames.sensor2world[1, 0, 3], 1.5,
                                   atol=1e-6)
        np.testing.assert_allclose(frames.sensor2world[1, 2, 3], 2.0,
                                   atol=1e-6)
        assert len(tracks) == 1 and tracks[0].object_id == "veh_0"
        np.testing.assert_allclose(
            np.asarray(tracks[0].translations[2]),
            [10.0 + 2 + 2 * 1.5, -2.0, 0.8], atol=1e-5)

    def test_kitti_write_load_roundtrip(self, tmp_path):
        from lidar_rt_tpu.data import synthetic, writers
        from lidar_rt_tpu.core import rays as rays_lib

        # Synthetic GT at the exact KITTI raster; the writer back-projects
        # to .bin points and the loader re-rasterizes them.
        scene = synthetic.default_scene(with_actor=False)
        grid = rays_lib.SensorGrid.from_bounds(
            kitti.H, (kitti.INC_BOTTOM, kitti.INC_TOP), pixel_offset=0.0,
            angle_offset=0.0)
        f_total = 2
        poses = np.tile(np.eye(4, dtype=np.float64), (f_total, 1, 1))
        poses[:, 2, 3] = 1.8
        poses[:, 0, 3] = np.arange(f_total) * 0.5
        r1 = np.zeros((f_total, kitti.H, kitti.W), np.float32)
        i1 = np.zeros_like(r1)
        for f in range(f_total):
            r1[f], i1[f] = synthetic.render_frame_gt(scene, grid, kitti.W,
                                                     poses[f], f)

        t_box = np.eye(4)
        t_box[:3, :3] = np.diag([4.0, 2.0, 1.5])
        t_box[:3, 3] = [6.0, 1.0, 0.5]
        writers.write_kitti360_sequence(
            str(tmp_path), seq="0000", sensor2world=poses,
            range1=r1, intensity1=i1,
            boxes=[("11", {0: t_box, 1: t_box})])

        args = Args({"frame_length": [0, 1], "dynamic": True})
        frames, tracks = kitti.load(str(tmp_path), args)
        # Re-rasterization reproduces the source raster cell-for-cell,
        # except column 0: its azimuth is exactly +-pi and arctan2 sign
        # noise wraps it out of range (the reference rasterizer drops the
        # same seam column, kitti_loader/__init__.py:186-241).
        hit = r1 > 0
        hit[:, :, 0] = False
        np.testing.assert_array_equal(frames.range1[:, :, 1:] > 0,
                                      hit[:, :, 1:])
        np.testing.assert_allclose(frames.range1[hit], r1[hit], rtol=1e-4)
        np.testing.assert_allclose(frames.intensity1[hit], i1[hit],
                                   atol=1e-5)
        np.testing.assert_allclose(frames.sensor2world, poses, atol=1e-5)
        assert len(tracks) == 1
        np.testing.assert_allclose(np.asarray(tracks[0].size),
                                   [4.0, 2.0, 1.5], atol=1e-5)
