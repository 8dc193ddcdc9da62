"""Native C++ ingest vs the pure-Python wire parser."""

import numpy as np
import pytest

from lidar_rt_tpu import native

from tests.test_loaders import _make_waymo_frame, _tfrecord_bytes

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native ingest unavailable: {native.build_error()}")


class TestNativeIngest:
    def test_tfrecord_index(self):
        recs = [_make_waymo_frame(frame_idx=i)[0] for i in range(3)]
        buf = _tfrecord_bytes(recs)
        offs, lens = native.tfrecord_index(buf)
        assert len(offs) == 3
        for i, (o, ln) in enumerate(zip(offs, lens)):
            assert buf[o:o + ln] == recs[i]

    def test_frame_decode_matches_python(self):
        rec, ri = _make_waymo_frame(h=8, w=32, frame_idx=2)
        fd = native.waymo_decode_frame(rec)
        # pose
        assert fd.pose[0, 3] == pytest.approx(2 * 1.5)
        assert fd.extrinsic[2, 3] == pytest.approx(2.0)
        # beam table
        assert fd.beams.shape == (8,)
        # range image roundtrip (exact: zlib + packed floats)
        np.testing.assert_array_equal(fd.r1, ri)
        assert fd.r2.shape == (8, 32, 4)
        # labels: vehicle + pedestrian both decoded (filtering is the
        # loader's job); box layout cx cy cz w l h heading type
        assert len(fd.boxes) == 2
        veh = fd.boxes[0]
        assert veh[0] == pytest.approx(10.0 + 2)
        assert veh[3] == pytest.approx(2.0)   # width (field 4)
        assert veh[4] == pytest.approx(4.5)   # length (field 5)
        assert veh[6] == pytest.approx(0.2)   # heading
        assert veh[7] == 1                    # TYPE_VEHICLE
        assert fd.box_ids[0] == "veh_0"

    def test_loader_native_matches_python(self, tmp_path):
        recs = [_make_waymo_frame(frame_idx=i)[0] for i in range(2)]
        (tmp_path / "segment-0.tfrecord").write_bytes(_tfrecord_bytes(recs))
        from lidar_rt_tpu.config import Args
        from lidar_rt_tpu.data import waymo
        args = Args({"frame_length": [0, 1], "dynamic": True})
        f_native, t_native = waymo.load(str(tmp_path), args,
                                        use_native=True)
        # wipe the cache so the python path decodes from scratch
        import shutil
        shutil.rmtree(tmp_path / "cache")
        f_py, t_py = waymo.load(str(tmp_path), args, use_native=False)
        np.testing.assert_allclose(f_native.range1, f_py.range1)
        np.testing.assert_allclose(f_native.sensor2world, f_py.sensor2world)
        np.testing.assert_allclose(np.asarray(t_native[0].translations),
                                   np.asarray(t_py[0].translations),
                                   atol=1e-6)
