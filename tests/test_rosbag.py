"""rosbag (v2.0) container + generic message codec + bag->COLMAP conversion.

Fixture bags are synthesized with the module's own BagWriter (chunked,
none/bz2) and must convert to the SAME COLMAP layout as the .gstream path
(VERDICT r3 item 5: users with reference captures migrate offline)."""
import os

import numpy as np
import pytest

from gs_tpu.io_live import rosbag as rb
from gs_tpu.io_live.stream import write_stream_file
from tests.test_io_live import make_frame


def header(i, stamp):
    return {"seq": i, "stamp": rb.RosTime(int(stamp),
                                          int((stamp % 1) * 1e9)),
            "frame_id": "cam"}


def image_msg(i, stamp, img):
    h, w = img.shape[:2]
    return {"header": header(i, stamp), "height": h, "width": w,
            "encoding": "rgb8", "is_bigendian": 0, "step": w * 3,
            "data": img.tobytes()}


def camera_info_msg(i, stamp, K, w, h):
    return {"header": header(i, stamp), "height": h, "width": w,
            "distortion_model": "plumb_bob", "D": np.zeros(5),
            "K": np.asarray(K).ravel(), "R": np.eye(3).ravel(),
            "P": np.zeros(12), "binning_x": 0, "binning_y": 0,
            "roi": {"x_offset": 0, "y_offset": 0, "height": 0, "width": 0,
                    "do_rectify": False}}


def pose_msg(i, stamp, qvec, tvec):
    return {"header": header(i, stamp),
            "pose": {"position": dict(zip("xyz", map(float, tvec))),
                     "orientation": {"x": float(qvec[1]), "y": float(qvec[2]),
                                     "z": float(qvec[3]),
                                     "w": float(qvec[0])}}}


def cloud_msg(i, stamp, pts):
    pts = np.asarray(pts, "<f4")
    fields = [{"name": n, "offset": 4 * k, "datatype": 7, "count": 1}
              for k, n in enumerate("xyz")]
    return {"header": header(i, stamp), "height": 1, "width": len(pts),
            "fields": fields, "is_bigendian": False, "point_step": 12,
            "row_step": 12 * len(pts), "data": pts.tobytes(),
            "is_dense": True}


def visual_merged_msg(i, stamp, frame):
    h, w = frame.image.shape[:2]
    return {"Image": image_msg(i, stamp, frame.image),
            "CameraInfo": camera_info_msg(i, stamp, frame.K, w, h),
            "CameraPose": {
                "header": header(i, stamp), "child_frame_id": "cam",
                "transform": {
                    "translation": dict(zip("xyz", map(float, frame.tvec))),
                    "rotation": {"x": float(frame.qvec[1]),
                                 "y": float(frame.qvec[2]),
                                 "z": float(frame.qvec[3]),
                                 "w": float(frame.qvec[0])}}},
            "Local_Map": cloud_msg(i, stamp,
                                   frame.points if frame.points is not None
                                   else np.zeros((0, 3)))}


def test_md5_matches_published_ros_constants():
    """The genmsg md5 algorithm against published type hashes — proves our
    embedded definitions AND the hash computation are the real schemas."""
    assert (rb.message_md5("std_msgs/Header", rb.HEADER_DEF)
            == "2176decaecbce78abc3b96ef049fabed")
    assert (rb.message_md5("sensor_msgs/Image", rb.IMAGE_DEF)
            == "060021388200f6f0f447d0fcd9c64743")
    assert (rb.message_md5("geometry_msgs/PoseStamped", rb.POSE_STAMPED_DEF)
            == "d3812c3cbc69362b77dc0b19b345f8f5")
    assert (rb.message_md5("sensor_msgs/PointCloud2", rb.POINTCLOUD2_DEF)
            == "1158d486dd51d683ce2f1be655c3c181")


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip(tmp_path, rng, compression):
    path = str(tmp_path / f"t_{compression}.bag")
    img = rng.integers(0, 255, (8, 6, 3), dtype=np.uint8)
    w = rb.BagWriter(path, compression=compression)
    w.write("/camera/color/image_raw", "sensor_msgs/Image", rb.IMAGE_DEF,
            image_msg(0, 1.5, img), t=1.5)
    w.write("/orb_slam3/camera_pose", "geometry_msgs/PoseStamped",
            rb.POSE_STAMPED_DEF,
            pose_msg(0, 1.5, [1.0, 0, 0, 0], [4, 5, 6]), t=1.5)
    w.flush()       # second chunk
    w.write("/camera/color/image_raw", "sensor_msgs/Image", rb.IMAGE_DEF,
            image_msg(1, 1.6, img), t=1.6)
    w.close()

    msgs = list(rb.read_bag_messages(path))
    assert [m.topic for m in msgs] == ["/camera/color/image_raw",
                                       "/orb_slam3/camera_pose",
                                       "/camera/color/image_raw"]
    m0 = rb.decode_message(msgs[0])
    assert (m0.height, m0.width, m0.encoding) == (8, 6, "rgb8")
    assert m0.header.stamp.to_sec() == pytest.approx(1.5)
    np.testing.assert_array_equal(
        np.asarray(m0.data).reshape(8, 6, 3), img)
    m1 = rb.decode_message(msgs[1])
    assert m1.pose.position.y == 5.0
    assert m1.pose.orientation.w == 1.0
    # topic filter
    only = list(rb.read_bag_messages(path,
                                     topics=["/orb_slam3/camera_pose"]))
    assert len(only) == 1


def _write_orb_bag(path, frames):
    w = rb.BagWriter(path, compression="bz2")
    K = frames[0].K
    h, wd = frames[0].image.shape[:2]
    w.write("/camera/color/camera_info", "sensor_msgs/CameraInfo",
            rb.CAMERA_INFO_DEF, camera_info_msg(0, frames[0].stamp, K,
                                                wd, h), t=frames[0].stamp)
    pts = np.concatenate([f.points for f in frames
                          if f.points is not None])
    for i, f in enumerate(frames):
        w.write("/camera/color/image_raw", "sensor_msgs/Image",
                rb.IMAGE_DEF, image_msg(i, f.stamp, f.image), t=f.stamp)
        # pose 5 ms later than the image (inside the 33 ms sync threshold)
        w.write("/orb_slam3/camera_pose", "geometry_msgs/PoseStamped",
                rb.POSE_STAMPED_DEF,
                pose_msg(i, f.stamp + 0.005, f.qvec, f.tvec),
                t=f.stamp + 0.005)
    w.write("/orb_slam3/all_points", "sensor_msgs/PointCloud2",
            rb.POINTCLOUD2_DEF, cloud_msg(0, frames[-1].stamp, pts),
            t=frames[-1].stamp)
    w.close()


def test_frames_from_orb_bag_pairing(tmp_path, rng):
    frames = [make_frame(rng, i, with_points=(i == 0)) for i in range(6)]
    path = str(tmp_path / "orb.bag")
    _write_orb_bag(path, frames)
    got = rb.frames_from_bag(path)
    assert len(got) == 6
    for f, g in zip(frames, got):
        np.testing.assert_array_equal(g.image, f.image)
        np.testing.assert_allclose(g.qvec, f.qvec, atol=1e-12)
        np.testing.assert_allclose(g.tvec, f.tvec, atol=1e-12)
        np.testing.assert_allclose(g.K, f.K)
    assert got[0].points is not None and got[1].points is None


def test_convert_stream_bag_equals_gstream(tmp_path, rng):
    """The reference-artifact migration path: a .bag converts to the SAME
    COLMAP layout as the equivalent .gstream recording."""
    from gs_tpu.apps import convert_stream
    from gs_tpu.data import colmap
    frames = [make_frame(rng, i, with_points=(i == 0)) for i in range(6)]

    gst = str(tmp_path / "run.gstream")
    write_stream_file(gst, frames, encoding="png")
    out_g = str(tmp_path / "from_gstream")
    convert_stream.main(["--input", gst, "--output", out_g, "--every", "2",
                         "--voxel_size", "0.25"])

    bag = str(tmp_path / "run.bag")
    _write_orb_bag(bag, frames)
    out_b = str(tmp_path / "from_bag")
    convert_stream.main(["--input", bag, "--output", out_b, "--every", "2",
                         "--voxel_size", "0.25"])

    eg = colmap.read_extrinsics_text(os.path.join(out_g,
                                                  "sparse/0/images.txt"))
    eb = colmap.read_extrinsics_text(os.path.join(out_b,
                                                  "sparse/0/images.txt"))
    assert len(eb) == len(eg) == 3
    for k in eg:
        np.testing.assert_allclose(eb[k].qvec, eg[k].qvec, atol=1e-9)
        np.testing.assert_allclose(eb[k].tvec, eg[k].tvec, atol=1e-9)
    ig = colmap.read_intrinsics_text(os.path.join(out_g,
                                                  "sparse/0/cameras.txt"))
    ib = colmap.read_intrinsics_text(os.path.join(out_b,
                                                  "sparse/0/cameras.txt"))
    np.testing.assert_allclose(ib[1].params, ig[1].params)
    assert os.path.exists(os.path.join(out_b, "sparse/0/points3D.ply"))


def test_visual_merged_bag(tmp_path, rng):
    frames = [make_frame(rng, i, with_points=True) for i in range(4)]
    path = str(tmp_path / "vm.bag")
    w = rb.BagWriter(path, compression="bz2")
    for i, f in enumerate(frames):
        w.write("/Visual_Merged", "gs_slam_msgs/visual_merged_msg",
                rb.VISUAL_MERGED_DEF, visual_merged_msg(i, f.stamp, f),
                t=f.stamp)
    w.close()

    got = rb.frames_from_visual_merged(path, points_every=2)
    assert len(got) == 4
    np.testing.assert_array_equal(got[2].image, frames[2].image)
    np.testing.assert_allclose(got[1].qvec, frames[1].qvec, atol=1e-12)
    np.testing.assert_allclose(got[3].tvec, frames[3].tvec, atol=1e-12)
    assert got[0].points is not None and got[1].points is None
    np.testing.assert_allclose(got[0].points, frames[0].points, atol=1e-6)

    # end-to-end through the converter in auto-detect mode
    from gs_tpu.apps import convert_stream
    out = str(tmp_path / "colmap_vm")
    convert_stream.main(["--input", path, "--output", out, "--every", "1",
                         "--voxel_size", "0.25"])
    from gs_tpu.data import colmap
    extr = colmap.read_extrinsics_text(os.path.join(out,
                                                    "sparse/0/images.txt"))
    assert len(extr) == 4


def test_cloud_field_offsets(rng):
    """XYZRGB-padded clouds decode via declared offsets (the reference's
    fff-at-0 assumption breaks on these; ref: convert_orb_topic.py:203)."""
    pts = rng.normal(size=(10, 3)).astype("<f4")
    raw = np.zeros((10, 8), "<f4")
    raw[:, 2:5] = pts      # x/y/z at byte offsets 8, 12, 16
    fields = [{"name": n, "offset": 8 + 4 * k, "datatype": 7, "count": 1}
              for k, n in enumerate("xyz")]
    msg = {"header": header(0, 0.0), "height": 1, "width": 10,
           "fields": fields, "is_bigendian": False, "point_step": 32,
           "row_step": 320, "data": raw.tobytes(), "is_dense": True}
    raw_bytes = rb.encode_message("sensor_msgs/PointCloud2",
                                  rb.POINTCLOUD2_DEF, msg)
    dec, off = rb._decode_struct(
        rb.MessageSchema("sensor_msgs/PointCloud2", rb.POINTCLOUD2_DEF),
        "sensor_msgs/PointCloud2", raw_bytes, 0)
    assert off == len(raw_bytes)
    np.testing.assert_allclose(rb._cloud_to_xyz(dec), pts, atol=1e-7)
