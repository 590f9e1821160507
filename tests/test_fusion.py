"""Sensor-fusion helpers: timestamp pairing + IMU yaw correction."""
import numpy as np
import pytest

from gs_tpu.io_live.fusion import (Stamped, imu_yaw_correction,
                                   nearest_within, pair_streams,
                                   quat_multiply, yaw_quaternion)


def test_nearest_within():
    stamps = [0.0, 0.1, 0.2, 0.3]
    assert nearest_within(stamps, 0.11, tol=0.05) == 1
    assert nearest_within(stamps, 0.16, tol=0.05) == 2   # 0.04 from 0.2
    assert nearest_within(stamps, 0.4, tol=0.05) is None
    assert nearest_within(stamps, 0.29, tol=0.05) == 3
    assert nearest_within([], 0.1) is None


def test_pair_streams_drops_unmatched():
    cams = [Stamped(t, f"img{i}") for i, t in enumerate([0.0, 0.1, 0.5])]
    gps = [Stamped(t + 0.01, f"gps{i}") for i, t in enumerate([0.0, 0.1])]
    imu = [Stamped(t - 0.02, f"imu{i}") for i, t in enumerate([0.0, 0.1, 0.5])]
    fused = pair_streams(cams, gps, imu, tol=0.05)
    assert fused == [("img0", "gps0", "imu0"), ("img1", "gps1", "imu1")]


def test_yaw_correction():
    ident = np.array([1.0, 0, 0, 0])
    # static -90deg offset rotates a forward vector to the right
    q = imu_yaw_correction(ident, t=0.0, t0=0.0)
    qq = yaw_quaternion(-np.pi / 2)
    np.testing.assert_allclose(q, qq, atol=1e-12)
    # drift accumulates linearly
    q2 = imu_yaw_correction(ident, t=10.0, t0=0.0, static_offset=0.0,
                            drift_rate=0.01)
    np.testing.assert_allclose(q2, yaw_quaternion(0.1), atol=1e-12)
    # quat_multiply matches rotation composition
    a, b = yaw_quaternion(0.3), yaw_quaternion(0.5)
    np.testing.assert_allclose(quat_multiply(a, b), yaw_quaternion(0.8),
                               atol=1e-12)


def test_icp_recovers_perturbed_pose(rng):
    """Point-to-point ICP must undo a small synthetic pose drift
    (ref capability: convert_visual_merged_msg.py:393-432)."""
    from gs_tpu.io_live.pointcloud import icp_point_to_point, transform_points
    # structured cloud (grid + noise) so correspondences are informative
    g = np.stack(np.meshgrid(np.linspace(0, 2, 12), np.linspace(0, 1, 8),
                             np.linspace(0, 1.5, 10)), -1).reshape(-1, 3)
    target = g + rng.normal(0, 0.002, g.shape)
    ang = 0.04                                  # ~2.3 deg drift
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    t = np.array([0.05, -0.03, 0.02])
    source = target @ R.T + t                   # drifted copy
    T, rmse, n_in = icp_point_to_point(source, target, max_corr_dist=0.25)
    assert n_in > 800
    aligned = transform_points(source, T)
    assert np.abs(aligned - target).max() < 0.01
    assert rmse < 0.01
