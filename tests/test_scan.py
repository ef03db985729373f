"""Laser-scan ingestion semantics (`NDTFrame::loadLaser`, ndtframe.cpp:144-185)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ndtpso_slam_tpu.config import MapConfig, ScanConfig
from ndtpso_slam_tpu.models.scan import load_laser

CFG = ScanConfig(max_beams=16, ignore_epsilon=0.1)


def test_range_filters():
    # > 0, < max_range, > epsilon (ndtframe.cpp:165)
    ranges = np.array([0.0, 0.05, 0.1, 0.11, 5.0, 29.9, 30.0, 35.0], np.float32)
    sc = load_laser(ranges, 0.0, 0.1, 30.0, CFG)
    valid = np.asarray(sc.valid)[:8]
    assert list(valid) == [False, False, False, True, True, True, False, False]


def test_polar_conversion_and_angles():
    ranges = np.full(4, 2.0, np.float32)
    sc = load_laser(ranges, 0.0, np.pi / 2, 30.0, CFG)
    p = np.asarray(sc.points)[:4]
    np.testing.assert_allclose(p[0], [2, 0], atol=1e-6)
    np.testing.assert_allclose(p[1], [0, 2], atol=1e-6)
    np.testing.assert_allclose(p[2], [-2, 0], atol=1e-6)
    np.testing.assert_allclose(p[3], [0, -2], atol=1e-6)


def test_padding_is_invalid():
    sc = load_laser(np.full(4, 2.0, np.float32), 0.0, 0.1, 30.0, CFG)
    assert sc.points.shape == (16, 2)
    assert not np.asarray(sc.valid)[4:].any()


def test_mount_transform_applied():
    # TRANSFORM_POINTS_AT_LOAD with a latched base<-scan transform
    # (ndtframe.cpp:174-177): x-forward 0.65 m like launch/scan.launch.
    ranges = np.array([1.0], np.float32)
    mount = np.array([0.65, 0.0, np.pi / 2], np.float32)
    sc = load_laser(ranges, 0.0, 0.1, 30.0, CFG, mount=mount)
    np.testing.assert_allclose(np.asarray(sc.points)[0], [0.65, 1.0], atol=1e-6)
    # near-zero mount is skipped entirely
    sc2 = load_laser(ranges, 0.0, 0.1, 30.0, CFG, mount=np.zeros(3, np.float32))
    np.testing.assert_allclose(np.asarray(sc2.points)[0], [1.0, 0.0], atol=1e-6)


def test_frame_border_invalidation():
    # Points outside the map frame are dropped at load, like addPoint's
    # bounds check (ndtframe.cpp:220-223).
    map_cfg = MapConfig(size_m=4.0, cell_side_m=1.0)
    ranges = np.array([1.0, 3.0], np.float32)
    sc = load_laser(ranges, 0.0, 0.0, 30.0, ScanConfig(max_beams=4), map_cfg)
    valid = np.asarray(sc.valid)
    assert valid[0] and not valid[1]  # 3.0 > half size 2.0


def test_oversized_scan_rejected():
    with pytest.raises(AssertionError, match="max_beams"):
        load_laser(np.ones(20, np.float32), 0.0, 0.1, 30.0, CFG)
