"""Presets + unclassified-cloud API parity."""

import numpy as np
import jax.numpy as jnp

from lidar_odometry_demo_tpu import models
from lidar_odometry_demo_tpu.config import TINY
from lidar_odometry_demo_tpu.ops import classifier
from tests.test_classifier import _synthetic_scan


def test_presets_are_valid_configs():
    for factory in (models.vlp16_default, models.vlp16_fast,
                    models.vlp16_high_accuracy, models.tiny_test):
        cfg = factory()
        assert cfg.lidar_max_range > cfg.lidar_min_range
        assert cfg.max_match_points > 0


def test_unclassified_mask_partitions_cells(rng):
    cfg = TINY
    scan = _synthetic_scan(rng, cfg)
    planar, org, curv = classifier.classify(scan, cfg)
    uncls = classifier.unclassified_mask(planar.valid, curv, cfg)
    planar_img = np.asarray(planar.valid).reshape(cfg.num_rings, cfg.scan_width)
    uncls = np.asarray(uncls)
    # disjoint
    assert not np.any(planar_img & uncls)
    # planar + unclassified = all in-window cells below the invalid marker
    k = cfg.normals_window
    rows = np.arange(cfg.num_rings)[:, None]
    cols = np.arange(cfg.scan_width)[None, :]
    in_window = (rows >= 1) & (cols >= k) & (cols < cfg.scan_width - k)
    expected = in_window & (np.asarray(curv) < cfg.curvature_invalid_value)
    np.testing.assert_array_equal(planar_img | uncls, expected)
