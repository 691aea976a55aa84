"""Eval metric semantics tests (reference utils/misc.py:85-98, logger.py:193-247)."""
import numpy as np

from vfdepth_tpu.utils.metrics import cal_depth_error, compute_depth_metrics, pretty_ts


def test_cal_depth_error_perfect():
    d = np.random.RandomState(0).uniform(1, 50, 1000)
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = cal_depth_error(d, d)
    assert abs_rel == 0 and sq_rel == 0 and rmse == 0 and rmse_log == 0
    assert a1 == a2 == a3 == 1.0


def test_cal_depth_error_known():
    target = np.asarray([10.0, 20.0])
    pred = np.asarray([12.0, 20.0])  # +20% on one
    abs_rel, sq_rel, rmse, _, a1, _, _ = cal_depth_error(pred, target)
    np.testing.assert_allclose(abs_rel, (2 / 10) / 2, atol=1e-6)
    np.testing.assert_allclose(sq_rel, (4 / 10) / 2, atol=1e-6)
    np.testing.assert_allclose(rmse, np.sqrt(2.0), atol=1e-6)
    assert a1 == 1.0  # 1.2 < 1.25


def test_compute_depth_metrics_median_scaling():
    """Median scaling must fix a global scale error exactly."""
    rng = np.random.RandomState(1)
    b, cams, h, w = 1, 2, 20, 24
    gt = rng.uniform(5.0, 60.0, (b, cams, h, w, 1)).astype(np.float32)
    pred = gt / 2.0  # half scale
    mask = np.ones_like(gt)
    metric, median, scales = compute_depth_metrics(gt, pred, mask, 0.0, 80.0)
    # metric-scale abs_rel should be ~0.5; median-scaled ~0
    assert abs(metric["abs_rel"] - 0.5) < 1e-3
    assert median["abs_rel"] < 1e-3
    assert all(abs(s - 2.0) < 0.01 for s in scales)


def test_compute_depth_metrics_masking():
    """Pixels outside (min,max) eval range and occluded pixels are excluded."""
    gt = np.full((1, 1, 4, 4, 1), 10.0, np.float32)
    gt[0, 0, 0, 0, 0] = 500.0    # beyond max: excluded
    gt[0, 0, 0, 1, 0] = 0.0      # below min: excluded
    pred = np.full_like(gt, 10.0)
    pred[0, 0, 0, 0, 0] = 1.0    # would be a huge error if included
    occ = np.ones_like(gt)
    occ[0, 0, 1, 1, 0] = 0.0     # occluded: excluded
    pred[0, 0, 1, 1, 0] = 99.0
    metric, _, _ = compute_depth_metrics(gt, pred, occ, 0.5, 200.0)
    assert metric["abs_rel"] < 1e-6


def test_pretty_ts():
    assert pretty_ts(3723) == "01h02m03s"
