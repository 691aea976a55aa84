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


def test_compute_depth_metrics_empty_camera_not_deflating():
    """A camera with no valid GT must not shade the average toward zero —
    metrics average over cameras WITH valid GT only (reference failure
    semantics: torch.median on an empty tensor is loudly wrong, never a
    silent zero contribution)."""
    b, h, w = 1, 8, 8
    gt = np.full((b, 2, h, w, 1), 10.0, np.float32)
    gt[:, 1] = 0.0  # camera 1: no valid GT at all
    pred = np.full_like(gt, 20.0)  # 2x off -> abs_rel 1.0 on camera 0
    occ = np.ones_like(gt)
    metric, median, scales = compute_depth_metrics(gt, pred, occ, 0.5, 200.0)
    assert abs(metric["abs_rel"] - 1.0) < 1e-6  # not halved by the empty cam
    assert np.isnan(scales[1]) and not np.isnan(scales[0])
    # zero valid cameras -> loud NaN, never a quiet number
    gt[:] = 0.0
    metric, median, _ = compute_depth_metrics(gt, pred, occ, 0.5, 200.0)
    assert np.isnan(metric["abs_rel"]) and np.isnan(median["abs_rel"])


def test_pretty_ts():
    assert pretty_ts(3723) == "01h02m03s"


def test_compute_depth_metrics_matches_torch_reference():
    """Golden parity: our metrics pipeline (sparse-preserving GT resize +
    pred interpolation + masking + median scaling) must agree with a torch
    transcription of the reference's eval protocol
    (reference utils/logger.py:193-247 + packnet resize_depth_preserve)."""
    import torch
    import torch.nn.functional as F
    from vfdepth_tpu.data.transforms import resize_depth_preserve
    from vfdepth_tpu.utils.metrics import compute_depth_metrics

    rng = np.random.RandomState(0)
    b, cams = 2, 3
    gh, gw = 96, 160          # native GT resolution
    nh, nw = 48, 80           # network resolution
    lo, hi = 0.5, 80.0

    # sparse lidar-like GT: ~4% of pixels carry depth
    gt_native = np.zeros((b, cams, gh, gw), np.float32)
    hits = rng.rand(b, cams, gh, gw) < 0.04
    gt_native[hits] = rng.uniform(1.0, 90.0, hits.sum()).astype(np.float32)

    pred = rng.uniform(1.0, 90.0, (b, cams, nh, nw, 1)).astype(np.float32)
    occ = (rng.rand(b, cams, nh, nw, 1) > 0.2).astype(np.float32)

    # ---- our pipeline -----------------------------------------------------
    gt_net = np.stack([
        np.stack([resize_depth_preserve(gt_native[i, c], (nh, nw))
                  for c in range(cams)]) for i in range(b)])
    ours_metric, ours_median, _ = compute_depth_metrics(
        gt_net, pred, occ, lo, hi)

    # ---- torch transcription of the reference ----------------------------
    def torch_resize_depth_preserve(depth, shape):
        h, w = depth.shape
        uv = np.argwhere(depth > 0)
        vals = depth[uv[:, 0], uv[:, 1]]
        crd = (uv * np.array(shape) / np.array([h, w])).astype(np.int64)
        out = np.zeros(shape, np.float32)
        out[crd[:, 0], crd[:, 1]] = vals
        return out

    metric_acc = {}
    median_acc = {}
    names = ["abs_rel", "sq_rel", "rms", "log_rms", "a1", "a2", "a3"]
    for cam in range(cams):
        depth_gt = torch.tensor(np.stack([
            torch_resize_depth_preserve(gt_native[i, cam], (nh, nw))
            for i in range(b)]))[:, None]
        _, _, h, w = depth_gt.shape
        depth_pred = torch.tensor(pred[:, cam, ..., 0])[:, None]
        depth_pred = torch.clamp(F.interpolate(
            depth_pred, [h, w], mode="bilinear", align_corners=False), lo, hi)
        mask = ((depth_gt > lo) * (depth_gt < hi)
                * torch.tensor(occ[:, cam, ..., 0])[:, None]).bool()
        dg = depth_gt[mask]
        dp = depth_pred[mask]
        scale = torch.median(dg) / torch.median(dp)
        pm = torch.clamp(dp, min=lo, max=hi)
        md = torch.clamp(dp * scale, min=lo, max=hi)

        def err(p, t):
            absr = torch.mean(torch.abs(p - t) / t)
            sqr = torch.mean((p - t) ** 2 / t)
            rmse = torch.sqrt(torch.mean((p - t) ** 2))
            rl = torch.sqrt(torch.mean((torch.log(t) - torch.log(p)) ** 2))
            th = torch.max(t / p, p / t)
            return [absr, sqr, rmse, rl, (th < 1.25).float().mean(),
                    (th < 1.25 ** 2).float().mean(),
                    (th < 1.25 ** 3).float().mean()]

        for k, v in zip(names, err(pm, dg)):
            metric_acc[k] = metric_acc.get(k, 0.0) + float(v)
        for k, v in zip(names, err(md, dg)):
            median_acc[k] = median_acc.get(k, 0.0) + float(v)

    for k in names:
        np.testing.assert_allclose(ours_metric[k], metric_acc[k] / cams,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(ours_median[k], median_acc[k] / cams,
                                   rtol=1e-4, atol=1e-5)
