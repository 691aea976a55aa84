"""Depth-synthesis sweep smoke test (capped views, micro model, CPU)."""
import numpy as np
import jax
import pytest

from tests.test_train_integration import micro_config, _batch
from vfdepth_tpu.training.model import VFDepthModel
from vfdepth_tpu.training.synthesis import synthesize_sweep
from vfdepth_tpu.utils.visualize import aug_depth_params


def test_aug_depth_params_structure():
    k = np.tile(np.eye(4, dtype=np.float32), (1, 3, 1, 1))
    k[:, :, 0, 0] = 40.0
    k[:, :, 1, 1] = 44.0
    params = aug_depth_params(k, n_steps=75)
    # roll (0..75..-75..0 step2: 152) + pitch (102) + focal (101 + 51) + yaw 360
    assert len(params) > 700
    inv_k, ax, ay, az = params[0]
    assert inv_k.shape == (1, 3, 4, 4)
    assert (ax, ay, az) == (0.0, 0.0, 0.0)
    # yaw sweep covers a full revolution
    yaws = [p[3] for p in params[-360:]]
    assert max(yaws) > 6.0


@pytest.mark.slow
def test_synthesize_sweep_runs():
    cfg = micro_config()
    model = VFDepthModel(cfg)
    batch = _batch(cfg)
    params, stats = model.init(jax.random.PRNGKey(0), batch)
    disps = synthesize_sweep(model, params, stats, batch, max_views=3)
    assert len(disps) == 3
    h, w = cfg.height, cfg.width
    for d in disps:
        assert d.shape == (1, h, w, 1)
        assert np.isfinite(d).all()
        assert d.min() >= 0.0 and d.max() <= 1.0
