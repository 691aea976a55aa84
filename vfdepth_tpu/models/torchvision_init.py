"""Optional ImageNet initialization for the ResNet encoder.

The reference sets ``weights_init: True`` (torchvision-pretrained ResNet-18 —
reference ``network/fusion_depthnet.py:25``). This image has no torchvision
and no network egress, so pretrained weights are loadable only from a local
file: either a torchvision state-dict ``.pth`` (torch is available) or an
``.npz`` export. Missing file -> random init with a warning, keeping
configs with ``weights_init: True`` runnable.

Multi-image encoders replicate conv1 weights divided by the number of input
images (packnet/monodepth2 convention).
"""
from __future__ import annotations

import os
import warnings
from typing import Any, Dict, Optional

import numpy as np

_STAGE_BLOCKS = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3]}


def find_resnet_weights(num_layers: int = 18) -> Optional[str]:
    """Resolve the pretrained-weights file the loader would use, or None.

    Order: ``VFDEPTH_RESNET_WEIGHTS`` env var, then the repo-local
    ``assets/weights/resnet<N>_imagenet.npz`` written by
    ``scripts/fetch_imagenet_weights.py``.
    """
    env = os.environ.get("VFDEPTH_RESNET_WEIGHTS", "")
    if env:
        return env if os.path.isfile(env) else None
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "assets", "weights", f"resnet{num_layers}_imagenet.npz")
    return default if os.path.isfile(default) else None


def _load_state_dict(path: str) -> Optional[Dict[str, np.ndarray]]:
    if path.endswith(".npz"):
        with np.load(path) as f:
            return {k: f[k] for k in f.files}
    try:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    except Exception as e:  # pragma: no cover
        warnings.warn(f"could not load pretrained weights from {path}: {e}")
        return None


def _conv(sd, key):
    # torch OIHW -> flax HWIO
    return np.transpose(sd[key], (2, 3, 1, 0))


def _bn(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
    }, {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def load_resnet_encoder_params(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    num_layers: int = 18,
    num_input_images: int = 1,
    weights_path: Optional[str] = None,
):
    """Overwrite a ResnetEncoder param/stats tree with torchvision weights.

    Returns (params, batch_stats) — updated copies when weights are found,
    the inputs unchanged otherwise.
    """
    weights_path = weights_path or find_resnet_weights(num_layers)
    if not weights_path or not os.path.isfile(weights_path):
        warnings.warn(
            "weights_init requested but no pretrained ResNet weights found. "
            "Run `python scripts/fetch_imagenet_weights.py` on a machine "
            "with network access (writes assets/weights/resnet*_imagenet.npz)"
            " or set VFDEPTH_RESNET_WEIGHTS to a torchvision state-dict .pth "
            "or .npz; using random initialization")
        return params, batch_stats

    sd = _load_state_dict(weights_path)
    if sd is None:
        return params, batch_stats

    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    conv1 = _conv(sd, "conv1.weight")
    if num_input_images > 1:
        conv1 = np.concatenate([conv1] * num_input_images, axis=2) / num_input_images
    params["conv1"]["kernel"] = conv1
    bn_p, bn_s = _bn(sd, "bn1")
    params["bn1"]["BatchNorm_0"].update(bn_p)
    batch_stats["bn1"]["BatchNorm_0"].update(bn_s)

    for stage, n_blocks in enumerate(_STAGE_BLOCKS[num_layers]):
        for blk in range(n_blocks):
            t = f"layer{stage + 1}.{blk}"
            fx = f"layer{stage + 1}_{blk}"
            fp = params[fx]
            fs = batch_stats[fx]
            n_convs = 3 if num_layers == 50 else 2
            for ci in range(1, n_convs + 1):
                fp[f"conv{ci}"]["kernel"] = _conv(sd, f"{t}.conv{ci}.weight")
                bn_p, bn_s = _bn(sd, f"{t}.bn{ci}")
                fp[f"bn{ci}"]["BatchNorm_0"].update(bn_p)
                fs[f"bn{ci}"]["BatchNorm_0"].update(bn_s)
            if f"{t}.downsample.0.weight" in sd:
                fp["downsample_conv"]["kernel"] = _conv(sd, f"{t}.downsample.0.weight")
                bn_p, bn_s = _bn(sd, f"{t}.downsample.1")
                fp["downsample_bn"]["BatchNorm_0"].update(bn_p)
                fs["downsample_bn"]["BatchNorm_0"].update(bn_s)
    return params, batch_stats
