"""ResNet encoder (flax.linen, NHWC) with Monodepth2 feature-pyramid contract.

Re-implements the behavior of packnet-sfm's ``ResnetEncoder`` that the
reference imports (surface documented at reference
``external/layers/__init__.py:2-4`` and expected channel ladder at
``network/fusion_depthnet.py:23``): torchvision-style ResNet backbone
returning 5 feature maps at strides 2/4/8/16/32 with
``num_ch_enc = [64, 64, 128, 256, 512]`` (resnet18/34), input normalized as
``(x - 0.45) / 0.225``, and a multi-image variant that stacks N RGB frames
on the channel axis.

Optionally initializable from torchvision ImageNet weights via
``torchvision_init.py`` (the reference sets ``weights_init: True``).
"""
from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
import flax.linen as nn

RESNET_SPECS = {
    18: dict(block="basic", layers=[2, 2, 2, 2]),
    34: dict(block="basic", layers=[3, 4, 6, 3]),
    50: dict(block="bottleneck", layers=[3, 4, 6, 3]),
}


def num_ch_enc(num_layers: int) -> List[int]:
    if RESNET_SPECS[num_layers]["block"] == "basic":
        return [64, 64, 128, 256, 512]
    return [64, 256, 512, 1024, 2048]


class _Norm(nn.Module):
    """BatchNorm matching torchvision defaults (momentum 0.1 torch == 0.9 flax)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _Norm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _Norm(dtype=self.dtype, name="bn2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = _Norm(dtype=self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out_ch = self.planes * self.expansion
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _Norm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _Norm(dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = _Norm(dtype=self.dtype, name="bn3")(out, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = _Norm(dtype=self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class ResnetEncoder(nn.Module):
    """Returns [feat_s2, feat_s4, feat_s8, feat_s16, feat_s32].

    Args:
      num_layers: 18, 34, or 50.
      num_input_images: RGB frames stacked on the channel axis (1 for depth,
        2 for pose — reference network/fusion_posenet.py:23).
    """
    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> List[jnp.ndarray]:
        spec = RESNET_SPECS[self.num_layers]
        block_cls = BasicBlock if spec["block"] == "basic" else Bottleneck

        x = (x - 0.45) / 0.225  # Monodepth2 input normalization
        if self.dtype is not None:
            x = x.astype(self.dtype)

        features = []
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _Norm(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        features.append(x)  # stride 2

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = [64, 128, 256, 512]
        for stage, (n_blocks, width) in enumerate(zip(spec["layers"], planes)):
            for blk in range(n_blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = block_cls(width, stride, dtype=self.dtype, name=f"layer{stage + 1}_{blk}")(x, train)
            features.append(x)
        return features
