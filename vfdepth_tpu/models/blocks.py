"""Conv blocks shared by the depth/pose networks (flax.linen, NHWC).

Equivalents of reference ``network/blocks.py``: 3x3/1x1 convs with reflect
padding followed by LeakyReLU(0.1) / ELU / identity. The reference's 1D convs
over the voxel axis are expressed here as Dense layers over the channel axis
(kernel_size=1 conv1d == matmul), which maps directly onto the MXU.

``pack_cam_feat``/``unpack_cam_feat`` fold the camera axis into batch
(reference blocks.py:6-31) — used at encoder boundaries where per-camera
convs are identical.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn


def pack_cam_feat(x: jnp.ndarray) -> jnp.ndarray:
    """[b, cams, ...] -> [b*cams, ...]."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def unpack_cam_feat(x: jnp.ndarray, b: int, n_cam: int) -> jnp.ndarray:
    """[b*cams, ...] -> [b, cams, ...]."""
    return x.reshape((b, n_cam) + x.shape[1:])


def _activation(name: Optional[str]):
    if name == "LRU":
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    if name == "ELU":
        return nn.elu
    if name is None or name == "none":
        return lambda x: x
    raise ValueError(f"unknown nonlinearity {name!r}")


def reflect_pad_2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflection padding on the two spatial axes of [..., H, W, C]."""
    if pad == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)]
    return jnp.pad(x, cfg, mode="reflect")


class ConvBlock(nn.Module):
    """Conv2d + optional BatchNorm + activation (reference blocks.py:41-61).

    Reflect padding, bias unless norm. NHWC.
    """
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    nonlin: Optional[str] = "LRU"
    norm: bool = False
    dtype: Any = None  # compute dtype (None = infer; jnp.bfloat16 for MXU)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        pad = ((self.kernel_size - 1) * self.dilation) // 2
        x = reflect_pad_2d(x, pad)
        x = nn.Conv(
            self.out_ch,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="VALID",
            use_bias=not self.norm,
            dtype=self.dtype,
        )(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        return _activation(self.nonlin)(x)


class PointwiseBlock(nn.Module):
    """Dense over the channel axis + activation — the MXU-native form of the
    reference's kernel_size=1 conv1d voxel MLPs (reference blocks.py:64-83
    as instantiated at volumetric_fusionnet.py:48-49).

    Input [..., C_in] -> [..., out_ch].
    """
    out_ch: int
    nonlin: Optional[str] = "LRU"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.out_ch, dtype=self.dtype)(x)
        return _activation(self.nonlin)(x)
