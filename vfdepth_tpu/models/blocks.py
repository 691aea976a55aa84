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

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

# ablation knob (bench A/B): VFDEPTH_FAST_PAD=1 switches every 3x3 conv to
# the zero-pad + border-correction form. Measured in-model it is NEUTRAL to
# slightly negative (-0.3..-0.8% step time, 30-step bench both rigs): the
# pad-fusion savings are repaid because the activation epilogue can no
# longer fuse into the conv (the border dynamic-update-slices sit between
# them). Kept off by default; the implementation and equivalence test stay
# as the measured record.
_FAST_PAD_DEFAULT = os.environ.get("VFDEPTH_FAST_PAD", "0") == "1"


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


def _thin_conv(x: jnp.ndarray, k: jnp.ndarray, stride_hw) -> jnp.ndarray:
    """VALID NHWC conv of a thin slice with a kernel slab (no bias)."""
    return jax.lax.conv_general_dilated(
        x, k, window_strides=stride_hw, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBlock(nn.Module):
    """Conv2d + optional BatchNorm + activation (reference blocks.py:41-61).

    Reflect padding, bias unless norm. NHWC.

    ``fast_pad`` (3x3/dilation-1 only) computes the reflect-padded conv as a
    zero-padded conv plus thin border corrections instead of materializing
    the padded tensor: ``jnp.pad(mode="reflect")`` cannot fold into XLA's
    conv padding config (the values differ from zero), so it costs a full
    HBM pass over the activation fwd AND a slice+add pass bwd (the
    slice_add/pad fusions in docs/PERF.md round-3 wall analysis, block
    (e)). Zero-padding folds into the conv; the border rows/cols that
    reflect actually changes are patched with 1x3 / 3x1 convs over
    single-row/col slices. Corner terms are counted exactly once: the row
    corrections reflect-pad along W (owning the corners), the column
    corrections zero-pad along H (excluding them). Equivalence is
    test-guarded (tests/test_model_parts.py::test_fast_reflect_conv*).
    MEASURED NEUTRAL in-model (see _FAST_PAD_DEFAULT) — off by default.
    """
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    nonlin: Optional[str] = "LRU"
    norm: bool = False
    dtype: Any = None  # compute dtype (None = infer; jnp.bfloat16 for MXU)
    fast_pad: bool = _FAST_PAD_DEFAULT

    def _reflect_conv3(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reflect-padded 3x3 conv without materializing the pad."""
        s = self.stride
        conv = nn.Conv(
            self.out_ch, kernel_size=(3, 3), strides=(s, s),
            padding=((1, 1), (1, 1)), use_bias=not self.norm,
            dtype=self.dtype)
        y = conv(x)
        k = conv.variables["params"]["kernel"]
        if self.dtype is not None:
            k = k.astype(self.dtype)
            x = x.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        out_h, out_w = y.shape[1], y.shape[2]
        # does the last window read the high-side pad? (s=1: yes; s=2 on
        # even sizes: no — last start = -1 + 2*(out-1) = size - 3)
        hi_h = (s * (out_h - 1) + 1) > (h - 1)
        hi_w = (s * (out_w - 1) + 1) > (w - 1)

        def wpad_reflect(r):  # [b, 1, w, c] -> [b, 1, w+2, c]
            return jnp.concatenate([r[:, :, 1:2], r, r[:, :, w - 2:w - 1]], 2)

        def hpad_zero(c):     # [b, h, 1, c] -> [b, h+2, 1, c]
            z = jnp.zeros_like(c[:, :1])
            return jnp.concatenate([z, c, z], 1)

        top = _thin_conv(wpad_reflect(x[:, 1:2]), k[0:1], (1, s))
        y = y.at[:, 0:1].add(top)
        if hi_h:
            bot = _thin_conv(wpad_reflect(x[:, h - 2:h - 1]), k[2:3], (1, s))
            y = y.at[:, out_h - 1:out_h].add(bot)
        left = _thin_conv(hpad_zero(x[:, :, 1:2]), k[:, 0:1], (s, 1))
        y = y.at[:, :, 0:1].add(left)
        if hi_w:
            right = _thin_conv(hpad_zero(x[:, :, w - 2:w - 1]), k[:, 2:3],
                               (s, 1))
            y = y.at[:, :, out_w - 1:out_w].add(right)
        return y

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        pad = ((self.kernel_size - 1) * self.dilation) // 2
        if (self.fast_pad and pad == 1 and self.kernel_size == 3
                and self.dilation == 1 and x.ndim == 4
                and x.shape[1] >= 2 and x.shape[2] >= 2):
            x = self._reflect_conv3(x)
        else:
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
