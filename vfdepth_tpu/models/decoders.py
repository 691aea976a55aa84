"""Depth / pose decoders (flax.linen, NHWC).

Re-implements the decoder behaviors the reference pulls from packnet-sfm
(import surface at reference ``external/layers/__init__.py:2-4``) plus the
reference's own fusion DepthDecoder:

  * ``MonoDepthDecoder`` — Monodepth2 skip-connected upconv decoder with
    sigmoid disparity heads at the requested scales.
  * ``FusionDepthDecoder`` — the reference's custom variant that starts at the
    fusion level (reference ``network/fusion_depthnet.py:97-145``).
  * ``PoseDecoder`` — Monodepth2 pose head: 1x1 squeeze + 3 convs -> 6-DoF
    x0.01, returning (axisangle, translation) each [b, n_frames, 1, 3].
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .blocks import ConvBlock
from ..ops.resize import upsample2x_nearest


class FusionDepthDecoder(nn.Module):
    """Decode from fusion-level features down to full-scale disparity.

    ``level_in`` is the starting pyramid level (reference fusion_level=2, i.e.
    input at H/8 after the voxel round-trip). With ``use_skips=False`` (the
    reference default) only the last input feature is consumed.
    """
    level_in: int
    num_ch_enc: Sequence[int]
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    scales: Sequence[int] = (0,)
    use_skips: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features: List[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        outputs = {}
        x = input_features[-1]
        for i in range(self.level_in, -1, -1):
            x = ConvBlock(self.num_ch_dec[i], 3, nonlin="ELU", dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(self.num_ch_dec[i], 3, nonlin="ELU", dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = ConvBlock(1, 3, nonlin=None, dtype=self.dtype,
                                 name=f"dispconv_{i}")(x)
                outputs[f"disp/{i}"] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs


class MonoDepthDecoder(nn.Module):
    """Monodepth2 DepthDecoder (packnet-sfm's, used by the 'fsm' baseline)."""
    num_ch_enc: Sequence[int]
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    scales: Sequence[int] = (0, 1, 2, 3)
    use_skips: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features: List[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(self.num_ch_dec[i], 3, nonlin="ELU", dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(self.num_ch_dec[i], 3, nonlin="ELU", dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = ConvBlock(1, 3, nonlin=None, dtype=self.dtype,
                                 name=f"dispconv_{i}")(x)
                outputs[f"disp/{i}"] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs


class PoseDecoder(nn.Module):
    """Monodepth2 PoseDecoder.

    squeeze 1x1 conv (-> 256) + ReLU, two 3x3 convs (stride ``stride``) + ReLU,
    final 1x1 conv to 6*n_frames, global mean over H,W, scaled by 0.01.
    Reference instantiates it with stride=2 on the BEV feature
    (network/fusion_posenet.py:30-34).
    """
    num_frames_to_predict_for: int = 1
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, feature: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")(feature)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), dtype=self.dtype, name="pose_0")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), dtype=self.dtype, name="pose_1")(x)
        x = nn.relu(x)
        x = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1), dtype=self.dtype,
                    name="pose_2")(x)
        x = x.astype(jnp.float32).mean(axis=(-3, -2))  # [b, 6*n] (f32 head)
        x = 0.01 * x.reshape(x.shape[:-1] + (self.num_frames_to_predict_for, 1, 6))
        return x[..., :3], x[..., 3:]
