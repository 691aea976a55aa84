"""Loss primitives (pure jnp, branchless; reference ``models/losses/loss_util.py``).

All reductions are mask-aware ``where`` forms so every shape is static under
jit — the reference's boolean indexing / data-dependent skips have no place
inside an XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg_pool3x3_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pool with reflect padding on [..., H, W, C].

    Matches the reference SSIM's ReflectionPad2d(1) + avg_pool2d(3,1)
    (loss_util.py:48-60). Expressed as a depthwise convolution so XLA maps it
    onto efficient TPU reduce-window fusion.
    """
    pad = [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    # reduce_window mean over 3x3
    window = [1] * (x.ndim - 3) + [3, 3, 1]
    strides = [1] * x.ndim
    summed = jax.lax.reduce_window(xp, 0.0, jax.lax.add, window, strides, "VALID")
    return summed / 9.0


def ssim_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """SSIM dissimilarity map, clamp((1-SSIM)/2, 0, 1) per pixel/channel.

    Constants C1=0.01^2, C2=0.03^2 and the +1e-8 denominator guard follow
    loss_util.py:44-69.
    """
    mu_p = _avg_pool3x3_same(pred)
    mu_t = _avg_pool3x3_same(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sigma_p = _avg_pool3x3_same(pred * pred) - mu_pp
    sigma_t = _avg_pool3x3_same(target * target) - mu_tt
    sigma_pt = _avg_pool3x3_same(pred * target) - mu_pt
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim = ((2 * mu_pt + c1) * (2 * sigma_pt + c2)) / (
        (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2) + 1e-8)
    return jnp.clip((1.0 - ssim) / 2.0, 0.0, 1.0)


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0.85 * SSIM + 0.15 * L1, averaged over channels -> [..., H, W, 1].

    Math runs in f32 regardless of input dtype: warped images stream as
    bf16 under mixed precision, and SSIM's variance terms (E[x^2] - mu^2)
    cancel catastrophically below f32."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    ssim = jnp.mean(ssim_loss(pred, target), axis=-1, keepdims=True)
    return 0.85 * ssim + 0.15 * l1


def edge_aware_smoothness(rgb: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware first-order disparity smoothness (loss_util.py:28-41).

    Args: rgb [..., H, W, 3]; disp [..., H, W, 1]. Returns scalar per batch
    element collapsed to a single mean (matching the reference's .mean()).
    """
    grad_rgb_x = jnp.mean(jnp.abs(rgb[..., :, :-1, :] - rgb[..., :, 1:, :]),
                          axis=-1, keepdims=True)
    grad_rgb_y = jnp.mean(jnp.abs(rgb[..., :-1, :, :] - rgb[..., 1:, :, :]),
                          axis=-1, keepdims=True)
    grad_d_x = jnp.abs(disp[..., :, :-1, :] - disp[..., :, 1:, :])
    grad_d_y = jnp.abs(disp[..., :-1, :, :] - disp[..., 1:, :, :])
    grad_d_x = grad_d_x * jnp.exp(-grad_rgb_x)
    grad_d_y = grad_d_y * jnp.exp(-grad_rgb_y)
    return jnp.mean(grad_d_x) + jnp.mean(grad_d_y)


def masked_mean(loss: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(loss * mask).sum() / (mask.sum() + 1e-8)  (loss_util.py:22-26)."""
    return jnp.sum(loss * mask) / (jnp.sum(mask) + 1e-8)


def auto_mask(reproj_loss: jnp.ndarray, identity_loss: jnp.ndarray) -> jnp.ndarray:
    """Monodepth2 auto-mask: 1 where reprojection beats identity.

    Ties go to the reprojection term: loss_util.py:6-19 takes argmin over
    the [reproj, identity] concat and argmin returns the FIRST minimal
    index, so equality means mask 1 — hence ``<=``, not ``<``."""
    return (reproj_loss <= identity_loss).astype(reproj_loss.dtype)


def mean_normalized_disp(disp: jnp.ndarray) -> jnp.ndarray:
    """disp / (spatial mean + 1e-8) over [..., H, W, 1]."""
    mean = jnp.mean(disp, axis=(-3, -2), keepdims=True)
    return disp / (mean + 1e-8)
