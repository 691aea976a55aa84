"""Composite training losses, computed for all cameras at once.

Functional equivalents of the reference's loss classes
(``models/losses/single_cam_loss.py``, ``multi_cam_loss.py``,
``depth_synthesis_loss.py``), with the per-camera Python loop replaced by a
camera axis: each term is reduced per camera (masked mean over batch+pixels,
as the reference's ``compute_masked_loss`` does per camera) and then averaged
over cameras (reference ``models/vfdepth.py:290-313``).

Loss selection matches reference ``models/vfdepth.py:47-54``:
``aug_depth -> depth-synthesis``, elif ``spatio or spatio_temporal ->
multi-cam``, else ``single-cam``.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .primitives import (
    photometric_loss,
    edge_aware_smoothness,
    auto_mask,
    mean_normalized_disp,
)
from ..geometry.se3 import matrix_to_euler_angles_xyz

_EPSILON = 1e-5  # identity-loss tie-break noise scale (single_cam_loss.py:7)


def _percam_masked_mean(loss: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean per camera: [b, cams, H, W, 1] -> [cams]."""
    num = jnp.sum(loss * mask, axis=(0, 2, 3, 4))
    den = jnp.sum(mask, axis=(0, 2, 3, 4))
    return num / (den + 1e-8)


class LossConfig(NamedTuple):
    frame_ids: Tuple[int, ...] = (0, -1, 1)
    scales: Tuple[int, ...] = (0,)
    disparity_smoothness: float = 0.001
    spatio_coeff: float = 0.03
    spatio_tempo_coeff: float = 0.1
    pose_loss_coeff: float = 0.0
    depth_con_coeff: float = 0.03
    depth_sm_coeff: float = 0.05
    spatio: bool = True
    spatio_temporal: bool = True
    aug_depth: bool = False
    pose_model: str = "fusion"
    # Staged cold-start recipe (off when both are 0): the overlap losses are
    # masked means that vanish once warps leave the image, so joint training
    # from a random init can kill them by saturating depth — a degenerate
    # minimum shared with the reference, which escapes it via ImageNet
    # encoder init (network/fusion_depthnet.py:25-34). Without pretrained
    # weights, train temporal-only (monodepth2-style, converges from
    # scratch) for `warmup_steps`, then fade the spatio/spatio-temporal
    # coefficients in linearly over `ramp_steps`.
    warmup_steps: int = 0
    ramp_steps: int = 0
    # Staggered-ramp variant (config `cold_start_stagger_ramps`): the
    # spatio-temporal coefficient ramps one ramp_steps AFTER the spatio
    # ramp completes, and the priors fade with that LAST ramp. Rationale:
    # spatio is pose-free and metric-anchored by the rig baselines; ST
    # composes the still-noisy pose and was the measured collapse vector at
    # weak parallax (0.1 m/frame: warmup converges to abs_rel 0.34, the
    # joint ramp collapses it to 3.3 — docs/PERF.md round-5 log). DEFAULT
    # OFF: at the canonical 0.5 m/frame validated regime the staggered
    # schedule flipped one of four seeds into the 0.835 stall (multi-seed
    # margin run, docs/PERF.md) while the joint schedule converged — the
    # shipped default is the schedule the convergence evidence backs; the
    # knob remains for fast/weak-parallax regimes where the measured
    # tradeoff runs the other way.
    stagger_ramps: bool = False
    # Cold-start priors, active only while the staged schedule is ramping
    # (scaled by 1 - ramp, i.e. full during warmup, zero once the overlap
    # coefficients are fully in). They break the two degenerate minima that
    # kill from-scratch training (docs/PERF.md "Learning validation"):
    #   * pose_prior: hinge relu(floor - mean|t|) on the per-camera
    #     translation magnitude — the zero-pose basin (identity warp has
    #     zero photometric loss for ANY depth) is a global minimum the
    #     0.01-scaled random pose head starts inside of;
    #   * disp_anchor: (mean log sigmoid-disp - log 0.5)^2 — with tiny
    #     pose, larger depth always shrinks the flow toward identity, a
    #     systematic downward pressure that saturates the sigmoid within
    #     ~100 steps. LOG space matters: the linear anchor's gradient dies
    #     with sigmoid' exactly at the saturation it exists to prevent
    #     (see the inline note at the prior computation).
    # Both vanish with the schedule, leaving the reference objective exact.
    # Ceiling note: the fly-away basin sits at the +-4 m translation clamp,
    # and the ceiling is load-bearing in BOTH directions (round-5 multi-seed
    # runs, docs/PERF.md): at 1.0 it contains early pose overshoot that
    # otherwise corrupts the depth scale (ceil 2.5 at 0.5 m/frame produced a
    # hard 0.835 abs_rel stall on one of four seeds; 1.0 eliminated every
    # stall), but it must stay ABOVE the true per-frame ego-motion or it
    # actively suppresses the photometrically-consistent scale (measured at
    # 1.5 m/frame with ceil 1.0: stalls at ~0.88 — fast rigs raise
    # cold_start_pose_ceil, see tests/test_learning_tpu.py's fast recipe).
    pose_prior_coeff: float = 1.0
    pose_prior_floor: float = 0.1
    pose_prior_ceil: float = 1.0
    disp_anchor_coeff: float = 0.1


def cold_start_schedule(cfg: LossConfig, step, dtype):
    """The staged cold-start schedule as a pure function of the (traced)
    step: (ramp, st_ramp, amask_blend), all None when the schedule is off
    (warmup/ramp both 0, or step None at eval).

      * ramp — the spatio coefficient's linear fade-in over
        [warmup, warmup + ramp_steps);
      * st_ramp — the spatio-temporal coefficient's fade: equal to ``ramp``
        by default (joint schedule), or delayed one ramp_steps under
        ``cfg.stagger_ramps`` (see LossConfig for the measured tradeoff).
        The cold-start priors fade as (1 - st_ramp) — with the LAST ramp;
      * amask_blend — the auto-mask fades in FASTER (fully in by the end of
        warmup), so the temporal objective is reference-exact before the
        overlap terms start ramping. At a zero-pose init the identity
        comparison is a tie (warped == context), so the auto-masked
        objective starts on a zero-gradient plateau; blending the mask in
        restores from-scratch trainability (see reprojection_loss)."""
    if not (cfg.warmup_steps or cfg.ramp_steps) or step is None:
        return None, None, None
    ramp = jnp.clip(
        (step.astype(jnp.float32) - float(cfg.warmup_steps))
        / float(max(cfg.ramp_steps, 1)), 0.0, 1.0).astype(dtype)
    st_ramp = (jnp.clip(
        (step.astype(jnp.float32)
         - float(cfg.warmup_steps + cfg.ramp_steps))
        / float(max(cfg.ramp_steps, 1)), 0.0, 1.0).astype(dtype)
        if cfg.stagger_ramps else ramp)
    amask_blend = jnp.clip(
        step.astype(jnp.float32) / float(max(cfg.warmup_steps, 1)),
        0.0, 1.0).astype(dtype)
    return ramp, st_ramp, amask_blend


def reprojection_loss(
    rng: jax.Array,
    target: jnp.ndarray,          # [b, cams, H, W, 3] frame-0 color
    context: jnp.ndarray,         # [b, cams, n_ctx, H, W, 3] raw context colors
    warped: jnp.ndarray,          # [b, cams, n_ctx, H, W, 3] temporal warps
    ref_mask: jnp.ndarray,        # [b, cams, H, W, 1]
    amask_blend: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Monodepth2 min-reprojection with identity auto-masking
    (single_cam_loss.py:18-55). Returns (per-cam loss [cams],
    masked loss map, auto mask) — the maps feed TB panels and the
    spatio-temporal term.

    ``amask_blend`` (cold-start schedule only; None = reference exact)
    fades the auto-mask in: the effective mask is
    ``ref_mask * ((1 - blend) + blend * auto)``. At blend 0 every in-image
    pixel carries gradient — the identity comparison is a tie at the
    zero-pose init (warped == context), so the masked objective has a
    zero-gradient plateau exactly where a random init starts; fading the
    mask in restores monodepth2's from-scratch trainability while
    converging to the reference objective at blend 1."""
    tgt = target[:, :, None]
    reproj = jax.vmap(photometric_loss, in_axes=(2, 2), out_axes=2)(warped, jnp.broadcast_to(tgt, warped.shape))
    reproj_min = jnp.min(reproj, axis=2)  # [b, cams, H, W, 1]

    ident = jax.vmap(photometric_loss, in_axes=(2, 2), out_axes=2)(context, jnp.broadcast_to(tgt, context.shape))
    noise = _EPSILON * jax.random.normal(rng, ident.shape, dtype=ident.dtype)
    ident_min = jnp.min(ident + noise, axis=2)

    auto = auto_mask(reproj_min, ident_min)
    if amask_blend is not None:
        auto = (1.0 - amask_blend) + amask_blend * auto
    amask = auto * ref_mask
    loss_map = amask * reproj_min
    percam = _percam_masked_mean(reproj_min, amask)
    return percam, loss_map, amask


def smoothness_loss(color: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware smoothness on mean-normalized disp, per camera -> [cams]."""
    norm_disp = mean_normalized_disp(disp)
    # per-camera mean (reference does .mean() over each cam's tensor)
    per_cam = jax.vmap(edge_aware_smoothness, in_axes=(1, 1))(color, norm_disp)
    return per_cam


def spatio_loss_fn(target: jnp.ndarray, overlap_img: jnp.ndarray,
                   overlap_mask: jnp.ndarray, ref_mask: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spatial (same-timestep cross-camera) loss (multi_cam_loss.py:16-29).
    Returns ([cams], combined spatio mask)."""
    sp_mask = ref_mask * overlap_mask
    loss = photometric_loss(overlap_img, target)
    return _percam_masked_mean(loss, sp_mask), sp_mask


def spatio_tempo_loss_fn(target: jnp.ndarray, overlap_img: jnp.ndarray,
                         overlap_mask: jnp.ndarray, ref_mask: jnp.ndarray,
                         reproj_mask: jnp.ndarray) -> jnp.ndarray:
    """Spatio-temporal loss (multi_cam_loss.py:31-59): min of losses over
    context frames, max of masks, then masked mean -> [cams].

    overlap_img/mask here carry only the context-frame entries
    [b, cams, n_ctx, H, W, .].
    """
    tgt = target[:, :, None]
    losses = jax.vmap(photometric_loss, in_axes=(2, 2), out_axes=2)(
        overlap_img, jnp.broadcast_to(tgt, overlap_img.shape))
    masks = ref_mask[:, :, None] * overlap_mask * reproj_mask[:, :, None]
    loss_min = jnp.min(losses, axis=2)
    mask_max = jnp.max(masks, axis=2)
    return _percam_masked_mean(loss_min, mask_max)


def pose_consistency_loss(cam_t_cam: jnp.ndarray, extrinsics: jnp.ndarray,
                          extrinsics_inv: jnp.ndarray) -> jnp.ndarray:
    """FSM pose-consistency loss (multi_cam_loss.py:61-92), per camera -> [cams].

    Aligns each camera's per-camera pose into the reference camera frame and
    penalizes (translation L2 + 10 * euler-angle L2) against camera 0's pose,
    averaged over context frames. Camera 0 contributes 0.
    """
    ref_t = cam_t_cam[:, 0]  # [b, n_ctx, 4, 4]
    # align: E0^-1 @ Ec @ Tc @ Ec^-1 @ E0  for every cam/frame
    inner = jnp.einsum("bcij,bcfjk,bckl->bcfil", extrinsics, cam_t_cam, extrinsics_inv)
    aligned = jnp.einsum("bij,bcfjk,bkl->bcfil", extrinsics_inv[:, 0], inner, extrinsics[:, 0])

    ref_ang = matrix_to_euler_angles_xyz(ref_t[..., :3, :3])       # [b, n_ctx, 3]
    cur_ang = matrix_to_euler_angles_xyz(aligned[..., :3, :3])      # [b, cams, n_ctx, 3]
    ang_diff = jnp.linalg.norm(ref_ang[:, None] - cur_ang, axis=-1).mean(axis=(0, 2))
    t_diff = jnp.linalg.norm(ref_t[:, None, ..., :3, 3] - aligned[..., :3, 3],
                             axis=-1).mean(axis=(0, 2))
    percam = t_diff + 10.0 * ang_diff
    # camera 0 excluded (reference applies it only for cam != 0)
    return percam.at[0].set(0.0)


def depth_synthesis_loss(depth_aug: jnp.ndarray, tform_depth: jnp.ndarray,
                         tform_mask: jnp.ndarray, disp_aug: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Novel-view depth consistency + smoothness (depth_synthesis_loss.py:15-45).

    depth_aug: [b, cams, H, W, 1]; tform_depth/mask: [b, cams, n_src, H, W, 1].
    Consistency |d_aug - d_warp| / (d_aug + d_warp) clamped to [0,1], masked
    mean over all sources per camera; smoothness is plain (non-edge-aware)
    first-order on mean-normalized aug disparity.
    """
    da = depth_aug[:, :, None]
    con = jnp.abs(da - tform_depth) / (da + tform_depth + 1e-8)
    con = jnp.clip(con, 0.0, 1.0)
    num = jnp.sum(con * tform_mask, axis=(0, 2, 3, 4, 5))
    den = jnp.sum(tform_mask, axis=(0, 2, 3, 4, 5))
    depth_con = num / (den + 1e-8)  # [cams]

    nd = mean_normalized_disp(disp_aug)
    gx = jnp.abs(nd[..., :, :-1, :] - nd[..., :, 1:, :]).mean(axis=(0, 2, 3, 4))
    gy = jnp.abs(nd[..., :-1, :, :] - nd[..., 1:, :, :]).mean(axis=(0, 2, 3, 4))
    return depth_con, gx + gy


def total_loss(
    rng: jax.Array,
    cfg: LossConfig,
    batch: Dict[str, jnp.ndarray],
    disps: Dict[int, jnp.ndarray],          # scale -> [b, cams, h_s, w_s, 1]
    depths: Dict[int, jnp.ndarray],         # scale -> [b, cams, H, W, 1]
    cam_t_cam: jnp.ndarray,                 # [b, cams, n_ctx, 4, 4]
    rendered: Dict[int, "RenderOutputs"],   # scale -> RenderOutputs
    disps_aug: Optional[Dict[int, jnp.ndarray]] = None,
    depths_aug: Optional[Dict[int, jnp.ndarray]] = None,
    step: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Aggregate the full training loss. Returns (scalar, logs dict).

    Per-scale per-camera terms are averaged over scales then cameras,
    mirroring the reference accumulation order
    (single_cam_loss.py:69-94, models/vfdepth.py:290-313).

    ``step`` (traced scalar) drives the cold-start overlap-coefficient ramp
    when ``cfg.warmup_steps``/``cfg.ramp_steps`` are set; None (eval) or an
    all-zero schedule means full coefficients.
    """
    ctx_ids = list(cfg.frame_ids[1:])
    target = batch["color/0/0"]
    ref_mask = batch["mask"]
    context = jnp.stack([batch[f"color/{f}/0"] for f in ctx_ids], axis=2)

    ramp, st_ramp, amask_blend = cold_start_schedule(cfg, step, target.dtype)
    sp_coeff = cfg.spatio_coeff if ramp is None else cfg.spatio_coeff * ramp
    st_coeff = (cfg.spatio_tempo_coeff if st_ramp is None
                else cfg.spatio_tempo_coeff * st_ramp)

    cam_loss = jnp.zeros((target.shape[1],), dtype=target.dtype)
    logs: Dict[str, jnp.ndarray] = {}

    for scale in cfg.scales:
        r = rendered[scale]
        rng, k1 = jax.random.split(rng)
        reproj, reproj_map, amask = reprojection_loss(
            k1, target, context, r.temporal_img, ref_mask,
            amask_blend=amask_blend)
        color_s = batch[f"color/0/{scale}"]
        smooth = smoothness_loss(color_s, disps[scale])

        scale_loss = reproj + cfg.disparity_smoothness * smooth / (2.0 ** scale)

        if cfg.spatio or cfg.spatio_temporal:
            sp, sp_mask = spatio_loss_fn(
                target, r.overlap_img[:, :, 0], r.overlap_mask[:, :, 0], ref_mask)
            st = spatio_tempo_loss_fn(
                target, r.overlap_img[:, :, 1:], r.overlap_mask[:, :, 1:],
                ref_mask, amask)
            scale_loss = scale_loss + sp_coeff * sp + st_coeff * st
            if scale == 0:
                logs["spatio_loss"] = sp.mean()
                logs["spatio_tempo_loss"] = st.mean()
                if ramp is not None:
                    logs["overlap_ramp"] = ramp
                    logs["st_ramp"] = st_ramp

        if cfg.pose_model == "fsm" and cfg.pose_loss_coeff > 0:
            pose_l = pose_consistency_loss(
                cam_t_cam, batch["extrinsics"], batch["extrinsics_inv"])
            scale_loss = scale_loss + cfg.pose_loss_coeff * pose_l
            if scale == 0:
                logs["pose"] = pose_l.mean()

        if cfg.aug_depth:
            con, sm = depth_synthesis_loss(
                depths_aug[scale], r.tform_depth, r.tform_depth_mask,
                disps_aug[scale])
            scale_loss = scale_loss + cfg.depth_con_coeff * con + cfg.depth_sm_coeff * sm
            if scale == 0:
                logs["depth_con_loss"] = con.mean()
                logs["depth_sm_loss"] = sm.mean()
                logs["depth_loss"] = (cfg.depth_con_coeff * con + cfg.depth_sm_coeff * sm).mean()

        cam_loss = cam_loss + scale_loss

        if scale == 0:
            logs["reproj_loss"] = reproj.mean()
            # scalar automask coverage (fraction of pixels whose gradient
            # survives the identity comparison) — the first thing to watch
            # when training stalls
            logs["amask_cover"] = amask.mean()
            logs["smooth"] = smooth.mean()
            logs["reproj_map"] = reproj_map      # for TB panels
            logs["reproj_mask"] = amask
            d0 = jax.lax.stop_gradient(depths[0])
            logs["depth/mean"] = d0.mean()
            logs["depth/max"] = d0.max()
            logs["depth/min"] = d0.min()
            t0 = jax.lax.stop_gradient(cam_t_cam[:, 0, 0])
            logs["pose/tx"] = jnp.abs(t0[:, 0, 3]).mean()
            logs["pose/ty"] = jnp.abs(t0[:, 1, 3]).mean()
            logs["pose/tz"] = jnp.abs(t0[:, 2, 3]).mean()

    cam_loss = cam_loss / float(len(cfg.scales))
    total = cam_loss.mean()  # mean over cameras (vfdepth.py:302)

    if ramp is not None:
        # cold-start priors (see LossConfig): full strength during the
        # temporal-only warmup, fading with the LAST ramp (= the single
        # joint ramp by default; under stagger_ramps the spatio-temporal
        # one, so the priors outlive the spatio ramp)
        prior_scale = 1.0 - st_ramp
        t_norm = jnp.linalg.norm(
            cam_t_cam[..., :3, 3].astype(jnp.float32), axis=-1).mean()
        # two-sided hinge: the zero-pose basin is below the floor; the
        # other degenerate basin (|t| runs to the +-4 clamp, every warp
        # leaves the image, all gradients die) is above the ceiling
        pose_prior = (jax.nn.relu(cfg.pose_prior_floor - t_norm)
                      + jax.nn.relu(t_norm - cfg.pose_prior_ceil))
        # LOG-space anchor: the linear form (mean disp - 0.5)^2 loses its
        # gradient exactly when it is needed — once the sigmoid saturates
        # toward max depth (disp -> 0), d(anchor)/d(logit) ~ sigmoid'(x)
        # -> 0, and the run freezes in the dead basin (observed: depth
        # metrics frozen from step ~200 of the warmup). In log space the
        # 1/disp factor cancels the dying sigmoid': d/d(logit) ~
        # disp*(1-disp)/disp = 1-disp stays O(1) at saturation. Mean of
        # logs (not log of mean): concavity penalizes saturated POCKETS
        # even when the mean looks healthy.
        disp_anchor = (jnp.log(disps[0].astype(jnp.float32) + 1e-3).mean()
                       - jnp.log(0.5)) ** 2
        prior = prior_scale * (cfg.pose_prior_coeff * pose_prior
                               + cfg.disp_anchor_coeff * disp_anchor)
        total = total + prior.astype(total.dtype)
        logs["cold_start/pose_prior"] = pose_prior
        logs["cold_start/disp_anchor"] = disp_anchor

    logs["total_loss"] = total
    return total, logs
