"""End-to-end smoke drive: full fusion forward + loss on a fake batch.

Usage: python scripts/smoke_forward.py [--mono] [--aug]
Runs on CPU with tiny shapes; prints the loss dict and output shapes.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from vfdepth_tpu.data.fake import FakeDataset
from vfdepth_tpu.presets import tiny_config as _tiny_preset
from vfdepth_tpu.training.model import VFDepthModel


def tiny_config(depth_model="fusion", pose_model="fusion", aug_depth=False,
                height=64, width=96, num_cams=6, batch_size=1):
    from vfdepth_tpu.config import DDAD_CAM_LIST
    return _tiny_preset(depth_model=depth_model, pose_model=pose_model,
                        aug_depth=aug_depth, height=height, width=width,
                        cameras=DDAD_CAM_LIST[:num_cams], batch_size=batch_size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mono", action="store_true", help="fsm baseline nets")
    ap.add_argument("--aug", action="store_true", help="depth synthesis branch")
    args = ap.parse_args()

    kind = "fsm" if args.mono else "fusion"
    cfg = tiny_config(depth_model=kind, pose_model=kind, aug_depth=args.aug)
    model = VFDepthModel(cfg)

    ds = FakeDataset(num_samples=2, num_cams=cfg.num_cams, height=cfg.height,
                     width=cfg.width, fusion_level=cfg.fusion_level)
    batch = {k: jnp.asarray(v) for k, v in ds.batch([0]).items()}

    rng = jax.random.PRNGKey(0)
    t = time.time()
    params, stats = model.init(rng, batch)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"init ok: {n_params / 1e6:.2f}M params in {time.time() - t:.1f}s")

    t = time.time()
    outputs, (loss, logs), new_stats = model.forward(params, stats, batch, rng, train=True)
    loss = float(loss)
    print(f"forward ok in {time.time() - t:.1f}s; total_loss={loss:.4f}")
    for k, v in sorted(logs.items()):
        if hasattr(v, "shape") and v.ndim == 0:
            print(f"  {k}: {float(v):.5f}")
    for k, v in sorted(outputs.items()):
        print(f"  out {k}: {v.shape}")
    assert np.isfinite(loss), "loss is not finite!"

    # gradient flow check
    def loss_fn(p):
        _, (l, _), _ = model.forward(p, stats, batch, rng, train=True)
        return l
    t = time.time()
    grads = jax.grad(loss_fn)(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(grads))))
    print(f"grad ok in {time.time() - t:.1f}s; global grad norm={gnorm:.4f}")
    assert np.isfinite(gnorm) and gnorm > 0, "bad gradients"
    print("SMOKE PASS")


if __name__ == "__main__":
    main()
