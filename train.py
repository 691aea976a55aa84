"""Training CLI (reference ``train.py``): ``python train.py --config_file <yaml>``.

Single-program SPMD: all local devices participate through the sharded train
step; no process spawning or rendezvous (the torch-DDP launcher has no TPU
analog — the JAX runtime owns multi-host initialization).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    parser = argparse.ArgumentParser(description="vfdepth_tpu training")
    parser.add_argument("--config_file", default="./configs/ddad/ddad_surround_fusion.yaml",
                        type=str, help="config yaml file path")
    parser.add_argument("--max_steps", default=None, type=int,
                        help="optional early stop (debug)")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend (debug)")
    return parser.parse_args()


def check_init_strategy(cfg):
    """Warn when the config assumes ImageNet encoder init but no weight file
    is available AND the cold-start recipe is off — that combination
    collapses within ~100 steps (docs/PERF.md 'Learning validation').
    Points at the supported alternatives instead of failing late."""
    if not cfg.get("weights_init", False):
        return
    from vfdepth_tpu.models.torchvision_init import find_resnet_weights
    if find_resnet_weights(cfg.get("num_layers", 18)):
        return
    if int(cfg.get("cold_start_warmup_steps", 0)) > 0:
        return
    print(
        "WARNING: weights_init is true but no pretrained ResNet weights were "
        "found (assets/weights/resnet*_imagenet.npz / VFDEPTH_RESNET_WEIGHTS),"
        " and the cold-start schedule is off. Joint training from a random "
        "init collapses under the plain objective. Either fetch weights "
        "(`python scripts/fetch_imagenet_weights.py` on a networked machine) "
        "or train from scratch with the staged recipe: "
        "configs/ddad/ddad_surround_fusion_scratch.yaml / "
        "configs/nuscenes/nusc_surround_fusion_scratch.yaml.",
        file=sys.stderr)


def train(cfg, max_steps=None):
    from vfdepth_tpu.data.factory import construct_dataset
    from vfdepth_tpu.data.loader import BatchLoader
    from vfdepth_tpu.parallel.distributed import (
        is_main_process, loader_shard, maybe_initialize_distributed)
    from vfdepth_tpu.training.model import VFDepthModel
    from vfdepth_tpu.training.trainer import Trainer

    # multi-host: jax.distributed init + per-process loader shard — the
    # reference's DDP rendezvous + DistributedSampler
    # (utils/ddp.py:10-29, models/vfdepth.py:117-125)
    maybe_initialize_distributed()
    shard_index, num_shards = loader_shard()
    check_init_strategy(cfg)

    model = VFDepthModel(cfg)

    train_ds = construct_dataset(cfg, "train")
    # The shuffle seed must be HOST-INVARIANT: every process draws the same
    # per-epoch permutation and takes its own contiguous slice, so the
    # shards partition the epoch disjointly — the reference's
    # DistributedSampler + set_epoch semantics (models/vfdepth.py:117-125).
    # Per-sample augmentation randomness is independent of this: datasets
    # fold (seed, epoch, sample_idx) into their jitter RNG, so disjoint
    # shards already get distinct augmentation without per-process seeds.
    train_loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                               num_workers=cfg.get("num_workers", 2),
                               seed=42,
                               shard_index=shard_index, num_shards=num_shards)
    # every process constructs the (identical, unsharded) val loader: the
    # validation step is part of the SPMD program and must run on all hosts;
    # only process 0 logs its results (trainer guards that).
    try:
        val_ds = construct_dataset(cfg, "val")
        val_loader = BatchLoader(val_ds, cfg.batch_size, shuffle=False,
                                 num_workers=0)
    except (FileNotFoundError, ValueError):
        val_loader = None

    trainer = Trainer(cfg, model, use_tb=is_main_process())
    trainer.learn(train_loader, val_loader, max_steps=max_steps)


if __name__ == "__main__":
    args = parse_args()
    from vfdepth_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from vfdepth_tpu.config import get_config

    cfg = get_config(args.config_file, mode="train")
    train(cfg, max_steps=args.max_steps)
