"""Evaluation CLI (reference ``eval.py``):
``python eval.py --config_file <yaml> [--weight_path <dir>]``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    parser = argparse.ArgumentParser(description="vfdepth_tpu evaluation")
    parser.add_argument("--config_file", default="./configs/ddad/ddad_surround_fusion.yaml",
                        type=str, help="config yaml file path")
    parser.add_argument("--weight_path", default=None, type=str,
                        help="checkpoint directory (weights_<epoch>)")
    parser.add_argument("--vis_results", action="store_true",
                        help="save per-camera disparity JPEGs")
    parser.add_argument("--cpu", action="store_true")
    return parser.parse_args()


def test(cfg, vis_results=False):
    import jax
    from vfdepth_tpu.data.factory import construct_dataset
    from vfdepth_tpu.data.loader import BatchLoader
    from vfdepth_tpu.training.model import VFDepthModel
    from vfdepth_tpu.training.step import create_train_state
    from vfdepth_tpu.training.trainer import Trainer
    import jax.numpy as jnp

    model = VFDepthModel(cfg)
    eval_ds = construct_dataset(cfg, "val")
    eval_loader = BatchLoader(eval_ds, cfg.eval_batch_size, shuffle=False,
                              drop_last=True,
                              num_workers=cfg.get("eval_num_workers", 2))

    first = next(iter(eval_loader))
    batch = {k: jnp.asarray(v) for k, v in first.items()}
    state, _ = create_train_state(model, jax.random.PRNGKey(0), batch)

    if not os.path.isdir(cfg.load_weights_dir):
        # evaluating random weights silently produces garbage metrics
        if not os.environ.get("VFDEPTH_EVAL_RANDOM_OK"):
            raise FileNotFoundError(
                f"checkpoint directory not found: {cfg.load_weights_dir!r} — "
                "pass --weight_path or set load.weights in the config "
                "(set VFDEPTH_EVAL_RANDOM_OK=1 to evaluate random init anyway)")
        print(f"WARNING: no checkpoint at {cfg.load_weights_dir!r}; "
              "evaluating RANDOM weights")

    trainer = Trainer(cfg, model, use_tb=False)
    trainer.evaluate(eval_loader, state, vis_results=vis_results,
                     load_weights=os.path.isdir(cfg.load_weights_dir))


if __name__ == "__main__":
    args = parse_args()
    from vfdepth_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from vfdepth_tpu.config import get_config

    cfg = get_config(args.config_file, mode="eval", weight_path=args.weight_path)
    test(cfg, vis_results=args.vis_results)
