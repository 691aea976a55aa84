"""vfdepth_tpu — TPU-native surround-view self-supervised depth estimation.

A brand-new JAX/XLA/Pallas framework with the capabilities of VFDepth
("Self-supervised surround-view depth estimation with volumetric feature
fusion", 42dot, NeurIPS 2022): 6-camera surround depth + canonical ego-motion
trained purely with temporal / spatial / spatio-temporal photometric warp
losses, with metric-scale depth via the extrinsics-tied voxel volume and
novel-view depth synthesis.

Designed TPU-first:
  * NHWC layouts, channels-last voxel features so fusion MLPs are MXU matmuls
  * `vmap` over the camera axis instead of per-camera Python loops
  * gather-based bilinear/trilinear samplers (XLA + Pallas variants)
  * SPMD data parallelism via `jax.sharding.Mesh` + jit (grad psum over ICI),
    which also makes batch-norm statistics globally synchronized for free
  * host-side prefetching data feed overlapping with device compute
"""

__version__ = "0.1.0"

from .config import Config, get_config  # noqa: E402
from . import presets  # noqa: E402


def build_model(cfg):
    """Convenience: Config -> VFDepthModel (imports lazily; jax required)."""
    from .training.model import VFDepthModel
    return VFDepthModel(cfg)
