"""UPFlow-TPU: a TPU-native (JAX/XLA/Pallas) unsupervised optical-flow framework.

A from-scratch rebuild of the capabilities of UPFlow (CVPR 2021,
reference implementation: coolbeam/UPFlow_pytorch) designed TPU-first:

- NHWC layouts everywhere, convs and interpolation mapped to the MXU.
- The hot cost-volume correlation op implemented both as a pure-XLA
  shifted-window reduction and as a fused Pallas kernel.
- Functional, jitted train/eval steps; data parallelism via
  ``jax.sharding.Mesh`` + ``shard_map`` over ICI collectives.
- Unsupervised loss library (photometric / census / smoothness /
  occlusion / pyramid distillation) reproducing the reference math.

Subpackages
-----------
ops        low-level tensor ops (resize, warp, correlation, census, ...)
models     the UPFlow network as Flax linen modules
losses     unsupervised loss library
data       KITTI datasets, flow PNG/.flo codecs, host->device pipeline
eval       KITTI evaluation bench (EPE / F1-all / noc / occ)
train      jitted train step + trainer harness
parallel   mesh construction and sharded step builders
checkpoint torch .pth import and orbax save/restore
utils      meters, timers, visualization, debug helpers
"""

__version__ = "0.1.0"

from upflow_pytorch_tpu import config as config  # noqa: F401
