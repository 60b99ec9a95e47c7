"""roitr_tpu: a TPU-native (JAX/XLA/Pallas) point-cloud matching framework.

A from-scratch rebuild of the RoITr (Rotation-Invariant Transformer, CVPR'23)
coarse-to-fine point-cloud matching pipeline, re-designed for TPU:

- static shapes + prefix-packed padding instead of CUDA offset-batched ragged
  tensors (reference: cpp_wrappers/pointops)
- functional flax modules + optax/orbax instead of torch nn.Module/DDP
- data parallelism over pair batches via jax.sharding.Mesh + shard_map
  instead of NCCL DDP (reference: main.py:27-34)
- Pallas kernels for gather-heavy hot ops
"""

__version__ = "0.1.0"

from roitr_tpu.config import Config, load_config  # noqa: F401
from roitr_tpu.serving import Matcher  # noqa: F401  (jax imports stay lazy)
