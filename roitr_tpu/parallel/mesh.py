"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP setup (main.py:27-34,
trainer.py DistributedDataParallel): a 1-D `data` mesh over which pair
batches are sharded and parameters replicated. Gradient all-reduce is
emitted by XLA as ICI collectives from the sharded jit — no explicit
communication code (reference relies on DDP bucket hooks instead).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp_size: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp_size is None:
        dp_size = len(devices)
    if dp_size > len(devices):
        raise ValueError(f"dp_size {dp_size} > available devices {len(devices)}")
    return Mesh(np.array(devices[:dp_size]), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree (leading batch axis on every leaf) onto the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
