"""Name -> layer registries (reference model/transformer/factory.py:7-66).

The reference maps config strings to torch modules; here the registries
return flax module constructors / callables so configs can select
activation, normalization, and dropout variants by name.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

ACT_LAYERS = {
    "ReLU": nn.relu,
    "LeakyReLU": lambda x: nn.leaky_relu(x, negative_slope=0.2),
    "ELU": nn.elu,
    "GELU": nn.gelu,
    "Sigmoid": nn.sigmoid,
    "Softplus": nn.softplus,
    "Tanh": jnp.tanh,
    "Identity": lambda x: x,
}

NORM_LAYERS = {
    "LayerNorm": lambda dim, name=None: nn.LayerNorm(epsilon=1e-5, name=name),
    "GroupNorm": lambda dim, name=None: nn.GroupNorm(num_groups=8, name=name),
    "None": lambda dim, name=None: (lambda x: x),
}


def build_act_layer(name: Optional[str]) -> Callable:
    """Reference factory.py build_act_layer; None -> identity."""
    if name is None:
        return ACT_LAYERS["Identity"]
    if name not in ACT_LAYERS:
        raise ValueError(f"unknown activation {name!r}")
    return ACT_LAYERS[name]


def build_dropout_layer(p: Optional[float], deterministic: bool = True) -> Callable:
    """Reference factory.py build_dropout_layer: None/0 -> identity.

    Returns a callable layer; pass deterministic=False during training to
    activate dropout (the reference trains with dropout=None throughout).
    """
    if p is None or p == 0.0:
        return lambda x: x
    return nn.Dropout(rate=p, deterministic=deterministic)


def build_norm_layer(name: str, dim: int):
    if name not in NORM_LAYERS:
        raise ValueError(f"unknown norm {name!r}")
    return NORM_LAYERS[name](dim)
