"""Torch checkpoint -> flax params converter.

Maps the reference RoITr state_dict (released weights, README.md:44,112 of
/root/reference; layout verified against model/RIGA_v2.py) onto this
framework's parameter pytree. Linear weights are transposed (torch (out,in)
-> flax kernel (in,out)); LayerNorm weight/bias -> scale/bias.

Intentionally dropped reference entries:
- `OT.*`: RIGA_v2 instantiates two LearnableLogOptimalTransport modules but
  only `optimal_transport` is used in forward (RIGA_v2.py:32,55,153).
- `backbone.occ_proj.*`: dead head, never called in forward and its loss
  weight is 0 (model.py:166, configs occ_loss_weight: 0.0).
- `*.embedding.div_term`: a constant sinusoidal buffer, recomputed on the
  fly here.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

SKIP_PATTERNS = (
    re.compile(r"^OT\."),
    re.compile(r"^backbone\.occ_proj\."),
    re.compile(r"\.div_term$"),
)


def _set(tree: Dict, path, leaf_name: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def _dense(tree, path, sd, torch_prefix):
    _set(tree, path, "kernel", np.ascontiguousarray(sd[torch_prefix + ".weight"].T))
    _set(tree, path, "bias", np.asarray(sd[torch_prefix + ".bias"]))


def _layernorm(tree, path, sd, torch_prefix):
    _set(tree, path, "scale", np.asarray(sd[torch_prefix + ".weight"]))
    _set(tree, path, "bias", np.asarray(sd[torch_prefix + ".bias"]))


def _local_transformer(tree, flax_base, sd, torch_base):
    """LocalPPFTransformer mapping (reference ppftransformer.py:202-253)."""
    _dense(tree, flax_base + ["embedding_proj"], sd, torch_base + ".embedding.proj")
    _dense(tree, flax_base + ["in_proj"], sd, torch_base + ".in_proj")
    _dense(tree, flax_base + ["out_proj"], sd, torch_base + ".out_proj")
    att = torch_base + ".transformer"
    for name in ("proj_q", "proj_k", "proj_v", "proj_p", "proj_vp"):
        _dense(tree, flax_base + ["attention", name], sd, f"{att}.attention.{name}")
    _dense(tree, flax_base + ["attention", "linear"], sd, att + ".linear")
    _layernorm(tree, flax_base + ["attention", "norm"], sd, att + ".norm")


def _ffn(tree, flax_base, sd, torch_base):
    _dense(tree, flax_base + ["expand"], sd, torch_base + ".expand")
    _dense(tree, flax_base + ["squeeze"], sd, torch_base + ".squeeze")
    _layernorm(tree, flax_base + ["norm"], sd, torch_base + ".norm")


def torch_state_dict_to_params(
    sd: Dict[str, Any],
    transformer_architecture=("self", "cross", "self", "cross", "self", "cross"),
    enc_blocks=(2, 3, 3, 3),
) -> Dict[str, Any]:
    """state_dict (torch tensors or numpy arrays) -> flax params dict."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in sd.items()
    }
    # strip DDP prefixes (reference trainer.py:106)
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}

    tree: Dict[str, Any] = {}
    bb = ["backbone"]

    for lvl in range(1, 5):
        _local_transformer(
            tree, bb + [f"enc{lvl}_down", "transformer"], sd, f"backbone.enc{lvl}.0.transformer"
        )
        for b in range(1, enc_blocks[lvl - 1]):
            base = f"backbone.enc{lvl}.{b}"
            _local_transformer(
                tree,
                bb + [f"enc{lvl}_block{b}", "transformer"],
                sd,
                base + ".transformer.transformer",
            )
            _layernorm(tree, bb + [f"enc{lvl}_block{b}", "bn2"], sd, base + ".bn2")

    # decoder: dec4 head + blocks
    _dense(tree, bb + ["dec4_up", "linear1"], sd, "backbone.dec4.0.linear1.0")
    _layernorm(tree, bb + ["dec4_up", "norm1"], sd, "backbone.dec4.0.linear1.1")
    _dense(tree, bb + ["dec4_up", "linear2"], sd, "backbone.dec4.0.linear2.0")
    for lvl in (3, 2, 1):
        _dense(tree, bb + [f"dec{lvl}_up", "linear1"], sd, f"backbone.dec{lvl}.0.linear1.0")
        _layernorm(tree, bb + [f"dec{lvl}_up", "norm1"], sd, f"backbone.dec{lvl}.0.linear1.1")
        _dense(tree, bb + [f"dec{lvl}_up", "linear2"], sd, f"backbone.dec{lvl}.0.linear2.0")
        _layernorm(tree, bb + [f"dec{lvl}_up", "norm2"], sd, f"backbone.dec{lvl}.0.linear2.1")
    for lvl in range(1, 5):
        base = f"backbone.dec{lvl}.1"
        _local_transformer(
            tree, bb + [f"dec{lvl}_block", "transformer"], sd, base + ".transformer.transformer"
        )
        _layernorm(tree, bb + [f"dec{lvl}_block", "bn2"], sd, base + ".bn2")

    # global transformer
    gt = "backbone.global_transformer"
    gbase = bb + ["global_transformer"]
    _dense(tree, gbase + ["embedding", "proj_d"], sd, gt + ".embedding.proj_d")
    _dense(tree, gbase + ["embedding", "proj_a"], sd, gt + ".embedding.proj_a")
    _dense(tree, gbase + ["in_proj"], sd, gt + ".in_proj")
    _dense(tree, gbase + ["out_proj"], sd, gt + ".out_proj")
    for i, block in enumerate(transformer_architecture):
        lbase = gbase + [f"layers_{i}"]
        tbase = f"{gt}.transformer.layers.{i}"
        if block == "self":
            for name in ("proj_q", "proj_k", "proj_v"):
                _dense(tree, lbase + ["attention", name], sd, f"{tbase}.attention.attention.{name}")
            # factored projections keep raw kernel/bias params (flax layout)
            _set(tree, lbase + ["attention"], "proj_p_kernel",
                 np.ascontiguousarray(sd[f"{tbase}.attention.attention.proj_p.weight"].T))
            _set(tree, lbase + ["attention"], "proj_p_bias",
                 np.asarray(sd[f"{tbase}.attention.attention.proj_p.bias"]))
            _set(tree, lbase + ["attention"], "proj_vp_kernel",
                 np.ascontiguousarray(sd[f"{tbase}.attention.attention.proj_vp.weight"].T))
            _set(tree, lbase + ["attention"], "proj_vp_bias",
                 np.asarray(sd[f"{tbase}.attention.attention.proj_vp.bias"]))
            _dense(tree, lbase + ["linear"], sd, tbase + ".attention.linear")
            _layernorm(tree, lbase + ["norm"], sd, tbase + ".attention.norm")
            _dense(tree, lbase + ["pos_linear"], sd, tbase + ".attention.pos_linear")
            _layernorm(tree, lbase + ["pos_norm"], sd, tbase + ".attention.pos_norm")
            _ffn(tree, lbase + ["output"], sd, tbase + ".output")
            _ffn(tree, lbase + ["pos_proj"], sd, tbase + ".pos_proj")
        else:
            for name in ("proj_q", "proj_k", "proj_v"):
                _dense(tree, lbase + [name], sd, f"{tbase}.attention.attention.{name}")
            _dense(tree, lbase + ["linear"], sd, tbase + ".attention.linear")
            _layernorm(tree, lbase + ["norm"], sd, tbase + ".attention.norm")
            _ffn(tree, lbase + ["output"], sd, tbase + ".output")

    _dense(tree, ["coarse_proj"], sd, "coarse_proj")
    _dense(tree, ["fine_proj"], sd, "fine_proj")
    tree["ot_alpha"] = np.asarray(sd["optimal_transport.alpha"])
    return tree


def consumed_keys(sd_keys) -> Dict[str, bool]:
    """Which torch keys are intentionally skipped (for audit)."""
    out = {}
    for k in sd_keys:
        out[k] = any(p.search(k) for p in SKIP_PATTERNS)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint file; returns the state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt
