"""Orbax checkpointing with the reference's tracked-best semantics.

Reference lib/trainer.py:65-92,309-330 saves one torch .pth per epoch plus
one per best metric (loss, c_loss, f_loss, o_loss, PIR, IR). Here each save
is an orbax PyTree checkpoint directory holding {params, opt_state, step,
epoch, best_metrics}; resume restores all of it (reference trainer.py:94-130).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

BEST_METRICS = ("loss", "c_loss", "f_loss", "o_loss", "PIR", "IR")
# metrics where larger is better (reference trainer.py:317-330)
MAXIMIZE = ("PIR", "IR")


def save_checkpoint(path: str, state, epoch: int, best_metrics: Dict[str, float]):
    path = os.path.abspath(path)
    ckpt = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(epoch, np.int32),
        "best_metrics": {k: np.asarray(v, np.float32) for k, v in best_metrics.items()},
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, ckpt, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, abstract_state=None) -> Dict[str, Any]:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if abstract_state is not None:
        target = {
            "params": abstract_state.params,
            "opt_state": abstract_state.opt_state,
            "step": abstract_state.step,
            "epoch": np.asarray(0, np.int32),
            "best_metrics": {k: np.asarray(0, np.float32) for k in BEST_METRICS},
        }
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def init_best_metrics() -> Dict[str, float]:
    return {k: (-np.inf if k in MAXIMIZE else np.inf) for k in BEST_METRICS}


def update_bests(
    best: Dict[str, float], current: Dict[str, float]
) -> Dict[str, bool]:
    """Returns {metric: improved?} and mutates `best` in place."""
    improved = {}
    for k in BEST_METRICS:
        if k not in current:
            improved[k] = False
            continue
        cur = float(current[k])
        if k in MAXIMIZE:
            improved[k] = cur > best[k]
        else:
            improved[k] = cur < best[k]
        if improved[k]:
            best[k] = cur
    return improved
