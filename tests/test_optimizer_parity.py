"""Optimizer trajectory parity vs torch.optim (reference main.py:79-100).

The reference builds torch Adam(betas=(0.9, 0.99), weight_decay) or
SGD(momentum, weight_decay) with a per-epoch ExponentialLR. make_optimizer
must produce the identical parameter trajectory on a toy quadratic.
"""

import numpy as np
import jax.numpy as jnp
import torch

from roitr_tpu.config import Config
from roitr_tpu.parallel import make_optimizer

LR = 0.01
WD = 0.01
GAMMA = 0.5
STEPS_PER_EPOCH = 2
EPOCHS = 3

INIT = np.array([1.0, -2.0, 0.5, 3.0], np.float32)
TARGET = np.array([0.0, 1.0, -1.0, 2.0], np.float32)
SCALE = np.array([1.0, 2.0, 0.5, 4.0], np.float32)


def torch_trajectory(opt_name):
    w = torch.nn.Parameter(torch.tensor(INIT))
    tgt, sc = torch.tensor(TARGET), torch.tensor(SCALE)
    if opt_name == "SGD":
        opt = torch.optim.SGD([w], lr=LR, momentum=0.98, weight_decay=WD)
    else:
        opt = torch.optim.Adam([w], lr=LR, betas=(0.9, 0.99), weight_decay=WD)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=GAMMA)
    traj = []
    for _ in range(EPOCHS):
        for _ in range(STEPS_PER_EPOCH):
            opt.zero_grad()
            loss = 0.5 * (sc * (w - tgt) ** 2).sum()
            loss.backward()
            opt.step()
            traj.append(w.detach().numpy().copy())
        sched.step()  # reference trainer.py:306: per-epoch
    return traj


def jax_trajectory(opt_name):
    cfg = Config(optimizer=opt_name, lr=LR, weight_decay=WD,
                 scheduler_gamma=GAMMA, momentum=0.98, iter_size=1)
    tx = make_optimizer(cfg, steps_per_epoch=STEPS_PER_EPOCH)
    params = {"w": jnp.asarray(INIT)}
    opt_state = tx.init(params)
    tgt, sc = jnp.asarray(TARGET), jnp.asarray(SCALE)
    traj = []
    import optax

    for _ in range(EPOCHS * STEPS_PER_EPOCH):
        grads = {"w": sc * (params["w"] - tgt)}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        traj.append(np.asarray(params["w"]))
    return traj


def test_adam_matches_torch():
    for i, (a, b) in enumerate(zip(torch_trajectory("ADAM"), jax_trajectory("ADAM"))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=f"step {i}")


def test_sgd_matches_torch():
    for i, (a, b) in enumerate(zip(torch_trajectory("SGD"), jax_trajectory("SGD"))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=f"step {i}")


def test_unknown_optimizer_raises():
    import pytest

    cfg = Config(optimizer="adagrad")
    with pytest.raises(NotImplementedError):
        make_optimizer(cfg, steps_per_epoch=10)
