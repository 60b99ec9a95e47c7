"""Converter test: a synthetic torch state_dict with the reference's exact
key/shape layout (captured from the instantiated reference model into
tests/fixtures/ref_state_dict_keys.json) must convert into a pytree that is
structurally identical to RoITr.init's params — every path, every shape."""

import json
import os

import numpy as np
import jax
import pytest

from roitr_tpu.config import Config
from roitr_tpu.utils.convert import torch_state_dict_to_params

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ref_state_dict_keys.json")


@pytest.fixture(scope="module")
def fake_state_dict():
    shapes = json.load(open(FIXTURE))
    rng = np.random.RandomState(0)
    return {k: rng.randn(*shp).astype(np.float32) if shp else np.float32(rng.randn())
            for k, shp in shapes.items()}


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(np.shape(v))
    return out


def test_conversion_structure_matches_model(fake_state_dict):
    cfg = Config(benchmark="3DMatch")
    from roitr_tpu.data.synthetic import make_pair_inputs
    from roitr_tpu.models.roitr import RoITr

    pair = make_pair_inputs(np.random.RandomState(0), 256, 224, 192, normal_k=8)
    model = RoITr(cfg)
    params = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, p, train=False
        )
    )(pair)["params"]

    converted = torch_state_dict_to_params(fake_state_dict)

    want = _paths(jax.tree_util.tree_map(np.asarray, params))
    got = _paths(converted)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"converter missing {len(missing)} params: {missing[:8]}"
    assert not extra, f"converter produced {len(extra)} unknown params: {extra[:8]}"
    for k in want:
        assert want[k] == got[k], f"shape mismatch at {k}: {want[k]} vs {got[k]}"


def test_converted_params_run(fake_state_dict):
    cfg = Config(benchmark="3DMatch", sinkhorn_iters=5)
    from roitr_tpu.data.synthetic import make_pair_inputs
    from roitr_tpu.models.roitr import RoITr

    pair = make_pair_inputs(np.random.RandomState(1), 256, 224, 192, normal_k=8)
    model = RoITr(cfg)
    # scale down the random fake weights so activations stay finite
    converted = jax.tree_util.tree_map(
        lambda x: np.asarray(x) * 0.05, torch_state_dict_to_params(fake_state_dict)
    )
    out = model.apply({"params": converted}, pair, train=False)
    assert np.isfinite(np.asarray(out["src_node_feats"])).all()


def test_ddp_prefix_stripped(fake_state_dict):
    prefixed = {"module." + k: v for k, v in fake_state_dict.items()}
    a = torch_state_dict_to_params(fake_state_dict)
    b = torch_state_dict_to_params(prefixed)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(x, y)


def test_convert_weights_cli(tmp_path, fake_state_dict):
    """tools/convert_weights.py: torch .pth -> orbax params checkpoint."""
    import subprocess
    import sys

    import torch

    src = tmp_path / "model_ref.pth"
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in fake_state_dict.items()}},
               str(src))
    out = tmp_path / "converted"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=repo)
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_weights.py"),
         str(src), str(out)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "converted" in res.stdout

    from roitr_tpu.train.checkpoint import load_checkpoint

    restored = load_checkpoint(str(out))
    assert "params" in restored
    assert "coarse_proj" in restored["params"]
