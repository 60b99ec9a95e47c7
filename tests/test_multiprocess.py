"""Two-process `jax.distributed` smoke test (CPU, 2 x 4 virtual devices).

The reference actually launches its multi-rank DDP path
(main.py:27-34, lib/trainer.py:302-303); until now this repo's multi-HOST
claims (SCALING.md, loader striding, process-0 guards) were tested only
single-process. This spawns two real OS processes that join one
`jax.distributed` cluster, run the sharded train step over the global
8-device mesh, and must agree bitwise on the updated parameters — the
cross-process gradient collective, loader striding disjointness, and the
rank-0 checkpoint guard all verified end-to-end.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    try:
        port = _free_port()
    except OSError:
        pytest.skip("environment cannot bind a localhost port")

    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.update(
        JAX_PLATFORMS="cpu",
        JAX_PLATFORM_NAME="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_ENABLE_COMPILATION_CACHE="false",
        # keep any existing entries (the axon sitecustomize path must stay
        # importable, CLAUDE.md) and make roitr_tpu importable
        PYTHONPATH=os.pathsep.join(
            [repo_root] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
        ),
    )
    env.pop("JAX_NUM_CPU_DEVICES", None)

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                WORKER,
                "--coordinator",
                f"localhost:{port}",
                "--process-id",
                str(i),
                "--num-processes",
                "2",
                "--out",
                str(tmp_path),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = []
    for i in range(2):
        with open(tmp_path / f"result_{i}.json") as f:
            results.append(json.load(f))

    # one global 8-device cluster, 4 local devices each
    for r in results:
        assert r["device_count"] == 8
        assert r["local_device_count"] == 4
        assert all(l == l and abs(l) < 1e9 for l in r["losses"])  # finite

    # the cross-process gradient collective: both processes hold identical
    # updated (replicated) parameters
    assert results[0]["digest"] == results[1]["digest"]
    # and training moved them (digest of two Adam steps differs from zero)
    assert results[0]["digest"] > 0

    # DistributedSampler-equivalent striding: disjoint shards covering all
    i0, i1 = set(results[0]["indices"]), set(results[1]["indices"])
    assert i0.isdisjoint(i1)
    assert i0 | i1 == set(range(16))

    # only process 0 wrote the checkpoint marker
    assert results[0]["wrote_ckpt"] is True
    assert results[1]["wrote_ckpt"] is False
    assert (tmp_path / "ckpt_marker").exists()
