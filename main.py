"""CLI entry point: python main.py <config.yaml> [--mode train|val|test].

Mirrors the reference surface (main.py:19-139) minus the DDP flags — device
parallelism is a config field (`dp_size`) resolved against the JAX mesh, not
a launcher concern.
"""

import argparse
import os
import shutil

import numpy as np


def snapshot_sources(snapshot_dir: str):
    """Copy model/data/lib sources into the run dir for provenance
    (reference main.py:55-65)."""
    dst = os.path.join(snapshot_dir, "src")
    os.makedirs(dst, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    for rel in ["roitr_tpu", "main.py"]:
        src = os.path.join(here, rel)
        target = os.path.join(dst, rel)
        if os.path.isdir(src):
            shutil.copytree(src, target, dirs_exist_ok=True,
                            ignore=shutil.ignore_patterns("__pycache__"))
        else:
            shutil.copy2(src, target)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="two-level YAML config")
    parser.add_argument("--mode", default=None, help="override config mode")
    args = parser.parse_args()

    from roitr_tpu.config import load_config

    overrides = {}
    if args.mode:
        overrides["mode"] = args.mode
    cfg = load_config(args.config, **overrides)

    np.random.seed(cfg.seed)

    import jax

    from roitr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if jax.process_index() == 0:
        snapshot_dir = os.path.join("snapshot", cfg.exp_dir)
        os.makedirs(snapshot_dir, exist_ok=True)
        snapshot_sources(snapshot_dir)

    from roitr_tpu.eval.tester import get_trainer

    runner = get_trainer(cfg)
    if cfg.mode == "train":
        runner.train()
    elif cfg.mode == "val":
        runner.eval()
    elif cfg.mode == "test":
        runner.test()
    else:
        raise ValueError(f"unknown mode {cfg.mode!r}")


if __name__ == "__main__":
    main()
