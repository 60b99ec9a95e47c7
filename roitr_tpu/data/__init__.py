import os

# Lazy re-exports (PEP 562): preprocessing worker subprocesses run
# `python -m roitr_tpu.data.worker_main`, which imports this package — an
# eager scipy/loader import here adds ~1.2 s of startup to EVERY worker
# (serialized on small hosts). Workers pull in only what unpickling their
# dataset actually needs.
_LAZY = {
    "dict_to_pair": "roitr_tpu.data.loader",
    "iterate_batches": "roitr_tpu.data.loader",
    "stack_batch": "roitr_tpu.data.loader",
    "preprocess_pair": "roitr_tpu.data.preprocess",
    "make_pair_inputs": "roitr_tpu.data.synthetic",
    "stack_pairs": "roitr_tpu.data.synthetic",
}

__all__ = list(_LAZY) + ["get_dataset"]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def resolve_info_path(relpath: str) -> str:
    """Resolve a split-metadata path (e.g. 'configs/tdmatch/3DMatch.pkl'):
    CWD-relative first (user-supplied splits win), then the repo's vendored
    copy of the published metadata — same out-of-the-box policy as
    eval.registration.resolve_gt_folder."""
    if os.path.exists(relpath) or os.path.isabs(relpath):
        return relpath
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    vendored = os.path.join(repo, relpath)
    return vendored if os.path.exists(vendored) else relpath


def get_dataset(config, mode: str):
    """Dataset factory (reference dataset/dataloader.py:8-30)."""
    if config.dataset == "tdmatch":
        from roitr_tpu.data.tdmatch import TDMatchDataset, load_info

        if mode == "train":
            return TDMatchDataset(
                load_info(resolve_info_path(config.train_info)), config,
                data_augmentation=True)
        if mode == "val":
            return TDMatchDataset(
                load_info(resolve_info_path(config.val_info)), config,
                data_augmentation=False)
        if mode == "test":
            # reference: test split is configs/tdmatch/<benchmark>.pkl
            # (dataset/dataloader.py:18); vendored under configs/tdmatch/
            info_path = getattr(config, "test_info", "") or os.path.join(
                "configs", "tdmatch", f"{config.benchmark}.pkl")
            return TDMatchDataset(
                load_info(resolve_info_path(info_path)), config,
                data_augmentation=False)
    elif config.dataset == "fdmatch":
        from roitr_tpu.data.fdmatch import FDMatchDataset, read_entries

        split_file = {
            "train": config.train_info,
            "val": config.val_info,
            "test": getattr(config, "test_info", "") or config.val_info,
        }[mode]
        entries = read_entries(split_file, config.root)
        return FDMatchDataset(entries, config, data_augmentation=(mode == "train"))
    raise ValueError(f"unknown dataset {config.dataset!r}")
