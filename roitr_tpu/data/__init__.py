from roitr_tpu.data.loader import dict_to_pair, iterate_batches, stack_batch  # noqa: F401
from roitr_tpu.data.preprocess import preprocess_pair  # noqa: F401
from roitr_tpu.data.synthetic import make_pair_inputs, stack_pairs  # noqa: F401


def get_dataset(config, mode: str):
    """Dataset factory (reference dataset/dataloader.py:8-30)."""
    if config.dataset == "tdmatch":
        from roitr_tpu.data.tdmatch import TDMatchDataset, load_info

        if mode == "train":
            return TDMatchDataset(load_info(config.train_info), config, data_augmentation=True)
        if mode == "val":
            return TDMatchDataset(load_info(config.val_info), config, data_augmentation=False)
        if mode == "test":
            info_path = getattr(config, "test_info", "") or config.val_info
            return TDMatchDataset(load_info(info_path), config, data_augmentation=False)
    elif config.dataset == "fdmatch":
        from roitr_tpu.data.fdmatch import FDMatchDataset, read_entries

        split_file = {"train": config.train_info, "val": config.val_info, "test": config.val_info}[mode]
        entries = read_entries(split_file, config.root)
        return FDMatchDataset(entries, config, data_augmentation=(mode == "train"))
    raise ValueError(f"unknown dataset {config.dataset!r}")
