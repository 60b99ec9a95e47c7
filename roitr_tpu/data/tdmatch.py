"""3DMatch/3DLoMatch pair dataset (host side).

Reads the reference's data layout unchanged (dataset/tdmatch.py:50-135):
an info pickle with 'rot'/'trans'/'src'/'tgt'/'overlap' lists and per-cloud
`.pth` tensors under the data root — so existing downloads work as-is.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

from roitr_tpu.config import Config
from roitr_tpu.data.preprocess import preprocess_pair


def load_info(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def _load_cloud(path: str) -> np.ndarray:
    """Load a point array saved by the reference tooling (.pth via torch, or
    .npy/.npz for converted data)."""
    if path.endswith(".pth"):
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(data, "numpy"):
            return np.asarray(data.numpy(), np.float32)
        return np.asarray(data, np.float32)
    if path.endswith(".npz"):
        return np.load(path)["points"].astype(np.float32)
    return np.load(path).astype(np.float32)


class TDMatchDataset:
    """Iterable over preprocessed, padded 3DMatch pairs."""

    # the reference skips one corrupt fragment (tdmatch.py:59-65)
    _BAD = ("7-scenes-fire", "cloud_bin_19.pth")

    def __init__(self, infos: Dict, config: Config, data_augmentation: bool = True):
        self.infos = infos
        self.base_dir = config.root
        self.config = config
        self.data_augmentation = data_augmentation
        self.rotated = config.rotated
        self.view_point = np.array([0.0, 0.0, 0.0])

    def __len__(self) -> int:
        return len(self.infos["rot"])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        src_path = os.path.join(self.base_dir, self.infos["src"][index])
        if (
            src_path.split("/")[-2] == self._BAD[0]
            and src_path.split("/")[-1] == self._BAD[1]
        ):
            index = (index + 1) % len(self)
            src_path = os.path.join(self.base_dir, self.infos["src"][index])

        rot = np.asarray(self.infos["rot"][index], np.float32)
        trans = np.asarray(self.infos["trans"][index], np.float32)
        tgt_path = os.path.join(self.base_dir, self.infos["tgt"][index])
        src_pcd = _load_cloud(src_path)
        tgt_pcd = _load_cloud(tgt_path)

        rng = np.random.RandomState() if self.data_augmentation else np.random.RandomState(index)
        return preprocess_pair(
            rng,
            src_pcd,
            tgt_pcd,
            rot,
            trans,
            buckets=self.config.buckets,
            points_limit=self.config.points_limit,
            augment=self.data_augmentation,
            augment_noise=self.config.augment_noise,
            rotated_index=index if (self.rotated and not self.data_augmentation) else None,
            normal_knn=self.config.normal_knn,
            view_point=self.view_point,
            build_pyramid=self.config.host_pyramid,
            device_prep=getattr(self.config, "device_prep", False),
        )
