"""Matching / registration visualization (matplotlib, headless-safe).

Rebuilds the reference visualizer/ capabilities (visualizer.py:9-255:
alignment renderings, correspondence lines, patch coloring) without the
Open3D interactive window: figures are written to files, suitable for
headless TPU hosts and CI artifacts.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

SRC_COLOR = "#ff7e0e"
TGT_COLOR = "#1f77b4"


def _scatter(ax, pts, color, size=0.5, alpha=0.6, label=None):
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=size, c=color, alpha=alpha,
               label=label, linewidths=0)


class Visualizer:
    """Renders dumped pair dictionaries (roitr_tpu.eval.tester format)."""

    def __init__(self, out_dir: str = "viz"):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def _fig(self):
        fig = plt.figure(figsize=(9, 7))
        ax = fig.add_subplot(111, projection="3d")
        ax.set_axis_off()
        return fig, ax

    def show_alignment(
        self,
        src_pcd: np.ndarray,
        tgt_pcd: np.ndarray,
        rot: Optional[np.ndarray] = None,
        trans: Optional[np.ndarray] = None,
        name: str = "alignment",
    ) -> str:
        """Render both clouds, optionally with src moved by (rot, trans)."""
        if rot is not None:
            src_pcd = src_pcd @ np.asarray(rot).T + np.asarray(trans).reshape(1, 3)
        fig, ax = self._fig()
        _scatter(ax, src_pcd, SRC_COLOR, label="source")
        _scatter(ax, tgt_pcd, TGT_COLOR, label="target")
        ax.legend(loc="upper right")
        path = os.path.join(self.out_dir, f"{name}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return path

    def show_correspondences(
        self,
        src_pcd: np.ndarray,
        tgt_pcd: np.ndarray,
        src_corr: np.ndarray,
        tgt_corr: np.ndarray,
        rot: Optional[np.ndarray] = None,
        trans: Optional[np.ndarray] = None,
        max_lines: int = 200,
        inlier_radius: float = 0.1,
        name: str = "correspondences",
        offset: float = 1.5,
    ) -> str:
        """Side-by-side clouds with correspondence lines; green = inlier
        under the GT transform (when given), red = outlier."""
        span = float(np.ptp(tgt_pcd[:, 0]) if len(tgt_pcd) else 1.0)
        shift = np.array([span * offset, 0.0, 0.0], np.float32)

        fig, ax = self._fig()
        _scatter(ax, src_pcd, SRC_COLOR, alpha=0.3)
        _scatter(ax, tgt_pcd + shift, TGT_COLOR, alpha=0.3)

        n = min(len(src_corr), max_lines)
        sel = np.linspace(0, len(src_corr) - 1, n).astype(int) if len(src_corr) else []
        inlier = None
        if rot is not None and len(src_corr):
            warped = src_corr @ np.asarray(rot).T + np.asarray(trans).reshape(1, 3)
            inlier = np.linalg.norm(warped - tgt_corr, axis=1) < inlier_radius
        for i in sel:
            color = "green" if inlier is None or inlier[i] else "red"
            a, b = src_corr[i], tgt_corr[i] + shift
            ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], c=color, lw=0.4, alpha=0.7)
        path = os.path.join(self.out_dir, f"{name}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return path

    def show_nodes(
        self,
        points: np.ndarray,
        nodes: np.ndarray,
        point_to_node: Optional[np.ndarray] = None,
        name: str = "nodes",
    ) -> str:
        """Points colored by owning node (patch partition) + node markers."""
        fig, ax = self._fig()
        if point_to_node is not None:
            cmap = plt.get_cmap("tab20")
            colors = cmap(np.asarray(point_to_node) % 20)
            ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=0.5, c=colors,
                       alpha=0.6, linewidths=0)
        else:
            _scatter(ax, points, "#888888")
        ax.scatter(nodes[:, 0], nodes[:, 1], nodes[:, 2], s=30, c="black", marker="*")
        path = os.path.join(self.out_dir, f"{name}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return path

    def show_dump(self, data: Dict[str, np.ndarray], prefix: str = "pair") -> Dict[str, str]:
        """Render the standard views for one dumped pair."""
        out = {}
        out["input"] = self.show_alignment(
            np.asarray(data["src_pcd"]), np.asarray(data["tgt_pcd"]), name=f"{prefix}_input"
        )
        out["gt"] = self.show_alignment(
            np.asarray(data["src_pcd"]), np.asarray(data["tgt_pcd"]),
            data["rot"], data["trans"], name=f"{prefix}_gt_aligned",
        )
        if len(np.asarray(data.get("src_corr_pts", []))):
            out["corr"] = self.show_correspondences(
                np.asarray(data["src_pcd"]), np.asarray(data["tgt_pcd"]),
                np.asarray(data["src_corr_pts"]), np.asarray(data["tgt_corr_pts"]),
                data.get("rot"), data.get("trans"), name=f"{prefix}_corr",
            )
        return out
