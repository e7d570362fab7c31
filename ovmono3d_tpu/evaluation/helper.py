"""Multi-dataset evaluation aggregation + disentangled NHD.

Re-design of Omni3DEvaluationHelper (omni3d_evaluation.py:193-624): per
dataset, 2D + 3D evaluators accumulate; `summarize_all` re-accumulates the
concatenated per-(category, depth-band) image evals across datasets (the
reference's evals_per_cat_area caching), produces Omni3D rollups, the fixed
novel easy/hard category split (L602-613), and mean + disentangled NHD.
"""
from __future__ import annotations

import numpy as np

from ovmono3d_tpu.evaluation.omni3d_eval import (
    Omni3DEvaluator,
    corners_diag,
    hungarian_corner_distance,
)

# The reference's fixed split over the 22 novel categories
# (omni3d_evaluation.py:602-604).
EASY_NOVEL_CATEGORIES = frozenset(
    {"board", "printer", "painting", "microwave", "tray", "podium", "cart",
     "tram"}
)


def disentangled_nhd(pred: dict, gt: dict) -> dict[str, np.ndarray]:
    """Per-pair disentangled NHDs (omni3d_evaluation.py:2250-2290).

    pred/gt: dicts with center [N, 3], dims [N, 3] (w,h,l), pose [N, 3, 3].
    For each component, build the cuboid from GT with ONLY that component
    replaced by the prediction, then Hungarian-corner distance / GT diagonal.
    """
    import jax.numpy as jnp

    from ovmono3d_tpu.utils.geometry import cuboid_corners

    def corners(center, dims, pose):
        box = np.concatenate([center, dims], axis=-1)
        return np.asarray(
            cuboid_corners(jnp.asarray(box, jnp.float32),
                           jnp.asarray(pose, jnp.float32))
        )

    gt_corners = corners(gt["center"], gt["dims"], gt["pose"])
    diag = np.maximum(corners_diag(gt_corners), 1e-8)

    out = {}
    # xy: predicted x/y at GT depth.
    c_xy = np.concatenate(
        [pred["center"][:, :2], gt["center"][:, 2:3]], axis=1
    )
    out["xy"] = hungarian_corner_distance(
        corners(c_xy, gt["dims"], gt["pose"]), gt_corners
    ) / diag
    # z: predicted depth at GT x/y.
    c_z = np.concatenate(
        [gt["center"][:, :2], pred["center"][:, 2:3]], axis=1
    )
    out["z"] = hungarian_corner_distance(
        corners(c_z, gt["dims"], gt["pose"]), gt_corners
    ) / diag
    out["dims"] = hungarian_corner_distance(
        corners(gt["center"], pred["dims"], gt["pose"]), gt_corners
    ) / diag
    out["pose"] = hungarian_corner_distance(
        corners(gt["center"], gt["dims"], pred["pose"]), gt_corners
    ) / diag
    return out


class Omni3DEvaluationHelper:
    """Accumulate per-dataset evaluators; summarize per dataset and overall."""

    def __init__(self, num_classes: int, class_names: list[str],
                 base_categories: set[str] | None = None,
                 novel_categories: set[str] | None = None):
        self.num_classes = num_classes
        self.class_names = class_names
        self.base_categories = set(base_categories or [])
        self.novel_categories = set(novel_categories or [])
        self.ev2d: dict[str, Omni3DEvaluator] = {}
        self.ev3d: dict[str, Omni3DEvaluator] = {}
        self._nhd_dis: dict[str, list] = {
            "xy": [], "z": [], "dims": [], "pose": []
        }
        # Mean prediction errors (reference vis.py:289-294 log line).
        self._errors: dict[str, list] = {
            "xy_px": [], "z_m": [], "whl_m": [], "ry_rad": []
        }

    def evaluator(self, dataset: str, mode: str) -> Omni3DEvaluator:
        store = self.ev2d if mode == "2D" else self.ev3d
        if dataset not in store:
            store[dataset] = Omni3DEvaluator(
                self.num_classes, mode, self.class_names
            )
        return store[dataset]

    def add_image(self, dataset: str, gt: dict, pred: dict):
        self.evaluator(dataset, "2D").add_image(gt, pred)
        self.evaluator(dataset, "3D").add_image(gt, pred)
        # Disentangled NHD + error stats on index-aligned pairs when the 3D
        # components are present (exact for the oracle protocol, where
        # prediction order mirrors the GT/oracle boxes).
        if all(
            k in pred for k in ("center", "dims", "pose")
        ) and all(k in gt for k in ("center", "dims", "pose")):
            n = min(len(pred["center"]), len(gt["center"]))
            if n > 0:
                p = {k: np.asarray(pred[k])[:n] for k in
                     ("center", "dims", "pose")}
                g = {k: np.asarray(gt[k])[:n] for k in
                     ("center", "dims", "pose")}
                dis = disentangled_nhd(p, g)
                for k, v in dis.items():
                    self._nhd_dis[k].extend(v.tolist())
                # Mean errors (xy in px needs boxes2d-space centers: use the
                # 2D projections when provided, else skip xy).
                if "center_2d" in pred and "center_2d" in gt:
                    dxy = np.linalg.norm(
                        np.asarray(pred["center_2d"])[:n]
                        - np.asarray(gt["center_2d"])[:n], axis=-1,
                    )
                    self._errors["xy_px"].extend(dxy.tolist())
                self._errors["z_m"].extend(
                    np.abs(p["center"][:, 2] - g["center"][:, 2]).tolist()
                )
                self._errors["whl_m"].extend(
                    np.abs(p["dims"] - g["dims"]).mean(-1).tolist()
                )
                rel = np.einsum("nij,nkj->nik", p["pose"], g["pose"])
                tr = np.clip(
                    (np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1
                )
                self._errors["ry_rad"].extend(np.arccos(tr).tolist())

    def summarize_dataset(self, dataset: str) -> dict[str, float]:
        out = {}
        if dataset in self.ev2d:
            out.update(self.ev2d[dataset].summarize())
        if dataset in self.ev3d:
            out.update(self.ev3d[dataset].summarize())
        return out

    def _merged(self, mode: str) -> Omni3DEvaluator:
        """Concatenate per-(cat, band) evals across datasets
        (evals_per_cat_area re-accumulation, omni3d_evaluation.py:427-620)."""
        merged = Omni3DEvaluator(self.num_classes, mode, self.class_names)
        store = self.ev2d if mode == "2D" else self.ev3d
        for ev in store.values():
            for band in merged.evals:
                for c in range(self.num_classes):
                    merged.evals[band][c].extend(ev.evals[band][c])
            if mode == "3D":
                merged._nhd_values.extend(ev._nhd_values)
        return merged

    def summarize_all(self) -> dict[str, object]:
        out: dict[str, object] = {"datasets": {}}
        for name in sorted(set(self.ev2d) | set(self.ev3d)):
            out["datasets"][name] = self.summarize_dataset(name)

        merged2d = self._merged("2D")
        merged3d = self._merged("3D")
        overall = {**merged2d.summarize(), **merged3d.summarize()}
        out["overall"] = overall
        per_cat = merged3d.per_category_ap()
        out["per_category_AP3D"] = per_cat

        # Novel easy/hard split (fixed category lists, L602-613).
        if self.novel_categories:
            easy = {
                c: ap for c, ap in per_cat.items()
                if c in EASY_NOVEL_CATEGORIES
            }
            hard = {
                c: ap for c, ap in per_cat.items()
                if c in self.novel_categories and c not in
                EASY_NOVEL_CATEGORIES
            }
            if easy:
                out["novel_easy_AP3D"] = float(np.mean(list(easy.values())))
            if hard:
                out["novel_hard_AP3D"] = float(np.mean(list(hard.values())))

        for k, vals in self._nhd_dis.items():
            if vals:
                out[f"NHD_disentangled_{k}"] = float(np.mean(vals))
        for k, vals in self._errors.items():
            if vals:
                out[f"mean_err_{k}"] = float(np.mean(vals))
        return out
