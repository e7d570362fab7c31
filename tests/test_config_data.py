"""Config system + data layer tests (YAML inheritance, overrides, Omni3D JSON
loading, filters, fixed-shape mapping)."""
import json

import numpy as np
import pytest

from ovmono3d_tpu.config import Config, load_config
from ovmono3d_tpu.data.builtin import get_omni3d_categories
from ovmono3d_tpu.data.datasets import (
    FilterSettings,
    is_ignore,
    load_omni3d_json,
    merge_oracle2d,
    simple_register,
    get_dataset,
)
from ovmono3d_tpu.data.mapper import (
    batch_examples,
    map_example,
    resize_shortest_edge,
)


def test_config_defaults():
    cfg = Config()
    assert cfg.model.backbone.square_pad == 896
    assert cfg.model.cube.virtual_focal == 512.0
    assert cfg.model.rpn.objectness == "IoUness"


def test_config_yaml_and_overrides(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("model:\n  num_classes: 43\nsolver:\n  base_lr: 0.02\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        "_BASE_: base.yaml\nsolver:\n  base_lr: 0.12\n"
        "datasets:\n  train: [Objectron_train, Objectron_val]\n"
    )
    cfg = load_config(child, overrides=["model.num_classes=50",
                                        "model.cube.z_type=log"])
    assert cfg.solver.base_lr == 0.12          # child overrides base
    assert cfg.model.num_classes == 50         # CLI overrides YAML
    assert cfg.model.cube.z_type == "log"
    assert cfg.datasets.train == ("Objectron_train", "Objectron_val")


def test_config_unknown_key_raises():
    with pytest.raises(KeyError):
        load_config(None, overrides=["model.not_a_key=1"])


def test_oracle2d_two_level_lookup(tmp_path):
    """ORACLE2D_FILES[eval_mode][cat_mode][dataset] (ref config.py:41-76)."""
    from ovmono3d_tpu.config import oracle2d_file

    yml = tmp_path / "cfg.yaml"
    yml.write_text(
        "datasets:\n"
        "  oracle2d_files:\n"
        "    target_aware:\n"
        "      base: {Objectron_test: gdino_objectron_base_oracle_2d.json}\n"
        "      novel: {KITTI_test_novel: gdino_kitti_novel_oracle_2d.json}\n"
        "    previous_metric:\n"
        "      base: {Objectron_test: gdino_previous_eval_objectron.json}\n"
        "      novel: {}\n"
    )
    cfg = load_config(yml)
    ds = cfg.datasets
    assert oracle2d_file(ds, "Objectron_test", "base") == (
        "gdino_objectron_base_oracle_2d.json")
    assert oracle2d_file(ds, "KITTI_test_novel", "novel") == (
        "gdino_kitti_novel_oracle_2d.json")
    assert oracle2d_file(ds, "KITTI_test_novel", "base") is None
    # EVAL_MODE switches the whole table (previous_metric prefix files).
    cfg2 = load_config(
        yml, overrides=["datasets.oracle2d_eval_mode=previous_metric"])
    assert oracle2d_file(cfg2.datasets, "Objectron_test", "base") == (
        "gdino_previous_eval_objectron.json")
    assert oracle2d_file(cfg2.datasets, "KITTI_test_novel", "novel") is None
    # Dotted CLI overrides reach into the dict sub-tree.
    cfg3 = load_config(
        yml,
        overrides=["datasets.oracle2d_files.target_aware.base.SUNRGBD_test=x.json"],
    )
    assert oracle2d_file(cfg3.datasets, "SUNRGBD_test", "base") == "x.json"
    assert oracle2d_file(cfg3.datasets, "Objectron_test", "base") == (
        "gdino_objectron_base_oracle_2d.json")
    # Flat {dataset: path} convenience form still resolves.
    flat = load_config(
        None, overrides=["datasets.oracle2d_files.Objectron_test=y.json"])
    assert oracle2d_file(flat.datasets, "Objectron_test", "base") == "y.json"


def test_shipped_variant_configs_load():
    """The four foundation-backbone variant YAMLs (reference
    configs/OVMono3D_{clip,mae,midas,sam}_SFP.yaml) parse and carry the
    1024-pad 4-level surface."""
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent / "configs"
    for name, embed in (("clip", 768), ("mae", 768), ("midas", 1024),
                        ("sam", 768)):
        cfg = load_config(root / f"OVMono3D_{name}_SFP.yaml")
        bb = cfg.model.backbone
        assert bb.name == name
        assert bb.embed_dim == embed
        assert bb.square_pad == 1024
        assert bb.scale_factors == (4.0, 2.0, 1.0, 0.5)
        assert cfg.model.rpn.in_features == ("p2", "p3", "p4", "p5")
        assert cfg.model.num_classes == 50
        assert len(cfg.datasets.train) == 12
        assert len(cfg.datasets.category_names) == 50
        assert cfg.input.max_size_test == 1024


def test_category_meta_jsons():
    """Shipped category-meta ID maps (reference configs/category_meta*.json)."""
    from pathlib import Path

    from ovmono3d_tpu.data.datasets import load_category_meta

    root = Path(__file__).resolve().parent.parent / "configs"
    for fname, n in (("category_meta.json", 97), ("category_meta50.json", 50),
                     ("category_objectron.json", 9)):
        meta = load_category_meta(root / fname)
        assert len(meta["thing_classes"]) == n
        id_map = meta["thing_dataset_id_to_contiguous_id"]
        assert len(id_map) == n
        assert all(isinstance(k, int) for k in id_map)
        assert sorted(id_map.values()) == list(range(n))
    objectron = load_category_meta(root / "category_objectron.json")
    assert objectron["thing_classes"][:3] == ["bicycle", "books", "bottle"]


def test_builtin_categories():
    assert len(get_omni3d_categories("omni3d")) == 50
    assert len(get_omni3d_categories("omni3d_in")) == 38
    assert len(get_omni3d_categories("omni3d_out")) == 11
    assert get_omni3d_categories("Objectron_test") == get_omni3d_categories(
        "Objectron_train"
    )
    assert "toilet" not in get_omni3d_categories("Hypersim_test")
    assert get_omni3d_categories("KITTI_test_novel") == {"tram"}
    with pytest.raises(ValueError):
        get_omni3d_categories("nope_test")


def _fake_json(tmp_path):
    data = {
        "categories": [{"id": 1, "name": "chair"}, {"id": 2, "name": "cup"},
                       {"id": 3, "name": "alien"}],
        "images": [
            {"id": 10, "width": 640, "height": 480,
             "K": [[500, 0, 320], [0, 500, 240], [0, 0, 1]],
             "file_path": "img10.jpg"},
        ],
        "annotations": [
            {"image_id": 10, "category_id": 1,
             "bbox2D_trunc": [100, 100, 150, 180],
             "center_cam": [0.1, 0.2, 3.0], "dimensions": [0.5, 0.9, 0.5],
             "R_cam": np.eye(3).tolist(), "truncation": 0.1,
             "visibility": 0.9, "valid3D": True},
            {"image_id": 10, "category_id": 2,
             "bbox2D_trunc": [300, 200, 340, 240],
             "center_cam": [0.5, 0.1, 2.0], "dimensions": [0.1, 0.2, 0.1],
             "R_cam": np.eye(3).tolist(), "truncation": 0.995,  # ignored
             "visibility": 0.9, "valid3D": True},
            {"image_id": 10, "category_id": 3,  # unknown class -> dropped
             "bbox2D_trunc": [10, 10, 40, 40],
             "center_cam": [0, 0, 1.0], "dimensions": [1, 1, 1],
             "R_cam": np.eye(3).tolist(), "truncation": 0.0,
             "visibility": 1.0, "valid3D": True},
        ],
    }
    p = tmp_path / "ds.json"
    p.write_text(json.dumps(data))
    return p


def test_load_omni3d_json(tmp_path):
    p = _fake_json(tmp_path)
    fs = FilterSettings(category_names=("chair", "cup"))
    recs = load_omni3d_json(p, fs, {"chair": 0, "cup": 1})
    assert len(recs) == 1
    annos = recs[0]["annotations"]
    # The unknown-category annotation is DROPPED, not kept as an ignore
    # region (reference datasets.py:409-411 `continue`).
    assert len(annos) == 2
    assert annos[0]["category_id"] == 0 and not annos[0]["ignore"]
    assert annos[1]["category_id"] == -1  # truncation filter


def test_register_and_oracle_merge(tmp_path):
    p = _fake_json(tmp_path)
    fs = FilterSettings(category_names=("chair", "cup"))
    simple_register("fake_test", p, fs, {"chair": 0, "cup": 1})
    recs = get_dataset("fake_test")
    oracle = tmp_path / "oracle.json"
    oracle.write_text(json.dumps([
        {"image_id": 10, "bbox": [100, 100, 50, 80], "category_id": 0,
         "score": 0.88},
    ]))
    recs = merge_oracle2d(recs, oracle)
    assert recs[0]["oracle2d"][0]["bbox2d"] == [100, 100, 150, 180]
    assert recs[0]["oracle2d"][0]["score"] == 0.88


def test_resize_shortest_edge():
    nh, nw, s = resize_shortest_edge((480, 640), 532, 896)
    assert min(nh, nw) == 532
    nh, nw, s = resize_shortest_edge((480, 1280), 532, 896)
    assert max(nh, nw) == 896  # capped by max_size


def test_map_example_shapes(tmp_path):
    p = _fake_json(tmp_path)
    fs = FilterSettings(category_names=("chair", "cup"))
    recs = load_omni3d_json(p, fs, {"chair": 0, "cup": 1})
    cfg = Config()
    ex = map_example(recs[0], cfg, is_train=True, max_gt=8,
                     rng=np.random.RandomState(0))
    S = cfg.model.backbone.square_pad
    assert ex.image.shape == (S, S, 3)
    assert ex.gt_boxes.shape == (8, 4)
    # chair + truncation-ignored cup; the unknown-category anno was
    # dropped at load (reference datasets.py:409-411).
    assert ex.gt_valid.sum() == 2
    # First gt: box scaled by the resize factor.
    scale = 1.0 / ex.im_scale_ratio
    if not np.isclose(ex.gt_boxes[0][0], (640 - 150) * scale):  # maybe flipped
        np.testing.assert_allclose(ex.gt_boxes[0],
                                   np.array([100, 100, 150, 180]) * scale,
                                   rtol=1e-5)
    # 3D target: u,v = projected center at network scale (chair, centered K).
    u, v, z = ex.gt_boxes3d[0, :3]
    assert z == pytest.approx(3.0)
    batch = batch_examples([ex, ex])
    assert batch["image"].shape == (2, S, S, 3)
    assert batch["gt_boxes3d"].shape == (2, 8, 9)


def test_map_example_oracle(tmp_path):
    p = _fake_json(tmp_path)
    fs = FilterSettings(category_names=("chair", "cup"))
    recs = load_omni3d_json(p, fs, {"chair": 0, "cup": 1})
    oracle = tmp_path / "oracle.json"
    oracle.write_text(json.dumps([
        {"image_id": 10, "bbox": [100, 100, 50, 80], "category_id": 0,
         "score": 0.88},
    ]))
    recs = merge_oracle2d(recs, oracle)
    cfg = Config()
    ex = map_example(recs[0], cfg, is_train=False, max_oracle=4)
    assert ex.oracle_valid.sum() == 1
    assert ex.oracle_scores[0] == pytest.approx(0.88)
    scale = 1.0 / ex.im_scale_ratio
    np.testing.assert_allclose(
        ex.oracle_boxes[0], np.array([100, 100, 150, 180]) * scale, rtol=1e-5
    )


def test_depth_plumbing(tmp_path):
    """A per-record depth map flows through the mapper and batching into
    the model's prompt-depth input."""
    p = _fake_json(tmp_path)
    fs = FilterSettings(category_names=("chair", "cup"))
    recs = load_omni3d_json(p, fs, {"chair": 0, "cup": 1})
    recs[0]["depth"] = np.full((48, 64), 2.5, np.float32)
    cfg = Config()
    ex = map_example(recs[0], cfg, is_train=True, max_gt=4,
                     rng=np.random.RandomState(0))
    # depth rides the image's exact canvas geometry: resized content at
    # [:nh, :nw] of the square pad, zeros elsewhere
    S = cfg.model.backbone.square_pad
    nh, nw = int(ex.im_hw[0]), int(ex.im_hw[1])
    assert ex.depth.shape == (S, S, 1)
    np.testing.assert_allclose(ex.depth[:nh, :nw], 2.5, atol=1e-5)
    assert np.all(ex.depth[nh:] == 0) and np.all(ex.depth[:, nw:] == 0)
    batch = batch_examples([ex, ex])
    assert batch["depth"].shape == (2, S, S, 1)


def test_subsample_records_uniform_across_sources():
    """TRAIN_SET_PERCENTAGE takes a seeded uniform sample, not a prefix:
    every concatenated source must survive (reference sample_by_percentage,
    build.py:30-34, 92-93)."""
    from ovmono3d_tpu.data.build import subsample_records

    records = [{"dataset_id": d, "i": i}
               for d in range(3) for i in range(200)]
    sub = subsample_records(records, 0.25)
    assert len(sub) == 150
    per_src = {d: sum(r["dataset_id"] == d for r in sub) for d in range(3)}
    assert all(v > 20 for v in per_src.values()), per_src
    # deterministic across calls
    again = subsample_records(records, 0.25)
    assert [r["i"] for r in sub] == [r["i"] for r in again]
    assert subsample_records(records, 1.0) is records


def test_flip_pose_convention_corner_set_equivalence():
    """Our mirror fix-up F@R@F (mapper._M1/_M2, F=diag(-1,1,1)) vs the
    reference's diag(1,-1,-1) @ R @ diag(-1,-1,1)
    (dataset_mapper.py:101-117 _M1/_M2): the two differ by a 180deg
    rotation about the box's vertical axis, under which a cuboid is
    symmetric — so the CORNER SET of any flipped box is identical and
    every corner-set-based target (disentangled corners, chamfer, IoU3D,
    NHD) is unchanged. This test proves the documented claim."""
    import jax.numpy as jnp

    from ovmono3d_tpu.data.mapper import _M1, _M2
    from ovmono3d_tpu.utils.geometry import cuboid_corners

    ref_m1 = np.diag([1.0, -1.0, -1.0])
    ref_m2 = np.diag([-1.0, -1.0, 1.0])
    rng = np.random.RandomState(0)
    for _ in range(16):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1.0
        box = np.concatenate(
            [rng.randn(3) + np.array([0.0, 0.0, 6.0]), rng.rand(3) + 0.1]
        )
        ours = np.asarray(
            cuboid_corners(jnp.asarray(box), jnp.asarray(_M1 @ q @ _M2))
        )
        ref = np.asarray(
            cuboid_corners(
                jnp.asarray(box), jnp.asarray(ref_m1 @ q @ ref_m2)
            )
        )
        # Equal as SETS of 8 points: every reference corner has exactly one
        # coincident corner of ours (a permutation, not a deformation).
        d = np.linalg.norm(ours[:, None] - ref[None], axis=-1)
        assert (d.min(axis=0) < 1e-5).all()
        assert (np.sort(d.argmin(axis=0)) == np.arange(8)).all()
