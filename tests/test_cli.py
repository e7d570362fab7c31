"""End-to-end CLI smoke tests (in-process; one JAX runtime per test session).

Exercises the priors plumbing (cluster-z decode requires priors injected into
build_model — reference roi_heads.py:117-143) and the periodic in-train eval
hook (reference train_net.py:329-339), plus the multi-dataset eval CLI.
"""
import logging
import sys

TINY = [
    "model.backbone.embed_dim=64",
    "model.backbone.depth=2",
    "model.backbone.num_heads=2",
    "model.backbone.pretrain_grid=8",
    "model.backbone.out_channels=64",
    "model.backbone.square_pad=112",
    "model.roi_box.fc_dim=64",
    "model.roi_box.batch_size_per_image=32",
    "model.rpn.pre_nms_topk_train=128",
    "model.rpn.post_nms_topk_train=128",
    "model.rpn.pre_nms_topk_test=128",
    "model.rpn.post_nms_topk_test=64",
    "model.rpn.batch_size_per_image=64",
    "model.cube.fc_dim=64",
    "model.num_classes=9",
    "model.max_detections=16",
]


def test_train_cli_priors_cluster_decode_and_intrain_eval(
    monkeypatch, tmp_path, caplog
):
    """--synthetic + dims_priors + cluster_bins trains (the cluster decode
    asserts priors were passed to build_model) and logs a mid-train AP."""
    from tools import train_net

    monkeypatch.setattr(sys, "argv", [
        "train_net.py", "--synthetic", "--max-iter", "2",
        "--batch-size", "8",
        *TINY,
        "model.cube.dims_priors_enabled=true",
        "model.cube.cluster_bins=4",
        "test.eval_period=2",
        "solver.checkpoint_period=1000",
        f"output_dir={tmp_path}",
    ])
    with caplog.at_level(logging.INFO):
        train_net.main()
    assert any("in-train eval @ iter 2" in r.getMessage()
               for r in caplog.records), "periodic eval did not run"
    # Priors persist next to the checkpoints so evaluation of this config
    # can rebuild the cluster-z decode (tools/eval_net.py --priors).
    assert (tmp_path / "priors.npz").exists()


def test_train_then_eval_checkpoint_with_priors(monkeypatch, capsys,
                                                tmp_path):
    """Full round-trip: train a cluster-bins config (writes model_recent +
    priors.npz), then evaluate the checkpoint — eval_net must auto-discover
    priors.npz next to it to rebuild the cluster-z decode."""
    from tools import eval_net, train_net

    cluster = [
        "model.cube.dims_priors_enabled=true",
        "model.cube.cluster_bins=4",
    ]
    monkeypatch.setattr(sys, "argv", [
        "train_net.py", "--synthetic", "--max-iter", "2",
        "--batch-size", "8",
        *TINY, *cluster,
        "test.eval_period=0",
        "solver.checkpoint_period=2",
        f"output_dir={tmp_path}",
    ])
    train_net.main()
    assert (tmp_path / "model_recent").exists()
    assert (tmp_path / "priors.npz").exists()

    monkeypatch.setattr(sys, "argv", [
        "eval_net.py", "--synthetic", "--batch-size", "8",
        "--checkpoint", str(tmp_path / "model_recent"),
        *TINY, *cluster,
        f"output_dir={tmp_path}",
    ])
    eval_net.main()
    out = capsys.readouterr().out
    assert "overall (all test datasets merged)" in out


def test_eval_cli_synthetic_cluster_bins(monkeypatch, capsys, tmp_path):
    """eval_net --synthetic with dims_priors/cluster_bins self-computes
    priors (previously build_model(priors=None) hit the 'cluster_bins
    needs priors' assertion)."""
    from tools import eval_net

    monkeypatch.setattr(sys, "argv", [
        "eval_net.py", "--synthetic", "--batch-size", "8",
        *TINY,
        "model.cube.dims_priors_enabled=true",
        "model.cube.cluster_bins=4",
        f"output_dir={tmp_path}",
    ])
    eval_net.main()
    out = capsys.readouterr().out
    assert "overall (all test datasets merged)" in out


def test_train_cli_resume(monkeypatch, tmp_path, caplog):
    """--resume picks up params+optimizer+step from output_dir/model_recent
    (reference resume_or_load, train_net.py:151-168)."""
    from tools import train_net

    base = [
        "train_net.py", "--synthetic", "--batch-size", "8",
        *TINY,
        "test.eval_period=0",
        "solver.checkpoint_period=2",
        f"output_dir={tmp_path}",
    ]
    monkeypatch.setattr(sys, "argv", [*base, "--max-iter", "2"])
    train_net.main()
    assert (tmp_path / "model_recent").exists()
    monkeypatch.setattr(sys, "argv", [*base, "--max-iter", "4", "--resume"])
    with caplog.at_level(logging.INFO):
        train_net.main()
    assert any("resumed from" in r.getMessage() and "at step 2" in
               r.getMessage() for r in caplog.records)


def test_train_cli_eval_only_delegates(monkeypatch, capsys, tmp_path):
    """train_net --eval-only runs the oracle evaluation (reference
    train_net.py:403-452 --eval-only -> do_test)."""
    from tools import train_net

    monkeypatch.setattr(sys, "argv", [
        "train_net.py", "--eval-only", "--synthetic",
        *TINY,
        f"output_dir={tmp_path}",
    ])
    train_net.main()
    out = capsys.readouterr().out
    assert "overall (all test datasets merged)" in out


def test_demo_cli_smoke(monkeypatch, tmp_path):
    """demo.py runs end-to-end on a folder of images: focal heuristic,
    prompt-local vocab fallback, GDINO->cube pipeline, rendered panels
    (reference demo/demo.py flow, SURVEY.md §3.3). GDINO is shrunk via a
    wrapped build so the test is CPU-sized; the CLI logic is unchanged."""
    import numpy as np

    from ovmono3d_tpu.models.ovmono3d import OVMono3DLift
    from ovmono3d_tpu.utils.util import imwrite_rgb

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    imwrite_rgb(img_dir / "a.jpg", (rng.rand(96, 128, 3) * 255).astype(np.uint8))

    tiny_gdino = dict(
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1, num_queries=16,
        enc_points=2, dec_points=2, max_text_len=32, ffn_dim=64,
        swin_embed_dim=8, swin_depths=(1, 1, 1, 1), swin_heads=(1, 2, 4, 8),
        swin_window=4, bert_layers=1,
    )
    real_build = OVMono3DLift.build.__func__

    def tiny_build(cls, cfg, tok, **kw):
        kw["gdino_kwargs"] = tiny_gdino
        kw["gdino_size"] = 64
        return real_build(cls, cfg, tok, **kw)

    monkeypatch.setattr(OVMono3DLift, "build", classmethod(tiny_build))

    from tools import demo

    out_dir = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--input-folder", str(img_dir),
        "--labels", "chair,cup", "--output-dir", str(out_dir),
        *TINY,
    ])
    demo.main()
    outs = list(out_dir.glob("*"))
    assert outs, "demo wrote no output images"

    # --labels-file variant (reference demo.py:35,53-55): per-image prompt
    # lists keyed by basename; empty/unmapped images are skipped.
    imwrite_rgb(img_dir / "b.jpg",
                (rng.rand(96, 128, 3) * 255).astype(np.uint8))
    import json

    labels_path = tmp_path / "labels.json"
    labels_path.write_text(json.dumps({"a": ["chair", "cup"], "b": []}))
    out_dir2 = tmp_path / "out2"
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--input-folder", str(img_dir),
        "--labels-file", str(labels_path), "--output-dir", str(out_dir2),
        *TINY,
    ])
    demo.main()
    names = sorted(p.name for p in out_dir2.glob("*"))
    assert names == ["a_3d.png"], names  # b skipped (empty prompt list)


def test_eval_cli_multi_dataset_merge(monkeypatch, capsys, tmp_path):
    """--synthetic eval runs TWO datasets through ONE shared helper and
    prints the merged overall table + analysis rollup."""
    from tools import eval_net

    monkeypatch.setattr(sys, "argv", [
        "eval_net.py", "--synthetic", "--batch-size", "8",
        *TINY,
        f"output_dir={tmp_path}",
    ])
    eval_net.main()
    out = capsys.readouterr().out
    assert "overall (all test datasets merged)" in out
    assert "synthetic_a" in out and "synthetic_b" in out
    # Oracle GT boxes must give AP2D=100 on the merged table.
    assert "AP2D            | 100.00" in out


def test_eval_predictions_offline(monkeypatch, capsys, tmp_path):
    """tools/eval_predictions.py (reference eval.py:1839 offline flow):
    a GT-equal prediction file on a tiny Omni3D JSON scores perfect AP."""
    import json

    import numpy as np

    data = {
        "categories": [{"id": 1, "name": "chair"}],
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
        ],
    }
    ds = tmp_path / "ds.json"
    ds.write_text(json.dumps(data))
    preds = [{
        "image_id": 10,
        "instances": [{
            "category_id": 0, "score": 0.9,
            "bbox": [100, 100, 50, 80],
            "center_cam": [0.1, 0.2, 3.0],
            "dimensions": [0.5, 0.9, 0.5],
            "pose": np.eye(3).tolist(),
        }],
    }]
    pf = tmp_path / "preds.json"
    pf.write_text(json.dumps(preds))

    from tools import eval_predictions

    monkeypatch.setattr(sys, "argv", [
        "eval_predictions.py", "--predictions", str(pf),
        "--dataset-json", str(ds), "--categories", "chair",
    ])
    eval_predictions.main()
    out = capsys.readouterr().out
    assert "offline predictions" in out
    assert "100.0" in out or "100.00" in out  # perfect AP somewhere

    # An EMPTY predictions file must score 0, not skip the image: the
    # dataset drives iteration, so absent images count as missed GT
    # (reference evaluate_predictions_from_file semantics).
    pf_empty = tmp_path / "preds_empty.json"
    pf_empty.write_text("[]")
    monkeypatch.setattr(sys, "argv", [
        "eval_predictions.py", "--predictions", str(pf_empty),
        "--dataset-json", str(ds), "--categories", "chair",
    ])
    eval_predictions.main()
    out2 = capsys.readouterr().out
    assert "100.0" not in out2


def test_generate_oracle2d_cli(monkeypatch, tmp_path):
    """generate_oracle2d --synthetic writes per-dataset detection JSONs in
    the exact schema `merge_oracle2d` consumes (the reference's precomputed
    ORACLE2D_FILES artifacts, config.py:41-76). GDINO is shrunk via a
    wrapped build_2d_only so the test is CPU-sized."""
    import json

    from ovmono3d_tpu.data.datasets import merge_oracle2d
    from ovmono3d_tpu.models.ovmono3d import OVMono3DLift

    tiny_gdino = dict(
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1, num_queries=16,
        enc_points=2, dec_points=2, max_text_len=32, ffn_dim=64,
        swin_embed_dim=8, swin_depths=(1, 1, 1, 1), swin_heads=(1, 2, 4, 8),
        swin_window=4, bert_layers=1,
    )
    real_build = OVMono3DLift.build_2d_only.__func__

    def tiny_build(cls, tok, **kw):
        kw["gdino_kwargs"] = tiny_gdino
        kw["gdino_size"] = 64
        return real_build(cls, tok, **kw)

    monkeypatch.setattr(OVMono3DLift, "build_2d_only",
                        classmethod(tiny_build))

    from tools import generate_oracle2d

    out_dir = tmp_path / "oracle2d"
    monkeypatch.setattr(sys, "argv", [
        "generate_oracle2d.py", "--synthetic",
        "--output-dir", str(out_dir), "--topk", "8",
        *TINY,
    ])
    generate_oracle2d.main()

    paths = sorted(out_dir.glob("*.json"))
    assert [p.name for p in paths] == [
        "synthetic_a_base.json", "synthetic_b_base.json"
    ], paths
    dets = json.load(open(paths[0]))
    for d in dets:
        assert set(d) == {"image_id", "bbox2d", "category_id", "score"}
        assert 0 <= d["category_id"] < 9
        assert len(d["bbox2d"]) == 4
    # The generated file round-trips through the eval-side oracle merge.
    from tools.train_net import synthetic_records

    recs = merge_oracle2d(synthetic_records(4, 9, seed=7), paths[0])
    assert all("oracle2d" in r for r in recs)
    assert sum(len(r["oracle2d"]) for r in recs) == len(dets)


def test_eval_cli_data_parallel_matches_single(monkeypatch, capsys,
                                               tmp_path):
    """--data-parallel (batch sharded over the 8-device data mesh) produces
    the same evaluation tables as the single-device run — per-image
    inference is embarrassingly parallel, so sharding the batch axis must
    not change any number (reference multi-GPU InferenceSampler eval,
    omni3d_evaluation.py:633-723)."""
    from tools import eval_net

    base = [
        "eval_net.py", "--synthetic", "--batch-size", "8",
        *TINY,
        f"output_dir={tmp_path}",
    ]
    monkeypatch.setattr(sys, "argv", base)
    eval_net.main()
    single = capsys.readouterr().out

    monkeypatch.setattr(sys, "argv", [*base, "--data-parallel"])
    eval_net.main()
    dp = capsys.readouterr().out
    assert "overall (all test datasets merged)" in dp
    assert dp == single
