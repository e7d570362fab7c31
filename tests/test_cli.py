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
