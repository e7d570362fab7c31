"""Release-validation harness (tools/validate_release.py) dry-run CI.

The harness's gdino/sam/depth dry-run stages reuse the meta-device HF
machinery already covered by tests/test_converter_fullsize.py, so CI here
pins (a) the LIFT stage — the synthetic full-released-scale
detectron2-layout state dict through convert_ovmono3d_lift and the
structure match against the flagship config init — and (b) the CLI arg
contract."""
from __future__ import annotations

import pytest

from tools.validate_release import main, synthetic_lift_state


def test_dry_run_lift_family():
    import numpy as np

    report = main(["--dry-run", "--families", "lift"])
    assert report["lift"]["leaves"] > 200
    # synthetic state covers priors extraction off (no baked priors)
    assert report["lift"]["priors"] is False
    del np


def test_synthetic_lift_state_has_released_keys():
    import numpy as np

    s = synthetic_lift_state(np.random.RandomState(0))
    # released ViT-B/14 trunk geometry
    assert s["backbone.net.vit.pos_embed"].shape == (1, 1 + 37 ** 2, 768)
    assert s["backbone.net.vit.blocks.11.attn.qkv.weight"].shape == (
        3 * 768, 768)
    assert s["roi_heads.box_predictor.cls_score.weight"].shape == (51, 1024)
    assert s["roi_heads.cube_head.bbox_3D_pose.weight"].shape == (6, 1024)


def test_requires_ckpt_without_dry_run():
    with pytest.raises(SystemExit):
        main(["--families", "lift"])


def test_rejects_unknown_family():
    with pytest.raises(SystemExit):
        main(["--dry-run", "--families", "bogus"])
