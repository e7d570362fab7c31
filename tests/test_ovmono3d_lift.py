"""OVMono3DLift end-to-end integration: prompts -> GDINO 2D -> 3D cuboids,
at tiny scale with random weights (plumbing + shape + finiteness)."""
import dataclasses

import jax
import numpy as np
import pytest

from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
from ovmono3d_tpu.models.ovmono3d import OVMono3DLift, default_focal_K

VOCAB = {
    "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4,
    "chair": 5, "cup": 6, "laptop": 7,
}


@pytest.fixture(scope="module")
def pipeline():
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_config

    cfg = tiny_config()
    gdino_kwargs = dict(
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1, num_queries=16,
        enc_points=2, dec_points=2, max_text_len=32, ffn_dim=64,
        swin_embed_dim=8, swin_depths=(1, 1, 1, 1), swin_heads=(1, 2, 4, 8),
        swin_window=4, bert_layers=1,
    )
    return OVMono3DLift.build(
        cfg, BertTokenizer(VOCAB), gdino_kwargs=gdino_kwargs, gdino_size=64
    )


def test_full_predict(pipeline):
    rng = np.random.RandomState(0)
    image = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    K = default_focal_K(96, 128)
    det = pipeline.predict(image, K, ["chair", "cup"])
    n = pipeline.max_detections
    assert det.boxes.shape == (n, 4)
    assert det.corners3d.shape == (n, 8, 3)
    for leaf in jax.tree.leaves(det):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # classes land in the prompt range
    valid = np.asarray(det.valid)
    if valid.any():
        assert np.all(np.asarray(det.classes)[valid] < 2)


def test_empty_prompts(pipeline):
    rng = np.random.RandomState(1)
    image = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    det = pipeline.predict(image, default_focal_K(96, 128), [])
    assert not np.asarray(det.valid).any()
    assert float(np.asarray(det.scores).max()) == 0.0


def test_default_focal_heuristic():
    K = default_focal_K(480, 640)
    # f = 4 * h / 2 (demo.py:63-76)
    assert K[0, 0] == pytest.approx(960.0)
    assert K[0, 2] == pytest.approx(320.0)
