"""CNN trunk checkpoint-converter tests.

Numeric cross-validation against an independently written torch ResNet
(validates the conv-transpose/BatchNorm machinery shared by all CNN
converters), plus name-roundtrip tests per family: a test-local inverse map
(Flax variables -> torch-layout state dict) feeds each converter, and every
leaf must come back bit-identical — a second, independent implementation of
the key naming that catches drift on either side. Strict key consumption in
the converters catches unmapped weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ovmono3d_tpu.models.cnns import DenseNet, MNASNet, ShuffleNetV2
from ovmono3d_tpu.models.dla import DLA, DLA_PRESETS
from ovmono3d_tpu.models.resnet import ResNet
from ovmono3d_tpu.utils.cnn_convert import (
    convert_densenet,
    convert_dla,
    convert_mnasnet,
    convert_resnet,
    convert_shufflenet,
)


# ---------------------------------------------------------------------------
# Torch mirror of torchvision's ResNet-18 (written independently; key names
# follow the torchvision state-dict layout the converter expects).
# ---------------------------------------------------------------------------


class _TBasic(torch.nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + idn)


class _TResNet18(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        cin = 64
        for si, w in enumerate(widths):
            blocks = []
            for bi in range(2):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(_TBasic(cin, w, stride))
                cin = w
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        out = {}
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
            out[f"p{si + 2}"] = x
        return out


def _randomize_bn_stats(model):
    g = torch.Generator().manual_seed(0)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)
            torch.nn.init.normal_(m.weight, 1.0, 0.1, generator=g)
            torch.nn.init.normal_(m.bias, 0.0, 0.1, generator=g)


def test_resnet18_matches_torch_numerically():
    tm = _TResNet18()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in tm.parameters():
            if p.dim() == 4:
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        _randomize_bn_stats(tm)
    tm.eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    variables = convert_resnet(state, depths=(2, 2, 2, 2), bottleneck=False)
    trunk = ResNet(depths=(2, 2, 2, 2), bottleneck=False)

    x = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = jax.jit(lambda v, x: trunk.apply(v, x))(variables, jnp.asarray(x))
    for name in ("p2", "p3", "p4", "p5"):
        # f32 accumulation-order noise only: activations reach ~1e3 with the
        # unnormalized random weights, so compare relatively.
        np.testing.assert_allclose(
            np.asarray(got[name]),
            want[name].numpy().transpose(0, 2, 3, 1),
            rtol=5e-3, atol=5e-3, err_msg=name,
        )


# ---------------------------------------------------------------------------
# Inverse-map roundtrips (Flax variables -> torch keys -> converter)
# ---------------------------------------------------------------------------


def _inv_conv(k):  # Flax HWIO -> torch OIHW
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _emit_convbn(state, vars_p, vars_s, flax_name, conv_key, bn_key):
    state[conv_key + ".weight"] = _inv_conv(vars_p[flax_name]["conv"]["kernel"])
    state[bn_key + ".weight"] = np.asarray(vars_p[flax_name]["bn"]["scale"])
    state[bn_key + ".bias"] = np.asarray(vars_p[flax_name]["bn"]["bias"])
    state[bn_key + ".running_mean"] = np.asarray(vars_s[flax_name]["bn"]["mean"])
    state[bn_key + ".running_var"] = np.asarray(vars_s[flax_name]["bn"]["var"])


def _emit_bn(state, p, s, key):
    state[key + ".weight"] = np.asarray(p["scale"])
    state[key + ".bias"] = np.asarray(p["bias"])
    state[key + ".running_mean"] = np.asarray(s["mean"])
    state[key + ".running_var"] = np.asarray(s["var"])


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(fa) == len(fb)
    for k, va in fa:
        np.testing.assert_array_equal(np.asarray(va),
                                      np.asarray(fb[jax.tree_util.keystr(k)]),
                                      err_msg=jax.tree_util.keystr(k))


def _init(trunk, size=64):
    img = jnp.zeros((1, size, size, 3))
    return jax.jit(trunk.init)(jax.random.PRNGKey(0), img)


def test_dla_roundtrip():
    preset = DLA_PRESETS["dla46_c"]       # bottleneck blocks + projections
    trunk = DLA(**preset)
    v = _init(trunk)
    vp, vs = v["params"], v["batch_stats"]
    state = {}
    _emit_convbn(state, vp, vs, "base", "base_layer.0", "base_layer.1")
    _emit_convbn(state, vp, vs, "level0", "level0.0", "level0.1")
    _emit_convbn(state, vp, vs, "level1", "level1.0", "level1.1")

    def emit_block(p, s, prefix):
        for ci, (ck, bk) in enumerate(
            (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3"))
        ):
            if ck in p:
                _emit_convbn(state, p, s, ck, f"{prefix}.{ck}",
                             f"{prefix}.{bk}")

    def emit_tree(p, s, prefix):
        if "root" in p:   # leaf tree
            emit_block(p["tree1"], s["tree1"], f"{prefix}.tree1")
            emit_block(p["tree2"], s["tree2"], f"{prefix}.tree2")
            state[f"{prefix}.root.conv.weight"] = _inv_conv(
                p["root"]["conv"]["conv"]["kernel"])
            _emit_bn(state, p["root"]["conv"]["bn"],
                     s["root"]["conv"]["bn"], f"{prefix}.root.bn")
        else:
            emit_tree(p["tree1"], s["tree1"], f"{prefix}.tree1")
            emit_tree(p["tree2"], s["tree2"], f"{prefix}.tree2")
        if "project" in p:
            _emit_convbn(state, p, s, "project", f"{prefix}.project.0",
                         f"{prefix}.project.1")

    for i in (2, 3, 4, 5):
        emit_tree(vp[f"level{i}"], vs[f"level{i}"], f"level{i}")
    state["fc.weight"] = np.zeros((1000, 256), np.float32)  # ignored head

    out = convert_dla(state, levels=preset["levels"], block=preset["block"])
    _assert_trees_equal(v["params"], out["params"])
    _assert_trees_equal(v["batch_stats"], out["batch_stats"])
    # Converted variables drive the trunk.
    y = jax.jit(lambda w, x: trunk.apply(w, x))(out, jnp.zeros((1, 64, 64, 3)))
    assert y["p5"].shape[-1] == preset["channels"][-1]


def test_densenet_roundtrip():
    trunk = DenseNet()
    v = _init(trunk)
    vp, vs = v["params"], v["batch_stats"]
    state = {"classifier.weight": np.zeros((1000, 1024), np.float32)}
    state["features.conv0.weight"] = _inv_conv(vp["conv0"]["kernel"])
    _emit_bn(state, vp["norm0"], vs["norm0"], "features.norm0")
    for bi, layers in enumerate((6, 12, 24, 16)):
        for li in range(layers):
            fl = vp[f"denseblock{bi + 1}"][f"denselayer{li + 1}"]
            fs = vs[f"denseblock{bi + 1}"][f"denselayer{li + 1}"]
            t = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            _emit_bn(state, fl["norm1"], fs["norm1"], f"{t}.norm1")
            state[f"{t}.conv1.weight"] = _inv_conv(fl["conv1"]["kernel"])
            _emit_bn(state, fl["norm2"], fs["norm2"], f"{t}.norm2")
            state[f"{t}.conv2.weight"] = _inv_conv(fl["conv2"]["kernel"])
        if bi < 3:
            tp = vp[f"transition{bi + 1}"]
            ts = vs[f"transition{bi + 1}"]
            t = f"features.transition{bi + 1}"
            _emit_bn(state, tp["norm"], ts["norm"], f"{t}.norm")
            state[f"{t}.conv.weight"] = _inv_conv(tp["conv"]["kernel"])
    _emit_bn(state, vp["norm5"], vs["norm5"], "features.norm5")

    out = convert_densenet(state)
    _assert_trees_equal(v["params"], out["params"])
    _assert_trees_equal(v["batch_stats"], out["batch_stats"])


def test_mnasnet_roundtrip():
    trunk = MNASNet()
    v = _init(trunk)
    vp, vs = v["params"], v["batch_stats"]
    state = {"classifier.1.weight": np.zeros((1000, 1280), np.float32)}
    state["layers.0.weight"] = _inv_conv(vp["stem_conv"]["kernel"])
    _emit_bn(state, vp["stem_bn"], vs["stem_bn"], "layers.1")
    state["layers.3.weight"] = _inv_conv(vp["sep_dw"]["kernel"])
    _emit_bn(state, vp["sep_bn1"], vs["sep_bn1"], "layers.4")
    state["layers.6.weight"] = _inv_conv(vp["sep_pw"]["kernel"])
    _emit_bn(state, vp["sep_bn2"], vs["sep_bn2"], "layers.7")
    for si, reps in enumerate((3, 3, 3, 2, 4, 1)):
        for ri in range(reps):
            bp = vp[f"stack{si}_block{ri}"]
            bs = vs[f"stack{si}_block{ri}"]
            t = f"layers.{8 + si}.{ri}.layers"
            state[f"{t}.0.weight"] = _inv_conv(bp["expand"]["kernel"])
            _emit_bn(state, bp["bn1"], bs["bn1"], f"{t}.1")
            state[f"{t}.3.weight"] = _inv_conv(bp["depthwise"]["kernel"])
            _emit_bn(state, bp["bn2"], bs["bn2"], f"{t}.4")
            state[f"{t}.6.weight"] = _inv_conv(bp["project"]["kernel"])
            _emit_bn(state, bp["bn3"], bs["bn3"], f"{t}.7")

    out = convert_mnasnet(state)
    _assert_trees_equal(v["params"], out["params"])
    _assert_trees_equal(v["batch_stats"], out["batch_stats"])


def test_shufflenet_roundtrip():
    trunk = ShuffleNetV2()
    v = _init(trunk)
    vp, vs = v["params"], v["batch_stats"]
    state = {"fc.weight": np.zeros((1000, 1024), np.float32),
             "conv5.0.weight": np.zeros((1024, 464, 1, 1), np.float32)}
    state["conv1.0.weight"] = _inv_conv(vp["conv1"]["kernel"])
    _emit_bn(state, vp["conv1_bn"], vs["conv1_bn"], "conv1.1")
    pairs = (("branch1_dw", "branch1.0"), ("branch1_bn1", "branch1.1"),
             ("branch1_pw", "branch1.2"), ("branch1_bn2", "branch1.3"),
             ("branch2_pw1", "branch2.0"), ("branch2_bn1", "branch2.1"),
             ("branch2_dw", "branch2.3"), ("branch2_bn2", "branch2.4"),
             ("branch2_pw2", "branch2.5"), ("branch2_bn3", "branch2.6"))
    for si, reps in enumerate((4, 8, 4)):
        for ri in range(reps):
            up = vp[f"stage{si + 2}_unit{ri}"]
            us = vs[f"stage{si + 2}_unit{ri}"]
            for flax_name, torch_name in pairs:
                if flax_name not in up and flax_name not in us:
                    continue
                key = f"stage{si + 2}.{ri}.{torch_name}"
                if "bn" in flax_name:
                    _emit_bn(state, up[flax_name], us[flax_name], key)
                else:
                    state[key + ".weight"] = _inv_conv(up[flax_name]["kernel"])

    out = convert_shufflenet(state)
    _assert_trees_equal(v["params"], out["params"])
    _assert_trees_equal(v["batch_stats"], out["batch_stats"])


def test_load_cnn_trunk_end_to_end(tmp_path):
    """torch .pth -> load_cnn_trunk -> grafted full-model variables
    (the reference's pretrained trunk load, dla.py:300-310)."""
    from ovmono3d_tpu.utils.cnn_convert import load_cnn_trunk

    tm = _TResNet18()
    with torch.no_grad():
        _randomize_bn_stats(tm)
    path = tmp_path / "resnet18.pth"
    torch.save(tm.state_dict(), str(path))

    trunk = ResNet(depths=(2, 2, 2, 2), bottleneck=False)
    tv = _init(trunk)
    variables = {
        "params": {"backbone": {"resnet": tv["params"], "fpn": {}}},
        "batch_stats": {"backbone": {"resnet": tv["batch_stats"]}},
    }
    out = load_cnn_trunk(variables, path, "resnet18")
    got = out["params"]["backbone"]["resnet"]["stem"]["conv"]["kernel"]
    want = tm.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(got), want)
    got_var = out["batch_stats"]["backbone"]["resnet"]["stem"]["bn"]["var"]
    np.testing.assert_array_equal(
        np.asarray(got_var), tm.state_dict()["bn1.running_var"].numpy())


def test_strict_key_consumption():
    """Unknown checkpoint keys must raise, not be silently dropped."""
    trunk = ResNet(depths=(2, 2, 2, 2), bottleneck=False)
    v = _init(trunk)
    # Build a valid state dict via torch mirror, then poison it.
    tm = _TResNet18()
    state = {k: v_.numpy() for k, v_ in tm.state_dict().items()}
    state["layer9.0.conv1.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_resnet(state, depths=(2, 2, 2, 2), bottleneck=False)


def test_load_vit_trunk_end_to_end(tmp_path):
    """hub-dinov2-format .pth -> load_cnn_trunk -> grafted ViT backbone
    (the foundation-trunk path of --trunk-ckpt; the model's own
    depth_fusion conv is preserved)."""
    import jax
    import jax.numpy as jnp

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.cnn_convert import load_cnn_trunk

    rng = np.random.RandomState(0)
    D, depth, grid, p = 16, 2, 2, 8
    state = {
        "cls_token": rng.randn(1, 1, D).astype(np.float32),
        "pos_embed": rng.randn(1, 1 + grid * grid, D).astype(np.float32),
        "patch_embed.proj.weight": rng.randn(D, 3, p, p).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(D).astype(np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        for k, shape in (
            ("norm1.weight", (D,)), ("norm1.bias", (D,)),
            ("attn.qkv.weight", (3 * D, D)), ("attn.qkv.bias", (3 * D,)),
            ("attn.proj.weight", (D, D)), ("attn.proj.bias", (D,)),
            ("ls1.gamma", (D,)), ("ls2.gamma", (D,)),
            ("norm2.weight", (D,)), ("norm2.bias", (D,)),
            ("mlp.fc1.weight", (4 * D, D)), ("mlp.fc1.bias", (4 * D,)),
            ("mlp.fc2.weight", (D, 4 * D)), ("mlp.fc2.bias", (D,)),
        ):
            state[b + k] = rng.randn(*shape).astype(np.float32)
    path = tmp_path / "dinov2.pth"
    torch.save({k: torch.from_numpy(v) for k, v in state.items()},
               str(path))

    vit = VisionTransformer(patch_size=p, embed_dim=D, depth=depth,
                            num_heads=2, pretrain_grid=grid,
                            use_depth_fusion=True)
    vparams = jax.jit(vit.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, 16, 16, 3)))
    variables = {"params": {"backbone": {"vit": vparams["params"],
                                         "sfp": {}}}}
    old_fusion = np.asarray(
        vparams["params"]["depth_fusion"]["kernel"])
    out = load_cnn_trunk(variables, path, "dinov2")
    got = out["params"]["backbone"]["vit"]["patch_embed"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(got),
        state["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    # depth_fusion kept from the model's own init
    np.testing.assert_array_equal(
        np.asarray(out["params"]["backbone"]["vit"]["depth_fusion"]
                   ["kernel"]), old_fusion)
