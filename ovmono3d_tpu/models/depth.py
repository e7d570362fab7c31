"""Depth-Pro monocular metric depth (Flax) — the faithful architecture.

Re-design of the ml-depth-pro model used by OVMono3D-GEO for metric depth
(tools/ovmono3d_geo.py:266-297 `depth_pro.create_model_and_transforms` ->
`model.infer`; SURVEY.md §2.1 #28, §2.3), cross-validated against the
official port `transformers.DepthProForDepthEstimation`
(tests/test_hf_crossval.py):

- a shared DINOv2-style PATCH ENCODER run over overlapping fixed-size
  crops of a 3-level image pyramid (ratios 0.25/0.5/1.0) — one batched ViT
  pass over all crops, a TPU-friendly fixed-shape formulation;
- a separate IMAGE ENCODER on the downsampled global view;
- patch-grid merging (inner-edge padding strips) + bilinear reassembly to
  a 5-level feature pyramid, upsample/projection neck, and a DPT-style
  residual fusion decoder;
- a canonical-inverse-depth head and an optional FOV network with its own
  encoder tap.

Metric decode (Depth-Pro convention, image_processing_depth_pro.py
post_process_depth_estimation):  depth = 1 / (c_inv * W / f_px).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmono3d_tpu.models.vit import VisionTransformer

Dtype = Any


def _resize(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """Bilinear NHWC resize matching F.interpolate(align_corners=False,
    antialias=False) — torch does not antialias on downscale."""
    if x.shape[1:3] == tuple(hw):
        return x
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[3]), "bilinear",
        antialias=False,
    )


def split_to_patches(x: jax.Array, patch: int, overlap: float) -> jax.Array:
    """[B, S, S, C] -> [n*B, patch, patch, C] overlapping crops, row-major,
    patch-major stacking (modeling_depth_pro.split_to_patches)."""
    B, S = x.shape[0], x.shape[1]
    if S == patch:
        return x
    stride = int(patch * (1 - overlap))
    crops = [
        x[:, i : i + patch, j : j + patch]
        for i in range(0, S - patch + 1, stride)
        for j in range(0, S - patch + 1, stride)
    ]
    return jnp.stack(crops, axis=0).reshape(-1, patch, patch, x.shape[-1])


def merge_patches(patches: jax.Array, batch: int, padding: int) -> jax.Array:
    """[n*B, g, g, C] -> [B, G, G, C]: reassemble the row-major patch grid,
    stripping `padding` rows/cols from every inner merge edge
    (modeling_depth_pro.merge_patches semantics, including the first-sqrt²
    selection that picks the highest-resolution scale's patches when fed
    the full multi-scale batch)."""
    nB, g = patches.shape[0], patches.shape[1]
    n = nB // batch
    if n == 1:
        return patches
    sq = int(math.isqrt(n))
    if n < 4:
        padding = 0
    padding = min(g // 4, padding)
    grid = patches.reshape(n, batch, g, g, patches.shape[-1])
    rows = []
    for h in range(sq):
        row = []
        for w in range(sq):
            box = grid[h * sq + w]
            t = padding if h != 0 else 0
            b = padding if h != sq - 1 else 0
            l = padding if w != 0 else 0
            r = padding if w != sq - 1 else 0
            row.append(box[:, t : g - b, l : g - r])
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


class PreActResidual(nn.Module):
    """DPT pre-activation residual conv unit (DepthProPreActResidualLayer)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class FusionLayer(nn.Module):
    """DepthProFeatureFusionLayer: residual fuse + (deconv) 2x + project."""

    features: int
    use_deconv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + PreActResidual(self.features, dtype=self.dtype,
                                   name="rcu1")(skip)
        x = PreActResidual(self.features, dtype=self.dtype, name="rcu2")(x)
        if self.use_deconv:
            x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                 use_bias=False, dtype=self.dtype,
                                 name="deconv")(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="project")(x)


class DepthPro(nn.Module):
    """Multi-scale patchwork ViT encoder + DPT fusion decoder + FOV head.

    Defaults mirror the released model (dinov2l16_384 trunks @384², image
    pyramid 1536/768/384). Returns canonical inverse depth at the input
    resolution plus the FOV-head estimate in degrees.
    """

    # ViT trunk (shared arch for patch / image / fov encoders)
    patch_size: int = 16
    encoder_size: int = 384        # crop side == ViT input side
    vit_dim: int = 1024
    vit_depth: int = 24
    vit_heads: int = 16
    # pyramid / feature plumbing (DepthProConfig defaults)
    scaled_ratios: Sequence[float] = (0.25, 0.5, 1.0)
    overlap_ratios: Sequence[float] = (0.0, 0.5, 0.25)
    scaled_dims: Sequence[int] = (1024, 1024, 512)
    hook_ids: Sequence[int] = (11, 5)
    hook_dims: Sequence[int] = (256, 256)
    fusion_dim: int = 256
    merge_padding: int = 3
    num_fov_layers: int = 2
    use_fov: bool = True
    quant: str = "none"   # "int8": W8A8 serving path for the ViT trunks'
                          # qkv/proj/fc1/fc2 (ops/quant.py; opt-in)
    gelu: str = "erf"     # "tanh": opt-in serving epilogue — the erf
                          # fusion tail costs ~28 ms/image over the 24
                          # ViT-L layers (models/vit.py Mlp.gelu caveat;
                          # reference runs Depth-Pro fp16, coarser)
    dtype: Dtype = jnp.bfloat16

    def _vit(self, name: str, hooks: Sequence[int] = ()) -> VisionTransformer:
        return VisionTransformer(
            patch_size=self.patch_size,
            embed_dim=self.vit_dim,
            depth=self.vit_depth,
            num_heads=self.vit_heads,
            pretrain_grid=self.encoder_size // self.patch_size,
            layerscale=True,
            use_depth_fusion=False,
            final_norm=True,
            out_layers=tuple(hooks),
            quant=self.quant,
            gelu=self.gelu,
            dtype=self.dtype,
            name=name,
        )

    def setup(self):
        E, P = self.encoder_size, self.patch_size
        assert E % P == 0, "encoder_size must be a patch multiple"
        self.patch_encoder = self._vit("patch_encoder", self.hook_ids)
        self.image_encoder = self._vit("image_encoder")
        if self.use_fov:
            self.fov_encoder = self._vit("fov_encoder")
            self.fov_neck = nn.Dense(self.fusion_dim // 2, dtype=self.dtype,
                                     name="fov_neck")
            self.fov_conv = nn.Conv(self.fusion_dim // 2, (3, 3),
                                    strides=(2, 2), padding=1,
                                    dtype=self.dtype, name="fov_conv")
        # neck: image-feature upsample (deconv only, bias)
        self.up_image = nn.ConvTranspose(self.scaled_dims[0], (2, 2),
                                         strides=(2, 2), dtype=self.dtype,
                                         name="up_image")
        # scaled-image features: 1x1 proj + one deconv (no bias)
        self.up_scaled = [
            (
                nn.Conv(d, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"up_scaled{i}_proj"),
                nn.ConvTranspose(d, (2, 2), strides=(2, 2), use_bias=False,
                                 dtype=self.dtype,
                                 name=f"up_scaled{i}_deconv"),
            )
            for i, d in enumerate(self.scaled_dims)
        ]
        # intermediate (hook) features: proj + (2 + i) deconvs (no bias)
        ups = []
        for i, d in enumerate(self.hook_dims):
            inter = self.fusion_dim if i == 0 else d
            layers = [nn.Conv(inter, (1, 1), use_bias=False,
                              dtype=self.dtype,
                              name=f"up_hook{i}_proj")]
            for j in range(2 + i):
                layers.append(
                    nn.ConvTranspose(d, (2, 2), strides=(2, 2),
                                     use_bias=False, dtype=self.dtype,
                                     name=f"up_hook{i}_deconv{j}")
                )
            ups.append(layers)
        self.up_hooks = ups
        self.fuse_lowres = nn.Conv(self.scaled_dims[0], (1, 1),
                                   dtype=self.dtype, name="fuse_lowres")
        dims = tuple(self.scaled_dims) + tuple(self.hook_dims)
        # the last projection is dropped when dims already match
        # (DepthProFeatureProjection nn.Identity)
        self.n_project = len(dims) - (
            1 if dims[-1] == self.fusion_dim else 0
        )
        self.projections = [
            nn.Conv(self.fusion_dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"project{i}")
            for i in range(self.n_project)
        ]
        n_fuse = len(dims)
        self.fusions = [
            FusionLayer(self.fusion_dim, use_deconv=(i < n_fuse - 1),
                        dtype=self.dtype, name=f"fusion{i}")
            for i in range(n_fuse)
        ]
        self.head_conv1 = nn.Conv(self.fusion_dim // 2, (3, 3), padding=1,
                                  dtype=self.dtype, name="head_conv1")
        self.head_deconv = nn.ConvTranspose(self.fusion_dim // 2, (2, 2),
                                            strides=(2, 2),
                                            dtype=self.dtype,
                                            name="head_deconv")
        self.head_conv2 = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                                  name="head_conv2")
        self.head_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                                name="head_out")
        if self.use_fov:
            out_size = self.encoder_size // self.patch_size
            c = self.fusion_dim
            self.fov_head = [
                nn.Conv(-(-c // 2 ** (i + 2)), (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype, name=f"fov_head{i}")
                for i in range(self.num_fov_layers)
            ]
            k = int((out_size - 1) / 2**self.num_fov_layers + 1)
            self.fov_head_out = nn.Conv(1, (k, k), padding=0, dtype=self.dtype,
                                        name="fov_head_out")

    # -- stages (tools/probe_depth_stages.py times each via
    #    apply(method=...); __call__ is their exact composition) ---------

    def pyramid_patches(self, images: jax.Array):
        """Image pyramid -> one batched stack of overlapping crops,
        high-res scale LAST in the returned concat (reverse scale order),
        plus the per-scale crop counts. Pure data movement, no params."""
        B, H = images.shape[0], images.shape[1]
        E = self.encoder_size
        per_scale = []
        for ratio, ov in zip(self.scaled_ratios, self.overlap_ratios):
            scaled = _resize(images, (int(H * ratio), int(H * ratio)))
            per_scale.append(split_to_patches(scaled, E, ov))
        counts = [p.shape[0] // B for p in per_scale]
        return jnp.concatenate(per_scale[::-1], axis=0), counts

    def encode_patches(self, patches: jax.Array) -> dict:
        """The 35-crop (released geometry) batched ViT-L pass."""
        return self.patch_encoder(patches)

    def encode_image(self, global_img: jax.Array) -> jax.Array:
        return self.image_encoder(global_img)["last_feat"]

    def encode_fov_trunk(self, global_img: jax.Array) -> jax.Array:
        return self.fov_encoder(global_img)["last_feat"]

    def decode_features(self, enc: dict, img_feat: jax.Array,
                        fov_feat: jax.Array | None, batch: int,
                        counts: Sequence[int]):
        """Patch-grid merge + reassembly, upsample/projection neck, DPT
        fusion decoder + depth head + FOV head."""
        B = batch
        E = self.encoder_size
        base = E // self.patch_size
        out_size = base
        last = enc["last_feat"]                      # [N*B, g, g, C]

        # split back, low-res scale first
        feats = []
        start = 0
        for n in [c * B for c in list(counts)[::-1]]:
            feats.append(last[start : start + n])
            start += n
        feats = feats[::-1]

        scaled_feats = []
        for i, (f, ratio) in enumerate(zip(feats, self.scaled_ratios)):
            pad = int(self.merge_padding / ratio)
            merged = merge_patches(f, B, pad)
            scaled_feats.append(_resize(merged, (base * 2**i,) * 2))

        hook_feats = []
        for i, hook in enumerate(self.hook_ids):
            f = enc[f"feat{hook}"]                   # all patches, pre-norm
            pad = int(self.merge_padding / self.scaled_ratios[-1])
            merged = merge_patches(f, B, pad)
            tgt = base * 2 ** (len(self.scaled_ratios) - 1)
            hook_feats.append(_resize(merged, (tgt, tgt)))

        img_feat = _resize(img_feat, (base, base))

        # --- neck: upsample + fuse + project ---
        img_up = self.up_image(img_feat)
        sc_up = [
            deconv(proj(f))
            for (proj, deconv), f in zip(self.up_scaled, scaled_feats)
        ]
        hk_up = []
        for layers, f in zip(self.up_hooks, hook_feats):
            for layer in layers:
                f = layer(f)
            hk_up.append(f)
        glob = self.fuse_lowres(
            jnp.concatenate([sc_up[0], img_up], axis=-1)
        )
        pyramid = [glob, *sc_up[1:], *hk_up]
        pyramid = [
            self.projections[i](f) if i < self.n_project else f
            for i, f in enumerate(pyramid)
        ]

        # --- DPT fusion (coarsest/global first) + head ---
        x = self.fusions[0](pyramid[0])
        for layer, skip in zip(self.fusions[1:], pyramid[1:]):
            x = layer(x, skip)
        x = self.head_conv1(x)
        x = self.head_deconv(x)
        x = nn.relu(self.head_conv2(x))
        inv_depth = nn.relu(self.head_out(x))[..., 0]

        # --- FOV network ---
        if self.use_fov:
            fov_feat = self.fov_neck(fov_feat)
            fov_feat = _resize(fov_feat, (base, base))
            g = nn.relu(self.fov_conv(jax.lax.stop_gradient(pyramid[0])))
            h = _resize(fov_feat + g, (out_size, out_size))
            for conv in self.fov_head:
                h = nn.relu(conv(h))
            h = self.fov_head_out(h)
            fov = h.reshape(B)
        else:
            fov = jnp.zeros((B,), inv_depth.dtype)
        return {
            "canonical_inverse_depth": inv_depth.astype(jnp.float32),
            "fov_deg": fov.astype(jnp.float32),
        }

    def __call__(self, images: jax.Array):
        """images: [B, H, H, 3] normalized, H a power-of-two multiple of
        encoder_size/out_size. Returns dict(canonical_inverse_depth
        [B, H, H], fov_deg [B])."""
        B, H = images.shape[0], images.shape[1]
        E = self.encoder_size
        out_size = E // self.patch_size
        # With H a power-of-two multiple of out_size (the released model:
        # 1536 = 24 * 2^6), HF's base = H // 2**int(log2(H/out_size))
        # reduces to out_size; assert the precondition instead of
        # replicating the obfuscated identity.
        assert H % out_size == 0 and (H // out_size) & (H // out_size - 1) \
            == 0, f"input side {H} must be a power-of-two multiple of " \
                  f"{out_size}"
        assert int(H * min(self.scaled_ratios)) >= E, (
            f"input side {H} too small: the {min(self.scaled_ratios)}-scale "
            f"pyramid level must be at least encoder_size={E}"
        )

        patches, counts = self.pyramid_patches(images)
        enc = self.encode_patches(patches)
        global_img = _resize(images, (E, E))
        img_feat = self.encode_image(global_img)
        fov_feat = (self.encode_fov_trunk(global_img)
                    if self.use_fov else None)
        return self.decode_features(enc, img_feat, fov_feat, B, counts)


def metric_depth(
    canonical_inverse_depth: jax.Array,  # [B, H, W]
    f_px: jax.Array,                     # [B] focal length in pixels
    width: int,
    min_depth: float = 0.1,
    max_depth: float = 250.0,
) -> jax.Array:
    """Depth-Pro metric decode: depth = 1 / (c_inv * W / f_px), clamped
    (depth_pro.py infer / image_processing_depth_pro.py:358-376:
    inverse_depth = canonical_inverse_depth * W / f_px)."""
    inv = canonical_inverse_depth * (width / f_px[:, None, None])
    return jnp.clip(1.0 / jnp.maximum(inv, 1.0 / max_depth), min_depth,
                    max_depth)


def fov_to_focal(fov_deg: jax.Array, width: int) -> jax.Array:
    """Horizontal FOV (degrees) -> focal length in pixels."""
    return 0.5 * width / jnp.tan(0.5 * jnp.deg2rad(fov_deg))
