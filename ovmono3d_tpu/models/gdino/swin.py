"""Swin Transformer backbone (Flax) — GroundingDINO's image trunk.

Re-design of the pip-installed swin_B_384_22k used via
`groundingdino.models.build_model` (configs/GroundingDINO_SwinB_cfg.py:
backbone="swin_B_384_22k", return_interm_indices=[1,2,3]).

Swin-B: embed_dim 128, depths (2, 2, 18, 2), heads (4, 8, 16, 32),
window 12 (384-pretrained). Outputs stage features at strides 8/16/32 with
channels 256/512/1024 (stages 1, 2, 3).

TPU-first notes:
- windows are static shapes: inputs are padded so H, W are window multiples;
  the shifted-window attention mask is computed from static shapes at trace
  time (pure numpy) and baked as a constant.
- relative position bias tables are indexed with a precomputed static index
  (as in the original), a plain gather.
- bf16 matmuls, f32 layernorms.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.models.vit import PatchEmbed
from ovmono3d_tpu.ops.attention import window_attention

Dtype = Any


def _rel_pos_index(table_window: int, window: int | None = None) -> jax.Array:
    """Static [w*w, w*w] relative-position index into a bias table built for
    `table_window` (the checkpoint's window). When the effective window `w`
    is smaller (tiny feature maps), the same packing indexes the centered
    sub-range of the full table. Built from jnp iotas so it is folded during
    compilation instead of uploaded as a per-block HLO literal (the axon
    relay caps the remote-compile request body)."""
    window = window or table_window
    coords = jnp.stack(
        jnp.meshgrid(jnp.arange(window), jnp.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    return (
        (rel[:, :, 0] + table_window - 1) * (2 * table_window - 1)
        + rel[:, :, 1] + table_window - 1
    )


def _shift_region_ids(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Static per-window region ids for the shifted-window mask:
    [num_windows, W*W] int32. The additive [nw, W*W, W*W] mask is expanded
    IN-graph (ids equal -> 0, else -1e9) so the baked constant stays tiny —
    materializing the full f32 mask as an HLO literal costs ~24 MB for the
    stride-4 stage alone and overflows the axon remote-compile upload."""
    img_mask = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    mask = img_mask.reshape(hp // window, window, wp // window, window)
    mask = mask.transpose(0, 2, 1, 3).reshape(-1, window * window)
    return mask.astype(np.int32)


def expand_rel_pos_biases(swin_params: dict, window: int = 12) -> dict:
    """Hoist every block's relative-position-bias expansion out of the
    forward: table [(2w-1)^2, H] -> [H, w^2, w^2] f32, computed ONCE per
    loaded checkpoint (the Swin trunk is frozen at inference,
    roi_heads_gdino.py:87-91). Pass the result as `rel_biases` to
    SwinTransformer / GroundingDINO.__call__ — bit-identical outputs, with
    the per-forward per-block gathers removed from the graph. Only consumed
    by blocks whose effective window equals the table window (feature map
    >= window, true for every stage at the 800/384-class resolutions);
    smaller maps fall back to the in-graph expansion.

    `swin_params`: the Swin param subtree (e.g.
    params['params']['backbone'] of GroundingDINO).

    Returns HOST (numpy) arrays (~31 MB for Swin-B) — callers must place
    them on device ONCE (jnp.asarray / device_put) and reuse across calls;
    passing the numpy dict to a jitted function re-uploads it per call."""
    idx = np.asarray(_rel_pos_index(window)).reshape(-1)
    n = window * window
    out = {}
    for name, sub in swin_params.items():
        if isinstance(sub, dict) and "attn" in sub \
                and "rel_pos_bias" in sub["attn"]:
            table = np.asarray(sub["attn"]["rel_pos_bias"])
            out[name] = np.ascontiguousarray(
                table[idx].reshape(n, n, table.shape[-1]).transpose(2, 0, 1)
            )
    return out


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int        # table window (fixed by the pretrained checkpoint)
    eff_window: int    # effective window at this resolution (<= window)
    dtype: Dtype = jnp.bfloat16
    # Probe only (tools/probe_swin_floor.py): replace the attention core
    # with a values passthrough, keeping qkv/proj/bias/layout — isolates
    # the softmax-attention math cost in situ.
    skip_core: bool = False

    @nn.compact
    def __call__(self, x, ids=None, bias=None):
        """x: [num_windows*B, w*w, C]; ids: [num_windows, w*w] int32 region
        ids for the shifted-window mask (equal ids attend, else -1e9), or
        None; bias: precomputed [H, w*w, w*w] rel-pos bias
        (expand_rel_pos_biases) or None to expand the table in-graph."""
        Bw, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bw, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        table = self.param(
            "rel_pos_bias",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        if bias is None:
            idx = _rel_pos_index(self.window, self.eff_window)
            bias = table[idx.reshape(-1)].reshape(
                N, N, self.num_heads
            ).transpose(2, 0, 1)
        if self.skip_core:
            out = v
        else:
            out = window_attention(q, k, v, bias, ids)
        out = out.reshape(Bw, N, C).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    # Ablation/bench only: skip sub-blocks ("attn", "mlp") or just the
    # softmax-attention math while keeping qkv/proj/pad/roll/partition
    # ("attn_core") — tools/probe_swin_floor.py cost attribution.
    debug_skip: tuple = ()

    @nn.compact
    def __call__(self, x, hw, bias=None):
        """x: [B, H*W, C]; hw: static (H, W); bias: precomputed
        [H, w*w, w*w] rel-pos bias for the TABLE window (ignored when the
        effective window shrinks below it)."""
        H, W = hw
        B, _, C = x.shape
        # Original Swin rule: if the resolution is not larger than the
        # window, use one full window and disable the shift.
        win, shift = self.window, self.shift
        if min(H, W) <= win:
            win = min(H, W)
            shift = 0

        if "attn" in self.debug_skip:
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="norm2")(x)
            h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                         name="fc1")(h.astype(self.dtype))
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
            return x + h

        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        # Cast to the compute dtype BEFORE the pad/roll/window-partition
        # transposes: they are pure layout traffic and the attention body
        # consumes bf16 anyway — casting after (the old placement) moved
        # the whole stage-0 [B, 200, 200, C] tensor through HBM in f32.
        h = h.astype(self.dtype).reshape(B, H, W, C)

        # pad to window multiples (static)
        hp = -(-H // win) * win
        wp = -(-W // win) * win
        h = jnp.pad(h, ((0, 0), (0, hp - H), (0, wp - W), (0, 0)))
        if shift > 0:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            ids = jnp.asarray(_shift_region_ids(hp, wp, win, shift))
        else:
            ids = None
        # window partition
        h = h.reshape(B, hp // win, win, wp // win, win, C)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, C)
        h = WindowAttention(
            self.dim, self.num_heads, self.window, win, self.dtype,
            skip_core="attn_core" in self.debug_skip,
            name="attn",
        )(h, ids, bias if win == self.window else None)
        # reverse
        h = h.reshape(B, hp // win, wp // win, win, win, C)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp, wp, C)
        if shift > 0:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        h = h[:, :H, :W].reshape(B, H * W, C)
        x = shortcut + h

        if "mlp" in self.debug_skip:
            return x
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw):
        H, W = hw
        B, _, C = x.shape
        x = x.reshape(B, H, W, C)
        # pad odd sizes
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        hp, wp = x.shape[1], x.shape[2]
        x = x.reshape(B, hp * wp, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x.astype(self.dtype))
        return x, (hp, wp)


class SwinTransformer(nn.Module):
    """Swin-B by default; returns {'s1': /8, 's2': /16, 's3': /32} features."""

    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 12
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: Dtype = jnp.bfloat16
    # Ablation/bench only: forwarded to every block ("attn", "mlp",
    # "attn_core").
    debug_skip: tuple = ()

    @nn.compact
    def __call__(self, images: jax.Array,
                 rel_biases: dict | None = None) -> dict[str, jax.Array]:
        """images: [B, H, W, 3] (normalized). H, W multiples of 32.
        rel_biases: optional {f'stage{si}_block{bi}': [H, w*w, w*w]} from
        expand_rel_pos_biases (frozen-trunk inference fast path)."""
        B, H, W, _ = images.shape
        # The space-to-depth patch embed FLOOR-DROPS trailing rows/cols
        # (unlike the SAME-padded nn.Conv it replaced) — reject non
        # multiple-of-4 inputs loudly instead of silently truncating.
        # Shapes are static under jit, so this is a trace-time check.
        if H % 4 or W % 4:
            raise ValueError(
                f"SwinTransformer input H, W must be multiples of 4 "
                f"(got {H}x{W}); pad the canvas first (square_pad)."
            )
        # Space-to-depth + matmul patch embed (models/vit.py PatchEmbed):
        # same params as the stride-4 nn.Conv it replaces (kernel HWIO
        # [4, 4, 3, C] + bias, converters unchanged), but avoids XLA's
        # poor lowering of large-stride convs on TPU.
        hw = (H // 4, W // 4)
        x = PatchEmbed(4, self.embed_dim, self.dtype,
                       name="patch_embed")(images)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x)

        outs = {}
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim,
                    self.num_heads[si],
                    self.window,
                    shift=0 if bi % 2 == 0 else self.window // 2,
                    dtype=self.dtype,
                    debug_skip=self.debug_skip,
                    name=f"stage{si}_block{bi}",
                )(x, hw,
                  None if rel_biases is None
                  else rel_biases.get(f"stage{si}_block{bi}"))
            if si in self.out_indices:
                feat = nn.LayerNorm(
                    epsilon=1e-5, dtype=jnp.float32, name=f"out_norm{si}"
                )(x)
                outs[f"s{si}"] = feat.reshape(B, hw[0], hw[1], dim).astype(
                    jnp.float32
                )
            if si < len(self.depths) - 1:
                x, hw = PatchMerging(dim, self.dtype,
                                     name=f"merge{si}")(x, hw)
                dim *= 2
        return outs
