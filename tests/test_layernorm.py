"""Fused Pallas LayerNorm vs the reference flax math (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.ops.layernorm import (
    _ln_pallas,
    _ln_reference,
    layer_norm_fused,
)


def _inputs(rows=300, C=256, dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(ks[0], (2, rows, C), jnp.float32) * 3 + 1.5
    scale = jax.random.normal(ks[1], (C,), jnp.float32) * 0.2 + 1.0
    bias = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    return x.astype(dtype), scale, bias


def test_pallas_matches_reference_bf16():
    x, scale, bias = _inputs()
    want = _ln_reference(x, scale, bias, 1e-6, jnp.bfloat16)
    got = _ln_pallas(x, scale, bias, 1e-6, jnp.bfloat16, block_rows=128,
                     interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_pallas_matches_reference_f32_tight():
    x, scale, bias = _inputs(dtype=jnp.float32, seed=1)
    want = _ln_reference(x, scale, bias, 1e-5, jnp.float32)
    got = _ln_pallas(x, scale, bias, 1e-5, jnp.float32, block_rows=128,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_unaligned_rows_padding():
    # rows not a block multiple: padded rows must not leak into outputs.
    x, scale, bias = _inputs(rows=77, C=128, dtype=jnp.float32, seed=2)
    want = _ln_reference(x, scale, bias, 1e-6, jnp.float32)
    got = _ln_pallas(x, scale, bias, 1e-6, jnp.float32, block_rows=64,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_custom_vjp_gradients_match_reference():
    x, scale, bias = _inputs(rows=40, C=128, dtype=jnp.float32, seed=3)

    def loss_fused(x, s, b):
        return jnp.sum(layer_norm_fused(x, s, b, 1e-6, jnp.float32) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_ln_reference(x, s, b, 1e-6, jnp.float32) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)


def test_model_layernorm_matches_op_reference(monkeypatch):
    """LayerNormBf16Out (inline math — see its NOTE on why the Pallas
    kernel is NOT wired in) computes the same function as the op's
    reference path, so the kernel remains a drop-in if ever needed."""
    from ovmono3d_tpu.models.vit import LayerNormBf16Out

    x, scale, bias = _inputs(rows=16, C=128, dtype=jnp.bfloat16, seed=4)
    m = LayerNormBf16Out(epsilon=1e-6, dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda p: p, params)
    params["params"]["scale"] = scale
    params["params"]["bias"] = bias
    got = m.apply(params, x)
    want = _ln_reference(x, scale, bias, 1e-6, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-6, rtol=1e-6,
    )
