"""Pallas kernel tests (interpret mode on the CPU backend).

The flash-attention kernel must match plain XLA attention bit-for-bit up
to fp32 softmax accumulation error. On CPU the public entry point falls
back to XLA, so these tests force interpret mode to execute the actual
Mosaic kernel body.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmrl_gym_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = fa._FORCE_INTERPRET
    fa._FORCE_INTERPRET = True
    yield
    fa._FORCE_INTERPRET = old


def _rand_qkv(B, H, Tq, S, Dh, dtype=jnp.float32, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (B, H, Tq, Dh), dtype)
    k = jax.random.normal(k2, (B, H, S, Dh), dtype)
    v = jax.random.normal(k3, (B, H, S, Dh), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "B,H,Tq,S,Dh",
    [
        (1, 2, 128, 128, 64),
        (2, 1, 200, 200, 32),  # non-multiple of block → padding path
        (1, 1, 128, 256, 64),  # Tq < S: queries right-aligned (decode layout)
    ],
)
def test_flash_matches_xla_forward(B, H, Tq, S, Dh):
    q, k, v = _rand_qkv(B, H, Tq, S, Dh)
    # mask out the final 5 kv slots of batch 0
    maskrow = jnp.where(jnp.arange(S) < S - 5, 0.0, fa._NEG_BIG)
    bias = jnp.stack([maskrow] + [jnp.zeros(S)] * (B - 1)) if B > 1 else maskrow[None]
    assert fa.supports_flash(q.shape, S)
    out = fa.flash_attention(q, k, v, bias, causal=True, block_q=128, block_k=128)
    ref = fa._xla_attention(q, k, v, bias, True, 1.0 / Dh**0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_no_bias_non_causal():
    q, k, v = _rand_qkv(1, 2, 128, 128, 64, seed=3)
    out = fa.flash_attention(q, k, v, None, causal=False, block_q=128, block_k=128)
    ref = fa._xla_attention(q, k, v, None, False, 1.0 / 64**0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_xla():
    q, k, v = _rand_qkv(1, 1, 128, 128, 32, seed=7)
    bias = jnp.zeros((1, 128))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, bias, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(fa._xla_attention(q, k, v, bias, True, 1.0 / 32**0.5) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_supports_flash_gating():
    # short sequences and CPU backend (without force) must decline
    assert not fa.supports_flash((1, 2, 16, 64), 16)
    old = fa._FORCE_INTERPRET
    fa._FORCE_INTERPRET = False
    try:
        assert not fa.supports_flash((1, 2, 512, 64), 512)  # cpu backend
    finally:
        fa._FORCE_INTERPRET = old
    # odd head dim declines
    assert not fa.supports_flash((1, 2, 512, 63), 512)


def test_model_flash_flag_smoke():
    """Transformer with use_flash_attention=True on CPU silently uses the
    fallback — outputs must equal the flag-off model exactly."""
    from lmrl_gym_tpu.models.config import tiny_test_config
    from lmrl_gym_tpu.models.transformer import Transformer, init_params

    cfg_on = tiny_test_config(use_flash_attention=True)
    cfg_off = tiny_test_config(use_flash_attention=False)
    params = init_params(cfg_on, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg_on.vocab_size)
    logits_on, _, _ = Transformer(cfg_on).apply({"params": params}, ids)
    logits_off, _, _ = Transformer(cfg_off).apply({"params": params}, ids)
    np.testing.assert_array_equal(np.asarray(logits_on), np.asarray(logits_off))
