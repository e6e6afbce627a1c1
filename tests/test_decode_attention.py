"""Pallas decode-attention kernel == the einsum cached-attention math.

Runs the kernel in interpreter mode on CPU (same pattern as
tests/test_flash_attention.py) against the XLA reference, then through
the full model decode path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lmrl_gym_tpu.ops.decode_attention as da
from lmrl_gym_tpu.ops.decode_attention import (
    _xla_decode_attention,
    decode_attention,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(da, "_FORCE_INTERPRET", True)


def _rand(key, B, H, Tq, S, Dh, index, dtype=jnp.float32, with_bias=True):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, H, Tq, Dh), dtype)
    # cache: slots >= index + Tq are zeros (unwritten), like KVCache
    k = jax.random.normal(ks[1], (B, H, S, Dh), dtype)
    v = jax.random.normal(ks[2], (B, H, S, Dh), dtype)
    fill = index + Tq
    live = (jnp.arange(S) < fill)[None, None, :, None]
    k, v = k * live, v * live
    bias = None
    if with_bias:
        # random left-padding mask over the filled prefix
        npad = jax.random.randint(ks[3], (B,), 0, max(1, index))
        mask = jnp.arange(S)[None, :] >= npad[:, None]
        bias = jnp.where(mask, 0.0, -0.7 * float(jnp.finfo(jnp.float32).max))
    return q, k, v, bias


@pytest.mark.parametrize(
    "Tq,index,block_k",
    [(1, 37, 32), (1, 0, 64), (10, 8, 32), (8, 0, 64), (10, 118, 32)],
)
def test_kernel_matches_reference(Tq, index, block_k):
    B, H, S, Dh = 3, 4, 128, 64
    q, k, v, bias = _rand(jax.random.PRNGKey(Tq * 1000 + index), B, H, Tq, S, Dh, index)
    idx = jnp.asarray(index, jnp.int32)
    got = decode_attention(q, k, v, idx, bias, sm_scale=0.125, block_k=block_k)
    want = _xla_decode_attention(q, k, v, idx, bias, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_kernel_no_bias_bf16():
    B, H, Tq, S, Dh = 2, 3, 1, 64, 64
    q, k, v, _ = _rand(
        jax.random.PRNGKey(7), B, H, Tq, S, Dh, index=20, dtype=jnp.bfloat16,
        with_bias=False,
    )
    idx = jnp.asarray(20, jnp.int32)
    got = decode_attention(q, k, v, idx, None, sm_scale=0.125, block_k=32)
    want = _xla_decode_attention(q, k, v, idx, None, 0.125)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_model_decode_path_matches_einsum(monkeypatch):
    """Full cached forward: kernel branch == einsum branch logits."""
    from lmrl_gym_tpu.models.config import TransformerConfig
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.models.transformer import KVCache, init_params
    import lmrl_gym_tpu.models.transformer as tr

    config = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        max_position_embeddings=128, pad_vocab_to_multiple=8,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
        use_flash_attention=True, use_pallas_decode=True, dtype="float32",
    )
    core = LMCore(config)
    params = init_params(config, jax.random.PRNGKey(0))
    B, S = 2, 64
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, 9), 0, 64)

    def run(force_einsum):
        if force_einsum:
            monkeypatch.setattr(tr, "supports_decode", lambda *a, **kw: False)
        else:
            monkeypatch.setattr(
                tr, "supports_decode", da.supports_decode
            )
        cache = KVCache.init(config, B, S)
        # prefill 9 tokens, then decode 3 single tokens
        logits, _, cache = core.module.apply(
            {"params": params}, tokens,
            attention_mask=jnp.ones((B, S), jnp.int32),
            position_ids=jnp.arange(9)[None, :].repeat(B, 0),
            cache=cache, deterministic=True,
        )
        outs = [logits[:, -1]]
        # fixed decode tokens so both branches see identical inputs
        decode_toks = jax.random.randint(jax.random.PRNGKey(2), (3, B), 0, 64)
        for i in range(3):
            logits, _, cache = core.module.apply(
                {"params": params}, decode_toks[i][:, None],
                attention_mask=jnp.ones((B, S), jnp.int32),
                position_ids=cache.index + jnp.arange(1)[None, :],
                cache=cache, deterministic=True,
            )
            outs.append(logits[:, -1])
        return jnp.stack(outs, 1)

    got = run(force_einsum=False)
    want = run(force_einsum=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5)
