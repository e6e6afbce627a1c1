"""Model-facing glue: attention-mask/position conventions, LM forward,
and the plain-LM decode hookup for models/generation.py.

Replaces the reference's JaxSeq `models.base_interface` conventions
(initialize_attn_mask_pos_ids; SURVEY.md §2.9): attention mask = 1 where
token != pad_id, position ids = cumsum(mask)-1 clipped at 0 (so left
padding yields logical positions starting at 0).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from lmrl_gym_tpu.models.config import TransformerConfig
from lmrl_gym_tpu.models.transformer import KVCache, Transformer, mask_pad_logits


def initialize_attn_mask_pos_ids(
    input_ids: jax.Array,
    pad_token_id: Optional[int],
    attention_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    if attention_mask is None:
        if pad_token_id is None:
            attention_mask = jnp.ones_like(input_ids, jnp.int32)
        else:
            attention_mask = (input_ids != pad_token_id).astype(jnp.int32)
    if position_ids is None:
        position_ids = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, 0, None)
    return attention_mask, position_ids


class LMCore:
    """Stateless bundle of (config, module) with functional params.

    Passing a `mesh` turns on Megatron-style activation sharding
    constraints inside the transformer (residual stream batch-sharded over
    ('dp','fsdp'), attention/MLP interiors mp-sharded) so GSPMD partitions
    the train step cleanly with no involuntary remats.
    """

    def __init__(self, config: TransformerConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        self.module = Transformer(config, mesh=mesh)

    def forward(
        self,
        params: Any,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        pad_token_id: Optional[int] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """→ (logits [B,T,V_padded] f32, final hidden [B,T,D])."""
        attention_mask, position_ids = initialize_attn_mask_pos_ids(
            input_ids, pad_token_id, attention_mask, position_ids
        )
        rngs = {"dropout": rng} if (train and rng is not None) else {}
        logits, hidden, _ = self.module.apply(
            {"params": params},
            input_ids,
            attention_mask=attention_mask,
            position_ids=position_ids,
            deterministic=not train,
            rngs=rngs,
        )
        return logits, hidden

    def make_lm_logits_fn(self, params: Any, total_len: int, batch: int):
        """(logits_fn, init_carry) for models.generation.generate.

        Carry = (KVCache, next_position [B]). Positions are logical
        (cumsum of mask), so left-padded prompts decode correctly.
        """
        cache = KVCache.init(self.config, batch, total_len)

        def logits_fn(tokens: jax.Array, attn_mask: jax.Array, carry):
            cache, next_pos = carry
            T = tokens.shape[1]
            # cache may be sized larger than prompt+max_new_tokens; pad the
            # mask out to the physical cache length (pad slots stay masked)
            cache_len = cache.max_len
            if attn_mask.shape[1] < cache_len:
                attn_mask = jnp.pad(
                    attn_mask, ((0, 0), (0, cache_len - attn_mask.shape[1]))
                )
            if T > 1:  # prefill: logical positions from the mask prefix
                prefix_mask = attn_mask[:, :T]
                position_ids = jnp.clip(
                    jnp.cumsum(prefix_mask, axis=1) - 1, 0, None
                )
                next_pos = prefix_mask.sum(axis=1)
            else:
                position_ids = next_pos[:, None]
                next_pos = next_pos + 1
            logits, _, cache = self.module.apply(
                {"params": params},
                tokens,
                attention_mask=attn_mask,
                position_ids=position_ids,
                cache=cache,
                deterministic=True,
            )
            logits = mask_pad_logits(logits, self.config.vocab_size)
            return logits, (cache, next_pos)

        init_carry = (cache, jnp.zeros((batch,), jnp.int32))
        return logits_fn, init_carry
