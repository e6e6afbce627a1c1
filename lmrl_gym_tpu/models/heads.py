"""Value heads on top of the transformer trunk.

Parity with LLM_RL/heads/ (SURVEY.md §2.3):

- LinearHead: single Dense, replicated params, configurable bias init
  (PPO value head uses bias_init=-4.1 in Wordle,
  wordle/ppo/train_ppo_gpt2.py:254-259), `pad_outputs` support for
  padded-vocab Q heads (linear_head.py:121-149);
- MLPHead: 2-layer MLP, dense1 kernel PS('fsdp','mp'), dense2 kernel
  PS('mp','fsdp') (mlp_head.py:76-83), with zero-init last layer for ILQL
  Q/V heads (maze/ilql/train_ilql.py:218-232).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as PS


@dataclass(frozen=True)
class LinearHeadConfig:
    input_dim: int
    output_dim: int
    use_bias: bool = True
    initializer_range: float = 0.02
    bias_init: float = 0.0
    dtype: str = "float32"

    def to_dict(self) -> dict:
        import dataclasses

        return dataclasses.asdict(self)

    def partition_rules(self) -> Tuple[Tuple[str, PS], ...]:
        # replicated, like the reference (linear_head.py:70-75)
        return ((".*", PS()),)


class LinearHead(nn.Module):
    config: LinearHeadConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        return nn.Dense(
            cfg.output_dim,
            use_bias=cfg.use_bias,
            dtype=jnp.dtype(cfg.dtype),
            kernel_init=nn.initializers.normal(cfg.initializer_range),
            bias_init=nn.initializers.constant(cfg.bias_init),
            name="dense",
        )(x)


@dataclass(frozen=True)
class MLPHeadConfig:
    input_dim: int
    hidden_dim: int
    output_dim: int
    use_bias: bool = True
    initializer_range: float = 0.02
    layer2_initializer_range: Optional[float] = None  # 0.0 → zero-init
    layer2_bias_init: Optional[float] = None
    activation: str = "gelu"
    dropout: float = 0.0
    dtype: str = "float32"

    def to_dict(self) -> dict:
        import dataclasses

        return dataclasses.asdict(self)

    def partition_rules(self) -> Tuple[Tuple[str, PS], ...]:
        return (
            ("dense1/kernel", PS("fsdp", "mp")),
            ("dense2/kernel", PS("mp", "fsdp")),
            ("dense1/bias", PS("mp")),
            (".*", PS()),
        )


class MLPHead(nn.Module):
    config: MLPHeadConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        h = nn.Dense(
            cfg.hidden_dim,
            use_bias=cfg.use_bias,
            dtype=dtype,
            kernel_init=nn.initializers.normal(cfg.initializer_range),
            name="dense1",
        )(x)
        h = nn.gelu(h) if cfg.activation == "gelu" else nn.relu(h)
        if cfg.dropout > 0 and not deterministic:
            h = nn.Dropout(cfg.dropout, deterministic=False)(h)
        l2_range = (
            cfg.layer2_initializer_range
            if cfg.layer2_initializer_range is not None
            else cfg.initializer_range
        )
        kernel_init = (
            nn.initializers.zeros
            if l2_range == 0.0
            else nn.initializers.normal(l2_range)
        )
        bias_init = nn.initializers.constant(cfg.layer2_bias_init or 0.0)
        return nn.Dense(
            cfg.output_dim,
            use_bias=cfg.use_bias,
            dtype=dtype,
            kernel_init=kernel_init,
            bias_init=bias_init,
            name="dense2",
        )(h)


def init_head_params(module: nn.Module, input_dim: int, key: jax.Array):
    variables = module.init(key, jnp.zeros((1, 1, input_dim), jnp.float32))
    return variables["params"]
