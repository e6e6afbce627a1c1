"""MC-returns: reward-to-go Q regression (single Q head + CQL).

Parity with algorithms/mc_returns/{base_interface,data}.py: Q(s,a) at the
realized token gathered from vocab-sized Q-head logits, regressed onto
the chain-level discounted reward-to-go.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct
from flax.training.train_state import TrainState
from jax.sharding import Mesh, PartitionSpec as PS

from lmrl_gym_tpu.algos.losses import mc_loss
from lmrl_gym_tpu.models.interface import LMCore, initialize_attn_mask_pos_ids
from lmrl_gym_tpu.parallel.mesh import with_sharding_constraint


@dataclass(frozen=True)
class MCConfig:
    gamma: float = 0.99
    cql_weight: float = 0.01
    beta: float = 8.0  # decode-time weight (policy layer)


class MCBatch(NamedTuple):
    input_ids: jax.Array  # [b, t]
    should_take_action: jax.Array  # [b, t-1]
    returns: jax.Array  # [b, t-1]


class MCTrainState(struct.PyTreeNode):
    base: TrainState
    q_head: TrainState


def mc_loss_from_params(
    core: LMCore,
    q_head: nn.Module,
    base_params: Any,
    q_params: Any,
    batch: MCBatch,
    config: MCConfig,
    pad_token_id: int,
    train: bool,
    rng: Optional[jax.Array],
):
    attention_mask, position_ids = initialize_attn_mask_pos_ids(
        batch.input_ids, pad_token_id
    )
    if rng is not None:
        rng, base_rng, head_rng = jax.random.split(rng, 3)
    else:
        base_rng = head_rng = None
    _, hidden = core.forward(
        base_params, batch.input_ids, attention_mask, position_ids,
        train=train, rng=base_rng,
    )
    q_out = q_head.apply(
        {"params": q_params}, hidden, deterministic=not train,
        **({"rngs": {"dropout": head_rng}} if (train and head_rng is not None) else {}),
    )  # [b, t, V]
    q = jnp.take_along_axis(
        q_out[:, :-1], batch.input_ids[:, 1:][..., None], axis=2
    ).squeeze(2)
    return mc_loss(
        q=q,
        q_logits=q_out[:, :-1].astype(jnp.float32),
        token_ids=batch.input_ids[:, 1:],
        attention_mask=attention_mask[:, 1:].astype(jnp.float32),
        should_take_action=batch.should_take_action,
        returns=batch.returns,
        cql_weight=config.cql_weight,
    )


def make_mc_train_step(
    core: LMCore,
    q_head: nn.Module,
    config: MCConfig,
    pad_token_id: int,
    mesh: Optional[Mesh] = None,
) -> Callable[[MCTrainState, MCBatch, Optional[jax.Array]], Tuple[MCTrainState, jax.Array, Any]]:
    def step(state: MCTrainState, batch: MCBatch, rng: Optional[jax.Array]):
        batch = MCBatch(
            *(
                with_sharding_constraint(x, mesh, PS(("dp", "fsdp"), None))
                for x in batch
            )
        )

        def grad_loss(base_params, q_params):
            return mc_loss_from_params(
                core, q_head, base_params, q_params, batch, config,
                pad_token_id, train=True, rng=rng,
            )

        (loss, logs), (base_grads, q_grads) = jax.value_and_grad(
            grad_loss, argnums=(0, 1), has_aux=True
        )(state.base.params, state.q_head.params)
        return (
            state.replace(
                base=state.base.apply_gradients(grads=base_grads),
                q_head=state.q_head.apply_gradients(grads=q_grads),
            ),
            loss,
            logs,
        )

    return jax.jit(step, donate_argnums=(0,))


def make_mc_eval_loss(
    core: LMCore,
    q_head: nn.Module,
    config: MCConfig,
    pad_token_id: int,
    mesh: Optional[Mesh] = None,
):
    def eval_loss(state: MCTrainState, batch: MCBatch):
        return mc_loss_from_params(
            core, q_head, state.base.params, state.q_head.params, batch,
            config, pad_token_id, train=False, rng=None,
        )

    return jax.jit(eval_loss)
