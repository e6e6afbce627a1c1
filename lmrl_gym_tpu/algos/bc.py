"""Behavior cloning: masked-LM fine-tuning.

Covers both reference BC flavors (SURVEY §2.7): single-turn prompt→action
and multi-turn whole-conversation with loss masked to action tokens
(JaxSeq GPT2TrainMask/loss_fn_mask), plus the `non_action_weight`
down-weighting of LLM_RL/algorithms/bc/core.py:27-42.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from flax.training.train_state import TrainState
from jax.sharding import Mesh, PartitionSpec as PS

from lmrl_gym_tpu.algos.losses import masked_lm_loss
from lmrl_gym_tpu.models.interface import LMCore, initialize_attn_mask_pos_ids
from lmrl_gym_tpu.parallel.mesh import with_sharding_constraint


@dataclass(frozen=True)
class BCConfig:
    non_action_weight: float = 0.0


class BCBatch(NamedTuple):
    input_ids: jax.Array  # [b, t]
    training_mask: jax.Array  # [b, t] — 1 on tokens that count


class BCTrainState(struct.PyTreeNode):
    model: TrainState


def bc_loss_from_params(
    core: LMCore,
    params: Any,
    batch: BCBatch,
    config: BCConfig,
    pad_token_id: int,
    train: bool,
    rng: Optional[jax.Array],
):
    attention_mask, position_ids = initialize_attn_mask_pos_ids(
        batch.input_ids, pad_token_id
    )
    logits, _ = core.forward(
        params, batch.input_ids, attention_mask, position_ids, train=train, rng=rng
    )
    return masked_lm_loss(
        logits[:, :-1],
        batch.input_ids[:, 1:],
        attention_mask[:, 1:].astype(jnp.float32),
        batch.training_mask[:, 1:],
        non_train_weight=config.non_action_weight,
    )


def make_bc_train_step(
    core: LMCore,
    config: BCConfig,
    pad_token_id: int,
    mesh: Optional[Mesh] = None,
) -> Callable[[BCTrainState, BCBatch, Optional[jax.Array]], Tuple[BCTrainState, jax.Array, Any]]:
    def step(state: BCTrainState, batch: BCBatch, rng: Optional[jax.Array]):
        batch = BCBatch(
            input_ids=with_sharding_constraint(
                batch.input_ids, mesh, PS(("dp", "fsdp"), None)
            ),
            training_mask=with_sharding_constraint(
                batch.training_mask, mesh, PS(("dp", "fsdp"), None)
            ),
        )

        def grad_loss(params):
            return bc_loss_from_params(
                core, params, batch, config, pad_token_id, train=True, rng=rng
            )

        (loss, logs), grads = jax.value_and_grad(grad_loss, has_aux=True)(
            state.model.params
        )
        return state.replace(model=state.model.apply_gradients(grads=grads)), loss, logs

    return jax.jit(step, donate_argnums=(0,))


def make_bc_eval_loss(
    core: LMCore, config: BCConfig, pad_token_id: int, mesh: Optional[Mesh] = None
):
    def eval_loss(state: BCTrainState, batch: BCBatch):
        return bc_loss_from_params(
            core, state.model.params, batch, config, pad_token_id, train=False, rng=None
        )

    return jax.jit(eval_loss)
