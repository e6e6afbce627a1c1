"""CQL: SARSA-style conservative Q-learning (ILQL minus the V head).

Loss parity with algorithms/cql/base_interface.py:29-120. The reference's
only model binding (cql/gptj/interface.py) is vestigial and internally
inconsistent — it invokes the ILQL loss signature and feeds an un-gathered
[b,vocab] head output as the scalar bootstrap (interface.py:236-247), and
cql/data.py + cql/train.py are empty (SURVEY §2.7). This implementation
keeps the documented cql_loss semantics (Bellman target = r + γ·min over
*target Q at the next action position*) and makes a principled choice for
the endpoint bootstrap the reference leaves broken: max-vocab target-Q at
the next window's first-state last token (a Q-learning-style bootstrap,
since the next window's realized action token is by construction not part
of next_token_ids), zeroed when done.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState
from jax.sharding import Mesh, PartitionSpec as PS

from lmrl_gym_tpu.algos.losses import cql_loss
from lmrl_gym_tpu.algos.ilql import ILQLBatch  # same batch layout
from lmrl_gym_tpu.core.optimizer import mini_step_of
from lmrl_gym_tpu.models.interface import LMCore, initialize_attn_mask_pos_ids
from lmrl_gym_tpu.parallel.mesh import with_sharding_constraint


@dataclass(frozen=True)
class CQLConfig:
    gamma: float = 0.99
    cql_weight: float = 0.01
    beta: float = 8.0
    polyak_alpha: float = 0.005
    hard_update_every: Optional[int] = None
    use_separate_target_base: bool = True

    def to_dict(self) -> dict:
        import dataclasses

        return dataclasses.asdict(self)


class CQLTrainState(struct.PyTreeNode):
    base: TrainState
    target_base_params: Optional[Any]
    q1_head: TrainState
    q2_head: TrainState
    q1_target_params: Any
    q2_target_params: Any


def init_cql_state(
    base_params: Any,
    q1_params: Any,
    q2_params: Any,
    base_tx: optax.GradientTransformation,
    head_tx: optax.GradientTransformation,
    config: CQLConfig,
) -> CQLTrainState:
    copy = lambda t: jax.tree.map(jnp.array, t)
    return CQLTrainState(
        base=TrainState.create(apply_fn=None, params=base_params, tx=base_tx),
        target_base_params=copy(base_params) if config.use_separate_target_base else None,
        q1_head=TrainState.create(apply_fn=None, params=q1_params, tx=head_tx),
        q2_head=TrainState.create(apply_fn=None, params=q2_params, tx=head_tx),
        q1_target_params=copy(q1_params),
        q2_target_params=copy(q2_params),
    )


def cql_forward(
    core: LMCore,
    q_head: nn.Module,
    base_params: Any,
    target_base_params: Optional[Any],
    q1_params: Any,
    q2_params: Any,
    q1_target_params: Any,
    q2_target_params: Any,
    batch: ILQLBatch,
    config: CQLConfig,
    pad_token_id: int,
    train: bool,
    rng: Optional[jax.Array],
):
    input_ids = batch.input_ids
    attention_mask, position_ids = initialize_attn_mask_pos_ids(input_ids, pad_token_id)

    def split():
        nonlocal rng
        if rng is None:
            return None
        rng, k = jax.random.split(rng)
        return k

    _, hidden = core.forward(
        base_params, input_ids, attention_mask, position_ids, train=train, rng=split()
    )
    if target_base_params is not None:
        _, target_hidden = core.forward(
            target_base_params, input_ids, attention_mask, position_ids,
            train=train, rng=split(),
        )
        target_hidden = jax.lax.stop_gradient(target_hidden)
    else:
        target_hidden = hidden

    def head(params, h):
        k = split()
        return q_head.apply(
            {"params": params}, h, deterministic=not train,
            **({"rngs": {"dropout": k}} if (train and k is not None) else {}),
        )

    q1_out = head(q1_params, hidden)
    q2_out = head(q2_params, hidden)
    tq1_out = jax.lax.stop_gradient(head(q1_target_params, target_hidden))
    tq2_out = jax.lax.stop_gradient(head(q2_target_params, target_hidden))

    nxt = input_ids[:, 1:][..., None]
    q1 = jnp.take_along_axis(q1_out[:, :-1], nxt, axis=2).squeeze(2)
    q2 = jnp.take_along_axis(q2_out[:, :-1], nxt, axis=2).squeeze(2)
    target_q1 = jnp.take_along_axis(tq1_out[:, :-1], nxt, axis=2).squeeze(2)
    target_q2 = jnp.take_along_axis(tq2_out[:, :-1], nxt, axis=2).squeeze(2)

    # bootstrap: max-Q over vocab at the next window's first state's last
    # real token (the "next action" Q for the SARSA endpoint), zeroed when
    # done. With no next window, bootstrap from this window's final state.
    b = input_ids.shape[0]
    if batch.next_token_ids is not None:
        next_mask, next_pos = initialize_attn_mask_pos_ids(batch.next_token_ids, pad_token_id)
        base_for_target = target_base_params if target_base_params is not None else base_params
        _, next_hidden = core.forward(
            base_for_target, batch.next_token_ids, next_mask, next_pos,
            train=train, rng=split(),
        )
        next_hidden = jax.lax.stop_gradient(next_hidden)
        last_idx = (next_mask.shape[1] - 1) - jnp.argmax(
            jnp.flip(next_mask, axis=1).astype(jnp.int32), axis=1
        )
        final_h = next_hidden[jnp.arange(b), last_idx][:, None, :]
        tq1_final = jax.lax.stop_gradient(head(q1_target_params, final_h)).max(axis=-1).squeeze(1)
        tq2_final = jax.lax.stop_gradient(head(q2_target_params, final_h)).max(axis=-1).squeeze(1)
        live = 1 - batch.next_dones.astype(jnp.float32)
        tq1_final = tq1_final * live
        tq2_final = tq2_final * live
    else:
        last_token_idx = (attention_mask.shape[1] - 1) - jnp.argmax(
            jnp.flip(attention_mask, axis=1).astype(jnp.int32), axis=1
        )
        live = 1 - batch.dones.astype(jnp.float32)
        tq1_final = tq1_out.max(axis=-1)[jnp.arange(b), last_token_idx] * live
        tq2_final = tq2_out.max(axis=-1)[jnp.arange(b), last_token_idx] * live

    return cql_loss(
        q1,
        q2,
        target_q1,
        target_q2,
        tq1_final,
        tq2_final,
        q1_out[:, :-1].astype(jnp.float32),
        q2_out[:, :-1].astype(jnp.float32),
        input_ids[:, 1:],
        attention_mask[:, 1:].astype(jnp.float32),
        batch.should_take_action,
        batch.rewards,
        gamma=config.gamma,
        cql_weight=config.cql_weight,
    )


def make_cql_train_step(
    core: LMCore,
    q_head: nn.Module,
    config: CQLConfig,
    pad_token_id: int,
    mesh: Optional[Mesh] = None,
):
    def step(state: CQLTrainState, batch: ILQLBatch, rng: Optional[jax.Array]):
        def c(x, extra=1):
            return (
                None
                if x is None
                else with_sharding_constraint(x, mesh, PS(("dp", "fsdp"), *([None] * extra)))
            )

        batch = ILQLBatch(
            c(batch.input_ids),
            c(batch.should_take_action),
            c(batch.rewards),
            c(batch.dones, 0),
            c(batch.next_token_ids),
            c(batch.next_dones, 0),
        )

        def grad_loss(base_params, q1_params, q2_params):
            return cql_forward(
                core, q_head,
                base_params, state.target_base_params,
                q1_params, q2_params,
                state.q1_target_params, state.q2_target_params,
                batch, config, pad_token_id, train=True, rng=rng,
            )

        (loss, logs), (bg, q1g, q2g) = jax.value_and_grad(
            grad_loss, argnums=(0, 1, 2), has_aux=True
        )(state.base.params, state.q1_head.params, state.q2_head.params)

        new_base = state.base.apply_gradients(grads=bg)
        new_q1 = state.q1_head.apply_gradients(grads=q1g)
        new_q2 = state.q2_head.apply_gradients(grads=q2g)

        def update_targets(params, target, steps):
            target = optax.incremental_update(params, target, config.polyak_alpha)
            if config.hard_update_every is not None:
                target = optax.periodic_update(params, target, steps, config.hard_update_every)
            return target

        def gated(train_state: TrainState, target):
            mini = mini_step_of(train_state.opt_state)
            if mini is None:
                return update_targets(train_state.params, target, train_state.step)
            return jax.lax.cond(
                mini == 0,
                lambda p, t, s: update_targets(p, t, s),
                lambda p, t, s: t,
                train_state.params,
                target,
                train_state.step,
            )

        return (
            CQLTrainState(
                base=new_base,
                target_base_params=(
                    gated(new_base, state.target_base_params)
                    if state.target_base_params is not None
                    else None
                ),
                q1_head=new_q1,
                q2_head=new_q2,
                q1_target_params=gated(new_q1, state.q1_target_params),
                q2_target_params=gated(new_q2, state.q2_target_params),
            ),
            loss,
            logs,
        )

    return jax.jit(step, donate_argnums=(0,))
