"""ILQL: per-token implicit Q-learning on a transformer trunk.

Semantics of the reference ILQL stack (algorithms/ilql/base_interface.py +
algorithms/ilql/gpt2/interface.py:19-382), rebuilt as a single jit train
step over a Mesh:

- state: base TrainState (+ optional frozen target base params), q1/q2/v
  head TrainStates, q1/q2 target head params;
- forward: base hidden → q1/q2 heads (vocab-sized logits; Q(s,a) =
  logits[realized next token]), v head (scalar), target heads on the
  (target-)base hidden; v_final bootstraps from the next chain window's
  last real token, zeroed when done (gpt2/interface.py:253-273);
- update: one value_and_grad over (base, q1, q2, v) + four apply_gradients
  + Polyak/periodic target updates gated on grad-accum boundaries
  (gpt2/interface.py:292-365).

All batch inputs are sharding-constrained to PS(('dp','fsdp'), ...); the
step is donated so FSDP state is updated in place.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState
from jax.sharding import Mesh, PartitionSpec as PS

from lmrl_gym_tpu.algos.losses import ilql_loss
from lmrl_gym_tpu.core.optimizer import mini_step_of
from lmrl_gym_tpu.models.interface import LMCore, initialize_attn_mask_pos_ids
from lmrl_gym_tpu.parallel.mesh import with_sharding_constraint


@dataclass(frozen=True)
class ILQLConfig:
    gamma: float = 0.99
    tau: float = 0.7
    cql_weight: float = 0.01
    beta: float = 8.0  # decode-time advantage weight (policy layer)
    polyak_alpha: float = 0.005
    hard_update_every: Optional[int] = None
    use_separate_target_base: bool = True
    detach_q1: bool = False
    detach_q2: bool = False
    detach_v: bool = False
    # train heads on a STOP-GRADIENT view of the trunk features (base
    # receives zero gradient; pair with a zero/no-op base optimizer).
    # Stabilizer for high-capacity trunks: Bellman noise backpropagating
    # into a shared 124M-param trunk drives Q/V/target oscillation
    # (measured on the GPT-2-small maze gate, PERF_NOTES r4); frozen
    # features keep the fixed-point iteration on the heads only.
    freeze_base: bool = False

    def to_dict(self) -> dict:
        import dataclasses

        return dataclasses.asdict(self)


class ILQLBatch(NamedTuple):
    """One blocked training batch (cf. algorithms/ilql/data.py:10-79)."""

    input_ids: jax.Array  # [b, t]
    should_take_action: jax.Array  # [b, t-1]
    rewards: jax.Array  # [b, t-1]
    dones: jax.Array  # [b]
    next_token_ids: Optional[jax.Array]  # [b, nt] or None
    next_dones: Optional[jax.Array]  # [b] or None


class ILQLTrainState(struct.PyTreeNode):
    base: TrainState
    target_base_params: Optional[Any]
    q1_head: TrainState
    q2_head: TrainState
    v_head: TrainState
    q1_target_params: Any
    q2_target_params: Any


def init_ilql_state(
    base_params: Any,
    q1_params: Any,
    q2_params: Any,
    v_params: Any,
    base_tx: optax.GradientTransformation,
    head_tx: optax.GradientTransformation,
    config: ILQLConfig,
) -> ILQLTrainState:
    copy = lambda t: jax.tree.map(jnp.array, t)
    return ILQLTrainState(
        base=TrainState.create(apply_fn=None, params=base_params, tx=base_tx),
        target_base_params=copy(base_params) if config.use_separate_target_base else None,
        q1_head=TrainState.create(apply_fn=None, params=q1_params, tx=head_tx),
        q2_head=TrainState.create(apply_fn=None, params=q2_params, tx=head_tx),
        v_head=TrainState.create(apply_fn=None, params=v_params, tx=head_tx),
        q1_target_params=copy(q1_params),
        q2_target_params=copy(q2_params),
    )


def ilql_forward(
    core: LMCore,
    q_head: nn.Module,
    v_head: nn.Module,
    base_params: Any,
    target_base_params: Optional[Any],
    q1_params: Any,
    q2_params: Any,
    v_params: Any,
    q1_target_params: Any,
    q2_target_params: Any,
    batch: ILQLBatch,
    config: ILQLConfig,
    pad_token_id: int,
    train: bool,
    rng: Optional[jax.Array],
) -> Tuple[jax.Array, Any]:
    """Runs all forwards and computes the ILQL loss."""
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
    if config.freeze_base:
        hidden = jax.lax.stop_gradient(hidden)
    if target_base_params is not None:
        _, target_hidden = core.forward(
            target_base_params, input_ids, attention_mask, position_ids,
            train=train, rng=split(),
        )
        target_hidden = jax.lax.stop_gradient(target_hidden)
    else:
        target_hidden = hidden

    def head(mod, params, h):
        k = split()
        return mod.apply(
            {"params": params}, h, deterministic=not train,
            **({"rngs": {"dropout": k}} if (train and k is not None) else {}),
        )

    q1_out = head(q_head, q1_params, hidden)  # [b, t, V]
    q2_out = head(q_head, q2_params, hidden)
    v_out = head(v_head, v_params, hidden)  # [b, t, 1]
    tq1_out = jax.lax.stop_gradient(head(q_head, q1_target_params, target_hidden))
    tq2_out = jax.lax.stop_gradient(head(q_head, q2_target_params, target_hidden))

    if config.detach_q1:
        q1_out = jax.lax.stop_gradient(q1_out)
    if config.detach_q2:
        q2_out = jax.lax.stop_gradient(q2_out)
    if config.detach_v:
        v_out = jax.lax.stop_gradient(v_out)

    nxt = input_ids[:, 1:][..., None]
    q1 = jnp.take_along_axis(q1_out[:, :-1], nxt, axis=2).squeeze(2)
    q2 = jnp.take_along_axis(q2_out[:, :-1], nxt, axis=2).squeeze(2)
    target_q1 = jnp.take_along_axis(tq1_out[:, :-1], nxt, axis=2).squeeze(2)
    target_q2 = jnp.take_along_axis(tq2_out[:, :-1], nxt, axis=2).squeeze(2)
    v_full = v_out.squeeze(2)
    v = v_full[:, :-1]

    # ---- v_final bootstrap (gpt2/interface.py:253-273) ----
    b = input_ids.shape[0]
    if batch.next_token_ids is not None:
        next_mask, next_pos = initialize_attn_mask_pos_ids(batch.next_token_ids, pad_token_id)
        _, next_hidden = core.forward(
            base_params, batch.next_token_ids, next_mask, next_pos,
            train=train, rng=split(),
        )
        last_idx = (next_mask.shape[1] - 1) - jnp.argmax(
            jnp.flip(next_mask, axis=1).astype(jnp.int32), axis=1
        )
        final_h = next_hidden[jnp.arange(b), last_idx]
        v_final = head(v_head, v_params, final_h[:, None, :]).squeeze((1, 2))
        v_final = v_final * (1 - batch.next_dones.astype(jnp.float32))
    else:
        sta = batch.should_take_action
        last_action_idx = (
            (sta.shape[1] - 1)
            - jnp.argmax(jnp.flip(sta, axis=1).astype(jnp.int32), axis=1)
            + 1
        )
        last_token_idx = (attention_mask.shape[1] - 1) - jnp.argmax(
            jnp.flip(attention_mask, axis=1).astype(jnp.int32), axis=1
        )
        dones_f = batch.dones.astype(jnp.float32)
        final_idx = ((1 - dones_f) * last_action_idx + dones_f * last_token_idx).astype(jnp.int32)
        v_final = v_full[jnp.arange(b), final_idx] * (1 - dones_f)
    v_final = jax.lax.stop_gradient(v_final)

    return ilql_loss(
        q1,
        q2,
        v,
        v_final,
        target_q1,
        target_q2,
        q1_out[:, :-1].astype(jnp.float32),
        q2_out[:, :-1].astype(jnp.float32),
        input_ids[:, 1:],
        attention_mask[:, 1:].astype(jnp.float32),
        batch.should_take_action,
        batch.rewards,
        gamma=config.gamma,
        tau=config.tau,
        cql_weight=config.cql_weight,
    )


def make_ilql_train_step(
    core: LMCore,
    q_head: nn.Module,
    v_head: nn.Module,
    config: ILQLConfig,
    pad_token_id: int,
    mesh: Optional[Mesh] = None,
) -> Callable[[ILQLTrainState, ILQLBatch, Optional[jax.Array]], Tuple[ILQLTrainState, jax.Array, Any]]:
    """jit step with donated train state (the hot loop)."""

    def constrain(x, extra_dims=1):
        return with_sharding_constraint(x, mesh, PS(("dp", "fsdp"), *([None] * extra_dims)))

    def step(state: ILQLTrainState, batch: ILQLBatch, rng: Optional[jax.Array]):
        batch = ILQLBatch(
            input_ids=constrain(batch.input_ids),
            should_take_action=constrain(batch.should_take_action),
            rewards=constrain(batch.rewards),
            dones=constrain(batch.dones, 0),
            next_token_ids=None if batch.next_token_ids is None else constrain(batch.next_token_ids),
            next_dones=None if batch.next_dones is None else constrain(batch.next_dones, 0),
        )

        def grad_loss(base_params, q1_params, q2_params, v_params):
            return ilql_forward(
                core, q_head, v_head,
                base_params, state.target_base_params,
                q1_params, q2_params, v_params,
                state.q1_target_params, state.q2_target_params,
                batch, config, pad_token_id, train=True, rng=rng,
            )

        (loss, logs), grads = jax.value_and_grad(grad_loss, argnums=(0, 1, 2, 3), has_aux=True)(
            state.base.params,
            state.q1_head.params,
            state.q2_head.params,
            state.v_head.params,
        )
        base_grads, q1_grads, q2_grads, v_grads = grads

        new_base = state.base.apply_gradients(grads=base_grads)
        new_q1 = state.q1_head.apply_gradients(grads=q1_grads)
        new_q2 = state.q2_head.apply_gradients(grads=q2_grads)
        new_v = state.v_head.apply_gradients(grads=v_grads)

        # targets: Polyak each real update (skip grad-accum microsteps),
        # optional periodic hard update (gpt2/interface.py:326-365)
        def update_targets(params, target, steps):
            target = optax.incremental_update(params, target, config.polyak_alpha)
            if config.hard_update_every is not None:
                target = optax.periodic_update(params, target, steps, config.hard_update_every)
            return target

        def gated_update(train_state: TrainState, target):
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

        new_target_base = (
            gated_update(new_base, state.target_base_params)
            if state.target_base_params is not None
            else None
        )
        new_q1_target = gated_update(new_q1, state.q1_target_params)
        new_q2_target = gated_update(new_q2, state.q2_target_params)

        new_state = ILQLTrainState(
            base=new_base,
            target_base_params=new_target_base,
            q1_head=new_q1,
            q2_head=new_q2,
            v_head=new_v,
            q1_target_params=new_q1_target,
            q2_target_params=new_q2_target,
        )
        return new_state, loss, logs

    return jax.jit(step, donate_argnums=(0,))


def make_ilql_eval_loss(
    core: LMCore,
    q_head: nn.Module,
    v_head: nn.Module,
    config: ILQLConfig,
    pad_token_id: int,
    mesh: Optional[Mesh] = None,
):
    def eval_loss(state: ILQLTrainState, batch: ILQLBatch):
        return ilql_forward(
            core, q_head, v_head,
            state.base.params, state.target_base_params,
            state.q1_head.params, state.q2_head.params, state.v_head.params,
            state.q1_target_params, state.q2_target_params,
            batch, config, pad_token_id, train=False, rng=None,
        )

    return jax.jit(eval_loss)
