"""Fully on-device online RL: fused actor rollouts feeding ILQL/MC updates.

The reference's online loop ping-pongs per turn between host env logic and
device generation, then rebuilds datasets on host (algorithms/ppo/train.py
round loop). Here a round is: one compiled actor rollout (loops/actor.py)
producing device-resident token trajectories → ILQL batches sliced on
device → compiled train steps. The only host involvement is loop control
and metric fetches (SURVEY.md §7 item 6: env-sharded actors feeding an
on-device learner without host round-trips).

The decode policy is the shared-trunk β-perturbed policy over the LIVE
learner params (base + min(q1,q2) heads), so each round's rollouts are
on-policy for the current checkpoint — the reference achieves the same by
re-loading inference params every round (ppo/train.py:434-438); here it is
free because params are arguments, not baked state.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lmrl_gym_tpu.algos.ilql import (
    ILQLBatch,
    ILQLConfig,
    ILQLTrainState,
    make_ilql_train_step,
)
from lmrl_gym_tpu.envs.wordle.vector import WordleVectorEnv
from lmrl_gym_tpu.loops import actor as actor_mod
from lmrl_gym_tpu.models.interface import LMCore


def wordle_rollout_to_ilql_batch(out: actor_mod.WordleRollout) -> ILQLBatch:
    """Device-resident rollout → ILQLBatch (single-window episodes: the
    128-token Wordle episode fits one context, so no chain bootstrap)."""
    return ILQLBatch(
        input_ids=out.tokens,
        should_take_action=out.token_action_mask()[:, 1:],
        rewards=out.token_rewards()[:, 1:],
        dones=jnp.ones(out.tokens.shape[:1], bool),
        next_token_ids=None,
        next_dones=None,
    )


@dataclass
class OnlineDeviceConfig:
    n_rounds: int = 4
    rollout_batch: int = 256
    train_bsize: int = 64
    epochs_per_round: int = 1
    temperature: float = 1.0
    pad_token_id: int = 256


def online_ilql_wordle(
    core: LMCore,
    q_head,
    v_head,
    state: ILQLTrainState,
    env: WordleVectorEnv,
    ilql_config: ILQLConfig,
    config: OnlineDeviceConfig,
    key: jax.Array,
    mesh: Optional[Any] = None,
) -> Tuple[ILQLTrainState, list]:
    """Round-based online ILQL, rollouts and updates both on device.

    Returns (final_state, per-round metrics list).
    """
    B = config.rollout_batch
    step_fn, carry0 = actor_mod.make_value_guided_step_fn(
        core,
        q_head,
        batch=B,
        two_trunks=False,
        twin_q=True,
        beta=ilql_config.beta,
    )
    train_step = make_ilql_train_step(
        core, q_head, v_head, ilql_config, config.pad_token_id, mesh=mesh
    )
    holder = jnp.zeros((B,))

    history: list = []
    for rnd in range(config.n_rounds):
        key, k_roll, k_train = jax.random.split(key, 3)
        policy_params = {
            "base": state.base.params,
            "q1": state.q1_head.params,
            "q2": state.q2_head.params,
        }
        out = actor_mod.rollout_wordle(
            env, step_fn, policy_params, carry0, k_roll, holder,
            config.temperature, False,
        )
        batch = wordle_rollout_to_ilql_batch(out)

        losses = []
        n = B // config.train_bsize
        for epoch in range(config.epochs_per_round):
            k_train, k_perm = jax.random.split(k_train)
            perm = jax.random.permutation(k_perm, B)
            for i in range(n):
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, i * config.train_bsize, config.train_bsize
                )
                sub = ILQLBatch(
                    input_ids=batch.input_ids[idx],
                    should_take_action=batch.should_take_action[idx],
                    rewards=batch.rewards[idx],
                    dones=batch.dones[idx],
                    next_token_ids=None,
                    next_dones=None,
                )
                k_train, k_step = jax.random.split(k_train)
                state, loss, _ = train_step(state, sub, k_step)
                losses.append(loss)

        metrics: Dict[str, float] = {
            "round": rnd,
            "mean_episode_reward": float(
                (out.turn_reward * out.turn_live).sum(axis=1).mean()
            ),
            "win_rate": float(out.win.mean()),
            "mean_turns": float(out.n_turns.mean()),
            "loss": float(jnp.stack(losses).mean()),
        }
        history.append(metrics)
    return state, history
