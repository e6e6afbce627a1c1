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


# ---------------------------------------------------------------------------
# Generic Markov-env variant (chess endgames, maze): per-turn (obs, act)
# windows with chain bootstrapping — next_token_ids is the NEXT turn's
# observation frame, exactly the reference's chess ILQL chain convention
# (FEN windows linked by next-state tokens, algorithms/ilql/data.py:10-79).
# ---------------------------------------------------------------------------


def markov_rollout_to_ilql_batch(out: "actor_mod.MarkovRollout") -> ILQLBatch:
    """[B, N]-turn rollout → [B*N] one-window-per-turn ILQLBatch."""
    B, N, obs_len = out.obs_tokens.shape
    act_len = out.act_tokens.shape[-1]
    W = obs_len + act_len
    windows = out.window_tokens().reshape(B * N, W)

    live = out.turn_live  # [B, N]
    sta = jnp.zeros((B, N, W - 1), bool)
    # token t+1 is an action ⇔ t ∈ [obs_len-1, W-2]; masked to live turns
    sta = sta.at[:, :, obs_len - 1 :].set(live[:, :, None])
    rewards = jnp.zeros((B, N, W - 1), jnp.float32)
    rewards = rewards.at[:, :, W - 2].set(out.turn_reward * live)

    # bootstrap chain: next turn's obs (final_obs after the last turn);
    # done when the next turn was never played
    next_obs = jnp.concatenate(
        [out.obs_tokens[:, 1:], out.final_obs[:, None, :]], axis=1
    )  # [B, N, obs_len]
    next_live = jnp.concatenate(
        [live[:, 1:], jnp.zeros((B, 1), bool)], axis=1
    )
    dones = ~next_live  # [B, N]

    return ILQLBatch(
        input_ids=windows,
        should_take_action=sta.reshape(B * N, W - 1),
        rewards=rewards.reshape(B * N, W - 1),
        dones=dones.reshape(B * N),
        next_token_ids=next_obs.reshape(B * N, obs_len),
        next_dones=dones.reshape(B * N),
    )


def online_ilql_markov(
    core: LMCore,
    q_head,
    v_head,
    state: ILQLTrainState,
    env,  # TokenVecEnv (ChessEndgameVectorEnv, MazeTokenVecEnv, ...)
    n_turns: int,
    ilql_config: ILQLConfig,
    config: OnlineDeviceConfig,
    key: jax.Array,
    mesh: Optional[Any] = None,
    pi_beta_params: Optional[Any] = None,
) -> Tuple[ILQLTrainState, list]:
    """Round-based on-device online ILQL over any Markov token env.

    pi_beta_params: optional FROZEN behavior prior. When given, decoding
    is two-trunk π_β + β·min(q1,q2) with π_β fixed (the reference's
    value_rl_base structure, generation.py:36-121) — the stable choice
    for online loops, since a shared trunk lets the ILQL objective drift
    the behavior prior off the action protocol."""
    B = config.rollout_batch
    total_len = env.OBS_LEN + env.ACT_LEN
    step_fn, carry0 = actor_mod.make_value_guided_step_fn(
        core, q_head, batch=B, two_trunks=pi_beta_params is not None,
        twin_q=True, beta=ilql_config.beta, total_len=total_len,
    )
    train_step = make_ilql_train_step(
        core, q_head, v_head, ilql_config, config.pad_token_id, mesh=mesh
    )

    history: list = []
    for rnd in range(config.n_rounds):
        key, k_reset, k_roll, k_train = jax.random.split(key, 4)
        policy_params = {
            "base": state.base.params,
            "q1": state.q1_head.params,
            "q2": state.q2_head.params,
        }
        if pi_beta_params is not None:
            policy_params["pi_beta"] = pi_beta_params
        state0 = env.reset(k_reset, B)
        out, _ = actor_mod.rollout_markov(
            env, n_turns, step_fn, policy_params, carry0, state0, k_roll,
            config.temperature, False,
        )
        batch = markov_rollout_to_ilql_batch(out)
        n_windows = batch.input_ids.shape[0]
        live_flat = out.turn_live.reshape(-1)  # [B*N] — window is live

        losses = []
        # clamp so a slice never exceeds the window pool (train_bsize >
        # n_windows would fail at trace time); remainder windows past the
        # last full minibatch are dropped for the epoch, like the
        # reference's dataloader truncation
        bs = min(config.train_bsize, n_windows)
        n = max(1, n_windows // bs)
        # cap at the live prefix: a minibatch of all-dead windows has zero
        # loss and zero grads, but adamw still applies stale-momentum +
        # weight-decay updates and the polyak target still mixes — rounds
        # where many episodes end early would apply unintended drift
        n_live = int(live_flat.sum())
        n = max(1, min(n, -(-n_live // bs)))
        for epoch in range(config.epochs_per_round):
            k_train, k_perm = jax.random.split(k_train)
            perm = jax.random.permutation(k_perm, n_windows)
            # stable-sort the shuffle so live windows come first: early
            # minibatches train on real turns; all-dead tails (episodes
            # finishing before n_turns) contribute zero loss, not NaN
            # (see ilql_loss normalizer clamp)
            perm = perm[jnp.argsort(~live_flat[perm], stable=True)]
            for i in range(n):
                idx = jax.lax.dynamic_slice_in_dim(perm, i * bs, bs)
                sub = jax.tree.map(lambda x: x[idx], batch)
                k_train, k_step = jax.random.split(k_train)
                state, loss, _ = train_step(state, sub, k_step)
                losses.append(loss)

        live = out.turn_live
        metrics: Dict[str, float] = {
            "round": rnd,
            "mean_episode_reward": float(
                (out.turn_reward * live).sum(axis=1).mean()
            ),
            "mean_turns": float(live.sum(axis=1).mean()),
            "illegal_rate": float(
                (out.turn_illegal & live).sum() / jnp.maximum(live.sum(), 1)
            ),
            "loss": float(jnp.stack(losses).mean()),
        }
        history.append(metrics)
    return state, history
