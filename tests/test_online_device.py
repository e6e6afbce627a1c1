"""On-device online ILQL loop: rollout → batch → update, all jax arrays."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lmrl_gym_tpu.algos.ilql import ILQLConfig, init_ilql_state
from lmrl_gym_tpu.envs.wordle.vector import WordleVectorEnv, WordleVocab
from lmrl_gym_tpu.loops import actor
from lmrl_gym_tpu.loops.online_device import (
    OnlineDeviceConfig,
    online_ilql_wordle,
    wordle_rollout_to_ilql_batch,
)
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params


def _setup(B=8, max_pos=None):
    config = tiny_test_config(
        max_position_embeddings=max_pos or actor.EPISODE_LEN
    )
    core = LMCore(config)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q_cfg = MLPHeadConfig(
        input_dim=config.hidden_size,
        hidden_dim=2 * config.hidden_size,
        output_dim=config.padded_vocab_size,
        layer2_initializer_range=0.0,
    )
    v_cfg = MLPHeadConfig(
        input_dim=config.hidden_size,
        hidden_dim=2 * config.hidden_size,
        output_dim=1,
        layer2_initializer_range=0.0,
    )
    q_head, v_head = MLPHead(q_cfg), MLPHead(v_cfg)
    ilql_config = ILQLConfig(use_separate_target_base=False)
    state = init_ilql_state(
        init_params(config, ks[0]),
        init_head_params(q_head, config.hidden_size, ks[1]),
        init_head_params(q_head, config.hidden_size, ks[2]),
        init_head_params(v_head, config.hidden_size, ks[3]),
        optax.adam(1e-4),
        optax.adam(1e-3),
        ilql_config,
    )
    return core, q_head, v_head, state, ilql_config


def test_rollout_to_ilql_batch_alignment():
    env = WordleVectorEnv(WordleVocab.from_file())
    core, q_head, v_head, state, _ = _setup()
    B = 4
    step_fn, carry0 = actor.make_lm_step_fn(core, B)
    out = actor.rollout_wordle(
        env, step_fn, state.base.params, carry0, jax.random.PRNGKey(1),
        jnp.zeros((B,)), 1.0, False,
    )
    batch = wordle_rollout_to_ilql_batch(out)
    assert batch.input_ids.shape == (B, actor.EPISODE_LEN)
    assert batch.should_take_action.shape == (B, actor.EPISODE_LEN - 1)
    # each live turn contributes exactly one nonzero reward at its action end
    nz = np.asarray(batch.rewards != 0).sum(axis=1)
    live = np.asarray(out.turn_live).sum(axis=1)
    # (win rewards are 0-valued; invalid/step rewards are -1)
    assert (nz <= live).all()
    # rewards only sit where should_take_action is True
    sta = np.asarray(batch.should_take_action)
    assert (np.asarray(batch.rewards)[~sta] == 0).all()


def test_online_ilql_wordle_runs_and_updates():
    env = WordleVectorEnv(WordleVocab.from_file())
    core, q_head, v_head, state, ilql_config = _setup()
    before = jax.tree.leaves(state.base.params)[0].copy()
    config = OnlineDeviceConfig(n_rounds=2, rollout_batch=8, train_bsize=4)
    state, history = online_ilql_wordle(
        core, q_head, v_head, state, env, ilql_config, config,
        jax.random.PRNGKey(0),
    )
    assert len(history) == 2
    for m in history:
        assert np.isfinite(m["loss"])
        assert -6.0 <= m["mean_episode_reward"] <= 0.0
    after = jax.tree.leaves(state.base.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_online_ilql_markov_chess_and_maze():
    """On-device online ILQL runs end-to-end on >=2 Markov envs (VERDICT
    r2 item 5): chess endgames and maze, tiny trunk, one round each."""
    import numpy as np

    from lmrl_gym_tpu.envs.chess.vector import ChessEndgameVectorEnv
    from lmrl_gym_tpu.envs.maze.grids import DOUBLE_T_GOAL, double_t_maze
    from lmrl_gym_tpu.envs.maze.vector import MazeTokenVecEnv, MazeVectorEnv
    from lmrl_gym_tpu.loops.online_device import (
        OnlineDeviceConfig,
        markov_rollout_to_ilql_batch,
        online_ilql_markov,
    )

    envs = [
        ChessEndgameVectorEnv(max_steps=4),
        MazeTokenVecEnv(
            MazeVectorEnv(
                double_t_maze(),
                valid_goals=np.asarray([DOUBLE_T_GOAL], np.int32),
                max_steps=4,
            )
        ),
    ]
    for env in envs:
        core, q_head, v_head, state, ilql_config = _setup(
            max_pos=env.OBS_LEN + env.ACT_LEN
        )
        cfg = OnlineDeviceConfig(
            n_rounds=1, rollout_batch=4, train_bsize=8, epochs_per_round=1
        )
        state, history = online_ilql_markov(
            core, q_head, v_head, state, env, 4, ilql_config, cfg,
            jax.random.PRNGKey(0),
        )
        assert len(history) == 1
        assert np.isfinite(history[0]["loss"])
        assert "illegal_rate" in history[0]


def test_markov_rollout_to_ilql_batch_alignment():
    """Window conversion: action mask covers exactly the act region of
    live turns, the turn reward lands on the final act token, and the
    bootstrap chain threads the next observation."""
    import numpy as np

    from lmrl_gym_tpu.loops import actor as actor_mod
    from lmrl_gym_tpu.loops.online_device import markov_rollout_to_ilql_batch

    B, N, OBS, ACT = 2, 3, 5, 4
    obs = jnp.arange(B * N * OBS).reshape(B, N, OBS) % 50 + 100
    act = jnp.arange(B * N * ACT).reshape(B, N, ACT) % 50 + 200
    live = jnp.asarray([[True, True, False], [True, True, True]])
    rew = jnp.asarray([[-1.0, 1.0, 0.0], [-1.0, -1.0, 0.0]])
    final_obs = jnp.full((B, OBS), 7)
    out = actor_mod.MarkovRollout(
        obs_tokens=obs, act_tokens=act, turn_reward=rew, turn_live=live,
        final_obs=final_obs,
    )
    batch = markov_rollout_to_ilql_batch(out)
    W = OBS + ACT
    assert batch.input_ids.shape == (B * N, W)
    sta = np.asarray(batch.should_take_action).reshape(B, N, W - 1)
    # live turn: positions OBS-1..W-2 flagged; dead turn: none
    assert sta[0, 0, OBS - 1 :].all() and not sta[0, 0, : OBS - 1].any()
    assert not sta[0, 2].any()
    r = np.asarray(batch.rewards).reshape(B, N, W - 1)
    assert r[0, 1, W - 2] == 1.0 and r[0, 0, W - 2] == -1.0
    assert (r[0, 2] == 0).all()
    nxt = np.asarray(batch.next_token_ids).reshape(B, N, OBS)
    np.testing.assert_array_equal(nxt[0, 0], np.asarray(obs[0, 1]))
    np.testing.assert_array_equal(nxt[1, 2], np.asarray(final_obs[1]))
    dones = np.asarray(batch.dones).reshape(B, N)
    assert (dones[0] == [False, True, True]).all()
    assert (dones[1] == [False, False, True]).all()
