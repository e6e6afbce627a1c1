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


def _setup(B=8):
    config = tiny_test_config(max_position_embeddings=actor.EPISODE_LEN)
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
