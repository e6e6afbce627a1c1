"""Fused actor under a data-parallel mesh: envs shard over 'dp' and the
whole rollout (decode + env stepping) partitions via GSPMD — the
BASELINE 'envs sharded over hosts feeding a sharded learner' shape,
exercised on the virtual 8-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as PS

from lmrl_gym_tpu.envs.wordle.vector import WordleVectorEnv, WordleVocab
from lmrl_gym_tpu.loops import actor
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.parallel.mesh import load_mesh


def test_rollout_shards_over_dp_mesh():
    mesh = load_mesh((-1, 1, 1), ("dp", "fsdp", "mp"))
    env = WordleVectorEnv(WordleVocab.from_file())
    config = tiny_test_config(max_position_embeddings=actor.EPISODE_LEN)
    core = LMCore(config)
    params = init_params(config, jax.random.PRNGKey(0))
    B = 16  # 2 envs per device

    step_fn, carry0 = actor.make_lm_step_fn(core, B)
    batch_sharding = NamedSharding(mesh, PS("dp"))
    replicated = NamedSharding(mesh, PS())
    holder = jax.device_put(jnp.zeros((B,)), batch_sharding)
    params = jax.device_put(params, replicated)
    carry0 = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, PS("dp") if x.ndim >= 2 else PS())
        ),
        carry0,
    )  # KVCache per-layer [B, H, T, Dh] buffers: batch axis (0) over dp

    out = actor.rollout_wordle(
        env, step_fn, params, carry0, jax.random.PRNGKey(1), holder, 1.0, False
    )
    assert out.tokens.shape == (B, actor.EPISODE_LEN)
    # results must be batch-sharded, not gathered to one device
    assert len(out.tokens.sharding.device_set) == len(mesh.devices.flat)

    # and identical to the unsharded run (GSPMD must not change semantics)
    step1, carry1 = actor.make_lm_step_fn(core, B)
    ref = actor.rollout_wordle(
        env, step1, jax.device_get(params), jax.device_get(carry1),
        jax.random.PRNGKey(1), jnp.zeros((B,)), 1.0, False,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(
        np.asarray(out.turn_reward), np.asarray(ref.turn_reward)
    )


def test_markov_rollout_shards_over_dp_mesh():
    """The generic Markov actor (chess endgames) under a dp mesh: envs
    shard over 'dp', results stay batch-sharded, semantics match the
    unsharded run exactly."""
    from lmrl_gym_tpu.envs.chess.vector import ChessEndgameVectorEnv

    mesh = load_mesh((-1, 1, 1), ("dp", "fsdp", "mp"))
    env = ChessEndgameVectorEnv(max_steps=3)
    config = tiny_test_config(
        max_position_embeddings=env.OBS_LEN + env.ACT_LEN
    )
    core = LMCore(config)
    params = init_params(config, jax.random.PRNGKey(0))
    B, N = 16, 3
    step_fn, carry0 = actor.make_lm_step_fn(
        core, B, total_len=env.OBS_LEN + env.ACT_LEN
    )
    state0 = env.reset(jax.random.PRNGKey(1), B)

    batch_sharding = NamedSharding(mesh, PS("dp"))
    replicated = NamedSharding(mesh, PS())
    sh_params = jax.device_put(params, replicated)
    sh_carry = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, PS("dp") if x.ndim >= 2 else PS())
        ),
        carry0,
    )
    sh_state = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding), state0
    )
    out, final = actor.rollout_markov(
        env, N, step_fn, sh_params, sh_carry, sh_state, jax.random.PRNGKey(2)
    )
    assert out.obs_tokens.shape == (B, N, env.OBS_LEN)
    assert len(out.act_tokens.sharding.device_set) == len(mesh.devices.flat)

    ref_out, ref_final = actor.rollout_markov(
        env, N, step_fn, params, jax.device_get(carry0), state0,
        jax.random.PRNGKey(2),
    )
    np.testing.assert_array_equal(
        np.asarray(out.act_tokens), np.asarray(ref_out.act_tokens)
    )
    np.testing.assert_allclose(
        np.asarray(out.turn_reward), np.asarray(ref_out.turn_reward)
    )
