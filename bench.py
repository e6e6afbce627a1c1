"""Benchmark: batched Wordle env-steps/s/chip (BASELINE.json north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured/10,000 — the north-star target of ≥10k batched
env-steps/s/chip on Wordle (BASELINE.md). Runs full 6-turn episodes of the
vectorized knowledge-state Wordle under one compiled lax.scan with the
random-consistent-guess policy (both policy and env on device).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_ilql():
    """Secondary metric (BENCH_MODE=ilql): ILQL updates/s on GPT-2-small-
    class model, batch 32 × seq 160 — the BASELINE 'ILQL updates/s (GPT-2)'
    row (no reference number exists; measured for the record)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lmrl_gym_tpu.algos.ilql import (
        ILQLBatch,
        ILQLConfig,
        init_ilql_state,
        make_ilql_train_step,
    )
    from lmrl_gym_tpu.models.config import TransformerConfig
    from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.models.transformer import init_params

    B = int(os.environ.get("BENCH_BATCH", 32))
    T = int(os.environ.get("BENCH_SEQ", 160))
    REPS = int(os.environ.get("BENCH_REPS", 20))

    config = TransformerConfig(
        vocab_size=259,
        hidden_size=768,
        num_layers=12,
        num_heads=12,
        max_position_embeddings=1024,
        pad_vocab_to_multiple=64,
        embd_pdrop=0.0,
        resid_pdrop=0.0,
        attn_pdrop=0.0,
    )
    core = LMCore(config)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
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
    ilql_config = ILQLConfig()
    state = init_ilql_state(
        init_params(config, ks[0]),
        init_head_params(q_head, config.hidden_size, ks[1]),
        init_head_params(q_head, config.hidden_size, ks[2]),
        init_head_params(v_head, config.hidden_size, ks[3]),
        optax.adamw(1e-4),
        optax.adamw(1e-3),
        ilql_config,
    )
    step = make_ilql_train_step(core, q_head, v_head, ilql_config, pad_token_id=256)

    rng = np.random.default_rng(0)
    sta = np.zeros((B, T - 1), bool)
    sta[:, 1::2] = True
    batch = ILQLBatch(
        input_ids=jnp.asarray(rng.integers(1, 256, (B, T)), jnp.int32),
        should_take_action=jnp.asarray(sta),
        rewards=jnp.asarray(-1.0 * sta, jnp.float32),
        dones=jnp.zeros((B,), bool),
        next_token_ids=jnp.asarray(rng.integers(1, 256, (B, 16)), jnp.int32),
        next_dones=jnp.ones((B,), bool),
    )
    state, loss, _ = step(state, batch, jax.random.PRNGKey(1))  # compile
    float(loss)  # full host sync (block_until_ready alone is unreliable
    # on some experimental backends — a value fetch cannot return early)
    t0 = time.perf_counter()
    for i in range(REPS):
        state, loss, _ = step(state, batch, jax.random.PRNGKey(i))
    float(loss)  # timed window ends at an actual value fetch
    dt = time.perf_counter() - t0
    updates_per_s = REPS / dt
    print(
        json.dumps(
            {
                "metric": "ilql_updates_per_s_gpt2small",
                "value": round(updates_per_s, 3),
                "unit": "updates/s",
                "vs_baseline": round(updates_per_s, 3),
            }
        )
    )


def bench_actor():
    """Secondary metric (BENCH_MODE=actor): fused LM-policy rollout —
    GPT-2-small decoding full Wordle episodes with the vectorized env
    inside one jit (loops/actor.py). Reports LM-in-the-loop env-steps/s
    and decoded tokens/s."""
    import jax
    import jax.numpy as jnp

    from lmrl_gym_tpu.envs.wordle.vector import N_TRIES, WordleVectorEnv, WordleVocab
    from lmrl_gym_tpu.loops import actor
    from lmrl_gym_tpu.models.config import gpt2_small
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.models.transformer import init_params

    B = int(os.environ.get("BENCH_BATCH", 512))
    REPS = int(os.environ.get("BENCH_REPS", 5))

    env = WordleVectorEnv(WordleVocab.from_file())
    config = gpt2_small().replace(
        vocab_size=512, pad_vocab_to_multiple=128,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
    )
    core = LMCore(config)
    params = init_params(config, jax.random.PRNGKey(0))
    step_fn, carry0 = actor.make_lm_step_fn(core, B)
    holder = jnp.zeros((B,))

    out = actor.rollout_wordle(env, step_fn, params, carry0, jax.random.PRNGKey(0), holder)
    float(out.turn_reward.sum())  # sync

    t0 = time.perf_counter()
    for i in range(REPS):
        out = actor.rollout_wordle(
            env, step_fn, params, carry0, jax.random.PRNGKey(i + 1), holder
        )
        float(out.turn_reward.sum())
    dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    env_steps = B * N_TRIES * REPS / dt / n_chips
    tok_s = B * actor.EPISODE_LEN * REPS / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "wordle_fused_lm_actor_env_steps_per_s_per_chip",
                "value": round(env_steps, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(env_steps / 10_000.0, 3),
                "tokens_per_s_per_chip": round(tok_s, 1),
            }
        )
    )


def main():
    if os.environ.get("BENCH_MODE") == "ilql":
        bench_ilql()
        return
    if os.environ.get("BENCH_MODE") == "actor":
        bench_actor()
        return
    import jax

    from lmrl_gym_tpu.envs.wordle.vector import (
        N_TRIES,
        WordleVectorEnv,
        WordleVocab,
    )

    B = int(os.environ.get("BENCH_BATCH", 8192))
    REPS = int(os.environ.get("BENCH_REPS", 20))

    vocab = WordleVocab.from_file()
    env = WordleVectorEnv(vocab)
    holder = env.reset(B)

    # warmup/compile
    key = jax.random.PRNGKey(0)
    state, total, wins = env.rollout_episodes(key, holder)
    float(total.sum())  # full host sync (value fetch; see bench_ilql note)

    t0 = time.perf_counter()
    acc = 0.0
    for i in range(REPS):
        state, total, wins = env.rollout_episodes(jax.random.PRNGKey(i + 1), holder)
        acc += float(total.sum())  # per-rep value fetch keeps timing honest
    dt = time.perf_counter() - t0

    env_steps = B * N_TRIES * REPS
    steps_per_s = env_steps / dt
    n_chips = max(1, len(jax.devices()))
    per_chip = steps_per_s / n_chips

    print(
        json.dumps(
            {
                "metric": "wordle_batched_env_steps_per_s_per_chip",
                "value": round(per_chip, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(per_chip / 10_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
