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


def main():
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
    jax.block_until_ready(total)

    t0 = time.perf_counter()
    for i in range(REPS):
        state, total, wins = env.rollout_episodes(jax.random.PRNGKey(i + 1), holder)
    jax.block_until_ready(total)
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
