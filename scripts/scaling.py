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


def bench_ilql_step(n_devices: int, per_device_batch: int = 4, reps: int = 5):
    """ILQL train step (base + 3 heads) with batch dp-sharded and params
    fsdp/mp-replicated on an (n,1,1) mesh — the learner-side workload of
    the BASELINE scaling row."""
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

    devices = jax.devices()[:n_devices]
    mesh = load_mesh((n_devices, 1, 1), ("dp", "fsdp", "mp"), devices=devices)
    config = TransformerConfig(
        vocab_size=259, hidden_size=256, num_layers=4, num_heads=4,
        max_position_embeddings=256, pad_vocab_to_multiple=64,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
    )
    core = LMCore(config, mesh=mesh)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q_cfg = MLPHeadConfig(
        input_dim=config.hidden_size, hidden_dim=2 * config.hidden_size,
        output_dim=config.padded_vocab_size, layer2_initializer_range=0.0,
    )
    v_cfg = MLPHeadConfig(
        input_dim=config.hidden_size, hidden_dim=2 * config.hidden_size,
        output_dim=1, layer2_initializer_range=0.0,
    )
    q_head, v_head = MLPHead(q_cfg), MLPHead(v_cfg)
    ilql_config = ILQLConfig()
    state = init_ilql_state(
        init_params(config, ks[0]),
        init_head_params(q_head, config.hidden_size, ks[1]),
        init_head_params(q_head, config.hidden_size, ks[2]),
        init_head_params(v_head, config.hidden_size, ks[3]),
        optax.adamw(1e-4), optax.adamw(1e-3), ilql_config,
    )
    state = jax.device_put(state, NamedSharding(mesh, PS()))
    step = make_ilql_train_step(core, q_head, v_head, ilql_config, pad_token_id=256)

    B, T = per_device_batch * n_devices, 64
    rng = np.random.default_rng(0)
    sta = np.zeros((B, T - 1), bool)
    sta[:, 1::2] = True
    batch_sharding = NamedSharding(mesh, PS(("dp", "fsdp")))
    batch = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), batch_sharding),
        ILQLBatch(
            input_ids=np.asarray(rng.integers(1, 256, (B, T)), np.int32),
            should_take_action=sta,
            rewards=np.asarray(-1.0 * sta, np.float32),
            dones=np.zeros((B,), bool),
            next_token_ids=np.asarray(rng.integers(1, 256, (B, 16)), np.int32),
            next_dones=np.ones((B,), bool),
        ),
    )
    state, loss, _ = step(state, batch, jax.random.PRNGKey(1))
    float(loss)
    t0 = time.perf_counter()
    for i in range(reps):
        state, loss, _ = step(state, batch, jax.random.PRNGKey(i))
    float(loss)
    dt = time.perf_counter() - t0
    return reps / dt


def main():
    n_avail = len(jax.devices())
    points = sorted({1, 2, 4, 8} & set(range(1, n_avail + 1))) or [1]
    workloads = [
        ("wordle_env_rollout", bench_env_rollout, "env_steps_per_s"),
        ("ilql_train_step", bench_ilql_step, "updates_per_s"),
    ]
    for name, fn, unit in workloads:
        base = None
        for n in points:
            steps = fn(n)
            if base is None:
                base = steps
            row = {
                "workload": name,
                "n_devices": n,
                unit: round(steps, 3),
                "scaling_efficiency": round(steps / (base * n), 3),
                "backend": jax.default_backend(),
            }
            if jax.default_backend() == "cpu":
                # virtual CPU devices share the same physical cores:
                # efficiency here measures host oversubscription, not GSPMD
                # partitioning.
                row["note"] = "virtual devices share cores; efficiency not meaningful"
            print(json.dumps(row))


if __name__ == "__main__":
    main()
