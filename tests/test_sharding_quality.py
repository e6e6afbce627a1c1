"""Sharding-quality gate: the multi-chip ILQL step must partition cleanly.

Round-1 VERDICT weak #2: `dryrun_multichip(8)` compiled with
`[SPMD] Involuntary full rematerialization` warnings — the compiler was
replicating-then-repartitioning activations between the batch-sharded
residual stream and hidden-sharded embedding gradients every step. Fixed
by (a) Megatron-style activation constraints inside the transformer
(models/transformer.py `_act`) and (b) vocab-sharded (not hidden-sharded)
embedding tables (models/config.py partition_rules). This test compiles
the full ILQL train step on the 8-device CPU mesh and fails if the XLA
SPMD partitioner emits the warning again.

The warning is printed by C++ absl logging, so Python-level stderr
capture misses it; we dup2 the OS-level fd instead.
"""
import contextlib
import os
import tempfile

import jax
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as PS

from lmrl_gym_tpu.algos.ilql import (
    ILQLBatch,
    ILQLConfig,
    init_ilql_state,
    make_ilql_train_step,
)
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.parallel.mesh import (
    load_mesh,
    match_partition_rules,
    refine_specs_for_shapes,
    shard_pytree,
)


@contextlib.contextmanager
def capture_os_stderr():
    """Capture fd-2 output (C++ absl warnings bypass sys.stderr)."""
    fd = 2
    saved = os.dup(fd)
    with tempfile.TemporaryFile(mode="w+b") as tmp:
        os.dup2(tmp.fileno(), fd)
        buf = {}
        try:
            yield buf
        finally:
            os.dup2(saved, fd)
            os.close(saved)
            tmp.seek(0)
            buf["text"] = tmp.read().decode(errors="replace")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ilql_step_partitions_without_involuntary_remat():
    mesh = load_mesh((2, 2, 2))
    config = tiny_test_config(num_heads=4, hidden_size=64)
    core = LMCore(config, mesh=mesh)
    key = jax.random.PRNGKey(0)
    base_params = init_params(config, key)

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
    ks = jax.random.split(key, 3)

    base_specs = refine_specs_for_shapes(
        match_partition_rules(config.partition_rules(), base_params),
        base_params,
        mesh,
    )
    base_params = shard_pytree(base_params, base_specs, mesh)

    def shard_head(cfg, k):
        params = init_head_params(MLPHead(cfg), config.hidden_size, k)
        specs = refine_specs_for_shapes(
            match_partition_rules(cfg.partition_rules(), params), params, mesh
        )
        return shard_pytree(params, specs, mesh)

    ilql_config = ILQLConfig()
    state = init_ilql_state(
        base_params,
        shard_head(q_cfg, ks[0]),
        shard_head(q_cfg, ks[1]),
        shard_head(v_cfg, ks[2]),
        optax.adam(1e-4),
        optax.adam(1e-3),
        ilql_config,
    )
    step = make_ilql_train_step(
        core, q_head, v_head, ilql_config, pad_token_id=256, mesh=mesh
    )

    b, t = 8, 16
    bsh = NamedSharding(mesh, PS(("dp", "fsdp"), None))
    ssh = NamedSharding(mesh, PS(("dp", "fsdp")))
    rng = np.random.default_rng(0)
    sta = np.zeros((b, t - 1), bool)
    sta[:, 1::2] = True
    batch = ILQLBatch(
        input_ids=jax.device_put(
            rng.integers(1, config.vocab_size, (b, t)).astype(np.int32), bsh
        ),
        should_take_action=jax.device_put(sta, bsh),
        rewards=jax.device_put((-1.0 * sta).astype(np.float32), bsh),
        dones=jax.device_put(np.zeros((b,), bool), ssh),
        next_token_ids=jax.device_put(
            rng.integers(1, config.vocab_size, (b, 8)).astype(np.int32), bsh
        ),
        next_dones=jax.device_put(np.ones((b,), bool), ssh),
    )

    with capture_os_stderr() as captured:
        lowered = step.lower(state, batch, jax.random.PRNGKey(1))
        compiled = lowered.compile()
    assert "Involuntary full rematerialization" not in captured["text"], (
        "SPMD partitioner fell back to replicate-then-repartition:\n"
        + "\n".join(
            l for l in captured["text"].splitlines() if "rematerialization" in l
        )
    )

    new_state, loss, _ = compiled(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
