"""Ring attention integrated into the model path (round-1 VERDICT item 8:
previously "an island" — implemented + unit-tested but wired into no
model/train path). With config.sequence_parallel=True and an 'sp' mesh
axis > 1, the no-cache attention runs as ring attention and activations
shard the sequence dim, covering the reference's missing long-context
story (Car-Dealer 50-turn ≈ 1024-token windows are the forcing case,
SURVEY §7 item 9).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training.train_state import TrainState
from jax.sharding import NamedSharding, PartitionSpec as PS

from lmrl_gym_tpu.algos.bc import BCBatch, BCConfig, BCTrainState, make_bc_train_step
from lmrl_gym_tpu.core.optimizer import OptimizerConfig, make_optimizer
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.parallel.mesh import (
    MESH_AXES_SP,
    load_mesh,
    match_partition_rules,
    refine_specs_for_shapes,
    shard_pytree,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _config(**kw):
    return tiny_test_config(
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        max_position_embeddings=1024,
        use_flash_attention=False,
        **kw,
    )


def test_sp2_logits_match_single_device():
    """A 1024-token car-dealer-length window: sp=2 sharded forward must
    match the unsharded single-device logits."""
    T = 1024
    config_ref = _config()
    config_sp = _config(sequence_parallel=True)
    params = init_params(config_ref, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 250, (2, T)).astype(np.int32)
    ids[0, : T // 3] = 256  # left padding on one row
    ref_logits, _ = LMCore(config_ref).forward(
        params, jnp.asarray(ids), pad_token_id=256
    )

    mesh = load_mesh((1, 2, 2, 2), MESH_AXES_SP)
    specs = refine_specs_for_shapes(
        match_partition_rules(config_sp.partition_rules(), params), params, mesh
    )
    sp_params = shard_pytree(params, specs, mesh)
    core = LMCore(config_sp, mesh=mesh)
    ids_sharded = jax.device_put(
        ids, NamedSharding(mesh, PS(("dp", "fsdp"), "sp"))
    )
    sp_logits, _ = jax.jit(
        lambda p, i: core.forward(p, i, pad_token_id=256)
    )(sp_params, ids_sharded)

    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )


def test_train_step_runs_with_sp2():
    """BC train step (fwd+bwd+update) compiles and runs with sp=2."""
    config = _config(sequence_parallel=True)
    mesh = load_mesh((1, 2, 2, 2), MESH_AXES_SP)
    core = LMCore(config, mesh=mesh)
    params = init_params(config, jax.random.PRNGKey(0))
    specs = refine_specs_for_shapes(
        match_partition_rules(config.partition_rules(), params), params, mesh
    )
    params = shard_pytree(params, specs, mesh)
    state = BCTrainState(
        model=TrainState.create(
            apply_fn=None,
            params=params,
            tx=make_optimizer(OptimizerConfig(lr=1e-3), params),
        )
    )
    step = make_bc_train_step(core, BCConfig(), 256, mesh)

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 250, (4, 128)).astype(np.int32)
    mask = np.zeros_like(ids, bool)
    mask[:, 64:] = True
    sharding = NamedSharding(mesh, PS(("dp", "fsdp"), "sp"))
    batch = BCBatch(
        jax.device_put(ids, sharding), jax.device_put(mask, sharding)
    )
    state2, loss1, _ = step(state, batch, jax.random.PRNGKey(0))
    _, loss2, _ = step(state2, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # an update actually happened
