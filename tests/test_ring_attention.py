"""Ring attention over an 'sp' mesh axis must equal full causal attention
(virtual 8-device CPU mesh; conftest.py forces the backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmrl_gym_tpu.ops.flash_attention import _NEG_BIG, _xla_attention
from lmrl_gym_tpu.parallel.mesh import load_mesh
from lmrl_gym_tpu.parallel.ring_attention import make_ring_attention


def _rand(B, H, T, D, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (B, H, T, D))
    k = jax.random.normal(k2, (B, H, T, D))
    v = jax.random.normal(k3, (B, H, T, D))
    return q, k, v


@pytest.mark.parametrize("mesh_shape,axes", [
    ((1, 1, 1, 8), ("dp", "fsdp", "mp", "sp")),
    ((2, 1, 1, 4), ("dp", "fsdp", "mp", "sp")),
    ((1, 2, 2, 2), ("dp", "fsdp", "mp", "sp")),
])
def test_ring_matches_full_attention(mesh_shape, axes):
    mesh = load_mesh(mesh_shape, axes)
    B, H, T, D = 2, 2, 64, 16
    q, k, v = _rand(B, H, T, D)
    bias = jnp.where(jnp.arange(T) < T - 7, 0.0, _NEG_BIG)
    bias = jnp.broadcast_to(bias, (B, T))

    ring = make_ring_attention(mesh)
    out = jax.jit(ring)(q, k, v, bias)
    ref = _xla_attention(q, k, v, bias, causal=True, sm_scale=1.0 / D**0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_ring_non_causal_and_no_bias():
    mesh = load_mesh((1, 1, 1, 8), ("dp", "fsdp", "mp", "sp"))
    B, H, T, D = 1, 2, 32, 8
    q, k, v = _rand(B, H, T, D, seed=5)
    ring = make_ring_attention(mesh, causal=False)
    out = jax.jit(ring)(q, k, v)
    ref = _xla_attention(q, k, v, None, causal=False, sm_scale=1.0 / D**0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_ring_gradients_flow():
    mesh = load_mesh((-1, 1, 1, 4), ("dp", "fsdp", "mp", "sp"))
    B, H, T, D = 2, 1, 32, 8
    q, k, v = _rand(B, H, T, D, seed=9)
    ring = make_ring_attention(mesh)

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None, True, 1.0 / D**0.5) ** 2)

    g1 = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
