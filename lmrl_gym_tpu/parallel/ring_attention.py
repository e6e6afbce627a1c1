"""Ring attention: causal attention with the sequence sharded over an
'sp' mesh axis.

Net-new vs the reference, which handles long histories by truncation and
reward-folding only (SURVEY.md §5 "Long-context"; §7 item 9 names this as
the rebuild's long-context story — Car-Dealer's 50-turn conversations are
the forcing case).

Design: each device holds a contiguous [T/n] slice of Q, K and V. K/V
blocks rotate around the ring with `ppermute` (one hop per step, riding
ICI on TPU); every device folds each visiting block into an online-softmax
accumulator, so the full [T, T] score matrix never exists anywhere and
per-device attention memory is O(T²/n). Compute for blocks entirely above
the causal diagonal is masked, not skipped — SPMD lockstep makes skipping
a load-imbalance, not a saving.

The inner block computation is plain XLA (einsum), so the op runs on the
CPU test mesh; on TPU, XLA fuses it onto the MXU and overlaps the
ppermute DMA with compute across the unrolled steps.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as PS

_NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _block_update(
    q: jax.Array,  # [B,H,Tq,D] local queries (fp32, pre-scaled)
    k: jax.Array,  # [B,H,Tk,D] visiting keys
    v: jax.Array,  # [B,H,Tk,D] visiting values
    bias: jax.Array,  # [B,Tk] additive bias travelling with k/v
    q_off: jax.Array,  # [] absolute position of q[...,0,:]
    k_off: jax.Array,  # [] absolute position of k[...,0,:]
    causal: bool,
    carry: Tuple[jax.Array, jax.Array, jax.Array],
):
    acc, m_prev, l_prev = carry
    Tq, Tk = q.shape[2], k.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    s = s + bias.astype(jnp.float32)[:, None, None, :]
    if causal:
        q_pos = q_off + jnp.arange(Tq)
        k_pos = k_off + jnp.arange(Tk)
        s = jnp.where(q_pos[:, None] >= k_pos[None, :], s, _NEG_BIG)
    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[..., None])
    l_new = l_prev * alpha + jnp.sum(p, axis=-1)
    acc = acc * alpha[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return acc, m_new, l_new


def _ring_attention_local(
    q, k, v, bias, *, axis_name: str, n: int, causal: bool, sm_scale: float
):
    """Per-shard body (runs inside shard_map). q/k/v: [B,H,T_local,D]."""
    B, H, Tl, D = q.shape
    idx = jax.lax.axis_index(axis_name)
    qf = q.astype(jnp.float32) * sm_scale
    acc = jnp.zeros((B, H, Tl, D), jnp.float32)
    m = jnp.full((B, H, Tl), _NEG_BIG, jnp.float32)
    l = jnp.zeros((B, H, Tl), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    k_cur, v_cur, b_cur = k, v, bias
    carry = (acc, m, l)
    # Unrolled: lets XLA start the next hop's ppermute while this step's
    # einsum runs.
    for s in range(n):
        src = (idx - s) % n  # which original shard this k/v block is
        carry = _block_update(
            qf, k_cur, v_cur, b_cur, idx * Tl, src * Tl, causal, carry
        )
        if s != n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            b_cur = jax.lax.ppermute(b_cur, axis_name, perm)
    acc, m, l = carry
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def make_ring_attention(
    mesh: Mesh,
    sp_axis: str = "sp",
    batch_axes=("dp", "fsdp"),
    head_axis: str = "mp",
    causal: bool = True,
    sm_scale: Optional[float] = None,
):
    """Build a jit-able ring attention over `mesh`.

    Returns f(q, k, v, bias) with global shapes q/k/v [B,H,T,Dh],
    bias [B,T] (additive, -big = masked). T must divide by the sp size.
    Layout: batch over batch_axes, heads over head_axis, sequence over
    sp_axis.
    """
    n = mesh.shape[sp_axis]
    qkv_spec = PS(batch_axes, head_axis, sp_axis, None)
    bias_spec = PS(batch_axes, sp_axis)

    def call(q, k, v, bias=None):
        scale = sm_scale if sm_scale is not None else 1.0 / (q.shape[-1] ** 0.5)
        if bias is None:
            bias = jnp.zeros((q.shape[0], q.shape[2]), jnp.float32)
        inner = functools.partial(
            _ring_attention_local,
            axis_name=sp_axis,
            n=n,
            causal=causal,
            sm_scale=float(scale),
        )
        return shard_map(
            inner,
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
            out_specs=qkv_spec,
            check_vma=False,
        )(q, k, v, bias)

    return call
