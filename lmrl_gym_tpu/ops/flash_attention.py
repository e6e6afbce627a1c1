"""Fused causal attention (flash attention) as a Pallas TPU kernel.

The reference computes attention through HF flax GPT-2, which materializes
the full [B, H, T, T] score tensor in HBM. On TPU the hot training path
(every algorithm's train step runs 2-3 base-model forwards per step,
SURVEY.md §3.1) is HBM-bandwidth bound, so we tile Q into VMEM blocks and
stream K/V through an online-softmax accumulator — scores never leave
VMEM.

Forward: Pallas kernel, grid (B, H, Tq/BQ), fp32 accumulation, causal
block skipping (KV blocks entirely above the diagonal are never read).
Backward: recompute-based XLA VJP (no probs saved — same memory win as
remat, and XLA fuses the recompute well on the MXU).

Falls back transparently to a pure-XLA implementation on non-TPU
backends (CPU tests) and for shapes below the tile minimum.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports on TPU-capable installs; guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# Large-negative instead of -inf: keeps exp() clean when an entire row is
# masked (fully-padded query rows otherwise produce NaN from inf - inf).
_NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)

# Test hook: force interpreter mode so CPU CI can execute the kernel.
_FORCE_INTERPRET = False


def _xla_attention(q, k, v, bias, causal: bool, sm_scale: float):
    """Reference path: plain XLA attention. q,k,v: [B,H,T,Dh]; bias: [B,S] additive."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * sm_scale
    if bias is not None:
        scores = scores + bias[:, None, None, :].astype(jnp.float32)
    if causal:
        Tq, Tk = q.shape[2], k.shape[2]
        # queries sit at the END of the kv sequence (standard decode layout)
        q_pos = jnp.arange(Tq) + (Tk - Tq)
        causal_mask = q_pos[:, None] >= jnp.arange(Tk)[None, :]
        scores = jnp.where(causal_mask[None, None], scores, _NEG_BIG)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _flash_kernel(
    bias_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, sm_scale, causal, bq, bk, offset
):
    """One (batch, head, q-block) program. K/V stream in VMEM blocks.

    q_ref: [BQ, Dh]; k_ref/v_ref: [S, Dh]; bias_ref: [1, S]; o_ref: [BQ, Dh];
    lse_ref: [BQ] per-row logsumexp (saved for the backward kernels).
    `offset` = Tk - Tq aligns query rows to absolute kv positions.
    """
    qi = pl.program_id(2)
    S = k_ref.shape[0]
    dh = q_ref.shape[1]

    q = q_ref[:].astype(jnp.float32) * sm_scale  # [BQ, Dh]

    n_kv = S // bk
    if causal:
        # last kv position visible to this q block: offset + (qi+1)*bq - 1
        n_live = jnp.minimum(n_kv, (offset + (qi + 1) * bq + bk - 1) // bk)
    else:
        n_live = n_kv

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(j * bk, bk), :].astype(jnp.float32)  # [BK, Dh]
        v_blk = v_ref[pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q,
            k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        s = s + bias_ref[0, pl.ds(j * bk, bk)][None, :]
        if causal:
            q_pos = offset + qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(q_pos >= k_pos, s, _NEG_BIG)

        m_cur = jnp.max(s, axis=1)  # [BQ]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # rescale old accumulator
        p = jnp.exp(s - m_new[:, None])  # [BQ, BK]
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p,
            v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, dh), jnp.float32)
    m0 = jnp.full((bq,), _NEG_BIG, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_live, body, (acc0, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)
    lse_ref[0, :] = m + jnp.log(jnp.maximum(l, 1e-30))


def _pad_to(x, axis, mult, value=0.0):
    n = x.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


def _flash_forward(q, k, v, bias, causal: bool, sm_scale: float, bq: int, bk: int):
    B, H, Tq, Dh = q.shape
    S = k.shape[2]

    qp = _pad_to(q, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    if bias is None:
        bias = jnp.zeros((B, S), jnp.float32)
    # padded kv positions masked out via the additive bias
    biasp = _pad_to(bias.astype(jnp.float32), 1, bk, value=_NEG_BIG)
    # [B, 1, S]: Mosaic requires the block's sublane dim to tile or equal the
    # array dim — a unit middle axis satisfies it exactly.
    biasp = biasp[:, None, :]

    Tqp, Sp = qp.shape[2], kp.shape[2]
    grid = (B, H, Tqp // bq)

    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        causal=causal,
        bq=bq,
        bk=bk,
        offset=S - Tq,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # None dims are squeezed: kernel refs are [1,S], [BQ,Dh], [S,Dh]
            pl.BlockSpec((None, 1, Sp), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((None, None, bq, Dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, Sp, Dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, Sp, Dh), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, bq, Dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, 1, bq), lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tqp, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Tqp), jnp.float32),
        ],
        interpret=_FORCE_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tqp * Sp * Dh,
            bytes_accessed=2 * (qp.size + kp.size + vp.size + B * H * Tqp * Dh),
            transcendentals=B * H * Tqp * Sp,
        ),
    )(biasp, qp, kp, vp)
    return out[:, :, :Tq, :], lse[:, :, 0, :Tq]


def _flash_bwd_dq_kernel(
    bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, sm_scale, causal, bq, bk, offset,
):
    """dQ for one (batch, head, q-block): stream kv blocks like the forward.

    P is rebuilt from the saved logsumexp (no online softmax needed):
    P = exp(s - lse); dS = P ⊙ (dO·Vᵀ − Δ); dQ = scale · dS·K, where
    Δ = rowsum(dO ⊙ O) (computed once in XLA).
    """
    qi = pl.program_id(2)
    S = k_ref.shape[0]
    q = q_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)  # [BQ, Dh]
    lse = lse_ref[0, :]  # [BQ]
    delta = delta_ref[0, :]  # [BQ]

    n_kv = S // bk
    if causal:
        n_live = jnp.minimum(n_kv, (offset + (qi + 1) * bq + bk - 1) // bk)
    else:
        n_live = n_kv

    def body(j, dq):
        k_blk = k_ref[pl.ds(j * bk, bk), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = s + bias_ref[0, pl.ds(j * bk, bk)][None, :]
        if causal:
            q_pos = offset + qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(q_pos >= k_pos, s, _NEG_BIG)
        p = jnp.exp(s - lse[:, None])  # [BQ, BK]
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None])
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, n_live, body, jnp.zeros_like(q))
    dq_ref[:] = (dq * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, sm_scale, causal, bq, bk, offset,
):
    """dK/dV for one (batch, head, kv-block): stream q blocks.

    dV = Pᵀ·dO; dK = scale · dSᵀ·Q. Causal skip: q blocks entirely above
    this kv block are never read.
    """
    ki = pl.program_id(2)
    Tq = q_ref.shape[0]
    k_blk = k_ref[:].astype(jnp.float32)  # [BK, Dh]
    v_blk = v_ref[:].astype(jnp.float32)
    bias = bias_ref[0, :][None, :]  # [1, BK]

    n_q = Tq // bq
    if causal:
        # first q block whose last row reaches this kv block
        start = jnp.maximum(0, (ki * bk - offset) // bq)
    else:
        start = 0

    def body(qi, carry):
        dk, dv = carry
        q_blk = q_ref[pl.ds(qi * bq, bq), :].astype(jnp.float32)
        do_blk = do_ref[pl.ds(qi * bq, bq), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qi * bq, bq)]
        delta = delta_ref[0, pl.ds(qi * bq, bq)]
        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = s + bias
        if causal:
            q_pos = offset + qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            k_pos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(q_pos >= k_pos, s, _NEG_BIG)
        p = jnp.exp(s - lse[:, None])  # [BQ, BK]
        dv = dv + jax.lax.dot_general(
            p, do_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None])
        dk = dk + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dh = k_blk.shape[1]
    dk0 = jnp.zeros((bk, dh), jnp.float32)
    dv0 = jnp.zeros((bk, dh), jnp.float32)
    dk, dv = jax.lax.fori_loop(start, n_q, body, (dk0, dv0))
    dk_ref[:] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, bias, out, lse, g, causal, sm_scale, bq, bk):
    B, H, Tq, Dh = q.shape
    S = k.shape[2]
    qp, kp, vp = _pad_to(q, 2, bq), _pad_to(k, 2, bk), _pad_to(v, 2, bk)
    gp = _pad_to(g, 2, bq)
    biasp = _pad_to(bias.astype(jnp.float32), 1, bk, value=_NEG_BIG)[:, None, :]
    lsep = _pad_to(lse, 2, bq)[:, :, None, :]  # [B,H,1,Tqp]
    # Δ = rowsum(dO ⊙ O): one fused elementwise+reduce in XLA
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B,H,Tq]
    deltap = _pad_to(delta, 2, bq)[:, :, None, :]
    Tqp, Sp = qp.shape[2], kp.shape[2]
    offset = S - Tq

    common = dict(sm_scale=sm_scale, causal=causal, bq=bq, bk=bk, offset=offset)
    bias_spec = pl.BlockSpec((None, 1, Sp), lambda b, h, i: (b, 0, 0))
    q_full = pl.BlockSpec((None, None, Tqp, Dh), lambda b, h, i: (b, h, 0, 0))
    kv_full = pl.BlockSpec((None, None, Sp, Dh), lambda b, h, i: (b, h, 0, 0))
    q_blk = pl.BlockSpec((None, None, bq, Dh), lambda b, h, i: (b, h, i, 0))
    kv_blk = pl.BlockSpec((None, None, bk, Dh), lambda b, h, i: (b, h, i, 0))
    row_full = pl.BlockSpec((None, None, 1, Tqp), lambda b, h, i: (b, h, 0, 0))
    row_blk = pl.BlockSpec((None, None, 1, bq), lambda b, h, i: (b, h, 0, i))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid=(B, H, Tqp // bq),
        in_specs=[bias_spec, q_blk, kv_full, kv_full, q_blk, row_blk, row_blk],
        out_specs=q_blk,
        out_shape=jax.ShapeDtypeStruct((B, H, Tqp, Dh), q.dtype),
        interpret=_FORCE_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * Tqp * Sp * Dh,
            bytes_accessed=2 * (qp.size + kp.size + vp.size + gp.size),
            transcendentals=B * H * Tqp * Sp,
        ),
    )(biasp, qp, kp, vp, gp, lsep, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid=(B, H, Sp // bk),
        in_specs=[
            pl.BlockSpec((None, 1, bk), lambda b, h, i: (b, 0, i)),
            q_full,
            kv_blk,
            kv_blk,
            q_full,
            row_full,
            row_full,
        ],
        out_specs=[kv_blk, kv_blk],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sp, Dh), k.dtype),
            jax.ShapeDtypeStruct((B, H, Sp, Dh), v.dtype),
        ],
        interpret=_FORCE_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * Tqp * Sp * Dh,
            bytes_accessed=2 * (qp.size + kp.size + vp.size + gp.size),
            transcendentals=B * H * Tqp * Sp,
        ),
    )(biasp, qp, kp, vp, gp, lsep, deltap)

    return (
        dq[:, :, :Tq, :],
        dk[:, :, :S, :],
        dv[:, :, :S, :],
        jnp.zeros_like(bias),  # bias is a padding mask, not a learned term
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_mha(q, k, v, bias, causal, sm_scale, bq, bk):
    out, _ = _flash_forward(q, k, v, bias, causal, sm_scale, bq, bk)
    return out


def _flash_mha_fwd(q, k, v, bias, causal, sm_scale, bq, bk):
    out, lse = _flash_forward(q, k, v, bias, causal, sm_scale, bq, bk)
    return out, (q, k, v, bias, out, lse)


def _flash_mha_bwd(causal, sm_scale, bq, bk, res, g):
    q, k, v, bias, out, lse = res
    return _flash_backward(q, k, v, bias, out, lse, g, causal, sm_scale, bq, bk)


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


def supports_flash(q_shape, kv_len: int, backend: Optional[str] = None) -> bool:
    """Kernel applicability: TPU backend (or forced interpret), head_dim
    lane-friendly, sequence long enough that tiling pays.

    The T >= 1024 threshold is measured, not aesthetic (v5e, H=12 Dh=64,
    fwd+bwd per layer): at T=160 the kernel is 4.8x SLOWER than XLA einsum
    attention (56.9 vs 11.9 ms at B=256 — the materialized [B,H,T,T] f32
    scores XLA pays for are cheaper than the kernel's recompute + grid
    overhead at short T), at T=512 still 1.2x slower, crossover at
    T~1024 (13.4 vs 16.4 ms), and the win grows with T beyond it. Short-T
    training (this framework's envs pad to 128-512) runs the einsum path;
    long-context windows (Car-Dealer chains, ring-attention shards) engage
    the kernel."""
    if not _HAS_PLTPU:
        return False
    backend = backend or jax.default_backend()
    if backend != "tpu" and not _FORCE_INTERPRET:
        return False
    B, H, T, Dh = q_shape
    if Dh % 8 != 0 or Dh > 256:
        return False
    if _FORCE_INTERPRET:
        # interpret mode is the correctness harness, not a perf path: keep
        # the old floor so CPU tests exercise the kernel at small shapes
        return T >= 128 and kv_len >= 128
    return T >= 1024 and kv_len >= 1024


def flash_attention(
    q: jax.Array,  # [B, H, Tq, Dh]
    k: jax.Array,  # [B, H, S, Dh]
    v: jax.Array,  # [B, H, S, Dh]
    bias: Optional[jax.Array] = None,  # [B, S] additive, -big = masked
    causal: bool = True,
    sm_scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    """Fused attention; output [B, H, Tq, Dh] in q.dtype.

    Numerics: fp32 online softmax regardless of input dtype. Queries are
    assumed right-aligned against the kv sequence when Tq < S (decode).
    """
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    Tq, S = q.shape[2], k.shape[2]
    bq = min(block_q, max(8, 1 << (Tq - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (S - 1).bit_length()))
    if not supports_flash(q.shape, S):
        return _xla_attention(q, k, v, bias, causal, sm_scale)
    return _flash_mha(q, k, v, bias, causal, sm_scale, bq, bk)
