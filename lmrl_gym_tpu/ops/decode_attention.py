"""Fused single-token KV-cache decode attention as a Pallas TPU kernel.

STATUS (r4): RETIRED from the model's decode dispatch — a documented
negative result. Composed inside the fused actor's rollout program the
pallas_call boundary forces cache materialization/copies and the kernel
measured 2.4x SLOWER end-to-end than XLA's einsum decode at this
framework's cache lengths (v5e, B=512 gpt2-small T_max=128: 7.5k vs 3.1k
env-steps/s; PERF_NOTES.md r3/r4). Its fill-clamped reads only pay off at
cache lengths the benchmark tasks never reach. The module and its
correctness tests are kept for long-context serving experiments.

The decode hot loop (models/generation.py scan decode and the fused actor,
loops/actor.py) is bound by reading the KV cache: XLA's einsum attention
at q_len=1 reads every K/V slot of the static cache every step and runs at
~130 GB/s effective on v5e (measured: 0.14 ms per cache slot per step at
B=512 x gpt2-small, see PERF_NOTES.md). Two fixes, one kernel:

1. Fuse QK^T -> softmax -> PV in VMEM (scores never touch HBM), so the
   K/V reads stream at close to HBM bandwidth.
2. Read only the FILLED prefix of the cache. The grid's KV-chunk axis is
   clamped with scalar-prefetched `index`: chunks past the fill point map
   to the last live chunk, and Pallas skips the DMA for a revisited block
   index entirely — cache traffic scales with fill, not with T_max, even
   though every shape stays static (no dynamic shapes under jit).

Kernel shape lessons (measured on v5e, see PERF_NOTES.md): a
flash-attention-style grid (B, H, chunks) of tiny per-head dots is
GRID-OVERHEAD bound at q_len=1 (12k programs of ~140 ns — no faster than
XLA), and Mosaic SIGABRTs on batched in-kernel dot_general. At q_len=1
the score/PV contractions are bandwidth-bound vector ops, not matmuls, so
this kernel blocks over BATCH instead — grid (B/BB, chunks), each program
streaming a [BB, H, BK, Dh] K/V tile through elementwise
multiply-reduces on the VPU. Multi-token cached forwards (prefill /
observation appends) amortize their cache reads over q_len already and
stay on the XLA einsum path.

Semantics match the einsum fallback in models/transformer.py exactly:
key slot j is visible iff j <= index (cache causal rule) and
attention_mask[b, j] (additive bias). Inference-only: no VJP.

Falls back to plain XLA off-TPU (CPU tests run the kernel in interpreter
mode to pin kernel==reference).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - import guard mirrors ops/flash_attention.py
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)

# Test hook: force interpreter mode so CPU CI executes the kernel.
_FORCE_INTERPRET = False


def _xla_decode_attention(q, k, v, index, bias, sm_scale):
    """Reference path — identical math to transformer.py's cached einsum."""
    S = k.shape[2]
    scores = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * sm_scale
    )
    if bias is not None:
        scores = scores + bias[:, None, None, :].astype(jnp.float32)
    k_pos = jnp.arange(S)[None, None, None, :]
    q_pos = index + jnp.arange(q.shape[2])[None, None, :, None]
    scores = jnp.where(k_pos <= q_pos, scores, _NEG_BIG)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _decode1_kernel(
    idx_ref,  # scalar-prefetch: [1] int32 cache write offset
    bias_ref,  # [BB, 1, 1, BK] — bias laid out [B, n_chunks, 1, BK] so each
    # chunk is a whole block (a dynamic lane-slice would need 128-alignment)
    q_ref,  # [BB, H, Dh]
    k_ref,  # [BB, H, BK, Dh]
    v_ref,  # [BB, H, BK, Dh]
    o_ref,  # [BB, H, Dh]
    acc_ref,  # VMEM [BB, H, Dh] f32
    m_ref,  # VMEM [BB, H] f32 running max
    l_ref,  # VMEM [BB, H] f32 running denom
    *,
    sm_scale,
    bk,
):
    j = pl.program_id(1)
    index = idx_ref[0]
    last = index // bk  # last chunk holding visible keys

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j <= last)
    def _compute():
        bb, h, dh = q_ref.shape
        q = q_ref[:].astype(jnp.float32) * sm_scale  # [BB, H, Dh]
        kb = k_ref[:].astype(jnp.float32)  # [BB, H, BK, Dh]
        # q_len=1 scores are a multiply-reduce, not a matmul — VPU-friendly
        s = jnp.sum(q[:, :, None, :] * kb, axis=-1)  # [BB, H, BK]
        s = s + bias_ref[:, 0, 0, :][:, None, :].astype(jnp.float32)
        k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bb, h, bk), 2)
        s = jnp.where(k_pos <= index, s, _NEG_BIG)

        m_prev, l_prev = m_ref[:], l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        m_ref[:] = m_new
        alpha = jnp.exp(m_prev - m_new)  # [BB, H]
        p = jnp.exp(s - m_new[:, :, None])  # [BB, H, BK]
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1)
        acc_ref[:] = acc_ref[:] * alpha[:, :, None] + jnp.sum(
            p[:, :, :, None] * v_ref[:].astype(jnp.float32), axis=2
        )

    @pl.when(j == last)
    def _finish():
        l = jnp.maximum(l_ref[:], 1e-30)[:, :, None]
        o_ref[:] = (acc_ref[:] / l).astype(o_ref.dtype)


def _pick_bb(B: int) -> int:
    # [BB, H, BK, Dh] K+V tiles double-buffer in VMEM, and Mosaic pads the
    # Dh=64 lane dim to 128: BB=32 at H=12, BK=64 is ~50 MB of padded
    # pipeline buffers — needs the raised vmem_limit_bytes below (v5e has
    # 128 MB of VMEM; the default scoped limit is 16 MB)
    for bb in (32, 16, 8, 4, 2, 1):
        if B % bb == 0:
            return bb
    return 1


def supports_decode(
    q_shape,
    kv_len: int,
    block_k: int = 64,
    backend: Optional[str] = None,
    interpret: Optional[bool] = None,
) -> bool:
    """Kernel preconditions (callers fall back to XLA otherwise). Only
    single-token decode (q_len=1) benefits: multi-token cached forwards
    amortize the cache read over their tokens already."""
    if not _HAS_PLTPU:
        return False
    if interpret is None:
        interpret = _FORCE_INTERPRET
    if backend is None:
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            return False
    if backend != "tpu" and not interpret:
        return False
    B, H, Tq, Dh = q_shape
    return (
        Tq == 1
        and Dh % 8 == 0
        and kv_len % block_k == 0
        and kv_len >= block_k
    )


def decode_attention(
    q: jax.Array,  # [B, H, Tq, Dh]
    k: jax.Array,  # [B, H, S, Dh] full cache (zeros past the fill point)
    v: jax.Array,  # [B, H, S, Dh]
    index: jax.Array,  # scalar int32: absolute position of q[:, :, 0]
    bias: Optional[jax.Array] = None,  # [B, S] additive f32 (padding mask)
    sm_scale: float = 1.0,
    block_k: int = 64,
) -> jax.Array:
    # Trace-time dispatch happens OUT HERE, where it re-evaluates on every
    # call: the module-global interpret flag and the backend are part of the
    # jit cache key of the inner callee (static args), so flipping
    # _FORCE_INTERPRET between calls with previously-seen shapes cannot
    # reuse a stale executable.
    return _decode_attention_dispatch(
        q, k, v, index, bias, sm_scale, block_k, _FORCE_INTERPRET
    )


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_k", "interpret")
)
def _decode_attention_dispatch(
    q, k, v, index, bias, sm_scale, block_k, interpret
) -> jax.Array:
    B, H, Tq, Dh = q.shape
    S = k.shape[2]
    if not supports_decode(q.shape, S, block_k, interpret=interpret):
        return _xla_decode_attention(q, k, v, index, bias, sm_scale)

    if bias is None:
        bias = jnp.zeros((B, S), jnp.float32)
    idx = jnp.reshape(index, (1,)).astype(jnp.int32)
    bb = _pick_bb(B)
    n_chunks = S // block_k

    def _clamp(j, idx_ref):
        return jnp.minimum(j, idx_ref[0] // block_k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bb, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (bb, 1, 1, block_k),
                lambda bi, j, idx_ref: (bi, _clamp(j, idx_ref), 0, 0),
            ),
            pl.BlockSpec((bb, H, Dh), lambda bi, j, idx_ref: (bi, 0, 0)),
            pl.BlockSpec(
                (bb, H, block_k, Dh),
                lambda bi, j, idx_ref: (bi, 0, _clamp(j, idx_ref), 0),
            ),
            pl.BlockSpec(
                (bb, H, block_k, Dh),
                lambda bi, j, idx_ref: (bi, 0, _clamp(j, idx_ref), 0),
            ),
        ],
        out_specs=pl.BlockSpec((bb, H, Dh), lambda bi, j, idx_ref: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bb, H, Dh), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode1_kernel, sm_scale=sm_scale, bk=block_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), v.dtype),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if _HAS_PLTPU and not interpret
            else None
        ),
        interpret=interpret,
    )(
        idx,
        bias.astype(jnp.float32).reshape(B, n_chunks, 1, block_k),
        q[:, :, 0, :],
        k,
        v,
    )
    return out[:, :, None, :]
