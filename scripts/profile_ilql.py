"""Profile-backed MFU for the ILQL train step (round-3 VERDICT item 7).

The bench's MFU is analytic (counted FLOPs / wall). This script backs it
with two measured sources:

1. XLA's own cost analysis of the compiled step
   (`compiled.cost_analysis()['flops']`) — the compiler-counted FLOPs,
   including fused elementwise work the analytic model skips — divided
   by the measured step wall time.
2. A `jax.profiler.trace` xplane dump, aggregated per device-plane op:
   device busy fraction, and time split across matmul (dot/conv) ops,
   copies, collectives, and other fusions. This is the collective/
   compute split the VERDICT asked to see next to the analytic number.

Writes PROFILE_r04.json and leaves the raw trace under
/tmp/ilql_trace (not committed; the JSON summary is).

Run on the TPU chip:  python scripts/profile_ilql.py [--vocab 50257]
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(vocab: int, B: int, T: int):
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

    config = TransformerConfig(
        vocab_size=vocab, hidden_size=768, num_layers=12, num_heads=12,
        max_position_embeddings=1024,
        pad_vocab_to_multiple=128 if vocab > 1000 else 64,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
    )
    core = LMCore(config)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q_cfg = MLPHeadConfig(
        input_dim=768, hidden_dim=1536, output_dim=config.padded_vocab_size,
        layer2_initializer_range=0.0,
    )
    v_cfg = MLPHeadConfig(
        input_dim=768, hidden_dim=1536, output_dim=1, layer2_initializer_range=0.0
    )
    q_head, v_head = MLPHead(q_cfg), MLPHead(v_cfg)
    ilql_config = ILQLConfig()
    state = init_ilql_state(
        init_params(config, ks[0]),
        init_head_params(q_head, 768, ks[1]),
        init_head_params(q_head, 768, ks[2]),
        init_head_params(v_head, 768, ks[3]),
        optax.adamw(1e-4), optax.adamw(1e-3), ilql_config,
    )
    step = make_ilql_train_step(
        core, q_head, v_head, ilql_config, pad_token_id=min(vocab - 1, 256)
    )
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
    return state, step, batch


def parse_xplane(trace_dir: str) -> dict:
    """Aggregate device-plane op durations from the newest xplane dump."""
    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return {"error": "no xplane dump found"}
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    import re as _re

    def short_name(name: str) -> str:
        """'%foo.3 = shape op(...)' → 'foo.3 [op]'; bare names pass through."""
        m = _re.match(r"%?([\w.\-]+) = .*? ([\w\-]+)\(", name)
        if m:
            return f"{m.group(1)} [{m.group(2)}]"
        return name[:60]

    def bucket_of(name: str) -> str:
        m = _re.match(r"%?[\w.\-]+ = .*? ([\w\-]+)\(", name)
        op = (m.group(1) if m else name.split(".")[0]).lower()
        lhs = name.split("=")[0].lower()
        if "dot" in op or "conv" in op or "dot" in lhs or "matmul" in lhs:
            return "matmul"
        if op.startswith("copy") or "transpose" in op:
            return "copy"
        if any(c in op for c in (
            "all-reduce", "all-gather", "reduce-scatter",
            "collective", "all-to-all",
        )):
            return "collective"
        return "other"

    buckets = {"matmul": 0.0, "copy": 0.0, "collective": 0.0, "other": 0.0}
    top = {}
    total_ps = 0.0
    span_ps = 0.0
    device_planes = [
        p for p in xspace.planes
        if "TPU" in p.name or "/device" in p.name.lower()
    ]
    for plane in device_planes:
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # only the synchronous HLO op line: 'Steps'/'XLA Modules'
            # nest the same time and double-count; 'Async XLA Ops'
            # overlap the sync line (DMA prefetch)
            if line.name != "XLA Ops":
                continue
            lo, hi = None, None
            for ev in line.events:
                name = meta.get(ev.metadata_id, "")
                dur = ev.duration_ps
                total_ps += dur
                t0 = ev.offset_ps
                lo = t0 if lo is None else min(lo, t0)
                hi = t0 + dur if hi is None else max(hi, t0 + dur)
                buckets[bucket_of(name)] += dur
                sn = short_name(name)
                top[sn] = top.get(sn, 0.0) + dur
            if lo is not None:
                span_ps += hi - lo
    top10 = sorted(top.items(), key=lambda kv: -kv[1])[:10]
    out = {
        "device_busy_ms": total_ps / 1e9,
        "device_span_ms": span_ps / 1e9,
        "busy_fraction": (total_ps / span_ps) if span_ps else None,
        # NOTE: on TPU most matmuls execute inside kOutput fusions whose
        # instruction name doesn't say 'dot', so 'named_matmul' is a
        # LOWER bound; 'other_fusions' carries the fused matmul+epilogue
        # time. 'copy' and 'collective' are reliable.
        "time_split": {
            ("named_matmul" if k == "matmul" else
             "other_fusions" if k == "other" else k): (
                v / total_ps if total_ps else 0.0
            )
            for k, v in buckets.items()
        },
        "top10_ops_ms": [[n, d / 1e9] for n, d in top10],
        "xplane_path": paths[-1],
    }
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", type=int, default=50257)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq", type=int, default=160)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--trace-dir", type=str, default="/tmp/ilql_trace")
    p.add_argument("--out", type=str, default="PROFILE_r04.json")
    args = p.parse_args(argv)

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    state, step, batch = build_step(args.vocab, args.batch, args.seq)
    state, loss, _ = step(state, batch, jax.random.PRNGKey(1))
    float(loss)

    # 1. XLA cost analysis of the compiled step
    lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        xla_flops = float(ca.get("flops", float("nan")))
    except Exception as e:
        xla_flops, ca = float("nan"), {"error": str(e)}

    # timed window
    t0 = time.perf_counter()
    for i in range(args.reps):
        state, loss, _ = step(state, batch, jax.random.PRNGKey(i))
    float(loss)
    dt = (time.perf_counter() - t0) / args.reps
    peak = bench._peak_flops_per_chip()
    xla_mfu = xla_flops / dt / peak if np.isfinite(xla_flops) else None

    # 2. jax.profiler trace of a few steps
    trace_summary = {}
    try:
        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            for i in range(3):
                state, loss, _ = step(state, batch, jax.random.PRNGKey(100 + i))
            float(loss)
        trace_summary = parse_xplane(args.trace_dir)
        if trace_summary.get("device_busy_ms"):
            trace_summary["per_step_busy_ms"] = trace_summary["device_busy_ms"] / 3
    except Exception as e:
        trace_summary = {"error": f"{type(e).__name__}: {e}"}

    result = {
        "model": f"d768 L12 H12 vocab{args.vocab} B{args.batch} T{args.seq}",
        "step_wall_ms": round(dt * 1e3, 2),
        "updates_per_s": round(1 / dt, 3),
        "xla_cost_analysis_flops": xla_flops,
        "xla_counted_mfu_pct": round(100 * xla_mfu, 2) if xla_mfu else None,
        "peak_flops": peak,
        "profile": trace_summary,
    }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
