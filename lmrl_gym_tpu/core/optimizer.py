"""Optimizers.

Replaces the reference's JaxSeq `GPT3Optimizer` surface (SURVEY.md §2.9):
AdamW with GPT-3-style betas, weight decay masked off bias/LayerNorm/
embedding params, and a linear-warmup + cosine (or constant) schedule.
Grad accumulation via optax.MultiSteps — the ILQL target-update gate keys
off its `mini_step` (reference ilql/gpt2/interface.py:336-339).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import optax


def weight_decay_mask(params: Any) -> Any:
    """True (decayed) for ≥2-D kernels; False for biases/LN scales/1-D."""

    def is_decayed(path, leaf) -> bool:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if "bias" in name or "scale" in name or "ln" in name.lower():
            return False
        return getattr(leaf, "ndim", 0) >= 2

    return jax.tree_util.tree_map_with_path(is_decayed, params)


@dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 3e-4
    end_lr_ratio: float = 0.1
    warmup_steps: int = 0
    total_steps: Optional[int] = None  # None → constant after warmup
    b1: float = 0.9
    b2: float = 0.95
    eps: float = 1e-8
    weight_decay: float = 0.0
    grad_clip: Optional[float] = 1.0
    grad_accum_steps: int = 1

    def to_dict(self) -> dict:
        import dataclasses

        return dataclasses.asdict(self)


def make_optimizer(config: OptimizerConfig, params: Any) -> optax.GradientTransformation:
    if config.total_steps is not None:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=config.lr,
            warmup_steps=max(config.warmup_steps, 1),
            decay_steps=max(config.total_steps, config.warmup_steps + 1),
            end_value=config.lr * config.end_lr_ratio,
        )
    elif config.warmup_steps > 0:
        schedule = optax.linear_schedule(0.0, config.lr, config.warmup_steps)
    else:
        schedule = config.lr

    chain = []
    if config.grad_clip is not None:
        chain.append(optax.clip_by_global_norm(config.grad_clip))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=config.b1,
            b2=config.b2,
            eps=config.eps,
            weight_decay=config.weight_decay,
            mask=weight_decay_mask(params) if config.weight_decay > 0 else None,
        )
    )
    tx = optax.chain(*chain)
    if config.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum_steps)
    return tx


def mini_step_of(opt_state: Any):
    """MultiSteps microstep counter, or None for plain optimizers."""
    if hasattr(opt_state, "mini_step"):
        return opt_state.mini_step
    return None
