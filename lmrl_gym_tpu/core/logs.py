"""Metric pytree logging.

Rebuild of the reference's LLM_RL/log_utils.py:11-92 + LLM_RL/utils.py:12-32
surface: every loss emits a pytree of scalars / LogTuples; lists of such
pytrees are merged by weighted mean, reduced to host floats, labeled, and
flushed to stdout (+ wandb when available).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

try:  # wandb is optional; never required.
    import wandb  # type: ignore

    _WANDB = True
except Exception:  # pragma: no cover
    _WANDB = False


class LogTuple(NamedTuple):
    mean: Any
    count: Any


def get_tensor_stats(x: jnp.ndarray, mask: jnp.ndarray, n: Union[int, jnp.ndarray]):
    """Masked mean/min/max/std of a tensor, as a log pytree.

    Mirrors LLM_RL/utils.py:12-32 (used inside every loss's log dict).
    """
    mask = mask.astype(jnp.float32)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    mean = (x * mask).sum() / n
    second = ((x - mean) ** 2 * mask).sum() / n
    return dict(
        mean=mean,
        min=jnp.where(mask > 0, x, jnp.inf).min(),
        max=jnp.where(mask > 0, x, -jnp.inf).max(),
        std=jnp.sqrt(jnp.maximum(second, 0.0)),
    )


def _is_leaf(x) -> bool:
    return isinstance(x, LogTuple) or not isinstance(x, (dict, list, tuple))


def combine_logs(logs: List[Any]) -> Any:
    """Merge a list of log pytrees by count-weighted mean.

    Scalars are treated as LogTuple(value, 1). min/max keys reduce by
    min/max instead of mean (so get_tensor_stats output composes).
    """
    assert len(logs) > 0

    def combine(path, *leaves):
        key = str(path[-1].key) if path and hasattr(path[-1], "key") else ""
        tuples = [
            leaf if isinstance(leaf, LogTuple) else LogTuple(leaf, 1)
            for leaf in leaves
        ]
        if key == "min":
            from functools import reduce

            return LogTuple(reduce(jnp.minimum, [t.mean for t in tuples]), 1)
        if key == "max":
            from functools import reduce

            return LogTuple(reduce(jnp.maximum, [t.mean for t in tuples]), 1)
        total = sum(t.count for t in tuples)
        mean = sum(t.mean * t.count for t in tuples) / jnp.maximum(total, 1)
        return LogTuple(mean, total)

    return jax.tree_util.tree_map_with_path(
        combine, logs[0], *logs[1:], is_leaf=_is_leaf
    )


def pull_logs(logs: Any) -> Any:
    """Reduce LogTuples to plain host-side python floats."""

    def pull(leaf):
        if isinstance(leaf, LogTuple):
            leaf = leaf.mean
        if isinstance(leaf, (jnp.ndarray, np.ndarray)):
            leaf = np.asarray(jax.device_get(leaf))
            if leaf.ndim == 0:
                leaf = leaf.item()
            else:
                leaf = leaf.tolist()
        return leaf

    return jax.tree.map(pull, logs, is_leaf=_is_leaf)


def label_logs(logs: Any, label: str, to_add: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    out = {label: logs}
    if to_add:
        out.update(to_add)
    return out


def log(logs: Any, use_wandb: bool = False) -> Any:
    """Print a log pytree and optionally push to wandb."""
    logs = pull_logs(logs)
    print(logs, flush=True)
    if use_wandb and _WANDB and wandb.run is not None:  # pragma: no cover
        wandb.log(_flatten("", logs))
    return logs


def _flatten(prefix: str, tree: Any) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(f"{prefix}/{k}" if prefix else str(k), v))
    else:
        out[prefix] = tree
    return out
