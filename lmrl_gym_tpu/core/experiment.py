"""Experiment bookkeeping.

Replaces JaxSeq's `setup_experiment_save` (SURVEY §2.9): creates a
save directory, snapshots the invoking script and its arguments, and
issues unique experiment names. Plus deterministic seeding helpers
(threaded PRNG keys replacing the reference's global-`random` freezing,
maze/env/randomness.py:5-41).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid
from typing import Any, Dict, Optional, Tuple

import jax


def uuid_name(name: str) -> str:
    return f"{name}.{time.strftime('%Y-%m-%d-%H-%M-%S')}.{uuid.uuid4().hex[:8]}"


def setup_experiment_save(
    exp_name: Optional[str],
    outputs_path: Optional[str],
    input_args: Optional[Dict[str, Any]] = None,
    script_path: Optional[str] = None,
    is_main_process: bool = True,
) -> Tuple[Optional[str], str]:
    """→ (save_dir | None, exp_name). Records args + a copy of the
    launching script inside the save dir."""
    if exp_name is None:
        base = os.path.splitext(os.path.basename(script_path or sys.argv[0]))[0]
        exp_name = uuid_name(base)
    if outputs_path is None:
        return None, exp_name
    save_dir = os.path.join(outputs_path, exp_name)
    if is_main_process:
        os.makedirs(save_dir, exist_ok=True)
        if input_args is not None:
            with open(os.path.join(save_dir, "input_args.json"), "w") as f:
                json.dump(
                    {k: repr(v) for k, v in input_args.items()}, f, indent=2
                )
        if script_path is not None and os.path.exists(script_path):
            shutil.copy(script_path, os.path.join(save_dir, "script.py"))
    return save_dir, exp_name


def convert_path(path: Optional[str]) -> Optional[str]:
    """Project-root-relative paths with PROJECT_ROOT override
    (reference LLM_RL/utils.py:8-10)."""
    if path is None:
        return None
    if path.startswith("/") or path.startswith("gcs://"):
        return path
    root = os.environ.get(
        "PROJECT_ROOT",
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    return os.path.join(root, path)


class SeedStream:
    """Deterministic named PRNG streams from one root seed."""

    def __init__(self, seed: int):
        self.root = jax.random.PRNGKey(seed)
        self._counters: Dict[str, int] = {}

    def next(self, name: str = "default") -> jax.Array:
        idx = self._counters.get(name, 0)
        self._counters[name] = idx + 1
        return jax.random.fold_in(
            jax.random.fold_in(self.root, hash(name) % (2**31)), idx
        )
