"""Checkpoint layout + loop-state persistence.

Mirrors the reference layouts (SURVEY §2.4, §5): a checkpoint directory
holds one subdir per module (ILQL: base/, target_base/, q1_head/,
q2_head/, v_head/, q1_target_head/, q2_target_head/; PPO: policy/,
value_head/), each with config.json + params.msgpack (or
train_state.msgpack when optimizer state is saved), plus loop_state.pkl
(step/epoch/best_perf/checkpoint queue) for resume
(algorithms/ilql/train.py:25-175, ppo/train.py:28-85).
"""
from __future__ import annotations

import os
import pickle
import shutil
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from lmrl_gym_tpu.core.checkpointing import (
    create_path,
    load_config,
    load_pytree,
    save_config,
    save_pytree,
)


@dataclass
class LoopState:
    step: int = 0
    epoch: int = 0
    round: int = 0
    best_perf: float = float("-inf")
    saved_checkpoints: deque = field(default_factory=deque)
    wandb_id: Optional[str] = None

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(
                dict(
                    step=self.step,
                    epoch=self.epoch,
                    round=self.round,
                    best_perf=self.best_perf,
                    saved_checkpoints=list(self.saved_checkpoints),
                    wandb_id=self.wandb_id,
                ),
                f,
            )

    @classmethod
    def load(cls, path: str) -> "LoopState":
        with open(path, "rb") as f:
            d = pickle.load(f)
        state = cls(
            step=d["step"],
            epoch=d["epoch"],
            round=d.get("round", 0),
            best_perf=d["best_perf"],
            wandb_id=d.get("wandb_id"),
        )
        state.saved_checkpoints = deque(d.get("saved_checkpoints", []))
        return state


def dump_modules(
    save_dir: str,
    modules: Dict[str, Any],  # name → params pytree (or TrainState)
    configs: Optional[Dict[str, dict]] = None,
    save_dtype: Optional[jnp.dtype] = None,
    save_train_state: bool = False,
) -> None:
    """Write one subdir per module. TrainStates save full optimizer state
    when save_train_state else params only (ilql/train.py:262-295)."""
    create_path(save_dir)
    for name, module in modules.items():
        if module is None:
            continue
        mod_dir = create_path(os.path.join(save_dir, name))
        if hasattr(module, "params") and hasattr(module, "opt_state"):
            if save_train_state:
                save_pytree(
                    {"params": module.params, "opt_state": module.opt_state, "step": module.step},
                    os.path.join(mod_dir, "train_state.msgpack"),
                    dtype=save_dtype,
                )
            else:
                save_pytree(
                    module.params, os.path.join(mod_dir, "params.msgpack"), dtype=save_dtype
                )
        else:
            save_pytree(module, os.path.join(mod_dir, "params.msgpack"), dtype=save_dtype)
        if configs and name in configs:
            save_config(configs[name], os.path.join(mod_dir, "config.json"))


def load_module_params(save_dir: str, name: str, target: Any = None, sharding_fn=None) -> Any:
    mod_dir = os.path.join(save_dir, name)
    params_path = os.path.join(mod_dir, "params.msgpack")
    ts_path = os.path.join(mod_dir, "train_state.msgpack")
    if os.path.exists(params_path):
        return load_pytree(params_path, target=target, sharding_fn=sharding_fn)
    if os.path.exists(ts_path):
        tree = load_pytree(ts_path, sharding_fn=sharding_fn)
        return tree["params"]
    raise FileNotFoundError(f"no checkpoint in {mod_dir}")


def load_module_config(save_dir: str, name: str) -> dict:
    return load_config(os.path.join(save_dir, name, "config.json"))


class CheckpointManager:
    """Rolling checkpoint queue + best-checkpoint tracking
    (ilql/train.py:269-345)."""

    def __init__(self, save_dir: Optional[str], max_checkpoints: Optional[int] = None):
        self.save_dir = save_dir
        self.max_checkpoints = max_checkpoints

    def save(
        self,
        tag: str,
        loop_state: LoopState,
        modules: Dict[str, Any],
        configs: Optional[Dict[str, dict]] = None,
        save_dtype=None,
        save_train_state: bool = False,
        rolling: bool = True,
    ) -> Optional[str]:
        if self.save_dir is None:
            return None
        ckpt_dir = os.path.join(self.save_dir, tag)
        if os.path.exists(ckpt_dir):
            shutil.rmtree(ckpt_dir)
        dump_modules(ckpt_dir, modules, configs, save_dtype, save_train_state)
        loop_state.save(os.path.join(ckpt_dir, "loop_state.pkl"))
        if rolling:
            loop_state.saved_checkpoints.append(ckpt_dir)
            if (
                self.max_checkpoints is not None
                and len(loop_state.saved_checkpoints) > self.max_checkpoints
            ):
                old = loop_state.saved_checkpoints.popleft()
                if os.path.exists(old):
                    shutil.rmtree(old)
        return ckpt_dir


def export_hf_format(params: Any, config: dict, out_dir: str) -> None:
    """Export params + config for downstream HF-style consumption
    (algorithms/checkpoints.py:8-34 equivalent; msgpack weights +
    config.json rather than pytorch_model.bin — no torch dependency)."""
    create_path(out_dir)
    save_pytree(params, os.path.join(out_dir, "flax_model.msgpack"))
    save_config(config, os.path.join(out_dir, "config.json"))
