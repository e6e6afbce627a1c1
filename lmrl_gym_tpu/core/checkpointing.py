"""Streaming pytree checkpointing.

Wire format kept compatible in spirit with the reference's EasyLM-derived
msgpack stream (SURVEY.md §2.9; consumption pattern
LLM_RL/heads/shard_heads.py:121-197): the pytree is flattened to
('/'-joined key, tensor-bytes) pairs and streamed one leaf at a time, so
arbitrarily large models never need 2x host RAM and each leaf can be
device_put onto its shard as it is read ("stream sharding").
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import msgpack
import numpy as np
from flax import serialization
from jax.sharding import NamedSharding

from lmrl_gym_tpu.core.io import makedirs_with_bucket, open_with_bucket


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        out.append(("/".join(parts), leaf))
    return out, treedef


def save_pytree(
    tree: Any,
    path: str,
    dtype: Optional[jnp.dtype] = None,
) -> None:
    """Stream a pytree to `path` as msgpack (key, tensor) pairs.

    `dtype`: optional cast applied to floating leaves on save (the
    reference's `save_dtype` bf16-cast-on-save, maze/ilql/train_ilql.py:520).
    """
    flat, _ = _flatten_with_paths(tree)
    packer = msgpack.Packer()
    with open_with_bucket(path, "wb") as f:
        for key, leaf in flat:
            arr = np.asarray(jax.device_get(leaf))
            if dtype is not None and np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(dtype)
            f.write(packer.pack((key, serialization.to_bytes(arr))))


def load_pytree(
    path: str,
    target: Any = None,
    sharding_fn: Optional[Callable[[str, np.ndarray], Any]] = None,
) -> Any:
    """Load a msgpack-streamed pytree.

    With `target`, returns a pytree of target's structure (keys matched by
    path). `sharding_fn(key, array)` — if given — is applied leaf-by-leaf
    as leaves are read (stream-sharding onto devices, cf.
    heads/shard_heads.py:125,148); default returns the numpy array.
    """
    leaves = {}
    with open_with_bucket(path, "rb") as f:
        unpacker = msgpack.Unpacker(f, max_buffer_size=2**31)
        for key, raw in unpacker:
            if isinstance(key, bytes):
                key = key.decode("utf-8")
            arr = serialization.from_bytes(None, raw)
            arr = np.asarray(arr)
            if sharding_fn is not None:
                arr = sharding_fn(key, arr)
            leaves[key] = arr
    if target is None:
        return _unflatten_paths(leaves)
    flat, treedef = _flatten_with_paths(target)
    out = []
    for key, leaf in flat:
        if key not in leaves:
            raise KeyError(f"checkpoint missing key: {key}")
        out.append(leaves[key])
    return jax.tree_util.tree_unflatten(treedef, out)


def _unflatten_paths(leaves: dict) -> dict:
    root: dict = {}
    for key, value in leaves.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def stream_sharding_fn(mesh, spec_by_key: Callable[[str], Any]):
    """Build a sharding_fn that device_puts each leaf per its PartitionSpec."""

    def fn(key: str, arr: np.ndarray):
        spec = spec_by_key(key)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return fn


def save_config(config: dict, path: str) -> None:
    with open_with_bucket(path, "w") as f:
        json.dump(config, f, indent=2)


def load_config(path: str) -> dict:
    with open_with_bucket(path) as f:
        return json.load(f)


def create_path(path: str) -> str:
    return makedirs_with_bucket(path)
