"""Device mesh construction and sharding helpers.

TPU-native replacement for the JaxSeq mesh/sharding surface the reference
consumes (SURVEY.md §2.9; reference call sites e.g.
llm_rl_scripts/maze/ilql/train_ilql.py:108 `load_mesh((dp, fsdp, mp), ...)`,
LLM_RL/algorithms/ilql/gpt2/interface.py:113-125
`with_named_sharding_constraint`).

All cross-device communication in this framework is GSPMD-generated from
these shardings; there is no explicit collective code on the training path.
"""
from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

# Canonical mesh axes. dp = data parallel (pure replication of params),
# fsdp = fully-sharded data parallel (params sharded, batch sharded),
# mp = tensor/model parallel, sp = sequence parallel (net-new vs reference).
MESH_AXES = ("dp", "fsdp", "mp")
MESH_AXES_SP = ("dp", "fsdp", "mp", "sp")


def load_mesh(
    shape: Sequence[int],
    axis_names: Sequence[str] = MESH_AXES,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over all (or the given) devices.

    One axis may be -1 meaning "remainder", like the reference's
    `load_mesh((dp, fsdp, mp))` convention (maze/ilql/train_ilql.py:108).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    shape = list(shape)
    assert len(shape) == len(axis_names), "shape and axis_names must align"
    neg = [i for i, s in enumerate(shape) if s == -1]
    assert len(neg) <= 1, "at most one -1 axis"
    known = int(np.prod([s for s in shape if s != -1]))
    if neg:
        assert n % known == 0, f"{n} devices not divisible by {known}"
        shape[neg[0]] = n // known
    assert int(np.prod(shape)) == n, (
        f"mesh shape {shape} does not cover {n} devices"
    )
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def match_partition_rules(rules: Sequence[Tuple[str, PS]], params: Any) -> Any:
    """Map a regex→PartitionSpec rule table onto a param pytree.

    Matches against '/'-joined key paths; first matching rule wins.
    Mirrors the contract of the reference's `match_partition_rules`
    (SURVEY.md §2.9).
    """

    def path_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return "/".join(parts)

    def assign(path, leaf):
        name = path_str(path)
        for pattern, spec in rules:
            if re.search(pattern, name) is not None:
                return spec
        raise ValueError(f"no partition rule matched: {name}")

    return jax.tree_util.tree_map_with_path(assign, params)


def refine_specs_for_shapes(spec_tree: Any, tree: Any, mesh: Mesh) -> Any:
    """Drop sharding on any dim not divisible by its mesh axes' size.

    Rule tables are written for the general case (e.g. head kernels
    PS('mp','fsdp')); small heads (output dim 1) or odd vocabs can't honor
    them — the standard fix is to replicate that dim instead of failing.
    """

    def axis_size(axis) -> int:
        if axis is None:
            return 1
        if isinstance(axis, (tuple, list)):
            return int(np.prod([mesh.shape[a] for a in axis]))
        return mesh.shape[axis]

    def refine(spec: PS, leaf) -> PS:
        if not hasattr(leaf, "shape"):
            return spec
        parts = list(spec) + [None] * (len(leaf.shape) - len(spec))
        out = [
            axis if (dim % axis_size(axis) == 0) else None
            for axis, dim in zip(parts, leaf.shape)
        ]
        return PS(*out)

    return jax.tree.map(
        refine, spec_tree, tree, is_leaf=lambda x: isinstance(x, PS)
    )


def shard_pytree(tree: Any, spec_tree: Any, mesh: Mesh) -> Any:
    """Place a pytree onto the mesh with the given PartitionSpec pytree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        spec_tree,
        is_leaf=lambda x: x is None,
    )


def with_sharding_constraint(x: Any, mesh: Optional[Mesh], spec: PS) -> Any:
    """Sharding-constrain `x` if a mesh is active; no-op otherwise.

    Replacement for the reference's `with_named_sharding_constraint`.
    """
    if mesh is None or mesh.empty:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def batch_spec(extra_dims: int = 1) -> PS:
    """Canonical batch sharding: leading axis over ('dp','fsdp').

    The reference constrains every batch input to PS(('dp','fsdp'), None)
    (algorithms/ilql/gpt2/interface.py:113-118).
    """
    return PS(("dp", "fsdp"), *([None] * extra_dims))


def host_local_device_put(x: Any, mesh: Mesh, spec: PS) -> Any:
    """Put host-local (numpy) data onto the mesh as a global array.

    Multi-host: uses `jax.make_array_from_process_local_data` so each host
    contributes its local shard (replacing the reference's
    `multihost_device_put`, SURVEY.md §2.9).
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sharding), x)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        x,
    )


def fully_replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PS())


def tree_size_bytes(tree: Any) -> int:
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(tree)
        if hasattr(leaf, "size")
    )
