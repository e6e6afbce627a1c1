"""Bucket-transparent file IO + multihost bootstrap.

Replaces the reference's JaxSeq `bucket_manager.open_with_bucket` /
`delete_with_bucket` surface (104 call sites in the reference,
SURVEY.md §2.9) and the `jsonl_load`/`jsonl_stream` helpers its data
loaders use.

`gcs://` / `gs://` paths route through gcsfs when it is installed;
everything else is plain local IO. gcsfs is an optional dependency —
local-only environments never import it.
"""
from __future__ import annotations

import json
import os
from typing import Any, Iterator, List, Optional

_GCS_PREFIXES = ("gcs://", "gs://")


def is_bucket_path(path: str) -> bool:
    return path.startswith(_GCS_PREFIXES)


def _gcs_fs():
    try:
        import gcsfs
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "gcs:// paths need the optional gcsfs dependency"
        ) from e
    return gcsfs.GCSFileSystem()


def _strip_scheme(path: str) -> str:
    for p in _GCS_PREFIXES:
        if path.startswith(p):
            return path[len(p):]
    return path


def open_with_bucket(path: str, mode: str = "r", **kw):
    """Open a local or gcs:// path with identical semantics."""
    if is_bucket_path(path):
        return _gcs_fs().open(_strip_scheme(path), mode, **kw)
    if any(m in mode for m in ("w", "a", "x")):
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
    return open(path, mode, **kw)


def delete_with_bucket(path: str, recursive: bool = False) -> None:
    if is_bucket_path(path):
        _gcs_fs().rm(_strip_scheme(path), recursive=recursive)
        return
    if os.path.isdir(path):
        if recursive:
            import shutil

            shutil.rmtree(path)
        else:
            os.rmdir(path)
    elif os.path.exists(path):
        os.remove(path)


def exists_with_bucket(path: str) -> bool:
    if is_bucket_path(path):
        return _gcs_fs().exists(_strip_scheme(path))
    return os.path.exists(path)


def makedirs_with_bucket(path: str) -> str:
    """mkdir -p for local paths; no-op for buckets (GCS has no dirs)."""
    if not is_bucket_path(path):
        os.makedirs(path, exist_ok=True)
    return path


def jsonl_stream(path: str) -> Iterator[Any]:
    """Lazily yield one parsed object per line (reference jsonl_stream)."""
    with open_with_bucket(path, "r") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def jsonl_load(path: str) -> List[Any]:
    return list(jsonl_stream(path))


def jsonl_dump(items, path: str) -> None:
    with open_with_bucket(path, "w") as f:
        for item in items:
            f.write(json.dumps(item) + "\n")


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multihost bootstrap for pod slices.

    On TPU pods created with standard tooling, `jax.distributed.initialize()`
    autodetects everything; explicit args cover manual launches. Single-
    process runs are a no-op (the reference relies on implicit single-
    controller SPMD + jax.process_index() gating, SURVEY.md §2.12 — this is
    the one net-new bootstrap call a pod launch needs).
    """
    import jax

    if num_processes is None and coordinator_address is None:
        env_n = os.environ.get("JAX_NUM_PROCESSES")
        if env_n is None or int(env_n) <= 1:
            return  # single host — nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
