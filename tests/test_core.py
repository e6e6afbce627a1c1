"""Core utilities: blocking, logs, checkpointing, mesh."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as PS

from lmrl_gym_tpu.core.blocking import (
    BlockingStrategy,
    Padding,
    Truncation,
    block_sequences,
    strip_prompt_from_completion,
)
from lmrl_gym_tpu.core.checkpointing import load_pytree, save_pytree
from lmrl_gym_tpu.core.logs import LogTuple, combine_logs, get_tensor_stats, pull_logs
from lmrl_gym_tpu.parallel.mesh import (
    batch_spec,
    load_mesh,
    match_partition_rules,
    shard_pytree,
    with_sharding_constraint,
)


class TestBlocking:
    def test_right_pad(self):
        out = block_sequences(
            [[1, 2], [3]],
            pad_value=0,
            dtype=np.int32,
            strategy=BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, 4),
        )
        np.testing.assert_array_equal(out, [[1, 2, 0, 0], [3, 0, 0, 0]])

    def test_left_pad_left_trunc(self):
        out = block_sequences(
            [[1, 2, 3, 4, 5], [9]],
            pad_value=-1,
            dtype=np.int32,
            strategy=BlockingStrategy(Padding.LEFT, Truncation.LEFT, 3),
        )
        np.testing.assert_array_equal(out, [[3, 4, 5], [-1, -1, 9]])

    def test_right_trunc(self):
        out = block_sequences(
            [[1, 2, 3, 4]],
            pad_value=0,
            dtype=np.int32,
            strategy=BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, 2),
        )
        np.testing.assert_array_equal(out, [[1, 2]])

    def test_none_max_length(self):
        out = block_sequences(
            [[1], [2, 3]],
            pad_value=0,
            dtype=np.int32,
            strategy=BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, None),
        )
        assert out.shape == (2, 2)

    def test_strip_prompt(self):
        assert strip_prompt_from_completion("ab", "abcd") == "cd"


class TestLogs:
    def test_tensor_stats(self):
        x = jnp.asarray([1.0, 2.0, 3.0, 100.0])
        mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        stats = get_tensor_stats(x, mask, 3)
        assert np.isclose(stats["mean"], 2.0)
        assert np.isclose(stats["min"], 1.0)
        assert np.isclose(stats["max"], 3.0)

    def test_combine_weighted(self):
        a = {"loss": LogTuple(jnp.float32(1.0), 1)}
        b = {"loss": LogTuple(jnp.float32(3.0), 3)}
        merged = pull_logs(combine_logs([a, b]))
        assert np.isclose(merged["loss"], 2.5)

    def test_combine_scalars(self):
        merged = pull_logs(combine_logs([{"x": 1.0}, {"x": 3.0}]))
        assert np.isclose(merged["x"], 2.0)

    def test_min_max_keys(self):
        a = {"s": {"min": 1.0, "max": 5.0}}
        b = {"s": {"min": 0.5, "max": 7.0}}
        merged = pull_logs(combine_logs([a, b]))
        assert merged["s"]["min"] == 0.5
        assert merged["s"]["max"] == 7.0


class TestCheckpointing:
    def test_roundtrip(self):
        tree = {
            "a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "b": np.asarray(3, dtype=np.int32),
        }
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "ckpt.msgpack")
            save_pytree(tree, path)
            out = load_pytree(path, target=tree)
            np.testing.assert_array_equal(out["a"]["w"], tree["a"]["w"])
            np.testing.assert_array_equal(out["b"], tree["b"])

    def test_no_target(self):
        tree = {"x": {"y": np.ones(3)}}
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "c.msgpack")
            save_pytree(tree, path)
            out = load_pytree(path)
            np.testing.assert_array_equal(out["x"]["y"], np.ones(3))

    def test_dtype_cast(self):
        tree = {"w": np.ones(4, dtype=np.float32)}
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "c.msgpack")
            save_pytree(tree, path, dtype=jnp.bfloat16)
            out = load_pytree(path)
            assert out["w"].dtype == jnp.bfloat16


class TestMesh:
    def test_load_mesh_remainder(self):
        mesh = load_mesh((1, -1, 2))
        assert mesh.devices.shape == (1, 4, 2)
        assert mesh.axis_names == ("dp", "fsdp", "mp")

    def test_match_partition_rules(self):
        params = {"dense1": {"kernel": np.ones((4, 4)), "bias": np.ones(4)}}
        rules = [
            ("dense1/kernel", PS("fsdp", "mp")),
            (".*", PS()),
        ]
        specs = match_partition_rules(rules, params)
        assert specs["dense1"]["kernel"] == PS("fsdp", "mp")
        assert specs["dense1"]["bias"] == PS()

    def test_unmatched_raises(self):
        with pytest.raises(ValueError):
            match_partition_rules([("nope", PS())], {"w": np.ones(2)})

    def test_shard_and_constrain(self):
        mesh = load_mesh((1, 4, 2))
        x = np.ones((8, 16), dtype=np.float32)
        sharded = shard_pytree({"x": x}, {"x": PS(("dp", "fsdp"), "mp")}, mesh)
        assert sharded["x"].sharding.is_fully_addressable

        @jax.jit
        def f(v):
            return with_sharding_constraint(v * 2, mesh, batch_spec(1))

        out = f(sharded["x"])
        np.testing.assert_array_equal(np.asarray(out), x * 2)


# ---------------------------------------------------------------------------
# core.io: bucket-transparent IO + jsonl helpers
# ---------------------------------------------------------------------------


def test_io_open_with_bucket_local(tmp_path):
    from lmrl_gym_tpu.core import io

    p = str(tmp_path / "sub" / "dir" / "x.txt")  # parents auto-created
    with io.open_with_bucket(p, "w") as f:
        f.write("hello")
    assert io.exists_with_bucket(p)
    with io.open_with_bucket(p) as f:
        assert f.read() == "hello"
    io.delete_with_bucket(p)
    assert not io.exists_with_bucket(p)
    assert io.is_bucket_path("gcs://b/k") and io.is_bucket_path("gs://b/k")
    assert not io.is_bucket_path("/local/path")


def test_io_jsonl_roundtrip(tmp_path):
    from lmrl_gym_tpu.core import io

    p = str(tmp_path / "d.jsonl")
    items = [{"a": 1}, {"b": [1, 2]}, "str"]
    io.jsonl_dump(items, p)
    assert io.jsonl_load(p) == items
    assert list(io.jsonl_stream(p)) == items


def test_io_distributed_init_single_host_noop():
    from lmrl_gym_tpu.core import io

    io.distributed_init()  # must not raise on single host
    assert io.is_main_process()
