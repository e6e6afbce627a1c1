import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4 test strategy).
#
# NOTE: this environment ships a sitecustomize that registers a TPU PJRT
# plugin in every interpreter and pins JAX_PLATFORMS to it; the chip is a
# single-grant resource, so a second process touching it deadlocks. Hence:
# scrub the env BEFORE importing jax, then force the platform via config
# (env vars alone are overridden by the plugin registration).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
