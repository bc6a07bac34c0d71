"""Test config: force an 8-virtual-device CPU platform before backends init.

The standard JAX substitute for multi-chip testing without a real pod
(SURVEY §4): meshes/collectives run on 8 host devices. The axon TPU plugin
registers itself via sitecustomize and overrides JAX_PLATFORMS, so we must
override jax.config directly (before any backend is initialized).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["TOKENIZERS_PARALLELISM"] = "false"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
