"""Test config: force an 8-virtual-device CPU platform before backends init.

The standard JAX substitute for multi-chip testing without a real pod
(SURVEY §4): meshes/collectives run on 8 host devices. The axon TPU plugin
registers itself via sitecustomize and overrides JAX_PLATFORMS, so we must
override jax.config directly (before any backend is initialized).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's concurrency-optimized HLO schedule lets the thunk executor run
# INDEPENDENT collectives of one SPMD program concurrently; on a small host
# the 8 partitions then block the worker pool at CROSSED rendezvous points
# (partition A waits at all-gather op X while its partner waits at
# collective-permute op Y) — a hard deadlock that XLA aborts after its 40s
# rendezvous timeout (SIGABRT, "Termination timeout ... Exiting to ensure a
# consistent program state"). Reproduced deterministically as any big
# torch-oracle file followed by the dp2.sp2.tp2 ring-attention KD test;
# raising the timeout to 600s still aborts (true deadlock, not a
# straggler). The memory-optimized schedule serializes those collective
# chains and fixes the full --runslow suite.
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
# Starvation insurance: this box has ONE host core, so 8-partition
# rendezvous progress depends on the thunk executor getting scheduled;
# any concurrent CPU load (another test, a torch oracle, a background
# build) can hold a collective past XLA's default terminate timeout and
# the process is SIGABRTed even though nothing is deadlocked. With the
# deadlock classes above fixed, a slow rendezvous should wait, not die.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags
os.environ["TOKENIZERS_PARALLELISM"] = "false"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Second half of the deadlock fix (see the XLA_FLAGS comment above): async
# dispatch lets TWO dispatched programs execute concurrently (e.g. a train
# step still in flight when the eval step's device_get blocks —
# test_pipelines.py::test_train_cli_sequence_parallel crashed exactly
# there), so their collectives can interleave on the worker pool even with
# per-program chains serialized. Synchronous dispatch removes cross-program
# crossing; measured test-suite cost ~nil (compile-bound).
jax.config.update("jax_cpu_enable_async_dispatch", False)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (full ~11min suite)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running; skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    import pytest
    skip = pytest.mark.skip(reason="slow: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
