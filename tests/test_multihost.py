"""Multi-host (DCN) runtime tests.

The reference has no distributed story (SURVEY §2.5); the rebuild's
multi-host layer (parallel/multihost.py) is proven here two ways:

* fast: single-process semantics of every helper (make_global_batch ==
  shard_batch, local_batch_size arithmetic, fetch_replicated pass-through)
  — these run in the default suite;
* slow: the full 2-process x 4-virtual-CPU-device dry run
  (parallel/multihost_dryrun.py) in subprocesses — jax.distributed over
  Gloo, dp crossing process boundaries, online-sparse KD step bit-matching
  the single-process step, multi-process Orbax save/restore, and a
  train_loop segment with per-host batch iterators.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_distill_tpu.parallel import multihost
from speech_distill_tpu.parallel import mesh as meshlib
from speech_distill_tpu.parallel import sharding
from speech_distill_tpu.core.config import MeshConfig


def test_local_batch_size():
    # single process: identity (and the divisibility guard is unreachable)
    assert multihost.local_batch_size(8) == 8


def test_initialize_noop_single_process():
    # no coordinator configured -> single-process run, returns False
    assert multihost.initialize(None, None, None) is False
    assert multihost.initialize(None, 1, 0) is False


def test_make_global_batch_matches_shard_batch_single_process():
    mesh = meshlib.make_mesh(MeshConfig(dp=2, sp=2, tp=2))
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(0, 100, (2, 4, 16)).astype(np.int32),
        "attention_mask": np.ones((2, 4, 16), np.int32),
    }
    a = multihost.make_global_batch(mesh, batch)
    b = sharding.shard_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding


def test_fetch_replicated_single_process_passthrough():
    tree = {"w": jnp.arange(8.0), "b": jnp.ones((2, 2))}
    out = multihost.fetch_replicated(tree)
    np.testing.assert_array_equal(out["w"], np.arange(8.0))
    np.testing.assert_array_equal(out["b"], np.ones((2, 2)))


def test_global_view_shape_proxy():
    v = np.zeros((2, 4, 16))
    g = multihost._GlobalView(v, bdim=1, n=2)
    assert g.shape == (2, 8, 16)
    assert g.ndim == 3


@pytest.mark.slow
def test_multihost_dryrun_2proc():
    """2 processes x 4 devices: jax.distributed + Gloo, dp across DCN,
    KD-step exactness vs single-process, multihost Orbax, train_loop."""
    from speech_distill_tpu.parallel.multihost_dryrun import launch
    launch(2, 4, timeout=840)
