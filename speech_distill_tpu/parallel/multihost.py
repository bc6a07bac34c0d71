"""Multi-host (DCN) runtime: multi-process JAX over hosts x local chips.

The reference has no distributed story at all (SURVEY §2.5: single process,
``device_map="auto"``, no torch.distributed import anywhere). On TPU pods
the native scaling model is one Python process per host, each driving its
local chips, connected by ``jax.distributed`` over DCN; the SAME GSPMD
programs then run unchanged — the named mesh simply spans every process's
devices and XLA routes collectives over ICI within a slice and DCN across
slices. This module holds everything that is process-topology-aware:

  * :func:`initialize` — the ``jax.distributed.initialize`` entry point
    (flags or SDT_* env), with CPU-backend Gloo collectives for the
    virtual multi-process test rig (2 processes x 4 CPU devices — the
    standard JAX substitute for a multi-host pod, same idea as the
    8-virtual-device single-process mesh in tests/conftest.py).
  * :func:`make_global_batch` — per-host data loading: each host collates
    only its own shard of examples (core/trainer.shuffled_stream already
    splits the stream by ``host_index``) and the local arrays are stitched
    into global ``jax.Array``s with
    ``jax.make_array_from_process_local_data``.
  * :func:`fetch_replicated` — host-side fetch of (possibly cross-process
    sharded) pytrees for export; plain ``jax.device_get`` raises on
    non-addressable shards.

Checkpointing needs no special casing: Orbax coordinates multi-process
saves itself once ``jax.distributed`` is initialized — every process calls
``save`` and writes only its addressable shards (core/trainer.train_loop
passes the on-device state through when ``jax.process_count() > 1``).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Connect this process to the cluster. Returns True if distributed
    mode was entered (False = single-process run; no-op).

    Arguments fall back to SDT_COORDINATOR / SDT_NUM_PROCESSES /
    SDT_PROCESS_ID, so launchers can configure workers purely through the
    environment. On real TPU pods all three may be omitted entirely —
    ``jax.distributed.initialize()`` auto-detects the slice topology from
    the TPU metadata — but an explicit coordinator always wins.

    Must run before the first backend touch (first ``jax.devices()`` /
    array op); JAX raises otherwise.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "SDT_COORDINATOR")
    if num_processes is None and os.environ.get("SDT_NUM_PROCESSES"):
        num_processes = int(os.environ["SDT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SDT_PROCESS_ID"):
        process_id = int(os.environ["SDT_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    if num_processes is not None and num_processes <= 1:
        return False
    # CPU backend: cross-process collectives need a transport; Gloo is the
    # in-tree one (TPU uses ICI/DCN natively and ignores this setting).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_primary() -> bool:
    return jax.process_index() == 0


def local_batch_size(global_batch: int) -> int:
    """Rows of the global batch this host must supply."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"process count {n}")
    return global_batch // n


def _batch_spec(mesh: Mesh, v, microbatched: bool) -> P:
    """Same spec rules as parallel.sharding.shard_batch: batch dim over dp,
    seq dim over sp when it divides."""
    lead = (None, "dp") if microbatched else ("dp",)
    sp = dict(mesh.shape).get("sp", 1)
    if (sp > 1 and hasattr(v, "ndim") and v.ndim > len(lead)
            and v.shape[len(lead)] % sp == 0):
        return P(*lead, "sp")
    return P(*lead)


def make_global_batch(mesh: Mesh, batch: Dict[str, Any],
                      microbatched: bool = True) -> Dict[str, Any]:
    """Assemble per-host local batches into global dp-sharded jax.Arrays.

    ``batch`` holds THIS host's rows only (batch dim = global/num_processes;
    the microbatch axis, when present, is global). Single-process this is
    exactly ``sharding.shard_batch``. Multi-process, each leaf becomes a
    global array whose addressable shards are backed by the local data —
    no cross-host transfer happens at placement time.
    """
    if jax.process_count() == 1:
        from speech_distill_tpu.parallel.sharding import shard_batch
        return shard_batch(mesh, batch, microbatched=microbatched)
    n = jax.process_count()
    bdim = 1 if microbatched else 0
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        spec = _batch_spec(mesh, _GlobalView(v, bdim, n), microbatched)
        gshape = list(v.shape)
        if v.ndim > bdim:
            gshape[bdim] = v.shape[bdim] * n
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec if v.ndim > bdim else P()),
            v, global_shape=tuple(gshape))
    return out


class _GlobalView:
    """Shape proxy presenting the GLOBAL shape of a local batch leaf, so
    the sp-divisibility rule in :func:`_batch_spec` sees global dims."""

    def __init__(self, v: np.ndarray, bdim: int, n: int):
        shape = list(v.shape)
        if v.ndim > bdim:
            shape[bdim] = v.shape[bdim] * n
        self.shape = tuple(shape)
        self.ndim = v.ndim


def fetch_replicated(tree):
    """Fetch a (possibly cross-process sharded) pytree to host numpy.

    Replicates through a jit identity first — ``jax.device_get`` cannot
    read shards living on another process's devices; after replication
    every process holds a full addressable copy.
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    mesh = _any_mesh(tree)
    if mesh is None:
        return jax.device_get(tree)
    rep = jax.jit(lambda t: t,
                  out_shardings=jax.tree.map(
                      lambda _: NamedSharding(mesh, P()), tree))(tree)
    return jax.device_get(rep)


def _any_mesh(tree) -> Optional[Mesh]:
    for leaf in jax.tree.leaves(tree):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding):
            return s.mesh
    return None


def barrier(name: str = "sdt_barrier") -> None:
    """Cross-process synchronization point (e.g. before reading a
    checkpoint another process just finished writing)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
