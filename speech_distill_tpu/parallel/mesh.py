"""Device mesh + sharding layer.

The reference implements no parallelism at all (SURVEY §2.5: single process,
``device_map="auto"``, no torch.distributed). This module is the green-field
TPU-native replacement: a named ``jax.sharding.Mesh`` over ICI with GSPMD
collectives inserted by XLA from ``NamedSharding`` annotations.

Axes:
  dp — data parallel (batch dim)
  pp — pipeline parallel (layer-stack stages; GPipe microbatch schedule)
  sp — sequence/context parallel (activation seq dim; ring attention)
  tp — tensor parallel (attention heads / mlp hidden / vocab)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speech_distill_tpu.core.config import MeshConfig

DP_AXIS = "dp"
PP_AXIS = "pp"
SP_AXIS = "sp"
TP_AXIS = "tp"


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (dp, pp, sp, tp) mesh over the given devices (default: all).

    pp/sp default to 1, so existing (dp, tp) layouts are unchanged — specs
    name axes, never positions, so the extra unit axes are invisible to
    NamedSharding users."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = max(1, cfg.tp)
    sp = max(1, getattr(cfg, "sp", 1))
    pp = max(1, getattr(cfg, "pp", 1))
    if n % (tp * sp * pp) != 0:
        raise ValueError(
            f"device count {n} not divisible by pp*sp*tp={pp * sp * tp}")
    dp = cfg.dp if cfg.dp > 0 else n // (tp * sp * pp)
    if dp * pp * sp * tp != n:
        raise ValueError(
            f"dp*pp*sp*tp={dp * pp * sp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, pp, sp, tp)
    return Mesh(arr, (DP_AXIS, PP_AXIS, SP_AXIS, TP_AXIS))


def serialize_collective_chains(dep, x):
    """On XLA:CPU, order the consumer of ``x`` after ``dep`` completes.

    A program with two data-INDEPENDENT collective chains (e.g. the online
    KD step's teacher forward and student forward over one mesh) can
    cross-deadlock XLA:CPU's thunk executor on a small host: each
    partition's workers block inside a different chain's rendezvous until
    the pool is exhausted, and XLA aborts the process after its rendezvous
    timeout ("Termination timeout ... Exiting to ensure a consistent
    program state"; see tests/conftest.py). Tying the chains with an
    optimization barrier (every output of the barrier depends on every
    input) makes the second chain start only after the first finishes —
    free on a 1-core host, where the chains could never actually overlap.

    On TPU this returns ``x`` untouched: collectives are hardware-ordered
    per program there, and teacher/student overlap is profitable.
    """
    if jax.default_backend() != "cpu":
        return x
    return jax.lax.optimization_barrier((dep, x))[1]


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1, 1),
                (DP_AXIS, PP_AXIS, SP_AXIS, TP_AXIS))


_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    """Register the mesh that ops needing explicit collectives (ring
    attention's shard_map) should use. GSPMD-only paths never read this;
    pipelines set it once right after ``make_mesh``."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


class active_mesh:
    """Context manager form of :func:`set_active_mesh` (tests)."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVE_MESH
        self.prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self.prev
        return False


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading batch dim over dp, replicate the rest."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with batch-dim sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def logical_constraint(x, mesh: Mesh, spec: P):
    """Annotate an intermediate activation with a sharding constraint."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
