"""Disaggregated teacher extraction: the teacher serves top-K logits from
its own mesh slice, pipelined ahead of the student KD step.

The reference has no equivalent (single GPU: the teacher either shares the
device inside the training step, reference train.py:60-94, or is run
offline by extract_teacher_logits.py). On a TPU slice there is a third,
strictly better regime when both fit: give the teacher its own devices.

  * two disjoint meshes over one process' devices: student (dp x sp x tp)
    and teacher (dp x tp);
  * the teacher runs the same extraction program as online KD (forward +
    top-K over the student vocab), jitted over its mesh;
  * JAX async dispatch pipelines them: extraction of batch n+1 is
    dispatched before the student step of batch n is awaited, so steady
    state runs at max(teacher_time, student_time) instead of their sum —
    and the student step stops paying the teacher's HBM footprint;
  * the student consumes the stream through the *precomputed* KD step —
    bitwise the same loss as online KD when extraction is exact
    (distill/losses.extract_top_k method='exact'), proven in
    tests/test_disaggregate.py.

Transport: top-K artifacts are tiny (fp16 values + int32 indices, ~0.4% of
dense logits — BASELINE.md's 99.7% reduction), so the service moves them
teacher-mesh -> host -> student-mesh; a pod-scale deployment can swap the
hop for a direct cross-mesh device_put without touching callers.
"""
from __future__ import annotations

from collections import deque
from typing import Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TeacherService:
    """Depth-bounded pipeline of teacher extractions on a dedicated mesh.

    ``extract_fn(teacher_params, ids, mask) -> (v, i)`` is jitted here over
    ``mesh``; ``submit`` dispatches asynchronously (JAX futures), ``get``
    blocks on the oldest in-flight extraction.
    """

    def __init__(self, teacher_params, extract_fn: Callable, mesh: Mesh,
                 depth: int = 2):
        self.mesh = mesh
        self.depth = max(1, depth)
        self.params = teacher_params
        self._extract = jax.jit(extract_fn)
        self._inflight: deque = deque()

    def submit(self, ids: np.ndarray, mask: np.ndarray) -> None:
        """Dispatch extraction of one [N, T] batch; returns immediately."""
        sh = NamedSharding(self.mesh, P("dp"))
        ids_d = jax.device_put(np.asarray(ids), sh)
        mask_d = jax.device_put(np.asarray(mask), sh)
        self._inflight.append(self._extract(self.params, ids_d, mask_d))

    def get(self):
        """Block on the oldest in-flight extraction; host (v, i) arrays."""
        v, i = self._inflight.popleft()
        v, i = jax.device_get((v, i))
        return v, i

    def __len__(self) -> int:
        return len(self._inflight)


def make_teacher_service(teacher_params, teacher_cfg, mesh: Mesh, *,
                         top_k: int, student_vocab_size: int,
                         method: str = "exact", recall: float = 0.95,
                         extract_fn: Optional[Callable] = None,
                         shard: bool = True,
                         depth: int = 2) -> TeacherService:
    """Service running the standard Qwen3 teacher extraction (forward +
    top-K over the student vocab — the online-KD extraction, reference
    train.py:74-94). Pass ``extract_fn`` to serve a different teacher
    (e.g. models/cosyvoice2.make_teacher_extract) and ``shard=False`` when
    the params are already placed on this mesh (non-qwen3 pytrees)."""
    from speech_distill_tpu.distill import losses
    from speech_distill_tpu.models import qwen3
    from speech_distill_tpu.parallel.sharding import shard_params

    if extract_fn is None:
        def extract_fn(tp, ids, mask):
            logits = qwen3.forward(tp, ids, teacher_cfg,
                                   attention_mask=mask)
            return losses.extract_top_k(
                logits, top_k, student_vocab_size=student_vocab_size,
                method=method, recall=recall)

    params_s = shard_params(mesh, teacher_params, teacher_cfg) if shard \
        else teacher_params
    return TeacherService(params_s, extract_fn, mesh, depth=depth)


def pipeline_batches(batches: Iterable[Dict[str, np.ndarray]],
                     service: TeacherService) -> Iterator[Dict[str, np.ndarray]]:
    """Adapt a host-batch iterator for the precomputed KD step by streaming
    teacher_top_k_v/i through the service, keeping up to ``service.depth``
    extractions in flight ahead of the consumer.

    Batches carry microbatched [A, B, T] arrays (core/trainer.batches_from);
    extraction flattens to [A*B, T] and the artifacts reshape back to
    [A, B, T, K]. Teacher and student sequences must be position-aligned
    (the same requirement online KD has; data/template.align_prefixes
    guarantees it).
    """
    pending: deque = deque()

    def attach(hb: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        v, i = service.get()
        A, B, T = hb["input_ids"].shape
        if v.shape[:1] != (A * B,) or v.shape[1] != T:
            raise ValueError(
                f"teacher artifacts {v.shape} misaligned with student batch "
                f"{(A, B, T)}; online KD requires position-aligned "
                f"teacher/student sequences")
        out = dict(hb)
        out["teacher_top_k_v"] = v.reshape(A, B, T, -1)
        out["teacher_top_k_i"] = i.reshape(A, B, T, -1)
        return out

    for hb in batches:
        ids = np.asarray(hb.get("teacher_input_ids", hb["input_ids"]))
        mask = np.asarray(hb.get("teacher_attention_mask",
                                 hb["attention_mask"]))
        A, B, T = ids.shape
        service.submit(ids.reshape(A * B, T), mask.reshape(A * B, T))
        pending.append(hb)
        if len(pending) > service.depth:
            yield attach(pending.popleft())
    while pending:
        yield attach(pending.popleft())


def split_devices(n_teacher: int, devices=None):
    """Partition the process' devices: trailing ``n_teacher`` for the
    teacher mesh, the rest for the student mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if not 0 < n_teacher < len(devices):
        raise ValueError(
            f"teacher_devices={n_teacher} must be in (0, {len(devices)})")
    return devices[:-n_teacher], devices[-n_teacher:]
