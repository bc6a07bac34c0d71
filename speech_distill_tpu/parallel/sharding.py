"""Sharding rules for training state: how params/batches land on the mesh.

The reference has no distributed story (SURVEY §2.5); these rules are the
TPU design: dp shards the batch, tp shards attention heads / mlp hidden /
vocab. XLA (GSPMD) inserts the collectives (psum of grads over dp,
all-gather/reduce-scatter around tp matmuls) from these annotations alone.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speech_distill_tpu.core.config import LoraConfig, Qwen3Config
from speech_distill_tpu.models.qwen3 import param_pspecs

Params = Dict[str, Any]

# lora target -> is the *output* dim tp-sharded on the base weight?
_OUT_SHARDED = {"q": True, "k": True, "v": True, "gate": True, "up": True,
                "o": False, "down": False}


def mesh_has_pp(mesh: Mesh) -> bool:
    return int(dict(mesh.shape).get("pp", 1)) > 1


def lora_pspecs(lora_params: Params, pp: bool = False) -> Params:
    """PartitionSpecs for a LoRA pytree produced by ``init_lora``.

    A [L, din, r] / B [L, r, dout]: shard the dim that the base weight
    shards (dout for q/k/v/gate/up; din for o/down); rank r is tiny and
    stays replicated. Full-rank embed/lm_head copies shard vocab over tp.
    ``pp`` shards the leading layer-stack axis (pipeline parallelism).
    """
    lead = "pp" if pp else None
    specs: Params = {}
    if "layers" in lora_params:
        specs["layers"] = {}
        for group, mods in lora_params["layers"].items():
            specs["layers"][group] = {}
            for key, ab in mods.items():
                if _OUT_SHARDED[key]:
                    specs["layers"][group][key] = {
                        "a": P(lead, None, None), "b": P(lead, None, "tp")}
                else:
                    specs["layers"][group][key] = {
                        "a": P(lead, "tp", None), "b": P(lead, None, None)}
    if "embed" in lora_params:
        specs["embed"] = {"weight": P("tp", None)}
    if "lm_head" in lora_params:
        specs["lm_head"] = {"weight": P("tp", None)}
    return specs


def make_sharder(mesh: Mesh):
    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)
    return put


def shard_params(mesh: Mesh, params: Params, cfg: Qwen3Config) -> Params:
    from speech_distill_tpu.ops.quant import is_quantized_leaf

    def place(x, s):
        if is_quantized_leaf(x):
            # quantized leaves (int8/int4/nf4 dicts) replicate whole: their
            # aux arrays (scales, blockwise absmax) don't decompose along
            # the tp axis, and a quantized teacher is small by construction
            return jax.tree.map(
                lambda v: jax.device_put(v, NamedSharding(mesh, P())), x)
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(place, params, param_pspecs(cfg, pp=mesh_has_pp(mesh)),
                        is_leaf=is_quantized_leaf)


def shard_lora(mesh: Mesh, lora_params: Params) -> Params:
    put = make_sharder(mesh)
    return put(lora_params, lora_pspecs(lora_params, pp=mesh_has_pp(mesh)))


def _zero1_widen(spec: P, shape, mesh: Mesh) -> P:
    """ZeRO-1 moment spec: additionally shard the leading axis over dp
    when it divides. Expressed purely as shardings: with moments sharded
    over ("tp","dp") on the vocab axis (embed/lm_head — the ~2.6 GB fp32
    of AdamW state on the 0.6B student), GSPMD reduce-scatters the grads
    into the moment shards, updates locally, and all-gathers the fresh
    params back to their P("tp", None) layout — the ZeRO-1 dataflow with
    no manual collectives."""
    dp = int(dict(mesh.shape).get("dp", 1))
    tp = int(dict(mesh.shape).get("tp", 1))
    if dp <= 1 or not isinstance(spec, P) or not len(spec) or not shape:
        return spec
    first = spec[0]
    if first is None and shape[0] % dp == 0:
        return P(("dp",), *tuple(spec)[1:])
    if first == "tp" and shape[0] % (tp * dp) == 0:
        return P(("tp", "dp"), *tuple(spec)[1:])
    return spec


def shard_opt_state(mesh: Mesh, opt_state, trainable_specs: Params,
                    zero1: bool = False):
    """Shard optimizer state: any subtree STRUCTURALLY matching the
    trainable tree (the mu/nu moment trees, wherever optax nests them)
    follows the param specs — with ``zero1``, moments additionally
    dp-shard their leading axis (see :func:`_zero1_widen`); everything
    else (counts, schedules) is replicated.

    The match is by tree structure, not leaf count: optax's chain state
    nests ``ScaleByAdamState`` inside tuples, so a whole-component leaf
    count never equals the trainable tree's (count + mu + nu leaves) —
    the previous heuristic silently placed the moments replicated."""
    flat_specs, spec_tree = jax.tree.flatten(trainable_specs)

    def place(subtree):
        leaves = jax.tree.leaves(subtree)
        specs = ([_zero1_widen(s, l.shape, mesh)
                  for l, s in zip(leaves, flat_specs)]
                 if zero1 else flat_specs)
        placed = [jax.device_put(l, NamedSharding(mesh, s))
                  for l, s in zip(leaves, specs)]
        return jax.tree.unflatten(jax.tree.structure(subtree), placed)

    def walk(node):
        if jax.tree.structure(node) == spec_tree:
            return place(node)
        if isinstance(node, tuple):             # incl. namedtuples
            vals = [walk(c) for c in node]
            return (type(node)(*vals) if hasattr(node, "_fields")
                    else tuple(vals))
        if isinstance(node, list):
            return [walk(c) for c in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), node)

    return walk(opt_state)


def shard_batch(mesh: Mesh, batch: Dict[str, Any],
                microbatched: bool = True) -> Dict[str, Any]:
    """dp shards the batch dim (axis 1 when a leading microbatch axis A is
    present, else axis 0). On a mesh with a real sp axis, the sequence dim
    (the axis after batch) additionally shards over sp — GSPMD keeps every
    position-local op sharded and ring attention handles the mixing."""
    lead = (None, "dp") if microbatched else ("dp",)
    sp = dict(mesh.shape).get("sp", 1)

    def spec_for(v) -> P:
        if (sp > 1 and hasattr(v, "ndim") and v.ndim > len(lead)
                and v.shape[len(lead)] % sp == 0):
            return P(*lead, "sp")
        return P(*lead)

    return {k: jax.device_put(v, NamedSharding(mesh, spec_for(v)))
            for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    put = make_sharder(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
