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


def shard_opt_state(mesh: Mesh, opt_state, trainable_specs: Params):
    """Shard optimizer state: param-shaped leaves follow the param spec,
    everything else (counts, schedules) is replicated."""
    flat_specs, _ = jax.tree.flatten(trainable_specs)

    def map_component(component):
        leaves, cdef = jax.tree.flatten(component)
        if len(leaves) == len(flat_specs):
            shardings = [NamedSharding(mesh, s) for s in flat_specs]
            placed = [jax.device_put(l, s) for l, s in zip(leaves, shardings)]
            return jax.tree.unflatten(cdef, placed)
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), component)

    # optax chain state is a tuple of per-transform states
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(map_component(c) for c in opt_state)
    return map_component(opt_state)


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
