"""GPipe vs 1F1B activation-memory accounting (VERDICT-r3 #8).

1F1B's classic win over GPipe is peak activation memory: GPipe holds all
M microbatches' forward stash before any backward starts; 1F1B bounds
the stash to the pipeline depth S. This script measures what that stash
actually IS in this codebase's pipeline (parallel/pipeline.py) by
compiling the pipelined model gradient at increasing microbatch counts M
and reading XLA's compiled peak-memory analysis: the d(peak)/dM slope is
the per-microbatch stash GPipe pays and 1F1B would cap at S.

Run on the 8-virtual-CPU mesh (no TPU claim):
    python scripts/pp_memory_accounting.py [--layers 8] [--hidden 256]
        [--batch 16] [--seq 256] [--micro 2,4,8]

Interpretation guide (see docs/ROUND4.md "1F1B analysis"): with full
per-layer remat (this repo's measured-optimal policy), the forward stash
per microbatch is only the stage-boundary carries, so the slope is
~mb*T*D bytes — compare it against the step's total peak to decide
whether a hand-scheduled 1F1B is worth building.
"""
import argparse
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "concurrency_optimized_scheduler" not in flags:
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--micro", default="2,4,8")
    ap.add_argument("--pp", type=int, default=2)
    ap.add_argument("--schedule", choices=["slope", "both"], default="slope",
                    help="slope: d(peak)/dM of the GPipe-by-autodiff step; "
                         "both: compile GPipe-by-autodiff AND the "
                         "hand-scheduled 1F1B (pipelined_grads_1f1b) on the "
                         "same stack and print both compiled peaks per M")
    args = ap.parse_args()

    from speech_distill_tpu.core.config import MeshConfig, qwen3_tiny
    from speech_distill_tpu.models import qwen3
    from speech_distill_tpu.parallel import mesh as meshlib
    from speech_distill_tpu.parallel import sharding

    n_dev = len(jax.devices())
    tp = 2
    pp = args.pp
    mesh = meshlib.make_mesh(
        MeshConfig(dp=n_dev // (tp * pp), sp=1, pp=pp, tp=tp),
        devices=jax.devices()[:n_dev])
    meshlib.set_active_mesh(mesh)

    base_cfg = qwen3_tiny(256)
    B, T = args.batch, args.seq
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (B, T)), jnp.int32)
    ids = jax.device_put(ids, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp")))

    def peak_bytes(cfg, params):
        def loss_fn(p):
            out = qwen3.forward(p, ids, cfg)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        grad = jax.jit(jax.grad(loss_fn))
        compiled = grad.lower(params).compile()
        mem = compiled.memory_analysis()
        if mem is None:
            raise SystemExit("memory_analysis unavailable on this backend")
        return {
            "temp": int(mem.temp_size_in_bytes),
            "args": int(mem.argument_size_in_bytes),
            "out": int(mem.output_size_in_bytes),
        }

    if args.schedule == "both":
        return direct_both(args, mesh, base_cfg)

    rows = []
    for m in [int(x) for x in args.micro.split(",")]:
        cfg = type(base_cfg)(**{
            **base_cfg.__dict__, "dtype": "float32", "remat": True,
            "hidden_size": args.hidden, "num_hidden_layers": args.layers,
            "intermediate_size": 2 * args.hidden,
            "pp_microbatches": m})
        params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
        params = sharding.shard_params(mesh, params, cfg)
        r = {"M": m, **peak_bytes(cfg, params)}
        rows.append(r)
        print(f"M={r['M']:>3}  temp={r['temp']/2**20:9.2f} MiB  "
              f"args={r['args']/2**20:9.2f} MiB", flush=True)

    if len(rows) >= 2:
        dm = rows[-1]["M"] - rows[0]["M"]
        slope = (rows[-1]["temp"] - rows[0]["temp"]) / max(dm, 1)
        mb0 = B // rows[0]["M"]
        carry = mb0 * T * args.hidden * 4
        print(f"\nper-microbatch stash slope: {slope/2**20:.3f} MiB "
              f"(one [mb,T,D] f32 carry at M={rows[0]['M']} is "
              f"{carry/2**20:.3f} MiB)")
        s = pp
        gpipe_stash = slope * rows[-1]["M"]
        f1b1_stash = slope * s
        print(f"GPipe stash at M={rows[-1]['M']}: "
              f"{gpipe_stash/2**20:.2f} MiB; 1F1B bound (S={s}): "
              f"{f1b1_stash/2**20:.2f} MiB; step peak temp: "
              f"{rows[-1]['temp']/2**20:.2f} MiB -> 1F1B would save "
              f"{(gpipe_stash - f1b1_stash)/max(rows[-1]['temp'],1)*100:.1f}%"
              f" of peak")


def direct_both(args, mesh, base_cfg):
    """Compile GPipe-by-autodiff and the hand-scheduled 1F1B on the SAME
    layer stack + microbatched head loss and print XLA's compiled peak temp
    for each — the direct form of the stash accounting (1F1B's cross-tick
    stash is min(M, 2S-1) microbatch activations vs GPipe's M + S - 1;
    see parallel/pipeline.py:_1f1b_body)."""
    from speech_distill_tpu.models import qwen3
    from speech_distill_tpu.parallel.pipeline import (
        pipelined_layers, pipelined_grads_1f1b)

    cfg = type(base_cfg)(**{
        **base_cfg.__dict__, "dtype": "float32", "remat": True,
        "hidden_size": args.hidden, "num_hidden_layers": args.layers,
        "intermediate_size": 2 * args.hidden})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    layers = params["layers"]
    D = cfg.hidden_size
    B, T, V = args.batch, args.seq, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, T, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(0, 0.05, (D, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    cos, sin = qwen3.rope_angles(positions, cfg.head_dim, cfg.rope_theta)
    bias = qwen3._causal_bias(jnp.ones((B, T), jnp.int32), B, T)

    def layer_fn(lp, h, la, c, s_, m_):
        return qwen3._layer(lp, h, c, s_, m_, cfg, la=la)[0]

    def head_fn(h, hp, aux):
        logp = jax.nn.log_softmax((h @ hp).astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, aux["labels"][..., None], -1)
        return nll.mean()

    def peak(fn, *a):
        compiled = jax.jit(fn).lower(*a).compile()
        mem = compiled.memory_analysis()
        if mem is None:
            raise SystemExit("memory_analysis unavailable on this backend")
        return int(mem.temp_size_in_bytes)

    print("\ncompiled peak temp, same stack + microbatched head loss "
          f"(S={args.pp}):")
    for m in [int(s) for s in args.micro.split(",")]:
        def gpipe_loss(lyrs, x_, hp, m=m):
            h = pipelined_layers(layer_fn, lyrs, None, x_, cos, sin,
                                 bias, mesh, m)
            hm = h.reshape(m, B // m, T, D)
            lm = labels.reshape(m, B // m, T)
            return sum(head_fn(hm[i], hp, {"labels": lm[i]})
                       for i in range(m))

        g = peak(jax.value_and_grad(gpipe_loss, argnums=(0, 1, 2)),
                 layers, x, W)
        f = peak(lambda lyrs, x_, hp, lab, m=m: pipelined_grads_1f1b(
            layer_fn, lyrs, None, x_, cos, sin, bias, head_fn, hp,
            {"labels": lab}, mesh, m), layers, x, W, labels)
        print(f"M={m:>3}  gpipe-autodiff {g/2**20:9.2f} MiB   "
              f"1f1b {f/2**20:9.2f} MiB   ratio {g/max(f,1):.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
