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

    rows = []
    for m in [int(x) for x in args.micro.split(",")]:
        cfg = type(base_cfg)(**{
            **base_cfg.__dict__, "dtype": "float32", "remat": True,
            "hidden_size": args.hidden, "num_layers": args.layers,
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


if __name__ == "__main__":
    main()
