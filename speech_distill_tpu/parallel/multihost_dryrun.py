"""Multi-host dry run: 2 processes x 4 virtual CPU devices prove the full
KD step bit-matches single-process, plus a multihost Orbax save/restore.

This is the DCN analog of ``__graft_entry__.dryrun_multichip``: real pods
run one process per host; here each process forces a 4-device virtual CPU
platform and connects through ``jax.distributed`` (Gloo collectives), so
the dp axis of the (dp, pp, sp, tp) mesh genuinely crosses process
boundaries — gradient psum rides the cross-process transport exactly as it
would ride DCN on a multi-slice pod.

Usage:
  launch(n_processes=2, local_devices=4)      # spawns the workers
  python -m speech_distill_tpu.parallel.multihost_dryrun  # same
"""
from __future__ import annotations

import os
import subprocess
import sys

OK_MARK = "MULTIHOST_OK"


def _worker(pid: int, nproc: int, port: int, local_devices: int,
            ckpt_dir: str) -> None:
    import jax
    # must precede backend init; the axon sitecustomize overrides the
    # JAX_PLATFORMS env var, not jax.config (tests/conftest.py pattern)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np
    import jax.numpy as jnp

    from speech_distill_tpu.parallel import multihost
    assert multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == local_devices
    assert len(jax.devices()) == nproc * local_devices

    from speech_distill_tpu.core.config import (
        DistillConfig, LoraConfig, MeshConfig, qwen3_tiny)
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora
    from speech_distill_tpu.models import qwen3
    from speech_distill_tpu.parallel import mesh as meshlib
    from speech_distill_tpu.parallel import sharding

    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    teacher = qwen3.init_params(jax.random.PRNGKey(1), cfg)
    dcfg = DistillConfig(top_k=8, lora=LoraConfig(r=4, alpha=8,
                                                  init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(2), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 20)

    rng = np.random.default_rng(0)
    A, B, T = 2, 8, 32
    full = {
        "input_ids": rng.integers(0, 128, (A, B, T)).astype(np.int32),
        "attention_mask": np.ones((A, B, T), np.int32),
        "labels": rng.integers(0, 128, (A, B, T)).astype(np.int64),
    }

    # ---- single-process reference on local device 0 (no mesh) ----------
    step = train_step.make_kd_step(cfg, dcfg, opt, mode="online_sparse",
                                   teacher_cfg=cfg, donate=False)
    d0 = jax.local_devices()[0]
    put0 = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jax.device_put(jnp.asarray(x), d0), t)
    s0, m0 = step(train_step.init_state(put0(lora), opt), put0(base),
                  put0(teacher), put0(full))
    loss0 = float(m0["loss"])

    # ---- multi-process dp(xDCN) x sp x tp mesh --------------------------
    # dp spans the two processes (process-major device order), sp/tp live
    # on each host's local devices: the pod layout where batch-gradient
    # psum crosses DCN and activation/tensor collectives stay on ICI.
    mesh = meshlib.make_mesh(MeshConfig(dp=nproc, sp=local_devices // 2,
                                        tp=2))
    meshlib.set_active_mesh(mesh)
    cfg_r = type(cfg)(**{**cfg.__dict__, "attn_impl": "ring"})

    # per-host data loading: each process holds only ITS dp rows (the
    # shuffled_stream host_index shard in production)
    nb = B // nproc
    local = {k: v[:, pid * nb:(pid + 1) * nb] for k, v in full.items()}
    batch = multihost.make_global_batch(mesh, local)
    assert batch["input_ids"].shape == (A, B, T)

    step_r = train_step.make_kd_step(cfg_r, dcfg, opt, mode="online_sparse",
                                     teacher_cfg=cfg_r, donate=False)
    base_s = sharding.shard_params(mesh, base, cfg)
    teacher_s = sharding.shard_params(mesh, teacher, cfg)
    lora_s = sharding.shard_lora(mesh, lora)
    st = train_step.init_state(lora_s, opt)
    st = train_step.TrainState(
        lora_s,
        sharding.shard_opt_state(mesh, st.opt_state,
                                 sharding.lora_pspecs(lora)),
        jax.device_put(st.step, meshlib.replicated(mesh)))
    st, m1 = step_r(st, base_s, teacher_s, batch)
    loss1 = float(m1["loss"])

    np.testing.assert_allclose(loss0, loss1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(s0.trainable)),
                    jax.tree.leaves(multihost.fetch_replicated(
                        st.trainable))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

    # ---- multihost Orbax save/restore (every process participates; each
    # writes only its addressable shards to the shared directory) --------
    from speech_distill_tpu.core.checkpoint import CheckpointManager
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    mgr.save(1, st)
    mgr.wait()
    restored = mgr.restore(st, 1)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(multihost.fetch_replicated(
                        st.trainable)),
                    jax.tree.leaves(multihost.fetch_replicated(
                        restored.trainable))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()

    # ---- train_loop end-to-end over the multi-process mesh: per-host
    # batch iterators, make_global_batch placement, primary-only metrics,
    # on-device multi-process Orbax saves inside the loop ---------------
    from speech_distill_tpu.core.trainer import LoopConfig, train_loop
    out_dir = os.path.join(ckpt_dir, "loop")

    def batch_iter(epoch):
        for s in range(3):
            r = np.random.default_rng(100 + s)
            g = {"input_ids": r.integers(0, 128, (A, B, T)).astype(np.int32),
                 "attention_mask": np.ones((A, B, T), np.int32),
                 "labels": r.integers(0, 128, (A, B, T)).astype(np.int64)}
            yield {k: v[:, pid * nb:(pid + 1) * nb] for k, v in g.items()}

    st2 = train_step.init_state(lora_s, opt)
    st2 = train_step.TrainState(
        lora_s,
        sharding.shard_opt_state(mesh, st2.opt_state,
                                 sharding.lora_pspecs(lora)),
        jax.device_put(st2.step, meshlib.replicated(mesh)))
    final = train_loop(
        step_fn=lambda s, b, t, x: step_r(s, b, t, x),
        state=st2, frozen_args=(base_s, teacher_s),
        batch_iter_fn=batch_iter,
        cfg=LoopConfig(num_epochs=1, max_steps=3, logging_steps=1,
                       save_steps=2, output_dir=out_dir,
                       load_best_at_end=False),
        put_batch=lambda b: multihost.make_global_batch(mesh, b))
    assert int(jax.device_get(final.step)) == 3
    if pid == 0:     # primary-only metrics sink (shared fs: check on 0)
        assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    multihost.barrier("dryrun_done")
    print(f"{OK_MARK} proc={pid}/{nproc} mesh={dict(mesh.shape)} "
          f"loss single={loss0:.6f} multihost={loss1:.6f} ckpt=ok",
          flush=True)


def launch(n_processes: int = 2, local_devices: int = 4,
           timeout: int = 900) -> None:
    """Spawn the worker processes and verify every one reports OK."""
    import socket
    import tempfile
    with socket.socket() as s:      # free rendezvous port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    ckpt_dir = tempfile.mkdtemp(prefix="sdt_mh_ckpt_")
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
        # concurrency-optimized schedules can deadlock XLA:CPU collective
        # rendezvous on small hosts (see tests/conftest.py)
        " --xla_cpu_enable_concurrency_optimized_scheduler=false")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("SDT_COORDINATOR", None)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = [subprocess.Popen(
        [sys.executable, "-m",
         "speech_distill_tpu.parallel.multihost_dryrun", "worker",
         str(pid), str(n_processes), str(port), str(local_devices),
         ckpt_dir],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
        for pid in range(n_processes)]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f"multihost dryrun proc {pid} timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or OK_MARK not in out:
            raise RuntimeError(
                f"multihost dryrun proc {pid} failed rc={p.returncode}:\n"
                f"{out[-4000:]}")
    for out in outs:
        for line in out.splitlines():
            if OK_MARK in line:
                print(line)
    print(f"dryrun_multihost ok: {n_processes} processes x "
          f"{local_devices} devices")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "worker":
        _worker(int(argv[1]), int(argv[2]), int(argv[3]), int(argv[4]),
                argv[5])
    else:
        n = int(argv[0]) if argv else 2
        d = int(argv[1]) if len(argv) > 1 else 4
        launch(n, d)


if __name__ == "__main__":
    main()
