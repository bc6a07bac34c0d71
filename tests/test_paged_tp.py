"""Multi-chip paged serving: slots shard over dp, KV heads / model dims
over tp. The reference's vLLM config carries a dead tensor_parallel_size
(soulxpodcast/config.py:126, never read); here the paged engine actually
runs over a mesh — GSPMD partitions the model matmuls from the params'
shardings, and attention stays shard-local (GQA heads are independent)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as PS

from speech_distill_tpu.core.config import (MeshConfig, SamplingParams,
                                            qwen3_tiny)
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.parallel import mesh as meshlib
from speech_distill_tpu.parallel import sharding


def _setup(vocab=48, seed=3, max_tokens=6):
    cfg = qwen3_tiny(vocab)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(seed), cfg)
    sp = SamplingParams(stop_token_ids=(vocab - 1,), max_tokens=max_tokens,
                        min_tokens=max_tokens, top_k=1, temperature=1.0,
                        use_ras=False, repetition_penalty=1.0)
    return cfg, params, sp


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_paged_serve_dp2_tp2_matches_single_device():
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size - 2,
                            int(rng.integers(3, 11))).tolist()
               for _ in range(5)]
    kw = dict(max_len=64, page_size=8, chunk_steps=3,
              cache_dtype=jnp.float32, attn_impl="xla")
    ref = PagedEngine(params, cfg, sp, slots=2, **kw).serve(prompts,
                                                            max_new=6)

    m = meshlib.make_mesh(MeshConfig(dp=2, tp=2),
                          devices=jax.devices()[:4])
    params_s = sharding.shard_params(m, params, cfg)
    eng = PagedEngine(params_s, cfg, sp, slots=2, mesh=m, **kw)
    got = eng.serve(prompts, max_new=6)
    assert got == ref


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_paged_serve_mesh_int8_pool_and_preemption():
    """int8 KV pool + recompute preemption on the mesh: slot-count
    invariance (prefix sharing off) still holds — quantization stays per
    token, sharding only splits heads/rows."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=5)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, cfg.vocab_size - 2,
                            int(rng.integers(3, 9))).tolist()
               for _ in range(4)]
    kw = dict(max_len=64, page_size=8, chunk_steps=3,
              cache_dtype=jnp.int8, attn_impl="xla",
              prefix_sharing=False)
    ref = PagedEngine(params, cfg, sp, slots=2, **kw).serve(prompts,
                                                            max_new=5)
    m = meshlib.make_mesh(MeshConfig(dp=2, tp=2),
                          devices=jax.devices()[:4])
    params_s = sharding.shard_params(m, params, cfg)
    eng = PagedEngine(params_s, cfg, sp, slots=2, num_pages=8, mesh=m,
                      **kw)
    got = eng.serve(prompts, max_new=5)
    assert got == ref
    assert eng.preemptions > 0 or eng.n_prefills >= 4


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_shard_mapped_kernel_matches_oracle():
    """The Pallas kernel (interpret) under shard_map over (dp, tp) ==
    the single-device XLA oracle — attention is fully shard-local."""
    from speech_distill_tpu.ops.paged_attention import (paged_attention,
                                                        paged_attention_xla)

    rng = np.random.default_rng(7)
    B, KV, G, Dh, P, ps, mp = 4, 2, 3, 64, 16, 64, 4
    q = jnp.asarray(rng.normal(size=(B, KV, G, Dh)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(P, KV, ps, Dh)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, KV, ps, Dh)), jnp.float32)
    bt = jnp.asarray(rng.permutation(P)[:B * mp].reshape(B, mp), jnp.int32)
    lengths = jnp.asarray([0, ps // 2 + 3, ps, 2 * ps + 17], jnp.int32)
    ref = np.asarray(paged_attention_xla(q, kp, vp, bt, lengths))

    m = meshlib.make_mesh(MeshConfig(dp=2, tp=2),
                          devices=jax.devices()[:4])
    fn = jax.shard_map(
        lambda q_, k_, v_, bt_, ln_: paged_attention(q_, k_, v_, bt_, ln_,
                                                     interpret=True),
        mesh=m,
        in_specs=(PS("dp", "tp", None, None), PS(None, "tp", None, None),
                  PS(None, "tp", None, None), PS("dp", None), PS("dp")),
        out_specs=PS("dp", "tp", None, None),
        check_vma=False)
    got = np.asarray(fn(q, kp, vp, bt, lengths))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
