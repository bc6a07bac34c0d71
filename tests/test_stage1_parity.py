"""Stage-1 loss-curve parity vs a torch reference loop.

Mirrors the reference's stage-1 semantics (stage1.py:29-93 + TRL SFT CE):
all parameters frozen except the embedding (tied lm_head), backward hooks
zeroing grad rows below old_vocab_size, AdamW + linear warmup + clip 1.0.
The JAX stage-1 step's per-step losses must track the torch loop within 1%.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from speech_distill_tpu.core.config import qwen3_tiny
from speech_distill_tpu.distill import train_step
from speech_distill_tpu.models.hf_loader import from_state_dict

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.slow
def test_stage1_loss_curve_within_1pct():
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM

    V, old_vocab = 128, 96
    cfg = qwen3_tiny(V)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    hf_cfg = HFQwen3Config(
        vocab_size=V, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=True, attention_bias=False)
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(hf_cfg).to(torch.float32)
    params = from_state_dict(model.state_dict(), cfg, dtype="float32")

    rng = np.random.default_rng(1)
    B, T, steps = 2, 16, 6
    data = []
    for _ in range(steps):
        # mostly new-vocab tokens: only the new embedding rows train, so the
        # loss can actually decrease (like stage-1's speech-token data)
        ids = rng.integers(old_vocab, V, (B, T))
        ids[:, :3] = rng.integers(0, old_vocab, (B, 3))
        labels = ids.astype(np.int64).copy()
        labels[:, :3] = -100
        data.append((ids, labels))

    lr, warmup, total = 5e-3, 2, steps

    # ---- torch loop: freeze all but embedding, hook zeros old rows --------
    for p in model.parameters():
        p.requires_grad_(False)
    embed = model.get_input_embeddings().weight
    embed.requires_grad_(True)

    def zero_old_rows(grad):
        grad = grad.clone()
        grad[:old_vocab] = 0
        return grad

    embed.register_hook(zero_old_rows)
    opt_t = torch.optim.AdamW([embed], lr=lr, betas=(0.9, 0.999),
                              eps=1e-8, weight_decay=0.0)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt_t, lambda s: (s / warmup if s < warmup
                          else max(0.0, (total - s) / (total - warmup))))
    torch_losses = []
    for ids, labels in data:
        logits = model(input_ids=torch.tensor(ids)).logits
        s = logits[:, :-1].reshape(-1, V)
        l = torch.tensor(labels)[:, 1:].reshape(-1)
        loss = F.cross_entropy(s[l != -100], l[l != -100])
        opt_t.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_([embed], 1.0)
        opt_t.step()
        sched.step()
        torch_losses.append(float(loss))
    embed_after_torch = embed.detach().numpy()

    # ---- jax stage-1 loop --------------------------------------------------
    trainable = {"embed": {"weight": params["embed"]["weight"]}}
    opt = train_step.make_optimizer(lr, warmup, total)
    state = train_step.init_state(trainable, opt)
    step = train_step.make_stage1_step(cfg, opt, old_vocab, donate=False)
    jax_losses = []
    for ids, labels in data:
        batch = {"input_ids": jnp.asarray(ids, jnp.int32)[None],
                 "attention_mask": jnp.ones((1, B, T), jnp.int32),
                 "labels": jnp.asarray(labels)[None]}
        state, m = step(state, params, batch)
        jax_losses.append(float(m["loss"]))

    for a, b in zip(jax_losses, torch_losses):
        assert abs(a - b) / abs(b) < 0.01, (jax_losses, torch_losses)
    assert jax_losses[-1] < jax_losses[0]

    # frozen-row semantics agree end-to-end: old rows untouched, new rows
    # match torch's updated embedding
    embed_after_jax = np.asarray(state.trainable["embed"]["weight"])
    orig = np.asarray(params["embed"]["weight"])
    np.testing.assert_array_equal(embed_after_jax[:old_vocab],
                                  orig[:old_vocab])
    np.testing.assert_allclose(embed_after_jax[old_vocab:],
                               embed_after_torch[old_vocab:],
                               rtol=2e-3, atol=2e-5)
