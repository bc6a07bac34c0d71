"""Minimal functional stand-in for the diffusers symbols the reference
estimator imports (diffusers is not installed in this environment).

Implements the public diffusers semantics for exactly the configuration the
reference uses (estimator.py:7-11, 208-216: plain LayerNorm blocks,
activation_fn='gelu', Attention(query_dim, heads, dim_head, dropout=0,
bias=False, cross_attention_dim=None, upcast_attention=False) with an
additive float attention mask). Install with ``install()`` BEFORE importing
any ``soulxpodcast`` module.
"""
import sys
import types

import torch
import torch.nn.functional as F
from torch import nn


class GELU(nn.Module):
    """diffusers.models.activations.GELU: proj + gelu."""

    def __init__(self, dim_in, dim_out, approximate="none", bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, x):
        return F.gelu(self.proj(x), approximate=self.approximate)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class ApproximateGELU(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


class AdaLayerNorm(nn.Module):  # unused at reference defaults
    def __init__(self, embedding_dim, num_embeddings):
        super().__init__()
        self.emb = nn.Embedding(num_embeddings, embedding_dim)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, embedding_dim * 2)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False)

    def forward(self, x, timestep):
        emb = self.linear(self.silu(self.emb(timestep)))
        scale, shift = torch.chunk(emb, 2)
        return self.norm(x) * (1 + scale) + shift


class AdaLayerNormZero(nn.Module):  # unused at reference defaults
    def __init__(self, embedding_dim, num_embeddings):
        super().__init__()
        raise NotImplementedError("ada_norm_zero is not used by the reference")


class Attention(nn.Module):
    """diffusers.models.attention_processor.Attention, default processor."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False,
                 upcast_attention=False, out_bias=True, **kw):
        super().__init__()
        inner_dim = dim_head * heads
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.upcast_attention = upcast_attention
        kv_dim = cross_attention_dim if cross_attention_dim is not None \
            else query_dim
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(kv_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(kv_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(inner_dim, query_dim, bias=out_bias),
             nn.Dropout(dropout)])

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **kw):
        ctx = encoder_hidden_states if encoder_hidden_states is not None \
            else hidden_states
        B, T, _ = hidden_states.shape
        q = self.to_q(hidden_states)
        k = self.to_k(ctx)
        v = self.to_v(ctx)
        H = self.heads

        def split(x):
            return x.view(B, -1, H, x.shape[-1] // H).permute(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if self.upcast_attention:
            q, k = q.float(), k.float()
        scores = (q @ k.transpose(-1, -2)) * self.scale
        if attention_mask is not None:
            # additive float mask [B, T, S] (mask_to_bias), broadcast heads
            scores = scores + attention_mask.unsqueeze(1)
        attn = scores.softmax(dim=-1).to(v.dtype)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, T, -1)
        return self.to_out[1](self.to_out[0](out))


def maybe_allow_in_graph(cls):
    return cls


LoRACompatibleLinear = nn.Linear


def install():
    """Register stub modules so ``from diffusers... import ...`` resolves."""
    if "diffusers" in sys.modules:
        return
    root = types.ModuleType("diffusers")
    models = types.ModuleType("diffusers.models")
    attention = types.ModuleType("diffusers.models.attention")
    processor = types.ModuleType("diffusers.models.attention_processor")
    lora = types.ModuleType("diffusers.models.lora")
    utils = types.ModuleType("diffusers.utils")
    torch_utils = types.ModuleType("diffusers.utils.torch_utils")
    attention.GELU = GELU
    attention.GEGLU = GEGLU
    attention.ApproximateGELU = ApproximateGELU
    attention.AdaLayerNorm = AdaLayerNorm
    attention.AdaLayerNormZero = AdaLayerNormZero
    processor.Attention = Attention
    lora.LoRACompatibleLinear = LoRACompatibleLinear
    torch_utils.maybe_allow_in_graph = maybe_allow_in_graph
    root.models = models
    models.attention = attention
    models.attention_processor = processor
    models.lora = lora
    root.utils = utils
    utils.torch_utils = torch_utils
    for name, mod in [("diffusers", root), ("diffusers.models", models),
                      ("diffusers.models.attention", attention),
                      ("diffusers.models.attention_processor", processor),
                      ("diffusers.models.lora", lora),
                      ("diffusers.utils", utils),
                      ("diffusers.utils.torch_utils", torch_utils)]:
        sys.modules[name] = mod


def load_reference_modules():
    """Import the on-disk reference torch modules (with stubs installed)."""
    install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from soulxpodcast.models.modules import flow, hifigan  # noqa
    from soulxpodcast.models.modules.flow_components import (  # noqa
        estimator, upsample_encoder)
    return flow, hifigan, estimator, upsample_encoder
