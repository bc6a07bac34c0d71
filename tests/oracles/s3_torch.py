"""Torch oracle of the s3tokenizer-v2 encoder + FSQ (test-only).

An independent torch implementation of the published
``speech_tokenizer_v2_25hz`` architecture (whisper-lineage encoder: two
k3/s2/p1 convs + GELU, fixed sinusoidal positions, pre-LN residual attention
blocks with unbiased key projection; FSQ head: Linear(d->8) -> tanh*0.999 ->
round -> base-3 digits), written with torch modules so it exercises torch's
conv/LN/softmax/round semantics rather than mirroring the JAX code.

Used by tests to validate ``speech_distill_tpu.tokenizer.s3``'s converter
and integer-exact code agreement (reference behavior anchor:
utils.py:51-99, which delegates to the external s3tokenizer package).
"""
import math

import torch
import torch.nn.functional as F
from torch import nn


def sinusoids(length, channels, max_timescale=10000):
    """Whisper's fixed positional embedding."""
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = torch.exp(
        -log_timescale_increment * torch.arange(channels // 2))
    scaled_time = (torch.arange(length)[:, None].float()
                   * inv_timescales[None, :])
    return torch.cat([torch.sin(scaled_time), torch.cos(scaled_time)], dim=1)


class MultiHeadAttention(nn.Module):
    def __init__(self, n_state, n_head):
        super().__init__()
        self.n_head = n_head
        self.query = nn.Linear(n_state, n_state)
        self.key = nn.Linear(n_state, n_state, bias=False)
        self.value = nn.Linear(n_state, n_state)
        self.out = nn.Linear(n_state, n_state)

    def forward(self, x, mask=None):
        q, k, v = self.query(x), self.key(x), self.value(x)
        B, T, D = q.shape
        scale = (D // self.n_head) ** -0.25
        q = q.view(B, T, self.n_head, -1).permute(0, 2, 1, 3) * scale
        k = k.view(B, T, self.n_head, -1).permute(0, 2, 3, 1) * scale
        v = v.view(B, T, self.n_head, -1).permute(0, 2, 1, 3)
        qk = q @ k
        if mask is not None:
            qk = qk + mask
        w = torch.softmax(qk.float(), dim=-1).to(q.dtype)
        wv = (w @ v).permute(0, 2, 1, 3).flatten(start_dim=2)
        return self.out(wv)


class ResidualAttentionBlock(nn.Module):
    def __init__(self, n_state, n_head):
        super().__init__()
        self.attn = MultiHeadAttention(n_state, n_head)
        self.attn_ln = nn.LayerNorm(n_state)
        n_mlp = n_state * 4
        self.mlp = nn.Sequential(nn.Linear(n_state, n_mlp), nn.GELU(),
                                 nn.Linear(n_mlp, n_state))
        self.mlp_ln = nn.LayerNorm(n_state)

    def forward(self, x, mask=None):
        x = x + self.attn(self.attn_ln(x), mask=mask)
        x = x + self.mlp(self.mlp_ln(x))
        return x


class AudioEncoderV2(nn.Module):
    """Two stride-2 convs (100 Hz mel -> 25 Hz) + transformer blocks."""

    def __init__(self, n_mels, n_state, n_head, n_layer):
        super().__init__()
        self.conv1 = nn.Conv1d(n_mels, n_state, kernel_size=3, stride=2,
                               padding=1)
        self.conv2 = nn.Conv1d(n_state, n_state, kernel_size=3, stride=2,
                               padding=1)
        self.blocks = nn.ModuleList(
            [ResidualAttentionBlock(n_state, n_head) for _ in range(n_layer)])
        self.ln_post = nn.LayerNorm(n_state)
        self.n_state = n_state

    def forward(self, x, x_len):
        """x [B, n_mels, T], x_len [B] -> (hidden [B, T', D], out_len [B])."""
        x = F.gelu(self.conv1(x))
        x_len = (x_len + 1) // 2          # k3/s2/p1: ceil(n/2)
        x = F.gelu(self.conv2(x))
        x_len = (x_len + 1) // 2
        x = x.permute(0, 2, 1)
        x = x + sinusoids(x.shape[1], self.n_state).to(x.dtype)
        T = x.shape[1]
        key_valid = (torch.arange(T)[None, :] < x_len[:, None])
        mask = torch.where(key_valid[:, None, None, :],
                           torch.zeros(()), torch.full((), -1e30))
        for block in self.blocks:
            x = block(x, mask=mask)
        return self.ln_post(x), x_len


class FSQCodebook(nn.Module):
    def __init__(self, dim, level=3, fsq_dim=8):
        super().__init__()
        self.project_down = nn.Linear(dim, fsq_dim)
        self.level = level
        self.fsq_dim = fsq_dim

    def encode(self, x):
        """x [B, T, D] -> int codes [B, T] in [0, level**fsq_dim)."""
        h = self.project_down(x.float()).tanh() * 0.999
        digits = h.round() + (self.level - 1) / 2
        powers = torch.pow(self.level,
                           torch.arange(self.fsq_dim)).to(torch.int64)
        return torch.sum(digits.to(torch.int64) * powers, dim=-1)


class S3TokenizerV2Oracle(nn.Module):
    def __init__(self, n_mels=16, n_state=32, n_head=4, n_layer=2):
        super().__init__()
        self.encoder = AudioEncoderV2(n_mels, n_state, n_head, n_layer)
        self.quantizer = FSQCodebook(n_state)

    @torch.no_grad()
    def quantize(self, mels, mels_lens):
        hidden, code_lens = self.encoder(mels, mels_lens)
        codes = self.quantizer.encode(hidden)
        T = codes.shape[1]
        valid = (torch.arange(T)[None, :] < code_lens[:, None])
        return codes * valid, code_lens

    def export_state(self):
        """State dict with the s3tokenizer checkpoint's key names."""
        sd = {}
        enc = self.encoder
        sd["encoder.conv1.weight"] = enc.conv1.weight
        sd["encoder.conv1.bias"] = enc.conv1.bias
        sd["encoder.conv2.weight"] = enc.conv2.weight
        sd["encoder.conv2.bias"] = enc.conv2.bias
        for i, b in enumerate(enc.blocks):
            p = f"encoder.blocks.{i}"
            sd[f"{p}.attn.query.weight"] = b.attn.query.weight
            sd[f"{p}.attn.query.bias"] = b.attn.query.bias
            sd[f"{p}.attn.key.weight"] = b.attn.key.weight
            sd[f"{p}.attn.value.weight"] = b.attn.value.weight
            sd[f"{p}.attn.value.bias"] = b.attn.value.bias
            sd[f"{p}.attn.out.weight"] = b.attn.out.weight
            sd[f"{p}.attn.out.bias"] = b.attn.out.bias
            sd[f"{p}.attn_ln.weight"] = b.attn_ln.weight
            sd[f"{p}.attn_ln.bias"] = b.attn_ln.bias
            sd[f"{p}.mlp_ln.weight"] = b.mlp_ln.weight
            sd[f"{p}.mlp_ln.bias"] = b.mlp_ln.bias
            sd[f"{p}.mlp.0.weight"] = b.mlp[0].weight
            sd[f"{p}.mlp.0.bias"] = b.mlp[0].bias
            sd[f"{p}.mlp.2.weight"] = b.mlp[2].weight
            sd[f"{p}.mlp.2.bias"] = b.mlp[2].bias
        sd["encoder.ln_post.weight"] = enc.ln_post.weight
        sd["encoder.ln_post.bias"] = enc.ln_post.bias
        sd["quantizer.project_down.weight"] = self.quantizer.project_down.weight
        sd["quantizer.project_down.bias"] = self.quantizer.project_down.bias
        return sd
