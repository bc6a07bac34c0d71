"""S3 tokenizer integer-exact parity vs the torch oracle (VERDICT #2).

The torch oracle (tests/oracles/s3_torch.py) is an independent
implementation of the published speech_tokenizer_v2_25hz architecture with
torch modules. Its random state dict is exported with the real checkpoint's
key names, converted through ``convert_torch_state``, and the JAX quantize
must produce integer-identical codes — over randomized mels, ragged lengths
(covering the ceil(ceil(T/2)/2) conv arithmetic for every T mod 4), and FSQ
rounding edges near the +-0.5 digit boundaries.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from speech_distill_tpu.tokenizer import s3

torch = pytest.importorskip("torch")

from tests.oracles.s3_torch import S3TokenizerV2Oracle  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(7)
    oracle = S3TokenizerV2Oracle(n_mels=16, n_state=32, n_head=4, n_layer=2)
    oracle.eval()
    cfg = s3.s3_tiny()
    params = s3.convert_torch_state(oracle.export_state(), cfg)
    return oracle, params, cfg


def _codes_match(oracle, params, cfg, mels, lens):
    t_codes, t_lens = oracle.quantize(torch.tensor(mels), torch.tensor(lens))
    j_codes, j_lens = s3.quantize(params, jnp.asarray(mels),
                                  jnp.asarray(lens), cfg)
    np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
    np.testing.assert_array_equal(np.asarray(j_codes), t_codes.numpy())
    return np.asarray(j_codes), np.asarray(j_lens)


def test_codes_integer_exact_random(pair):
    oracle, params, cfg = pair
    rng = np.random.default_rng(0)
    mels = rng.normal(size=(3, 16, 64)).astype(np.float32)
    lens = np.asarray([64, 64, 64], np.int64)
    codes, _ = _codes_match(oracle, params, cfg, mels, lens)
    assert codes.max() < cfg.codebook_size and codes.min() >= 0
    # non-degenerate: many distinct codes
    assert len(np.unique(codes)) > 8


@pytest.mark.parametrize("T", [61, 62, 63, 64])
def test_length_rule_every_residue_mod4(pair, T):
    """ceil(ceil(T/2)/2), not T//4 (the round-1 off-by-one: VERDICT #2)."""
    oracle, params, cfg = pair
    rng = np.random.default_rng(T)
    mels = rng.normal(size=(1, 16, 64)).astype(np.float32)
    mels[:, :, T:] = 0.0                       # padded region zeros
    lens = np.asarray([T], np.int64)
    _, j_lens = _codes_match(oracle, params, cfg, mels, lens)
    expected = -(-(-(-T // 2)) // 2)           # ceil(ceil(T/2)/2)
    assert int(j_lens[0]) == expected
    if T % 4 != 0:
        assert int(j_lens[0]) != T // 4        # would fail with old rule


def test_ragged_batch_matches_individual(pair):
    """Padded-batch codes must equal each sequence quantized alone
    (attention masking + conv padding correctness)."""
    oracle, params, cfg = pair
    rng = np.random.default_rng(2)
    T_max, lens = 64, [64, 49, 30]
    mels = rng.normal(size=(3, 16, T_max)).astype(np.float32)
    for b, L in enumerate(lens):
        mels[b, :, L:] = 0.0
    batch_codes, batch_lens = _codes_match(
        oracle, params, cfg, mels, np.asarray(lens, np.int64))
    for b, L in enumerate(lens):
        # pad the single sequence to a multiple of 4 like the batch does
        single = np.zeros((1, 16, T_max), np.float32)
        single[0, :, :L] = mels[b, :, :L]
        s_codes, s_lens = s3.quantize(params, jnp.asarray(single),
                                      jnp.asarray([L], np.int64), cfg)
        n = int(s_lens[0])
        assert n == int(batch_lens[b])
        np.testing.assert_array_equal(np.asarray(s_codes)[0, :n],
                                      np.asarray(batch_codes)[b, :n])


def test_fsq_rounding_edges(pair):
    """Digit boundaries: construct hidden states whose FSQ projections land
    within +-1e-3 of the +-0.5 rounding thresholds; torch and JAX must agree
    on every code (same round-half-to-even, same tanh*0.999 clamp)."""
    oracle, params, cfg = pair
    w = oracle.quantizer.project_down.weight.detach().numpy()   # [8, D]
    b = oracle.quantizer.project_down.bias.detach().numpy()
    rng = np.random.default_rng(3)
    # solve for hidden h with w @ h + b = targets near the boundary
    n = 256
    targets = np.arctanh(np.clip(
        (rng.choice([-0.5, 0.5], size=(n, 8))
         + rng.normal(scale=1e-3, size=(n, 8))) / 0.999, -0.999999, 0.999999))
    h = np.linalg.lstsq(w.astype(np.float64),
                        (targets - b).T, rcond=None)[0].T      # [n, D]
    hidden_t = torch.tensor(h, dtype=torch.float32)[None]
    t_codes = oracle.quantizer.encode(hidden_t).numpy()[0]
    j_codes = np.asarray(s3.fsq_encode(
        params, jnp.asarray(h, jnp.float32)[None], cfg))[0]
    np.testing.assert_array_equal(j_codes, t_codes)


def test_converter_rejects_missing_keys(pair):
    oracle, params, cfg = pair
    sd = oracle.export_state()
    del sd["encoder.conv1.weight"]
    with pytest.raises(KeyError):
        s3.convert_torch_state(sd, cfg)
