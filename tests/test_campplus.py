"""CAM++ speaker embedding: JAX vs independent torch oracle parity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speech_distill_tpu.models import campplus  # noqa: E402


def _randomize_bn_stats(model, seed=0):
    """Random (not default 0/1) BN running stats so eval-mode BN math is
    actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.5, 0.5, generator=g)
            m.running_var.uniform_(0.5, 2.0, generator=g)
    return model


@pytest.fixture(scope="module")
def pair():
    from tests.oracles.campplus_torch import CAMPPlus
    torch.manual_seed(0)
    model = CAMPPlus().eval()
    _randomize_bn_stats(model)
    params = campplus.convert_torch_state(model.state_dict())
    return model, params


@pytest.mark.parametrize("t", [187, 200, 250, 400, 73])
def test_campplus_matches_torch_oracle(pair, t):
    """Bucketed masked JAX forward == dynamic-shape torch forward at the
    TRUE length, across lengths straddling segment/bucket boundaries."""
    model, params = pair
    rng = np.random.default_rng(t)
    feat = rng.normal(size=(1, t, 80)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.tensor(feat)).numpy()

    bucket = 200
    width = -(-t // bucket) * bucket
    padded = np.zeros((1, width, 80), np.float32)
    padded[0, :t] = feat[0]
    got = np.asarray(campplus.forward(params, jnp.asarray(padded),
                                      jnp.asarray([t], np.int32)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_campplus_batched_mixed_lengths(pair):
    """One bucketed batch of different true lengths == per-utterance torch."""
    model, params = pair
    rng = np.random.default_rng(7)
    lens = [150, 320, 400]
    width = 400
    feats = np.zeros((len(lens), width, 80), np.float32)
    refs = []
    for b, t in enumerate(lens):
        f = rng.normal(size=(t, 80)).astype(np.float32)
        feats[b, :t] = f
        with torch.no_grad():
            refs.append(model(torch.tensor(f[None])).numpy()[0])
    got = np.asarray(campplus.forward(params, jnp.asarray(feats),
                                      jnp.asarray(lens, np.int32)))
    np.testing.assert_allclose(got, np.stack(refs), atol=2e-4, rtol=1e-3)


def test_campplus_spk_emb_fn(pair):
    """The host-callable drop-in for PodcastDataset(spk_emb_fn=...)."""
    model, params = pair
    rng = np.random.default_rng(9)
    feat = rng.normal(size=(233, 80)).astype(np.float32)
    fn = campplus.make_spk_emb_fn(params)
    got = fn(feat)
    with torch.no_grad():
        ref = model(torch.tensor(feat[None])).numpy()[0]
    assert got.shape == (192,)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
