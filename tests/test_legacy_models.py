"""Legacy encoder tests (RNN/CNN encoders + text attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.models.legacy import (CnnEncoder, GlobalAttentionText,
                                  RnnEncoder)


def test_rnn_encoder_shapes_and_masking(rng):
    model = RnnEncoder(ntoken=50, ninput=16, nhidden=24)
    caps = jnp.asarray(rng.integers(1, 50, (3, 10)), jnp.int32)
    lens = jnp.asarray([10, 6, 3])
    variables = model.init(jax.random.PRNGKey(0), caps, lens)
    words, sent = model.apply(variables, caps, lens)
    assert words.shape == (3, 10, 24)
    assert sent.shape == (3, 24)
    # positions beyond the caption length are zeroed
    assert np.abs(np.asarray(words[1, 6:])).max() == 0
    assert np.abs(np.asarray(words[2, 3:])).max() == 0
    assert np.abs(np.asarray(words[0])).max() > 0


def test_rnn_encoder_gru_variant(rng):
    model = RnnEncoder(ntoken=50, ninput=16, nhidden=24, rnn_type="GRU")
    caps = jnp.asarray(rng.integers(1, 50, (2, 8)), jnp.int32)
    lens = jnp.asarray([8, 5])
    variables = model.init(jax.random.PRNGKey(0), caps, lens)
    words, sent = model.apply(variables, caps, lens)
    assert words.shape == (2, 8, 24) and sent.shape == (2, 24)


@pytest.mark.slow
def test_cnn_encoder_taps(rng):
    model = CnnEncoder(nef=32)
    x = jnp.asarray(rng.standard_normal((1, 299, 299, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, code = model.apply(variables, x)
    assert feats.shape[0] == 1 and feats.shape[-1] == 32
    assert feats.shape[1] == feats.shape[2] == 17  # Mixed_6e tap
    assert code.shape == (1, 32)


def test_global_attention_text(rng):
    model = GlobalAttentionText(idf=8)
    inp = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 5, 12)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), inp, ctx)
    out = model.apply(variables, inp, ctx)
    assert out.shape == (2, 5, 8)
