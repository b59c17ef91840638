"""Longer-horizon numerical stability: 60 adversarial steps on tiny models
must stay finite with bounded losses and a healthy spectral norm."""

import jax
import numpy as np
import pytest

from t2igan.train.state import gan_optimizers, init_gan_state
from t2igan.train.steps import make_gan_step
from t2igan.models.factory import build_discriminators, build_generator
from tests.test_train_steps import CFG, _gan_batch

pytestmark = pytest.mark.slow


def test_sixty_steps_stay_finite(clip_setup=None):
    from tests.test_train_steps import TINY_CLIP
    from t2igan.models.clip import ClipWithRegionHead
    import jax.numpy as jnp

    clip_model = ClipWithRegionHead(TINY_CLIP)
    clip_vars = clip_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), jnp.int32))
    gen = build_generator(CFG)
    ds = build_discriminators(CFG)
    g_tx, d_tx = gan_optimizers(CFG)
    state = init_gan_state(CFG, gen, ds, jax.random.PRNGKey(1))
    step = jax.jit(make_gan_step(CFG, clip_model, gen, ds, g_tx, d_tx),
                   donate_argnums=(0,))

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    g_losses, d_losses = [], []
    for i in range(60):
        batch = _gan_batch(rng)
        key, sub = jax.random.split(key)
        state, m = step(state, clip_vars["params"], batch, sub)
        g_losses.append(float(m["g_loss"]))
        d_losses.append(float(m["d_loss0"]) + float(m["d_loss1"]))
    assert np.isfinite(g_losses).all(), g_losses[-5:]
    assert np.isfinite(d_losses).all(), d_losses[-5:]
    # D should not collapse to zero loss (mode of a broken adversarial setup)
    assert min(d_losses[-10:]) > 1e-3
    # parameters remain finite
    for leaf in jax.tree.leaves(state.g_params):
        assert np.isfinite(np.asarray(leaf)).all()
    # spectral estimates stay unit-normalized
    for spec in state.d_spectral:
        for leaf in jax.tree.leaves(spec):
            n = np.linalg.norm(np.asarray(leaf))
            np.testing.assert_allclose(n, 1.0, rtol=1e-3)
