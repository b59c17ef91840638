"""Generator export/import roundtrip + sampling from the artifact."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from t2igan.config import Config, cfg_replace
from t2igan.models.factory import build_generator
from t2igan.train.export import load_generator, save_generator

CFG = cfg_replace(
    Config(),
    TREE={"BASE_SIZE": 64, "BRANCH_NUM": 2},
    GAN={"GF_DIM": 8, "DF_DIM": 4, "Z_DIM": 16, "CONDITION_DIM": 16,
         "R_NUM": 1},
    TEXT={"EMBEDDING_DIM": 32, "WORDS_NUM": 8})


@pytest.mark.slow
def test_export_roundtrip_and_inference(tmp_path, rng):
    gen = build_generator(CFG)
    b = 2
    z = jnp.zeros((b, 16))
    sent = jnp.asarray(rng.standard_normal((b, 32)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((b, 8, 32)).astype(np.float32))
    pad = jnp.zeros((b, 8), bool)
    eps = jnp.zeros((b, 16))
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        z, sent, words, pad, False, eps)

    path = save_generator(str(tmp_path / "netG_epoch_5"),
                          variables["params"], variables["batch_stats"])
    params, stats = load_generator(path)

    ref = gen.apply(variables, z, sent, words, pad, False, eps)
    out = gen.apply({"params": params, "batch_stats": stats},
                    z, sent, words, pad, False, eps)
    np.testing.assert_array_equal(np.asarray(ref[0][-1]),
                                  np.asarray(out[0][-1]))
