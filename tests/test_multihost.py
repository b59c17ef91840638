"""Multi-host input pipeline tests.

The reference's only distribution strategy is single-process
``nn.DataParallel`` (trainer.py:255-265); the TPU-pod equivalent is: each
host's ``DataLoader`` produces its contiguous slice of the global epoch
permutation (``host_index``/``host_count``), and
:func:`t2igan.parallel.mesh.global_batch` stitches the per-process local
slices into one global batch-sharded ``jax.Array`` for the jitted step.

A single test process always has ``jax.process_count() == 1``, so these
tests validate the two halves separately:

* the loader's host partitioning (disjoint, exhaustive, order-consistent —
  concatenating the per-host streams in host order reproduces the
  single-host epoch);
* the global-array assembly semantics, by emulating H hosts on the virtual
  8-device CPU mesh with ``jax.make_array_from_single_device_arrays``
  (exactly what ``make_array_from_process_local_data`` lowers to, with the
  per-host shard list restricted to addressable devices) and checking the
  result is indistinguishable — buffer for buffer — from the single-host
  ``shard_batch`` path, through a jitted DP reduction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.config import Config, cfg_replace
from t2igan.data.pipeline import DataLoader
from t2igan.data.synthetic import SyntheticDataset
from t2igan.data.tokenizer import ClipTokenizer
from t2igan.parallel.mesh import (emulated_global_batch, global_batch,
                                  make_mesh, shard_batch)

CFG = cfg_replace(Config(), TRAIN={"BATCH_SIZE": 4},
                  TREE={"BASE_SIZE": 16, "BRANCH_NUM": 2})


def _host_loaders(n_hosts, *, size=32, batch_size=4, seed=11):
    ds = SyntheticDataset(CFG, size=size)
    tok = ClipTokenizer.fallback()
    return [DataLoader(ds, tok, batch_size=batch_size, words_num=30,
                       seed=seed, host_index=i, host_count=n_hosts)
            for i in range(n_hosts)]


def _epoch_keys(loader):
    return [k for b in iter(loader) for k in b.keys]


class TestLoaderHostPartition:
    def test_disjoint_and_exhaustive(self):
        loaders = _host_loaders(4)
        per_host = [_epoch_keys(ld) for ld in loaders]
        flat = [k for keys in per_host for k in keys]
        assert len(flat) == 32 and len(set(flat)) == 32

    def test_host_order_reproduces_global_epoch(self):
        # Concatenating the per-host streams in host order must equal the
        # single-host epoch: same seed => same permutation, host i takes
        # the i-th contiguous slab.
        loaders = _host_loaders(2)
        single = _host_loaders(1)[0]
        combined = _epoch_keys(loaders[0]) + _epoch_keys(loaders[1])
        assert combined == _epoch_keys(single)

    def test_len_is_per_host(self):
        loaders = _host_loaders(4, size=32, batch_size=4)
        assert all(len(ld) == 2 for ld in loaders)  # 32/4 hosts /4 batch

    def test_uneven_remainder_dropped_consistently(self):
        # 30 samples over 4 hosts -> 7 per host, last 2 dropped globally;
        # every host agrees on the slab boundaries.
        loaders = _host_loaders(4, size=30, batch_size=7)
        per_host = [_epoch_keys(ld) for ld in loaders]
        flat = [k for keys in per_host for k in keys]
        assert len(flat) == 28 and len(set(flat)) == 28

    def test_epochs_advance_in_lockstep(self):
        # Same loader state machine on every host: epoch 2's permutation
        # is identical across hosts (seeded by (seed, epoch)).
        a, b = _host_loaders(2)
        e1 = _epoch_keys(a) + _epoch_keys(b)       # epoch 1
        e2 = _epoch_keys(a) + _epoch_keys(b)       # epoch 2
        single = _host_loaders(1)[0]
        assert e1 == _epoch_keys(single)
        assert e2 == _epoch_keys(single)
        assert e1 != e2  # reshuffled between epochs


_emulate_global = emulated_global_batch


@pytest.mark.slow  # jits a full (tiny) GAN train step over the 8-device mesh
@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_gan_step_uneven_4host_assembly_matches_single_host():
    """The full adversarial step over 4 emulated hosts x 2 devices with an
    UNEVEN epoch remainder equals the single-host run (PARITY.md D11).

    34 samples over 4 hosts: ``_host_slice`` gives each host a contiguous
    slab of 8 and drops the last 2 of the permutation on every host
    identically; the assembled 4x8 global batch is therefore the first 32
    samples of the single-host epoch, and the jitted GAN step must produce
    identical metrics and parameters from either construction."""
    from t2igan.models.factory import build_discriminators, build_generator
    from t2igan.train.state import gan_optimizers, init_gan_state
    from t2igan.train.steps import make_gan_step
    from t2igan.models.clip import ClipConfig, ClipTowerConfig
    from t2igan.models.clip import ClipWithRegionHead
    from t2igan.parallel.mesh import replicate

    tiny_clip = ClipConfig(
        vocab_size=512, max_positions=16, eos_token_id=511,
        projection_dim=32, image_size=32, patch_size=16, region_dim=32,
        text=ClipTowerConfig(32, 2, 2, 64),
        vision=ClipTowerConfig(48, 2, 2, 96))
    cfg = cfg_replace(
        Config(),
        TREE={"BASE_SIZE": 64, "BRANCH_NUM": 2},
        GAN={"GF_DIM": 8, "DF_DIM": 4, "Z_DIM": 16, "CONDITION_DIM": 16,
             "R_NUM": 1},
        TEXT={"EMBEDDING_DIM": 32, "WORDS_NUM": 16},
        TRAIN={"BATCH_SIZE": 8})

    def batch_arrays(b):
        return {"images": [np.asarray(x) for x in b.images],
                "ids": b.input_ids, "mask": b.attention_mask,
                "ids_2": b.input_ids_2, "mask_2": b.attention_mask_2,
                "class_ids": b.class_ids}

    ds = SyntheticDataset(cfg, size=34)
    tok = ClipTokenizer.fallback()
    host_loaders = [DataLoader(ds, tok, batch_size=8, words_num=16, seed=7,
                               host_index=i, host_count=4) for i in range(4)]
    single = DataLoader(ds, tok, batch_size=32, words_num=16, seed=7,
                        host_index=0, host_count=1)
    local = [batch_arrays(next(iter(ld))) for ld in host_loaders]
    full = batch_arrays(next(iter(single)))

    mesh = make_mesh()  # 8 devices = 4 hosts x 2 devices each
    assembled = _emulate_global(mesh, local)
    reference = shard_batch(mesh, full)
    # the assembly itself is bitwise the single-host shard
    np.testing.assert_array_equal(np.asarray(assembled["ids"]),
                                  np.asarray(reference["ids"]))
    np.testing.assert_array_equal(np.asarray(assembled["images"][1]),
                                  np.asarray(reference["images"][1]))

    clip_model = ClipWithRegionHead(tiny_clip)
    clip_vars = clip_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), jnp.int32))
    gen = build_generator(cfg)
    d_models = build_discriminators(cfg)
    g_tx, d_tx = gan_optimizers(cfg)
    state = init_gan_state(cfg, gen, d_models, jax.random.PRNGKey(1))
    step = jax.jit(make_gan_step(cfg, clip_model, gen, d_models, g_tx, d_tx))

    s_a, m_a = step(replicate(mesh, state), replicate(mesh, clip_vars["params"]),
                    assembled, jax.random.PRNGKey(3))
    s_b, m_b = step(replicate(mesh, state), replicate(mesh, clip_vars["params"]),
                    reference, jax.random.PRNGKey(3))
    for k in ("g_loss", "d_loss0", "d_loss1", "w_loss"):
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]),
                                   rtol=0, atol=0)
    leaf_a = np.asarray(s_a.g_params["CANet_0"]["Dense_0"]["kernel"])
    leaf_b = np.asarray(s_b.g_params["CANet_0"]["Dense_0"]["kernel"])
    np.testing.assert_array_equal(leaf_a, leaf_b)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
class TestGlobalAssembly:
    def test_emulated_two_host_assembly_matches_single_host(self):
        mesh = make_mesh()  # all 8 virtual devices on "data"
        rng = np.random.default_rng(0)
        full = {"x": rng.standard_normal((16, 6, 6, 3)).astype(np.float32),
                "ids": rng.integers(0, 100, (16, 30)).astype(np.int32)}
        halves = [jax.tree.map(lambda a: a[:8], full),
                  jax.tree.map(lambda a: a[8:], full)]
        assembled = _emulate_global(mesh, halves)
        reference = shard_batch(mesh, full)
        for k in full:
            assert assembled[k].sharding == reference[k].sharding
            np.testing.assert_array_equal(np.asarray(assembled[k]),
                                          np.asarray(reference[k]))

    def test_jitted_dp_reduction_identical(self):
        # The assembled global array must be a drop-in input to a jitted
        # step: a sharded reduction gives bitwise the single-host result.
        mesh = make_mesh()
        rng = np.random.default_rng(1)
        full = {"x": rng.standard_normal((16, 32)).astype(np.float32)}
        quarters = [jax.tree.map(lambda a: a[i * 4:(i + 1) * 4], full)
                    for i in range(4)]
        assembled = _emulate_global(mesh, quarters)

        @jax.jit
        def step(batch):
            return jnp.sum(batch["x"] ** 2, axis=-1)

        np.testing.assert_array_equal(
            np.asarray(step(assembled)),
            np.asarray(step(shard_batch(mesh, full))))

    def test_global_batch_single_process_path(self):
        # In-process, global_batch must behave exactly like shard_batch
        # (the trainers now route through it).
        mesh = make_mesh()
        rng = np.random.default_rng(2)
        tree = {"imgs": [rng.standard_normal((8, 4, 4, 3)).astype(np.float32)],
                "ids": rng.integers(0, 9, (8, 7)).astype(np.int32)}
        out = global_batch(mesh, tree)
        ref = shard_batch(mesh, tree)
        np.testing.assert_array_equal(np.asarray(out["imgs"][0]),
                                      np.asarray(ref["imgs"][0]))
        assert out["ids"].sharding == ref["ids"].sharding

    def test_loader_to_global_step_end_to_end(self):
        # Full path: 2 emulated hosts run their DataLoaders, collate their
        # local batches, assemble, and a jitted reduction over the global
        # batch equals the single-host loader's result.
        mesh = make_mesh()
        loaders = _host_loaders(2, size=16, batch_size=8, seed=3)
        single = _host_loaders(1, size=16, batch_size=16, seed=3)[0]
        local = [next(iter(ld)) for ld in loaders]
        full = next(iter(single))
        assembled = _emulate_global(
            mesh, [{"ids": b.input_ids} for b in local])
        reference = shard_batch(mesh, {"ids": full.input_ids})

        @jax.jit
        def checksum(t):
            return jnp.sum(t["ids"], axis=-1)

        np.testing.assert_array_equal(np.asarray(checksum(assembled)),
                                      np.asarray(checksum(reference)))
