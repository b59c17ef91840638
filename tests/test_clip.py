"""Numerical parity of the flax CLIP towers against HuggingFace torch CLIP.

Builds a randomly initialized torch ``CLIPModel`` (default ``CLIPConfig`` ==
ViT-B/32, the reference backbone, model.py:20), converts the weights with
:func:`convert_torch_clip_state`, and requires <=1e-4 agreement on the
``encode_text_verbose`` / ``encode_image_verbose`` outputs (reference
semantics at model.py:23-70).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from t2igan.models.clip import (ClipConfig, ClipWithRegionHead,
                                convert_torch_clip_state)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def torch_clip():
    from transformers import CLIPConfig as HFConfig
    from transformers import CLIPModel

    torch.manual_seed(0)
    model = CLIPModel(HFConfig())  # defaults are exactly ViT-B/32
    model.eval()
    subr = torch.nn.Linear(768, 512)
    torch.manual_seed(1)
    torch.nn.init.normal_(subr.weight, std=0.02)
    torch.nn.init.zeros_(subr.bias)
    return model, subr


@pytest.fixture(scope="module")
def flax_clip(torch_clip):
    model, subr = torch_clip
    sd = dict(model.state_dict())
    sd["linear_subr.weight"] = subr.weight.detach()
    sd["linear_subr.bias"] = subr.bias.detach()
    variables = convert_torch_clip_state(sd)
    return ClipWithRegionHead(ClipConfig()), variables


def _input_ids(b=2, l=77):
    rng = np.random.default_rng(3)
    ids = np.full((b, l), 0, dtype=np.int64)
    mask = np.zeros((b, l), dtype=np.int64)
    lens = [9, 14]
    for i, n in enumerate(lens):
        ids[i, 0] = 49406                      # <bos>
        ids[i, 1:n - 1] = rng.integers(1, 49000, n - 2)
        ids[i, n - 1] = 49407                  # <eos>
        mask[i, :n] = 1
    return ids, mask


def test_text_tower_parity(torch_clip, flax_clip):
    model, _ = torch_clip
    flax_model, variables = flax_clip
    ids, mask = _input_ids()
    with torch.no_grad():
        out = model.text_model(input_ids=torch.from_numpy(ids),
                               attention_mask=torch.from_numpy(mask))
        ref_words = out.last_hidden_state.numpy()
        ref_sent = model.text_projection(out.pooler_output).numpy()
    words, sent = flax_model.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask),
        method=ClipWithRegionHead.encode_text_verbose)
    np.testing.assert_allclose(np.asarray(words), ref_words,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sent), ref_sent,
                               rtol=1e-4, atol=1e-4)


def test_vision_tower_parity(torch_clip, flax_clip):
    model, subr = torch_clip
    flax_model, variables = flax_clip
    rng = np.random.default_rng(5)
    img = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        out = model.vision_model(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
        ref_regions = subr(out.last_hidden_state).numpy()
        ref_img = model.visual_projection(out.pooler_output).numpy()
    regions, img_enc = flax_model.apply(
        variables, jnp.asarray(img),
        method=ClipWithRegionHead.encode_image_verbose)
    np.testing.assert_allclose(np.asarray(regions), ref_regions,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(img_enc), ref_img,
                               rtol=1e-3, atol=1e-4)


def test_full_forward_tuple(torch_clip, flax_clip):
    """The 4-tuple (img, subr, sent, words) of AddLinearOnCLIP.forward
    (model.py:72-79)."""
    model, subr_head = torch_clip
    flax_model, variables = flax_clip
    ids, mask = _input_ids()
    rng = np.random.default_rng(7)
    img = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
                    input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask))
        ref_img = out.image_embeds.numpy()
        ref_subr = subr_head(
            out.vision_model_output.last_hidden_state).numpy()
        ref_sent = out.text_embeds.numpy()
        ref_words = out.text_model_output.last_hidden_state.numpy()
    img_e, subr_e, sent_e, words_e = flax_model.apply(
        variables, jnp.asarray(img), jnp.asarray(ids), jnp.asarray(mask))
    # NOTE: HF CLIPModel.get_text_features/image_features l2-normalizes only
    # in logits; image_embeds/text_embeds are raw projections.
    np.testing.assert_allclose(np.asarray(img_e), ref_img, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(subr_e), ref_subr, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sent_e), ref_sent, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(words_e), ref_words, rtol=1e-3,
                               atol=1e-4)
