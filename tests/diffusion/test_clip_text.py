"""Golden parity: jax CLIP text encoder vs HF transformers (torch CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models import clip_text

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf(with_projection):
    cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=24, eos_token_id=98, bos_token_id=97,
        projection_dim=16,
    )
    cls = (
        transformers.CLIPTextModelWithProjection
        if with_projection
        else transformers.CLIPTextModel
    )
    return cls(cfg).eval().to(torch.float32), cfg


@pytest.mark.parametrize("with_projection", [False, True])
def test_clip_text_matches_hf(with_projection):
    hf, hf_cfg = _hf(with_projection)
    cfg = clip_text.config_from_hf(hf_cfg)
    if not with_projection:
        cfg = clip_text.CLIPTextConfig(
            **{**cfg.__dict__, "projection_dim": 0}
        )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = clip_text.load_hf_params(
        cfg, sd, with_projection=with_projection
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 96, size=(2, 12), dtype=np.int32)
    ids[0, 9] = 98  # EOT
    ids[1, 5] = 98

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids).long())
        ref_h = out.last_hidden_state.numpy()
        ref_pool = (
            out.text_embeds if with_projection else out.pooler_output
        ).numpy()

    h, pooled = clip_text.forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(h), ref_h, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pooled), ref_pool, rtol=2e-4, atol=2e-4
    )
