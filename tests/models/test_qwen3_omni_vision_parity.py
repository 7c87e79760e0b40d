"""HF-parity: jax Qwen3-Omni vision tower vs transformers, tiny-random."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ht_vllm_omni_tpu.models.qwen3_omni import vision_encoder as ve


def _tiny():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeVisionEncoderConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeVisionEncoder,
    )

    kw = dict(
        hidden_size=32,
        intermediate_size=64,
        depth=3,
        num_heads=4,
        in_channels=3,
        patch_size=4,
        temporal_patch_size=2,
        spatial_merge_size=2,
        out_hidden_size=48,
        num_position_embeddings=64,
        deepstack_visual_indexes=[0, 1],
    )
    hf_cfg = Qwen3OmniMoeVisionEncoderConfig(**kw)
    torch.manual_seed(11)
    hf = Qwen3OmniMoeVisionEncoder(hf_cfg).eval()
    cfg = ve.VisionEncoderConfig(
        **{**kw, "deepstack_visual_indexes": (0, 1)},
        hidden_act=hf_cfg.hidden_act,
    )
    params = ve.load_hf_state(cfg, hf.state_dict())
    return hf, cfg, params


@pytest.mark.parametrize("grid", [[(1, 8, 8)], [(2, 4, 8)], [(1, 6, 4)]])
def test_vision_encoder_matches_hf(grid):
    hf, cfg, params = _tiny()
    s = sum(t * h * w for t, h, w in grid)
    rng = np.random.default_rng(5)
    patches = rng.standard_normal((s, cfg.patch_dim), dtype=np.float32)

    with torch.no_grad():
        want, want_ds = hf(
            torch.from_numpy(patches),
            grid_thw=torch.tensor(grid, dtype=torch.long),
        )
    want = want.numpy()

    geo = ve.grid_positions(cfg, grid)
    got, got_ds = ve.forward(cfg, params, patches, geo)
    got = np.asarray(got)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=6e-4, rtol=3e-3)
    assert len(got_ds) == len(want_ds)
    for g, w in zip(got_ds, want_ds):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy(), atol=6e-4, rtol=3e-3
        )
