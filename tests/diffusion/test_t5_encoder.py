"""Golden parity: jax T5/UMT5 encoder vs HF transformers (torch CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models import t5_encoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_model(model_type):
    if model_type == "t5":
        cfg = transformers.T5Config(
            vocab_size=96, d_model=32, d_kv=8, num_heads=4, d_ff=64,
            num_layers=3, relative_attention_num_buckets=8,
            relative_attention_max_distance=32, dropout_rate=0.0,
            feed_forward_proj="gated-gelu",
        )
        model = transformers.T5EncoderModel(cfg)
    else:
        cfg = transformers.UMT5Config(
            vocab_size=96, d_model=32, d_kv=8, num_heads=4, d_ff=64,
            num_layers=3, relative_attention_num_buckets=8,
            relative_attention_max_distance=32, dropout_rate=0.0,
            feed_forward_proj="gated-gelu",
        )
        model = transformers.UMT5EncoderModel(cfg)
    return model.eval().to(torch.float32), cfg


@pytest.mark.parametrize("model_type", ["t5", "umt5"])
def test_t5_encoder_matches_hf(model_type):
    hf, hf_cfg = _hf_model(model_type)
    cfg = t5_encoder.config_from_hf(hf_cfg)
    assert cfg.per_layer_relative_bias == (model_type == "umt5")

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = t5_encoder.load_hf_params(cfg, sd)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, size=(2, 11), dtype=np.int32)
    mask = np.ones((2, 11), dtype=np.int32)
    mask[1, 7:] = 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()

    out = np.asarray(
        t5_encoder.forward(
            cfg, params, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    # padded rows differ (HF zeroes nothing either, but masked attn rows
    # still produce values) — compare only valid positions
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out[1, :7], ref[1, :7], rtol=2e-4, atol=2e-4)


def test_t5_encoder_tp_sharding_matches_single():
    """TP-sharded forward over a 2-device mesh == single-device."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = t5_encoder.T5EncoderConfig.tiny()
    params = t5_encoder.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 96, size=(2, 9), dtype=np.int32)
    )

    ref = np.asarray(t5_encoder.forward(cfg, params, ids))

    devs = jax.devices()[:2]
    mesh = Mesh(np.array(devs), ("tp",))
    specs = t5_encoder.param_partition_specs(cfg)
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in params.items()
    }
    out = np.asarray(
        jax.jit(lambda p, i: t5_encoder.forward(cfg, p, i))(sharded, ids)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
