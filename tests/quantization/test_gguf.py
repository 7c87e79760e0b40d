"""GGUF loading: container parse, block-quant dequant exactness, and
end-to-end engine generation from a synthesized .gguf checkpoint."""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.quantization import gguf as G


# ----------------------------------------------------------- test writer
def _w_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _w_kv(key: str, vtype: int, payload: bytes) -> bytes:
    return _w_str(key) + struct.pack("<I", vtype) + payload


def _quant_q8_0(a: np.ndarray) -> bytes:
    """llama.cpp Q8_0: per-32 block f16 scale d = amax/127, q = a/d."""
    flat = a.reshape(-1, 32)
    out = b""
    for blk in flat:
        d = np.float16(np.abs(blk).max() / 127.0 or 1e-8)
        q = np.clip(np.round(blk / np.float32(d)), -127, 127).astype(
            np.int8
        )
        out += d.tobytes() + q.tobytes()
    return out


def _quant_q4_0(a: np.ndarray) -> bytes:
    """Q4_0: d = -amax/8 (sign trick as in llama.cpp), q in [0, 15]."""
    flat = a.reshape(-1, 32)
    out = b""
    for blk in flat:
        amax_i = np.argmax(np.abs(blk))
        d = np.float16(blk[amax_i] / -8.0 or 1e-8)
        q = np.clip(
            np.round(blk / np.float32(d)) + 8, 0, 15
        ).astype(np.uint8)
        packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        out += d.tobytes() + packed.tobytes()
    return out


def _write_gguf(path, metadata: dict, tensors: list):
    """tensors: [(name, np_array, gtype, raw_bytes)]."""
    head = G._MAGIC + struct.pack("<IQQ", 3, len(tensors), len(metadata))
    kv = b""
    for k, (vtype, payload) in metadata.items():
        kv += _w_kv(k, vtype, payload)
    infos = b""
    offset = 0
    align = 32
    for name, arr, gtype, raw in tensors:
        dims = tuple(reversed(arr.shape))  # GGML dims: fastest first
        infos += (
            _w_str(name)
            + struct.pack("<I", len(dims))
            + b"".join(struct.pack("<Q", d) for d in dims)
            + struct.pack("<IQ", gtype, offset)
        )
        offset += (len(raw) + align - 1) // align * align
    body = head + kv + infos
    pad = (-len(body)) % align
    body += b"\0" * pad
    for _, _, _, raw in tensors:
        body += raw + b"\0" * ((-len(raw)) % align)
    with open(path, "wb") as f:
        f.write(body)


# ---------------------------------------------------------------- parse
def test_roundtrip_f32_f16_q8_q4(tmp_path):
    rng = np.random.default_rng(0)
    a32 = rng.normal(size=(4, 8)).astype(np.float32)
    a16 = rng.normal(size=(2, 32)).astype(np.float32)
    aq8 = rng.normal(size=(2, 64)).astype(np.float32)
    aq4 = rng.normal(size=(64,)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    _write_gguf(
        path,
        {
            "general.architecture": (G._STR, _w_str("llama")),
            "llama.block_count": (G._U32, struct.pack("<I", 2)),
            "llama.embedding_length": (G._U32, struct.pack("<I", 16)),
            "general.alignment": (G._U32, struct.pack("<I", 32)),
        },
        [
            ("a32", a32, G.GGML_F32, a32.tobytes()),
            ("a16", a16, G.GGML_F16,
             a16.astype(np.float16).tobytes()),
            ("aq8", aq8, G.GGML_Q8_0, _quant_q8_0(aq8)),
            ("aq4", aq4, G.GGML_Q4_0, _quant_q4_0(aq4)),
        ],
    )
    meta, tensors = G.read_gguf(path)
    assert meta["general.architecture"] == "llama"
    assert meta["llama.block_count"] == 2
    np.testing.assert_array_equal(tensors["a32"], a32)
    np.testing.assert_allclose(tensors["a16"], a16, rtol=2e-3, atol=2e-3)
    # Q8_0: |err| <= d/2 per element
    scale8 = np.abs(aq8.reshape(-1, 32)).max(-1, keepdims=True) / 127
    err8 = np.abs(tensors["aq8"] - aq8).reshape(-1, 32)
    assert (err8 <= scale8 * 0.51 + 1e-6).all()
    # Q4_0: coarse 4-bit quantization; the asymmetric [-8, 7] range
    # clips the positive extreme by up to one full step
    scale4 = np.abs(aq4.reshape(-1, 32)).max(-1, keepdims=True) / 8
    err4 = np.abs(tensors["aq4"] - aq4).reshape(-1, 32)
    assert (err4 <= scale4 * 1.01 + 1e-6).all()


def test_q8_dequant_matches_manual():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(32 * 3,)).astype(np.float32)
    raw = np.frombuffer(_quant_q8_0(a), np.uint8)
    ours = G._decode(G.GGML_Q8_0, raw, a.size)
    # manual reference dequant
    ref = []
    for i in range(3):
        blk = raw[i * 34 : (i + 1) * 34]
        d = np.frombuffer(blk[:2].tobytes(), np.float16)[0]
        q = np.frombuffer(blk[2:].tobytes(), np.int8)
        ref.append(np.float32(d) * q.astype(np.float32))
    np.testing.assert_allclose(ours, np.concatenate(ref), rtol=1e-6)


def test_k_quant_raises(tmp_path):
    with pytest.raises(NotImplementedError):
        G._decode(14, np.zeros(210, np.uint8), 256)


def test_config_kwargs_from_metadata():
    kw = G.config_kwargs_from_gguf({
        "general.architecture": "qwen2",
        "qwen2.embedding_length": 16,
        "qwen2.feed_forward_length": 32,
        "qwen2.block_count": 2,
        "qwen2.attention.head_count": 4,
        "qwen2.attention.head_count_kv": 2,
        "qwen2.rope.freq_base": 10000.0,
    })
    assert kw["hidden_size"] == 16 and kw["num_key_value_heads"] == 2


# ------------------------------------------------------------ model load
def _write_model_gguf(path, cfg, params_np):
    tensors = [
        ("token_embd.weight", params_np["embed"], G.GGML_F32,
         params_np["embed"].tobytes()),
        ("output_norm.weight", params_np["norm_f"], G.GGML_F32,
         params_np["norm_f"].tobytes()),
    ]
    per_layer = [
        ("attn_norm.weight", "ln1", False, G.GGML_F32),
        ("ffn_norm.weight", "ln2", False, G.GGML_F32),
        ("attn_q.weight", "wq", True, G.GGML_Q8_0),
        ("attn_k.weight", "wk", True, G.GGML_Q8_0),
        ("attn_v.weight", "wv", True, G.GGML_F32),
        ("attn_output.weight", "wo", True, G.GGML_Q8_0),
        ("ffn_gate.weight", "gate", True, G.GGML_Q8_0),
        ("ffn_up.weight", "up", True, G.GGML_F32),
        ("ffn_down.weight", "down", True, G.GGML_Q8_0),
    ]
    for i in range(cfg.num_hidden_layers):
        for suffix, key, transpose, gtype in per_layer:
            m = params_np[key][i]
            m = m.T if transpose else m  # GGUF stores [out, in]
            m = np.ascontiguousarray(m)
            raw = (
                _quant_q8_0(m) if gtype == G.GGML_Q8_0 else m.tobytes()
            )
            tensors.append((f"blk.{i}.{suffix}", m, gtype, raw))
    _write_gguf(path, {
        "general.architecture": (G._STR, _w_str("qwen2")),
    }, tensors)


def test_engine_generates_from_gguf(tmp_path):
    """Synthesize a tiny qwen2 as .gguf, load through the standard
    loader dispatch, and check greedy generation matches the fp32
    source params (Q8_0 error is tiny at this scale)."""
    from ht_vllm_omni_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelArchConfig,
        SchedulerConfig,
    )
    from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
    from ht_vllm_omni_tpu.models import qwen2
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    arch = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=16,
        intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        attention_bias=False, dtype="float32", eos_token_id=2,
        tie_word_embeddings=True,
    )
    src = qwen2.init_params(arch, jax.random.PRNGKey(0))
    params_np = {k: np.asarray(v, np.float32) for k, v in src.items()}
    gpath = str(tmp_path / "model.gguf")
    _write_model_gguf(gpath, arch, params_np)

    def engine(params=None, model_path=None):
        return LLMEngine(EngineConfig(
            model=arch, model_path=model_path,
            cache=CacheConfig(page_size=16, num_pages=32),
            scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128),
        ), params=params) if params is not None else LLMEngine(
            EngineConfig(
                model=arch, model_path=model_path,
                cache=CacheConfig(page_size=16, num_pages=32),
                scheduler=SchedulerConfig(
                    max_num_seqs=2, max_model_len=128
                ),
            )
        )

    # loaded params match the fp32 source within Q8_0 tolerance — this
    # pins the name mapping and the [out, in] -> [in, out] transpose
    from ht_vllm_omni_tpu.models.loader import load_hf_params

    loaded = load_hf_params(arch, gpath)
    for key in ("embed", "norm_f", "ln1", "wv", "up"):  # f32 exact
        np.testing.assert_allclose(
            np.asarray(loaded[key]), params_np[key], rtol=1e-6,
            err_msg=key,
        )
    for key in ("wq", "wk", "wo", "gate", "down"):  # Q8_0
        a, b = np.asarray(loaded[key]), params_np[key]
        assert np.abs(a - b).max() < np.abs(b).max() / 100, key

    # and the engine actually serves from the .gguf path
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    got = engine(model_path=gpath).generate([[3, 7, 11]], sp)[0]
    assert len(got.outputs[0].token_ids) == 8
    ref = engine(params=src).generate([[3, 7, 11]], sp)[0]
    assert len(ref.outputs[0].token_ids) == 8
