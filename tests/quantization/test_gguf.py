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


def test_q8_k_roundtrip():
    """block_q8_K: f32 d | int8 qs[256] | i16 bsums[16] (ggml-quants.h);
    quantize manually, dequant must invert exactly."""
    rng = np.random.default_rng(7)
    a = rng.normal(size=(256 * 2,)).astype(np.float32)
    blobs = []
    for blk in a.reshape(-1, 256):
        d = np.abs(blk).max() / 127.0
        q = np.clip(np.round(blk / d), -127, 127).astype(np.int8)
        bsums = q.reshape(16, 16).sum(-1).astype(np.int16)
        blobs.append(
            np.float32(d).tobytes() + q.tobytes() + bsums.tobytes()
        )
        blk_ref = np.float32(d) * q.astype(np.float32)
        assert np.abs(blk - blk_ref).max() <= d * 0.51
    raw = np.frombuffer(b"".join(blobs), np.uint8)
    out = G._decode(G.GGML_Q8_K, raw, a.size)
    ref = np.concatenate(
        [
            np.frombuffer(b[:4], np.float32)
            * np.frombuffer(b[4:260], np.int8).astype(np.float32)
            for b in blobs
        ]
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6)


# ------------------------------------------------- K-quant scalar oracles
# Literal per-element transcriptions of llama.cpp's dequantize_row_q*_K
# loops (ggml-quants.c), kept deliberately scalar/loopy so they share no
# index math with the vectorized implementations under test.
def _f16_at(b, o):
    return np.float32(np.frombuffer(b[o : o + 2].tobytes(), np.float16)[0])


def _oracle_q2_k(raw):
    out = []
    for blk in raw.reshape(-1, 84):
        sc8, qs = blk[:16], blk[16:80]
        d, dmin = _f16_at(blk, 80), _f16_at(blk, 82)
        is_ = 0
        qoff = 0
        for n in range(0, 256, 128):
            shift = 0
            for _j in range(4):
                for half in range(2):
                    s = int(sc8[is_]); is_ += 1
                    dl, ml = d * (s & 0xF), dmin * (s >> 4)
                    for l in range(16):
                        q = (int(qs[qoff + l + 16 * half]) >> shift) & 3
                        out.append(dl * q - ml)
                shift += 2
            qoff += 32
    return np.array(out, np.float32)


def _oracle_q3_k(raw):
    out = []
    for blk in raw.reshape(-1, 110):
        hm, qs, sb = blk[:32], blk[32:96], blk[96:108]
        d_all = _f16_at(blk, 108)
        # 6-bit scales via the aux-word trick
        aux = np.frombuffer(sb.tobytes(), np.uint32).copy()
        km1, km2 = 0x03030303, 0x0F0F0F0F
        tmp = int(aux[2])
        a = [0] * 4
        a[0] = (int(aux[0]) & km2) | (((tmp >> 0) & km1) << 4)
        a[1] = (int(aux[1]) & km2) | (((tmp >> 2) & km1) << 4)
        a[2] = ((int(aux[0]) >> 4) & km2) | (((tmp >> 4) & km1) << 4)
        a[3] = ((int(aux[1]) >> 4) & km2) | (((tmp >> 6) & km1) << 4)
        scales = np.frombuffer(
            np.array(a, dtype=np.uint32).tobytes(), np.int8
        )
        is_, m, qoff = 0, 1, 0
        for n in range(0, 256, 128):
            shift = 0
            for _j in range(4):
                for half in range(2):
                    dl = d_all * (int(scales[is_]) - 32); is_ += 1
                    for l in range(16):
                        q = (int(qs[qoff + l + 16 * half]) >> shift) & 3
                        if not (int(hm[l + 16 * half]) & m):
                            q -= 4
                        out.append(dl * q)
                shift += 2
                m <<= 1
            qoff += 32
    return np.array(out, np.float32)


def _gsm4(j, q):
    if j < 4:
        return int(q[j]) & 63, int(q[j + 4]) & 63
    d = (int(q[j + 4]) & 0xF) | ((int(q[j - 4]) >> 6) << 4)
    m = (int(q[j + 4]) >> 4) | ((int(q[j]) >> 6) << 4)
    return d, m


def _oracle_q4_k(raw):
    out = []
    for blk in raw.reshape(-1, 144):
        d, dmin = _f16_at(blk, 0), _f16_at(blk, 2)
        sc8, qs = blk[4:16], blk[16:144]
        is_, qoff = 0, 0
        for j in range(0, 256, 64):
            s1, m1 = _gsm4(is_, sc8)
            s2, m2 = _gsm4(is_ + 1, sc8)
            for l in range(32):
                out.append(d * s1 * (int(qs[qoff + l]) & 0xF) - dmin * m1)
            for l in range(32):
                out.append(d * s2 * (int(qs[qoff + l]) >> 4) - dmin * m2)
            qoff += 32
            is_ += 2
    return np.array(out, np.float32)


def _oracle_q5_k(raw):
    out = []
    for blk in raw.reshape(-1, 176):
        d, dmin = _f16_at(blk, 0), _f16_at(blk, 2)
        sc8, qh, ql = blk[4:16], blk[16:48], blk[48:176]
        is_, qoff, u1, u2 = 0, 0, 1, 2
        for j in range(0, 256, 64):
            s1, m1 = _gsm4(is_, sc8)
            s2, m2 = _gsm4(is_ + 1, sc8)
            for l in range(32):
                q = (int(ql[qoff + l]) & 0xF) + (
                    16 if int(qh[l]) & u1 else 0
                )
                out.append(d * s1 * q - dmin * m1)
            for l in range(32):
                q = (int(ql[qoff + l]) >> 4) + (
                    16 if int(qh[l]) & u2 else 0
                )
                out.append(d * s2 * q - dmin * m2)
            qoff += 32
            is_ += 2
            u1 <<= 2
            u2 <<= 2
    return np.array(out, np.float32)


def _oracle_q6_k(raw):
    out = []
    for blk in raw.reshape(-1, 210):
        ql, qh = blk[:128], blk[128:192]
        sc = np.frombuffer(blk[192:208].tobytes(), np.int8)
        d = _f16_at(blk, 208)
        y = np.zeros(256, np.float32)
        lo, ho, so, yo = 0, 0, 0, 0
        for n in range(0, 256, 128):
            for l in range(32):
                is_ = l // 16
                q1 = ((int(ql[lo + l]) & 0xF)
                      | (((int(qh[ho + l]) >> 0) & 3) << 4)) - 32
                q2 = ((int(ql[lo + l + 32]) & 0xF)
                      | (((int(qh[ho + l]) >> 2) & 3) << 4)) - 32
                q3 = ((int(ql[lo + l]) >> 4)
                      | (((int(qh[ho + l]) >> 4) & 3) << 4)) - 32
                q4 = ((int(ql[lo + l + 32]) >> 4)
                      | (((int(qh[ho + l]) >> 6) & 3) << 4)) - 32
                y[yo + l] = d * int(sc[so + is_]) * q1
                y[yo + l + 32] = d * int(sc[so + is_ + 2]) * q2
                y[yo + l + 64] = d * int(sc[so + is_ + 4]) * q3
                y[yo + l + 96] = d * int(sc[so + is_ + 6]) * q4
            lo += 64
            ho += 32
            so += 8
            yo += 128
        out.append(y)
    return np.concatenate(out)


_K_CASES = [
    (G.GGML_Q2_K, 84, _oracle_q2_k),
    (G.GGML_Q3_K, 110, _oracle_q3_k),
    (G.GGML_Q4_K, 144, _oracle_q4_k),
    (G.GGML_Q5_K, 176, _oracle_q5_k),
    (G.GGML_Q6_K, 210, _oracle_q6_k),
]


@pytest.mark.parametrize("gtype,bsz,oracle", _K_CASES)
def test_k_quant_dequant_matches_scalar_oracle(gtype, bsz, oracle):
    rng = np.random.default_rng(gtype)
    nblocks = 3
    raw = rng.integers(0, 256, size=nblocks * bsz, dtype=np.uint8)
    # keep the f16 super-scales finite
    for b in range(nblocks):
        off = {G.GGML_Q2_K: 80, G.GGML_Q3_K: 108, G.GGML_Q4_K: 0,
               G.GGML_Q5_K: 0, G.GGML_Q6_K: 208}[gtype]
        scale_bytes = np.float16(rng.normal() * 0.01).tobytes()
        raw[b * bsz + off : b * bsz + off + 2] = np.frombuffer(
            scale_bytes, np.uint8
        )
        if gtype in (G.GGML_Q2_K, G.GGML_Q4_K, G.GGML_Q5_K):
            off2 = off + 2 if gtype != G.GGML_Q2_K else 82
            min_bytes = np.float16(rng.normal() * 0.01).tobytes()
            raw[b * bsz + off2 : b * bsz + off2 + 2] = np.frombuffer(
                min_bytes, np.uint8
            )
    got = G._decode(gtype, raw, nblocks * 256)
    want = oracle(raw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_k_quant_nbytes_and_partial_tail():
    # _tensor_nbytes handles 256-wide blocks, and trailing n < capacity
    assert G._tensor_nbytes(G.GGML_Q4_K, 512) == 2 * 144
    raw = np.zeros(144, np.uint8)
    assert G._decode(G.GGML_Q4_K, raw, 200).shape == (200,)


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
