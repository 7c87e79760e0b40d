"""Qwen3-Omni perception adapter: raw image/audio -> thinker embeddings.

Bridges the engine's multimodal prompt processor
(models/input_processing.py) to the real towers in this package —
replacing the round-1 mean-colour placeholder.  Covers the HF
processor's role (reference uses Qwen3OmniMoeProcessor + the thinker's
towers, qwen3_omni_moe_thinker.py):

- images: normalise, resize to the patch grid, build conv3d patches in
  spatial-merge-block order, run the vision tower -> merged embeddings
  + the (t, h, w) grid for M-RoPE.
- audio: 16 kHz waveform -> whisper-style 128-bin log-mel (numpy STFT,
  slaney mel filterbank) -> audio tower -> one embedding per ~80 ms.

Weights load from an HF Qwen3-Omni checkpoint when available and fall
back to random init (tests, benches) otherwise.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ht_vllm_omni_tpu.models.qwen3_omni import audio_encoder as ae
from ht_vllm_omni_tpu.models.qwen3_omni import vision_encoder as ve

_IMG_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_IMG_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


# ------------------------------------------------------------- mel frontend
@functools.lru_cache(maxsize=4)
def _mel_filters(
    sr: int, n_fft: int, n_mels: int
) -> np.ndarray:
    """Slaney-scale mel filterbank [n_mels, n_fft//2+1] (librosa-style,
    what Whisper/Qwen audio frontends use)."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mels = f / (200.0 / 3)
        log_region = f >= 1000.0
        mels = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
            mels,
        )
        return mels

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        return np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)

    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))
    fb = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        # slaney normalisation
        fb[i] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


def log_mel_spectrogram(
    wav: np.ndarray, sr: int = 16000, n_fft: int = 400, hop: int = 160,
    n_mels: int = 128,
) -> np.ndarray:
    """Whisper-style log-mel: reflect-padded STFT, power spectrum, mel
    projection, log10 with dynamic-range clamp.  Returns [n_mels, T]."""
    wav = np.asarray(wav, np.float32)
    pad = n_fft // 2
    x = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    frames = np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, n_fft),
        strides=(x.strides[0] * hop, x.strides[0]),
    )
    spec = np.abs(np.fft.rfft(frames * window, axis=-1)) ** 2  # [T, F]
    mel = _mel_filters(sr, n_fft, n_mels) @ spec.T  # [n_mels, T]
    logm = np.log10(np.maximum(mel, 1e-10))
    logm = np.maximum(logm, logm.max() - 8.0)
    logm = (logm + 4.0) / 4.0
    # whisper drops the final frame (it covers only padding)
    return logm[:, :-1].astype(np.float32)


# ---------------------------------------------------------------- adapter
class Qwen3OmniPerception:
    """Holds the vision + audio towers and exposes the prompt-processor
    encoder interface (encode_image / encode_audio)."""

    def __init__(
        self,
        vision_cfg: ve.VisionEncoderConfig | None = None,
        audio_cfg: ae.AudioEncoderConfig | None = None,
        vision_params: dict | None = None,
        audio_params: dict | None = None,
        seed: int = 0,
    ) -> None:
        self.vision_cfg = vision_cfg
        self.audio_cfg = audio_cfg
        key = jax.random.PRNGKey(seed)
        if vision_cfg is not None:
            self.vision_params = vision_params or ve.init_params(
                vision_cfg, key
            )
        if audio_cfg is not None:
            self.audio_params = audio_params or ae.init_params(
                audio_cfg, jax.random.fold_in(key, 1)
            )
        self._audio_fwd_cache: dict[int, object] = {}

    # ------------------------------------------------------------ image
    def preprocess_image(self, image: np.ndarray) -> tuple[np.ndarray, tuple]:
        """[H, W, C] uint8/float -> (patches [S, patch_dim] in merge-block
        order, grid (1, gh, gw))."""
        cfg = self.vision_cfg
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        img = (img - _IMG_MEAN) / _IMG_STD
        unit = cfg.patch_size * cfg.spatial_merge_size
        gh = max(round(img.shape[0] / cfg.patch_size), cfg.spatial_merge_size)
        gw = max(round(img.shape[1] / cfg.patch_size), cfg.spatial_merge_size)
        gh -= gh % cfg.spatial_merge_size
        gw -= gw % cfg.spatial_merge_size
        th, tw = gh * cfg.patch_size, gw * cfg.patch_size
        img = _resize_bilinear(img, th, tw)
        # [gh, P, gw, P, C] -> temporal duplicate to T_patch frames
        p = cfg.patch_size
        m = cfg.spatial_merge_size
        patches = img.reshape(gh, p, gw, p, -1)
        # merge-block order: (gh/m, gw/m, m, m) row-major
        patches = patches.transpose(0, 2, 1, 3, 4)  # [gh, gw, P, P, C]
        patches = patches.reshape(gh // m, m, gw // m, m, p, p, -1)
        patches = patches.transpose(0, 2, 1, 3, 4, 5, 6).reshape(
            gh * gw, p, p, -1
        )
        # conv3d patch layout: [C, T_patch, P, P] flattened
        c = patches.shape[-1]
        pat = patches.transpose(0, 3, 1, 2)  # [S, C, P, P]
        pat = np.repeat(pat[:, :, None], cfg.temporal_patch_size, axis=2)
        return pat.reshape(gh * gw, -1).astype(np.float32), (1, gh, gw)

    def encode_image(self, image: np.ndarray, hidden: int | None = None):
        """Returns (embeds [merged_tokens, out_hidden], grid (1, gh, gw))
        where merged grid for M-RoPE is (1, gh/m, gw/m)."""
        patches, grid = self.preprocess_image(image)
        geo = ve.grid_positions(self.vision_cfg, [grid])
        out, _ds = ve.forward(self.vision_cfg, self.vision_params, patches, geo)
        m = self.vision_cfg.spatial_merge_size
        return np.asarray(out), (1, grid[1] // m, grid[2] // m)

    # ------------------------------------------------------------ audio
    def encode_audio(self, wav: np.ndarray, sr: int = 16000) -> np.ndarray:
        """Returns [n_tokens, output_dim] thinker-space audio embeddings."""
        cfg = self.audio_cfg
        mel = log_mel_spectrogram(wav, sr=sr, n_mels=cfg.num_mel_bins)
        t = mel.shape[1]
        chunk = cfg.chunk_frames
        t_pad = ((t + chunk - 1) // chunk) * chunk
        mel_pad = np.zeros((cfg.num_mel_bins, t_pad), np.float32)
        mel_pad[:, :t] = mel
        fwd = self._audio_fwd_cache.get(t_pad)
        if fwd is None:
            fwd = jax.jit(
                lambda m, n: ae.forward(cfg, self.audio_params, m, n)
            )
            self._audio_fwd_cache[t_pad] = fwd
        emb, out_len = fwd(mel_pad, np.int32(t))
        return np.asarray(emb)[: int(out_len)]


def _resize_bilinear(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Minimal bilinear resize (align_corners=False semantics)."""
    h, w = img.shape[:2]
    if (h, w) == (th, tw):
        return img
    ys = (np.arange(th) + 0.5) * h / th - 0.5
    xs = (np.arange(tw) + 0.5) * w / tw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return (
        a * (1 - wy) * (1 - wx)
        + b * (1 - wy) * wx
        + c * wy * (1 - wx)
        + d * wy * wx
    ).astype(np.float32)
