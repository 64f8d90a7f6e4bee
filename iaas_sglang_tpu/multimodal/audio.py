"""Audio ingestion + Whisper log-mel features in pure numpy (the TPU
analog of the reference's librosa/WhisperFeatureExtractor pipeline,
srt/multimodal/processors/qwen_audio.py — librosa is not in the image).

Accepted payloads: float waveform (np.ndarray / list), WAV file path or
bytes, base64/data-URI WAV. Compressed formats (mp3/ogg) need a decoder
the image doesn't ship; callers should send wav or raw float PCM.
"""

from __future__ import annotations

import base64
import io
import os
from typing import Any, Tuple

import numpy as np

SAMPLE_RATE = 16000


def load_audio(data: Any, target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """-> float32 mono waveform at target_sr."""
    if isinstance(data, dict):
        # {"data": ..., "sample_rate": ...} or {"url": ...}
        sr = data.get("sample_rate", target_sr)
        return _resample(load_audio(data.get("data") or data.get("url"),
                                    target_sr=None), sr, target_sr)
    if isinstance(data, (list, tuple)):
        return np.asarray(data, np.float32)
    if isinstance(data, np.ndarray):
        x = data.astype(np.float32)
        return x.mean(axis=0) if x.ndim == 2 else x
    if isinstance(data, str):
        if data.startswith("data:"):
            b64 = data.split(",", 1)[1]
            return _decode_wav(base64.b64decode(b64), target_sr)
        if os.path.exists(data):
            with open(data, "rb") as f:
                return _decode_wav(f.read(), target_sr)
        # bare base64
        return _decode_wav(base64.b64decode(data), target_sr)
    if isinstance(data, bytes):
        return _decode_wav(data, target_sr)
    raise ValueError(f"unsupported audio payload type {type(data)}")


def _decode_wav(raw: bytes, target_sr) -> np.ndarray:
    import wave

    with wave.open(io.BytesIO(raw)) as w:
        sr = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        buf = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(buf, np.int16).astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(buf, np.int32).astype(np.float32) / 2147483648.0
    elif sw == 1:
        x = (np.frombuffer(buf, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return _resample(x, sr, target_sr)


def _resample(x: np.ndarray, sr: int, target_sr) -> np.ndarray:
    if target_sr is None or sr == target_sr:
        return x.astype(np.float32)
    n_out = int(round(len(x) * target_sr / sr))
    t = np.linspace(0.0, len(x) - 1, n_out)
    return np.interp(t, np.arange(len(x)), x).astype(np.float32)


# -------------------------------------------------------- mel filterbank


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, what Whisper's filters use)."""
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mels = np.where(above,
                    min_log_hz / f_sp + np.log(np.maximum(f, 1e-10)
                                               / min_log_hz) / logstep,
                    mels)
    return mels


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


def mel_filter_bank(n_freqs: int, n_mels: int, sr: int = SAMPLE_RATE,
                    n_fft: int = 400) -> np.ndarray:
    """[n_mels, n_freqs] slaney-normalized triangular filters (librosa
    filters.mel with htk=False, norm='slaney')."""
    fmax = sr / 2
    mel_pts = np.linspace(_hz_to_mel(np.array(0.0)),
                          _hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)                       # [n_mels+2]
    fft_freqs = np.linspace(0, fmax, n_freqs)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]       # [n_mels+2, F]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def whisper_log_mel(wave: np.ndarray, n_mels: int = 128,
                    n_fft: int = 400, hop: int = 160,
                    chunk_s: int = 30) -> Tuple[np.ndarray, int]:
    """Whisper feature extraction: pad/trim to chunk_s seconds, hann STFT
    (center reflect padding), mel, log10, dynamic-range clamp, (x+4)/4.
    Returns (mel [n_mels, 3000], valid_frames before padding)."""
    n_samples = chunk_s * SAMPLE_RATE
    valid_frames = min(len(wave), n_samples) // hop
    x = wave[:n_samples].astype(np.float64)
    if len(x) < n_samples:
        x = np.pad(x, (0, n_samples - len(x)))
    x = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    win = np.hanning(n_fft + 1)[:-1]
    n_frames = 1 + (len(x) - n_fft) // hop             # 3001
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])
    frames = x[idx] * win[None, :]
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    power = np.abs(spec) ** 2                          # [3001, 201]
    power = power[:-1]                                 # whisper drops last
    filters = mel_filter_bank(n_fft // 2 + 1, n_mels)
    mel = filters @ power.T                            # [n_mels, 3000]
    logm = np.log10(np.maximum(mel, 1e-10))
    logm = np.maximum(logm, logm.max() - 8.0)
    return ((logm + 4.0) / 4.0).astype(np.float32), valid_frames
