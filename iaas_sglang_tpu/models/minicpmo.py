"""MiniCPM-O 2.6 (reference: srt/models/minicpmo.py MiniCPMO).

MiniCPM-V 2.6 (Idefics2 tower + perceiver resampler + qwen2 LM, see
models/minicpmv.py) plus an audio-understanding branch: a Whisper encoder
('apm.*' keys) with per-clip padding masks and optional chunked attention
(minicpmo.py:1706 subsequent_chunk_mask with audio_chunk_length seconds =
chunk_length*50 post-conv frames), final layer_norm, then the
linear1-ReLU-linear2 'audio_projection_layer' into LM space and an
AvgPool1d(audio_pool_step) on the time axis (minicpmo.py:1726-1740).
The TTS generation head (ConditionalChatTTS) is disabled in the reference
serving path (minicpmo.py:1447 init_tts = False) and not built here.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.llama_family import WeightSpec
from iaas_sglang_tpu.models.minicpmv import MiniCPMV
from iaas_sglang_tpu.models.qwen2_audio import (AudioTowerConfig,
                                                 whisper_encode_trunk,
                                                 whisper_tower_specs)
from iaas_sglang_tpu.models.vision import layer_norm

_APM = "apm.|model.apm."
_PROJ = "audio_projection_layer.|model.audio_projection_layer."


def minicpmo_audio_tokens(mel_frames: int, pool_step: int) -> int:
    """LM rows per clip (reference _get_feat_extract_output_lengths,
    minicpmo.py:1533-1539): conv stride-2 then AvgPool1d(pool_step)."""
    conv = (mel_frames - 1) // 2 + 1
    return (conv - pool_step) // pool_step + 1


class MiniCPMO(MiniCPMV):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.ac = AudioTowerConfig(hf.get("audio_config") or {})
        self.audio_pool_step = hf.get("audio_pool_step", 2)
        # seconds of full attention per chunk; <=0 disables chunking
        # (50 post-conv frames per second, minicpmo.py:1707)
        self.audio_chunk_frames = int(
            float(hf.get("audio_chunk_length", 1.0)) * 50)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s = super().weight_specs()

        def k(suffix):
            return "|".join(pref + suffix for pref in _APM.split("|"))

        for name, spec in whisper_tower_specs(k, self.ac).items():
            s[name.replace("at", "apm", 1)] = spec

        Da, H = self.ac.hidden_size, self.config.hidden_size

        def pk(suffix):
            return "|".join(pref + suffix for pref in _PROJ.split("|"))

        # reference derives in_dim as encoder_ffn_dim // 4 == d_model
        # (minicpmo.py:1437)
        s["ap.l1_w"] = WeightSpec((Da, H), (None, None),
                                  pk("linear1.weight"), transpose=True)
        s["ap.l1_b"] = WeightSpec((H,), (None,), pk("linear1.bias"))
        s["ap.l2_w"] = WeightSpec((H, H), (None, None),
                                  pk("linear2.weight"), transpose=True)
        s["ap.l2_b"] = WeightSpec((H,), (None,), pk("linear2.bias"))
        return s

    # ------------------------------------------------------------- compute

    def patchify_audio(self, mel: np.ndarray) -> np.ndarray:
        """[N, n_mels, T] log-mel -> [N, T, n_mels] for the conv-as-matmul
        whisper trunk."""
        return np.swapaxes(np.asarray(mel), 1, 2)

    def encode_audio(self, params: dict[str, Any], mel_t: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
        """mel_t [N, T, n_mels], valid mel frames [N] -> LM rows
        [N, (T/2)//pool, H]. Rows beyond a clip's token count are sliced
        off by the caller."""
        N, T, _ = mel_t.shape
        T2 = T // 2
        conv_valid = (valid - 1) // 2 + 1    # stride-2 conv frames
        i = jnp.arange(T2)
        # padded keys masked for every query (minicpmo.py:1690-1703); with
        # chunking, query i additionally sees only keys before its chunk's
        # end (num_left_chunks=-1: all earlier chunks visible)
        allow = i[None, None, :] < conv_valid[:, None, None]   # [N,1,T2]
        allow = jnp.broadcast_to(allow[:, :, None, :], (N, 1, T2, T2))
        if self.audio_chunk_frames > 0:
            cf = self.audio_chunk_frames
            chunk_end = (i // cf + 1) * cf
            allow = allow & (i[None, :] < chunk_end[:, None])[None, None]
        bias = jnp.where(allow, 0.0, -jnp.inf).astype(jnp.float32)

        h = whisper_encode_trunk(params["apm"], params["apm_layers"],
                                 mel_t, self.ac.num_heads, attn_bias=bias)
        at = params["apm"]
        h = layer_norm(h, at["ln_post_w"], at["ln_post_b"], 1e-5)
        ap = params["ap"]
        x = h.astype(jnp.float32) @ ap["l1_w"].astype(jnp.float32) \
            + ap["l1_b"]
        x = jax.nn.relu(x)
        x = x @ ap["l2_w"].astype(jnp.float32) + ap["l2_b"]
        # AvgPool1d(pool_step, stride=pool_step) on time
        p = self.audio_pool_step
        x = x[:, : (T2 // p) * p].reshape(N, T2 // p, p, -1).mean(axis=2)
        return x.astype(ap["l1_w"].dtype)
