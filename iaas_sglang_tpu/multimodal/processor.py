"""Host-side multimodal input processing (analog of the reference's
srt/multimodal/processors/base_processor.py:84 per-model processors).

Responsibilities:
  * decode image payloads (base64 / data URI / local path / nested lists)
  * CLIP-style preprocessing to fixed [3, S, S] pixel tensors (static
    shapes — the vision tower compiles once per image-size bucket)
  * expand each image-placeholder token into `num_image_tokens` pseudo ids
    DERIVED FROM THE IMAGE HASH (reference pad_input_ids): the radix cache
    then keys on image content, and the pseudo rows' embeddings are
    overwritten by the projected vision features on device.
"""

from __future__ import annotations

import base64
import dataclasses
import hashlib
import io
from typing import Any, List, Optional, Tuple

import numpy as np

# CLIP / OpenAI normalization constants (used by llava's image processor)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


@dataclasses.dataclass
class MMItem:
    """One image attached to a request."""

    hash: str                 # sha1 of the pixel bytes (cache key)
    offset: int               # token offset of the image span in input_ids
    num_tokens: int           # span length (num_image_tokens)
    pixel: np.ndarray         # model-ready pixels: llava f32 [3, S, S];
    #                           qwen2-vl flattened patches f32 [S, patch_dim]
    grid: Any = None          # qwen2-vl (t, gh, gw) patch grid | None
    modality: str = "image"   # "image" | "audio" (dual-modality models
    #                           route audio items to model.encode_audio)
    enc_tokens: int = 0       # cross-attention models (Mllama): encoder
    #                           rows per item (num_tokens stays 0 — the
    #                           image occupies no text positions)


def load_image(data: Any):
    """Accepts: local file path, raw/base64 string, data URI, bytes,
    np.ndarray [H, W, 3], PIL image. Network URLs are rejected (the serving
    host runs with zero egress — fetch upstream of the API)."""
    from PIL import Image

    if isinstance(data, Image.Image):
        return data.convert("RGB")
    if isinstance(data, np.ndarray):
        return Image.fromarray(data.astype(np.uint8)).convert("RGB")
    if isinstance(data, bytes):
        return Image.open(io.BytesIO(data)).convert("RGB")
    if isinstance(data, dict):
        data = data.get("url") or data.get("image_url") or ""
    if not isinstance(data, str):
        raise ValueError(f"unsupported image payload type {type(data)}")
    if data.startswith("data:"):
        b64 = data.split(",", 1)[1]
        return Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
    if data.startswith(("http://", "https://")):
        raise ValueError(
            "network image URLs are not fetched by the server (zero-egress "
            "deployment); send base64 or a local path")
    if data.startswith("file://"):
        data = data[len("file://"):]
    import os

    if os.path.exists(data):
        return Image.open(data).convert("RGB")
    # assume raw base64
    return Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")


def clip_preprocess(img, image_size: int) -> np.ndarray:
    """Resize shortest side -> center crop -> normalize. Mirrors
    CLIPImageProcessor defaults (bicubic shortest-edge resize)."""
    from PIL import Image

    w, h = img.size
    scale = image_size / min(w, h)
    nw, nh = max(round(w * scale), image_size), max(round(h * scale), image_size)
    img = img.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - image_size) // 2, (nh - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, dtype=np.float32) / 255.0     # [S, S, 3]
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)                        # [3, S, S]


def qwen2vl_preprocess(img, image_size: int, patch: int = 14,
                       temporal: int = 2, merge: int = 2
                       ) -> Tuple[np.ndarray, tuple]:
    """Qwen2-VL flattened-patch preprocessing (mirrors HF
    Qwen2VLImageProcessor._preprocess), resized to a FIXED square so the
    vision tower compiles once per bucket (static shapes over the
    reference's dynamic resolution). Returns (patches [S, C*tp*p*p],
    grid (1, gh, gw)); patch rows are in 2x2 merge-block order."""
    from PIL import Image

    img = img.resize((image_size, image_size), Image.BICUBIC)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = ((arr - CLIP_MEAN) / CLIP_STD).transpose(2, 0, 1)  # [3, S, S]
    C = arr.shape[0]
    frames = np.repeat(arr[None], temporal, axis=0)          # [tp, 3, S, S]
    gh = gw = image_size // patch
    x = frames.reshape(1, temporal, C, gh // merge, merge, patch,
                       gw // merge, merge, patch)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (x.reshape(gh * gw, C * temporal * patch * patch),
            (1, gh, gw))


def internvl_preprocess(img, image_size: int) -> np.ndarray:
    """InternVL single-tile preprocessing: square resize (bicubic) +
    imagenet mean/std (reference srt/multimodal/processors/internvl.py)."""
    from PIL import Image

    img = img.resize((image_size, image_size), Image.BICUBIC)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    arr = (arr - mean) / std
    return arr.transpose(2, 0, 1)


def siglip_preprocess(img, image_size: int) -> np.ndarray:
    """SigLIP standalone preprocessing (HF SiglipImageProcessor): square
    resize (bicubic) + mean/std = 0.5 normalization."""
    from PIL import Image

    img = img.resize((image_size, image_size), Image.BICUBIC)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr.transpose(2, 0, 1)


def gemma3_preprocess(img, image_size: int) -> np.ndarray:
    """Gemma3/SigLIP preprocessing: plain square resize (bilinear) and
    mean/std = 0.5 normalization (HF Gemma3ImageProcessor defaults,
    pan-and-scan off)."""
    from PIL import Image

    img = img.resize((image_size, image_size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr.transpose(2, 0, 1)


class MultimodalProcessor:
    """Built from ModelConfig; stateless per request."""

    def __init__(self, model_config):
        self.config = model_config
        vc = model_config.vision_config or {}
        self.model_type = model_config.model_type
        self.image_token_id = model_config.image_token_id
        self.vocab_size = model_config.vocab_size
        self.is_video = False
        self.is_gemma3 = any(
            a == "Gemma3ForConditionalGeneration"
            for a in (model_config.architectures or []))
        if self.is_gemma3:
            # Gemma3: square resize + 0.5/0.5 normalize; the projector
            # pools the patch grid down to mm_tokens_per_image rows
            self.image_size = vc.get("image_size", 896)
            self.num_image_tokens = model_config.hf_config.get(
                "mm_tokens_per_image", 256)
        elif self.model_type in ("qwen2_vl", "qwen2_5_vl"):
            self.patch = vc.get("patch_size", 14)
            self.merge = vc.get("spatial_merge_size", 2)
            self.temporal = vc.get("temporal_patch_size", 2)
            # fixed serving resolution (static compile bucket); override
            # via vision_config["serving_image_size"]
            self.image_size = vc.get("serving_image_size", 448)
            self.num_image_tokens = (self.image_size // self.patch) ** 2 \
                // self.merge ** 2
        elif self.model_type == "vila":
            # VILA: SigLIP square resize (bicubic, 0.5/0.5), projector
            # downsamples the patch grid 3x3 -> ceil(g/3)^2 rows
            self.image_size = vc.get("image_size", 448)
            g = self.image_size // vc.get("patch_size", 14)
            t = -(-g // 3)
            self.num_image_tokens = t * t
        elif any(a == "InternVLChatModel"
                 for a in (model_config.architectures or [])):
            # InternVL: 448px square (single tile; the reference's dynamic
            # tiling is preprocessing-side), imagenet mean/std, tokens =
            # grid^2 * downsample_ratio^2 after pixel_shuffle
            self.is_internvl = True
            hf = model_config.hf_config
            self.image_size = (hf.get("force_image_size")
                               or vc.get("image_size", 448))
            g = self.image_size // vc.get("patch_size", 14)
            ds = hf.get("downsample_ratio", 0.5)
            self.num_image_tokens = int(g * g * ds * ds)
        elif any(a in ("MiniCPMV", "MiniCPMO")
                 for a in (model_config.architectures or [])):
            # MiniCPM-V/O: one fixed square tile (the reference's adaptive
            # slicing is preprocessing-side); the perceiver resampler emits
            # query_num rows per image regardless of grid size. -O adds a
            # second (audio) placeholder stream through the Whisper branch.
            self.is_minicpmv = True
            self.image_size = vc.get("serving_image_size", 448)
            self.num_image_tokens = model_config.hf_config.get(
                "query_num", 64)
            if model_config.audio_token_id is not None:
                hf = model_config.hf_config
                self.audio_token_id = model_config.audio_token_id
                ac = hf.get("audio_config") or {}
                self.n_mels = ac.get("num_mel_bins", 80)
                self.audio_pool_step = hf.get("audio_pool_step", 2)
        elif any(a == "KimiVLForConditionalGeneration"
                 for a in (model_config.architectures or [])):
            # Kimi-VL: fixed square tile (the reference's native dynamic
            # resolution is preprocessing-side); 2x2 merger -> (g/2)^2 rows
            self.is_kimi_vl = True
            self.image_size = vc.get("serving_image_size", 448)
            g = self.image_size // vc.get("patch_size", 14)
            kh, kw = tuple(vc.get("merge_kernel_size", (2, 2)))
            self.num_image_tokens = (g // kh) * (g // kw)
        elif any(a == "DeepseekVL2ForCausalLM"
                 for a in (model_config.architectures or [])):
            # DeepSeek-VL2: fixed (1,1)-crop square tile at grid*patch px;
            # rows = 2 views * hp*(hp+1) (newline per row) + 1 separator
            self.is_deepseek_vl2 = True
            p = vc.get("patch_size", 14)
            g = vc.get("image_size", 384) // p
            self.image_size = g * p
            pc = model_config.hf_config.get("projector_config") or {}
            ds = pc.get("downsample_ratio", 2)
            hp = -(-g // ds)
            self.num_image_tokens = 2 * hp * (hp + 1) + 1
        elif (any(a == "Llama4ForConditionalGeneration"
                  for a in (model_config.architectures or []))
              and model_config.vision_config):
            # Llama-4 vision: one fixed square tile; pixel-shuffle adapter
            # emits (g*ratio)^2 rows per image
            self.is_llama4 = True
            self.image_size = vc.get("image_size", 336)
            g = self.image_size // vc.get("patch_size", 14)
            r = vc.get("pixel_shuffle_ratio", 0.5)
            self.num_image_tokens = int(g * g * r * r)
        elif any(a == "Gemma3nForConditionalGeneration"
                 for a in (model_config.architectures or [])):
            # Gemma 3n: audio through the conformer tower (every clip
            # occupies audio_soft_tokens_per_image positions); the vision
            # tower (MobileNetV5 via timm) is unavailable here
            self.is_gemma3n = True
            hf = model_config.hf_config
            self.audio_token_id = model_config.audio_token_id
            ac = hf.get("audio_config") or {}
            self.n_mels = ac.get("input_feat_size", 128)
            self.num_image_tokens = hf.get("audio_soft_tokens_per_image",
                                           188)
        elif any(a == "Phi4MMForCausalLM"
                 for a in (model_config.architectures or [])):
            # Phi-4-MM: fixed single crop; pooled grid g2 -> per-view
            # g2*(g2+1) rows + glb_GN; sub view == global view
            self.is_phi4mm = True
            self.image_size = vc.get("image_size", 448)
            g2 = self.image_size // vc.get("patch_size", 14) // 2
            self.num_image_tokens = 2 * g2 * (g2 + 1) + 1
        elif model_config.cross_attention_layers:
            # Mllama: the image occupies NO text positions — the tower's
            # (grid^2 + 1) rows become per-request encoder KV for the
            # cross layers; the <|image|> token stays in the prompt
            self.is_cross_attn = True
            self.image_size = vc.get("image_size", 560)
            g = self.image_size // vc.get("patch_size", 14)
            self.num_image_tokens = g * g + 1
        elif self.model_type == "qwen2_audio":
            # Whisper tower: 30 s chunks -> up to 750 rows per clip
            from iaas_sglang_tpu.models.qwen2_audio import (
                audio_output_lengths,
            )

            self.is_audio = True
            ac = model_config.hf_config.get("audio_config") or {}
            self.n_mels = ac.get("num_mel_bins", 128)
            self.num_image_tokens = audio_output_lengths(
                2 * ac.get("max_source_positions", 1500))
        elif self.model_type == "mistral3":
            # Pixtral tower: fixed serving square; tokens = grid^2/merge^2
            from iaas_sglang_tpu.models.pixtral import PixtralVisionConfig

            pvc = PixtralVisionConfig(vc)
            self.image_size = pvc.serving_size
            merge = model_config.hf_config.get("spatial_merge_size", 2)
            self.num_image_tokens = pvc.num_patches // (merge * merge)
        elif self.model_type == "multi_modality":
            # Janus-Pro: timm-SigLIP tower; square resize + 0.5/0.5
            from iaas_sglang_tpu.models.vision import TimmVitConfig

            vp = vc.get("params", {})
            tvc = TimmVitConfig(
                vp.get("model_name", "siglip_large_patch16_384"),
                vp.get("image_size"), overrides=vp)
            self.image_size = tvc.image_size
            self.num_image_tokens = tvc.num_patches
        elif any(a == "LlavaVidForCausalLM"
                 for a in (model_config.architectures or [])):
            # video: num_frames pooled frames per placeholder
            self.is_video = True
            self.image_size = vc.get("image_size", 336)
            patch = vc.get("patch_size", 14)
            hf = model_config.hf_config
            self.num_frames = hf.get("num_frames", 16)
            stride = hf.get("mm_spatial_pool_stride", 2)
            g = self.image_size // patch // stride
            self.num_image_tokens = self.num_frames * g * g
        else:
            self.image_size = vc.get("image_size", 336)
            patch = vc.get("patch_size", 14)
            n = (self.image_size // patch) ** 2
            if model_config.vision_feature_select_strategy == "full":
                n += 1
            self.num_image_tokens = n

    def _prep_audio(self, data) -> Tuple[np.ndarray, int, int]:
        """Dual-modality models: one clip -> (mel, valid_frames,
        n_lm_tokens)."""
        from iaas_sglang_tpu.multimodal.audio import load_audio

        if getattr(self, "is_gemma3n", False):
            # Gemma3n: HF Gemma3nAudioFeatureExtractor (numpy) on a fixed
            # 30 s buffer; every clip occupies audio_soft_tokens positions
            from transformers import Gemma3nAudioFeatureExtractor

            if not hasattr(self, "_g3n_fe"):
                self._g3n_fe = Gemma3nAudioFeatureExtractor(
                    feature_size=self.n_mels, padding_value=0.0,
                    dither=0.0)
            wave = load_audio(data)
            n = 30 * 16000
            valid_samples = min(len(wave), n)
            buf = np.zeros(n, np.float32)
            buf[:valid_samples] = wave[:n]
            mel, _ = self._g3n_fe._extract_spectrogram(
                buf, np.ones(n, bool))               # [T, n_mels]
            mel = np.asarray(mel, np.float32)
            hop = self._g3n_fe.hop_length
            fl = self._g3n_fe.frame_length
            valid = max(0, (valid_samples - (fl + 1)) // hop + 1)
            return mel, int(min(valid, mel.shape[0])), self.num_image_tokens
        from iaas_sglang_tpu.models.minicpmo import minicpmo_audio_tokens
        from iaas_sglang_tpu.multimodal.audio import whisper_log_mel

        mel, valid = whisper_log_mel(load_audio(data), self.n_mels)
        return mel, valid, minicpmo_audio_tokens(valid,
                                                 self.audio_pool_step)

    def _prep(self, data) -> Tuple[np.ndarray, Any]:
        if getattr(self, "is_gemma3n", False):
            raise ValueError(
                "gemma3n image inputs are not supported (the MobileNetV5 "
                "vision tower needs timm); audio and text only")
        if getattr(self, "is_audio", False):
            # audio: whisper log-mel; grid carries the un-padded frame
            # count so num_tokens tracks the clip length
            from iaas_sglang_tpu.multimodal.audio import (load_audio,
                                                           whisper_log_mel)

            mel, valid = whisper_log_mel(load_audio(data), self.n_mels)
            return mel, valid
        if getattr(self, "is_video", False):
            # a video arrives as a LIST of frame payloads; pad by repeating
            # the last frame / trim to num_frames (static tower shapes)
            frames = data if isinstance(data, (list, tuple)) else [data]
            px = [clip_preprocess(load_image(f), self.image_size)
                  for f in frames][:self.num_frames]
            while len(px) < self.num_frames:
                px.append(px[-1])
            return np.stack(px), None
        img = load_image(data)
        if self.is_gemma3:
            return gemma3_preprocess(img, self.image_size), None
        if (self.model_type in ("vila", "multi_modality")
                or getattr(self, "is_minicpmv", False)
                or getattr(self, "is_kimi_vl", False)
                or getattr(self, "is_deepseek_vl2", False)
                or getattr(self, "is_llama4", False)
                or getattr(self, "is_phi4mm", False)):
            # 0.5/0.5 normalize + square resize (MiniCPM-V's NaViT
            # processor also normalizes with mean=std=0.5)
            return siglip_preprocess(img, self.image_size), None
        if getattr(self, "is_internvl", False):
            return internvl_preprocess(img, self.image_size), None
        if self.model_type == "mistral3":
            # Pixtral: square resize + CLIP mean/std (no crop)
            from PIL import Image

            img = img.resize((self.image_size, self.image_size),
                             Image.BICUBIC)
            arr = np.asarray(img, dtype=np.float32) / 255.0
            arr = (arr - CLIP_MEAN) / CLIP_STD
            return arr.transpose(2, 0, 1), None
        if self.model_type in ("qwen2_vl", "qwen2_5_vl"):
            return qwen2vl_preprocess(
                img, self.image_size, self.patch, self.temporal, self.merge)
        if getattr(self, "is_cross_attn", False):
            # Mllama: square resize (the reference's tile padding is
            # preprocessing-side) + CLIP mean/std
            from PIL import Image

            img = img.resize((self.image_size, self.image_size),
                             Image.BICUBIC)
            arr = np.asarray(img, dtype=np.float32) / 255.0
            arr = (arr - CLIP_MEAN) / CLIP_STD
            return arr.transpose(2, 0, 1), None
        return clip_preprocess(img, self.image_size), None

    def process(self, input_ids: List[int], image_data: Any = None,
                audio_data: Any = None) -> Tuple[List[int], List[MMItem]]:
        """Expand image/audio placeholders and build MMItems. `image_data`
        (or `audio_data` for audio models) is one payload or a list (one
        per placeholder, in order). Dual-modality models (MiniCPM-O) carry
        two independent placeholder streams."""
        if getattr(self, "is_audio", False) and audio_data is not None:
            image_data = audio_data     # pure-audio models: single stream
            audio_data = None

        def prep_images(data):
            if getattr(self, "is_video", False):
                # one video = a LIST of frames; accept one video or a list
                # of videos (list of lists)
                if (isinstance(data, (list, tuple)) and data
                        and not isinstance(data[0], (list, tuple))):
                    images = [data]
                else:
                    images = list(data)
            else:
                images = data if isinstance(data, (list, tuple)) \
                    else [data]
            out = []
            for d in images:
                px, grid = self._prep(d)
                if getattr(self, "is_audio", False):
                    from iaas_sglang_tpu.models.qwen2_audio import (
                        audio_output_lengths,
                    )

                    n = audio_output_lengths(grid)
                    mod = "audio"
                else:
                    n = self.num_image_tokens
                    mod = "image"
                if getattr(self, "is_cross_attn", False):
                    n = 0   # encoder rows occupy no text positions
                out.append((px, grid, mod, n))
            return out

        # ordered streams: placeholder token id -> prepped payloads
        streams: list[Tuple[int, list]] = []
        if image_data is not None:
            streams.append((self.image_token_id, prep_images(image_data)))
        if (audio_data is not None
                and getattr(self, "audio_token_id", None) is not None):
            auds = audio_data if isinstance(audio_data, (list, tuple)) \
                else [audio_data]
            prepped = []
            for d in auds:
                mel, valid, n = self._prep_audio(d)
                prepped.append((mel, valid, "audio", n))
            streams.append((self.audio_token_id, prepped))
        if not streams:
            return list(input_ids), []

        by_tok = {tid: p for tid, p in streams}
        idx = {tid: 0 for tid in by_tok}

        cross = getattr(self, "is_cross_attn", False)

        def make_item(tid: int, offset: int) -> Tuple[MMItem, List[int]]:
            px, grid, mod, n = by_tok[tid][idx[tid]]
            idx[tid] += 1
            h = hashlib.sha1(px.tobytes()).hexdigest()
            base = int(h[:8], 16)
            item = MMItem(hash=h, offset=offset, num_tokens=n,
                          pixel=px, grid=grid, modality=mod,
                          enc_tokens=self.num_image_tokens if cross else 0)
            return item, [(base + j) % self.vocab_size for j in range(n)]

        out_ids: List[int] = []
        items: List[MMItem] = []
        for tok in input_ids:
            if tok in by_tok and idx[tok] < len(by_tok[tok]):
                item, ids = make_item(tok, len(out_ids))
                items.append(item)
                if cross:
                    out_ids.append(tok)   # <|image|> stays in the prompt
                else:
                    out_ids.extend(ids)
            else:
                out_ids.append(tok)
        if any(idx[tid] < len(p) for tid, p in streams):
            # no placeholder in the prompt: prepend spans (the common
            # "media first" chat convention), stream order preserved
            prefix_ids: List[int] = []
            prefix_items: List[MMItem] = []
            for tid, p in streams:
                while idx[tid] < len(p):
                    item, ids = make_item(tid, len(prefix_ids))
                    prefix_items.append(item)
                    prefix_ids.extend(ids)
            for it in items:
                it.offset += len(prefix_ids)
            out_ids = prefix_ids + out_ids
            items = prefix_items + items
        return out_ids, items
