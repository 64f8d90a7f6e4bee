"""Model configuration derived from a HuggingFace config
(analog of sglang srt/configs/model_config.py ModelConfig: arch probing,
context-length detection, head-geometry derivation)."""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class ModelConfig:
    model_path: str
    hf_config: dict[str, Any] = field(default_factory=dict)

    # Derived geometry (filled by __post_init__ / from_hf)
    architectures: list[str] = field(default_factory=list)
    model_type: str = ""
    num_layers: int = 0
    hidden_size: int = 0
    num_heads: int = 0
    num_kv_heads: int = 0
    head_dim: int = 0
    intermediate_size: int = 0
    vocab_size: int = 0
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict[str, Any]] = None
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    qk_norm: bool = False
    qk_norm_post: bool = False        # per-head q/k RMSNorm AFTER rope
    #   (HunYuan query_layernorm/key_layernorm)
    hidden_act: str = "silu"
    context_len: int = 4096
    dtype: str = "bfloat16"
    # MoE fields (0 => dense)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = True
    # mixed dense/MoE stacks (Qwen2-MoE mlp_only_layers/decoder_sparse_step,
    # Llama-4 interleave_moe_layer_step, DeepSeek-V1 first_k_dense): per-layer
    # "this layer is MoE"; None = every layer when num_experts > 0
    moe_layer_mask: Optional[list[bool]] = None
    # shared expert applied to every token alongside the routed experts
    shared_expert_size: int = 0         # intermediate size; 0 = none
    shared_expert_gated: bool = False   # qwen2_moe sigmoid scalar gate
    moe_gating: str = "softmax"         # softmax | llama4 (sigmoid-topk,
    #                                     weight applied to expert INPUT)
    #                                   | sparsemixer (PhiMoE top-2)
    moe_router_jitter: float = 0.01     # sparsemixer 2*eps mask threshold
    router_logit_softcap: Optional[float] = None  # grok tanh router capping
    # Gemma-family quirks
    rms_weight_offset: float = 0.0   # rmsnorm uses (offset + w)
    embed_multiplier: float = 1.0    # hidden *= multiplier after embedding
    sandwich_norms: bool = False     # gemma2/3 post-attn + post-ffw norms
    query_pre_attn_scalar: Optional[float] = None  # sm_scale = qpas**-0.5
    attn_logit_softcap: Optional[float] = None     # gemma2 tanh capping
    final_logit_softcap: Optional[float] = None
    rope_local_base_freq: Optional[float] = None   # gemma3 local-layer rope
    # Sliding-window attention: None => full attention on all layers.
    sliding_window: Optional[int] = None
    sliding_window_pattern: Optional[list[bool]] = None  # per-layer "is SWA layer"
    # MLA (DeepSeek V2/V3) geometry — kv_lora_rank > 0 marks an MLA model
    # (analog of srt/configs/model_config.py MLA detection).
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # DeepSeek-style MoE: shared experts + dense first-k layers + grouped topk
    n_shared_experts: int = 0
    first_k_dense_replace: int = 0
    routed_scaling_factor: float = 1.0
    topk_method: str = "greedy"        # greedy | group_limited_greedy | noaux_tc
    scoring_func: str = "softmax"      # softmax | sigmoid
    n_group: int = 0
    topk_group: int = 0
    # pre-quantized checkpoint (hf quantization_config): "awq" | None
    ckpt_quant_method: Optional[str] = None
    ckpt_quant_group: int = 128
    # Multimodal (VLM) fields — vision_config not None marks a VLM
    # (analog of srt/configs/model_config.py is_multimodal detection)
    vision_config: Optional[dict[str, Any]] = None
    image_token_id: Optional[int] = None
    # dual-modality models (MiniCPM-O): separate audio placeholder token
    audio_token_id: Optional[int] = None
    # cross-attention VLMs (Mllama): global layer ids of the cross layers
    cross_attention_layers: Optional[list] = None
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"
    mm_projector_act: str = "gelu"
    # Qwen2-VL MRope: rope section sizes for (temporal, h, w)
    mrope_section: Optional[list[int]] = None
    # sequence classification / reward head (LlamaForSequenceClassification)
    num_labels: int = 0
    reward_head_2layer: bool = False  # Qwen2ForRewardModel Linear+ReLU+Linear
    # decoder-as-embedding-model (LlamaEmbeddingModel): L2-normalize pooled
    normalize_pooled: bool = False
    # override the checkpoint key of the classification score head
    classification_head_key: Optional[str] = None
    # encoder classification head style: "cls" (BERT pooler+classifier) |
    # "roberta_head" (dense+tanh+out_proj over CLS)
    classifier_pooling: str = "cls"
    # encoder-only embedding model (BERT family): bidirectional attention,
    # prefill-only serving; pooling: cls | mean | last
    is_encoder_only: bool = False
    pooling_type: str = "cls"
    type_vocab_size: int = 0
    layer_norm_eps: float = 1e-12
    # Roberta-family: position ids start at padding_idx+1 (HF convention)
    position_offset: int = 0
    # --- structural variants beyond the Llama template -------------------
    norm_type: str = "rmsnorm"        # "rmsnorm" | "layernorm" (mean-centering)
    norm_bias: bool = False           # layernorm bias weights present
    mlp_gated: bool = True            # False => fc1 -> act -> fc2 (GPT-2/Phi)
    mlp_bias: bool = False            # biases on the MLP linears
    o_bias: bool = False              # bias on the attention out-projection
    lm_head_bias: bool = False        # bias on the LM head (Phi)
    parallel_residual: bool = False   # h += attn(ln(h)) + mlp(ln(h)) (Phi/Cohere)
    partial_rotary_factor: float = 1.0  # rope over the first D*f dims only
    use_rope: bool = True             # False => learned absolute positions
    learned_pos_embed: bool = False   # wpe table added to the embedding
    input_norms: bool = True          # pre-sublayer norms present (OLMo2: False)
    qk_norm_full: bool = False        # q/k RMSNorm over full width (OLMo2/OLMoE)
    rope_interleaved: bool = False    # adjacent-pair rotation (Cohere/GLM)
    residual_multiplier: float = 1.0  # Granite residual scaling
    logits_scale: float = 1.0         # final-logit multiplier (Cohere/Granite)
    attention_multiplier: Optional[float] = None  # direct sm_scale override
    gegelu_limit: Optional[float] = None   # phi3small gegelu clamp
    dummy_token_indices: Optional[tuple] = None  # phi3small -inf logits
    clip_qkv: Optional[float] = None  # clamp q/k/v activations (DBRX/OLMo)
    # per-layer rope enable (SmolLM3 NoPE layers, EXAONE-4 global layers);
    # None = rope everywhere
    rope_layers: Optional[list[bool]] = None

    # --- Llama-4 attention variants ---
    qk_l2_norm: bool = False            # weightless post-rope q/k l2 norm
    #   (rope layers only; Llama4TextL2Norm)
    attn_temp_scale: Optional[float] = None   # NoPE-layer q temperature
    attn_temp_floor: float = 8192.0           # tuning (log1p position scale)
    attention_chunk_size: Optional[int] = None  # chunked local attention on
    #   rope layers: keys visible iff floor(kpos/C) == floor(qpos/C)

    @staticmethod
    def from_path(model_path: str, context_length: Optional[int] = None,
                  dtype: str = "auto") -> "ModelConfig":
        cfg_file = os.path.join(model_path, "config.json")
        with open(cfg_file) as f:
            hf = json.load(f)
        return ModelConfig.from_hf(hf, model_path=model_path,
                                   context_length=context_length, dtype=dtype)

    @staticmethod
    def from_hf(hf: dict[str, Any], model_path: str = "",
                context_length: Optional[int] = None,
                dtype: str = "auto") -> "ModelConfig":
        get = hf.get
        if get("model_type") in ("llava", "llava_mistral", "llava_qwen",
                                 "llava_llama"):
            # VLM wrapper config: LM geometry lives in text_config; the
            # outer config carries the vision tower + token plumbing.
            # Legacy (liuhaotian-style) checkpoints are FLAT: LM fields at
            # top level (model_type llava_mistral/llava_qwen for mistral /
            # qwen2 bodies) plus mm_* keys; the tower is CLIP-L/14-336.
            inner = dict(hf.get("text_config") or {})
            if not inner:
                inner = {k: v for k, v in hf.items()
                         if k not in ("architectures", "model_type")}
                inner["model_type"] = {
                    "llava_mistral": "mistral", "llava_qwen": "qwen2",
                }.get(get("model_type"), "llama")
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "LlavaForConditionalGeneration"]
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("image_token_index",
                                    get("image_token_id", 32000))
            mc.vision_feature_layer = get("vision_feature_layer", -2)
            mc.vision_feature_select_strategy = get(
                "vision_feature_select_strategy", "default")
            mc.mm_projector_act = get("projector_hidden_act", "gelu")
            return mc
        if get("model_type") == "vila":
            # VILA/NVILA wrapper (reference models/vila.py VILAConfig):
            # qwen2 LM under text_config, SigLIP tower, 3x3-downsample
            # projector; keys live under llm./vision_tower./mm_projector.
            inner = dict(hf.get("text_config") or {})
            inner.setdefault("model_type", "qwen2")
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "VILAForConditionalGeneration"]
            mc.model_type = "vila"
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("image_token_id", 151649)
            return mc
        if get("model_type") == "multi_modality":
            # DeepSeek Janus-Pro (reference models/deepseek_janus_pro.py):
            # llama LM under language_config, timm-SigLIP tower + aligner;
            # the gen_* image-generation stack is not served
            inner = dict(hf.get("language_config") or {})
            inner.setdefault("model_type", "llama")
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "MultiModalityCausalLM"]
            mc.model_type = "multi_modality"
            mc.vision_config = get("vision_config") or {}
            # Janus tokenizers carry <image_placeholder> (id 100581 in the
            # deepseek-llm vocab); configs may override
            mc.image_token_id = get("image_token_id", 100581)
            return mc
        if get("model_type") == "qwen2_audio":
            # Qwen2-Audio (reference models/qwen2_audio.py): qwen2 LM +
            # Whisper audio tower; audio spans ride the multimodal path
            inner = dict(hf.get("text_config") or {})
            inner.setdefault("model_type", "qwen2")
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "Qwen2AudioForConditionalGeneration"]
            mc.model_type = "qwen2_audio"
            mc.attention_bias = True
            mc.vision_config = dict(get("audio_config") or {})
            mc.image_token_id = get("audio_token_index", 151646)
            return mc
        if get("model_type") == "mistral3":
            # Mistral-3 (reference models/mistral.py
            # Mistral3ForConditionalGeneration): mistral LM + pixtral tower
            inner = dict(hf.get("text_config") or {})
            inner.setdefault("model_type", "mistral")
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "Mistral3ForConditionalGeneration"]
            mc.model_type = "mistral3"
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("image_token_index", 10)
            return mc
        if get("model_type") == "pixtral":
            # bare Pixtral tower (reference pixtral.py PixtralVisionModel):
            # image-embedding serving only
            mc = ModelConfig(
                model_path=model_path, hf_config=hf,
                architectures=get("architectures") or ["PixtralVisionModel"],
                model_type="pixtral",
                num_layers=get("num_hidden_layers", 24),
                hidden_size=get("hidden_size", 1024),
                num_heads=get("num_attention_heads", 16),
                num_kv_heads=get("num_attention_heads", 16),
                head_dim=get("head_dim", 64),
                intermediate_size=get("intermediate_size", 4096),
                vocab_size=1,
            )
            mc.is_encoder_only = True
            mc.vision_config = dict(hf)
            mc.context_len = context_length or 8192
            if dtype != "auto":
                mc.dtype = dtype
            return mc
        if get("model_type") == "internvl_chat":
            # InternVL (reference models/internvl.py): LM under llm_config
            # (qwen2 / internlm2 / llama — mc.model_type stays the LM's so
            # the weight-key tables resolve), InternViT tower + mlp1
            inner = dict(hf.get("llm_config") or hf.get("text_config") or {})
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or ["InternVLChatModel"]
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get(
                "img_context_token_id", get("image_token_id", 151667))
            return mc
        if get("model_type") in ("minicpmv", "minicpmo"):
            # MiniCPM-V/O (reference models/minicpmv.py, minicpmo.py): FLAT
            # config — the LM fields live at the top level (qwen2 for 2.6+,
            # llama for 2.5, get_version_by_config minicpmv.py:358);
            # vision_config is the Idefics2/NaViT SigLIP tower, resampler
            # geometry from query_num; -O adds a Whisper audio_config
            is_o = get("model_type") == "minicpmo"
            inner = dict(hf)
            ver = hf.get("version")
            if ver is None:
                ver = 2.0 if (hf.get("hidden_size") == 2304
                              and hf.get("query_num") == 64) else 2.5
            inner["model_type"] = ("qwen2" if is_o or float(ver) >= 2.6
                                   else "llama")
            inner.pop("architectures", None)
            inner.setdefault("tie_word_embeddings", False)
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "MiniCPMO" if is_o else "MiniCPMV"]
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("image_token_id", 151646)  # <image>
            if is_o:
                mc.audio_token_id = get("audio_token_id", 151648)
            return mc
        if get("model_type") == "deepseek_vl_v2":
            # DeepSeek-VL2 (reference models/deepseek_vl2.py): timm SigLIP
            # tower + downsample projector + DeepSeek MLA LM under
            # language_config; tiny (use_mla=False) variants are rejected
            inner = dict(hf.get("language_config")
                         or hf.get("text_config") or {})
            if not inner.get("use_mla", True):
                raise ValueError(
                    "deepseek-vl2 use_mla=False (tiny) is not supported")
            inner.setdefault("model_type", "deepseek_v2")
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "DeepseekVL2ForCausalLM"]
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("image_token_id", 100003)  # <image>
            return mc
        if get("model_type") == "mllama":
            # Llama 3.2 Vision (reference models/mllama.py): llama text
            # layers with gated cross-attention layers interleaved; the
            # vision tower feeds per-request encoder KV (models/mllama.py
            # here). The embedding table carries 8 extra special rows
            # (<|image|> = vocab_size).
            inner = dict(hf.get("text_config") or {})
            inner.setdefault("model_type", "llama")
            inner.pop("cross_attention_layers", None)
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "MllamaForConditionalGeneration"]
            mc.vision_config = get("vision_config") or {}
            mc.cross_attention_layers = list(
                (hf.get("text_config") or {}).get("cross_attention_layers")
                or [])
            mc.image_token_id = get("image_token_index", mc.vocab_size)
            return mc
        if get("model_type") == "phi4mm":
            # Phi-4-multimodal (reference models/phi4mm.py): phi3-family LM
            # with plain model.* keys; the siglip-so400m-448 tower geometry
            # is hardcoded by the reference, not in the HF config
            inner = dict(hf)
            inner["model_type"] = "phi3"
            inner.pop("architectures", None)
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or ["Phi4MMForCausalLM"]
            from iaas_sglang_tpu.models.phi4mm import PHI4MM_VISION
            mc.vision_config = dict(get("vision_config") or PHI4MM_VISION)
            mc.image_token_id = get("image_token_id", 200010)
            return mc
        if get("model_type") == "kimi_vl":
            # Kimi-VL (reference models/kimi_vl.py): MoonViT tower +
            # DeepSeek MLA LM under text_config (configs/kimi_vl.py:30
            # DeepseekV2Config); mc.model_type stays the LM's so the
            # deepseek key tables resolve under the language_model. prefix
            inner = dict(hf.get("text_config") or {})
            inner.setdefault("model_type", "deepseek_v2")
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "KimiVLForConditionalGeneration"]
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("media_placeholder_token_id", 163605)
            return mc
        if get("model_type") == "clip":
            # CLIPModel embedding serving (reference models/clip.py): text
            # tower geometry from text_config; images are embedded by the
            # vision tower directly (scheduler embed_image route)
            tc = dict(hf.get("text_config") or {})
            mc = ModelConfig(
                model_path=model_path, hf_config=hf,
                architectures=get("architectures") or ["CLIPModel"],
                model_type="clip",
                num_layers=tc.get("num_hidden_layers", 12),
                hidden_size=tc.get("hidden_size", 512),
                num_heads=tc.get("num_attention_heads", 8),
                num_kv_heads=tc.get("num_attention_heads", 8),
                head_dim=(tc.get("hidden_size", 512)
                          // tc.get("num_attention_heads", 8)),
                intermediate_size=tc.get("intermediate_size", 2048),
                vocab_size=tc.get("vocab_size", 49408),
                max_position_embeddings=tc.get(
                    "max_position_embeddings", 77),
                hidden_act=tc.get("hidden_act", "quick_gelu"),
            )
            mc.is_encoder_only = True
            mc.pooling_type = "last"
            mc.layer_norm_eps = tc.get("layer_norm_eps", 1e-5)
            mc.vision_config = get("vision_config") or {}
            mc.context_len = context_length or mc.max_position_embeddings
            if dtype != "auto":
                mc.dtype = dtype
            return mc
        if get("model_type") == "gemma3n" and get("text_config"):
            # Gemma 3n multimodal wrapper (reference models/gemma3n_mm.py):
            # conformer audio tower + multimodal embedders around the
            # gemma3n text model; vision tower rejected (timm MobileNetV5)
            inner = dict(hf["text_config"])
            inner.setdefault("model_type", "gemma3n_text")
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "Gemma3nForConditionalGeneration"]
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("image_token_id", 262145)
            mc.audio_token_id = get("audio_token_id", 262273)
            return mc
        if get("model_type") == "gemma3" and get("text_config"):
            # Gemma3 multimodal wrapper: SigLIP tower + pooled projector
            # around the gemma3_text LM (reference models/gemma3_mm.py)
            inner = dict(hf["text_config"])
            inner.setdefault("model_type", "gemma3_text")
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "Gemma3ForConditionalGeneration"]
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("image_token_index", 262144)
            return mc
        if get("model_type") == "llama4" and get("text_config"):
            # Llama4ForConditionalGeneration wrapper (reference
            # models/mllama4.py): Llama4VisionModel tower + pixel-shuffle
            # adapter around the llama4 text family
            inner = dict(hf["text_config"])
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "Llama4ForConditionalGeneration"]
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("image_token_index", 200092)
            return mc
        if get("model_type") in ("qwen2_vl", "qwen2_5_vl"):
            # flat legacy configs AND new nested text_config both occur;
            # prefer the nested LM fields when present
            inner = dict(hf.get("text_config") or hf)
            inner.pop("model_type", None)
            inner["model_type"] = "qwen2"   # inherit qwen2 LM quirks (bias)
            mc = ModelConfig.from_hf(inner, model_path=model_path,
                                     context_length=context_length,
                                     dtype=dtype)
            mc.hf_config = hf
            mc.architectures = get("architectures") or [
                "Qwen2_5_VLForConditionalGeneration"
                if get("model_type") == "qwen2_5_vl"
                else "Qwen2VLForConditionalGeneration"]
            mc.model_type = get("model_type")
            mc.attention_bias = True
            mc.vision_config = get("vision_config") or {}
            mc.image_token_id = get("image_token_id", 151655)
            rs = inner.get("rope_scaling") or get("rope_scaling") or {}
            mc.mrope_section = rs.get("mrope_section")
            return mc
        num_heads = get("num_attention_heads", 0)
        hidden = get("hidden_size", 0)
        head_dim = get("head_dim") or (hidden // num_heads if num_heads else 0)
        mc = ModelConfig(
            model_path=model_path,
            hf_config=hf,
            architectures=get("architectures", []) or [],
            model_type=get("model_type", ""),
            num_layers=get("num_hidden_layers", 0),
            hidden_size=hidden,
            num_heads=num_heads,
            num_kv_heads=get("num_key_value_heads", num_heads) or num_heads,
            head_dim=head_dim,
            intermediate_size=get("intermediate_size", 0),
            vocab_size=get("vocab_size", 0),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 10000.0),
            rope_scaling=get("rope_scaling"),
            max_position_embeddings=get("max_position_embeddings", 4096),
            tie_word_embeddings=get("tie_word_embeddings", False),
            attention_bias=get("attention_bias", get("qkv_bias", False)),
            hidden_act=get("hidden_act", "silu"),
            num_experts=get("num_experts", get("num_local_experts", 0)) or 0,
            num_experts_per_tok=get("num_experts_per_tok", 0) or 0,
            moe_intermediate_size=get("moe_intermediate_size", 0)
            or get("intermediate_size", 0),
            norm_topk_prob=get("norm_topk_prob", True),
            sliding_window=get("sliding_window")
            if get("use_sliding_window", True) else None,
        )
        # Qwen2 puts qkv bias implicitly (attention_bias absent but the arch
        # uses bias); handled per-model in the model zoo via arch name.
        if mc.model_type in ("qwen2",):
            mc.attention_bias = True
        if mc.model_type == "qwen2_moe":
            # Qwen1.5-MoE / Qwen2-57B-A14B (reference models/qwen2_moe.py):
            # qkv bias, softmax-before-topk router, sigmoid-gated shared
            # expert, sparse layers on a decoder_sparse_step grid minus
            # mlp_only_layers exceptions.
            mc.attention_bias = get("qkv_bias", True)
            mc.moe_intermediate_size = get("moe_intermediate_size", 0)
            mc.shared_expert_size = get("shared_expert_intermediate_size", 0)
            mc.shared_expert_gated = True
            mc.norm_topk_prob = get("norm_topk_prob", False)
            only = set(get("mlp_only_layers") or [])
            step = get("decoder_sparse_step", 1) or 1
            mask = [(i not in only) and ((i + 1) % step == 0)
                    for i in range(mc.num_layers)]
            if not all(mask):
                mc.moe_layer_mask = mask
        if mc.model_type in ("hunyuan_v1_moe", "hunyuan_v1_dense",
                             "hunyuan"):
            # HunYuan-A13B / dense (reference models/hunyuan.py): post-rope
            # per-head q/k RMSNorm, softmax top-k renormalized router with
            # ungated shared expert(s), NTK-alpha dynamic rope
            def _first(v):
                if isinstance(v, list):
                    assert len(set(v)) == 1, \
                        "per-layer-varying HunYuan MoE configs unsupported"
                    return v[0]
                return v

            if get("use_cla"):
                raise ValueError(
                    "HunYuan CLA (cross-layer attention) not supported")
            mc.model_type = "hunyuan"
            mc.qk_norm_post = bool(get("use_qk_norm", False))
            ne = _first(get("num_experts", 0) or 0)
            if ne and ne > 1:
                mc.num_experts = ne
                mc.num_experts_per_tok = _first(get("moe_topk", 1) or 1)
                mc.moe_intermediate_size = _first(
                    get("moe_intermediate_size", 0)
                    or get("intermediate_size", 0))
                mc.norm_topk_prob = mc.num_experts_per_tok > 1
                if get("use_mixed_mlp_moe"):
                    mc.shared_expert_size = (
                        mc.intermediate_size
                        * _first(get("num_shared_expert", 1) or 1))
            else:
                mc.num_experts = 0
        if mc.model_type == "grok-1":
            # Grok-1 (reference models/grok.py): sandwich rms norms
            # (pre/post attn + pre/post moe), attn + router logit
            # softcapping, gelu experts with mixtral-style keys, embedding
            # and output multipliers
            mc.sandwich_norms = True
            mc.attn_logit_softcap = get("attn_logit_softcapping", 30.0)
            mc.embed_multiplier = get("embedding_multiplier_scale", 1.0)
            mc.logits_scale = get("output_multiplier_scale", 1.0)
            mc.moe_gating = "softcap"
            mc.router_logit_softcap = get("router_logit_softcapping", 30.0)
            mc.norm_topk_prob = False
            mc.head_dim = get("head_dim", 128)
            mc.hidden_act = "gelu"
            mc.moe_intermediate_size = (get("moe_intermediate_size", 0)
                                        or mc.intermediate_size)
        if "XverseMoeForCausalLM" in (get("architectures") or []):
            # XVERSE-MoE-A4.2B (reference models/xverse_moe.py): llama
            # attention, softmax top-k router over per-expert MLPs at the
            # dense intermediate width, ungated shared experts
            mc.model_type = "xverse_moe"
            mc.num_experts = get("num_experts", 0) or 0
            mc.num_experts_per_tok = get("moe_top_k", 2) or 2
            mc.moe_intermediate_size = mc.intermediate_size
            mc.norm_topk_prob = get("norm_topk_prob", False)
            mc.shared_expert_size = (
                (get("num_shared_experts", 0) or 0) * mc.intermediate_size)
        if mc.model_type == "chatglm":
            # ChatGLM2/3 & GLM-4-9b chat (reference models/chatglm.py):
            # transformer.encoder.* naming, fused query_key_value with qkv
            # bias, fused swiglu dense_h_to_4h, MQA group heads, half-dim
            # interleaved rotary at base 10000*rope_ratio
            mc.num_layers = get("num_layers", 0) or mc.num_layers
            mc.vocab_size = get("padded_vocab_size", mc.vocab_size)
            mc.intermediate_size = get("ffn_hidden_size",
                                       mc.intermediate_size)
            mc.rms_norm_eps = get("layernorm_epsilon", 1e-5)
            if not get("rmsnorm", True):
                mc.norm_type = "layernorm"
                mc.norm_bias = True
            if get("multi_query_attention"):
                mc.num_kv_heads = get("multi_query_group_num", 2)
            mc.head_dim = get("kv_channels",
                              mc.hidden_size // max(mc.num_heads, 1))
            mc.attention_bias = bool(get("add_qkv_bias")
                                     or get("add_bias_linear"))
            mc.mlp_bias = bool(get("add_bias_linear"))
            mc.partial_rotary_factor = 0.5
            mc.rope_interleaved = True
            mc.rope_theta = 10000.0 * (get("rope_ratio", 1.0) or 1.0)
            if get("seq_length"):
                mc.max_position_embeddings = get("seq_length")
            mc.tie_word_embeddings = not get("untie_embeddings_and_output_weights", True) \
                if "untie_embeddings_and_output_weights" in hf else False
            assert not get("apply_residual_connection_post_layernorm"), \
                "chatglm apply_residual_connection_post_layernorm unsupported"
        if mc.model_type == "qwen":
            # Qwen-1 (reference models/qwen.py): transformer.h.* naming,
            # fused c_attn WITH bias (no o bias), RMSNorm ln_1/ln_2, MHA,
            # and the checkpoint's intermediate_size is 2x the real ffn
            # width (w1/w2 halves)
            mc.num_layers = get("num_hidden_layers", 0) or get("num_layers", 0)
            mc.rms_norm_eps = get("layer_norm_epsilon", 1e-6)
            mc.intermediate_size = get("intermediate_size", 0) // 2
            mc.attention_bias = True
            mc.rope_theta = get("rotary_emb_base", 10000.0)
            if get("seq_length"):
                mc.max_position_embeddings = get("seq_length")
        if mc.model_type == "exaone":
            # EXAONE-3 (reference models/exaone.py): transformer.h.* with
            # attn.attention.* projections, c_fc_0/c_fc_1 gated MLP,
            # RMSNorm ln_1/ln_2
            mc.num_layers = get("num_layers", 0) or mc.num_layers
            mc.rms_norm_eps = get("layer_norm_epsilon", 1e-6)
            mc.hidden_act = get("activation_function", "silu")
            mc.partial_rotary_factor = get(
                "partial_rotary_factor", get("rotary_pct", 1.0) or 1.0)
        if mc.model_type == "mimo":
            # MiMo-7B (reference models/mimo.py): qwen2 body (qkv bias)
            mc.attention_bias = True
        if mc.model_type == "minicpm":
            # MiniCPM 1/2 (reference models/minicpm.py): muP-style scaling
            # — same mechanisms as Granite (embedding/residual multiplier,
            # logits scale), llama keys
            import math as _math

            mc.embed_multiplier = get("scale_emb", 1.0) or 1.0
            if get("scale_depth") and mc.num_layers:
                mc.residual_multiplier = (
                    get("scale_depth") / _math.sqrt(mc.num_layers))
            if get("dim_model_base") and mc.hidden_size:
                mc.logits_scale = get("dim_model_base") / mc.hidden_size
        if mc.model_type == "baichuan":
            # Baichuan(2) 7B: rope + fused W_pack (reference
            # models/baichuan.py picks rope iff hidden_size == 4096; the
            # 13B models use ALIBI, which our kernels don't implement)
            if mc.hidden_size == 5120:
                raise ValueError(
                    "Baichuan-13B uses ALIBI position embeddings "
                    "(unsupported); only the 7B rope variants are served")
        if mc.model_type == "phimoe":
            # Phi-3.5-MoE (reference models/phi3_small.py's sibling; HF
            # PhimoeForCausalLM): LayerNorm (not RMS) blocks, mixtral-style
            # expert keys, inference-mode sparsemixer top-2 router
            mc.norm_type = "layernorm"
            mc.norm_bias = True
            mc.attention_bias = get("attention_bias", False)
            mc.o_bias = mc.attention_bias
            mc.lm_head_bias = get("lm_head_bias", False)
            mc.moe_gating = "sparsemixer"
            mc.moe_router_jitter = get("router_jitter_noise", 0.01)
            mc.moe_intermediate_size = mc.intermediate_size
            mc.norm_topk_prob = False
        if mc.model_type == "deepseek":
            # DeepSeek V1 / DeepSeek-MoE-16B (reference models/deepseek.py):
            # llama attention + softmax top-k router (no renorm), shared
            # experts, dense first_k layers on a moe_layer_freq grid.
            mc.num_experts = get("n_routed_experts", 0) or 0
            if mc.num_experts:
                mc.moe_intermediate_size = get("moe_intermediate_size", 0)
                mc.shared_expert_size = (
                    get("n_shared_experts", 0) or 0) * mc.moe_intermediate_size
                mc.norm_topk_prob = get("norm_topk_prob", False)
                fk = get("first_k_dense_replace", 0) or 0
                freq = get("moe_layer_freq", 1) or 1
                mask = [i >= fk and i % freq == 0
                        for i in range(mc.num_layers)]
                if not all(mask):
                    mc.moe_layer_mask = mask
        if mc.model_type == "llama4_text" or mc.model_type == "llama4":
            # Llama-4 Scout/Maverick text model (reference models/llama4.py):
            # interleaved MoE layers with a shared expert and sigmoid-of-topk
            # router scores applied to the expert INPUT; NoPE every
            # no_rope_layer_interval-th layer (those run full attention with
            # temperature-tuned q); rope layers attend within
            # attention_chunk_size chunks; weightless post-rope qk l2-norm.
            mc.model_type = "llama4"
            L = mc.num_layers
            nrl = get("no_rope_layers")
            if not nrl:
                interval = get("no_rope_layer_interval", 4)
                nrl = [int((i + 1) % interval != 0) for i in range(L)]
            mc.rope_layers = [bool(x) for x in nrl]
            mc.rope_interleaved = True
            mc.qk_l2_norm = get("use_qk_norm", True)
            if get("attn_temperature_tuning", True):
                mc.attn_temp_scale = get("attn_scale", 0.1)
                mc.attn_temp_floor = get("floor_scale", 8192.0)
            mc.attention_chunk_size = get("attention_chunk_size", 8192)
            mc.moe_gating = "llama4"
            mc.norm_topk_prob = False
            mc.num_experts = get("num_local_experts", 0) or 0
            mc.num_experts_per_tok = get("num_experts_per_tok", 1) or 1
            mc.moe_intermediate_size = get("intermediate_size", 0)
            mc.shared_expert_size = get("intermediate_size", 0)
            mc.intermediate_size = get("intermediate_size_mlp",
                                       mc.intermediate_size)
            ml = get("moe_layers")
            if ml is None:
                step = get("interleave_moe_layer_step", 1) or 1
                ml = list(range(step - 1, L, step))
            mask = [i in set(ml) for i in range(L)]
            if not all(mask):
                mc.moe_layer_mask = mask
        if mc.model_type in ("qwen3", "qwen3_moe"):
            mc.qk_norm = True
            mc.attention_bias = False
        if mc.model_type in ("gemma", "gemma2", "gemma3_text"):
            mc.rms_weight_offset = 1.0
            mc.embed_multiplier = float(mc.hidden_size) ** 0.5
            # gemma configs name the activation "hidden_activation";
            # the family default is gelu_pytorch_tanh, NOT silu
            mc.hidden_act = get("hidden_activation",
                                get("hidden_act", "gelu_pytorch_tanh"))
        if mc.model_type == "gemma3n_text":
            # Gemma 3n (reference models/gemma3n_causal.py): AltUp streams,
            # laurel, per-layer embeddings, KV sharing — the exotica lives
            # in models/gemma3n.py reading hf_config; here only the base
            # geometry is normalized (intermediate_size ships as a
            # per-layer list, uniform in released checkpoints)
            isz = get("intermediate_size")
            if isinstance(isz, (list, tuple)):
                if len(set(isz)) != 1:
                    raise ValueError(
                        "gemma3n with non-uniform intermediate_size is "
                        "not supported (layer stacks must be uniform)")
                mc.intermediate_size = int(isz[0])
            mc.tie_word_embeddings = True
            mc.sliding_window = get("sliding_window", 512)
        if mc.model_type in ("gemma2", "gemma3_text"):
            mc.sandwich_norms = True
            mc.query_pre_attn_scalar = get("query_pre_attn_scalar")
            mc.attn_logit_softcap = get("attn_logit_softcapping")
            mc.final_logit_softcap = get("final_logit_softcapping")
            mc.sliding_window = get("sliding_window")
            if mc.model_type == "gemma3_text":
                mc.qk_norm = True
                mc.rope_local_base_freq = get("rope_local_base_freq", 10000.0)
            # per-layer full/sliding pattern (hf layer_types, or the
            # defaults: gemma2 alternates starting sliding; gemma3 is
            # 5 sliding : 1 full)
            lt = get("layer_types")
            if lt:
                mc.sliding_window_pattern = [
                    t == "sliding_attention" for t in lt]
            elif mc.model_type == "gemma2":
                mc.sliding_window_pattern = [
                    i % 2 == 0 for i in range(mc.num_layers)]
            else:
                pat = get("sliding_window_pattern", 6) or 6
                mc.sliding_window_pattern = [
                    (i + 1) % pat != 0 for i in range(mc.num_layers)]
        if mc.model_type == "minicpm3":
            # MiniCPM3 (reference models/minicpm3.py): MLA attention with
            # deepseek-v2 key naming but NEOX-style rope on the rope
            # channels, dense MLP, MiniCPM muP scaling
            import math as _math

            mc.q_lora_rank = get("q_lora_rank")
            mc.kv_lora_rank = get("kv_lora_rank", 0) or 0
            mc.qk_nope_head_dim = get("qk_nope_head_dim", 64)
            mc.qk_rope_head_dim = get("qk_rope_head_dim", 32)
            mc.v_head_dim = get("v_head_dim",
                                mc.hidden_size // max(mc.num_heads, 1))
            mc.head_dim = mc.qk_nope_head_dim + mc.qk_rope_head_dim
            mc.embed_multiplier = get("scale_emb", 1.0) or 1.0
            if get("scale_depth") and mc.num_layers:
                mc.residual_multiplier = (
                    get("scale_depth") / _math.sqrt(mc.num_layers))
            if get("dim_model_base") and mc.hidden_size:
                mc.logits_scale = get("dim_model_base") / mc.hidden_size
        if mc.model_type in ("deepseek_v2", "deepseek_v3"):
            mc.rope_interleaved = True
            mc.q_lora_rank = get("q_lora_rank")
            mc.kv_lora_rank = get("kv_lora_rank", 512) or 0
            mc.qk_nope_head_dim = get("qk_nope_head_dim", 128)
            mc.qk_rope_head_dim = get("qk_rope_head_dim", 64)
            mc.v_head_dim = get("v_head_dim", 128)
            # MLA attention is MQA over the latent: geometry is per-model
            mc.head_dim = mc.qk_nope_head_dim + mc.qk_rope_head_dim
            mc.num_experts = get("n_routed_experts", 0) or 0
            mc.n_shared_experts = get("n_shared_experts", 0) or 0
            mc.first_k_dense_replace = get("first_k_dense_replace", 0) or 0
            mc.routed_scaling_factor = get("routed_scaling_factor", 1.0)
            mc.n_group = get("n_group") or 0
            mc.topk_group = get("topk_group") or 0
            if mc.model_type == "deepseek_v3":
                mc.topk_method = "noaux_tc"
                mc.scoring_func = "sigmoid"
            else:
                mc.topk_method = get("topk_method", "greedy")
                mc.scoring_func = "softmax"
                # HF 4.57 deepseek_v2 gate never renormalizes topk weights
                mc.norm_topk_prob = False
        if mc.model_type == "gpt2":
            # GPT-2/DistilGPT2 (reference models/gpt2.py): Conv1D fused
            # c_attn, LayerNorm+bias, learned wpe positions, gelu_new MLP.
            mc.num_layers = get("n_layer", mc.num_layers)
            mc.hidden_size = get("n_embd", mc.hidden_size)
            mc.num_heads = get("n_head", mc.num_heads)
            mc.num_kv_heads = mc.num_heads
            mc.head_dim = mc.hidden_size // mc.num_heads
            mc.intermediate_size = get("n_inner") or 4 * mc.hidden_size
            mc.max_position_embeddings = get("n_positions", 1024)
            mc.norm_type = "layernorm"
            mc.norm_bias = True
            mc.rms_norm_eps = get("layer_norm_epsilon", 1e-5)
            mc.mlp_gated = False
            mc.mlp_bias = True
            mc.attention_bias = True
            mc.o_bias = True
            mc.use_rope = False
            mc.learned_pos_embed = True
            mc.tie_word_embeddings = True
            mc.hidden_act = get("activation_function", "gelu_new")
        if mc.model_type == "starcoder2":
            bias = get("use_bias", True)
            mc.norm_type = "layernorm"
            mc.norm_bias = True
            mc.rms_norm_eps = get("norm_epsilon", 1e-5)
            mc.mlp_gated = False
            mc.mlp_bias = bias
            mc.attention_bias = bias
            mc.o_bias = bias
            mc.tie_word_embeddings = get("tie_word_embeddings", True)
        if mc.model_type == "phi3small":
            # Phi-3-small (reference models/phi3_small.py): LayerNorm
            # blocks, GQA-interleaved fused query_key_value (+bias),
            # gegelu fused up_proj, muP scaling, tiktoken dummy tokens.
            # The reference constructs blocksparse params but runs dense
            # attention (bs_params unused at phi3_small.py:200) — same here.
            mc.norm_type = "layernorm"
            mc.norm_bias = True
            mc.rms_norm_eps = get("layer_norm_epsilon", 1e-5)
            mc.attention_bias = True
            mc.o_bias = True
            mc.mlp_bias = True
            mc.hidden_act = "gegelu"
            mc.gegelu_limit = get("gegelu_limit")
            mc.rope_theta = get("rope_embedding_base",
                                get("rope_theta", 1e6))
            pos_scale = get("rope_position_scale", 1.0)
            if mc.rope_scaling is None and pos_scale != 1.0:
                mc.rope_scaling = {"rope_type": "linear",
                                   "factor": pos_scale}
            if get("mup_use_scaling", False):
                # sm_scale = mup_attn_multiplier / head_dim
                # (phi3_small.py:132 norm_factor inverse)
                mc.attention_multiplier = (
                    get("mup_attn_multiplier", 1.0) / mc.head_dim)
            mc.embed_multiplier = get("mup_embedding_multiplier", 1.0) or 1.0
            wm = get("mup_width_multiplier")
            if wm:
                # HF divides logits by the width multiplier (greedy-
                # invariant; the reference omits it)
                mc.logits_scale = 1.0 / wm
            mc.tie_word_embeddings = get("tie_word_embeddings", True)
            dummy = get("dummy_token_indices")
            if dummy:
                mc.dummy_token_indices = tuple(int(i) for i in dummy)
        if mc.model_type == "phi":
            # Phi-1/1.5/2: parallel attn+MLP residual over a shared
            # LayerNorm, partial rotary, biased linears + LM-head bias.
            mc.norm_type = "layernorm"
            mc.norm_bias = True
            mc.rms_norm_eps = get("layer_norm_eps", 1e-5)
            mc.mlp_gated = False
            mc.mlp_bias = True
            mc.attention_bias = True
            mc.o_bias = True
            mc.lm_head_bias = True
            mc.parallel_residual = True
            mc.partial_rotary_factor = get("partial_rotary_factor", 0.5)
            if get("qk_layernorm"):
                raise NotImplementedError("phi qk_layernorm not supported")
        if mc.model_type == "phi3":
            # Phi-3/3.5/4: fused qkv_proj/gate_up_proj, LongRope scaling.
            # Phi-4-mini/-MM additionally rope only part of the head dim.
            mc.partial_rotary_factor = get("partial_rotary_factor", 1.0)
            if mc.rope_scaling and mc.rope_scaling.get(
                    "rope_type", mc.rope_scaling.get("type")) == "longrope":
                mc.rope_scaling = dict(mc.rope_scaling)
                mc.rope_scaling.setdefault(
                    "original_max_position_embeddings",
                    get("original_max_position_embeddings", 4096))
                mc.rope_scaling.setdefault(
                    "max_position_embeddings", mc.max_position_embeddings)
        if mc.model_type == "stablelm":
            mc.norm_type = "layernorm"
            mc.norm_bias = True
            mc.rms_norm_eps = get("layer_norm_eps", 1e-5)
            mc.attention_bias = get("use_qkv_bias", False)
            mc.partial_rotary_factor = get("partial_rotary_factor", 0.25)
            if get("qk_layernorm"):
                raise NotImplementedError("stablelm qk_layernorm unsupported")
        if mc.model_type == "olmo2":
            # OLMo2: post-norms only (norm on sublayer OUTPUT, no input
            # norms) + full-width q/k RMSNorm before rope.
            mc.input_norms = False
            mc.sandwich_norms = True
            mc.qk_norm_full = True
        if mc.model_type == "olmo":
            mc.norm_type = "layernorm"   # non-parametric LN (weights absent)
            mc.rms_norm_eps = 1e-5
            mc.clip_qkv = get("clip_qkv")
            mc.tie_word_embeddings = get("tie_word_embeddings", False)
        if mc.model_type == "olmoe":
            mc.qk_norm_full = True
            mc.norm_topk_prob = get("norm_topk_prob", False)
        if mc.model_type in ("cohere", "commandr", "cohere2"):
            mc.norm_type = "layernorm"   # no-bias mean-centering LayerNorm
            mc.norm_bias = False
            mc.rms_norm_eps = get("layer_norm_eps", 1e-5)
            mc.parallel_residual = True
            mc.rope_interleaved = True
            mc.logits_scale = get("logit_scale", 1.0)
            mc.tie_word_embeddings = get("tie_word_embeddings", True)
            if get("use_qk_norm"):
                raise NotImplementedError("cohere use_qk_norm not supported")
            if mc.model_type == "cohere2":
                # Command R7B (reference models/commandr.py Cohere2): every
                # sliding_window_pattern-th layer is global attention with
                # NO rope; the others are rope + sliding-window
                pat = get("sliding_window_pattern", 4) or 4
                lt = get("layer_types")
                if lt:
                    sw = [t == "sliding_attention" for t in lt]
                else:
                    sw = [(i + 1) % pat != 0 for i in range(mc.num_layers)]
                if any(sw) and mc.sliding_window:
                    mc.sliding_window_pattern = sw
                    mc.rope_layers = list(sw)
        if mc.model_type == "granite":
            mc.embed_multiplier = get("embedding_multiplier", 1.0)
            mc.residual_multiplier = get("residual_multiplier", 1.0)
            mc.attention_multiplier = get("attention_multiplier")
            mc.logits_scale = 1.0 / get("logits_scaling", 1.0)
        if mc.model_type in ("glm", "glm4"):
            # GLM-4 family: fused gate_up, interleaved partial rotary; glm4
            # adds post_self_attn/post_mlp sandwich norms.
            mc.partial_rotary_factor = get("partial_rotary_factor", 0.5)
            mc.rope_interleaved = True
            mc.attention_bias = get("attention_bias", True)
            if mc.model_type == "glm4":
                mc.sandwich_norms = True
        if mc.model_type == "gpt_bigcode":
            # SantaCoder/StarCoder-1: GPT-2 layout with torch Linears,
            # multi-query attention (1 kv head), learned positions.
            mc.num_layers = get("n_layer", mc.num_layers)
            mc.hidden_size = get("n_embd", mc.hidden_size)
            mc.num_heads = get("n_head", mc.num_heads)
            mc.num_kv_heads = 1 if get("multi_query", True) else mc.num_heads
            mc.head_dim = mc.hidden_size // mc.num_heads
            mc.intermediate_size = get("n_inner") or 4 * mc.hidden_size
            mc.max_position_embeddings = get("n_positions", 8192)
            mc.norm_type = "layernorm"
            mc.norm_bias = True
            mc.rms_norm_eps = get("layer_norm_epsilon", 1e-5)
            mc.mlp_gated = False
            mc.mlp_bias = True
            mc.attention_bias = True
            mc.o_bias = True
            mc.use_rope = False
            mc.learned_pos_embed = True
            mc.tie_word_embeddings = True
            mc.hidden_act = get("activation_function", "gelu_pytorch_tanh")
        if mc.model_type == "smollm3":
            # llama with NoPE: rope disabled on every Nth layer
            nrl = get("no_rope_layers")
            if nrl:
                mc.rope_layers = [bool(x) for x in nrl]
            mc.tie_word_embeddings = get("tie_word_embeddings", True)
        if mc.model_type == "exaone4":
            # EXAONE-4: post-norm ordering (norm on sublayer output),
            # per-head qk-norm, hybrid sliding windows with NoPE on the
            # global-attention layers
            mc.input_norms = False
            mc.sandwich_norms = True
            mc.qk_norm = True
            lt = get("layer_types")
            if lt:
                pat = [t == "sliding_attention" for t in lt]
            elif get("sliding_window"):
                p = get("sliding_window_pattern", 4)
                if isinstance(p, str):   # e.g. "LLLG": L=local, G=global
                    pat = [p[i % len(p)] in "Ll"
                           for i in range(mc.num_layers)]
                else:
                    pat = [(i + 1) % p != 0 for i in range(mc.num_layers)]
            else:
                pat = None
            if pat is not None and any(pat):
                mc.sliding_window_pattern = pat
                # global-attention layers use NoPE (rope only on sliding)
                mc.rope_layers = list(pat)
                mc.sliding_window = get("sliding_window")
        if mc.model_type == "dbrx":
            attn_cfg = get("attn_config") or {}
            ffn_cfg = get("ffn_config") or {}
            mc.num_layers = get("n_layers", mc.num_layers)
            mc.hidden_size = get("d_model", mc.hidden_size)
            mc.num_heads = get("n_heads", mc.num_heads)
            mc.num_kv_heads = attn_cfg.get("kv_n_heads", mc.num_heads)
            mc.head_dim = mc.hidden_size // mc.num_heads
            mc.max_position_embeddings = get("max_seq_len", 32768)
            mc.rope_theta = attn_cfg.get("rope_theta", 500000.0)
            mc.clip_qkv = attn_cfg.get("clip_qkv")
            mc.norm_type = "layernorm"   # no-bias LayerNorm
            mc.norm_bias = False
            mc.rms_norm_eps = 1e-5
            mc.num_experts = ffn_cfg.get("moe_num_experts", 16)
            mc.num_experts_per_tok = ffn_cfg.get("moe_top_k", 4)
            mc.moe_intermediate_size = ffn_cfg.get("ffn_hidden_size", 10752)
            mc.intermediate_size = mc.moe_intermediate_size
            # moe_normalize_expert_weights=1 (L1) == renormalize over top-k
            mc.norm_topk_prob = bool(
                ffn_cfg.get("moe_normalize_expert_weights", 1))
            mc.tie_word_embeddings = get("tie_word_embeddings", False)
        if any(a in ("LlamaEmbeddingModel", "MistralModel")
               for a in mc.architectures):
            # decoder used as embedding model (e5-mistral etc., reference
            # models/llama_embedding.py): last-token pooling, L2-normalized
            mc.normalize_pooled = True
        if any(a.endswith("ForSequenceClassification")
               or a in ("LlamaForClassification",
                        "LlamaForSequenceClassificationWithNormal_Weights")
               for a in mc.architectures):
            # HF configs often carry the label count only via id2label
            mc.num_labels = (get("num_labels")
                             or len(get("id2label") or {}) or 2)
            if "LlamaForClassification" in mc.architectures:
                # reference models/llama_classification.py stores the head
                # as classification_head.weight
                mc.classification_head_key = "classification_head.weight"
        if "Qwen2ForRewardModel" in mc.architectures:
            # 2-layer gated reward head (reference models/qwen2_rm.py)
            mc.num_labels = get("num_labels", 1) or 1
            mc.reward_head_2layer = True
        if "InternLM2ForRewardModel" in mc.architectures:
            # v_head scalar reward (reference models/internlm2_reward.py)
            mc.num_labels = 1
        if mc.model_type in ("bert", "roberta", "xlm-roberta"):
            mc.is_encoder_only = True
            if mc.model_type in ("roberta", "xlm-roberta"):
                mc.position_offset = (get("pad_token_id", 1) or 1) + 1
            mc.layer_norm_eps = get("layer_norm_eps", 1e-12)
            mc.type_vocab_size = get("type_vocab_size", 2)
            mc.hidden_act = get("hidden_act", "gelu")
            mc.pooling_type = get("pooling_type", "cls")
            mc.rms_norm_eps = get("layer_norm_eps", 1e-12)
            if "Contriever" in mc.architectures:
                # facebook/contriever (reference models/llama_embedding.py
                # sibling): BERT body with mean pooling
                mc.pooling_type = "mean"
            if any(a.endswith("ForSequenceClassification")
                   for a in mc.architectures):
                # cross-encoder reranker (reference models/bert.py /
                # roberta.py classification): scores instead of embeddings
                mc.num_labels = (get("num_labels")
                                 or len(get("id2label") or {}) or 2)
                mc.classifier_pooling = get("classifier_pooling",
                                            "cls" if mc.model_type == "bert"
                                            else "roberta_head")
        qc = get("quantization_config") or {}
        if qc.get("quant_method") in ("awq", "gptq"):
            if qc.get("bits", 4) != 4:
                raise ValueError(
                    "only 4-bit AWQ/GPTQ checkpoints are supported")
            if qc.get("quant_method") == "gptq" and qc.get("desc_act"):
                raise ValueError("GPTQ desc_act checkpoints not supported")
            mc.ckpt_quant_method = qc["quant_method"]
            mc.ckpt_quant_group = qc.get("group_size", 128)
        elif (qc.get("quant_method") == "fp8"
              and qc.get("weight_block_size")):
            # DeepSeek-V3 blockwise FP8 (reference fp8.py:1151
            # weight_scale_inv): fp8 weights + [128,128] dequant blocks
            if list(qc["weight_block_size"]) != [128, 128]:
                raise ValueError(
                    "only [128, 128] fp8 weight_block_size is supported")
            mc.ckpt_quant_method = "fp8_block"
        mc.context_len = context_length or _probe_context_len(hf)
        if dtype != "auto":
            mc.dtype = dtype
        return mc

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank > 0

    @property
    def is_multimodal(self) -> bool:
        return self.vision_config is not None


def _probe_context_len(hf: dict[str, Any]) -> int:
    # Mirrors the reference's context-length probing order
    # (srt/hf_transformers_utils.py get_context_length).
    for key in ("max_sequence_length", "seq_length", "max_position_embeddings",
                "max_seq_len", "model_max_length"):
        v = hf.get(key)
        if isinstance(v, int) and v > 0:
            return v
    return 4096
