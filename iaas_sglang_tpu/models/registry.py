"""Model registry: HF `architectures` string -> model class
(analog of sglang srt/models/registry.py:77,107)."""

from __future__ import annotations

from typing import Callable

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.deepseek_family import DeepseekFamilyForCausalLM
from iaas_sglang_tpu.models.llama_family import LlamaFamilyForCausalLM

_REGISTRY: dict[str, Callable[[ModelConfig], object]] = {}


def register(arch: str, cls) -> None:
    _REGISTRY[arch] = cls


for _arch in (
    "LlamaForCausalLM",
    "Qwen2ForCausalLM",
    "Qwen3ForCausalLM",
    "MistralForCausalLM",
    "MixtralForCausalLM",
    "Qwen3MoeForCausalLM",
    "GemmaForCausalLM",
    "Gemma2ForCausalLM",
    "Gemma3ForCausalLM",
    # structural variants handled by the same functional decoder
    # (reference keeps one torch module per file, srt/models/*.py; here
    # the differences are ModelConfig flags + weight-key templates)
    "GPT2LMHeadModel",            # models/gpt2.py
    "Starcoder2ForCausalLM",      # models/starcoder2.py
    "PhiForCausalLM",             # models/phi.py
    "Phi3ForCausalLM",            # models/phi3.py (phi-3/3.5/4)
    "StableLmForCausalLM",        # models/stablelm.py
    "OlmoForCausalLM",            # models/olmo.py
    "Olmo2ForCausalLM",           # models/olmo2.py
    "OlmoeForCausalLM",           # models/olmoe.py
    "CohereForCausalLM",          # models/commandr.py
    "GraniteForCausalLM",         # models/granite.py
    "GlmForCausalLM",             # models/glm4.py family
    "Glm4ForCausalLM",
    "GPTBigCodeForCausalLM",      # models/gpt_bigcode.py (MQA StarCoder-1)
    "SmolLM3ForCausalLM",         # llama + NoPE layers
    "Exaone4ForCausalLM",         # models/exaone.py successor (post-norms,
    #   hybrid SWA, NoPE on global layers)
    "DbrxForCausalLM",            # models/dbrx.py (fused Wqkv, fused experts)
    "Qwen2MoeForCausalLM",        # models/qwen2_moe.py (shared expert +
    #   sigmoid gate, mlp_only_layers/decoder_sparse_step mixed stack)
    "DeepseekForCausalLM",        # models/deepseek.py (V1: llama attention,
    #   softmax top-k MoE, shared experts, first_k_dense_replace)
    "Llama4ForCausalLM",          # models/llama4.py (text: interleaved MoE,
    #   NoPE + chunked local attention)
    "PhimoeForCausalLM",          # Phi-3.5-MoE (LayerNorm blocks,
    #   sparsemixer top-2 router)
    "QWenLMHeadModel",            # models/qwen.py (Qwen-1: fused c_attn
    #   with bias, w1/w2 half-width MLP, transformer.h.* keys)
    "ExaoneForCausalLM",          # models/exaone.py (EXAONE-3:
    #   attn.attention.* keys, c_fc_0/1 MLP)
    "InternLM2ForCausalLM",       # models/internlm2.py (GQA-interleaved
    #   fused wqkv, feed_forward.w1/w3/w2, output head)
    "InternLM2ForRewardModel",    # models/internlm2_reward.py (v_head)
    "BaichuanForCausalLM",        # models/baichuan.py (fused W_pack; 7B
    "BaiChuanForCausalLM",        #   rope variants; Baichuan2 NormHead)
    "XverseForCausalLM",          # models/xverse.py (llama keys)
    "Phi3SmallForCausalLM",       # models/phi3_small.py (LayerNorm,
    #   GQA-interleaved fused qkv, gegelu, muP, dummy-token mask)
    "MiMoForCausalLM",            # models/mimo.py (qwen2 body)
    "MiniCPMForCausalLM",         # models/minicpm.py (muP scaling)
    "ChatGLMModel",               # models/chatglm.py (fused query_key_value
    "ChatGLMForConditionalGeneration",  # + swiglu dense_h_to_4h, MQA,
    #   half-dim interleaved rotary)
    "Grok1ForCausalLM",           # models/grok.py (sandwich norms, gelu
    "Grok1ModelForCausalLM",      #   experts, attn+router softcapping)
    "XverseMoeForCausalLM",       # models/xverse_moe.py (per-expert MLPs
    #   at dense width + ungated shared experts)
    "HunYuanMoEV1ForCausalLM",    # models/hunyuan.py (post-rope qk norm,
    "HunYuanDenseV1ForCausalLM",  #   shared_mlp mixed MoE)
    "Cohere2ForCausalLM",         # models/commandr.py Command R7B (hybrid
    #   SWA layers with NoPE globals via cohere2 config flags)
    "InternLM3ForCausalLM",       # models/llama.py:719 — llama semantics
    "QuantMixtralForCausalLM",    # models/mixtral_quant.py — same weights
    "LlamaEmbeddingModel",        # models/llama_embedding.py (e5-mistral
    "MistralModel",               #   style: LAST pooling, normalized)
    "LlamaForClassification",     # models/llama_classification.py aliases
    "LlamaForSequenceClassificationWithNormal_Weights",
    # torch-native TP demos (models/torch_native_llama.py): identical
    # weights/semantics to the plain archs — the torch-TP mechanism they
    # demo is replaced by GSPMD here
    "TorchNativeLlamaForCausalLM",
    "TorchNativePhi3ForCausalLM",
):
    register(_arch, LlamaFamilyForCausalLM)

for _arch in ("DeepseekV2ForCausalLM", "DeepseekV3ForCausalLM",
              "MiniCPM3ForCausalLM"):   # models/minicpm3.py: MLA + muP
    register(_arch, DeepseekFamilyForCausalLM)


def _llava(config):
    from iaas_sglang_tpu.models.llava import LlavaForConditionalGeneration

    return LlavaForConditionalGeneration(config)


register("LlavaForConditionalGeneration", _llava)


def _yivl(config):
    from iaas_sglang_tpu.models.llava import YiVLForCausalLM

    return YiVLForCausalLM(config)


def _llavavid(config):
    from iaas_sglang_tpu.models.llava import LlavaVidForCausalLM

    return LlavaVidForCausalLM(config)


register("YiVLForCausalLM", _yivl)
register("LlavaVidForCausalLM", _llavavid)
register("LlavaLlamaForCausalLM", _llava)    # legacy llava arch strings
register("LlavaMistralForCausalLM", _llava)  # (mistral / qwen2 LM bodies
register("LlavaQwenForCausalLM", _llava)     #  via text_config.model_type)


def _gemma3_mm(config):
    from iaas_sglang_tpu.models.gemma3_mm import (
        Gemma3MMForConditionalGeneration,
    )

    return Gemma3MMForConditionalGeneration(config)


register("Gemma3ForConditionalGeneration", _gemma3_mm)


def _qwen2_vl(config):
    from iaas_sglang_tpu.models.qwen2_vl import (
        Qwen2VLForConditionalGeneration,
    )

    return Qwen2VLForConditionalGeneration(config)


register("Qwen2VLForConditionalGeneration", _qwen2_vl)


def _qwen2_5_vl(config):
    from iaas_sglang_tpu.models.qwen2_vl import (
        Qwen25VLForConditionalGeneration,
    )

    return Qwen25VLForConditionalGeneration(config)


register("Qwen2_5_VLForConditionalGeneration", _qwen2_5_vl)


def _vila(config):
    from iaas_sglang_tpu.models.vila import VILAForConditionalGeneration

    return VILAForConditionalGeneration(config)


register("VILAForConditionalGeneration", _vila)


def _janus(config):
    from iaas_sglang_tpu.models.janus import MultiModalityCausalLM

    return MultiModalityCausalLM(config)


register("MultiModalityCausalLM", _janus)


def _internvl(config):
    from iaas_sglang_tpu.models.internvl import InternVLChatModel

    return InternVLChatModel(config)


register("InternVLChatModel", _internvl)


def _mistral3(config):
    from iaas_sglang_tpu.models.pixtral import (
        Mistral3ForConditionalGeneration,
    )

    return Mistral3ForConditionalGeneration(config)


def _pixtral_vm(config):
    from iaas_sglang_tpu.models.pixtral import PixtralVisionModel

    return PixtralVisionModel(config)


register("Mistral3ForConditionalGeneration", _mistral3)
register("PixtralVisionModel", _pixtral_vm)


def _qwen2_audio(config):
    from iaas_sglang_tpu.models.qwen2_audio import (
        Qwen2AudioForConditionalGeneration,
    )

    return Qwen2AudioForConditionalGeneration(config)


register("Qwen2AudioForConditionalGeneration", _qwen2_audio)


def _minicpmv(config):
    from iaas_sglang_tpu.models.minicpmv import MiniCPMV

    return MiniCPMV(config)


register("MiniCPMV", _minicpmv)


def _minicpmo(config):
    from iaas_sglang_tpu.models.minicpmo import MiniCPMO

    return MiniCPMO(config)


register("MiniCPMO", _minicpmo)


def _kimi_vl(config):
    from iaas_sglang_tpu.models.kimi_vl import KimiVLForConditionalGeneration

    return KimiVLForConditionalGeneration(config)


register("KimiVLForConditionalGeneration", _kimi_vl)


def _deepseek_vl2(config):
    from iaas_sglang_tpu.models.deepseek_vl2 import DeepseekVL2ForCausalLM

    return DeepseekVL2ForCausalLM(config)


register("DeepseekVL2ForCausalLM", _deepseek_vl2)


def _gemma3n(config):
    from iaas_sglang_tpu.models.gemma3n import Gemma3nForCausalLM

    return Gemma3nForCausalLM(config)


register("Gemma3nForCausalLM", _gemma3n)


def _llama4_mm(config):
    if config.vision_config:
        from iaas_sglang_tpu.models.mllama4 import (
            Llama4ForConditionalGeneration,
        )

        return Llama4ForConditionalGeneration(config)
    return LlamaFamilyForCausalLM(config)   # flat text-only configs


register("Llama4ForConditionalGeneration", _llama4_mm)


def _mllama(config):
    from iaas_sglang_tpu.models.mllama import MllamaForConditionalGeneration

    return MllamaForConditionalGeneration(config)


register("MllamaForConditionalGeneration", _mllama)


def _phi4mm(config):
    from iaas_sglang_tpu.models.phi4mm import Phi4MMForCausalLM

    return Phi4MMForCausalLM(config)


register("Phi4MMForCausalLM", _phi4mm)


def _gemma3n_mm(config):
    from iaas_sglang_tpu.models.gemma3n_mm import (
        Gemma3nForConditionalGeneration,
    )

    return Gemma3nForConditionalGeneration(config)


register("Gemma3nForConditionalGeneration", _gemma3n_mm)

# sequence classification / reward heads share the causal LM body
for _arch in (
    "LlamaForSequenceClassification",
    "Qwen2ForSequenceClassification",
    "Qwen3ForSequenceClassification",
    "MistralForSequenceClassification",
    "Gemma2ForSequenceClassification",  # models/gemma2_reward.py
    "Qwen2ForRewardModel",              # models/qwen2_rm.py (2-layer head)
):
    register(_arch, LlamaFamilyForCausalLM)


def _bert(config):
    from iaas_sglang_tpu.models.bert import BertEmbeddingModel

    return BertEmbeddingModel(config)


for _arch in ("BertModel", "BertForMaskedLM", "RobertaModel",
              "XLMRobertaModel",
              "Contriever",                       # mean-pooled BERT
              "BertForSequenceClassification",    # cross-encoder rerankers
              "XLMRobertaForSequenceClassification"):
    register(_arch, _bert)


def _clip(config):
    from iaas_sglang_tpu.models.clip_embedding import ClipEmbeddingModel

    return ClipEmbeddingModel(config)


register("CLIPModel", _clip)


# speculative draft architectures (loadable only as --speculative-draft
# models; the EAGLE worker instantiates them — reference models/llama_eagle.py,
# qwen2_eagle.py, mimo_mtp.py, deepseek_nextn.py)
def _eagle_draft(config):
    from iaas_sglang_tpu.models.llama_eagle import LlamaEagleDraft

    return LlamaEagleDraft(config)


def _mimo_mtp(config):
    from iaas_sglang_tpu.models.mimo_mtp import MiMoMTPDraft

    return MiMoMTPDraft(config)


def _nextn(config):
    from iaas_sglang_tpu.models.deepseek_nextn import DeepseekNextNDraft

    return DeepseekNextNDraft(config)


def _eagle3_draft(config):
    from iaas_sglang_tpu.models.llama_eagle3 import LlamaEagle3Draft

    return LlamaEagle3Draft(config)


for _arch in ("LlamaForCausalLMEagle", "Qwen2ForCausalLMEagle"):
    register(_arch, _eagle_draft)
register("LlamaForCausalLMEagle3", _eagle3_draft)
register("MiMoMTP", _mimo_mtp)
register("DeepseekV3ForCausalLMNextN", _nextn)


def _transformers_fallback(config):
    # reference models/transformers.py serves unknown archs through HF
    # modeling code on GPU; the TPU analog is a best-effort mapping onto
    # the functional decoder for llama-shaped configs (standard q/k/v/o +
    # gate/up/down keys). Anything structurally different fails at weight
    # load with a missing-key error rather than silently mis-serving.
    import logging

    logging.getLogger(__name__).warning(
        "arch %s not in the registry; attempting the generic llama-layout "
        "fallback (TransformersForCausalLM analog)",
        config.architectures)
    return LlamaFamilyForCausalLM(config)


register("TransformersForCausalLM", _transformers_fallback)


def resolve_model_cls(config: ModelConfig):
    for arch in config.architectures:
        if arch in _REGISTRY:
            return _REGISTRY[arch]
    raise ValueError(
        f"none of architectures {config.architectures} supported; "
        f"known: {sorted(_REGISTRY)}"
    )
