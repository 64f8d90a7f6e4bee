"""Shared test helpers: tiny model configs + HF reference runners
(analog of sglang python/sglang/test/runners.py HFRunner/SRTRunner —
golden comparison against HuggingFace is the per-model accuracy gate)."""

from __future__ import annotations

import numpy as np

TINY_LLAMA = dict(
    architectures=["LlamaForCausalLM"],
    model_type="llama",
    num_hidden_layers=2,
    hidden_size=64,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
)

TINY_QWEN2 = dict(
    architectures=["Qwen2ForCausalLM"],
    model_type="qwen2",
    num_hidden_layers=2,
    hidden_size=64,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=True,
)

TINY_QWEN3 = dict(
    architectures=["Qwen3ForCausalLM"],
    model_type="qwen3",
    num_hidden_layers=2,
    hidden_size=64,
    head_dim=16,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=True,
)


def build_hf_model(hf_dict: dict, seed: int = 0):
    """Instantiate a random-weight HF torch model from a config dict."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg_cls = {
        "llama": "LlamaConfig",
        "qwen2": "Qwen2Config",
        "qwen3": "Qwen3Config",
    }[hf_dict["model_type"]]
    import transformers

    config = getattr(transformers, cfg_cls)(**{
        k: v for k, v in hf_dict.items() if k != "architectures"
    })
    torch.manual_seed(seed)
    model = AutoModelForCausalLM.from_config(config)
    model = model.eval()
    return model


def hf_greedy_generate(model, input_ids: list[int], max_new_tokens: int) -> list[int]:
    import torch

    ids = torch.tensor([input_ids], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            ids, max_new_tokens=max_new_tokens, do_sample=False,
            top_p=None, top_k=None, temperature=None,
            pad_token_id=0, eos_token_id=None,
        )
    return out[0, len(input_ids):].tolist()


def hf_forward_logits(model, input_ids: list[int]) -> np.ndarray:
    import torch

    ids = torch.tensor([input_ids], dtype=torch.long)
    with torch.no_grad():
        out = model(ids)
    return out.logits[0].float().numpy()  # [T, V]


def make_runner(hf_dict: dict, *, dtype="float32", page_size=4,
                max_total_tokens=4096, tp_size=1, **kw):
    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.model_executor.model_runner import ModelRunner
    from iaas_sglang_tpu.server_args import ServerArgs

    cfg = ModelConfig.from_hf(hf_dict, model_path="test://tiny", dtype=dtype)
    sa = ServerArgs(model_path="test://tiny", load_format="dummy", dtype=dtype,
                    page_size=page_size, max_total_tokens=max_total_tokens,
                    device="cpu", max_running_requests=16,
                    max_prefill_tokens=256, tp_size=tp_size, random_seed=0, **kw)
    return ModelRunner(sa, cfg), cfg, sa


def load_hf_weights_into(runner, hf_model):
    from iaas_sglang_tpu.model_loader.loader import load_params_from_state_dict

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx,
        hf_model.state_dict(),
    )


class RawDriver:
    """Drives a ModelRunner directly with page bookkeeping — the minimal
    harness used by unit tests (no scheduler)."""

    def __init__(self, runner, page_size):
        from iaas_sglang_tpu.mem_cache.allocator import PageAllocator

        self.runner = runner
        self.ps = page_size
        self.alloc = PageAllocator(runner.num_usable_pages, page_size)

    def _mk(self, mode, ids, pos, slots, pt, sl, ql, temperature=0.0):
        from iaas_sglang_tpu.model_executor.model_runner import HostBatch

        B = len(pt)
        return HostBatch(
            mode=mode, input_ids=ids, positions=pos, out_slots=slots,
            page_tables=pt, seq_lens=sl, q_lens=ql,
            temperatures=np.full(B, temperature, np.float32),
            top_ks=np.full(B, -1, np.int32), top_ps=np.ones(B, np.float32),
            min_ps=np.zeros(B, np.float32), seeds=np.zeros(B, np.uint32),
            steps=np.zeros(B, np.int32),
        )

    def prefill_logits(self, input_ids: list[int]) -> np.ndarray:
        """Returns logits at every prompt position [T, V]."""
        from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
        from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

        T = len(input_ids)
        npages = -(-T // self.ps)
        pages = self.alloc.alloc(npages)
        slots = slots_for_tokens(pages, 0, T, self.ps)
        hb = self._mk(ForwardMode.EXTEND, np.asarray(input_ids, np.int32),
                      np.arange(T, dtype=np.int32), slots, [pages],
                      np.array([T], np.int32), np.array([T], np.int32))
        logits = self.runner.forward_all_logits(hb)
        self._last_pages = pages
        return logits

    def generate_greedy(self, input_ids: list[int], max_new_tokens: int) -> list[int]:
        from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
        from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

        T = len(input_ids)
        total = T + max_new_tokens
        npages_total = -(-total // self.ps)
        pages = self.alloc.alloc(npages_total)
        npages = -(-T // self.ps)
        slots = slots_for_tokens(pages, 0, T, self.ps)
        hb = self._mk(ForwardMode.EXTEND, np.asarray(input_ids, np.int32),
                      np.arange(T, dtype=np.int32), slots, [pages[:npages]],
                      np.array([T], np.int32), np.array([T], np.int32))
        tok = int(self.runner.forward(hb)[0])
        out = [tok]
        for i in range(max_new_tokens - 1):
            pos = T + i
            np_now = -(-(pos + 1) // self.ps)
            hb = self._mk(ForwardMode.DECODE, np.array([tok], np.int32),
                          np.array([pos], np.int32),
                          slots_for_tokens(pages, pos, 1, self.ps),
                          [pages[:np_now]],
                          np.array([pos + 1], np.int32), np.array([1], np.int32))
            tok = int(self.runner.forward(hb)[0])
            out.append(tok)
        self.alloc.free(pages)
        return out
