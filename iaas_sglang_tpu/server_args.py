"""ServerArgs: the single config object — CLI flags == Engine kwargs == HTTP
launch config (analog of sglang srt/server_args.py:43 ServerArgs +
PortArgs:1748).

TPU-specific departures from the reference:
  * no per-GPU process ranks: one scheduler process owns all local TPU chips
    through JAX; parallelism is a logical mesh {dp, tp} not NCCL groups.
  * cuda-graph flags are replaced by compile-bucket controls
    (`decode_bs_buckets`, `prefill_token_buckets`).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import tempfile
from dataclasses import dataclass, field
from typing import List, Optional

from iaas_sglang_tpu.utils import get_open_port


@dataclass
class ServerArgs:
    # Model and tokenizer
    model_path: str = ""
    tokenizer_path: Optional[str] = None
    load_format: str = "auto"  # auto | safetensors | dummy
    dtype: str = "bfloat16"
    kv_cache_dtype: str = "auto"  # auto | bf16 | int8 | fp8_e4m3
    # KV page layout (r4): "split" stores K and V as separate planes per
    # page [ps, 2, Nk, D] so the decode kernel's score dot contracts NkD
    # (not 2NkD) and the extend kernel slices per-head K/V from lanes —
    # ~2x less MXU work at short decode contexts. "interleaved" is the
    # r1-r3 [ps, 2Nk, D] layout (kept for fp8 KV / double sparsity /
    # cross-attention models, where "auto" falls back to it).
    kv_layout: str = "auto"  # auto | split | interleaved
    context_length: Optional[int] = None
    quantization: Optional[str] = None  # int4_awq | fp8 (later rounds)
    # also quantize the LM head (the bf16 head is ~1.3 ms / 1 GB of an 8B
    # decode step; INT4 cuts it ~4x; opt-in — AWQ convention keeps heads
    # high-precision). No effect on tied-embedding models.
    quantize_lm_head: bool = False
    # v5e has no native fp8 compute: serving fp8/fp8_block checkpoints
    # single-shard recodes the fp8 payload to INT8 group-128 scales at
    # load (same 1 byte/weight; the fp8->f32 VPU upcast capped the GEMM
    # stack at 77 GB/s vs int8's 702; requantization adds ~0.4% relative
    # rounding under fp8's own ~3% grid). Set False to keep raw fp8.
    fp8_recode_int8: bool = True
    served_model_name: Optional[str] = None
    revision: Optional[str] = None
    skip_tokenizer_init: bool = False
    json_model_override_args: str = "{}"

    # HTTP server
    host: str = "127.0.0.1"
    port: int = 30000

    # Memory / KV cache
    page_size: int = 16
    mem_fraction_static: float = 0.85
    max_total_tokens: Optional[int] = None  # KV pool size in tokens; None=profile
    max_running_requests: int = 128
    max_queued_requests: int = 4096

    # Scheduling
    schedule_policy: str = "lpm"  # lpm | fcfs | lof | random
    chunked_prefill_size: int = 2048
    max_prefill_tokens: int = 8192
    schedule_conservativeness: float = 1.0
    stream_interval: int = 1
    disable_radix_cache: bool = False
    enable_hierarchical_cache: bool = False
    kv_events_endpoint: Optional[str] = None  # ZMQ PUB addr for cache events
    hicache_ratio: float = 2.0      # host tier capacity / device pool size
    hicache_size: int = 0           # host tier GB; overrides ratio if set
    # write_back | write_through | write_through_selective
    # (reference cache_controller.py:170 write policies)
    hicache_write_policy: str = "write_through_selective"
    enable_mixed_chunk: bool = False
    # grammar jump-forward: emit force-determined tokens without forwards
    # (token-level variant of the reference's jump-forward decoding)
    disable_jump_forward: bool = False
    disable_overlap_schedule: bool = False
    retract_decode_steps: int = 20
    # multi-step decode: run N chained decode iterations per device dispatch
    # (amortizes dispatch latency; 1 = off). Batches with grammar/penalties/
    # logprobs fall back to single-step automatically.
    decode_steps_per_dispatch: int = 1
    # streaming under multi-step decode (reference stream_interval analog,
    # scheduler_output_processor_mixin.py:521): while any running request
    # streams, chains shorten to this many steps (tokens reach the
    # detokenizer every few steps instead of every N) and up to
    # stream_chain_depth chained dispatches stay in flight so the relay
    # fetch RTT pipelines. 0 disables (full-depth chains always).
    stream_chain_steps: int = 4
    stream_chain_depth: int = 4

    # Parallelism (logical mesh over ICI/DCN)
    tp_size: int = 1
    dp_size: int = 1
    # pipeline parallelism: layer-partitioned stages on separate devices
    # (reference event_loop_pp / PPProxyTensors; here per-stage jitted
    # programs with activations handed over ICI by async dispatch)
    pp_size: int = 1
    # DP dispatch policy: round_robin | shortest_queue (reference
    # data_parallel_controller.py:249 / shortest-queue dispatch)
    load_balance_method: str = "round_robin"
    # internal: set per-replica by the DP controller
    dp_rank: int = 0
    dp_load_report_ipc: Optional[str] = None
    # shard experts over the tp mesh axis when > 1 (shard_map EP; reference
    # --ep-size, layers/moe/ep_moe). Must equal tp_size.
    ep_size: int = 1
    # EP token dispatch: None = replicated-activation psum-combine;
    # "a2a" = all-to-all token shipping to expert-owner ranks (the DeepEP
    # analog, reference --moe-a2a-backend deepep / token_dispatcher.py)
    moe_a2a_backend: Optional[str] = None
    # two-batch overlap (reference --enable-two-batch-overlap,
    # two_batch_overlap.py): split the MoE block into two independent
    # half-batches inside the compiled program so XLA overlaps one half's
    # dispatch collectives with the other half's expert GEMMs
    enable_two_batch_overlap: bool = False
    # DP attention (reference --enable-dp-attention, layers/dp_attention.py):
    # attention runs batch-parallel with UNSPLIT heads over every mesh device
    # (attn_dp = tp_size * dp_size ranks) while FFN/MoE stays TP/EP over the
    # full mesh. KV pages shard over the attention ranks — zero KV
    # duplication, the point of DP attention for MLA models whose single
    # latent head cannot shard over tp. Padded per-rank rows replace the
    # reference's ForwardMode.IDLE lockstep batches (single controller: one
    # program covers all ranks, idle ranks are just padding).
    enable_dp_attention: bool = False
    # Multi-host serving (reference server_args.py:127-128 nnodes /
    # dist_init_addr): node 0 runs the single-controller scheduler and
    # fans each device-program launch out over ZMQ; nodes 1..n-1 run
    # follower replay loops (managers/multihost.py). dist_init_addr is the
    # jax.distributed coordinator 'host:port'; ports +1/+2 carry the
    # command broadcast / ready barrier.
    nnodes: int = 1
    node_rank: int = 0
    dist_init_addr: Optional[str] = None
    multihost_timeout: float = 600.0  # follower ready-barrier seconds

    # Compile buckets (TPU analog of cuda-graph batch sizes)
    decode_bs_buckets: Optional[List[int]] = None
    prefill_token_buckets: Optional[List[int]] = None
    disable_jit_cache_warmup: bool = False
    scan_layers: bool = True

    # Multi-LoRA serving (SURVEY 2.9)
    enable_lora: bool = False
    max_loras_per_batch: int = 8
    max_lora_rank: int = 16
    # "onehot" (dense slot-mixing, best at small S*r) | "gmm" (megablox
    # grouped matmul over adapter-sorted tokens, for many-adapter serving)
    lora_backend: str = "onehot"

    # PD disaggregation (SURVEY 2.6): none | prefill | decode
    disaggregation_mode: str = "none"
    disaggregation_transfer_backend: str = "zmq"  # zmq | fake
    disaggregation_bootstrap_port: int = 0        # decode-side KV ingest port

    # Speculative decoding: None | "ngram" | "eagle" | "eagle3" | "nextn"
    # (DeepSeek MTP; same worker as eagle with the NextN draft. eagle3 =
    # 3-layer aux feature tap + reduced-draft-vocab head, reference
    # models/llama_eagle3.py)
    speculative_algorithm: Optional[str] = None
    speculative_num_draft_tokens: int = 4
    # EAGLE draft checkpoint dir (None = dummy-weight draft, for testing)
    speculative_draft_model_path: Optional[str] = None
    # EAGLE tree drafting (reference --speculative-eagle-topk): >1 keeps
    # topk sibling candidates per draft step and verifies the best
    # num_draft_tokens nodes with a tree attention mask; 1 = chain
    speculative_eagle_topk: int = 1
    # draft chain steps in tree mode (pool = steps*topk candidates);
    # None = num_draft_tokens
    speculative_num_steps: Optional[int] = None

    # Double sparsity (reference double_sparsity_backend.py): decode-time
    # sparse attention — a small per-token "label" cache of r heavy K
    # channels scores ALL tokens cheaply, full attention then runs over
    # only the top ds_heavy_token_num tokens per kv head. Heavy channels
    # derive from |W_k| column magnitudes at load (or a calibration json).
    enable_double_sparsity: bool = False
    ds_heavy_channel_num: int = 16
    ds_heavy_token_num: int = 256
    ds_channel_config_path: Optional[str] = None

    # Attention backend: pallas (ours) | jax_rpa (jax builtin) | jnp (reference)
    attention_backend: str = "auto"

    # Device
    device: str = "auto"  # auto | tpu | cpu

    # Sampling / output
    max_new_tokens_default: int = 128

    # Observability
    log_level: str = "info"
    log_requests: bool = False
    decode_log_interval: int = 40
    enable_metrics: bool = False
    # Prometheus histogram bucket edges (reference server_args.py:105-112)
    bucket_time_to_first_token: Optional[List[float]] = None
    bucket_inter_token_latency: Optional[List[float]] = None
    bucket_e2e_request_latency: Optional[List[float]] = None

    # Misc
    random_seed: Optional[int] = None
    watchdog_timeout: float = 300.0
    # async grammar compiles park requests in a grammar queue; a request
    # whose automaton is still compiling after this many seconds is aborted
    # (reference scheduler.py:1952-2016 move_ready_grammar_requests)
    grammar_compile_timeout: float = 30.0
    # reasoning model (deepseek-r1 | qwen3 | kimi): grammar constraints are
    # deferred until the think block closes (ReasonerGrammar), and the chat
    # endpoint defaults its reasoning_style to this
    reasoning_parser: Optional[str] = None
    # allow sampling_params.custom_logit_processor (named host-side
    # sparse-bias processors; reference --enable-custom-logit-processor)
    enable_custom_logit_processor: bool = False
    warmups: Optional[str] = None          # comma-separated registry names
    chat_template: Optional[str] = None    # named template override
    # FIM code-completion template for /v1/completions `suffix` requests
    # (deepseek_coder | star_coder | qwen_coder | path/to/custom.json)
    completion_template: Optional[str] = None
    skip_server_warmup: bool = False
    # quantized q/k/v + gate/up fused-GEMM params (single-shard only).
    # Default ON since r3: with the globally-pipelined DMA kernel the
    # fused stacks WIN (one pipelined call amortizes the small-N wq/wk/wv
    # launches; r2's "slightly slower" verdict predates the pipeline)
    enable_quant_fusion: bool = True

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.random_seed is None:
            self.random_seed = int.from_bytes(os.urandom(4), "little")
        if self.device == "auto":
            self.device = _detect_device()
        if self.attention_backend == "auto":
            self.attention_backend = "pallas" if self.device == "tpu" else "jnp"
        if self.page_size < 1:
            raise ValueError("page_size must be >= 1")
        if self.reasoning_parser is not None:
            from iaas_sglang_tpu.reasoning_parser import ReasoningParser

            if self.reasoning_parser not in ReasoningParser.MARKS:
                raise ValueError(
                    f"unknown reasoning_parser {self.reasoning_parser!r}; "
                    f"known: {sorted(ReasoningParser.MARKS)}")
        if self.pp_size > 1:
            if self.dp_size > 1 or self.ep_size > 1:
                raise ValueError(
                    "pp_size > 1 composes with tp (per-stage sub-meshes); "
                    "dp/ep compose in a later round")
            if (self.enable_dp_attention or self.enable_lora
                    or self.speculative_algorithm
                    or self.enable_hierarchical_cache
                    or self.disaggregation_mode != "none"):
                raise ValueError(
                    "pp_size > 1 is incompatible with dp-attention / LoRA / "
                    "speculative / hicache / disaggregation")
            self.decode_steps_per_dispatch = 1
        if self.enable_double_sparsity:
            if (self.enable_dp_attention or self.quantization
                    or self.speculative_algorithm
                    or self.enable_hierarchical_cache
                    or self.disaggregation_mode != "none"
                    or self.pp_size > 1):
                raise ValueError(
                    "enable_double_sparsity composes only with the plain "
                    "decode path in this round")
        if self.nnodes > 1:
            if not self.dist_init_addr:
                raise ValueError("--dist-init-addr is required with --nnodes")
            if not (0 <= self.node_rank < self.nnodes):
                raise ValueError("node_rank must be in [0, nnodes)")
            if (self.pp_size > 1 or self.enable_lora
                    or self.speculative_algorithm
                    or self.enable_hierarchical_cache
                    or self.enable_dp_attention
                    or self.disaggregation_mode != "none"):
                raise ValueError(
                    "nnodes > 1 composes with tp/dp/ep GSPMD sharding; "
                    "pp / LoRA / speculative / hicache / dp-attention / "
                    "disaggregation land in a later round")
        if self.enable_dp_attention:
            if self.enable_hierarchical_cache:
                raise ValueError(
                    "enable_dp_attention is incompatible with "
                    "enable_hierarchical_cache (per-rank page spaces)")
            if self.disaggregation_mode != "none":
                raise ValueError(
                    "enable_dp_attention is incompatible with "
                    "PD disaggregation in this round")
            if self.enable_lora:
                raise ValueError(
                    "enable_dp_attention is incompatible with LoRA batching")

    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser) -> None:
        for f in dataclasses.fields(cls):
            name = "--" + f.name.replace("_", "-")
            ftype = f.type
            default = (
                f.default
                if f.default is not dataclasses.MISSING
                else f.default_factory()  # type: ignore[misc]
            )
            if ftype in ("bool", bool):
                parser.add_argument(name, action="store_true", default=default)
            elif "List[int]" in str(ftype):
                parser.add_argument(name, type=int, nargs="+", default=default)
            elif "List[float]" in str(ftype):
                parser.add_argument(name, type=float, nargs="+",
                                    default=default)
            elif "int" in str(ftype):
                parser.add_argument(name, type=int, default=default)
            elif "float" in str(ftype):
                parser.add_argument(name, type=float, default=default)
            else:
                parser.add_argument(name, type=str, default=default)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        kwargs = {f.name: getattr(args, f.name) for f in dataclasses.fields(cls)}
        return cls(**kwargs)


def prepare_server_args(argv: List[str]) -> ServerArgs:
    parser = argparse.ArgumentParser(description="iaas-sglang-tpu server")
    ServerArgs.add_cli_args(parser)
    return ServerArgs.from_cli_args(parser.parse_args(argv))


def _detect_device() -> str:
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return "cpu"
    try:
        import jax

        plat = jax.devices()[0].platform
        return "tpu" if plat in ("tpu", "axon") else "cpu"
    except Exception:
        return "cpu"


@dataclass
class PortArgs:
    """ZMQ endpoints for the manager process ring
    (analog of sglang server_args.py:1748 PortArgs.init_new).

    tokenizer -> scheduler -> detokenizer -> tokenizer.
    """

    tokenizer_ipc: str
    scheduler_ipc: str
    detokenizer_ipc: str
    rpc_ipc: str

    @staticmethod
    def init_new(server_args: ServerArgs) -> "PortArgs":
        if server_args.nnodes > 1:
            host = server_args.dist_init_addr or server_args.host
            base = get_open_port()
            mk = lambda off: f"tcp://{host}:{base + off}"
            return PortArgs(mk(0), mk(1), mk(2), mk(3))
        d = tempfile.mkdtemp(prefix="iaas_sglang_tpu_ipc_")
        mk = lambda n: f"ipc://{d}/{n}"
        return PortArgs(mk("tokenizer"), mk("scheduler"), mk("detokenizer"), mk("rpc"))
