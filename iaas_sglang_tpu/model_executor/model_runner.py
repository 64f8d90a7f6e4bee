"""ModelRunner: loads the model, owns the paged KV pool, and drives the
compiled step functions.

Analog of sglang model_executor/model_runner.py:150 *and* of
cuda_graph_runner.py:203 — on TPU there is no separate capture/replay
machinery: `jax.jit` keyed on padded bucket shapes IS the graph cache.
Every (mode, T, Bmax, MP) bucket compiles once and replays forever; the
scheduler pads batches into the nearest bucket exactly like padded CUDA
graph replay.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.model_executor.forward_batch import (
    ForwardBatch,
    ForwardMode,
    PenaltyMetadata,
    SamplingMetadata,
)
from iaas_sglang_tpu.model_loader import loader as model_loader
from iaas_sglang_tpu.models.registry import resolve_model_cls
from iaas_sglang_tpu.parallel.mesh import MeshContext, make_mesh
from iaas_sglang_tpu.sampling.sampler import sample_tokens
from iaas_sglang_tpu.server_args import ServerArgs
from iaas_sglang_tpu.utils import bucket_size, cdiv, logger, make_buckets


@dataclass
class HostBatch:
    """Host-side batch handed from the scheduler to the runner
    (analog of schedule_batch.py:1778 ModelWorkerBatch)."""

    mode: ForwardMode
    input_ids: np.ndarray           # i32[T] (or None when chaining device tokens)
    positions: np.ndarray           # i32[T]
    out_slots: np.ndarray           # i32[T] per-layer-relative slots
    page_tables: list[np.ndarray]   # per-seq page id arrays
    seq_lens: np.ndarray            # i32[B] total tokens incl. new
    q_lens: np.ndarray              # i32[B]
    temperatures: np.ndarray        # f32[B]
    top_ks: np.ndarray              # i32[B]
    top_ps: np.ndarray              # f32[B]
    min_ps: np.ndarray              # f32[B]
    seeds: np.ndarray               # u32[B]
    steps: np.ndarray               # i32[B]
    # optional penalty/bias state (None when no request in batch needs it)
    penalty_arrays: Any = None      # dict of np arrays (see PenaltyMetadata)
    # grammar-constrained decoding: packed vocab bitmask uint8[B, ceil(V/8)]
    grammar_masks: Any = None
    # logprob requests
    return_logprob: bool = False
    top_logprobs_num: int = 0
    # embedding requests: also return pooled (last-token) hidden states
    return_hidden: bool = False
    hidden_states: Any = None       # np f32[B, H] when return_hidden
    # speculative verify: K drafts per seq -> greedy argmax at K+1 positions
    verify_k: int = 0
    verify_idx: Any = None          # np i32[B, K+1] token indices
    # tree verify (EAGLE topk>1): per-row ancestor bitmasks; chain = None
    tree_bits: Any = None           # np i32[B, 32] | None
    # KV slot moves folded into this program's prologue (tree acceptance)
    move_src: Any = None            # np i32[M] | None
    move_dst: Any = None            # np i32[M] | None
    # prompt logprobs (reference logits_processor.py input-logprob path)
    return_prompt_logprob: bool = False
    lp_targets: Any = None          # np i32[T] next-prompt-token per row
    prompt_logprobs: Any = None     # np f32[T]
    # EAGLE feature taps: verify-position hiddens / all-position hiddens
    return_verify_hidden: bool = False
    verify_hidden: Any = None       # np [B, K+1, H] (model dtype)
    return_all_hidden: bool = False
    all_hidden: Any = None          # np [T, H]
    # multi-LoRA: per-token adapter slot ids (None = no LoRA in batch)
    lora_ids: Any = None            # np i32[T] | None
    # multi-step decode: run N chained decode iterations in ONE dispatch
    # (amortizes host->device dispatch latency; the relay RTT is ~24 ms)
    multi_steps: int = 1
    multi_tokens: Any = None        # np i32[B, N] all sampled tokens
    _device_multi: Any = None       # jnp i32[B_pad, N] (pre-fetch handle)
    # cross-dispatch penalty state: the multi-step program outputs its
    # final on-device output-token counts f32[B_pad, V]; a chained
    # dispatch feeds them back as its step-0 state, so penalty batches
    # keep the chain (VERDICT r3 #4 — reference penaltylib orchestrator
    # keeps penalized decode at full overlap rate)
    chain_counts: Any = None        # jnp f32[B_pad, V] input (from prev)
    _device_counts: Any = None      # jnp f32[B_pad, V] output handle
    # token_ids_logprob riding the chain: static per-request id lists
    # gathered from each step's log-softmax in-program
    lp_token_ids: Any = None        # np i32[B, J] (-1 padded) | None
    _device_idlp: Any = None        # jnp f32[B_pad, N, J] handle
    token_ids_logprob_vals: Any = None  # np f32[B, N, J]
    # multihost wire markers (multihost._wire_hb): this launch chains on
    # the previous launch's device tokens / penalty counts — the follower
    # substitutes its own local handles
    chained: bool = False
    chain_pen: bool = False
    # DP attention: per-seq attention-rank assignment (None = off)
    dp_ranks: Any = None            # np i32[B] | None
    # multimodal rows for THIS chunk (scheduler attaches; runner pads)
    mm_embeds: Any = None           # np [Tm, H] | None
    mm_positions: Any = None        # np i32[Tm] | None
    # MRope (Qwen2-VL): 3D rope positions aligned with `positions`
    mrope_positions: Any = None     # np i32[3, T] | None
    # cross-attention (Mllama): per-SEQ encoder lens + page tables (the
    # runner expands to per-token); None on non-cross-attention models
    enc_lens: Any = None            # np i32[B] | None
    enc_page_tables: Any = None     # list[np i32[...]] | None
    # set by the runner in dp mode: padded placement maps (request order ->
    # flat padded row / token positions)
    row_of_req: Any = None          # np i64[B] | None
    tok_of_req: Any = None          # np i64[sum q_lens] | None
    # set by the runner for the scheduler
    num_valid: int = 0              # real (unpadded) sequence count
    device_tokens: Any = None       # jnp i32[Bmax] sampled tokens (padded)
    sample_meta: Any = None         # padded SamplingMetadata (defer_sample)
    device_logits: Any = None       # jnp f32[Bmax, V] last-token logits
    device_logprobs: Any = (None, None, None)
    token_logprobs: Any = None      # np f32[B] chosen-token logprobs
    top_logprob_vals: Any = None    # np f32[B, K]
    top_logprob_ids: Any = None     # np i32[B, K]


class ModelRunner:
    def __init__(self, server_args: ServerArgs, model_config: ModelConfig,
                 mesh_ctx: Optional[MeshContext] = None):
        self.server_args = server_args
        self.model_config = model_config
        # multi-host: node 0 drives, other processes replay in SPMD
        # lockstep (managers/multihost.py); everything device-side is a
        # global-mesh program, so the runner only needs to (a) pin program
        # outputs replicated so any process can materialize them, and
        # (b) commit host inputs as global replicated arrays.
        self.multihost = server_args.nnodes > 1
        if self.multihost:
            from iaas_sglang_tpu.parallel.dist import init_distributed

            init_distributed(server_args)
        # dedicated ep mesh axis when ep_size exceeds tp_size (pod-scale
        # MoE: experts over the ("ep","tp") super-axis, ep rides DCN)
        ep_factor = 1
        if server_args.ep_size > server_args.tp_size:
            assert server_args.ep_size % server_args.tp_size == 0, \
                "ep_size must be a multiple of tp_size"
            ep_factor = server_args.ep_size // server_args.tp_size
        self.mesh_ctx = mesh_ctx or make_mesh(
            server_args.tp_size, server_args.dp_size, ep_factor)
        self.page_size = server_args.page_size
        self.attn_backend = server_args.attention_backend
        # DP attention: G = dp*tp attention ranks, each owning a private
        # KV page space (reference --enable-dp-attention; SURVEY §2.3)
        self.attn_dp = (
            self.mesh_ctx.tp_size * self.mesh_ctx.dp_size
            if server_args.enable_dp_attention else 1)

        if server_args.quantize_lm_head and server_args.quantization:
            model_config.quantize_lm_head = True
        model_cls = resolve_model_cls(model_config)
        self.model = model_cls(model_config)
        self.model.mesh = self.mesh_ctx.mesh
        if server_args.quantization:
            from iaas_sglang_tpu.quantization.qlinear import set_int4_impl

            on_tpu = jax.devices()[0].platform != "cpu"
            n_dev = self.mesh_ctx.tp_size * self.mesh_ctx.dp_size
            # fused Pallas dequant-GEMM on a single shard (int4 nibbles,
            # int8 and fp8 all ride the same pipelined DMA kernel); XLA
            # dequant path under GSPMD (pallas_call is opaque to the
            # partitioner)
            set_int4_impl("pallas" if (on_tpu and n_dev == 1) else "xla")
        if getattr(model_config, "num_experts", 0):
            import jax as _jax

            n_dev = self.mesh_ctx.tp_size * self.mesh_ctx.dp_size
            on_tpu = _jax.devices()[0].platform != "cpu"
            if server_args.ep_size > 1:
                assert server_args.ep_size == self.mesh_ctx.ep_size, \
                    "ep_size must equal tp_size (EP over the tp axis) or " \
                    "a multiple of it (dedicated ep mesh axis)"
                assert model_config.num_experts % server_args.ep_size == 0
                # mixed dense/MoE stacks branch with lax.cond inside the
                # layer scan; shard_map collectives can't live in a cond
                # branch, so EP is TP-only for these models for now
                assert model_config.moe_layer_mask is None, \
                    "EP not yet supported for mixed dense/MoE models"
                # a2a token dispatch: standard top-k routers only (the
                # DeepSeek grouped router keeps the psum-combine EP path);
                # over a dedicated ep axis the psum-combine path is used
                # (all_to_all wants a single mesh axis)
                a2a = (server_args.moe_a2a_backend
                       and self.mesh_ctx.ep_factor == 1
                       and model_config.model_type
                       not in ("deepseek_v2", "deepseek_v3"))
                self.model.moe_impl = "ep_a2a" if a2a else "ep"
                self.model.moe_axis = self.mesh_ctx.moe_axis
            else:
                self.model.moe_impl = "gmm" if (on_tpu and n_dev == 1) \
                    else "dense"
            self.model.mesh = self.mesh_ctx.mesh
            self.model.tbo = server_args.enable_two_batch_overlap
            logger.info("MoE impl: %s%s", self.model.moe_impl,
                        " +tbo" if self.model.tbo else "")

        logger.info("loading weights (%s) ...", server_args.load_format)
        with self.mesh_ctx.mesh:
            self.params = model_loader.load_params(
                self.model, model_config, self.mesh_ctx,
                load_format=server_args.load_format,
                quantization=server_args.quantization,
                seed=server_args.random_seed,
            )
        jax.block_until_ready(jax.tree.leaves(self.params)[0])
        self._maybe_expand_block_scales()
        self._maybe_fuse_params()

        self.lora_manager = None
        if getattr(server_args, "enable_lora", False):
            from iaas_sglang_tpu.lora.lora_manager import LoRAManager

            self.lora_manager = LoRAManager(
                self.model, model_config, self.mesh_ctx,
                max_loras=server_args.max_loras_per_batch,
                max_rank=server_args.max_lora_rank,
                backend=getattr(server_args, "lora_backend", "onehot"))

        # EAGLE3 aux feature tap: the target captures the residual stream
        # entering layers [2, L//2, L-3] (reference models/llama.py:707), or
        # the draft checkpoint's eagle_aux_hidden_state_layer_ids (+1)
        self.eagle3_aux_layers = None
        if server_args.speculative_algorithm == "eagle3":
            L = model_config.num_layers
            layers = [2, L // 2, L - 3]
            dp = server_args.speculative_draft_model_path
            if dp:
                import json as _json
                import os as _os

                cfgf = _os.path.join(dp, "config.json")
                if _os.path.exists(cfgf):
                    with open(cfgf) as f:
                        ids = _json.load(f).get(
                            "eagle_aux_hidden_state_layer_ids")
                    if ids:
                        layers = [i + 1 for i in ids]
            # keep exactly 3 slots (fc expects 3*H) — duplicates are fine
            self.eagle3_aux_layers = tuple(
                sorted(min(max(i, 0), L - 1) for i in layers))

        self._init_kv_pool()
        self._init_buckets()
        self._step_fn = self._build_step_fn()
        # AOT executable cache: the runtime jit dispatch path misbehaves on
        # the remote-compile relay for large programs (pathological compile
        # memory/time); explicit lower().compile() is fast and sane, so
        # every bucket shape is compiled ahead-of-time and cached here.
        self._compiled: dict = {}

    # -------------------------------------------------------------- KV pool

    def _init_kv_pool(self) -> None:
        c = self.model_config
        sa = self.server_args
        ps = self.page_size
        ne, ed = self.model.kv_entry_shape()
        kv_dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        if sa.kv_cache_dtype in ("fp8_e4m3", "fp8"):
            # FP8 KV cache (reference layers/quantization/fp8.py:1151 kv
            # dtype): halves attention HBM traffic; direct e4m3 cast (range
            # ±448 covers attention K/V), kernels upcast on read
            kv_dtype = jnp.float8_e4m3fn
        elif sa.kv_cache_dtype == "int8":
            # INT8 KV with per-token power-of-two scales stored inline in
            # the page row (+128 lanes): ~2x KV capacity at bf16-parity
            # decode latency on v5e (PARITY.md r4 Narrow-KV A/B) — the
            # recommended capacity dtype here; fp8 stays a 3x latency hit
            # on this chip (no native fp8 compute). Split layout only.
            kv_dtype = jnp.int8
        elif sa.kv_cache_dtype not in ("auto", "bf16", "bfloat16"):
            raise ValueError(
                f"unknown kv_cache_dtype {sa.kv_cache_dtype!r}")
        int8_kv = kv_dtype == jnp.int8
        lane_pad = 128 if int8_kv else 0
        kv_bytes_per_token = (c.num_layers
                              * (ne * ed + 2 * lane_pad)
                              * jnp.dtype(kv_dtype).itemsize)

        # K/V-split page layout (r4, ops/split_attention.py): planes
        # [ps, 2, Nk, D] instead of interleaved [ps, 2Nk, D]. Only for
        # plain MHA/GQA bf16/f32 pools — fp8 KV keeps the packed decode
        # kernel, double sparsity and cross-attention models read the
        # interleaved layout directly.
        is_mha = (not c.is_mla) and ne == 2 * c.num_kv_heads
        if sa.kv_layout == "split":
            self.kv_split = True
        elif sa.kv_layout == "interleaved":
            self.kv_split = False
        else:
            tp = max(self.mesh_ctx.tp_size, 1)
            self.kv_split = (
                is_mha
                and kv_dtype != jnp.float8_e4m3fn
                and not sa.enable_double_sparsity
                and getattr(self.model, "write_cross_kv", None) is None
                and sa.attention_backend != "jax_rpa"   # needs interleaved
                # TP shards the pool on the Nk dim (interleaved shards
                # the 2Nk combined dim, which tolerates tp == 2*Nk)
                and (self.attn_dp > 1
                     or c.num_kv_heads % tp == 0)
            )
        assert not (self.kv_split and not is_mha), \
            "--kv-layout split needs a plain MHA/GQA KV pool"
        if int8_kv:
            tp = max(self.mesh_ctx.tp_size, 1)
            if not self.kv_split or tp > 1 or sa.speculative_algorithm \
                    or sa.enable_hierarchical_cache \
                    or sa.disaggregation_mode != "none":
                raise ValueError(
                    "--kv-cache-dtype int8 needs the K/V-split page "
                    "layout on a single tp shard (MHA/GQA, no spec/"
                    "hicache/disaggregation yet)")

        if sa.max_total_tokens is not None:
            total_tokens = sa.max_total_tokens
        else:
            avail = self._profile_available_bytes()
            if avail is None:
                total_tokens = 2 ** 16  # CPU/test default
            else:
                total_tokens = int(avail // kv_bytes_per_token)
        G = self.attn_dp
        pages_per_layer = max(total_tokens // G // ps, 16)
        # +1 garbage page per layer (write sink for padding lanes)
        self.pages_per_layer = pages_per_layer
        self.num_usable_pages = pages_per_layer  # per attention rank
        NPp = c.num_layers * (pages_per_layer + 1)
        if self.kv_split:
            # plane-outermost, lane-flat STORED shape [2, NP, ps, Nk*D]
            # (+128 scale lanes for int8): any reshape view of the pool
            # re-tiles and copies 100% of it per call (xprof r4), so the
            # flat lane dim is physical
            shape = (2, NPp, ps, (ne // 2) * ed + lane_pad)
            dims = (None, None, None, "tp")   # heads = lane blocks
        else:
            shape = (NPp, ps, ne, ed)
            dims = self.model.kv_shard_dims()
        if G > 1:
            # per-rank private page spaces, sharded over BOTH mesh axes:
            # zero KV duplication (the DP-attention memory win for MLA)
            shape = (G,) + shape
            sharding = self.mesh_ctx.sharding(("dp", "tp"))
        else:
            sharding = self.mesh_ctx.sharding(*dims)
        if self.multihost:
            # born-sharded allocation: no single process can hold (or
            # device_put from) the full pod-scale pool
            self.kv_pages = jax.jit(
                lambda: jnp.zeros(shape, dtype=kv_dtype),
                out_shardings=sharding)()
        else:
            self.kv_pages = jax.device_put(
                jnp.zeros(shape, dtype=kv_dtype), sharding
            )
        if sa.enable_double_sparsity:
            self._init_double_sparsity(shape, kv_dtype)
        self.max_pages_per_seq = cdiv(c.context_len, ps)
        gb = np.prod(shape) * jnp.dtype(kv_dtype).itemsize / 1e9
        logger.info(
            "KV pool: %d ranks x %d pages/layer x %d tokens/page x %d layers"
            " = %d tokens (%.2f GB)",
            G, pages_per_layer, ps, c.num_layers,
            G * pages_per_layer * ps, gb,
        )

    def _init_double_sparsity(self, kv_shape, kv_dtype) -> None:
        """Heavy-channel label pool + per-layer channel table (reference
        double_sparsity_backend.py; channels from a calibration json or,
        absent one, |W_k| column magnitudes per head)."""
        sa, c = self.server_args, self.model_config
        assert not c.is_mla and not c.sliding_window, \
            "double sparsity covers plain MHA/GQA models"
        r = sa.ds_heavy_channel_num
        L, Nk, D = c.num_layers, c.num_kv_heads, c.head_dim
        if sa.ds_channel_config_path:
            import json as _json

            with open(sa.ds_channel_config_path) as f:
                ch = np.asarray(_json.load(f), dtype=np.int32)
            assert ch.shape == (L, Nk, r), \
                f"channel config shape {ch.shape} != {(L, Nk, r)}"
            channels = jnp.asarray(ch)
        else:
            wk = self.params["layers"]["wk"]          # [L, H, Nk*D]
            mag = jnp.sum(jnp.abs(wk.astype(jnp.float32)), axis=1)
            _, channels = jax.lax.top_k(mag.reshape(L, Nk, D), r)
            channels = channels.astype(jnp.int32)
        self.model.ds_channels = channels
        self.model.ds_heavy_tokens = sa.ds_heavy_token_num
        label_shape = kv_shape[:-2] + (Nk, r)
        # label scores need more mantissa than e4m3: keep labels >= bf16
        if kv_dtype == jnp.float8_e4m3fn:
            kv_dtype = jnp.bfloat16
        labels = jax.device_put(
            jnp.zeros(label_shape, dtype=kv_dtype), self.mesh_ctx.replicated)
        self.kv_pages = (self.kv_pages, labels)
        logger.info("double sparsity: r=%d channels, top-%d tokens",
                    r, sa.ds_heavy_token_num)

    def _profile_available_bytes(self) -> Optional[int]:
        try:
            dev = jax.local_devices()[0]
            stats = dev.memory_stats()
            if not stats or "bytes_limit" not in stats:
                return None
            limit = stats["bytes_limit"]
            in_use = stats.get("bytes_in_use", 0)
            frac = self.server_args.mem_fraction_static
            return max(int(limit * frac - in_use), 0)
        except Exception:
            return None

    # -------------------------------------------------------------- buckets

    def _init_buckets(self) -> None:
        sa = self.server_args
        self.decode_bs_buckets = sa.decode_bs_buckets or make_buckets(
            sa.max_running_requests, 8
        )
        self.prefill_token_buckets = sa.prefill_token_buckets or make_buckets(
            max(sa.max_prefill_tokens, 64), 64
        )
        # pages-per-seq buckets: powers of 4 capped at the model context
        mp_buckets, b = [], 16
        while b < self.max_pages_per_seq:
            mp_buckets.append(b)
            b *= 4
        mp_buckets.append(self.max_pages_per_seq)
        self.mp_buckets = mp_buckets
        # KV slot-move batch sizes (tree-speculative canonicalization)
        self.move_buckets = [8, 32, 128, 512, 2048]

    # ------------------------------------------------------------- step fns

    def _build_step_fn(self):
        model = self.model
        attn_backend = self.attn_backend
        scan_layers = self.server_args.scan_layers

        from iaas_sglang_tpu.sampling.sampler import (
            apply_grammar_mask,
            apply_penalties,
            compute_logprobs,
        )

        num_layers = self.model_config.num_layers
        vocab_size = self.model_config.vocab_size

        def kv_move(kv, src, dst):
            """Move KV entries between layer-relative slots in every layer
            (tree-speculative acceptance canonicalization: accepted tree
            rows' KV relocates to the chain-canonical slots). Pad entries
            are garbage->garbage self-copies."""
            Lp = kv.shape[0]
            if kv.ndim == 4 and kv.shape[0] == 2:
                # K/V-split plane-outermost [2, NP, ps, NkD]: same slot
                # space per plane, V offset by the whole K plane
                _, NPt, ps_, _ = kv.shape
                span = (NPt // num_layers) * ps_
                kvf = kv.reshape(2 * NPt * ps_, kv.shape[3])
                base = (jnp.arange(num_layers, dtype=jnp.int32)
                        * span)[:, None]
                sk = (src[None, :] + base).reshape(-1)
                dk = (dst[None, :] + base).reshape(-1)
                s = jnp.concatenate([sk, NPt * ps_ + sk])
                d = jnp.concatenate([dk, NPt * ps_ + dk])
                kvf = kvf.at[d].set(kvf[s])
                return kvf.reshape(kv.shape)
            ps_ = kv.shape[1]
            span = (Lp // num_layers) * ps_
            kvf = kv.reshape(Lp * ps_, *kv.shape[2:])
            base = (jnp.arange(num_layers, dtype=jnp.int32) * span)[:, None]
            s = (src[None, :] + base).reshape(-1)
            d = (dst[None, :] + base).reshape(-1)
            kvf = kvf.at[d].set(kvf[s])
            return kvf.reshape(kv.shape)

        self._kv_move_fn = jax.jit(kv_move, donate_argnums=(0,))

        aux_layers = self.eagle3_aux_layers

        def step(params, kv_pages, fb: ForwardBatch, meta: SamplingMetadata,
                 pen, grammar_mask, lora, attn_mode: str, logprob_top_k: int,
                 return_hidden: bool = False, verify_k: int = 0,
                 sampling_mode: str = "full", hidden_tap: str = "none"):
            if fb.move_src is not None:
                kv_pages = kv_move(kv_pages, fb.move_src, fb.move_dst)
            # EAGLE3: the draft feature is the 3-layer aux concat, captured
            # only on programs that tap features (verify / prefill prime)
            want_aux = aux_layers is not None and hidden_tap != "none"
            if want_aux:
                hidden, kv_pages, feat_src = model.forward(
                    params, fb, kv_pages,
                    attn_backend=attn_backend, attn_mode=attn_mode,
                    scan_layers=scan_layers, lora=lora,
                    aux_capture=aux_layers,
                )
            else:
                hidden, kv_pages = model.forward(
                    params, fb, kv_pages,
                    attn_backend=attn_backend, attn_mode=attn_mode,
                    scan_layers=scan_layers, lora=lora,
                )
                feat_src = hidden
            if verify_k > 0:
                # TARGET_VERIFY (forward_batch_info.py ForwardMode analog):
                # greedy argmax at each of the K+1 draft positions
                Bmax, Kp1 = fb.verify_idx.shape
                vh = hidden[fb.verify_idx.reshape(-1)]
                vlogits = model.compute_logits(params, vh)
                vtokens = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)
                # EAGLE taps the draft features at the verify positions
                vhid = (feat_src[fb.verify_idx.reshape(-1)]
                        .reshape(Bmax, Kp1, -1)
                        if hidden_tap == "verify" else None)
                return (vtokens.reshape(Bmax, Kp1), None, None, None, None,
                        vhid, None, kv_pages)
            if fb.lp_targets is not None:
                # prompt logprobs: log-softmax at EVERY position, gathered
                # at the next-prompt-token targets (input-logprob path)
                all_logits = model.compute_logits(params, hidden)  # [T, V]
                all_lp = jax.nn.log_softmax(all_logits, axis=-1)
                plp = jnp.take_along_axis(
                    all_lp, fb.lp_targets[:, None], axis=-1)[:, 0]
            else:
                plp = None
            last_h = hidden[fb.last_token_idx]          # [Bmax, H]
            logits = model.compute_logits(params, last_h)  # f32[Bmax, V]
            if pen is not None:
                logits = apply_penalties(logits, pen)
            if grammar_mask is not None:
                logits = apply_grammar_mask(logits, grammar_mask)
            if sampling_mode == "defer":
                # split-program decode (grammar overlap): this program stops
                # at the logits; a separate tiny sample program applies the
                # host-shipped vocab mask + penalties and samples — the TPU
                # analog of the reference's sampling_info_done event
                # (tp_worker_overlap_thread.py:45-53): the model forward of
                # step N overlaps the host walking the automaton with step
                # N-1's token and shipping step N's mask.
                tokens = jnp.zeros(logits.shape[0], jnp.int32)
            elif sampling_mode == "greedy":
                # all-greedy batch: argmax only — drops the [B, V] sort +
                # per-row RNG from the program (faster decode AND much
                # faster remote compile)
                tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                tokens = sample_tokens(logits, meta)
            if logprob_top_k >= 0:
                lp, topv, topi = compute_logprobs(logits, tokens, logprob_top_k)
            else:
                lp = topv = topi = None
            if hidden_tap == "all":
                hid = feat_src        # [T, H|3H] — EAGLE prefill feature prime
            elif return_hidden:
                pool_fn = getattr(model, "pooled_output", None)
                hid = (pool_fn(params, last_h) if pool_fn is not None
                       else last_h.astype(jnp.float32))
            else:
                hid = None
            return tokens, logits, lp, topv, topi, hid, plp, kv_pages

        ps = self.page_size

        def multi_step(params, kv_pages, fb: ForwardBatch,
                       meta: SamplingMetadata, pen, counts_in, lp_ids,
                       n_steps: int, sampling_mode: str,
                       logprob_top_k: int = -1):
            """N chained decode iterations in one program: the sampled token
            of step i is step i+1's input ON DEVICE (lax.scan), and KV slots
            are recomputed from the page table each step. One dispatch + one
            token fetch per N tokens — the multi-step scheduling analog of
            the reference's overlap loop, tuned for the ~24 ms relay RTT.

            Penalties ride the chain as a device-side count state [B, V]
            updated after each sampled token (VERDICT r1 weak-5: overlap
            must survive penalty batches; the reference's penalizers are
            likewise on-accelerator, penaltylib/orchestrator.py)."""
            from iaas_sglang_tpu.sampling.sampler import (
                apply_penalties_with_counts,
                output_token_counts,
            )

            def body(carry, i):
                tok, kv, counts = carry
                pos = fb.positions + i
                # DP attention: page tables are [G, B_r, MP] rank-local;
                # decode rows are rank-major flat so a plain reshape
                # aligns row t with table row t (T_r == B_r at decode)
                pi = fb.page_indices
                pi_flat = (pi.reshape(-1, pi.shape[-1])
                           if pi.ndim == 3 else pi)
                page = jnp.take_along_axis(
                    pi_flat, (pos // ps)[:, None], axis=1)[:, 0]
                fb_i = fb.replace(
                    input_ids=tok, positions=pos,
                    out_slots=page * ps + pos % ps,
                    kv_lens=fb.kv_lens + i)
                fused_tok = None
                import os as _os
                if _os.environ.get("IAAS_FUSED_DEBUG") == "1":
                    print("[fused-head hook]", sampling_mode, pen is None,
                          logprob_top_k, lp_ids is None,
                          hasattr(model, "fused_greedy_decode"), flush=True)
                if (sampling_mode == "greedy" and pen is None
                        and logprob_top_k < 0 and lp_ids is None
                        and hasattr(model, "fused_greedy_decode")):
                    # the megakernel also runs the final norm + greedy
                    # lm_head + argmax (deletes the XLA head tail from
                    # the chain glue); None at trace time = ineligible
                    fused_tok = model.fused_greedy_decode(
                        params, fb_i, kv, attn_backend=attn_backend,
                        scan_layers=scan_layers)
                if fused_tok is not None:
                    tok2, kv = fused_tok
                else:
                    hidden, kv = model.forward(
                        params, fb_i, kv, attn_backend=attn_backend,
                        attn_mode="decode", scan_layers=scan_layers)
                    logits = model.compute_logits(
                        params, hidden[fb.last_token_idx])
                    if pen is not None:
                        logits = apply_penalties_with_counts(
                            logits, pen, counts, step=i)
                    if sampling_mode == "greedy":
                        tok2 = jnp.argmax(logits, axis=-1).astype(
                            jnp.int32)
                    else:
                        tok2 = sample_tokens(
                            logits, meta.replace(steps=meta.steps + i))
                if pen is not None:
                    counts = counts.at[
                        jnp.arange(tok2.shape[0]), tok2].add(1.0)
                ys = [tok2]
                if logprob_top_k >= 0:
                    # logprob requests ride the chain: per-step chosen-token
                    # logprob (+ top-k table) accumulates in the scan ys —
                    # one fetch per N tokens instead of per-dispatch decode
                    lp, topv, topi = compute_logprobs(
                        logits, tok2, logprob_top_k)
                    ys += [lp, topv, topi]
                if lp_ids is not None:
                    # token_ids_logprob: fixed per-request id gather from
                    # this step's log-softmax (ids are static, so the
                    # whole request rides the chain — VERDICT r3 #4)
                    lsm = jax.nn.log_softmax(logits, axis=-1)
                    safe = jnp.where(lp_ids >= 0, lp_ids, 0)
                    ys.append(jnp.take_along_axis(lsm, safe, axis=1))
                return (tok2, kv, counts), tuple(ys)

            if counts_in is not None:
                counts0 = counts_in   # chained dispatch: device state from
                #                       the previous chain (host is stale)
            elif pen is not None:
                counts0 = output_token_counts(pen, vocab_size)
            else:
                counts0 = jnp.zeros((), jnp.float32)
            (last, kv_pages, counts_f), ys = jax.lax.scan(
                body, (fb.input_ids, kv_pages, counts0),
                jnp.arange(n_steps, dtype=jnp.int32))
            ys = list(ys)
            toks = ys.pop(0)
            if logprob_top_k >= 0:
                lp, topv, topi = ys[:3]
                ys = ys[3:]
                lps = (lp.T, None if topv is None else topv.swapaxes(0, 1),
                       None if topi is None else topi.swapaxes(0, 1))
            else:
                lps = (None, None, None)
            idlp = ys.pop(0).swapaxes(0, 1) if lp_ids is not None else None
            counts_out = counts_f if pen is not None else None
            # [B, N], [B], kv, ([B,N],...), f32[B,V]|None, f32[B,N,J]|None
            return toks.T, last, kv_pages, lps, counts_out, idlp

        if self.multihost:
            # pin every non-KV output replicated: any process (driver or
            # follower) must be able to np.asarray() results from its own
            # local shards without cross-host fetches
            rep = self.mesh_ctx.replicated
            wsc = functools.partial(
                jax.tree.map,
                lambda x: jax.lax.with_sharding_constraint(x, rep))
            inner_step, inner_multi = step, multi_step

            def step(params, kv_pages, fb, meta, pen, gmask, lora, *s):
                out = inner_step(params, kv_pages, fb, meta, pen, gmask,
                                 lora, *s)
                return wsc(out[:-1]) + (out[-1],)

            def multi_step(params, kv_pages, fb, meta, pen, counts_in,
                           lp_ids, n_steps, sampling_mode,
                           logprob_top_k=-1):
                toks, last, kv, lps, cts, idlp = inner_multi(
                    params, kv_pages, fb, meta, pen, counts_in, lp_ids,
                    n_steps, sampling_mode, logprob_top_k)
                return (wsc(toks), wsc(last), kv, wsc(lps), wsc(cts),
                        wsc(idlp))

        self._multi_fn = jax.jit(
            multi_step, donate_argnums=(1,), static_argnums=(7, 8, 9))

        def sample_step(logits, meta: SamplingMetadata, pen, grammar_mask,
                        logprob_top_k: int, sampling_mode: str):
            """Standalone sampling program over a deferred step's device
            logits (split-program grammar overlap; the mask/penalties are
            host inputs shipped AFTER the forward was launched)."""
            if pen is not None:
                logits = apply_penalties(logits, pen)
            if grammar_mask is not None:
                logits = apply_grammar_mask(logits, grammar_mask)
            if sampling_mode == "greedy":
                tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                tokens = sample_tokens(logits, meta)
            if logprob_top_k >= 0:
                lp, topv, topi = compute_logprobs(
                    logits, tokens, logprob_top_k)
            else:
                lp = topv = topi = None
            return tokens, lp, topv, topi

        self._sample_fn = jax.jit(sample_step, static_argnums=(4, 5))

        self._all_logits_fn = jax.jit(
            lambda params, kv_pages, fb: (
                lambda hk: (model.compute_logits(params, hk[0]), hk[1])
            )(model.forward(params, fb, kv_pages,
                            attn_backend=attn_backend, attn_mode="extend",
                            scan_layers=scan_layers))
        )
        return jax.jit(step, donate_argnums=(1,),
                       static_argnums=(7, 8, 9, 10, 11, 12))

    # ------------------------------------------------------------- forward

    def forward(self, hb: HostBatch, fetch: bool = True,
                defer_sample: bool = False) -> Optional[np.ndarray]:
        """Launch one padded step. With fetch=True (sync mode) returns the
        sampled token per sequence i32[B]; with fetch=False the launch
        returns immediately (async dispatch) and the scheduler reads
        hb.device_tokens later — the overlap path
        (tp_worker_overlap_thread.py:53 analog, no thread needed: XLA's
        async dispatch is the background worker).

        defer_sample=True launches a logits-only program (no penalties, no
        grammar mask, no sampling); call `sample_deferred` afterwards to
        sample with host state computed WHILE the forward runs."""
        if hb.multi_steps > 1:
            return self._forward_multi(hb, fetch=fetch)
        fb, meta, B = self._pad_to_device(hb)
        hb.num_valid = B
        if defer_sample:
            pen = gmask = None
            attn_mode = "decode" if hb.mode.is_decode() else "extend"
            logprob_top_k = -1
            sampling_mode = "defer"
        else:
            pen = self._pad_penalties(hb, meta.temperatures.shape[0])
            attn_mode = "decode" if hb.mode.is_decode() else "extend"
            logprob_top_k = hb.top_logprobs_num if hb.return_logprob else -1
            gmask = self._pad_grammar(hb, meta.temperatures.shape[0])
        if self.mesh_ctx.tp_size * self.mesh_ctx.dp_size > 1:
            # batch metadata must be mesh-committed (replicated): the AOT
            # lowering pins each argument's sharding, and an uncommitted
            # host array would pin SingleDeviceSharding(device 0) against
            # the mesh-sharded weights
            rep = self.mesh_ctx.replicated
            if self.multihost:
                # commit host metadata as global replicated arrays (every
                # process holds an identical copy of the broadcast batch).
                # Device arrays (chained tokens / penalty counts) are
                # already global outputs of the previous program — leave
                # them alone (np.asarray would need a cross-host fetch)
                # global arrays (chained tokens / penalty counts —
                # outputs of the previous global program) pass through;
                # process-local arrays commit via host as replicated
                put = lambda x: (
                    x if isinstance(x, jax.Array)
                    and not x.is_fully_addressable
                    else jax.device_put(np.asarray(x), rep)
                    if hasattr(x, "shape") else x)
            else:
                put = lambda x: (jax.device_put(x, rep)
                                 if isinstance(x, jax.Array) else x)
            fb, meta, pen, gmask = jax.tree.map(put, (fb, meta, pen, gmask))
        lora = None
        if hb.lora_ids is not None and self.lora_manager is not None:
            lora = self.lora_manager.device_params()
        if not defer_sample:
            sampling_mode = (
                "greedy" if bool(np.all(hb.temperatures < 1e-5)) else "full")
        hidden_tap = ("verify" if (hb.verify_k > 0 and hb.return_verify_hidden)
                      else "all" if hb.return_all_hidden else "none")
        with self.mesh_ctx.mesh:
            exe = self._get_compiled(
                fb, meta, pen, gmask, lora,
                attn_mode, logprob_top_k, hb.return_hidden, hb.verify_k,
                sampling_mode, hidden_tap)
            tokens, logits, lp, topv, topi, hid, plp, self.kv_pages = exe(
                self.params, self.kv_pages, fb, meta, pen, gmask, lora,
            )
        if plp is not None:
            plp_np = np.asarray(plp)
            hb.prompt_logprobs = (plp_np[hb.tok_of_req]
                                  if hb.tok_of_req is not None
                                  else plp_np[: len(hb.positions)])
        hb.device_tokens = None if defer_sample else tokens
        hb.device_logits = logits
        hb.device_logprobs = (lp, topv, topi)
        if defer_sample:
            hb.sample_meta = meta   # padded device meta, reused by the
            #                         deferred sample program (same step ids)
        if hid is not None:
            if hidden_tap == "verify":
                hid_np = np.asarray(hid)
                hb.verify_hidden = (hid_np[hb.row_of_req]
                                    if hb.row_of_req is not None
                                    else hid_np[:B])
            elif hidden_tap == "all":
                hid_np = np.asarray(hid)
                hb.all_hidden = (hid_np[hb.tok_of_req]
                                 if hb.tok_of_req is not None
                                 else hid_np[: len(hb.positions)])
            else:
                hid_np = np.asarray(hid)
                hb.hidden_states = (hid_np[hb.row_of_req]
                                    if hb.row_of_req is not None
                                    else hid_np[:B])
        if not fetch:
            return None
        return self.fetch_tokens(hb)

    def _forward_multi(self, hb: HostBatch,
                       fetch: bool = True) -> Optional[np.ndarray]:
        fb, meta, B = self._pad_to_device(hb)
        hb.num_valid = B
        B_pad = meta.temperatures.shape[0]
        pen = self._pad_penalties(hb, B_pad)
        counts_in = hb.chain_counts if pen is not None else None
        if counts_in is not None:
            # chained penalty dispatch: the device count state replaces
            # pen.output_ids (which is host-stale by pending_steps) — pin
            # its shape so every chain hits the same compiled program
            pen = pen.replace(
                output_ids=jnp.full((B_pad, 8), -1, jnp.int32))
        lp_ids = None
        if hb.lp_token_ids is not None:
            J = hb.lp_token_ids.shape[1]
            lp_pad = np.full((B_pad, J), -1, np.int32)
            if hb.row_of_req is not None:   # DP attention placement
                lp_pad[hb.row_of_req] = hb.lp_token_ids
            else:
                lp_pad[: hb.lp_token_ids.shape[0]] = hb.lp_token_ids
            lp_ids = jnp.asarray(lp_pad)
        sampling_mode = (
            "greedy" if bool(np.all(hb.temperatures < 1e-5)) else "full")
        if self.mesh_ctx.tp_size * self.mesh_ctx.dp_size > 1:
            rep = self.mesh_ctx.replicated
            if self.multihost:
                # global arrays (chained tokens / penalty counts —
                # outputs of the previous global program) pass through;
                # process-local arrays commit via host as replicated
                put = lambda x: (
                    x if isinstance(x, jax.Array)
                    and not x.is_fully_addressable
                    else jax.device_put(np.asarray(x), rep)
                    if hasattr(x, "shape") else x)
            else:
                put = lambda x: (jax.device_put(x, rep)
                                 if isinstance(x, jax.Array) else x)
            fb, meta, pen, lp_ids = jax.tree.map(
                put, (fb, meta, pen, lp_ids))
        logprob_top_k = hb.top_logprobs_num if hb.return_logprob else -1
        key = ("multi", hb.multi_steps, sampling_mode, logprob_top_k,
               str(jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                                (fb, meta, pen, counts_in, lp_ids))))
        exe = self._compiled.get(key)
        with self.mesh_ctx.mesh:
            if exe is None:
                t0 = __import__("time").perf_counter()

                def absify(x):
                    if hasattr(x, "shape") and hasattr(x, "dtype"):
                        sh = getattr(x, "sharding", None)
                        return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                    sharding=sh)
                    return x

                abs_args = jax.tree.map(
                    absify, (self.params, self.kv_pages, fb, meta, pen,
                             counts_in, lp_ids))
                exe = self._multi_fn.lower(
                    *abs_args, hb.multi_steps, sampling_mode,
                    logprob_top_k).compile()
                self._compiled[key] = exe
                logger.info(
                    "compiled multi-step decode (B=%s N=%d) in %.1fs",
                    B_pad, hb.multi_steps,
                    __import__("time").perf_counter() - t0)
            toks, last, self.kv_pages, lps, cts, idlp = exe(
                self.params, self.kv_pages, fb, meta, pen, counts_in,
                lp_ids)
        hb.device_tokens = last           # [B_pad] — next chain's input
        hb._device_multi = toks           # [B_pad, N] device handle
        hb.device_logprobs = lps          # ([B_pad,N], [B_pad,N,K]x2)|Nones
        hb._device_counts = cts           # f32[B_pad, V] | None
        hb._device_idlp = idlp            # f32[B_pad, N, J] | None
        if not fetch:
            return None                   # fetch_multi() materializes later
        return self.fetch_multi(hb)

    def prefetch_multi(self, hb: HostBatch) -> None:
        """Start async device->host copies of a launched chain's outputs
        (no-op until the program completes on device): with several short
        chains in flight, the head's ~2-RTT relay fetch then overlaps the
        later chains' execution instead of serializing behind it."""
        if getattr(hb, "_host_prefetched", False):
            return
        try:
            arrs = [hb._device_multi, hb._device_idlp,
                    *(hb.device_logprobs or ())]
            for a in arrs:
                if a is not None and hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
        except Exception:
            pass  # relay backends without async host copies: fetch blocks
        hb._host_prefetched = True

    def fetch_multi(self, hb: HostBatch) -> np.ndarray:
        """Materialize a launched multi-step chain's sampled tokens (and,
        for logprob requests, the per-step logprob tables)."""
        B = hb.num_valid
        rows = hb.row_of_req  # DP attention: rank-major placement map
        take = (lambda a: np.asarray(a)[rows]) if rows is not None \
            else (lambda a: np.asarray(a)[:B])
        hb.multi_tokens = take(hb._device_multi)
        lp, topv, topi = hb.device_logprobs
        if lp is not None:
            hb.token_logprobs = take(lp)                    # [B, N]
            if topv is not None:
                hb.top_logprob_vals = take(topv)            # [B, N, K]
                hb.top_logprob_ids = take(topi)
        if hb._device_idlp is not None:
            hb.token_ids_logprob_vals = take(hb._device_idlp)
        return hb.multi_tokens

    def fetch_tokens(self, hb: HostBatch) -> np.ndarray:
        """Materialize the launched step's results on the host."""
        B = hb.num_valid
        rows = hb.row_of_req  # DP attention: rank-major placement map
        take = (lambda a: np.asarray(a)[rows]) if rows is not None \
            else (lambda a: np.asarray(a)[:B])
        lp, topv, topi = hb.device_logprobs
        if lp is not None:
            hb.token_logprobs = take(lp)
            if topv is not None:
                hb.top_logprob_vals = take(topv)
                hb.top_logprob_ids = take(topi)
        return take(hb.device_tokens)

    def sample_deferred(self, hb: HostBatch) -> None:
        """Run the standalone sample program over a deferred step's device
        logits. hb.grammar_masks / hb.penalty_arrays must hold the CURRENT
        host state (computed after the forward was launched — this call is
        the mask-ship half of the split-program grammar overlap). Sets
        hb.device_tokens (+ logprobs) like a normal forward launch."""
        assert hb.device_logits is not None and hb.sample_meta is not None
        meta = hb.sample_meta
        B_pad = meta.temperatures.shape[0]
        pen = self._pad_penalties(hb, B_pad)
        gmask = self._pad_grammar(hb, B_pad)
        logprob_top_k = hb.top_logprobs_num if hb.return_logprob else -1
        sampling_mode = (
            "greedy" if bool(np.all(hb.temperatures < 1e-5)) else "full")
        if self.mesh_ctx.tp_size * self.mesh_ctx.dp_size > 1:
            rep = self.mesh_ctx.replicated
            put = lambda x: (jax.device_put(x, rep)
                             if isinstance(x, jax.Array) else x)
            pen, gmask = jax.tree.map(put, (pen, gmask))
        key = ("sample", logprob_top_k, sampling_mode,
               str(jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                                (hb.device_logits, meta, pen, gmask))))
        tokens, lp, topv, topi = self._aot_call(
            key, self._sample_fn, (hb.device_logits, meta, pen, gmask),
            statics=(logprob_top_k, sampling_mode))
        hb.device_tokens = tokens
        hb.device_logprobs = (lp, topv, topi)

    def _get_compiled(self, fb, meta, pen, gmask, lora, attn_mode,
                      logprob_top_k, return_hidden, verify_k,
                      sampling_mode, hidden_tap="none"):
        key = (
            attn_mode, logprob_top_k, return_hidden, verify_k, sampling_mode,
            hidden_tap,
            str(jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                             (fb, meta, pen, gmask, lora))),
        )
        exe = self._compiled.get(key)
        if exe is None:
            t0 = __import__("time").perf_counter()

            # Lower with ABSTRACT avals: lowering against live committed
            # arrays pins their current layouts, and XLA then materializes
            # bf16 layout-conversion copies of every weight inside the
            # program (~2x weight HBM -> compile OOM on big models).
            # Abstract lowering lets the compiler pick layouts; any one-off
            # relayout happens per-array at call time instead.
            def absify(x):
                if hasattr(x, "shape") and hasattr(x, "dtype"):
                    sh = getattr(x, "sharding", None)
                    return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)
                return x

            abs_args = jax.tree.map(absify, (
                self.params, self.kv_pages, fb, meta, pen, gmask, lora))
            exe = self._step_fn.lower(
                *abs_args,
                attn_mode, logprob_top_k, return_hidden, verify_k,
                sampling_mode, hidden_tap,
            ).compile()
            self._compiled[key] = exe
            logger.info(
                "compiled %s step (T=%s B=%s) in %.1fs",
                attn_mode, fb.input_ids.shape[0], meta.temperatures.shape[0],
                __import__("time").perf_counter() - t0,
            )
        return exe

    def _pad_mm(self, hb: HostBatch, T_drop: int, tok_map):
        """Pad multimodal rows to a pow2 bucket; padding positions point at
        T_drop (one past the token axis) so the scatter drops them. tok_map
        remaps request-order token indices to the DP rank-major layout."""
        if hb.mm_embeds is None:
            return None, None
        Tm, H = hb.mm_embeds.shape
        Tm_pad = max(16, int(2 ** np.ceil(np.log2(max(Tm, 1)))))
        emb = np.zeros((Tm_pad, H), dtype=hb.mm_embeds.dtype)
        emb[:Tm] = hb.mm_embeds
        pos = np.full(Tm_pad, T_drop, dtype=np.int32)
        src = hb.mm_positions
        if tok_map is not None:
            src = tok_map[src]
        pos[:Tm] = src
        return jnp.asarray(emb), jnp.asarray(pos)

    def _pad_grammar(self, hb: HostBatch, B_pad: int):
        gm = hb.grammar_masks
        if gm is None:
            return None
        B, nbytes = gm.shape
        # column padding: model vocab may exceed tokenizer vocab — those
        # logits must stay DISALLOWED (0x00); row padding allows all (0xFF)
        nbytes_model = (self.model_config.vocab_size + 7) // 8
        out = np.zeros((B_pad, nbytes_model), dtype=np.uint8)
        if hb.row_of_req is not None:  # DP attention rank-major placement
            out[:, :] = 0xFF
            out[:, nbytes:] = 0
            out[hb.row_of_req, :nbytes] = gm
        else:
            out[B:, :] = 0xFF
            out[:B, :nbytes] = gm
        return jnp.asarray(out)

    def _pad_penalties(self, hb: HostBatch, B_pad: int):
        pa = hb.penalty_arrays
        if pa is None:
            return None
        L = pa["output_ids"].shape[1]
        L_pad = max(64, int(2 ** np.ceil(np.log2(max(L, 1)))))
        K = pa["disallow_ids"].shape[1]
        Kb = pa["bias_ids"].shape[1]

        rmap = hb.row_of_req  # DP attention: scatter rows to their rank slot

        def pad2(a, rows, cols, fill):
            out = np.full((rows, cols), fill, dtype=a.dtype)
            if rmap is not None:
                out[rmap, : a.shape[1]] = a
            else:
                out[: a.shape[0], : a.shape[1]] = a
            return out

        def pad1(a, rows, fill):
            out = np.full(rows, fill, dtype=a.dtype)
            if rmap is not None:
                out[rmap] = a
            else:
                out[: len(a)] = a
            return out

        return PenaltyMetadata(
            output_ids=jnp.asarray(pad2(pa["output_ids"], B_pad, L_pad, -1)),
            frequency_penalties=jnp.asarray(
                pad1(pa["frequency_penalties"], B_pad, 0.0)),
            presence_penalties=jnp.asarray(
                pad1(pa["presence_penalties"], B_pad, 0.0)),
            repetition_penalties=jnp.asarray(
                pad1(pa["repetition_penalties"], B_pad, 1.0)),
            disallow_ids=jnp.asarray(pad2(pa["disallow_ids"], B_pad, max(K, 8), -1)),
            bias_ids=jnp.asarray(pad2(pa["bias_ids"], B_pad, max(Kb, 8), -1)),
            bias_values=jnp.asarray(
                pad2(pa["bias_values"], B_pad, max(Kb, 8), 0.0)),
            min_remaining=jnp.asarray(
                pad1(pa.get("min_remaining",
                            np.zeros(len(pa["frequency_penalties"]),
                                     np.int32)), B_pad, 0)),
        )

    def forward_all_logits(self, hb: HostBatch) -> np.ndarray:
        """Debug/golden path: run a (non-donating) forward that returns the
        logits at EVERY query position, f32[T, V]. Also commits the KV
        writes so decode can continue afterwards."""
        fb, _meta, _B = self._pad_to_device(hb)
        T = len(hb.positions)
        with self.mesh_ctx.mesh:
            logits, self.kv_pages = self._all_logits_fn(
                self.params, self.kv_pages, fb
            )
        logits_np = np.asarray(logits)
        return (logits_np[hb.tok_of_req] if hb.tok_of_req is not None
                else logits_np[:T])

    # ------------------------------------------------------------- padding

    def _pad_to_device_dp(self, hb: HostBatch):
        """DP-attention layout: rows/tokens grouped rank-major with EQUAL
        per-rank padding (the padded rows are the reference's
        ForwardMode.IDLE lockstep batches — one program covers all ranks).
        page ids / KV slots are rank-LOCAL; placement maps (row_of_req /
        tok_of_req) let result fetch restore request order."""
        ps = self.page_size
        G = self.attn_dp
        B = len(hb.page_tables)
        ranks = np.asarray(hb.dp_ranks, dtype=np.int64)
        garbage_page = self.pages_per_layer  # per-rank-relative id
        garbage_slot = garbage_page * ps
        q_lens = hb.q_lens.astype(np.int64)
        counts = np.bincount(ranks, minlength=G)
        B_r = bucket_size(max(int(counts.max()), 1), self.decode_bs_buckets)
        if hb.mode.is_decode():
            T_r = B_r
        else:
            tok_counts = np.zeros(G, dtype=np.int64)
            np.add.at(tok_counts, ranks, q_lens)
            T_r = bucket_size(
                max(int(tok_counts.max()), 1), self.prefill_token_buckets)
        mp_needed = max((len(pt) for pt in hb.page_tables), default=1)
        MP = bucket_size(mp_needed, self.mp_buckets)

        input_ids = np.zeros(G * T_r, dtype=np.int32)
        positions = np.zeros(G * T_r, dtype=np.int32)
        out_slots = np.full(G * T_r, garbage_slot, dtype=np.int32)
        page_indices = np.full((G, B_r, MP), garbage_page, dtype=np.int32)
        kv_lens = np.zeros((G, B_r), dtype=np.int32)
        cu = np.zeros((G, B_r + 1), dtype=np.int32)
        last_token_idx = np.zeros(G * B_r, dtype=np.int32)
        # speculative verify under DP-attention (r5): per-row draft-token
        # gather indices remap into the rank-major token layout
        verify_idx_p = (np.zeros((G * B_r, hb.verify_k + 1), np.int32)
                        if hb.verify_k > 0 else None)
        tree_bits_p = (np.zeros((G * B_r, 32), np.int32)
                       if hb.tree_bits is not None else None)
        row_of_req = np.zeros(B, dtype=np.int64)
        tok_of_req = np.zeros(int(q_lens.sum()), dtype=np.int64)
        lp_targets_p = (np.zeros(G * T_r, dtype=np.int32)
                        if hb.lp_targets is not None else None)

        cu_req = np.zeros(B + 1, dtype=np.int64)
        cu_req[1:] = np.cumsum(q_lens)
        row_fill = np.zeros(G, dtype=np.int64)
        tok_fill = np.zeros(G, dtype=np.int64)
        for i in np.argsort(ranks, kind="stable"):
            r = int(ranks[i])
            j = int(row_fill[r]); row_fill[r] += 1
            ql = int(q_lens[i])
            t0 = int(tok_fill[r]); tok_fill[r] += ql
            row_of_req[i] = r * B_r + j
            src = slice(int(cu_req[i]), int(cu_req[i + 1]))
            dst0 = r * T_r + t0
            tok_of_req[src] = np.arange(dst0, dst0 + ql)
            if hb.input_ids is not None:
                input_ids[dst0 : dst0 + ql] = hb.input_ids[src]
            positions[dst0 : dst0 + ql] = hb.positions[src]
            out_slots[dst0 : dst0 + ql] = hb.out_slots[src]
            if lp_targets_p is not None:
                lp_targets_p[dst0 : dst0 + ql] = hb.lp_targets[src]
            pt = hb.page_tables[i]
            page_indices[r, j, : len(pt)] = pt
            kv_lens[r, j] = hb.seq_lens[i]
            cu[r, j + 1] = t0 + ql
            last_token_idx[r * B_r + j] = dst0 + ql - 1
            if verify_idx_p is not None:
                verify_idx_p[r * B_r + j] = (
                    dst0 + hb.verify_idx[i] - int(cu_req[i]))
            if tree_bits_p is not None:
                tree_bits_p[r * B_r + j] = hb.tree_bits[i]
        for r in range(G):
            n = int(counts[r])
            cu[r, n + 1 :] = cu[r, n]

        hb.row_of_req = row_of_req
        hb.tok_of_req = tok_of_req

        def scatter1(vals, size, fill, dtype):
            out = np.full(size, fill, dtype=dtype)
            out[row_of_req] = vals
            return out

        Bp = G * B_r
        mm_embeds, mm_positions = self._pad_mm(hb, G * T_r, tok_of_req)
        fb = ForwardBatch(
            mm_embeds=mm_embeds,
            mm_positions=mm_positions,
            verify_idx=(jnp.asarray(verify_idx_p)
                        if verify_idx_p is not None else None),
            tree_bits=(jnp.asarray(tree_bits_p)
                       if tree_bits_p is not None else None),
            lp_targets=jnp.asarray(lp_targets_p)
            if lp_targets_p is not None else None,
            input_ids=jnp.asarray(input_ids)
            if hb.input_ids is not None else self._chain_tokens(hb, G * T_r),
            positions=jnp.asarray(positions),
            out_slots=jnp.asarray(out_slots),
            page_indices=jnp.asarray(page_indices),
            kv_lens=jnp.asarray(kv_lens),
            cu_q_lens=jnp.asarray(cu),
            num_seqs=jnp.asarray(counts.astype(np.int32)),
            last_token_idx=jnp.asarray(last_token_idx),
        )
        meta = SamplingMetadata(
            temperatures=jnp.asarray(scatter1(
                hb.temperatures.astype(np.float32), Bp, 0.0, np.float32)),
            top_ks=jnp.asarray(scatter1(
                hb.top_ks.astype(np.int32), Bp, -1, np.int32)),
            top_ps=jnp.asarray(scatter1(
                hb.top_ps.astype(np.float32), Bp, 1.0, np.float32)),
            min_ps=jnp.asarray(scatter1(
                hb.min_ps.astype(np.float32), Bp, 0.0, np.float32)),
            seeds=jnp.asarray(scatter1(
                hb.seeds.astype(np.uint32), Bp, 0, np.uint32)),
            steps=jnp.asarray(scatter1(
                hb.steps.astype(np.int32), Bp, 0, np.int32)),
        )
        return fb, meta, B

    def _pad_to_device(self, hb: HostBatch):
        if self.attn_dp > 1:
            assert hb.lora_ids is None and hb.mrope_positions is None \
                and hb.move_src is None, \
                "LoRA / MRope / tree-KV-moves not supported with " \
                "DP attention"
            return self._pad_to_device_dp(hb)
        ps = self.page_size
        B = len(hb.page_tables)
        T = len(hb.positions)
        garbage_page = self.pages_per_layer  # per-layer-relative id
        garbage_slot = garbage_page * ps

        if hb.mode.is_decode():
            B_pad = bucket_size(B, self.decode_bs_buckets)
            T_pad = B_pad
        else:
            B_pad = bucket_size(B, self.decode_bs_buckets)
            T_pad = bucket_size(T, self.prefill_token_buckets)
        mp_needed = max((len(pt) for pt in hb.page_tables), default=1)
        MP = bucket_size(mp_needed, self.mp_buckets)

        def pad1(arr, size, fill):
            out = np.full(size, fill, dtype=arr.dtype if hasattr(arr, "dtype") else np.int32)
            out[: len(arr)] = arr
            return out

        input_ids = pad1(hb.input_ids.astype(np.int32), T_pad, 0) \
            if hb.input_ids is not None else None
        positions = pad1(hb.positions.astype(np.int32), T_pad, 0)
        out_slots = pad1(hb.out_slots.astype(np.int32), T_pad, garbage_slot)

        page_indices = np.full((B_pad, MP), garbage_page, dtype=np.int32)
        for i, pt in enumerate(hb.page_tables):
            page_indices[i, : len(pt)] = pt

        kv_lens = pad1(hb.seq_lens.astype(np.int32), B_pad, 0)
        cu = np.zeros(B_pad + 1, dtype=np.int32)
        cu[1 : B + 1] = np.cumsum(hb.q_lens)
        cu[B + 1 :] = cu[B]
        last_token_idx = np.zeros(B_pad, dtype=np.int32)
        last_token_idx[:B] = cu[1 : B + 1] - 1

        lora_ids = None
        if hb.lora_ids is not None:
            la = np.zeros(T_pad, dtype=np.int32)
            la[: len(hb.lora_ids)] = hb.lora_ids
            lora_ids = jnp.asarray(la)
        lp_targets = None
        if hb.lp_targets is not None:
            lt = np.zeros(T_pad, dtype=np.int32)
            lt[: len(hb.lp_targets)] = hb.lp_targets
            lp_targets = jnp.asarray(lt)
        verify_idx = None
        if hb.verify_k > 0:
            vi = np.zeros((B_pad, hb.verify_k + 1), dtype=np.int32)
            vi[: hb.verify_idx.shape[0]] = hb.verify_idx
            verify_idx = jnp.asarray(vi)
        tree_bits = None
        if hb.tree_bits is not None:
            tb = np.zeros((B_pad, 32), dtype=np.int32)
            tb[: hb.tree_bits.shape[0]] = hb.tree_bits
            tree_bits = jnp.asarray(tb)
        move_src = move_dst = None
        if hb.move_src is not None:
            # accepted-tree-row KV canonicalization, folded into this
            # program's prologue; padded with garbage->garbage self-copies
            Mp = bucket_size(max(len(hb.move_src), 1), self.move_buckets)
            ms = np.full(Mp, garbage_slot, dtype=np.int32)
            md = np.full(Mp, garbage_slot, dtype=np.int32)
            ms[: len(hb.move_src)] = hb.move_src
            md[: len(hb.move_dst)] = hb.move_dst
            move_src, move_dst = jnp.asarray(ms), jnp.asarray(md)
        mm_embeds, mm_positions = self._pad_mm(hb, T_pad, None)
        enc_lens = enc_pages = None
        if hb.enc_lens is not None:
            # cross-attention: expand per-seq encoder metadata to per-token
            # rows (decode: 1:1; extend: repeat by q_lens)
            EP = bucket_size(
                max((len(pt) for pt in hb.enc_page_tables), default=1),
                self.mp_buckets)
            el = np.zeros(T_pad, dtype=np.int32)
            epi = np.full((T_pad, EP), garbage_page, dtype=np.int32)
            reps = (np.ones(B, np.int32) if hb.mode.is_decode()
                    else hb.q_lens.astype(np.int32))
            t = 0
            for i in range(B):
                el[t : t + reps[i]] = hb.enc_lens[i]
                pt = hb.enc_page_tables[i]
                if len(pt):
                    epi[t : t + reps[i], : len(pt)] = pt
                t += reps[i]
            enc_lens, enc_pages = jnp.asarray(el), jnp.asarray(epi)
        mrope = None
        if hb.mrope_positions is not None:
            mr = np.zeros((3, T_pad), dtype=np.int32)
            mr[:, : hb.mrope_positions.shape[1]] = hb.mrope_positions
            mrope = jnp.asarray(mr)
        fb = ForwardBatch(
            mrope_positions=mrope,
            enc_lens=enc_lens,
            enc_page_indices=enc_pages,
            mm_embeds=mm_embeds,
            mm_positions=mm_positions,
            verify_idx=verify_idx,
            tree_bits=tree_bits,
            move_src=move_src,
            move_dst=move_dst,
            lora_ids=lora_ids,
            lp_targets=lp_targets,
            input_ids=jnp.asarray(input_ids)
            if input_ids is not None else self._chain_tokens(hb, T_pad),
            positions=jnp.asarray(positions),
            out_slots=jnp.asarray(out_slots),
            page_indices=jnp.asarray(page_indices),
            kv_lens=jnp.asarray(kv_lens),
            cu_q_lens=jnp.asarray(cu),
            num_seqs=jnp.asarray(B, dtype=jnp.int32),
            last_token_idx=jnp.asarray(last_token_idx),
        )
        meta = SamplingMetadata(
            temperatures=jnp.asarray(pad1(hb.temperatures.astype(np.float32), B_pad, 0.0)),
            top_ks=jnp.asarray(pad1(hb.top_ks.astype(np.int32), B_pad, -1)),
            top_ps=jnp.asarray(pad1(hb.top_ps.astype(np.float32), B_pad, 1.0)),
            min_ps=jnp.asarray(pad1(hb.min_ps.astype(np.float32), B_pad, 0.0)),
            seeds=jnp.asarray(pad1(hb.seeds.astype(np.uint32), B_pad, 0)),
            steps=jnp.asarray(pad1(hb.steps.astype(np.int32), B_pad, 0)),
        )
        return fb, meta, B

    def _chain_tokens(self, hb: HostBatch, T_pad: int):
        """Overlap mode: the next decode step's input_ids are the previous
        step's on-device sampled tokens — the TPU analog of the reference's
        future-token-ids resolution (tp_worker_overlap_thread.py:45), with
        no host roundtrip at all. The shape fit runs as a tiny compiled
        program with replicated output sharding: an eager slice of a
        multihost global array would land process-local and poison the
        next program's device assignment."""
        toks = hb.device_tokens
        assert toks is not None, "device token chain not set"
        if toks.shape[0] == T_pad:
            return toks
        if not hasattr(self, "_chain_fit_fn"):
            def _fit(t, n: int):
                return (t[:n] if t.shape[0] >= n
                        else jnp.pad(t, (0, n - t.shape[0])))

            kw = {}
            if self.mesh_ctx.tp_size * self.mesh_ctx.dp_size > 1:
                kw["out_shardings"] = self.mesh_ctx.replicated
            self._chain_fit_fn = jax.jit(
                _fit, static_argnums=(1,), **kw)
        with self.mesh_ctx.mesh:
            return self._aot_call(
                ("chain_fit", toks.shape, T_pad),
                self._chain_fit_fn, (toks,), (T_pad,))

    def _aot_call(self, key, jit_fn, args, statics=()):
        """AOT lower().compile() with an executable cache — runtime jit
        dispatch through the remote-compile relay misbehaves for big
        programs (CLAUDE.md); every auxiliary program goes through here
        like the main step functions do."""
        exe = self._compiled.get(key)
        if exe is None:
            def absify(x):
                if hasattr(x, "shape") and hasattr(x, "dtype"):
                    return jax.ShapeDtypeStruct(
                        x.shape, x.dtype,
                        sharding=getattr(x, "sharding", None))
                return x

            with self.mesh_ctx.mesh:
                exe = jit_fn.lower(
                    *jax.tree.map(absify, args), *statics).compile()
            self._compiled[key] = exe
        with self.mesh_ctx.mesh:
            return exe(*args)

    def write_cross_kv(self, enc_rows: np.ndarray,
                       enc_slots: np.ndarray) -> None:
        """Cross-attention (Mllama): project one request's encoder rows
        [E, H] into every cross layer's K/V pages (layer-relative slots
        [E]); run once per request before its first prefill chunk."""
        if not hasattr(self, "_write_cross_fn"):
            self._write_cross_fn = jax.jit(
                self.model.write_cross_kv, donate_argnums=(1,))
        dt = jnp.bfloat16 if self.model_config.dtype == "bfloat16" \
            else jnp.float32
        rows = jnp.asarray(np.asarray(enc_rows), dt)
        slots = jnp.asarray(np.asarray(enc_slots, np.int32))
        self.kv_pages = self._aot_call(
            ("write_cross_kv", rows.shape), self._write_cross_fn,
            (self.params, self.kv_pages, rows, slots))

    def apply_kv_moves(self, src: np.ndarray, dst: np.ndarray) -> None:
        """Standalone KV slot-move dispatch — flushes pending tree-verify
        canonicalizations when the next program is NOT a spec verify
        (plain decode fallback, retraction, request finish)."""
        if len(src) == 0:
            return
        Mp = bucket_size(len(src), self.move_buckets)
        garbage = self.pages_per_layer * self.page_size
        ms = np.full(Mp, garbage, np.int32)
        md = np.full(Mp, garbage, np.int32)
        ms[: len(src)] = src
        md[: len(dst)] = dst
        self.kv_pages = self._aot_call(
            ("kv_move", Mp), self._kv_move_fn,
            (self.kv_pages, jnp.asarray(ms), jnp.asarray(md)))

    # --------------------------------------------------------- multimodal

    def encode_images(self, pixel_values: np.ndarray) -> np.ndarray:
        """LLaVA path: [N, 3, S, S] preprocessed pixels -> projected
        LM-space embedding rows np [N, num_image_tokens, H]. N is padded to
        a pow2 bucket (each bucket compiles once)."""
        patches = self.model.patchify(np.asarray(pixel_values))
        N = patches.shape[0]
        N_pad = max(1, int(2 ** np.ceil(np.log2(N))))
        if N_pad != N:
            patches = np.concatenate(
                [patches, np.zeros((N_pad - N,) + patches.shape[1:],
                                   patches.dtype)])
        if not hasattr(self, "_encode_fn"):
            self._encode_fn = jax.jit(self.model.encode_images)
        dt = jnp.bfloat16 if self.model_config.dtype == "bfloat16" \
            else jnp.float32
        patches_j = jnp.asarray(patches, dt)
        out = self._aot_call(
            ("encode_images", patches_j.shape), self._encode_fn,
            (self.params, patches_j))
        return np.asarray(out)[:N]

    def embed_image_vec(self, pixel_values: np.ndarray) -> np.ndarray:
        """CLIP embedding path: [N, 3, S, S] pixels -> normalized image
        embedding vectors np [N, proj_dim] (models/clip_embedding.py)."""
        patches = self.model.patchify(np.asarray(pixel_values))
        N = patches.shape[0]
        N_pad = max(1, int(2 ** np.ceil(np.log2(N))))
        if N_pad != N:
            patches = np.concatenate(
                [patches, np.zeros((N_pad - N,) + patches.shape[1:],
                                   patches.dtype)])
        if not hasattr(self, "_embed_img_fn"):
            self._embed_img_fn = jax.jit(self.model.embed_image)
        dt = jnp.bfloat16 if self.model_config.dtype == "bfloat16" \
            else jnp.float32
        patches_j = jnp.asarray(patches, dt)
        out = self._aot_call(
            ("embed_image", patches_j.shape), self._embed_img_fn,
            (self.params, patches_j))
        return np.asarray(out)[:N]

    def encode_mm_items(self, items: list) -> dict:
        """Encode a batch of MMItems (cache misses only) -> {hash: rows}.
        Items are grouped by pixel shape/grid; each group is one jitted
        vision-tower call. The scheduler caches results by image hash
        (MultiModalCache)."""
        dt = jnp.bfloat16 if self.model_config.dtype == "bfloat16" \
            else jnp.float32
        out: dict = {}
        if hasattr(self.model, "encode_audio"):
            # dual-modality (MiniCPM-O): audio items go through the
            # whisper branch; `grid` carries the clip's valid mel frames
            audio = [it for it in items if it.modality == "audio"]
            items = [it for it in items if it.modality != "audio"]
            if audio:
                if not hasattr(self, "_encode_audio_fn"):
                    self._encode_audio_fn = jax.jit(self.model.encode_audio)
                mel_t = self.model.patchify_audio(
                    np.stack([it.pixel for it in audio]))
                # `grid` carries the clip's valid mel frames; the model
                # maps them to its own post-conv geometry
                valid = np.array([int(it.grid) for it in audio], np.int32)
                N = mel_t.shape[0]
                N_pad = max(1, int(2 ** np.ceil(np.log2(N))))
                if N_pad != N:
                    mel_t = np.concatenate([mel_t, np.zeros(
                        (N_pad - N,) + mel_t.shape[1:], mel_t.dtype)])
                    valid = np.concatenate(
                        [valid, np.ones(N_pad - N, np.int32)])
                mel_j = jnp.asarray(mel_t, dt)
                rows = self._aot_call(
                    ("encode_audio", mel_j.shape), self._encode_audio_fn,
                    (self.params, mel_j, jnp.asarray(valid)))
                rows = np.asarray(rows)
                for it, r in zip(audio, rows[:N]):
                    out[it.hash] = r
            if not items:
                return out
        if hasattr(self.model, "vision_host_tables"):
            # grid-bucketed tower (qwen2-vl / qwen2.5-vl): host tables
            # (rope, window permutations/masks) are static per grid
            if not hasattr(self, "_encode_fn"):
                self._encode_fn = jax.jit(self.model.encode_images)
            groups: dict = {}
            for it in items:
                groups.setdefault(tuple(it.grid), []).append(it)
            for grid, grp in groups.items():
                tables = self.model.vision_host_tables(grid)
                batch = np.stack([it.pixel for it in grp])
                N = batch.shape[0]
                N_pad = max(1, int(2 ** np.ceil(np.log2(N))))
                if N_pad != N:
                    batch = np.concatenate([batch, np.zeros(
                        (N_pad - N,) + batch.shape[1:], batch.dtype)])
                batch_j = jnp.asarray(batch, dt)
                rows = self._aot_call(
                    ("encode_images", batch_j.shape, grid),
                    self._encode_fn,
                    (self.params, batch_j,
                     *(jnp.asarray(t) for t in tables)))
                rows = np.asarray(rows)
                for it, r in zip(grp, rows[:N]):
                    out[it.hash] = r
            return out
        # llava family: fixed-size [3, S, S] pixels
        embs = self.encode_images(np.stack([it.pixel for it in items]))
        for it, e in zip(items, embs):
            out[it.hash] = e
        return out

    # ----------------------------------------------------- EPLB capture

    def run_expert_capture(self, hb: HostBatch) -> np.ndarray:
        """Re-run the given batch with the expert-distribution tap enabled;
        returns per-layer routed-token counts i32[L, E]. Non-donating (the
        KV rewrite is idempotent: same slots, same values) — used on
        SAMPLED steps while recording, so the hot step program never pays
        for the tap (reference expert_distribution.py per-pass gatherer)."""
        assert self.model_config.is_moe, "expert capture needs a MoE model"
        fb, _meta, _B = self._pad_to_device(hb)
        if self.mesh_ctx.tp_size * self.mesh_ctx.dp_size > 1:
            rep = self.mesh_ctx.replicated
            if self.multihost:
                # global arrays (chained tokens / penalty counts —
                # outputs of the previous global program) pass through;
                # process-local arrays commit via host as replicated
                put = lambda x: (
                    x if isinstance(x, jax.Array)
                    and not x.is_fully_addressable
                    else jax.device_put(np.asarray(x), rep)
                    if hasattr(x, "shape") else x)
            else:
                put = lambda x: (jax.device_put(x, rep)
                                 if isinstance(x, jax.Array) else x)
            fb = jax.tree.map(put, fb)
        if not hasattr(self, "_capture_fn"):
            model = self.model
            attn_backend = self.attn_backend
            scan_layers = self.server_args.scan_layers

            def cap(params, kv_pages, fb, attn_mode: str):
                _h, _kv, counts = model.forward(
                    params, fb, kv_pages, attn_backend=attn_backend,
                    attn_mode=attn_mode, scan_layers=scan_layers,
                    capture_experts=True)
                return counts

            self._capture_fn = jax.jit(cap, static_argnums=(3,))
        attn_mode = "decode" if hb.mode.is_decode() else "extend"
        shape_key = str(jax.tree.map(
            lambda x: x.shape if hasattr(x, "shape") else x, fb))
        counts = self._aot_call(
            ("expert_capture", attn_mode, shape_key), self._capture_fn,
            (self.params, self.kv_pages, fb), (attn_mode,))
        return np.asarray(counts)

    # ------------------------------------------------- weight lifecycle ops

    def apply_expert_locations(self, physical_to_logical: np.ndarray
                               ) -> tuple[bool, str]:
        """EPLB live relocation (reference eplb/expert_location_updater.py):
        rebuild the expert stacks as PHYSICAL slots [Lm, P, ...] per the
        rebalanced map (hot experts replicated, slots LPT-packed per rank)
        and record the map+1/replica scale consumed by the routing remap.
        Output-identical to logical dispatch; compiled step programs are
        invalidated (param shapes may change)."""
        try:
            p2l = np.asarray(physical_to_logical, np.int32)   # [Lm, P]
            grp = None
            for name in ("layers", "moe"):
                cand = self.params.get(name) if self.params else None
                if isinstance(cand, dict) and "we_gate" in cand:
                    grp = cand
                    break
            if grp is None:
                return False, "model has no relocatable expert stacks"
            ok, msg = relocate_expert_group(grp, p2l, self.mesh_ctx)
            if ok:
                self._compiled.clear()   # param shapes changed
            return ok, msg
        except Exception as e:  # noqa: BLE001
            return False, repr(e)

    def _maybe_expand_block_scales(self) -> None:
        """Single-shard Pallas serving of FP8 checkpoints on chips WITHOUT
        native fp8 compute (v5e):

        1. blockwise (128x128) weight_scale_inv tables expand column-wise
           to group form [.., K/128, N] (exact — block scales are constant
           within each 128-column group);
        2. the fp8 payload RECODES to INT8 with per-128-group scales
           (measured: the VPU fp8->f32 upcast caps the 8-bit dequant-GEMM
           stack at 77 GB/s, while the same kernel with int8 runs at
           702 GB/s of the 819 roofline; the extra requantization rounds
           at ~0.4% relative, far under fp8's own ~3% grid). Disable with
           --no-fp8-recode-int8 to keep the raw fp8 payload.

        The XLA path (GSPMD multi-shard / CPU) keeps raw fp8 either way."""
        from iaas_sglang_tpu.quantization.qlinear import (
            QuantizedWeight,
            quantize_weight_jnp,
        )
        import iaas_sglang_tpu.quantization.qlinear as _ql

        sa = self.server_args
        if (not sa.quantization
                or _ql._INT4_IMPL != "pallas"
                or not str(sa.quantization).startswith("fp8")):
            return

        def one(qw):
            if not isinstance(qw, QuantizedWeight) \
                    or qw.q.dtype != jnp.float8_e4m3fn:
                return qw
            N = qw.q.shape[-1]
            K = qw.q.shape[-2]

            def fix(q, s):
                if qw.block:
                    s = jnp.repeat(s, 128, axis=-1)[..., :N]
                if not sa.fp8_recode_int8:
                    return q, s
                gi = s.shape[-2]

                def requant(qs):
                    ql, sl = qs
                    w = ql.astype(jnp.float32) \
                        * jnp.repeat(sl, K // gi, axis=-2)
                    return quantize_weight_jnp(w, "int8")

                if q.ndim == 2:
                    return requant((q, s))
                lead = q.shape[:-2]
                q2, s2 = jax.lax.map(
                    requant, (q.reshape((-1,) + q.shape[-2:]),
                              s.reshape((-1,) + s.shape[-2:])))
                return (q2.reshape(lead + q2.shape[1:]),
                        s2.reshape(lead + s2.shape[1:]))

            q2, s2 = jax.jit(fix)(qw.q, qw.scale)
            return QuantizedWeight(q=q2, scale=s2, block=False)

        self.params = jax.tree.map(
            one, self.params,
            is_leaf=lambda x: isinstance(x, QuantizedWeight))
        jax.block_until_ready(jax.tree.leaves(self.params)[0])

    def _maybe_fuse_params(self) -> None:
        """Fuse q/k/v and gate/up QuantizedWeights into single GEMM
        sources for single-shard quantized serving (decode is launch- and
        small-N-bound; see llama_family.fuse_quantized_projections)."""
        sa = self.server_args
        # opt-in: on v5e the fused stacks measured SLIGHTLY slower than
        # separate calls (19.4 vs 17.3 ms/step on the llama-8B INT4 decode
        # stack) — kept for A/B work and future chips
        if (not sa.quantization
                or not getattr(sa, "enable_quant_fusion", False)
                or getattr(sa, "enable_lora", False)
                or self.mesh_ctx.tp_size * self.mesh_ctx.dp_size != 1):
            return
        target = getattr(self.model, "lm", self.model)
        if hasattr(target, "fuse_quantized_projections") \
                and self.params is not None:
            # AOT-compile the concat program: runtime dispatch of GB-scale
            # ops through the remote relay stalls (CLAUDE.md); donation
            # keeps peak HBM at ~1x the projection weights
            fn = jax.jit(target.fuse_quantized_projections,
                         donate_argnums=(0,))
            with self.mesh_ctx.mesh:
                exe = fn.lower(jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(
                        a.shape, a.dtype,
                        sharding=getattr(a, "sharding", None)),
                    self.params)).compile()
                self.params = exe(self.params)

    def update_weights_from_disk(self, model_path: str,
                                 load_format: str = "auto") -> tuple[bool, str]:
        """Hot-reload weights (analog of model_runner.py:690
        update_weights_from_disk). Shapes must match the loaded model."""
        try:
            cfg = self.model_config
            old_path = cfg.model_path
            cfg.model_path = model_path
            with self.mesh_ctx.mesh:
                new_params = model_loader.load_params(
                    self.model, cfg, self.mesh_ctx,
                    load_format=load_format,
                    quantization=self.server_args.quantization,
                    seed=self.server_args.random_seed,
                )
            self.params = new_params
            self._maybe_expand_block_scales()
            self._maybe_fuse_params()
            jax.block_until_ready(jax.tree.leaves(self.params)[0])
            return True, "ok"
        except Exception as e:  # noqa: BLE001 — reported to the caller
            cfg.model_path = old_path
            return False, repr(e)

    def update_weights_from_tensor(self, named_arrays) -> tuple[bool, str]:
        """In-place update from (name -> np.ndarray) pairs (analog of
        model_runner.py:838 update_weights_from_tensor, the RL hot path)."""
        try:
            specs = self.model.weight_specs()
            from iaas_sglang_tpu.model_loader.loader import _set_nested

            for name, arr in named_arrays.items():
                if name not in specs:
                    return False, f"unknown weight {name!r}"
                spec = specs[name]
                dims = ((None,) + tuple(spec.pspec)) if spec.stacked                     else tuple(spec.pspec)
                _set_nested(
                    self.params, name,
                    jax.device_put(arr, self.mesh_ctx.sharding(*dims)))
            return True, "ok"
        except Exception as e:  # noqa: BLE001
            return False, repr(e)

    def get_weights_by_name(self, name: str):
        node = self.params
        for part in name.split("."):
            node = node[part]
        return np.asarray(node)

    def init_weights_update_group(self, master_address: str,
                                  master_port: int,
                                  group_name: str = "") -> tuple[bool, str]:
        """Connect a ZMQ PULL socket to an external trainer's weight
        publisher — the TPU analog of the reference's NCCL update group
        (model_runner.py:745): collectives are compiled into programs
        here, so trainer->server weight sync rides plain TCP/DCN."""
        try:
            import zmq

            if getattr(self, "_weight_group", None) is not None:
                self._weight_group.close(0)
            ctx = zmq.Context.instance()
            sock = ctx.socket(zmq.PULL)
            sock.connect(f"tcp://{master_address}:{master_port}")
            self._weight_group = sock
            return True, "ok"
        except Exception as e:  # noqa: BLE001
            return False, repr(e)

    def update_weights_from_distributed(self, names, dtypes=None,
                                        shapes=None) -> tuple[bool, str]:
        """Receive len(names) tensors from the update group (multipart
        [name, dtype, shape-json, raw bytes]) and apply them in place
        (model_runner.py:790 analog)."""
        if getattr(self, "_weight_group", None) is None:
            return False, "init_weights_update_group has not been called"
        try:
            import json as _json

            pending = set(names)
            updates = {}
            while pending:
                name_b, dt_b, shape_b, buf = \
                    self._weight_group.recv_multipart()
                name = name_b.decode()
                arr = np.frombuffer(
                    buf, dtype=np.dtype(dt_b.decode())
                ).reshape(_json.loads(shape_b.decode()))
                updates[name] = arr
                pending.discard(name)
            return self.update_weights_from_tensor(updates)
        except Exception as e:  # noqa: BLE001
            return False, repr(e)

    def _host_named_params(self):
        """Flatten the live param tree to (name -> np.ndarray); quantized
        weights emit '<name>::q' / '<name>::scale' entries."""
        from iaas_sglang_tpu.quantization.qlinear import QuantizedWeight

        def walk(node, prefix):
            if isinstance(node, QuantizedWeight):
                yield prefix + "::q", np.asarray(node.q)
                yield prefix + "::scale", np.asarray(node.scale)
                if getattr(node, "zero_scale", None) is not None:
                    yield prefix + "::zero_scale", np.asarray(node.zero_scale)
                return
            if isinstance(node, dict):
                for k, v in node.items():
                    yield from walk(v, f"{prefix}.{k}" if prefix else k)
                return
            yield prefix, np.asarray(node)

        yield from walk(self.params, "")

    def save_sharded_model(self, path: str,
                           max_shard_bytes: int = 2 << 30
                           ) -> tuple[bool, str]:
        """Write the served weights as flat safetensors shards +
        index.json, reloadable with --load-format sharded_state
        (the reference's save_sharded_model, scheduler.py:2213)."""
        try:
            import json as _json
            import os

            from safetensors.numpy import save_file

            os.makedirs(path, exist_ok=True)
            shard, shard_bytes, shard_id, index = {}, 0, 0, {}

            def flush():
                nonlocal shard, shard_bytes, shard_id
                if not shard:
                    return
                fname = f"shard-{shard_id:05d}.safetensors"
                save_file(shard, os.path.join(path, fname))
                for k in shard:
                    index[k] = fname
                shard, shard_bytes = {}, 0
                shard_id += 1

            for name, arr in self._host_named_params():
                if arr.dtype == np.dtype("bfloat16"):
                    pass  # safetensors.numpy handles bf16 via ml_dtypes
                shard[name] = np.ascontiguousarray(arr)
                shard_bytes += arr.nbytes
                if shard_bytes >= max_shard_bytes:
                    flush()
            flush()
            with open(os.path.join(path, "sharded_state.index.json"),
                      "w") as f:
                _json.dump(index, f)
            return True, f"saved {len(index)} tensors to {path}"
        except Exception as e:  # noqa: BLE001
            return False, repr(e)

    def save_remote_model(self, url: str) -> tuple[bool, str]:
        """Persist the served weights through a connector URL
        (file:// here; redis/s3 when their clients exist)."""
        try:
            from iaas_sglang_tpu.connector import create_remote_connector

            conn = create_remote_connector(url)
            n = conn.put_weights(
                (name, np.ascontiguousarray(arr))
                for name, arr in self._host_named_params())
            return True, f"saved {n} tensors to {url}"
        except Exception as e:  # noqa: BLE001
            return False, repr(e)

    def release_memory_occupation(self) -> None:
        """Free weights + KV HBM for RL colocation (the
        torch_memory_saver release analog — on TPU simply dropping the
        arrays returns HBM to the allocator)."""
        self.params = None
        self.kv_pages = None

    def resume_memory_occupation(self) -> None:
        with self.mesh_ctx.mesh:
            self.params = model_loader.load_params(
                self.model, self.model_config, self.mesh_ctx,
                load_format=self.server_args.load_format,
                quantization=self.server_args.quantization,
                seed=self.server_args.random_seed,
            )
        self._maybe_fuse_params()
        self._init_kv_pool()

    # ------------------------------------------------ KV page host transfer

    def _flat_page_ids(self, pages: np.ndarray) -> np.ndarray:
        """Per-layer-relative page ids -> flat ids across all layers."""
        L = self.model_config.num_layers
        offs = (np.arange(L, dtype=np.int32) * (self.pages_per_layer + 1))
        return (offs[:, None] + pages[None, :]).reshape(-1)

    def kv_page_bytes_all_layers(self) -> int:
        """Host bytes one page costs across all layers (HiCache host-tier
        sizing for --hicache-size)."""
        shape = self.kv_pages.shape
        # interleaved [(G,) NP, ps, ne, ed] | split [(G,) 2, NP, ps, NkD]:
        # one page = ps * entry elems (x2 planes when split)
        lead = 2 if self.attn_dp > 1 else 1
        if self.kv_split:
            elems = 2 * int(np.prod(shape[lead + 1:]))
        else:
            elems = int(np.prod(shape[lead:]))
        per_page = (self.model_config.num_layers * elems
                    * self.kv_pages.dtype.itemsize)
        return per_page

    def gather_kv_pages(self, pages: np.ndarray) -> np.ndarray:
        """Fetch KV of the given pages (all layers) to host numpy —
        the HiCache write-back path (kvcacheio/transfer.cu analog)."""
        ids = jnp.asarray(self._flat_page_ids(np.asarray(pages, np.int32)))
        if self.kv_split:
            return np.asarray(self.kv_pages[:, ids])
        return np.asarray(self.kv_pages[ids])

    def gather_kv_pages_async(self, pages: np.ndarray):
        """Async write-back: launch the device gather and start the
        device->host copy without blocking (the TPU analog of the
        reference's dedicated write-back CUDA stream,
        cache_controller.py:162). Resolve later with np.asarray()."""
        ids = jnp.asarray(self._flat_page_ids(np.asarray(pages, np.int32)))
        out = (self.kv_pages[:, ids] if self.kv_split
               else self.kv_pages[ids])
        try:
            out.copy_to_host_async()
        except Exception:  # noqa: BLE001 — backends without async copy
            pass
        return out

    def scatter_kv_pages(self, pages: np.ndarray, data: np.ndarray) -> None:
        """Load host KV back into the given device pages (all layers)."""
        ids = jnp.asarray(self._flat_page_ids(np.asarray(pages, np.int32)))
        if self.kv_split:
            self.kv_pages = self.kv_pages.at[:, ids].set(
                jnp.asarray(data, dtype=self.kv_pages.dtype))
        else:
            self.kv_pages = self.kv_pages.at[ids].set(
                jnp.asarray(data, dtype=self.kv_pages.dtype))

    # --------------------------------------------------------------- misc

    def flush_kv(self) -> None:
        self.kv_pages = jax.tree.map(jnp.zeros_like, self.kv_pages)


def relocate_expert_group(grp: dict, p2l: np.ndarray, mesh_ctx
                          ) -> tuple[bool, str]:
    """Rebuild one expert-stack group ([Lm, E, ...] we_gate/up/down) as
    physical slots per the [Lm, P] physical->logical map; shared by the
    single-runner and the per-stage PP relocation."""
    import jax
    import jax.numpy as jnp

    Lm = jax.tree.leaves(grp["we_gate"])[0].shape[0]
    if p2l.shape[0] != Lm:
        return False, (f"map has {p2l.shape[0]} layers, "
                       f"group has {Lm} MoE layers")
    # compose with the current physical layout (re-application)
    cur = grp.get("expert_phys_map")
    if cur is not None:
        cur = np.asarray(cur)
        idx = np.zeros_like(p2l)
        for l in range(Lm):
            first = {}
            for slot, e in enumerate(cur[l]):
                first.setdefault(int(e), slot)
            idx[l] = [first[int(e)] for e in p2l[l]]
    else:
        idx = p2l
    counts = np.zeros_like(p2l, np.float32)
    for l in range(Lm):
        bc = np.bincount(p2l[l], minlength=p2l[l].max() + 1)
        counts[l] = bc[p2l[l]]
    scale = (1.0 / counts).astype(np.float32)

    idx_j = jnp.asarray(idx)
    stacks = {k: grp[k] for k in ("we_gate", "we_up", "we_down")}

    def gather(tree):
        return jax.tree.map(
            lambda a: jax.vmap(lambda x, i: x[i])(a, idx_j), tree)

    fn = jax.jit(gather)
    with mesh_ctx.mesh:
        exe = fn.lower(jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                           sharding=a.sharding),
            stacks)).compile()
        new_stacks = exe(stacks)
    for k, v in new_stacks.items():
        grp[k] = v
    grp["expert_phys_map"] = jax.device_put(
        jnp.asarray(p2l), mesh_ctx.sharding(None, None))
    grp["expert_phys_scale"] = jax.device_put(
        jnp.asarray(scale), mesh_ctx.sharding(None, None))
    n_rep = int((counts > 1).sum())
    return True, (f"relocated {p2l.shape[1]} physical slots over "
                  f"{Lm} layers ({n_rep} replicated entries)")
