"""Multi-host test worker, spawned by test_multihost.py with the JAX CPU
backend env set BEFORE the interpreter starts (see run_tests.sh note).

Modes (argv[1]):
  ref            single process, 8 local devices, tp=4 x dp=2 mesh
  0 / 1          node_rank under nnodes=2, 4 local devices each (same
                 8-device global mesh, now spanning two processes)
  L0 / L1        liveness pair: L0 = driver that idles after init (writes
                 "ready" to outfile), L1 = follower; used by the
                 kill-one-assert-other-dies tests
  Eref / E0 / E1 expert-parallel MoE composition: tiny Mixtral with
                 experts sharded over the tp axis (ep_size=4)

argv: mode coordinator_port outfile [decode_steps_per_dispatch]
"""

import json
import sys
import time


TINY = dict(
    architectures=["LlamaForCausalLM"], model_type="llama",
    num_hidden_layers=2, hidden_size=256, num_attention_heads=8,
    num_key_value_heads=4, intermediate_size=512, vocab_size=1024,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=1024,
    tie_word_embeddings=False,
)

TINY_MOE = dict(
    architectures=["MixtralForCausalLM"], model_type="mixtral",
    num_hidden_layers=2, hidden_size=256, num_attention_heads=8,
    num_key_value_heads=4, intermediate_size=256, vocab_size=1024,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=1024,
    tie_word_embeddings=False, num_local_experts=4, num_experts_per_tok=2,
)

PROMPTS = [
    list(range(3, 19)),
    [9, 8, 7, 6, 5],
    [100, 200, 300, 400, 150, 250, 350],
]
SAMPLING = {"temperature": 0.0, "max_new_tokens": 12, "ignore_eos": True}


def main() -> None:
    mode, port, outfile = sys.argv[1], sys.argv[2], sys.argv[3]
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    liveness = mode.startswith("L")
    ep = mode.startswith("E")
    if liveness or ep:
        mode = mode[1:]
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = TINY_MOE if ep else TINY
    kwargs = dict(
        # f32: greedy parity across process topologies must not hinge on
        # bf16 argmax ties (cross-process gloo reductions reorder sums)
        model_path="graft://tiny-mh", load_format="dummy", dtype="float32",
        skip_tokenizer_init=True, random_seed=0, page_size=16,
        max_total_tokens=4096, max_running_requests=8,
        max_prefill_tokens=256, chunked_prefill_size=256,
        tp_size=4, dp_size=2, decode_steps_per_dispatch=steps,
        ep_size=4 if ep else 1,
    )
    if mode != "ref":
        kwargs.update(nnodes=2, node_rank=int(mode),
                      dist_init_addr=f"127.0.0.1:{port}",
                      multihost_timeout=3.0 if liveness else 120.0)

    if mode == "1":
        from iaas_sglang_tpu.configs.model_config import ModelConfig
        from iaas_sglang_tpu.managers.multihost import run_follower

        sa = ServerArgs(**kwargs)
        run_follower(
            sa, ModelConfig.from_hf(hf, model_path=sa.model_path))
        return

    from iaas_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(**kwargs), hf_config_override=hf)
    if liveness:
        # idle driver: heartbeats only; the monitor must kill us when the
        # follower dies (exit 17). Write a ready marker for the test.
        with open(outfile, "w") as f:
            f.write("ready")
        time.sleep(60)
        sys.exit(0)
    outs = eng.generate(
        input_ids=PROMPTS, sampling_params=[dict(SAMPLING)] * len(PROMPTS))
    with open(outfile, "w") as f:
        json.dump({"out": [o["output_ids"] for o in outs],
                   "mchain": eng.scheduler._mchain_steps,
                   "pchain": eng.scheduler._pchain_steps}, f)
    eng.shutdown()


if __name__ == "__main__":
    main()
