"""Quick /verify drive: serve a tiny model end-to-end through the Engine
boundary (dummy weights), check determinism + radix cache hits.
Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/verify_drive.py '<hf json>'"""
import json
import sys

from iaas_sglang_tpu.entrypoints.engine import Engine
from iaas_sglang_tpu.server_args import ServerArgs

hf = json.loads(sys.argv[1]) if len(sys.argv) > 1 else dict(
    architectures=["Qwen2ForCausalLM"], model_type="qwen2",
    num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
    num_key_value_heads=2, intermediate_size=128, vocab_size=256,
    rms_norm_eps=1e-6, rope_theta=10000.0,
    max_position_embeddings=1024, tie_word_embeddings=True)
sa = ServerArgs(model_path="dummy://t", load_format="dummy", page_size=16,
                max_total_tokens=4096, skip_tokenizer_init=True,
                chunked_prefill_size=64, random_seed=0)
eng = Engine(sa, hf_config_override=hf)
prompts = [[1, 2, 3] * 8, [1, 2, 3] * 8 + [7, 8], [9] * 40]
sp = {"max_new_tokens": 8, "temperature": 0.0}
t1 = [o["output_ids"] for o in eng.generate(input_ids=prompts, sampling_params=sp)]
o2 = eng.generate(input_ids=prompts, sampling_params=sp)
t2 = [o["output_ids"] for o in o2]
assert t1 == t2, f"rerun mismatch {t1} vs {t2}"
assert all(o["meta_info"]["cached_tokens"] > 0 for o in o2), "no cache hits"
ab = eng.generate(input_ids=[[5] * 5000], sampling_params={"max_new_tokens": 2})
assert ab[0]["meta_info"]["finish_reason"]["type"] == "abort"
st = eng.get_internal_state()
assert st["free_pages"] + st["evictable_pages"] == st["total_pages"], st
eng.shutdown()
print("VERIFY OK:", hf["architectures"][0], t1[0][:4])
