"""Suite runner (analog of sglang test/srt/run_suite.py): suites keyed by
the hardware they need.

    python tests/run_suite.py --suite per-commit
"""

import argparse
import subprocess
import sys

SUITES = {
    # pure-logic + CPU-backend engine tests (every commit)
    "per-commit": [
        "tests/test_golden_model.py",
        "tests/test_scheduler.py",
        "tests/test_sampling.py",
        "tests/test_quantization.py",
        "tests/test_constrained.py",
        "tests/test_speculative.py",
        "tests/test_parsers.py",
        "tests/test_lang.py",
        "tests/test_eplb.py",
        "tests/test_lora.py",
        "tests/test_weight_updates.py",
        "tests/test_kernels.py",
        "tests/test_model_zoo.py",
        "tests/test_model_variants.py",
        "tests/test_embedding_models.py",
        "tests/test_double_sparsity.py",
    ],
    # model-family golden gates (HF/torch oracles)
    "per-commit-models": [
        "tests/test_multimodal.py",
        "tests/test_qwen2_vl.py",
        "tests/test_qwen25_vl.py",
        "tests/test_gemma3_mm.py",
        "tests/test_gemma3n.py",
        "tests/test_gemma3n_audio.py",
        "tests/test_internvl.py",
        "tests/test_janus.py",
        "tests/test_vila.py",
        "tests/test_pixtral_mistral3.py",
        "tests/test_qwen2_audio.py",
        "tests/test_minicpmv.py",
        "tests/test_minicpmo.py",
        "tests/test_kimi_vl.py",
        "tests/test_deepseek_vl2.py",
        "tests/test_phi3small.py",
        "tests/test_phi4mm.py",
        "tests/test_llama4_vision.py",
        "tests/test_mllama.py",
    ],
    # multi-chip logical meshes (8 virtual CPU devices)
    "per-commit-mesh": [
        "tests/test_dp_attention.py",
        "tests/test_pipeline_parallel.py",
    ],
    # multi-process servers (slower)
    "per-commit-server": [
        "tests/test_http_server.py",
        "tests/test_router.py",
        "tests/test_disaggregation.py",
    ],
}
SUITES["all"] = (SUITES["per-commit"] + SUITES["per-commit-models"]
                 + SUITES["per-commit-mesh"] + SUITES["per-commit-server"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="all", choices=sorted(SUITES))
    args = ap.parse_args()
    cmd = ["./run_tests.sh", *SUITES[args.suite], "-q"]
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
