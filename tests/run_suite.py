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
    ],
    # multi-process servers (slower)
    "per-commit-server": [
        "tests/test_http_server.py",
        "tests/test_router.py",
        "tests/test_disaggregation.py",
    ],
}
SUITES["all"] = SUITES["per-commit"] + SUITES["per-commit-server"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="all", choices=sorted(SUITES))
    args = ap.parse_args()
    cmd = ["./run_tests.sh", *SUITES[args.suite], "-q"]
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
