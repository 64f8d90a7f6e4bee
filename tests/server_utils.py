"""Server-test harness (analog of sglang test_utils.py:422
popen_launch_server): builds a tiny on-disk model dir (config.json + a
byte-level tokenizer) and launches a real server subprocess on a free port.
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import requests

REPO_ROOT = Path(__file__).resolve().parent.parent

# every subprocess this harness launches, killed at interpreter exit even
# when pytest dies abnormally (fixture finalizers don't run on SIGKILL'd
# sessions — VERDICT r4 found leaked servers from a crashed run). Kills
# stored PIDs only, never patterns.
_launched: list = []


def _kill_leftovers() -> None:
    for proc in _launched:
        if proc.poll() is None:
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass


atexit.register(_kill_leftovers)


def track_proc(proc: subprocess.Popen) -> subprocess.Popen:
    """Register an externally launched test subprocess for exit cleanup."""
    _launched.append(proc)
    return proc

SERVER_TINY_LLAMA = dict(
    architectures=["LlamaForCausalLM"],
    model_type="llama",
    num_hidden_layers=2,
    hidden_size=64,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    vocab_size=512,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=1024,
    tie_word_embeddings=True,
    bos_token_id=1,
    eos_token_id=2,
)

CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "{{ message['role'] }}: {{ message['content'] }}\n"
    "{% endfor %}assistant:"
)


def make_tiny_model_dir(path: str) -> str:
    """Write config.json + byte-level tokenizer files into `path`."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(SERVER_TINY_LLAMA, f)

    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i, ch in enumerate(sorted(alphabet)):
        vocab[ch] = i + 3
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>",
    )
    fast.chat_template = CHAT_TEMPLATE
    fast.save_pretrained(path)
    return path


def popen_launch_server(model_dir: str, port: int, extra_args=(),
                        timeout: float = 600.0) -> subprocess.Popen:
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": f"{REPO_ROOT}:{env.get('PYTHONPATH', '')}",
        "JAX_COMPILATION_CACHE_DIR": "/root/.cache/jax_test_cache",
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0",
    })
    proc = track_proc(subprocess.Popen(
        [sys.executable, "-m", "iaas_sglang_tpu.launch_server",
         "--model-path", model_dir, "--load-format", "dummy",
         "--dtype", "float32", "--port", str(port),
         "--page-size", "4", "--max-total-tokens", "4096",
         "--max-running-requests", "8", "--max-prefill-tokens", "128",
         "--chunked-prefill-size", "64", "--random-seed", "0",
         "--enable-metrics",
         *extra_args],
        env=env, start_new_session=True,
    ))
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"server died with code {proc.returncode}")
        try:
            if requests.get(f"{base}/health", timeout=2).status_code == 200:
                return proc
        except requests.RequestException:
            pass
        time.sleep(1.0)
    kill_server(proc)
    raise TimeoutError("server did not become healthy")


def kill_server(proc: subprocess.Popen) -> None:
    """Kill the exact process group we started (never by pattern)."""
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait(timeout=10)
