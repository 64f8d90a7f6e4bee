"""Multi-host serving: 2-process jax.distributed greedy parity.

The reference serves nnodes > 1 via NCCL process groups + rank-0 ZMQ
fan-out (srt/server_args.py:127-128, distributed/parallel_state.py:1126,
scheduler.py:958). The TPU design (managers/multihost.py): node 0 runs
the single-controller scheduler, follower hosts replay the identical
device-program launches in SPMD lockstep over one global {dp, tp} mesh.

Emulation here: 2 processes x 4 virtual CPU devices = the same 8-device
mesh as the single-process reference run; greedy outputs must match
token-for-token.
"""

import json
import os
import subprocess
import sys
import socket

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _env(n_local: int) -> dict:
    env = dict(os.environ)
    env.update(
        PYTHONPATH=os.path.dirname(HERE)
        + os.pathsep + os.environ.get("PYTHONPATH", ""),
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local}",
        JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_test_cache",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0",
    )
    return env


def _run(mode: str, port: int, outfile: str, n_local: int,
         timeout: int = 600) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, WORKER, mode, str(port), outfile],
        env=_env(n_local), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def test_two_process_greedy_parity(tmp_path):
    ref_out = str(tmp_path / "ref.json")
    mh_out = str(tmp_path / "mh.json")

    # single-process reference over the same 8-device tp4 x dp2 mesh
    p = _run("ref", 0, ref_out, n_local=8)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, f"reference run failed:\n{out[-4000:]}"

    port = _free_port()
    follower = _run("1", port, "/dev/null", n_local=4)
    driver = _run("0", port, mh_out, n_local=4)
    dout, _ = driver.communicate(timeout=600)
    fout, _ = follower.communicate(timeout=120)
    assert driver.returncode == 0, f"driver failed:\n{dout[-4000:]}"
    assert follower.returncode == 0, f"follower failed:\n{fout[-4000:]}"

    with open(ref_out) as f:
        ref = json.load(f)
    with open(mh_out) as f:
        mh = json.load(f)
    assert ref == mh, f"multihost greedy divergence:\nref {ref}\nmh  {mh}"
    assert all(len(r) == 12 for r in ref)
