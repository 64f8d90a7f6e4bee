"""C++ router integration: build, launch in front of two real servers,
verify proxying, streaming, policies, worker listing
(analog of sgl-router/py_test/)."""

import json
import os
import signal
import subprocess

import pytest
import requests

from iaas_sglang_tpu.router_launcher import build_router, launch_router
from iaas_sglang_tpu.utils import get_open_port
from tests.server_utils import kill_server, make_tiny_model_dir, popen_launch_server


def test_router_builds():
    binary = build_router()
    assert binary.exists() and os.access(binary, os.X_OK)


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    model_dir = make_tiny_model_dir(
        str(tmp_path_factory.mktemp("model") / "tiny-llama"))
    ports = [get_open_port(), get_open_port()]
    procs = [popen_launch_server(model_dir, p) for p in ports]
    rport = get_open_port()
    router = launch_router(
        rport, [f"http://127.0.0.1:{p}" for p in ports])
    yield f"http://127.0.0.1:{rport}", ports
    router.kill()
    for p in procs:
        kill_server(p)


def test_router_health_and_workers(cluster):
    base, ports = cluster
    assert requests.get(f"{base}/router_health", timeout=5).ok
    ws = requests.get(f"{base}/list_workers", timeout=5).json()["workers"]
    assert len(ws) == 2
    assert all(w["healthy"] for w in ws)


def test_router_proxies_generate(cluster):
    base, _ = cluster
    r = requests.post(f"{base}/generate", json={
        "text": "routed hello",
        "sampling_params": {"max_new_tokens": 5, "temperature": 0.0,
                            "ignore_eos": True},
    }, timeout=300)
    assert r.status_code == 200
    assert len(r.json()["output_ids"]) == 5


def test_router_proxies_health_passthrough(cluster):
    base, _ = cluster
    assert requests.get(f"{base}/health", timeout=30).ok


def test_router_streaming(cluster):
    base, _ = cluster
    r = requests.post(f"{base}/generate", json={
        "text": "stream through router",
        "stream": True,
        "sampling_params": {"max_new_tokens": 4, "temperature": 0.0,
                            "ignore_eos": True},
    }, stream=True, timeout=300)
    chunks = [l for l in r.iter_lines() if l.startswith(b"data:")]
    assert len(chunks) >= 2


def test_router_many_requests_spread(cluster):
    base, _ = cluster
    for i in range(6):
        r = requests.post(f"{base}/generate", json={
            "text": f"request number {i}",
            "sampling_params": {"max_new_tokens": 2, "temperature": 0.0,
                                "ignore_eos": True},
        }, timeout=300)
        assert r.status_code == 200
