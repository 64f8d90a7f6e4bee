"""DataParallelController: fans requests out to dp_size scheduler replicas
(analog of sglang srt/managers/data_parallel_controller.py:57).

Each replica is a full scheduler subprocess with its own model copy and
KV pool; generate requests are dispatched round-robin or shortest-queue,
control messages broadcast to every replica. Replies ride the shared
detokenizer ring unchanged.

On this single-chip environment the replicas share the one TPU (useful
for CPU-mesh testing and API parity); on a pod each replica owns a
slice via its own mesh.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
from typing import List

import zmq

from iaas_sglang_tpu.managers.io_struct import (
    AbortReq,
    TokenizedEmbeddingReqInput,
    TokenizedGenerateReqInput,
)
from iaas_sglang_tpu.server_args import PortArgs, ServerArgs
from iaas_sglang_tpu.utils import configure_logger, logger


def _worker_port_args(port_args: PortArgs, rank: int) -> PortArgs:
    return dataclasses.replace(
        port_args, scheduler_ipc=f"{port_args.scheduler_ipc}_dp{rank}")


def run_data_parallel_controller_process(server_args: ServerArgs,
                                         port_args: PortArgs,
                                         pipe_writer=None) -> None:
    from iaas_sglang_tpu.managers.scheduler import run_scheduler_process

    configure_logger(prefix=" dp-ctrl")
    dp = server_args.dp_size
    ctx = mp.get_context("spawn")
    procs = []
    pipes = []
    load_ipc = f"{port_args.scheduler_ipc}_dpload"
    for rank in range(dp):
        worker_args = dataclasses.replace(
            server_args, dp_size=1, dp_rank=rank,
            dp_load_report_ipc=(
                load_ipc if server_args.load_balance_method
                == "shortest_queue" else None))
        wpa = _worker_port_args(port_args, rank)
        r, w = ctx.Pipe(duplex=False)
        p = ctx.Process(
            target=run_scheduler_process,
            args=(worker_args, wpa, w),
            daemon=True,
        )
        p.start()
        procs.append(p)
        pipes.append(r)
    ready = [r.recv() for r in pipes]
    if any(m.get("status") != "ready" for m in ready):
        if pipe_writer is not None:
            pipe_writer.send({"status": "error", "message": str(ready)})
        return
    if pipe_writer is not None:
        pipe_writer.send(ready[0])

    zctx = zmq.Context(2)
    recv = zctx.socket(zmq.PULL)
    recv.bind(port_args.scheduler_ipc)
    load_recv = None
    if server_args.load_balance_method == "shortest_queue":
        load_recv = zctx.socket(zmq.PULL)
        load_recv.bind(load_ipc)
    sends = []
    for rank in range(dp):
        s = zctx.socket(zmq.PUSH)
        s.connect(_worker_port_args(port_args, rank).scheduler_ipc)
        sends.append(s)

    logger.info("dp controller: %d replicas (%s)", dp,
                server_args.load_balance_method)
    rr = 0
    # shortest-queue state: last reported load per replica + local
    # outstanding estimate between reports
    loads = [0] * dp
    pending = [0] * dp

    def drain_load_reports():
        while True:
            try:
                rank, running, waiting = load_recv.recv_pyobj(zmq.NOBLOCK)
            except zmq.Again:
                return
            loads[rank] = running + waiting
            pending[rank] = 0

    while True:
        msg = recv.recv_pyobj()
        if isinstance(msg, (TokenizedGenerateReqInput,
                            TokenizedEmbeddingReqInput, AbortReq)):
            if load_recv is not None and not isinstance(msg, AbortReq):
                # shortest-queue dispatch (data_parallel_controller.py
                # shortest-queue policy): scheduler-reported load + the
                # requests sent since its last report
                drain_load_reports()
                rank = min(range(dp), key=lambda r: loads[r] + pending[r])
                pending[rank] += 1
                sends[rank].send_pyobj(msg)
                continue
            # round-robin dispatch (data_parallel_controller.py:249)
            sends[rr % dp].send_pyobj(msg)
            rr += 1
        else:
            # control messages broadcast; the first reply wins the RPC
            # future in the tokenizer manager
            for s in sends:
                s.send_pyobj(msg)
