"""CLI: python -m iaas_sglang_tpu.launch_server --model-path ...
(analog of sglang python/sglang/launch_server.py)."""

import sys

from iaas_sglang_tpu.entrypoints.http_server import launch_server
from iaas_sglang_tpu.server_args import prepare_server_args
from iaas_sglang_tpu.utils import kill_process_tree

if __name__ == "__main__":
    server_args = prepare_server_args(sys.argv[1:])
    try:
        if server_args.nnodes > 1 and server_args.node_rank > 0:
            # follower hosts run the SPMD replay loop, no HTTP server
            from iaas_sglang_tpu.managers.multihost import run_follower

            run_follower(server_args)
        else:
            launch_server(server_args)
    finally:
        kill_process_tree(include_parent=False)
