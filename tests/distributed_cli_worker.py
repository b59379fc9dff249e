"""Worker for the multi-host CLI test: runs a real CLI main under
jax.distributed (CPU, 1 device per process).

Usage: python distributed_cli_worker.py <cli> <pid> <nprocs> <port> <args...>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLI = sys.argv[1]
PID = sys.argv[2]
NPROCS = sys.argv[3]
PORT = sys.argv[4]
REST = sys.argv[5:]

os.environ["SIGALIGN_COORDINATOR"] = f"localhost:{PORT}"
os.environ["SIGALIGN_NUM_PROCS"] = NPROCS
os.environ["SIGALIGN_PROC_ID"] = PID

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    if CLI == "signal_align":
        from cpecan_signal_tpu.cli.signal_align import main as cli_main
    elif CLI == "train_models":
        from cpecan_signal_tpu.cli.train_models import main as cli_main
    elif CLI == "em":
        from cpecan_signal_tpu.cli.em import main as cli_main
    else:
        raise SystemExit(f"unknown cli {CLI}")
    return cli_main(REST)


if __name__ == "__main__":
    sys.exit(main())
