"""Subprocess worker for the multi-host SERVING e2e test — not a pytest
module.

Boots the real CLI path (``main.main``) as one host of a 2-process
cluster: ``--coordinator`` + ``--num-processes``/``--process-id`` +
``--mesh 2x4`` over CPU gloo, ``--simulate`` world (tiny in-memory
synthetic corpus, hash embeddings — the reference's --simulate mode).
Process 0 serves HTTP; process 1 follows the lockstep broadcast feed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid = sys.argv[1]
    nproc = sys.argv[2]
    coord_port = sys.argv[3]
    http_port = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import main as cli

    cli.main([
        "--dataset", "medrag", "--simulate", "--disable-llm",
        "--mesh", "2x4", "--buckets", "8",
        "--coordinator", f"localhost:{coord_port}",
        "--num-processes", nproc, "--process-id", pid,
        "--port", http_port,
    ])
    return 0


if __name__ == "__main__":
    sys.exit(main())
