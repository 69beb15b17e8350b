"""Per-process entry for the real two-process jax.distributed test.

Each test subprocess runs this with a distinct process id; the two
processes form a gloo-backed CPU collective group, split the
divide-and-conquer subtrees between them, all-gather root states over the
network (parallel/distributed.py:exchange_subtree_states_collective), and
host 0 merges + writes the final MSA. Invoked by
test_distributed.py::test_two_process_jax_distributed.

Usage: python dist_runner.py PORT PROCESS_ID OUT_FILE TEMP_DIR
"""
import sys

import jax

# the axon sitecustomize force-sets JAX_PLATFORMS; pin through the config
# API (see conftest.py)
jax.config.update("jax_platforms", "cpu")


def main() -> int:
    port, pid, out, temp = sys.argv[1:5]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=int(pid))
    from twilight_tpu import cli
    return cli.main(["-t", "/root/reference/dataset/RNASim.nwk",
                     "-i", "/root/reference/dataset/RNASim.fa",
                     "-m", "200", "-d", temp, "-k", "--backend", "native",
                     "--overwrite", "-o", out])


if __name__ == "__main__":
    sys.exit(main())
