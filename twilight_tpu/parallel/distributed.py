"""Multi-host execution: dispatch divide-and-conquer subtrees across hosts.

The reference processes subtrees SEQUENTIALLY in one process
(/root/reference/src/twilight-main.cpp:139-176) and merges through temp
files + `cat` (io.cpp:465-488). On a TPU pod slice each host owns local
chips, so the natural upgrade is: partition the guide tree once
(deterministic on every host), round-robin subtrees to hosts by leaf-count
(largest first), run each host's subtrees on its local chips, then exchange
subtree-root profiles and lengths via a `jax.distributed` all-gather (or the
shared-filesystem checkpoint files when no distributed runtime is up —
the same .state.npz files --resume uses), and let host 0 run the merge pass
and write the final MSA.

Usage (one command per host):
    python -m twilight_tpu ... --hosts N --host-id I [-d shared_tmp]
With jax.distributed initialized (JAX_COORDINATOR_ADDRESS etc.), N/I default
to the process count/index.
"""
from __future__ import annotations

import os
import time
from typing import List, Sequence, Tuple


def assign_subtrees(sizes: Sequence[Tuple[str, int]], n_hosts: int
                    ) -> List[List[str]]:
    """Greedy balanced assignment: sort subtrees by leaf count descending,
    give each to the currently least-loaded host. Deterministic (ties break
    by subtree name) so every host computes the same assignment without
    communication."""
    order = sorted(sizes, key=lambda kv: (-kv[1], kv[0]))
    loads = [0] * n_hosts
    out: List[List[str]] = [[] for _ in range(n_hosts)]
    for name, cnt in order:
        h = min(range(n_hosts), key=lambda i: (loads[i], i))
        out[h].append(name)
        loads[h] += cnt
    return out


def detect_topology(args_hosts: int = 0, args_host_id: int = -1
                    ) -> Tuple[int, int]:
    """(n_hosts, host_id) from flags, else jax.distributed, else (1, 0)."""
    if args_hosts > 0:
        hid = args_host_id if args_host_id >= 0 else 0
        return args_hosts, hid
    try:
        import jax
        if jax.process_count() > 1:
            return jax.process_count(), jax.process_index()
    except Exception:
        pass
    return 1, 0


def exchange_subtree_states(option, subtree_ids: Sequence[int],
                            timeout_s: float = 3600.0) -> None:
    """Barrier until every subtree's checkpoint exists in the shared temp
    dir. The .state.npz + subalignment files written per subtree ARE the
    exchanged payload (shared-FS collective); when a real jax.distributed
    runtime is up, the barrier itself rides a tiny psum so hosts don't spin
    on NFS metadata."""
    try:
        import jax
        import jax.numpy as jnp
        if jax.process_count() > 1:
            # cheap synchronization: all-reduce a unit so no host races
            # ahead of the slowest writer before checking files
            jax.block_until_ready(
                jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
                    jnp.ones((jax.local_device_count(),))))
    except Exception:
        pass
    deadline = time.time() + timeout_s
    missing = list(subtree_ids)
    while missing:
        missing = [
            s for s in missing
            if not (os.path.exists(os.path.join(
                option.temp_dir, f"subtree-{s}.state.npz")))]
        if not missing:
            break
        if time.time() > deadline:
            raise TimeoutError(
                f"subtree checkpoints never appeared: {missing}")
        time.sleep(1.0)
