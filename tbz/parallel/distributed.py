"""Multi-host bring-up (SURVEY §2.5 obligation; DCN axis of the mesh).

The reference has no inter-process anything; this is the TPU-native
distribution layer: jax.distributed process groups + a global mesh whose
'dp' axis spans hosts (members assigned per host, outputs gathered in
stream order), with checksum combines riding the same collectives as the
single-host path (parallel/shard.py works unchanged on a global mesh —
shard_map + all_gather lower to ICI within a slice and DCN across).

Real multi-host execution needs a pod slice; this harness has one chip,
so the multi-process path is exercised structurally (mesh construction,
spec plumbing) by tests/test_parallel.py on virtual devices, and
entry-point wiring lives here for a real deployment.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up jax.distributed (no-op if single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(dp: int | None = None, sp: int = 1) -> Mesh:
    """Mesh over ALL processes' devices: dp spans hosts (DCN) then chips
    (ICI); sp stays within a host's chips so sequence-parallel gathers
    ride ICI."""
    devs = np.array(jax.devices())
    n = devs.size
    if dp is None:
        dp = n // sp
    assert dp * sp == n
    return Mesh(devs.reshape(dp, sp), ("dp", "sp"))


def assign_members(sizes: list[int], n_shards: int) -> list[list[int]]:
    """Greedy balanced assignment of streams to shards by compressed
    size (longest-processing-time heuristic) — keeps per-host decode
    time even, which is what the >=85% scaling-efficiency target needs."""
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    loads = [0] * n_shards
    out: list[list[int]] = [[] for _ in range(n_shards)]
    for i in order:
        k = loads.index(min(loads))
        out[k].append(i)
        loads[k] += sizes[i]
    return out
