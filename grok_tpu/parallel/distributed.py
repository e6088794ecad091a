"""Multi-host (DCN) batch sharding.

Parity: SURVEY.md §2.3 "Distributed backend" — the reference is single-
node (pthreads), and the codec's units of work (images, tiles) are
embarrassingly parallel, so the TPU-native multi-host story is DATA
sharding over DCN, not collectives: each host of a jax.distributed job
takes a deterministic slice of the work list and runs the ordinary
single-host pipeline (whose tile batches shard over the host's local
chips via the dp mesh, parallel/mesh.py).  Collectives never cross DCN.

Two entry styles:

- explicit: ``shard_batch(items, num_hosts, host_id)`` — usable from any
  launcher (mpirun, k8s indexed jobs, SLURM) without initializing JAX
  distributed;
- jax-managed: ``init_distributed(...)`` wraps
  ``jax.distributed.initialize`` and ``auto_shard(items)`` then slices
  by ``jax.process_index()/process_count()``.

The interleaved (round-robin) assignment keeps per-host work balanced
when file sizes correlate with directory order.
"""

from __future__ import annotations

import logging

log = logging.getLogger("grok_tpu")


def shard_batch(items: list, num_hosts: int, host_id: int) -> list:
    """Deterministic, disjoint, complete partition of a work list:
    host k takes items k, k+N, k+2N, ...  (round-robin)."""
    if num_hosts < 1:
        raise ValueError("num_hosts must be >= 1")
    if not 0 <= host_id < num_hosts:
        raise ValueError(f"host_id {host_id} not in [0, {num_hosts})")
    return list(items[host_id::num_hosts])


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed (multi-host DCN job) and return
    (process_index, process_count).  With no arguments, relies on the
    cluster environment (TPU pod metadata / SLURM / OMPI env vars) the
    way jax.distributed.initialize does.  Degenerates to (0, 1) when the
    runtime has no distributed support or is already single-process."""
    import jax

    try:
        if coordinator_address is not None or num_processes is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        elif jax.process_count() == 1:
            # nothing to initialize in a single-process run
            return 0, 1
    except (RuntimeError, ValueError) as e:
        log.warning("jax.distributed unavailable (%s); single-host", e)
        return 0, 1
    return jax.process_index(), jax.process_count()


def auto_shard(items: list) -> list:
    """This process's slice of a work list under an (optionally)
    initialized jax.distributed job; the full list in single-process
    runs."""
    import jax

    return shard_batch(items, jax.process_count(), jax.process_index())
