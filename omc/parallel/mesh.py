"""Multi-chip frontier parallelism.

The reference has no distribution at all (SURVEY.md section 2: Mosek pinned
to one thread, a serial node loop).  The TPU design scales by sharding the
*node batch* over a ``jax.sharding.Mesh`` axis ``"nodes"`` with
``shard_map``: every device relaxes its shard of the frontier with the same
batched ADMM program, evaluates safe dual bounds locally, and the global
bound state (minimum frontier LB, best incumbent value) is synchronised
with single-scalar collectives (``pmin``) over ICI.  Problem data (A, the
observation mask) is replicated — it is tiny compared to per-node state.

This gives the BASELINE.md config-4/5 shape: thousands of simultaneous
node relaxations per chip, frontier sharded across chips, psum/pmin bound
synchronisation.  Host-side frontier management stays global (one host
feeds the mesh); multi-host process sharding reuses the same program via
``jax.distributed`` + global device arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omc.sdp.relax import NodeBatch


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("nodes",))


def _shard_map():
    try:
        return jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map

        return shard_map


def shard_solver(mesh: Mesh, solve, extra_sharded: int = 0):
    """Wrap an *unjitted* batched node solver
    ``solve(A, mask, batch, ub_bar, state, n_iters, ...) -> (state, out)``
    so the node axis of ``batch``/``state``/``out`` is sharded over the
    mesh's ``"nodes"`` axis while problem data stays replicated.  The
    wrapped function has the same signature as the single-device solver,
    so the B&B driver is mesh-agnostic.  ``extra_sharded`` appends that
    many additional node-axis-sharded (B,) arguments (the ADMM solver's
    per-slot bound ``target`` and portfolio ``group``)."""
    rep = P()
    sh = P("nodes")
    step = _shard_map()(
        solve, mesh=mesh,
        in_specs=(rep, rep, sh, rep, sh, rep) + (sh,) * extra_sharded,
        out_specs=(sh, sh),
    )
    return jax.jit(step)


def shard_solver_shor(mesh: Mesh, solve):
    """Like ``shard_solver`` for the Shor solver family signature
    ``solve(A, mask, batch, shor_batch, ub_bar, state, n_iters)`` — the
    Shor constraint tables shard over the node axis alongside the batch."""
    rep = P()
    sh = P("nodes")
    step = _shard_map()(
        solve, mesh=mesh,
        in_specs=(rep, rep, sh, sh, rep, sh, rep, sh, sh),
        out_specs=(sh, sh),
    )
    return jax.jit(step)


def node_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("nodes"))


def put_sharded(mesh: Mesh, tree):
    """Place a host-built pytree with the leading node axis sharded."""
    sh = node_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(mesh: Mesh, batch: NodeBatch, state):
    """Place a host-built batch/state with the node axis sharded."""
    sh = NamedSharding(mesh, P("nodes"))
    put = lambda x: jax.device_put(x, sh)
    return (
        NodeBatch(*[put(x) for x in batch]),
        jax.tree.map(put, state),
    )
