"""Packed host<->device transfers.

The TPU can sit behind a network tunnel (axon), where every individual
``jnp.asarray`` / ``np.asarray(device_array)`` is a round trip measured in
tens of milliseconds.  A batched super-step that moves a node batch, a
warm-start state (~19 pytree leaves), and an output dict (~14 entries)
leaf-by-leaf spends more wall-clock on transfer latency than on the solve
itself (measured ~1.1 s of a 2.3 s device phase on the rank-1 50x50 root).

``put_packed`` concatenates same-dtype host arrays into ONE flat buffer,
ships it in a single transfer, and splits/reshapes on device inside a
cached jitted unpacker (pure metadata ops, fused by XLA).  ``get_all``
fetches a pytree with one synchronisation (``jax.device_get`` issues all
copies before waiting).

The reference has no analogue — its solver state lives inside Mosek's
process memory (`/root/reference/src/OptimalMatrixCompletion.jl:1482`).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=256)
def _unpacker(shapes: tuple, dtype_str: str):
    sizes = [int(np.prod(s)) for s in shapes]
    offs = np.cumsum([0] + sizes)

    def unpack(flat):
        return [
            jax.lax.dynamic_slice_in_dim(flat, int(offs[i]), sizes[i]).reshape(
                shapes[i]
            )
            for i in range(len(shapes))
        ]

    return jax.jit(unpack)


def put_packed(arrays: Sequence[np.ndarray], dtype) -> List[jnp.ndarray]:
    """Transfer a list of host arrays to device in ONE copy.

    Returns device arrays with the original shapes, cast to ``dtype``.
    """
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    shapes = tuple(tuple(a.shape) for a in arrays)
    flat = np.concatenate(
        [np.ascontiguousarray(a, dtype=np_dtype).ravel() for a in arrays]
    )
    return _unpacker(shapes, np_dtype.name)(jnp.asarray(flat))


def get_all(tree):
    """Fetch a device pytree to host numpy with one synchronisation."""
    leaves, treedef = jax.tree.flatten(tree)
    host = jax.device_get(leaves)
    return jax.tree.unflatten(treedef, [np.asarray(x) for x in host])
