"""Kernel-mesh context: compose Pallas kernels with GSPMD device meshes.

A Pallas ``pallas_call`` lowers to a TPU custom call that carries no
GSPMD partitioning rule, so when its operands are sharded over a mesh
the partitioner must all-gather them and run the kernel on the GLOBAL
batch on every core — silently throwing away the data parallelism the
rest of the step enjoys.  (The reference has no analogue of this
problem: it is single-device CUDA, reference: train.py:302-308.)

The fix is the standard JAX one: wrap the kernel invocation in
``jax.shard_map`` over the mesh's ``data`` axis so each core runs the
kernel on its LOCAL batch shard.  Because every Pallas call in this
package lives inside a ``custom_vjp`` forward (the backward is plain
jnp that GSPMD partitions by itself), wrapping just the kernel
invocation makes the whole training/inference step mesh-composable
without touching autodiff.

Mesh discovery: sharding here is GSPMD-style (``NamedSharding`` +
``jit``), so there is no ambient mesh inside a trace.  Mesh users
(train/loop.py, infer/sharded.py, the dryrun entry) register the mesh
with ``set_kernel_mesh`` before building their jitted step functions;
kernel wrappers read it at trace time via ``shard_over_batch``.  The
registration is deliberately process-global trace-time state — step
functions are built fresh after the mesh exists, so no jit cache can
span a context change (tests use the ``kernel_mesh`` scope and fresh
closures).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

_MESH: Optional[Mesh] = None
_AXIS: str = "data"


def set_kernel_mesh(mesh: Optional[Mesh], axis: str = "data"):
    """Register (or clear, with ``None``) the mesh Pallas kernels shard
    over.  Returns the previous ``(mesh, axis)`` for restoration."""
    global _MESH, _AXIS
    prev = (_MESH, _AXIS)
    if mesh is not None and axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
    _MESH, _AXIS = mesh, axis
    return prev


def get_kernel_mesh() -> Tuple[Optional[Mesh], str]:
    return _MESH, _AXIS


@contextlib.contextmanager
def kernel_mesh(mesh: Optional[Mesh], axis: str = "data"):
    prev = set_kernel_mesh(mesh, axis)
    try:
        yield
    finally:
        set_kernel_mesh(*prev)


def data_axis_size() -> int:
    """Width of the registered data axis (1 when no mesh is registered)."""
    return 1 if _MESH is None else _MESH.shape[_AXIS]


def mesh_is_data_only() -> bool:
    """True when no mesh is registered or every non-``data`` axis is
    trivial — i.e. model weights are replicated, so kernels that hold
    weights VMEM-resident (the decoder megakernels) may run per-shard."""
    return _MESH is None or _MESH.size == _MESH.shape[_AXIS]


def shard_over_batch(fn: Callable, in_batch_dims: Sequence[Optional[int]],
                     out_batch_dims: Sequence[Optional[int]],
                     reduce_out: Sequence[int] = ()) -> Callable:
    """Shard ``fn`` over the registered mesh's data axis, if any.

    ``in_batch_dims`` / ``out_batch_dims`` give, per positional arg /
    output, the index of its batch dimension (``None`` = replicated).
    Outputs listed in ``reduce_out`` are batch-REDUCED inside the kernel
    (per-shard partial sums); they are ``psum``-ed over the data axis and
    must carry ``None`` in ``out_batch_dims``.

    Returns ``fn`` unchanged when no mesh is registered or the data axis
    is trivial; otherwise a wrapper that falls back to the unwrapped call
    (GSPMD replication — correct, just slower) when a batch dim does not
    divide over the axis.
    """
    mesh, axis = get_kernel_mesh()
    if mesh is None or mesh.shape[axis] <= 1:
        return fn
    n = mesh.shape[axis]

    def spec(d: Optional[int]) -> P:
        return P() if d is None else P(*([None] * d + [axis]))

    if reduce_out:
        def body(*args):
            outs = fn(*args)
            outs = list(outs) if isinstance(outs, tuple) else [outs]
            for i in reduce_out:
                outs[i] = jax.lax.psum(outs[i], axis)
            return tuple(outs)
    else:
        body = fn

    smapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=tuple(spec(d) for d in in_batch_dims),
        out_specs=tuple(spec(d) for d in out_batch_dims),
        check_vma=False)

    def wrapped(*args):
        for a, d in zip(args, in_batch_dims):
            if d is not None and a.shape[d] % n != 0:
                return fn(*args)
        return smapped(*args)

    return wrapped
