"""Multi-chip parallelism over the hp-decomposition's element axis.

The reference is single-process CPU (sessions pinned at Poisson-1D.py:105);
its *semantic* parallel axis is the element sum of the variational loss
(Poisson-1D.py:64-96): elements couple only through the shared MLP weights and
the summed loss.  That axis maps onto a TPU mesh:

  * element-indexed arrays (everything in `data["elements"]`, leading axis E)
    are laid out with `NamedSharding(mesh, P("elements"))`;
  * parameters and basis tensors are replicated (`P()`) — the networks are
    tiny ([2,5,5,5,1] .. [1,20x4,1]), so no parameter sharding is warranted;
  * the only communication the math needs is the all-reduce of per-element
    loss/grad contributions, which XLA inserts automatically for the GSPMD
    path (jit over sharded operands) or which `psum` provides explicitly in
    the `shard_map` path.  Either way it rides ICI.

Both paths are provided: GSPMD (annotate + let XLA partition — the default
used by the trainer) and an explicit `shard_map` formulation (manual control,
used by tests and the multichip dry run to prove the collective layout).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "elements"


def element_mesh(devices: Optional[Sequence] = None, axis_name: str = AXIS) -> Mesh:
    """1D device mesh over the element axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _pad_leading(arr: jax.Array, pad: int, *, zero: bool) -> jax.Array:
    """Pad axis 0 by `pad` rows; edge-replicate (safe network inputs) or zero."""
    if pad == 0:
        return arr
    mode = "constant" if zero else "edge"
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jax.numpy.asarray(np.pad(np.asarray(arr), widths, mode=mode))


def pad_elements(elems, multiple: int):
    """Pad an Elements1D/2D batch so E divides the mesh size.

    Padded elements are inert: mask = 0 and f_proj = 0 (their residual
    contributes exactly zero to the loss), n_test = 1 (no division by zero),
    geometry edge-replicated (network evaluations stay finite).
    """
    E = elems.mask.shape[0]
    pad = (-E) % multiple
    if pad == 0:
        return elems
    fields = {}
    for f in dataclasses.fields(elems):
        arr = getattr(elems, f.name)
        if f.name in ("mask", "f_proj"):
            fields[f.name] = _pad_leading(arr, pad, zero=True)
        elif f.name == "n_test":
            fields[f.name] = _pad_leading(jax.numpy.maximum(arr, 1), pad, zero=False)
        else:
            fields[f.name] = _pad_leading(arr, pad, zero=False)
    return type(elems)(**fields)


def shard_problem(data: dict, mesh: Mesh, axis_name: str = AXIS) -> dict:
    """Lay out a problem's data pytree on the mesh: element arrays split on
    axis 0, everything else replicated.  Pads the element batch as needed."""
    elem_sharding = NamedSharding(mesh, P(axis_name))
    rep_sharding = NamedSharding(mesh, P())
    out = {}
    for key, value in data.items():
        if key == "elements":
            value = pad_elements(value, mesh.size)
            out[key] = jax.device_put(value, elem_sharding)
        else:
            out[key] = jax.device_put(value, rep_sharding)
    return out


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (parameters, optimizer state) across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_map_loss(loss_fn, data: dict, mesh: Mesh, axis_name: str = AXIS):
    """Explicit shard_map formulation of a problem loss.

    `loss_fn` must accept `axis_name=` and psum its element-sum terms over it
    (all problem losses in problems/ do).  Returns a (params, data) -> (loss,
    aux) function where every output is replicated — differentiable through
    shard_map, so jax.grad of it yields replicated gradients.
    """

    def spec_like(key, value):
        part = P(axis_name) if key == "elements" else P()
        return jax.tree.map(lambda _: part, value)

    data_specs = {k: spec_like(k, v) for k, v in data.items()}
    params_spec = None  # filled per call (params structure varies by problem)

    def wrapped(params, data):
        pspec = jax.tree.map(lambda _: P(), params)

        def local(params, data):
            return loss_fn(params, data, axis_name=axis_name)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(pspec, data_specs),
            out_specs=(P(), jax.tree.map(lambda _: P(), _aux_structure(loss_fn, params, data))),
            check_vma=False,
        )(params, data)

    return wrapped


def _aux_structure(loss_fn, params, data):
    """Aux pytree structure via abstract evaluation (no FLOPs)."""
    return jax.eval_shape(lambda p, d: loss_fn(p, d)[1], params, data)
