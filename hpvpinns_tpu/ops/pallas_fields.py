"""Pallas TPU kernel: fused MLP + derivative-field propagation.

The derivative-field evaluation (ops/taylor.py) lowers under XLA to a chain
of ~15 small matmuls with elementwise fusions between them; each fusion
boundary costs a kernel dispatch + HBM round trip of the [P, H] hidden state.
This kernel runs the whole Taylor-mode propagation — forward value plus
first/second derivatives along the requested input axes — in ONE Pallas
launch: hidden states live in VMEM registers between layers, matmuls hit the
MXU, activation-derivative chains run on the VPU with no materialization.

A hand-written backward kernel (_fields_bwd_kernel) completes the pair: the
custom VJP of `fields_flat` replays the forward in-kernel and runs the exact
reverse chain in one launch (sin/tanh; other activations fall back to the
XLA VJP).  `pallas_fields_*` is therefore a drop-in differentiable
replacement for `taylor_fields_*`; select with deriv_mode='pallas'.

Measured first, per SURVEY.md §7: see benchmarks/MEASUREMENTS.md for the
XLA-vs-Pallas numbers that motivated keeping the contraction in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpvpinns_tpu.models.mlp import MLP
from hpvpinns_tpu.ops.taylor import act_derivs, act_derivs3, mlp_fields

_PREC = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _act_val_d1_d2(name: str, z):
    if name not in ("sin", "tanh"):
        raise ValueError(
            f"pallas fields kernel supports sin/tanh activations; got {name!r}"
        )
    return act_derivs(name, z)


def _fields_kernel(x_ref, *refs, activation, n_layers, n_dirs, second: bool):
    """One grid block of points: propagate (h, h_k[, h_kk]) through the MLP.

    refs layout: W_0, b_0, ..., W_{L-1}, b_{L-1}, out_ref.
    x_ref: [BP, d_in_padded]; out_ref: [BP, F_padded] where the first
    1 + n_dirs * (2 if second else 1) lanes are u, u_k..., u_kk... .
    """
    out_ref = refs[-1]
    wrefs = refs[:-1]

    h = x_ref[:]
    BP = h.shape[0]
    # Coordinate tangents: column k of the (padded) input is coordinate k.
    lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    hk = [jnp.where(lane == k, 1.0, 0.0).astype(h.dtype) for k in range(n_dirs)]
    hkk = [jnp.zeros_like(h) for k in range(n_dirs)] if second else None

    for l in range(n_layers - 1):
        W = wrefs[2 * l][:]
        b = wrefs[2 * l + 1][:]
        z = jnp.dot(h, W, preferred_element_type=jnp.float32, precision=_PREC) + b
        zk = [jnp.dot(t, W, preferred_element_type=jnp.float32, precision=_PREC) for t in hk]
        a, d1, d2 = _act_val_d1_d2(activation, z)
        if second:
            zkk = [jnp.dot(t, W, preferred_element_type=jnp.float32, precision=_PREC) for t in hkk]
            hkk = [d2 * t * t + d1 * s for t, s in zip(zk, zkk)]
        h = a
        hk = [d1 * t for t in zk]

    # Final layer: only column 0 of the padded [Hp, Hp] weight is real (the
    # network output is scalar), so one lane tile of W_L is enough — halves
    # the final matmul passes for Hp > 128.
    W = wrefs[2 * (n_layers - 1)][:, :128]
    b = wrefs[2 * (n_layers - 1) + 1][:, :128]
    u = jnp.dot(h, W, preferred_element_type=jnp.float32, precision=_PREC) + b
    cols = [u] + [jnp.dot(t, W, preferred_element_type=jnp.float32, precision=_PREC) for t in hk]
    if second:
        cols += [jnp.dot(t, W, preferred_element_type=jnp.float32, precision=_PREC) for t in hkk]

    # Pack every field into ONE lane tile: field f lives at lane f.  Each
    # col is [BP, 128] with its scalar at lane 0 (padding weights/biases
    # are zero), so a lane-reduce extracts it and a lane mask places it —
    # VPU-cheap, and the output block (with its HBM write and the XLA-side
    # gather) shrinks n_fields-fold vs the old tile-per-field layout.
    # Measured NEUTRAL on step time at the W=256 wide point (the kernel is
    # bound by per-block weight re-fetch, not output bandwidth —
    # MEASUREMENTS.md round-4 revisit); kept for the memory win.
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (BP, 128), 1)
    acc = jnp.zeros((BP, 128), jnp.float32)
    for f, c in enumerate(cols):
        v = jnp.sum(c, axis=1, keepdims=True)
        acc = acc + v * jnp.where(lane128 == f, 1.0, 0.0).astype(acc.dtype)
    out_ref[:] = acc.astype(out_ref.dtype)


def _padded_width(spec: MLP) -> int:
    """One uniform lane-tile-padded width for every non-input dimension, so
    hidden states (and the backward kernel's scratch) share a single shape
    regardless of per-layer widths."""
    return _round_up(max(spec.layers[1:]), 128)


def _pad_params(spec: MLP, params, dtype):
    """Pad every layer to [din_p | Hp, Hp] (Hp = _padded_width); zero padding
    keeps the math exact and all kernel matmuls lane-aligned."""
    if spec.adaptive_slope:
        raise ValueError(
            "deriv_mode='pallas' does not support adaptive_slope; use 'taylor'"
        )
    Hp = _padded_width(spec)
    padded = []
    for l, layer in enumerate(params):
        W, b = layer["W"], layer["b"]
        pin = _round_up(W.shape[0], 128) if l == 0 else Hp
        Wp = jnp.zeros((pin, Hp), dtype=dtype).at[: W.shape[0], : W.shape[1]].set(W)
        bp = jnp.zeros((1, Hp), dtype=dtype).at[0, : b.shape[0]].set(b)
        padded.append((Wp, bp))
    return padded


@functools.partial(
    jax.jit, static_argnames=("spec", "n_dirs", "second", "block_points")
)
def _pallas_fields_flat(spec: MLP, params, X, n_dirs: int, second: bool, block_points: int = 1024):
    # 1024-point blocks keep the [BP, n_fields*128] output block + propagated
    # hidden states inside the 16 MB VMEM budget at width-128 layers.
    """u + derivative fields at X [P, d]: returns [P, F] with
    F = 1 + n_dirs * (2 if second else 1) columns (u, firsts..., seconds...)."""
    dtype = X.dtype
    P, d = X.shape
    n_fields = 1 + n_dirs * (2 if second else 1)
    Pp = _round_up(P, block_points)
    din_p = _round_up(d, 128)
    Xp = jnp.zeros((Pp, din_p), dtype=dtype).at[:P, :d].set(X)
    padded = _pad_params(spec, params, dtype)

    Fp = 128  # all fields packed into one lane tile (field f at lane f)
    kernel = functools.partial(
        _fields_kernel,
        activation=spec.activation,
        n_layers=spec.n_layers,
        n_dirs=n_dirs,
        second=second,
    )
    grid = (Pp // block_points,)
    in_specs = [
        pl.BlockSpec((block_points, din_p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    operands = [Xp]
    for W, b in padded:
        in_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        operands += [W, b]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_points, Fp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, Fp), dtype),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(*operands)
    # Fields sit in the first n_fields lanes of the single output tile.
    return out[:P, :n_fields]


def _xla_fields_flat(spec: MLP, params, X, n_dirs: int, second: bool):
    u, firsts, seconds = mlp_fields(spec, params, X, tuple(range(n_dirs)))
    cols = [u] + list(firsts) + (list(seconds) if second else [])
    return jnp.concatenate(cols, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def fields_flat(spec: MLP, params, X, n_dirs: int, second: bool):
    """Differentiable fused fields: Pallas forward, XLA-Taylor backward."""
    return _pallas_fields_flat(spec, params, X, n_dirs, second)


def _fields_fwd(spec, params, X, n_dirs, second):
    return _pallas_fields_flat(spec, params, X, n_dirs, second), (params, X)


def _fields_bwd(spec, n_dirs, second, res, g):
    params, X = res
    if second and spec.activation in ("sin", "tanh"):
        return _pallas_fields_bwd(spec, params, X, g, n_dirs)
    # fallback: VJP of the XLA Taylor path (covers first_y_only layouts)
    _, vjp = jax.vjp(lambda p, x: _xla_fields_flat(spec, p, x, n_dirs, second), params, X)
    return vjp(g)


fields_flat.defvjp(_fields_fwd, _fields_bwd)


def pallas_fields_1d(spec: MLP, params, x):
    """(u, u_x, u_xx) — fused-kernel twin of taylor_fields_1d."""
    shape = x.shape
    out = fields_flat(spec, params, x.reshape(-1, 1), 1, True)
    return out[:, 0].reshape(shape), out[:, 1].reshape(shape), out[:, 2].reshape(shape)


def pallas_fields_2d(
    spec: MLP, params, x, y, *,
    second_y: bool = True, first_y_only: bool = False, firsts_only: bool = False,
):
    """Fused-kernel twin of taylor_fields_2d (same contract).

    The kernel computes seconds per-direction all-or-nothing, so the
    first_y_only contract (u, ux, uxx, uy — the AdvDiff case) also computes
    uyy inside the kernel and drops it (~1/6 extra work; still one launch).
    firsts_only=True runs the kernel with the second-order streams disabled
    entirely ({u, ux, uy} — the var_form-1 mode).
    """
    shape = x.shape
    X = jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
    if firsts_only:
        out = fields_flat(spec, params, X, 2, False)
        r = lambda c: out[:, c].reshape(shape)
        return {"u": r(0), "ux": r(1), "uy": r(2)}
    out = fields_flat(spec, params, X, 2, True)
    r = lambda c: out[:, c].reshape(shape)
    flds = {"u": r(0), "ux": r(1), "uy": r(2), "uxx": r(3)}
    if not first_y_only:
        flds["uyy"] = r(4)
    return flds


# ---------------------------------------------------------------------------
# Hand-written fused backward kernel
# ---------------------------------------------------------------------------
#
# Backward of the Taylor propagation in ONE launch per point block: replays
# the forward (recompute, nothing stashed from the fwd kernel), storing the
# per-layer pre-activations z / tangent pre-activations zk, zkk in VMEM
# scratch, then runs the exact reverse chain.  Weight/bias gradients are
# accumulated across grid steps (the TPU grid is sequential on a core, so
# read-modify-write on the output refs is race-free).
#
# The reverse rules through one hidden layer (a = act(z), hk' = d1 zk,
# hkk' = d2 zk^2 + d1 zkk, with d_i = act^{(i)}(z)):
#   gz    = d1 gh' + sum_d d2 zk_d ghk'_d + sum_d (d3 zk_d^2 + d2 zkk_d) ghkk'_d
#   gzk_d = d1 ghk'_d + 2 d2 zk_d ghkk'_d
#   gzkk_d = d1 ghkk'_d
# then through the linear maps z = h W + b, zk = hk W, zkk = hkk W:
#   gW += h^T gz + sum_d (hk^T gzk_d + hkk^T gzkk_d);  gb += colsum gz
#   gh = gz W^T;  ghk_d = gzk_d W^T;  ghkk_d = gzkk_d W^T





def _fields_bwd_kernel(x_ref, g_ref, *refs, activation, n_layers, n_dirs):
    """refs: W_0..b_{L-1} (inputs), gx_ref, gW_0, gb_0, .., gW_{L-1}, gb_{L-1}
    (outputs), z_s, zk_s, zkk_s (VMEM scratch [Lh(,D), BP, H])."""
    n_in = 2 * n_layers
    wrefs = refs[:n_in]
    gx_ref = refs[n_in]
    grefs = refs[n_in + 1 : n_in + 1 + n_in]
    z_s, zk_s, zkk_s = refs[n_in + 1 + n_in :]
    Lh = n_layers - 1
    i = pl.program_id(0)

    dotT_lhs = lambda A, B: jax.lax.dot_general(  # A^T B: [H, out]
        A, B, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_PREC,
    )
    dotT_rhs = lambda A, W: jax.lax.dot_general(  # A W^T: [BP, H]
        A, W, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_PREC,
    )
    dot = lambda A, W: jnp.dot(A, W, preferred_element_type=jnp.float32, precision=_PREC)

    # ---- forward replay, stashing pre-activations in scratch ----
    h = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    hk = [jnp.where(lane == k, 1.0, 0.0).astype(h.dtype) for k in range(n_dirs)]
    hkk = [jnp.zeros_like(h) for _ in range(n_dirs)]
    for l in range(Lh):
        W, b = wrefs[2 * l][:], wrefs[2 * l + 1][:]
        z = dot(h, W) + b
        zk = [dot(t, W) for t in hk]
        zkk = [dot(t, W) for t in hkk]
        z_s[l] = z
        for d in range(n_dirs):
            zk_s[l, d] = zk[d]
            zkk_s[l, d] = zkk[d]
        a, d1, d2, _ = act_derivs3(activation, z)
        h = a
        hk = [d1 * t for t in zk]
        hkk = [d2 * t * t + d1 * s for t, s in zip(zk, zkk)]

    # ---- final (linear) layer ----
    # g arrives PACKED: one lane tile, cotangent of field f at lane f
    # (the [BP, n_fields*Hp] layout it replaces was the dominant bwd HBM
    # read).  Unpack each field to the [BP, Hp]-with-lane-0 layout the
    # reverse chain expects: lane-reduce to extract, lane-0 mask to place.
    W_L = wrefs[2 * (n_layers - 1)][:]
    Hp = W_L.shape[1]
    gpk = g_ref[:]  # [BP, 128]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, gpk.shape, 1)
    lane0 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (gpk.shape[0], Hp), 1) == 0,
        1.0, 0.0,
    ).astype(gpk.dtype)

    def _unpack(f):
        v = jnp.sum(jnp.where(lane128 == f, gpk, 0.0), axis=1, keepdims=True)
        return v * lane0

    gu = _unpack(0)
    guk = [_unpack(1 + d) for d in range(n_dirs)]
    gukk = [_unpack(1 + n_dirs + d) for d in range(n_dirs)]
    gW_L = dotT_lhs(h, gu)
    for d in range(n_dirs):
        gW_L = gW_L + dotT_lhs(hk[d], guk[d]) + dotT_lhs(hkk[d], gukk[d])
    gb_L = jnp.sum(gu, axis=0, keepdims=True)
    gh = dotT_rhs(gu, W_L)
    ghk = [dotT_rhs(t, W_L) for t in guk]
    ghkk = [dotT_rhs(t, W_L) for t in gukk]

    def accum(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:] = val

        @pl.when(i > 0)
        def _():
            ref[:] = ref[:] + val

    accum(grefs[2 * (n_layers - 1)], gW_L)
    accum(grefs[2 * (n_layers - 1) + 1], gb_L)

    # ---- reverse hidden layers ----
    for l in reversed(range(Lh)):
        z = z_s[l]
        zk = [zk_s[l, d] for d in range(n_dirs)]
        zkk = [zkk_s[l, d] for d in range(n_dirs)]
        _, d1, d2, d3 = act_derivs3(activation, z)
        gz = d1 * gh
        gzk, gzkk = [], []
        for d in range(n_dirs):
            gz = gz + d2 * zk[d] * ghk[d] + (d3 * zk[d] * zk[d] + d2 * zkk[d]) * ghkk[d]
            gzk.append(d1 * ghk[d] + 2.0 * d2 * zk[d] * ghkk[d])
            gzkk.append(d1 * ghkk[d])

        # layer inputs (recomputed from the previous layer's pre-activations)
        if l == 0:
            h_in = x_ref[:]
            hk_in = [jnp.where(lane == k, 1.0, 0.0).astype(h_in.dtype) for k in range(n_dirs)]
            hkk_in = None  # identically zero
        else:
            zp = z_s[l - 1]
            h_in, p1, p2, _ = act_derivs3(activation, zp)
            hk_in = [p1 * zk_s[l - 1, d] for d in range(n_dirs)]
            hkk_in = [
                p2 * zk_s[l - 1, d] * zk_s[l - 1, d] + p1 * zkk_s[l - 1, d]
                for d in range(n_dirs)
            ]

        W = wrefs[2 * l][:]
        gW = dotT_lhs(h_in, gz)
        for d in range(n_dirs):
            gW = gW + dotT_lhs(hk_in[d], gzk[d])
            if hkk_in is not None:
                gW = gW + dotT_lhs(hkk_in[d], gzkk[d])
        gb = jnp.sum(gz, axis=0, keepdims=True)
        accum(grefs[2 * l], gW)
        accum(grefs[2 * l + 1], gb)

        gh = dotT_rhs(gz, W)
        ghk = [dotT_rhs(t, W) for t in gzk]
        ghkk = [dotT_rhs(t, W) for t in gzkk]

    gx_ref[:] = gh  # tangent seeds are constants: no further X cotangent


@functools.partial(jax.jit, static_argnames=("spec", "n_dirs", "block_points"))
def _pallas_fields_bwd(spec: MLP, params, X, g, n_dirs: int, block_points: int = 256):
    # 256-point blocks keep the (1+2D)*Lh scratch stack + IO double buffers
    # inside the 16 MB VMEM budget at width-128 layers.
    """(gparams, gX) for cotangent g [P, n_fields] of _pallas_fields_flat
    (second=True layout)."""
    dtype = X.dtype
    P, d = X.shape
    n_fields = 1 + 2 * n_dirs
    Pp = _round_up(P, block_points)
    din_p = _round_up(d, 128)
    Xp = jnp.zeros((Pp, din_p), dtype=dtype).at[:P, :d].set(X)
    Gp = jnp.zeros((Pp, 128), dtype=dtype).at[:P, :n_fields].set(g)
    padded = _pad_params(spec, params, dtype)

    kernel = functools.partial(
        _fields_bwd_kernel,
        activation=spec.activation,
        n_layers=spec.n_layers,
        n_dirs=n_dirs,
    )
    grid = (Pp // block_points,)
    in_specs = [
        pl.BlockSpec((block_points, din_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_points, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [Xp, Gp]
    for W, b in padded:
        in_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        operands += [W, b]

    out_shape = [jax.ShapeDtypeStruct((Pp, din_p), dtype)]
    out_specs = [pl.BlockSpec((block_points, din_p), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for W, b in padded:
        out_shape.append(jax.ShapeDtypeStruct(W.shape, dtype))
        out_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(b.shape, dtype))
        out_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    Lh = spec.n_layers - 1
    H = _padded_width(spec)  # uniform padded width of every hidden state
    scratch = [
        pltpu.VMEM((max(Lh, 1), block_points, H), jnp.float32),
        pltpu.VMEM((max(Lh, 1), n_dirs, block_points, H), jnp.float32),
        pltpu.VMEM((max(Lh, 1), n_dirs, block_points, H), jnp.float32),
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=jax.default_backend() != "tpu",
    )(*operands)

    gX = outs[0][:P, :d]
    gparams = []
    for l, layer in enumerate(params):
        gW = outs[1 + 2 * l][: layer["W"].shape[0], : layer["W"].shape[1]]
        gb = outs[2 + 2 * l][0, : layer["b"].shape[0]]
        gparams.append({"W": gW, "b": gb})
    return gparams, gX


def pallas_fields_3d(spec: MLP, params, x, y, z, *, second: bool = True):
    """Fused-kernel twin of taylor_fields_3d (the kernels are
    direction-generic; n_dirs=3 gives 7 field columns)."""
    shape = x.shape
    X = jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)
    out = fields_flat(spec, params, X, 3, second)
    r = lambda c: out[:, c].reshape(shape)
    flds = {"u": r(0), "ux": r(1), "uy": r(2), "uz": r(3)}
    if second:
        flds.update({"uxx": r(4), "uyy": r(5), "uzz": r(6)})
    return flds
