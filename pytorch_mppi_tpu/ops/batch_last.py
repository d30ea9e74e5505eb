"""Batch-axis-last jaxpr evaluation for K-on-lanes Pallas kernels.

The round-2 kernel study (docs/DESIGN.md §6) found exactly one Pallas design
within reach of XLA on this problem class: the **transposed layout**, where the
sample axis K rides the TPU LANE dimension — noise ``(D, block_k)``, state
``(nx, block_k)`` — so every elementwise pass is lane-dense and the weighted
update is a full-contraction MXU matvec.  The round-2 kernel was hard-coded to
linear dynamics; generalizing it to *arbitrary traceable user dynamics/costs*
requires evaluating user code whose convention is batch-FIRST ``(batch, nx)``
on arrays stored batch-LAST ``(nx, batch)`` — without materializing transposes
inside the kernel (a (block_k, nx) <-> (nx, block_k) relayout per timestep is
precisely the sublane/lane swap that made the round-1 kernels 10x slower).

This module is that transform: a mini-interpreter over the traced jaxpr that
re-derives each equation in the transposed layout.  Each intermediate value
carries its original batch-dimension index ``bdim`` (or None); a batched array
of original shape ``s`` with batch at ``bdim`` is stored with the batch axis
moved LAST and all other axes in original order.  Equations with no batched
inputs evaluate unchanged (this covers all closure-constant subgraphs for
free); batched equations are remapped per primitive — elementwise ops pass
through, dimension indices remap around the moved axis, ``x @ W`` becomes a
swapped-operand contraction against the stored array (so the result lands
batch-last with no transpose), reductions/broadcasts re-target their axes.
Unsupported primitives raise :class:`UnsupportedPrimitive`; callers probe
support at build time with :func:`supports_batch_last` (via
``jax.eval_shape``, no kernel compile needed) and fall back to the scan path.

The supported set covers the dynamics/cost vocabulary of this problem class:
arithmetic, transcendentals, comparisons/select/clamp/where, feature-axis
reductions, ``dot_general`` (batched @ constant, constant @ batched, and the
per-sample contractions einsum quadratic forms lower to), broadcast/reshape/
slice/concatenate/pad/squeeze on feature axes, and inlining of ``jit``/
``pjit``/``custom_jvp`` sub-jaxprs (jnp ops frequently emit these).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


class UnsupportedPrimitive(Exception):
    """Raised when a traced user function uses an operation this transform
    cannot re-derive in batch-axis-last layout (caller falls back to XLA)."""


# elementwise primitives: evaluate unchanged (scalar operands broadcast the
# same way in either layout; same-shape operands are all-batched together)
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "rem", "pow", "atan2", "max", "min",
    "nextafter", "integer_pow", "neg", "sign", "abs", "floor", "ceil",
    "round", "exp", "exp2", "expm1", "log", "log2", "log1p", "sqrt", "rsqrt",
    "cbrt", "square", "sin", "cos", "tan", "asin", "acos", "atan", "sinh",
    "cosh", "tanh", "asinh", "acosh", "atanh", "logistic", "erf", "erfc",
    "erf_inv", "is_finite", "eq", "ne", "lt", "le", "gt", "ge", "and", "or",
    "xor", "not", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "select_n", "clamp", "convert_element_type",
    "stop_gradient", "reduce_precision", "copy",
}

_REDUCE = {"reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
           "reduce_and", "reduce_or"}

_CALL_PRIMS = {"jit", "pjit", "closed_call", "custom_jvp_call",
               "custom_vjp_call", "custom_vjp_call_jaxpr", "remat",
               "checkpoint"}


def _is_literal(v):
    return type(v).__name__ == "Literal"


def _inner_jaxpr(eqn):
    """Return (jaxpr, consts) of a call primitive's body, handling both
    ClosedJaxpr params (jit/pjit, custom_jvp) and open Jaxpr params (remat)."""
    for name in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        cj = eqn.params.get(name)
        if cj is not None:
            if hasattr(cj, "consts"):
                return cj.jaxpr, cj.consts
            return cj, []
    raise UnsupportedPrimitive(
        f"call primitive {eqn.primitive.name} with no inner jaxpr"
    )


def _smap(d: int, p: int) -> int:
    """Stored index of original non-batch dim ``d`` for batch at ``p``."""
    return d if d < p else d - 1


def _stored_shape(orig_shape, p):
    return tuple(s for i, s in enumerate(orig_shape) if i != p) + (orig_shape[p],)


def eval_jaxpr_batch_last(jaxpr, consts, args, batched: Sequence[bool],
                          batch_size: int):
    """Evaluate ``jaxpr`` with the given inputs, where ``args[i]`` for
    ``batched[i]`` is stored batch-LAST: original shape ``(B, *rest)`` passed
    as ``(*rest, B)``.  Returns the outputs; outputs whose original value is
    batched come back in batch-last layout.  ``consts`` are the (unbatched)
    jaxpr constants.

    Works on concrete arrays (inside a Pallas kernel body or plain jnp) and
    on abstract values under ``jax.eval_shape`` (build-time support probe).
    """
    outs, _ = _eval(jaxpr, consts, args,
                    [0 if b else None for b in batched], batch_size)
    return outs


def _eval(jaxpr, consts, args, bdims, B):
    """Core evaluator; ``bdims[i]`` is the ORIGINAL batch-axis index of
    ``args[i]`` (None = unbatched).  Returns (out_vals, out_bdims)."""
    env = {}

    def read(v):
        if _is_literal(v):
            return v.val, None
        return env[v]

    def write(v, val, p):
        env[v] = (val, p)

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c, None)
    if len(jaxpr.invars) != len(args):
        raise ValueError("arg count mismatch")
    for v, a, p in zip(jaxpr.invars, args, bdims):
        write(v, a, p)

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        invals = [read(v) for v in eqn.invars]
        bps = [p for _, p in invals]
        anybatch = any(p is not None for p in bps)

        if name in _CALL_PRIMS:
            ij, iconsts = _inner_jaxpr(eqn)
            outs, obd = _eval(ij, iconsts, [v for v, _ in invals], bps, B)
            for ov, o, p in zip(eqn.outvars, outs, obd):
                write(ov, o, p)
            continue

        if not anybatch:
            # batch introduced purely by shape: broadcast of an unbatched
            # value up to a batch-sized axis (jnp.broadcast_to/zeros patterns
            # with a concrete batch size)
            if name == "broadcast_in_dim":
                out, p = _broadcast_batch_last(invals[0], eqn.params, B)
                write(eqn.outvars[0], out, p)
                continue
            if name == "iota" and B in eqn.params.get("shape", ()):
                raise UnsupportedPrimitive("iota with a batch-sized axis")
            out = eqn.primitive.bind(*[v for v, _ in invals], **eqn.params)
            outs = out if eqn.primitive.multiple_results else [out]
            for ov, o in zip(eqn.outvars, outs):
                write(ov, o, None)
            continue

        # ---- at least one batched input ---------------------------------
        ps = {p for p in bps if p is not None}
        if len(ps) > 1 and name not in ("dot_general",):
            raise UnsupportedPrimitive(
                f"{name}: operands with different batch-axis positions"
            )
        p = next(iter(ps))

        if name in _ELEMENTWISE:
            ops = []
            for v, b in invals:
                if b is not None or jnp.ndim(v) == 0:
                    ops.append(v)
                elif jnp.shape(v)[p] == 1:
                    # rank-aligned unbatched operand with a size-1 slot at
                    # the batch axis: lax binary ops broadcast size-1 dims
                    # implicitly — move the slot to the stored batch position
                    sh = jnp.shape(v)
                    ops.append(lax.reshape(v, sh[:p] + sh[p + 1:] + (1,)))
                else:
                    raise UnsupportedPrimitive(
                        f"{name}: non-scalar unbatched operand mixed with "
                        f"batched operands"
                    )
            out = eqn.primitive.bind(*ops, **eqn.params)
            write(eqn.outvars[0], out, p)

        elif name in _REDUCE:
            (opnd, _), = invals
            axes = eqn.params["axes"]
            if p in axes:
                raise UnsupportedPrimitive(f"{name} over the batch axis")
            new_axes = tuple(sorted(_smap(a, p) for a in axes))
            out = eqn.primitive.bind(opnd, **{**eqn.params, "axes": new_axes})
            # batch position shifts down by the number of reduced axes below it
            write(eqn.outvars[0], out, p - sum(1 for a in axes if a < p))

        elif name == "broadcast_in_dim":
            (opnd, _), = invals
            shape = eqn.params["shape"]
            dims = eqn.params["broadcast_dimensions"]
            # operand batched at p; its batch must map to an output dim of
            # size B (broadcasting the batch axis itself is not meaningful)
            q = dims[p]
            if shape[q] != opnd.shape[-1]:
                raise UnsupportedPrimitive("broadcast resizing the batch axis")
            new_shape = tuple(s for i, s in enumerate(shape) if i != q) + (shape[q],)
            nd = len(new_shape)
            new_dims = tuple(
                _smap(dims[j], q) for j in range(len(dims)) if j != p
            ) + (nd - 1,)
            out = lax.broadcast_in_dim(opnd, new_shape, new_dims)
            write(eqn.outvars[0], out, q)

        elif name == "dot_general":
            out, q = _dot_general_batch_last(invals, eqn.params)
            write(eqn.outvars[0], out, q)

        elif name == "transpose":
            (opnd, _), = invals
            perm = eqn.params["permutation"]
            q = perm.index(p)  # batch position in the output
            new_perm = tuple(
                _smap(perm[i], p) for i in range(len(perm)) if i != q
            ) + (len(perm) - 1,)
            write(eqn.outvars[0], lax.transpose(opnd, new_perm), q)

        elif name == "reshape":
            (opnd, _), = invals
            new_sizes = eqn.params["new_sizes"]
            if eqn.params.get("dimensions") is not None:
                raise UnsupportedPrimitive("reshape with dimension permutation")
            # supported iff the batch axis is an edge axis that stays put:
            # leading batch (regroup trailing feature dims) or trailing batch
            # (regroup leading feature dims) — both are exact C-order
            # regroupings of the stored (features..., B) array
            orig_shape = tuple(opnd.shape[:-1])
            if p == 0 and new_sizes and new_sizes[0] == B:
                out = lax.reshape(opnd, tuple(new_sizes[1:]) + (B,))
                write(eqn.outvars[0], out, 0)
            elif (p == len(orig_shape) and new_sizes
                  and new_sizes[-1] == B):
                out = lax.reshape(opnd, tuple(new_sizes[:-1]) + (B,))
                write(eqn.outvars[0], out, len(new_sizes) - 1)
            else:
                raise UnsupportedPrimitive(
                    "reshape merging the batch axis into features"
                )

        elif name == "squeeze":
            (opnd, _), = invals
            dims = eqn.params["dimensions"]
            if p in dims:
                raise UnsupportedPrimitive("squeeze of the batch axis")
            out = lax.squeeze(opnd, tuple(sorted(_smap(d, p) for d in dims)))
            write(eqn.outvars[0], out, p - sum(1 for d in dims if d < p))

        elif name == "slice":
            (opnd, _), = invals
            st = list(eqn.params["start_indices"])
            li = list(eqn.params["limit_indices"])
            sd = list(eqn.params["strides"] or (1,) * len(st))
            if st[p] != 0 or sd[p] != 1 or li[p] != opnd.shape[-1]:
                raise UnsupportedPrimitive("slice along the batch axis")
            drop = lambda xs: tuple(x for i, x in enumerate(xs) if i != p)
            out = lax.slice(
                opnd, drop(st) + (0,), drop(li) + (opnd.shape[-1],),
                drop(sd) + (1,),
            )
            write(eqn.outvars[0], out, p)

        elif name == "concatenate":
            dim = eqn.params["dimension"]
            if dim == p:
                raise UnsupportedPrimitive("concatenate along the batch axis")
            ops = []
            for v, b in invals:
                if b is None:
                    raise UnsupportedPrimitive(
                        "concatenate mixing batched and unbatched operands"
                    )
                ops.append(v)
            write(eqn.outvars[0], lax.concatenate(ops, _smap(dim, p)), p)

        elif name == "pad":
            (opnd, _), (padval, _) = invals
            cfg = list(eqn.params["padding_config"])
            if tuple(cfg[p]) != (0, 0, 0):
                raise UnsupportedPrimitive("pad along the batch axis")
            new_cfg = tuple(c for i, c in enumerate(cfg) if i != p) + ((0, 0, 0),)
            write(eqn.outvars[0], lax.pad(opnd, padval, new_cfg), p)

        elif name == "rev":
            (opnd, _), = invals
            dims = eqn.params["dimensions"]
            if p in dims:
                raise UnsupportedPrimitive("rev along the batch axis")
            out = lax.rev(opnd, tuple(_smap(d, p) for d in dims))
            write(eqn.outvars[0], out, p)

        elif name == "expand_dims":
            (opnd, _), = invals
            dims = eqn.params["dimensions"]
            # batch position in the output: shifted up by inserted dims at or
            # before it
            q = p
            for d in sorted(dims):
                if d <= q:
                    q += 1
            new_dims = tuple(sorted(_smap_ins(d, q) for d in dims))
            out = lax.expand_dims(opnd, new_dims)
            write(eqn.outvars[0], out, q)

        elif name in ("cumsum", "cumprod", "cummax", "cummin",
                      "cumlogsumexp"):
            (opnd, _), = invals
            ax = eqn.params["axis"]
            if ax == p:
                raise UnsupportedPrimitive(f"{name} along the batch axis")
            out = eqn.primitive.bind(
                opnd, **{**eqn.params, "axis": _smap(ax, p)}
            )
            write(eqn.outvars[0], out, p)

        else:
            raise UnsupportedPrimitive(
                f"primitive {name!r} with batched operands"
            )

    out_vals, out_bd = [], []
    for v in jaxpr.outvars:
        val, p = read(v)
        out_vals.append(val)
        out_bd.append(p)
    return out_vals, out_bd


def _smap_ins(d: int, q: int) -> int:
    """Stored index for an inserted (expand_dims) output dim ``d`` with the
    output batch at ``q``."""
    return d if d < q else d - 1


def _broadcast_batch_last(inval, params, B):
    """broadcast_in_dim with an UNBATCHED operand: detect whether the output
    introduces a batch axis (an uncovered, or covered-by-size-1, output dim of
    size B) and emit it batch-last."""
    opnd, _ = inval
    shape = params["shape"]
    dims = params["broadcast_dimensions"]
    covered = {d: j for j, d in enumerate(dims)}
    candidates = []
    for d, s in enumerate(shape):
        if s != B:
            continue
        j = covered.get(d)
        if j is None or opnd.shape[j] == 1:
            candidates.append(d)
    if not candidates:
        out = lax.broadcast_in_dim(opnd, shape, dims)
        return out, None
    if len(candidates) > 1:
        raise UnsupportedPrimitive(
            "broadcast introducing multiple batch-sized axes (ambiguous)"
        )
    q = candidates[0]
    new_shape = tuple(s for i, s in enumerate(shape) if i != q) + (B,)
    nd = len(new_shape)
    batch_operand_dim = covered.get(q)
    if batch_operand_dim is not None:
        # the operand's size-1 batch slot must feed the stored LAST axis;
        # broadcast_dimensions must be strictly increasing, so move the slot
        # to the operand's end first (a pure squeeze+append reshape)
        opnd = lax.reshape(
            opnd,
            tuple(s for j, s in enumerate(opnd.shape)
                  if j != batch_operand_dim) + (1,),
        )
        new_dims = tuple(
            _smap(d, q) for j, d in enumerate(dims) if j != batch_operand_dim
        ) + (nd - 1,)
    else:
        new_dims = tuple(_smap(d, q) for d in dims)
    out = lax.broadcast_in_dim(opnd, new_shape, new_dims)
    return out, q


def _dot_general_batch_last(invals, params):
    (lhs, lp), (rhs, rp) = invals
    ((lc, rc), (lbd, rbd)) = params["dimension_numbers"]
    kw = dict(
        precision=params.get("precision"),
        preferred_element_type=params.get("preferred_element_type"),
    )

    if lp is not None and rp is None:
        # batched @ constant: x (.., B, ..) contracting its feature axis with
        # W — the workhorse (linear dynamics, MLP layers).  Stored lhs has
        # batch last; swap the operands so the result lands batch-last with
        # no transpose: (rhs_free..., B).  Output batch position in the
        # ORIGINAL program is after rhs's free dims only when lhs has no
        # other free dims — so restrict to rank-2 lhs.
        if lbd or rbd:
            raise UnsupportedPrimitive("dot_general with one-sided batch groups")
        if lhs.ndim != 2 or len(lc) != 1 or lc[0] == lp:
            raise UnsupportedPrimitive(
                "batched dot_general lhs must be rank-2 contracting its "
                "feature axis"
            )
        out = lax.dot_general(rhs, lhs, ((tuple(rc), (0,)), ((), ())), **kw)
        # original output: (B, rhs_free...) -> batch at 0
        return out, 0

    if rp is not None and lp is None:
        if lbd or rbd:
            raise UnsupportedPrimitive("dot_general with one-sided batch groups")
        if rhs.ndim != 2 or len(rc) != 1 or rc[0] == rp:
            raise UnsupportedPrimitive(
                "batched dot_general rhs must be rank-2 contracting its "
                "feature axis"
            )
        out = lax.dot_general(lhs, rhs, ((tuple(lc), (0,)), ((), ())), **kw)
        # original output: (lhs_free..., B) -> batch last
        return out, out.ndim - 1

    # both batched: per-sample vector contraction, einsum('bi,bi->b') family
    # (including the 'bi,ij,bj->b' quadratic-form lowering, whose second dot
    # arrives batch-grouped with lhs batch at 0 and rhs batch at 1)
    if (lhs.ndim == 2 and rhs.ndim == 2
            and lbd == (lp,) and rbd == (rp,)
            and len(lc) == 1 and lc[0] != lp
            and len(rc) == 1 and rc[0] != rp):
        return jnp.sum(lhs * rhs, axis=0), 0
    raise UnsupportedPrimitive("general per-sample dot_general")


def supports_batch_last(jaxpr, consts, orig_avals, batched, batch_size):
    """Probe (at build time, via ``jax.eval_shape``) whether the jaxpr can be
    evaluated batch-last.  ``orig_avals`` are the ORIGINAL (batch-first)
    abstract shapes; returns (ok, error_message)."""

    def to_stored(aval, b):
        if not b:
            return jax.ShapeDtypeStruct(aval.shape, aval.dtype)
        return jax.ShapeDtypeStruct(aval.shape[1:] + (batch_size,), aval.dtype)

    args = [to_stored(a, b) for a, b in zip(orig_avals, batched)]
    try:
        jax.eval_shape(
            lambda *xs: eval_jaxpr_batch_last(jaxpr, consts, list(xs),
                                              batched, batch_size),
            *args,
        )
        return True, ""
    except UnsupportedPrimitive as e:
        return False, str(e)
    except (TypeError, ValueError, NotImplementedError) as e:
        # an evaluation-rule gap must gate to the scan-path fallback, never
        # crash controller construction
        return False, f"batch-last evaluation failed: {type(e).__name__}: {e}"
