"""Seeded random-program generator over the batch-last vocabulary.

Shared by the interpreter fuzz (tests/test_batch_last.py) and the fused-solve
fuzz (tests/test_pallas_transposed.py): composes 4-9 random supported ops into
a dynamics-like ``f(s (B,nx), u (B,nu)) -> (B,nx)`` or cost-like ``-> (B,)``
function, with every random choice pre-drawn so f is pure and re-traceable.
"""
import numpy as np

import jax
import jax.numpy as jnp


def gen_program(rng, force_kind=None, nx=None, nu=None, dtype=None):
    """Build f(s, u) from a random op chain over a working set of
    (B, d) arrays; returns (f, nx, nu)."""
    DT = jnp.float64 if dtype is None else dtype
    nx = int(rng.randint(1, 5)) if nx is None else int(nx)
    nu = int(rng.randint(1, 4)) if nu is None else int(nu)
    n_ops = int(rng.randint(4, 10))
    # pre-draw every random choice so f is pure (re-traceable)
    plan = []
    # track only dims statically while planning; consts drawn here
    dims = [nx, nu]
    for _ in range(n_ops):
        op = rng.choice([
            "unary", "binary", "const_bin", "matmul", "reduce",
            "concat", "slice", "where", "clip", "cumsum",
        ])
        i = int(rng.randint(0, len(dims)))
        j = int(rng.randint(0, len(dims)))
        if op == "unary":
            fn = rng.choice(["tanh", "sin", "cos", "logistic", "square",
                             "abs", "log1p_abs", "sqrt_abs"])
            plan.append(("unary", i, fn))
            dims.append(dims[i])
        elif op == "binary":
            # same-dim operands only
            cands = [k for k, d in enumerate(dims) if d == dims[i]]
            j = int(cands[rng.randint(0, len(cands))])
            fn = rng.choice(["add", "mul", "sub", "max", "min"])
            plan.append(("binary", i, j, fn))
            dims.append(dims[i])
        elif op == "const_bin":
            c = rng.randn(dims[i]) * 0.7
            plan.append(("const_bin", i, c,
                         rng.choice(["add", "mul", "atan2"])))
            dims.append(dims[i])
        elif op == "matmul":
            dout = int(rng.randint(1, 6))
            W = rng.randn(dims[i], dout) * (1.0 / max(1, dims[i]))
            plan.append(("matmul", i, W))
            dims.append(dout)
        elif op == "reduce":
            fn = rng.choice(["sum", "max", "mean"])
            plan.append(("reduce", i, fn))
            dims.append(1)
        elif op == "concat":
            plan.append(("concat", i, j))
            dims.append(dims[i] + dims[j])
        elif op == "slice":
            k = int(rng.randint(1, dims[i] + 1))
            plan.append(("slice", i, k))
            dims.append(k)
        elif op == "where":
            cands = [k for k, d in enumerate(dims) if d == dims[i]]
            j = int(cands[rng.randint(0, len(cands))])
            plan.append(("where", i, j))
            dims.append(dims[i])
        elif op == "clip":
            lo = float(rng.uniform(-2.0, 0.0))
            plan.append(("clip", i, lo, lo + float(rng.uniform(0.5, 3.0))))
            dims.append(dims[i])
        elif op == "cumsum":
            plan.append(("cumsum", i))
            dims.append(dims[i])
    # output: project the last value back to nx (dynamics-shaped)
    Wout = rng.randn(dims[-1], nx) * (1.0 / max(1, dims[-1]))
    as_cost = bool(rng.randint(0, 2)) if force_kind is None else (force_kind == "cost")

    def f(s, u):
        vals = [s, u]
        for step in plan:
            kind = step[0]
            if kind == "unary":
                _, i, fn = step
                x = vals[i]
                x = {"tanh": jnp.tanh, "sin": jnp.sin, "cos": jnp.cos,
                     "logistic": jax.nn.sigmoid, "square": jnp.square,
                     "abs": jnp.abs,
                     "log1p_abs": lambda v: jnp.log1p(jnp.abs(v)),
                     "sqrt_abs": lambda v: jnp.sqrt(jnp.abs(v) + 1e-9),
                     }[fn](x)
                vals.append(x)
            elif kind == "binary":
                _, i, j, fn = step
                x = {"add": jnp.add, "mul": jnp.multiply,
                     "sub": jnp.subtract, "max": jnp.maximum,
                     "min": jnp.minimum}[fn](vals[i], vals[j])
                vals.append(x)
            elif kind == "const_bin":
                _, i, c, fn = step
                c = jnp.asarray(c, DT)
                x = {"add": jnp.add, "mul": jnp.multiply,
                     "atan2": jnp.arctan2}[fn](vals[i], c)
                vals.append(x)
            elif kind == "matmul":
                _, i, W = step
                vals.append(vals[i] @ jnp.asarray(W, DT))
            elif kind == "reduce":
                _, i, fn = step
                x = {"sum": jnp.sum, "max": jnp.max, "mean": jnp.mean}[
                    fn](vals[i], axis=-1, keepdims=True)
                vals.append(x)
            elif kind == "concat":
                _, i, j = step
                vals.append(jnp.concatenate([vals[i], vals[j]], axis=-1))
            elif kind == "slice":
                _, i, k = step
                vals.append(vals[i][..., :k])
            elif kind == "where":
                _, i, j = step
                vals.append(jnp.where(vals[i] > 0, vals[i], vals[j]))
            elif kind == "clip":
                _, i, lo, hi = step
                vals.append(jnp.clip(vals[i], lo, hi))
            elif kind == "cumsum":
                _, i = step
                vals.append(jnp.cumsum(vals[i], axis=-1))
        out = vals[-1] @ jnp.asarray(Wout, DT)
        return (out**2).sum(axis=-1) if as_cost else out

    return f, nx, nu

