"""Batch-axis-last jaxpr evaluation (ops/batch_last.py) against direct
batch-first evaluation — the transform that generalizes the transposed
K-on-lanes Pallas solve to arbitrary traceable dynamics (docs/DESIGN.md §6)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu.ops.batch_last import (
    UnsupportedPrimitive,
    eval_jaxpr_batch_last,
    supports_batch_last,
)

B = 16
DT = jnp.float64


def _check(f, orig_args, batched, rtol=1e-12):
    closed = jax.make_jaxpr(f)(*orig_args)
    want = f(*orig_args)
    want = want if isinstance(want, (tuple, list)) else (want,)
    stored = [
        jnp.moveaxis(a, 0, -1) if bt else a for a, bt in zip(orig_args, batched)
    ]
    got = eval_jaxpr_batch_last(
        closed.jaxpr, closed.consts, stored, batched, B
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        g = jnp.moveaxis(g, -1, 0) if jnp.ndim(w) and w.shape[0] == B else g
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=rtol)
    ok, msg = supports_batch_last(
        closed.jaxpr, closed.consts,
        [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in orig_args],
        batched, B,
    )
    assert ok, msg


def _rand(*shape):
    return jnp.asarray(np.random.RandomState(sum(shape) + 7).randn(*shape), DT)


Bmat = jnp.asarray([[1.0, 0.0], [0.0, -1.0]], DT)
GOAL = jnp.asarray([2.0, 2.0], DT)


class TestSupported:
    def test_linear_dynamics(self):
        f = lambda s, u: s + u @ Bmat.T
        _check(f, (_rand(B, 2), _rand(B, 2)), [True, True])

    def test_quadratic_cost(self):
        f = lambda s, u: ((GOAL - s) ** 2).sum(axis=-1)
        _check(f, (_rand(B, 2), _rand(B, 2)), [True, True])

    def test_pendulum_dynamics(self):
        def f(state, action):
            th, thdot = state[..., 0], state[..., 1]
            u = jnp.clip(action[..., 0], -2.0, 2.0)
            newthdot = thdot + (3 * 10.0 / 2 * jnp.sin(th) + 3.0 * u) * 0.05
            newthdot = jnp.clip(newthdot, -8, 8)
            newth = th + newthdot * 0.05
            return jnp.stack([newth, newthdot], axis=-1)

        _check(f, (_rand(B, 2), _rand(B, 1)), [True, True])

    def test_angle_normalize_cost(self):
        def f(state, action):
            th = ((state[..., 0] + jnp.pi) % (2 * jnp.pi)) - jnp.pi
            return th**2 + 0.1 * state[..., 1] ** 2 + 0.001 * (action**2).sum(-1)

        _check(f, (_rand(B, 2), _rand(B, 1)), [True, True])

    def test_mlp_dynamics(self):
        W1, b1 = _rand(4, 32), _rand(32)
        W2, b2 = _rand(32, 2), _rand(2)

        def f(s, u):
            h = jnp.tanh(jnp.concatenate([s, u], axis=-1) @ W1 + b1)
            return s + h @ W2 + b2

        _check(f, (_rand(B, 2), _rand(B, 2)), [True, True])

    def test_quadratic_form_einsum(self):
        Q = jnp.asarray([[2.0, 0.3], [0.3, 1.0]], DT)
        f = lambda s, u: jnp.einsum("bi,ij,bj->b", s, Q, s)
        _check(f, (_rand(B, 2), _rand(B, 2)), [True, True])

    def test_where_and_select(self):
        def f(s, u):
            speed = jnp.abs(s[..., 1])
            return jnp.where(speed > 1.0, speed * 2.0, speed + u[..., 0])

        _check(f, (_rand(B, 2), _rand(B, 1)), [True, True])

    def test_broadcast_to_batch(self):
        def f(s, u):
            drift = jnp.broadcast_to(GOAL * 0.01, (s.shape[0], 2))
            return s + drift + u

        _check(f, (_rand(B, 2), _rand(B, 2)), [True, True])

    def test_broadcast_rank_aligned_row_to_batch(self):
        """A (1, nx) constant broadcast to (B, nx): the operand's size-1
        batch slot feeds the stored last axis — requires the squeeze+append
        reordering (round-3 review finding: the naive dims mapping produced
        non-increasing broadcast_dimensions and a TypeError that escaped the
        fallback probe)."""
        b_row = _rand(1, 2)

        def f(s, u):
            return s + u + jnp.broadcast_to(b_row, (s.shape[0], 2))

        _check(f, (_rand(B, 2), _rand(B, 2)), [True, True])

    def test_reshape_feature_dims(self):
        def f(s, u):
            x = s.reshape(s.shape[0], 2, 2)
            return (x * x).sum(axis=(1, 2)) + u[..., 0]

        _check(f, (_rand(B, 4), _rand(B, 1)), [True, True])

    def test_unbatched_time_arg(self):
        f = lambda s, u, t: s + u * (1.0 + 0.1 * t)
        _check(
            f,
            (_rand(B, 2), _rand(B, 2), jnp.asarray(3, jnp.int32)),
            [True, True, False],
        )

    def test_jit_wrapped_fn_inlines(self):
        inner = jax.jit(lambda s: jnp.tanh(s) * 2.0)
        f = lambda s, u: inner(s) + u
        _check(f, (_rand(B, 2), _rand(B, 2)), [True, True])

    def test_tuple_outputs(self):
        def f(s, u):
            ns = s + u @ Bmat.T
            return ns, ((GOAL - ns) ** 2).sum(axis=-1)

        _check(f, (_rand(B, 2), _rand(B, 2)), [True, True])

    def test_cumsum_feature_axis(self):
        def f(s, u):
            return jnp.cumsum(s, axis=-1) + jnp.cumprod(1.0 + 0.01 * u, axis=-1)

        _check(f, (_rand(B, 4), _rand(B, 4)), [True, True])

    def test_norm_sqrt_rsqrt(self):
        def f(s, u):
            n = jnp.sqrt((s**2).sum(axis=-1) + 1e-9)
            return s / (n[..., None] + 1.0) + u

        _check(f, (_rand(B, 2), _rand(B, 2)), [True, True])


class TestUnsupported:
    def _probe(self, f, orig_args, batched):
        closed = jax.make_jaxpr(f)(*orig_args)
        return supports_batch_last(
            closed.jaxpr, closed.consts,
            [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in orig_args],
            batched, B,
        )

    def test_batch_reduction_rejected(self):
        f = lambda s, u: s - s.mean(axis=0, keepdims=True) + u
        ok, msg = self._probe(f, (_rand(B, 2), _rand(B, 2)), [True, True])
        assert not ok and "batch axis" in msg

    def test_sort_rejected(self):
        f = lambda s, u: jnp.sort(s, axis=-1) + u
        ok, _ = self._probe(f, (_rand(B, 2), _rand(B, 2)), [True, True])
        assert not ok

    def test_probe_does_not_raise_on_eval(self):
        f = lambda s, u: s - s.mean(axis=0, keepdims=True) + u
        closed = jax.make_jaxpr(f)(_rand(B, 2), _rand(B, 2))
        with pytest.raises(UnsupportedPrimitive):
            eval_jaxpr_batch_last(
                closed.jaxpr, closed.consts,
                [jnp.moveaxis(_rand(B, 2), 0, -1)] * 2, [True, True], B,
            )


class TestFuzz:
    """Seeded random-program fuzz: compose 4-9 random ops from the supported
    vocabulary into a dynamics-like function and pin batch-last evaluation
    against direct batch-first evaluation.  A silent numerical divergence
    here would corrupt every fused solve whose user dynamics hits the same
    op pattern — the targeted tests above cover known shapes; this covers
    the combinatorial space between them."""

    @staticmethod
    def _gen_program(rng):
        """Build f(s, u) from a random op chain over a working set of
        (B, d) arrays; returns (f, nx, nu)."""
        nx = int(rng.randint(1, 5))
        nu = int(rng.randint(1, 4))
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
        as_cost = bool(rng.randint(0, 2))

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

    @pytest.mark.parametrize("seed", range(30))
    def test_random_program(self, seed):
        rng = np.random.RandomState(1000 + seed)
        f, nx, nu = self._gen_program(rng)
        s = jnp.asarray(rng.randn(B, nx), DT)
        u = jnp.asarray(rng.randn(B, nu), DT)
        _check(f, (s, u), [True, True], rtol=1e-9)
