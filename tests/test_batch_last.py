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
    the combinatorial space between them.  (Generator: tests/fuzz_programs.py,
    shared with the fused-solve fuzz in test_pallas_transposed.py.)"""

    @pytest.mark.parametrize("seed", range(30))
    def test_random_program(self, seed):
        from fuzz_programs import gen_program

        rng = np.random.RandomState(1000 + seed)
        f, nx, nu = gen_program(rng)
        s = jnp.asarray(rng.randn(B, nx), DT)
        u = jnp.asarray(rng.randn(B, nu), DT)
        _check(f, (s, u), [True, True], rtol=1e-9)
