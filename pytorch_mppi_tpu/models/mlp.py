"""Learned residual-dynamics MLP with online training.

TPU-native equivalent of the reference's approximate-dynamics path
(``/root/reference/tests/pendulum_approximate.py:44-52,119-167``): a 2x32-tanh MLP
predicting the state residual, retrained online with Adam on the (state, action)
dataset collected by ``run_mppi``.

Key design difference: model weights are a *pytree passed into the jitted MPC solve*
(``MPPI(..., dynamics_params=params)``), so retraining swaps weights with zero
recompilation — the reference instead mutates a torch ``nn.Module`` in place.
Training steps are jitted; gradients can be data-parallel over a mesh axis.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def mlp_init(key, sizes: Sequence[int], dtype=jnp.float32):
    """Initialize MLP params [(W, b), ...] with the same scheme torch.nn.Linear
    uses (uniform +-1/sqrt(fan_in)), matching the reference network's init family."""
    params = []
    for n_in, n_out in zip(sizes[:-1], sizes[1:]):
        key, k_w, k_b = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(n_in)
        W = jax.random.uniform(k_w, (n_in, n_out), dtype, -bound, bound)
        b = jax.random.uniform(k_b, (n_out,), dtype, -bound, bound)
        params.append((W, b))
    return params


def mlp_apply(params, x):
    """Tanh-hidden MLP forward (reference network: Linear-Tanh-Linear-Tanh-Linear,
    pendulum_approximate.py:46-52).  Batched matmuls land on the MXU."""
    for W, b in params[:-1]:
        x = jnp.tanh(x @ W + b)
    W, b = params[-1]
    return x @ W + b


def make_residual_dynamics(
    nx: int,
    nu: int,
    u_clip=None,
    angle_wrap_dims: Sequence[int] = (),
    angle_encode_dims: Sequence[int] = (),
):
    """Build a parameterized residual-dynamics fn: next = state + MLP(features).

    Mirrors the reference's learned pendulum dynamics (pendulum_approximate.py:55-67):
    optional action clipping and angle normalization of selected state dims.
    With ``angle_encode_dims``, those angular dims are fed to the network as
    (sin, cos) pairs — the "continuous" representation of the reference's
    pendulum_approximate_continuous.py:60-74 (network input grows by one feature
    per encoded dim: size nx + len(angle_encode_dims) + nu).

    Signature: (params, state (B, nx), action (B, nu)) -> (B, nx); pass as
    ``MPPI(dynamics=fn, dynamics_params=params)``.
    """

    def features(state, u):
        if not angle_encode_dims:
            return jnp.concatenate((state, u), axis=1)
        cols = []
        for d in range(state.shape[1]):
            if d in angle_encode_dims:
                cols.append(jnp.sin(state[:, d : d + 1]))
                cols.append(jnp.cos(state[:, d : d + 1]))
            else:
                cols.append(state[:, d : d + 1])
        cols.append(u)
        return jnp.concatenate(cols, axis=1)

    def _wrap_cols(x):
        # column update via one-hot select, NOT x.at[:, d].set(...): the
        # scatter that .at lowers to is outside the fused kernels'
        # batch-axis-last vocabulary (ops/batch_last.py), and this form keeps
        # learned-dynamics models eligible for use_pallas=True (numerically
        # identical — an exact elementwise select)
        wrapped = ((x + math.pi) % (2 * math.pi)) - math.pi
        mask = jnp.isin(jnp.arange(x.shape[1]), jnp.asarray(angle_wrap_dims))
        return jnp.where(mask[None, :], wrapped, x)

    def dynamics(params, state, action):
        u = action[:, :nu]
        if u_clip is not None:
            u = jnp.clip(u, u_clip[0], u_clip[1])
        # wrap angular input dims: training data is angle-normalized (reference
        # train(), pendulum_approximate.py:121), so solve-time inputs must be too —
        # an unwrapped theta from a spinning pendulum is out-of-distribution and
        # poisons the whole rollout
        if angle_wrap_dims:
            state = _wrap_cols(state)
        residual = mlp_apply(params, features(state, u))
        next_state = state + residual
        if angle_wrap_dims:
            next_state = _wrap_cols(next_state)
        return next_state

    return dynamics


def make_train_step(
    dynamics_loss=None,
    optimizer=None,
    nx: int = 2,
    angle_diff_dims: Sequence[int] = (),
    angle_encode_dims: Sequence[int] = (),
    mesh=None,
    data_axis: str = "data",
):
    """Jitted Adam train step for the residual model on (state, action, next_state).

    Default loss mirrors the reference training target (pendulum_approximate.py:
    residual regression with angular difference on wrapped dims;
    ``angle_encode_dims`` must match the dynamics' (sin, cos) encoding,
    pendulum_approximate_continuous.py:68-74).  With ``mesh``, the batch shards
    over ``data_axis`` and XLA inserts the gradient psum — the data-parallel
    recipe with no hand-written collectives.
    """
    optimizer = optimizer or optax.adam(1e-3)

    def encode(state, action):
        if not angle_encode_dims:
            return jnp.concatenate((state, action), axis=1)
        cols = []
        for d in range(state.shape[1]):
            if d in angle_encode_dims:
                cols.append(jnp.sin(state[:, d : d + 1]))
                cols.append(jnp.cos(state[:, d : d + 1]))
            else:
                cols.append(state[:, d : d + 1])
        cols.append(action)
        return jnp.concatenate(cols, axis=1)

    def default_loss(params, batch):
        state, action, next_state = batch
        xu = encode(state, action)
        pred_residual = mlp_apply(params, xu)
        target = next_state - state
        for d in angle_diff_dims:
            diff = target[:, d]
            diff = ((diff + math.pi) % (2 * math.pi)) - math.pi
            target = target.at[:, d].set(diff)
        return jnp.mean((pred_residual - target) ** 2)

    loss_fn = dynamics_loss or default_loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        def shard_batch(batch):
            return jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, PartitionSpec(data_axis))
                ),
                batch,
            )
    else:
        def shard_batch(batch):
            return batch

    @jax.jit
    def train_step(params, opt_state, batch):
        batch = shard_batch(batch)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_opt(params):
        return optimizer.init(params)

    return train_step, init_opt


def train_epochs(train_step, params, opt_state, batch, epochs: int):
    """Full-batch training loop (reference trains 150 epochs full-batch,
    pendulum_approximate.py:119-167).  Runs the epoch loop inside one jitted scan
    so online retraining costs a single device dispatch."""

    @jax.jit
    def run(params, opt_state, batch):
        def body(carry, _):
            p, o = carry
            p, o, loss = train_step_inner(p, o, batch)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=epochs
        )
        return params, opt_state, losses

    # unwrap the jit on train_step for use inside scan (jit-of-jit is fine but
    # pointless); fall back to the wrapped version if unavailable
    train_step_inner = getattr(train_step, "__wrapped__", train_step)
    return run(params, opt_state, batch)
