"""Fused-kernel showcase: learned MLP dynamics with `use_pallas=True`.

The largest measured win for the transposed fused solve is learned-dynamics
MPPI (docs/DESIGN.md §6: 71.6 vs 117.1 µs at K=10k/T=30 on v5e — 1.64×),
because the per-step MLP matmuls ride the MXU inside the kernel while the
bits/normals/perturbed tensors never touch HBM.  This demo drives a pendulum
swing-up through a *randomly initialized then quickly trained* residual MLP
model, with the fused kernel doing the planning, and reports per-solve
timings for both paths.

Run (TPU):  python examples/fused_kernel_demo.py
Run (CPU):  JAX_PLATFORMS=cpu python examples/fused_kernel_demo.py
            (use_pallas falls back to the XLA path with a warning — the
            demo still works, timing comparison just shows parity)

No reference counterpart: the reference cannot fuse user dynamics at all
(its GPU story is batched torch ops, SURVEY.md §1 L1).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_mppi_tpu import MPPI
from pytorch_mppi_tpu.models import (
    angle_normalize,
    make_residual_dynamics,
    make_train_step,
    mlp_init,
    pendulum_dynamics,
    pendulum_running_cost,
)

DT = jnp.float32
K, T = 10_000, 30


def main():
    key = jax.random.PRNGKey(0)

    # --- learn a residual pendulum model from random transitions ------------
    mlp_params = mlp_init(key, [3, 32, 32, 2], DT)
    model = make_residual_dynamics(2, 1, u_clip=(-2, 2), angle_wrap_dims=(0,))
    train_step, init_opt = make_train_step(nx=2, angle_diff_dims=(0,))
    opt_state = init_opt(mlp_params)
    k1, k2 = jax.random.split(key)
    th = jax.random.uniform(k1, (8192, 1), DT, -jnp.pi, jnp.pi)
    thdot = jax.random.uniform(jax.random.fold_in(k1, 1), (8192, 1), DT, -8.0, 8.0)
    states = jnp.concatenate([th, thdot], axis=1)
    actions = jax.random.uniform(k2, (8192, 1), DT, -2.0, 2.0)
    nexts = pendulum_dynamics(states, actions)
    for _ in range(300):
        mlp_params, opt_state, loss = train_step(
            mlp_params, opt_state, (states, actions, nexts)
        )
    print(f"model loss after 300 epochs: {float(loss):.5f}")

    # --- plan with the learned model, fused vs XLA --------------------------
    # model(params, s, a) has a leading-params signature; the fused path
    # requires unparameterized dynamics (weights bake in as kernel
    # constants; retraining mid-flight needs the XLA path + dynamics_params)
    model_closed = lambda s, a: model(mlp_params, s, a)

    def run_closed(use_pallas):
        ctrl = MPPI(
            model_closed, pendulum_running_cost, 2,
            jnp.eye(1, dtype=DT) * 10.0, num_samples=K, horizon=T,
            lambda_=1.0, u_min=-2.0, u_max=2.0, seed=42,
            use_pallas=use_pallas,
        )
        s = jnp.array([jnp.pi, 1.0], DT)
        ctrl.command(s)  # compile
        n = 150
        t0 = time.perf_counter()
        for _ in range(n):
            a = ctrl.command(s)
            s = pendulum_dynamics(s[None], a[None])[0]
        np.asarray(a)
        per = (time.perf_counter() - t0) / n
        return per, float(jnp.abs(angle_normalize(s[0])))

    t_x, ang_x = run_closed(False)
    t_p, ang_p = run_closed(True)
    print(f"XLA   path: {t_x*1e3:7.2f} ms/command | final |angle| {ang_x:.3f}")
    print(f"fused path: {t_p*1e3:7.2f} ms/command | final |angle| {ang_p:.3f}")
    print(f"(per-command includes the host round trip; the device-side "
          f"speedup is larger — see docs/BENCHMARKS.md)")
    assert ang_p < 0.5 and ang_x < 0.5, "swing-up failed"


if __name__ == "__main__":
    main()
