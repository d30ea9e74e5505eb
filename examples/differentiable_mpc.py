"""Differentiable MPC: train a dynamics model through closed-loop TASK COST.

No prediction-error supervision anywhere: the controller plans with a
randomly-initialized residual MLP, the TRUE plant executes the action, and
``jax.value_and_grad`` backpropagates the accumulated task cost through the
entire loop — the plant steps, every MPPI solve (noise scaling, bounds clamp,
T-step model rollout, softmax weighting), and the model itself.  The model
learns exactly the dynamics errors that hurt control performance.

Structurally impossible in the reference (``/root/reference/src/pytorch_mppi/
mppi.py``): its controller mutates attributes and draws from the global torch
RNG mid-solve, which severs the autograd graph.  Here a solve is a pure
function of ``(params, state, x0, key)`` (docs/DESIGN.md §8).

Related: ``autotune.GradientOpt`` applies the same property to the
controller's hyperparameters; arXiv:2604.01539 ("Toward Single-Step MPPI via
Differentiable Predictive Control") explores this direction in the
literature.

Run: python examples/differentiable_mpc.py  (add JAX_PLATFORMS=cpu for CPU)
"""
import logging

logging.basicConfig(level=logging.INFO, format="[%(levelname)s] %(message)s")
logger = logging.getLogger(__name__)


def main(train_steps: int = 25, loop_steps: int = 6):
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_mppi_tpu.config import MPPIConfig, MPPIParams, MPPIState
    from pytorch_mppi_tpu.models.mlp import make_residual_dynamics, mlp_init
    from pytorch_mppi_tpu.ops import solve as S

    DT = jnp.float32
    B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DT)
    goal = jnp.array([2.0, 2.0], DT)
    true_dyn = lambda s, a: s + a @ B.T          # the real plant
    cost = lambda s, a: ((goal - s) ** 2).sum(axis=-1)

    # the controller plans with THIS model — initially pure noise
    w = mlp_init(jax.random.PRNGKey(0), [4, 16, 2])
    model = make_residual_dynamics(2, 2)

    config = MPPIConfig(nx=2, nu=2, K=128, T=8, dtype=DT, diag_sigma=True,
                        parameterized_dynamics=True)
    fns = S.make_mppi_step(config, model, cost, jit=False)
    params = MPPIParams(
        noise_mu=jnp.zeros(2, DT), noise_sigma=jnp.eye(2, dtype=DT),
        lambda_=jnp.asarray(1.0, DT), u_min=jnp.full((2,), -1.0, DT),
        u_max=jnp.full((2,), 1.0, DT), u_init=jnp.zeros(2, DT),
    )

    def task_loss(w):
        st = MPPIState(U=jnp.zeros((config.T, 2), DT),
                       key=jax.random.PRNGKey(7))
        x = jnp.array([-3.0, -2.0], DT)
        total = 0.0
        for _ in range(loop_steps):
            st, a, _ = fns.step(params, st, x, None, w)   # plan: MODEL
            x = true_dyn(x[None], a[None])[0]             # execute: TRUTH
            total = total + ((goal - x) ** 2).sum()
        return total

    opt = optax.adam(3e-3)
    opt_state = opt.init(w)
    value_and_grad = jax.jit(jax.value_and_grad(task_loss))

    l0, _ = value_and_grad(w)
    logger.info("closed-loop task cost with the UNTRAINED model: %.2f",
                float(l0))
    for i in range(train_steps):
        loss, grads = value_and_grad(w)
        updates, opt_state = opt.update(grads, opt_state, w)
        w = optax.apply_updates(w, updates)
        if i % 5 == 0 or i == train_steps - 1:
            logger.info("step %2d  task cost %.2f", i, float(loss))
    logger.info(
        "trained THROUGH control: %.2f -> %.2f (%.1fx) with zero "
        "prediction-error supervision", float(l0), float(loss),
        float(l0) / float(loss),
    )
    return float(l0), float(loss)


if __name__ == "__main__":
    l0, l1 = main()
    assert l1 < 0.5 * l0, f"training through control failed: {l0} -> {l1}"
