"""Scenario-batch MPPI: N plants solved per call, sharded over a device mesh.

The reference's ``MPPI_Batched`` (``/root/reference/src/pytorch_mppi/
mppi.py:691-873``) solves N parallel plants on one device.  This example shows
the TPU-native scaling story on top of it (SURVEY.md §2.4, §3.4):

- N plants share one noise draw and one dynamics/cost call per step;
- the plant axis shards over a ``jax.sharding.Mesh`` ``'data'`` axis — the
  solve is embarrassingly parallel, so sharding adds ZERO collectives;
- ``use_pallas=True`` runs each shard's scenario batch as one
  (N, K-blocks)-grid fused kernel: the (N, K, T·nu) perturbed tensor
  (~4 GB at the north-star shape N=1024 × K=16,384 × T=30) never exists
  in HBM (measured 2.74× vs the XLA path at that shape in noise-operand
  mode, docs/BENCHMARKS.md).

Defaults are sized to run anywhere (CPU included) in a few seconds; pass
``--pod-scale`` on a TPU host to run the full north-star shape.

Run:  python examples/scenario_batch.py            (tiny, any backend)
      python examples/scenario_batch.py --mesh     (8 virtual CPU devices)
      python examples/scenario_batch.py --pod-scale --pallas   (TPU)
"""
import argparse
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO, format="[%(levelname)s] %(message)s")
logger = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--plants", type=int, default=16, help="N parallel plants")
    p.add_argument("--samples", type=int, default=256, help="K samples")
    p.add_argument("--horizon", type=int, default=10, help="T timesteps")
    p.add_argument("--steps", type=int, default=30, help="closed-loop steps")
    p.add_argument("--mesh", action="store_true",
                   help="shard plants over a 'data' mesh axis (on CPU, force "
                        "8 virtual devices first)")
    p.add_argument("--pallas", action="store_true",
                   help="fused (N, K-blocks)-grid kernel (TPU; K>=2048 to win)")
    p.add_argument("--pod-scale", action="store_true",
                   help="north-star shape: N=1024, K=16384, T=30 (TPU HBM)")
    p.add_argument("--jit-loop", action="store_true",
                   help="run the WHOLE closed loop as one device dispatch "
                        "(run_mppi_jit): no host round trip per step")
    args = p.parse_args(argv)

    if args.mesh and "jax" not in sys.modules:
        # must happen before backend init; harmless elsewhere
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )

    import jax
    import jax.numpy as jnp

    from pytorch_mppi_tpu import MPPI_Batched
    from pytorch_mppi_tpu.parallel import make_mesh

    if args.pod_scale:
        args.plants, args.samples, args.horizon = 1024, 16_384, 30

    N, K, T = args.plants, args.samples, args.horizon
    DT = jnp.float32

    # toy 2-D linear plant + quadratic cost, the reference benchmark problem
    # (reference tests/benchmark_mppi.py:31-51) — each plant starts somewhere
    # else and must reach the shared goal
    B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DT)
    goal = jnp.array([2.0, 2.0], DT)

    def dynamics(state, action):
        return state + action @ B.T

    def running_cost(state, action):
        return ((goal - state) ** 2).sum(axis=-1)

    mesh = None
    if args.mesh:
        ndev = len(jax.devices())
        nshard = max(d for d in range(1, ndev + 1) if N % d == 0)
        mesh = make_mesh((nshard,), ("data",))
        logger.info("mesh: %d-way 'data' sharding over %d devices",
                    nshard, ndev)

    ctrl = MPPI_Batched(
        dynamics, running_cost, nx=2, noise_sigma=jnp.eye(2, dtype=DT) * 0.5,
        num_envs=N, num_samples=K, horizon=T, lambda_=1.0, seed=0,
        u_min=jnp.array([-1.0, -1.0], DT), u_max=jnp.array([1.0, 1.0], DT),
        mesh=mesh, env_axis="data", use_pallas=args.pallas,
    )

    key = jax.random.PRNGKey(42)
    states = jax.random.uniform(key, (N, 2), DT, -4.0, 0.0)

    t0 = time.perf_counter()
    if args.jit_loop:
        # the whole N-plant experiment in ONE dispatch (run_mppi_jit's
        # batched branch): the host pays a single round trip instead of one
        # per control step — the difference is the entire relay/PCIe latency
        from pytorch_mppi_tpu import run_mppi_jit

        traj, _, per_plant_cost = run_mppi_jit(ctrl, dynamics, states,
                                               steps=args.steps)
        states = traj[-1]
        logger.info("per-plant accumulated cost: mean %.2f, max %.2f",
                    float(per_plant_cost.mean()), float(per_plant_cost.max()))
    else:
        for step in range(args.steps):
            actions = ctrl.command(states)          # (N, nu)
            states = dynamics(states, actions)      # advance every plant
            if step % 5 == 0 or step == args.steps - 1:
                dist = jnp.linalg.norm(goal[None] - states, axis=-1)
                logger.info(
                    "step %2d  mean|median|max distance to goal: "
                    "%.3f | %.3f | %.3f", step,
                    float(dist.mean()), float(jnp.median(dist)),
                    float(dist.max()),
                )
    states.block_until_ready()
    wall = time.perf_counter() - t0

    dist = jnp.linalg.norm(goal[None] - states, axis=-1)
    converged = int((dist < 0.5).sum())
    logger.info(
        "%d/%d plants within 0.5 of goal after %d steps "
        "(%.2f s wall, %.0f plant-solves/s incl. host loop)",
        converged, N, args.steps, wall, N * args.steps / wall,
    )
    return converged, N


if __name__ == "__main__":
    converged, N = main()
    assert converged > 0.9 * N, f"only {converged}/{N} plants converged"
