"""Multi-process weak-scaling PROGRAM-VALIDATION benchmark (DCN code path).

Real multi-chip hardware is not available in this environment, so hardware
weak-scaling efficiency cannot be measured here (virtual CPU devices share
one socket: adding devices adds work on fixed silicon and "efficiency" trends
to 1/N by construction).  What CAN be validated is the *program*: this
benchmark fixes the TOTAL work and the GLOBAL mesh size (8 virtual devices,
N plants sharded over 'data') and compares

  1 process x 8 local devices     (all collectives on-device / in-process)
  2 processes x 4 local devices   (collectives cross the OS-process boundary
                                   over Gloo — the code path that rides DCN
                                   across hosts on a real pod)

The ratio (2-proc / 1-proc throughput) isolates the cost of the process
boundary itself — if the sharded program serialized on cross-process
collectives, it would collapse here.  A ratio near 1.0 is the evidence the
>=80% hardware weak-scaling target (BASELINE.md) is plausible; the real
number still requires a pod.

Driver:   python benchmarks/scaling_multiprocess.py [--plants 64]
          [--samples 512] [--horizon 15] [--steps 10]
Worker:   (spawned automatically) ... --worker PID NPROCS PORT LOCAL_DEVICES
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid, nprocs, port, local_devices, plants, samples, horizon, steps):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from pytorch_mppi_tpu.config import MPPIConfig, MPPIParams
    from pytorch_mppi_tpu.ops import solve as S
    from pytorch_mppi_tpu.parallel.mesh import initialize_multihost, make_mesh

    if nprocs > 1:
        initialize_multihost(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
        assert jax.process_count() == nprocs
    n_global = len(jax.devices())

    DT = jnp.float32
    B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DT)
    GOAL = jnp.array([2.0, 2.0], DT)
    dyn = lambda s, a: s + a @ B.T
    cost = lambda s, a: ((GOAL - s) ** 2).sum(axis=-1)

    mesh = make_mesh((n_global,), axis_names=("data",))
    config = MPPIConfig(nx=2, nu=2, K=samples, T=horizon, dtype=DT,
                        diag_sigma=True)
    fns = S.make_batched_step(config, plants, dyn, cost, jit=False,
                              mesh=mesh, env_axis="data")
    params = MPPIParams(
        noise_mu=jnp.zeros(2, DT), noise_sigma=jnp.eye(2, dtype=DT),
        lambda_=jnp.asarray(1.0, DT), u_min=jnp.full((2,), -jnp.inf, DT),
        u_max=jnp.full((2,), jnp.inf, DT), u_init=jnp.zeros(2, DT))

    @jax.jit
    def loop(params, state, x):
        def body(carry, _):
            state, x = carry
            state, actions, _ = fns.step(params, state, x)
            x = dyn(x, actions)
            return (state, x), None

        (state, x), _ = lax.scan(body, (state, x), None, length=steps)
        return x.sum()

    key = jax.random.PRNGKey(0)  # identical on every process -> replicated in
    k_u, k_s, k_x = jax.random.split(key, 3)
    U0 = S.sample_noise(k_u, (plants, horizon), params, DT)
    state = S.BatchedState(U=U0, key=k_s)
    x = jax.random.uniform(k_x, (plants, 2), DT, -3.0, 3.0)

    np.asarray(jax.device_get(loop(params, state, x)))  # compile+warm
    reps = 8
    # every process issues the same dispatches; the collectives synchronize them
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [loop(params, state, x) for _ in range(reps)]
        np.asarray(jax.device_get(outs[-1]))
        times.append(time.perf_counter() - t0)
    wall = sorted(times)[len(times) // 2]
    rate = plants * steps * reps / wall
    if pid == 0:
        print(json.dumps({"solves_per_s": rate, "nprocs": nprocs,
                          "global_devices": n_global, "plants": plants}),
              flush=True)
    return 0


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid, nprocs, port, local_devices, args):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    # make the package importable regardless of the parent's PYTHONPATH
    # (sys.path[0] for a worker is benchmarks/, not the repo root)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(pid),
         str(nprocs), str(port), str(local_devices),
         "--plants", str(args.plants), "--samples", str(args.samples),
         "--horizon", str(args.horizon), "--steps", str(args.steps)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )


def _collect(procs):
    rate = None
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(f"worker {i} failed:\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("{"):
                rate = json.loads(line)["solves_per_s"]
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", nargs=4, metavar=("PID", "NPROCS", "PORT",
                                                  "LOCAL_DEVICES"))
    ap.add_argument("--plants", type=int, default=64)
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=15)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    if args.worker:
        pid, nprocs, port, ld = map(int, args.worker)
        sys.exit(worker(pid, nprocs, port, ld, args.plants, args.samples,
                        args.horizon, args.steps))

    print(f"# fixed total work: N={args.plants} plants, K={args.samples}, "
          f"T={args.horizon}, 8 global devices", file=sys.stderr)

    p1 = [_spawn(0, 1, _free_port(), 8, args)]
    r1 = _collect(p1)
    print(f"# 1 process  x 8 devices: {r1:9.1f} plant-solves/s", file=sys.stderr)

    port = _free_port()
    p2 = [_spawn(i, 2, port, 4, args) for i in range(2)]
    r2 = _collect(p2)
    eff = r2 / r1
    print(f"# 2 processes x 4 devices: {r2:9.1f} plant-solves/s", file=sys.stderr)
    print(f"# process-boundary efficiency (2-proc / 1-proc, same total work): "
          f"{eff*100:.1f}%", file=sys.stderr)
    print(json.dumps({
        "kind": "program-validation (virtual CPU devices, NOT hardware scaling)",
        "one_process_solves_per_s": r1,
        "two_process_solves_per_s": r2,
        "process_boundary_efficiency": eff,
    }))


if __name__ == "__main__":
    main()
