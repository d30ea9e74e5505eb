"""AOT deployment: build a solver artifact on one host, serve it on another.

The reference has no serving story — deploying it means shipping the Python
``MPPI`` class AND the user's dynamics/cost callables to every control host.
This example shows the TPU-native alternative (``utils.deploy``): the build
host exports the controller's compiled solve as a portable StableHLO
artifact (one ``.npz`` with the program + hyperparameters + solver state);
the serving host — simulated here as a subprocess whose interpreter NEVER
imports or defines the dynamics — loads it and closes the control loop.

Two production-relevant properties are demonstrated:

- **zero code shipping**: the serving subprocess only imports
  ``pytorch_mppi_tpu.utils.deploy`` and numpy;
- **tunables stay live**: the build host applies a deliberately different
  lambda to the loaded artifact WITHOUT re-exporting (hyperparameters are
  runtime operands of the exported program).

Run:  python examples/deploy_serving.py
      python examples/deploy_serving.py --steps 150     (full swing-up)
"""
import argparse
import json
import logging
import os
import subprocess
import sys
import tempfile
import time

logging.basicConfig(level=logging.INFO, format="[%(levelname)s] %(message)s")
logger = logging.getLogger(__name__)

# the serving subprocess: loads the artifact, closes the loop against a
# numpy-only plant, reports the final angle — no dynamics/cost code anywhere
_SERVING_HOST = r"""
import json, sys, time
import numpy as np
import jax.numpy as jnp
from pytorch_mppi_tpu.utils import deploy

path, steps = sys.argv[1], int(sys.argv[2])
solver = deploy.load_solver(path)
g, m, l, dt = 10.0, 1.0, 1.0, 0.05
s = np.array([np.pi, 1.0], np.float32)
t0 = time.perf_counter()
for _ in range(steps):
    a = float(np.asarray(solver.command(jnp.asarray(s))))
    u = np.clip(a, -2.0, 2.0)
    thdot = np.clip(s[1] + (3*g/(2*l)*np.sin(s[0]) + 3.0/(m*l**2)*u)*dt, -8, 8)
    s = np.array([s[0] + thdot*dt, thdot], np.float32)
wall = time.perf_counter() - t0
ang = abs(float(((s[0] + np.pi) % (2*np.pi)) - np.pi))
print(json.dumps({"final_angle": ang, "steps": steps, "wall_s": wall}))
"""


def build_artifact(path, horizon=15, num_samples=500):
    """The build host: define the problem, construct the controller, export."""
    import jax.numpy as jnp

    import pytorch_mppi_tpu as pm
    from pytorch_mppi_tpu.utils import deploy

    def angle_normalize(x):
        return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi

    g, m, l, dt = 10.0, 1.0, 1.0, 0.05

    def dynamics(state, u):
        th, thdot = state[..., 0], state[..., 1]
        u0 = jnp.clip(u[..., 0], -2.0, 2.0)
        newthdot = jnp.clip(
            thdot + (3 * g / (2 * l) * jnp.sin(th) + 3.0 / (m * l**2) * u0) * dt,
            -8, 8)
        return jnp.stack([th + newthdot * dt, newthdot], axis=-1)

    def cost(state, u):
        th, thdot = state[..., 0], state[..., 1]
        return angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * (u[..., 0] ** 2)

    ctrl = pm.MPPI(dynamics, cost, 2, jnp.array([[10.0]], jnp.float32),
                   num_samples=num_samples, horizon=horizon, lambda_=1.0,
                   seed=0, u_min=jnp.array([-2.0], jnp.float32),
                   u_max=jnp.array([2.0], jnp.float32))
    # portable artifact: the build host may be a TPU machine while the
    # serving subprocess here runs on the host CPU
    solver = deploy.export_solver(ctrl, path, platforms=("cpu", "tpu"))
    logger.info("exported %s artifact (platforms %s) to %s",
                solver.meta["class"], solver.platforms, path)

    # tunables stay live on the in-memory solver too: apply a different
    # lambda without re-exporting (the serving host could do the same)
    solver.params = solver.params._replace(
        lambda_=solver.params.lambda_ * 2)
    return solver


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--samples", type=int, default=500)
    p.add_argument("--keep", action="store_true", help="keep the artifact file")
    args = p.parse_args(argv)

    # mkstemp (not the deprecated, racy mktemp): the name is created and
    # owned immediately; export_solver overwrites the empty placeholder
    fd, path = tempfile.mkstemp(suffix=".mppi.npz")
    os.close(fd)
    try:
        build_artifact(path, num_samples=args.samples)
        size_kb = os.path.getsize(path) / 1024
        logger.info("artifact size: %.0f KiB", size_kb)

        env = {k: v for k, v in os.environ.items()
               if k not in ("PALLAS_AXON_POOL_IPS",)}
        # the demo serving host runs on the local CPU (the artifact is
        # multi-platform, so a TPU serving host works the same way)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, "-c", _SERVING_HOST, path, str(args.steps)],
            env=env, capture_output=True, text=True, timeout=900,
        )
        if out.returncode != 0:
            raise RuntimeError(f"serving host failed:\n{out.stderr[-3000:]}")
        result = json.loads(out.stdout.strip().splitlines()[-1])
        logger.info("serving host (zero user code): %d steps in %.1fs, "
                    "final |angle| = %.4f",
                    result["steps"], result["wall_s"], result["final_angle"])
        return result
    finally:
        if not args.keep and os.path.exists(path):
            os.remove(path)


if __name__ == "__main__":
    r = main()
    # with enough steps the served artifact must complete the swing-up
    if r["steps"] >= 150:
        assert r["final_angle"] < 0.25, r
