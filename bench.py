"""Flagship benchmark: MPC solves/s per chip at K=10,000 samples, T=30 horizon.

Mirrors the reference benchmark harness problem (``/root/reference/tests/
benchmark_mppi.py:31-51``: 2D linear dynamics + quadratic cost) at the north-star
config from BASELINE.json (K=10k, T=30).  Each "solve" is one full MPPI command:
shift, noise sampling, K x T rollout, costs, softmax weighting, nominal update —
chained **sequentially in closed loop** (solve -> apply action through dynamics ->
next solve), so there is no parallel-across-solves cheating; batching S solves into
one dispatch only amortizes the host->device round-trip, which on this setup is a
~30 ms relay RTT that would otherwise swamp sub-millisecond device compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the reference PyTorch implementation measured on THIS
machine's CPU at the same config (K=10k, T=30): 22.6 solves/s
(median of 30 solves, torch 2.x eager, measured 2026-08-16 in this container).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from pytorch_mppi_tpu.config import MPPIConfig, MPPIParams, MPPIState
from pytorch_mppi_tpu.ops import solve as S

REFERENCE_SOLVES_PER_S = 22.6  # torch-cpu, K=10k, T=30, same toy problem (see header)

K = 10_000
T = 30
NX = NU = 2
SOLVES_PER_DISPATCH = 1000
REPEATS = 7  # median over more repeats: the relay RTT jitters tens of ms
DTYPE = jnp.float32


def main():
    # bounded relay-liveness probe: a dead relay blocks the first device op
    # forever; falling back to CPU keeps the benchmark bounded and the
    # driver's record honest (probe cause — timeout vs fast failure — is
    # reported by the helper; MPPI_SKIP_RELAY_PROBE=1 skips it)
    from pytorch_mppi_tpu.utils.timer import probe_device_reachable

    note = None
    if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu") and not (
        probe_device_reachable()
    ):
        # backend resolution is lazy, so flipping the platform after import
        # (but before the first device op) is still effective
        jax.config.update("jax_platforms", "cpu")
        note = "accelerator unreachable (probe failed or timed out); CPU fallback"
        print(f"# WARNING: {note}", file=sys.stderr)

    dev = jax.devices()[0]
    print(f"# device: {dev} ({dev.platform})", file=sys.stderr)

    # batching amortizes the ~30 ms relay RTT; a local CPU backend has no RTT,
    # so the fallback lane can use far fewer solves per timed dispatch and keep
    # the whole benchmark bounded (CPU is ~1000x slower per solve)
    solves_per_dispatch = SOLVES_PER_DISPATCH if dev.platform != "cpu" else 50
    repeats = REPEATS if dev.platform != "cpu" else 3

    B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DTYPE)
    goal = jnp.array([2.0, 2.0], DTYPE)

    def dynamics(state, action):
        return state + action @ B.T

    def running_cost(state, action):
        dx = goal - state
        return (dx**2).sum(axis=-1)

    # diag_sigma: the controller detects diagonality statically (sigma here is
    # identity); matches the production path and skips the kron matmul
    config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DTYPE, diag_sigma=True,
                        scan_unroll=0)  # full unroll: ~18% less loop overhead
    config_anti = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DTYPE,
                             diag_sigma=True, antithetic=True, scan_unroll=0)

    params = MPPIParams(
        noise_mu=jnp.zeros(NU, DTYPE),
        noise_sigma=jnp.eye(NU, dtype=DTYPE),
        lambda_=jnp.asarray(1.0, DTYPE),
        u_min=jnp.full((NU,), -jnp.inf, DTYPE),
        u_max=jnp.full((NU,), jnp.inf, DTYPE),
        u_init=jnp.zeros(NU, DTYPE),
    )

    def build_closed_loop(use_pallas, cfg=config):
        fns = S.make_mppi_step(
            cfg, dynamics, running_cost, jit=False, use_pallas=use_pallas
        )

        @jax.jit
        def closed_loop(params, ctrl_state, x0):
            """S full MPC command steps in closed loop, one device dispatch.
            Returns only small outputs so the timing fetch is cheap."""

            def body(carry, _):
                ctrl_state, x, min_d = carry
                ctrl_state, action, _ = fns.step(params, ctrl_state, x, None)
                x = dynamics(x[None], action[None])[0]
                min_d = jnp.minimum(min_d, jnp.linalg.norm(x - goal))
                return (ctrl_state, x, min_d), None

            (ctrl_state, x, min_d), _ = lax.scan(
                body, (ctrl_state, x0, jnp.asarray(jnp.inf, DTYPE)), None,
                length=solves_per_dispatch,
            )
            return jnp.concatenate([x, min_d[None]])

        return closed_loop

    def make_state(impl=None):
        key = jax.random.key(42, impl=impl) if impl else jax.random.PRNGKey(42)
        k_u, k_s = jax.random.split(key)
        U0 = S.sample_noise(k_u, (T,), params, DTYPE)
        return MPPIState(U=U0, key=k_s)

    ctrl_state = make_state()
    x0 = jnp.array([-3.0, -2.0], DTYPE)

    # Timing protocol: on this setup block_until_ready does NOT synchronize
    # (remote relay backend), so every timed run ends with an actual host fetch
    # (np.asarray), and the measured fixed round-trip overhead of a tiny
    # fetch-terminated dispatch is subtracted.  S=1000 solves per dispatch makes
    # the residual RTT error < 5%.
    import numpy as np

    @jax.jit
    def _tiny(x):
        return x + 1.0

    np.asarray(_tiny(x0))  # warm
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(_tiny(x0))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"# fixed dispatch+fetch round-trip: {rtt*1e3:.1f} ms", file=sys.stderr)

    results = {}
    # variants: (name, use_pallas, prng_impl) — sampling is ~80% of a K=10k
    # solve with threefry; rbg is ~3x faster on TPU
    # antithetic: K/2 mirrored draws — a legitimate MPPI variance-reduction
    # variant (quality sanity below still applies); halves the RNG cost
    variants = [
        ("xla", False, None, config),
        ("xla+rbg", False, "rbg", config),
        ("xla+rbg+antithetic", False, "rbg", config_anti),
    ]
    if dev.platform != "cpu":
        variants.append(("pallas", True, None, config))
        variants.append(("pallas+antithetic", True, None, config_anti))
    for name, use_pallas, impl, cfg in variants:
        closed_loop = build_closed_loop(use_pallas, cfg)
        ctrl_state = make_state(impl)
        t0 = time.perf_counter()
        out = np.asarray(closed_loop(params, ctrl_state, x0))
        print(f"# [{name}] compile+first-run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = np.asarray(closed_loop(params, ctrl_state, x0))
            times.append(time.perf_counter() - t0)
        times.sort()
        median = times[len(times) // 2]
        per_solve = max(median - rtt, 1e-9) / solves_per_dispatch

        final_dist = float(np.linalg.norm(out[:NX] - np.asarray(goal)))
        min_dist = float(out[NX])
        print(
            f"# [{name}] per-solve {per_solve*1e3:.3f} ms | median dispatch "
            f"{median*1e3:.1f} ms | final dist {final_dist:.3f} | min dist "
            f"{min_dist:.3f}",
            file=sys.stderr,
        )
        # sanity: the controller must have reached the goal region and not diverged
        # (steady-state MPPI wanders around the goal, so check the min over the loop)
        if not (min_dist < 1.0 and final_dist < 10.0):
            print(f"# WARNING: [{name}] closed loop failed sanity check",
                  file=sys.stderr)
            continue
        results[name] = per_solve

    per_solve = min(results.values())
    solves_per_s = 1.0 / per_solve

    line = {
        "metric": "MPC solves/s per chip (K=10k, T=30)",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / REFERENCE_SOLVES_PER_S, 2),
    }
    if note is not None:
        line["note"] = note
    print(json.dumps(line))


if __name__ == "__main__":
    main()
