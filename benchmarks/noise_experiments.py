"""Noise-generation floor experiments (round-3 VERDICT item #2).

docs/DESIGN.md §5: noise generation is ~16 µs of the ~29 µs flagship solve
(K=10k, T=30, diag sigma, rbg).  This harness measures every candidate for
cutting it, each as (a) the full solve and (b) the sampling front-end alone:

  xla        current library pipeline (rbg bits -> normal -> perturb -> clamp
             -> rectified noise -> action-cost matvec)
  xla_nomat  same, but the rectified-noise tensor is never materialized:
             pert_cost = perturbed@a - U@a and update = omega@perturbed - U
             (exact: omega sums to 1)
  bits16     two normals per u32 word (hi/lo 16-bit halves): halves the
             hardware-generator output at ~1e-4 coarser draws
  pool       common-random-numbers: pregenerated (2K, D) normal pool, per
             solve a random contiguous row window + per-row sign flips
  psampler   fused Pallas front-end (ops/pallas_rollout.make_fused_sampler):
             in-kernel hardware PRNG, bits/normals/rectified-noise never in
             HBM; writes only perturbed2 + pert_cost

Run:  python benchmarks/noise_experiments.py
      MODES=xla,psampler SCHAIN=500 python benchmarks/noise_experiments.py
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_mppi_tpu.config import MPPIConfig, MPPIParams
from pytorch_mppi_tpu.ops import pallas_rollout as PR
from pytorch_mppi_tpu.ops import solve as S
from pytorch_mppi_tpu.utils.timer import chained_median_time, median_host_rtt

DT = jnp.float32
K = int(os.environ.get("K_SAMPLES", 10240))
T = int(os.environ.get("T_HORIZON", 30))
NU = 2
NX = 2
D = T * NU
GOAL = jnp.array([2.0, 2.0], DT)
B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DT)
SCHAIN = int(os.environ.get("SCHAIN", 500))

params = MPPIParams(
    noise_mu=jnp.zeros(NU, DT), noise_sigma=jnp.eye(NU, dtype=DT),
    lambda_=jnp.asarray(1.0, DT), u_min=jnp.full((NU,), -1.0, DT),
    u_max=jnp.full((NU,), 1.0, DT), u_init=jnp.zeros(NU, DT))
lo_t = jnp.tile(params.u_min, T)
hi_t = jnp.tile(params.u_max, T)
scale_t = jnp.ones((D,), DT)
mu_t = jnp.zeros((D,), DT)
x0 = jnp.array([-3.0, -2.0], DT)
U0 = jax.random.normal(jax.random.PRNGKey(5), (T, NU), DT) * 0.1
a_flat0 = (params.lambda_ * U0).reshape(D)

config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                    scan_unroll=0)
dyn = lambda s, a: s + a @ B.T
cost_fn = lambda s, a: ((GOAL - s) ** 2).sum(axis=-1)
wdyn = S.wrap_dynamics(config, dyn)
wcost = S.wrap_cost(config, cost_fn)


def rollout(perturbed2):
    rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, params,
                               x0, perturbed2.reshape(K, T, NU),
                               jax.random.PRNGKey(0))
    return rc


def finish_nomat(U2, perturbed2, pert_cost):
    """Weighting + update without ever materializing rectified noise."""
    ct = rollout(perturbed2) + pert_cost
    _, om = S.compute_weighting(ct, params.lambda_)
    return (om @ perturbed2) - U2


# --- sampling front-ends -----------------------------------------------------


def frontend_xla(key, U2):
    noise2 = S.sample_noise_flat(key, K, T, params, DT, diag_sigma=True)
    perturbed2 = jnp.clip(U2[None] + noise2, lo_t, hi_t)
    noise2 = perturbed2 - U2[None]
    return perturbed2, noise2 @ a_flat0, noise2


def frontend_xla_nomat(key, U2):
    noise2 = S.sample_noise_flat(key, K, T, params, DT, diag_sigma=True)
    perturbed2 = jnp.clip(U2[None] + noise2, lo_t, hi_t)
    pert_cost = perturbed2 @ a_flat0 - U2 @ a_flat0
    return perturbed2, pert_cost, None


def _bits16_normal(key):
    """Two N(0,1) draws per u32 word via the 16-bit halves."""
    bits = jax.random.bits(key, (K, D // 2), jnp.uint32)
    hi = (bits >> 16).astype(jnp.float32)
    lo = (bits & jnp.uint32(0xFFFF)).astype(jnp.float32)
    inv = jnp.float32(1.0 / 65536.0)
    sqrt2 = jnp.float32(1.4142135623730951)
    z_hi = sqrt2 * jax.lax.erf_inv(2.0 * ((hi + 0.5) * inv) - 1.0)
    z_lo = sqrt2 * jax.lax.erf_inv(2.0 * ((lo + 0.5) * inv) - 1.0)
    return jnp.concatenate([z_hi, z_lo], axis=1)


def frontend_bits16(key, U2):
    z = _bits16_normal(key)  # sigma=I, mu=0 at the flagship config
    perturbed2 = jnp.clip(U2[None] + z, lo_t, hi_t)
    pert_cost = perturbed2 @ a_flat0 - U2 @ a_flat0
    return perturbed2, pert_cost, None


POOL = None


def frontend_pool(key, U2):
    kof, ksg = jax.random.split(key)
    off = jax.random.randint(kof, (), 0, K)
    window = jax.lax.dynamic_slice(POOL, (off, 0), (K, D))
    signs = jnp.where(jax.random.bits(ksg, (K, 1), jnp.uint32) & 1, 1.0, -1.0)
    perturbed2 = jnp.clip(U2[None] + window * signs.astype(DT), lo_t, hi_t)
    pert_cost = perturbed2 @ a_flat0 - U2 @ a_flat0
    return perturbed2, pert_cost, None


def main():
    global POOL
    rtt = median_host_rtt()
    print(f"# K={K} T={T} D={D}; rtt {rtt*1e3:.1f} ms; chain {SCHAIN}",
          flush=True)

    # distribution sanity for bits16
    z = np.asarray(_bits16_normal(jax.random.key(0, impl="rbg")))
    print(f"# bits16 z: mean {z.mean():+.4f} std {z.std():.4f} "
          f"max|z| {abs(z).max():.2f}", flush=True)

    POOL = jax.random.normal(jax.random.key(11, impl="rbg"), (2 * K, D), DT)
    sampler = PR.make_fused_sampler(config)
    seed0 = PR.key_to_seed(jax.random.PRNGKey(3))
    NBLK = (K + 1023) // 1024

    def frontend_psampler_i(i, U2):
        seed_i = jnp.stack([seed0[0] + i * NBLK, seed0[1]])
        pert, pc = sampler(seed_i, U2, scale_t, mu_t, lo_t, hi_t, a_flat0)
        return pert, pc, None

    frontends = {
        "xla": lambda key, i, U2: frontend_xla(key, U2),
        "xla_nomat": lambda key, i, U2: frontend_xla_nomat(key, U2),
        "bits16": lambda key, i, U2: frontend_bits16(key, U2),
        "pool": lambda key, i, U2: frontend_pool(key, U2),
        "psampler": lambda key, i, U2: frontend_psampler_i(i, U2),
    }
    modes = os.environ.get("MODES", ",".join(frontends)).split(",")

    U2_0 = U0.reshape(D)
    for mode in modes:
        fe = frontends[mode]

        @jax.jit
        def fe_chain(key, U2):
            def body(c, i):
                key_i = jax.random.fold_in(key, i)
                pert, pc, _ = fe(key_i, i, U2 + c * 1e-30)
                return jnp.sum(pert[0]) + jnp.sum(pc[:1]), None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, DT),
                                jnp.arange(SCHAIN, dtype=jnp.int32))
            return c

        @jax.jit
        def solve_chain(key, U2):
            def body(c, i):
                key_i = jax.random.fold_in(key, i)
                pert, pc, noise2 = fe(key_i, i, U2 + c * 1e-30)
                if noise2 is not None:  # classic update path
                    ct = rollout(pert) + pc
                    _, om = S.compute_weighting(ct, params.lambda_)
                    delta = om @ noise2
                else:
                    delta = finish_nomat(U2 + c * 1e-30, pert, pc)
                return jnp.mean(delta), None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, DT),
                                jnp.arange(SCHAIN, dtype=jnp.int32))
            return c

        try:
            key = jax.random.key(3, impl="rbg")
            t_fe = chained_median_time(fe_chain, key, U2_0,
                                       iters_per_dispatch=SCHAIN, repeats=5,
                                       rtt=rtt)
            t_solve = chained_median_time(solve_chain, key, U2_0,
                                          iters_per_dispatch=SCHAIN,
                                          repeats=5, rtt=rtt)
            print(f"{mode:<10s} frontend {t_fe*1e6:7.1f} us | full solve "
                  f"{t_solve*1e6:7.1f} us", flush=True)
        except Exception as e:
            print(f"{mode:<10s} FAILED {type(e).__name__} {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
