"""Pallas-vs-XLA experiment harness behind the kernel decision record.

This file reproduces every measurement in docs/DESIGN.md §6 ("Pallas kernels:
measured and rejected").  It contains the round-2 **transposed (K-on-lanes)
fused solve** — the best kernel design found across two rounds (~10x faster
than the round-1 K-on-sublanes kernels) — and benchmarks it against the
library's XLA pipeline at several regimes:

  python benchmarks/pallas_experiments.py                  # flagship K=10k T=30
  T_HORIZON=200 NU=4 python benchmarks/pallas_experiments.py   # long-horizon
  MODES=rng,rng_noerf,hybrid python benchmarks/pallas_experiments.py

Transposed design: noise (D, block_k), state (nx, block_k), cost
(1, block_k) — K rides the LANE dim, so every elementwise pass is lane-dense
(the round-1 kernels kept K on sublanes and padded nx=2 -> 128 lanes, 64x
waste), and the weighted update becomes a (D, bk)@(bk, 1) full-contraction
MXU matvec.  Modes isolate cost shares: 'rng' = in-kernel hardware PRNG +
erf_inv; 'rng_noerf' = skip erf_inv (distribution-WRONG, timing only);
'hybrid' = XLA-generated noise fed through HBM.

Headline results (TPU v5e, 2026-08-16): see docs/DESIGN.md §6.  XLA wins
every regime; this harness exists so the conclusion stays re-measurable.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_mppi_tpu.config import MPPIConfig, MPPIParams
from pytorch_mppi_tpu.ops import pallas_rollout as PR
from pytorch_mppi_tpu.ops import solve as S
from pytorch_mppi_tpu.utils.timer import chained_median_time, median_host_rtt

DT = jnp.float32
K = int(os.environ.get("K_SAMPLES", 10240))
T = int(os.environ.get("T_HORIZON", 30))
NU = int(os.environ.get("NU", 2))
NX = 2
D = T * NU
GOALv = jnp.array([2.0, 2.0], DT)
_Bn = np.zeros((NX, NU), np.float32)
for _j in range(NU):
    _Bn[_j % NX, _j] = 1.0 if _j % 2 == 0 else -1.0
Bv = jnp.asarray(_Bn)


def make_transposed_solve(BK: int, mode: str = "rng"):
    """The transposed fused solve for linear dynamics s' = s + B u and
    quadratic cost ||goal - s||^2, diagonal sigma.  Returns
    solve(lead, x0, U, scale_d, mu_d, lo_d, hi_d, a_flat, lam) ->
    (delta (D,), cost (K,)); ``lead`` is the (2,) int32 seed ('rng'*) or the
    (D, K_pad) pre-generated noise ('hybrid')."""
    K_PAD = ((K + BK - 1) // BK) * BK
    NBLK = K_PAD // BK

    def kernel(*refs):
        (lead_ref, x0_ref, U_ref, scale_ref, mu_ref, lo_ref, hi_ref,
         a_ref, lam_ref, B_ref, goal_ref, cost_out, delta_ref, m_ref,
         s_ref, acc_ref) = refs
        i = pl.program_id(0)
        if mode == "hybrid":
            z = lead_ref[...]
        else:
            pltpu.prng_seed(lead_ref[0] + i, lead_ref[1])
            bits = pltpu.prng_random_bits((D, BK))
            if mode == "rng_noerf":
                mant = jax.lax.shift_right_logical(bits, jnp.int32(9))
                fb = jax.lax.bitwise_or(mant, jnp.int32(0x3F800000))
                z = pltpu.bitcast(fb, jnp.float32) * 2.0 - 3.0
            else:
                z = PR._bits_to_normal(bits, use_pltpu=not PR._interpret())
        noise = z * scale_ref[...] + mu_ref[...]      # (D,1) bcast over lanes
        U_col = U_ref[...]
        perturbed = jnp.clip(U_col + noise, lo_ref[...], hi_ref[...])
        noise = perturbed - U_col
        pert_cost = jnp.sum(noise * a_ref[...], axis=0, keepdims=True)

        state = jnp.broadcast_to(x0_ref[...], (NX, BK))
        total = pert_cost
        for t in range(T):
            u_t = perturbed[t * NU:(t + 1) * NU, :]   # (NU, BK) sublane slice
            state = state + jnp.dot(
                B_ref[...], u_t, preferred_element_type=DT,
                precision=jax.lax.Precision.HIGHEST)
            c = jnp.sum((goal_ref[...] - state) ** 2, axis=0, keepdims=True)
            total = total + c
        if K_PAD != K:
            gid = jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1) + i * BK
            total = jnp.where(gid < K, total, jnp.inf)
        cost_out[...] = total

        logits = -cost_out[...] / lam_ref[0]
        blk_m = jnp.max(logits)

        @pl.when(i == 0)
        def _():
            m_ref[0] = -jnp.inf
            s_ref[0] = 0.0
            acc_ref[...] = jnp.zeros_like(acc_ref)

        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, blk_m)
        sc = jnp.exp(m_old - m_new)
        w = jnp.exp(logits - m_new)
        s_ref[0] = s_ref[0] * sc + jnp.sum(w)
        # weighted delta: full-contraction MXU matvec (D, BK)@(BK, 1)
        acc_ref[...] = acc_ref[...] * sc + jnp.dot(
            noise, w.reshape(BK, 1), preferred_element_type=DT,
            precision=jax.lax.Precision.HIGHEST)
        m_ref[0] = m_new

        @pl.when(i == NBLK - 1)
        def _():
            delta_ref[...] = acc_ref[...]

    lead = (pl.BlockSpec((D, BK), lambda i: (0, i), memory_space=pltpu.VMEM)
            if mode == "hybrid" else pl.BlockSpec(memory_space=pltpu.SMEM))
    fused = pl.pallas_call(
        kernel,
        grid=(NBLK,),
        in_specs=[lead] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7 + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, K_PAD), DT),
            jax.ShapeDtypeStruct((D, 1), DT),
            jax.ShapeDtypeStruct((1,), DT),
            jax.ShapeDtypeStruct((1,), DT),
        ),
        scratch_shapes=[pltpu.VMEM((D, 1), DT)],
        interpret=PR._interpret(),
    )

    def solve(lead_in, x0, U, scale_d, mu_d, lo_d, hi_d, a_flat, lam):
        cost, delta, m, s = fused(
            lead_in, x0.reshape(NX, 1), U.reshape(D, 1), scale_d.reshape(D, 1),
            mu_d.reshape(D, 1), lo_d.reshape(D, 1), hi_d.reshape(D, 1),
            a_flat.reshape(D, 1), lam.reshape(1), Bv, GOALv.reshape(NX, 1),
        )
        return delta.reshape(D) / s[0], cost.reshape(K_PAD)[:K]

    return solve, K_PAD


def main():
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
    SCHAIN = int(os.environ.get("SCHAIN", 500))
    rtt = median_host_rtt()
    print(f"# K={K} T={T} nu={NU} D={D}; rtt {rtt*1e3:.1f} ms", flush=True)

    config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
    dyn = lambda s, a: s + a @ Bv.T
    cost_fn = lambda s, a: ((GOALv - s) ** 2).sum(axis=-1)
    wdyn = S.wrap_dynamics(config, dyn)
    wcost = S.wrap_cost(config, cost_fn)

    def xla_iteration(key, U, x0):
        noise2 = S.sample_noise_flat(key, K, T, params, DT, diag_sigma=True)
        U2 = U.reshape(D)
        perturbed2 = jnp.clip(U2[None] + noise2, lo_t, hi_t)
        noise2 = perturbed2 - U2[None]
        pc = noise2 @ a_flat0
        rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, params,
                                   x0, perturbed2.reshape(K, T, NU),
                                   jax.random.PRNGKey(0))
        ct = rc + pc
        _, om = S.compute_weighting(ct, params.lambda_)
        return (om @ noise2).reshape(T, NU), ct

    @jax.jit
    def xla_chain(key, x0, U):
        def body(carry, _):
            key, c = carry
            key, sub = jax.random.split(key)
            delta, _ = xla_iteration(sub, U + c * 1e-30, x0)
            return (key, jnp.mean(delta)), None
        (key, c), _ = jax.lax.scan(body, (key, jnp.asarray(0.0, DT)), None,
                                   length=SCHAIN)
        return c

    t_x = chained_median_time(xla_chain, jax.random.key(3, impl="rbg"), x0,
                              U0, iters_per_dispatch=SCHAIN, repeats=5,
                              rtt=rtt)
    print(f"xla pipeline              {t_x*1e6:8.1f} us/iter", flush=True)

    # the PRODUCTIZED generalized kernel (what use_pallas=True routes to):
    # arbitrary traceable dynamics through batch-axis-last jaxpr evaluation
    try:
        lib_solve = PR.make_transposed_fused_solve(config, wdyn, wcost)
        seedL = PR.key_to_seed(jax.random.PRNGKey(3))
        x0T = jnp.broadcast_to(x0[:, None], (NX, K))

        @jax.jit
        def lib_run(seed, x0T, U):
            def body(c, i):
                lead = jnp.stack([seed[0] + i, seed[1]])
                delta, m, s, ct = lib_solve(lead, x0T, U.reshape(D) + c * 1e-30,
                                            scale_t, mu_t, lo_t, hi_t, a_flat0,
                                            params.lambda_)
                return jnp.mean(delta / s), None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, DT),
                                jnp.arange(SCHAIN, dtype=jnp.int32))
            return c

        t_l = chained_median_time(lib_run, seedL, x0T, U0,
                                  iters_per_dispatch=SCHAIN, repeats=5,
                                  rtt=rtt)
        print(f"library transposed (generalized) {t_l*1e6:8.1f} us/iter "
              f"({t_x/t_l:.2f}x vs xla)", flush=True)
    except Exception as e:
        print(f"library transposed: FAILED {type(e).__name__} {str(e)[:150]}",
              flush=True)

    seed0 = PR.key_to_seed(jax.random.PRNGKey(3))
    modes = os.environ.get("MODES", "rng").split(",")
    bks = [int(b) for b in os.environ.get("BKS", "2048,10240").split(",")]
    for mode in modes:
        for BK in bks:
            try:
                solve, K_PAD = make_transposed_solve(BK, mode)

                @jax.jit
                def run(seed, key, x0, U):
                    def body(c, i):
                        if mode == "hybrid":
                            lead = jax.random.normal(
                                jax.random.fold_in(key, i), (D, K_PAD), DT)
                        else:
                            lead = jnp.stack([seed[0] + i, seed[1]])
                        delta, _ = solve(lead, x0, U + c * 1e-30, scale_t,
                                         mu_t, lo_t, hi_t, a_flat0,
                                         params.lambda_)
                        return jnp.mean(delta), None
                    c, _ = jax.lax.scan(body, jnp.asarray(0.0, DT),
                                        jnp.arange(SCHAIN, dtype=jnp.int32))
                    return c

                t = chained_median_time(
                    run, seed0, jax.random.key(3, impl="rbg"), x0, U0,
                    iters_per_dispatch=SCHAIN, repeats=5, rtt=rtt)
                print(f"pallas-T BK={BK:<6d} {mode:<10s} {t*1e6:8.1f} us/iter "
                      f"({t_x/t:.2f}x vs xla)", flush=True)
            except Exception as e:
                print(f"pallas-T BK={BK} {mode}: FAILED {type(e).__name__} "
                      f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
