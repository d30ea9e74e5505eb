"""Exact numerical equivalence against the reference implementation.

SURVEY.md §7 hard part (f): JAX and torch RNG streams differ, so "same seed"
cannot match bitwise.  Instead we inject IDENTICAL noise into both
implementations (monkeypatching each sampler) and require the downstream math —
costs, weights, nominal-trajectory updates, returned actions — to agree to
float64 precision across the full feature surface (bounds, null action,
terminal cost, u_scale, noise_abs_cost, M>1 variance, SMPPI, KMPPI).

The reference is imported from /root/reference (read-only) with its external
arm_pytorch_utilities dependency stubbed; tests skip if unavailable.
"""
import functools
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

import pytorch_mppi_tpu as pm
import pytorch_mppi_tpu.ops.solve as solve_mod

REF_PATH = "/root/reference/src"

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    """Import the reference package with arm_pytorch_utilities stubbed."""
    if "arm_pytorch_utilities" not in sys.modules:
        stub = types.ModuleType("arm_pytorch_utilities")

        def handle_batch_input(n=2):
            def dec(f):
                @functools.wraps(f)
                def w(*a, **k):
                    return f(*a, **k)
                return w
            return dec

        stub.handle_batch_input = handle_batch_input
        sys.modules["arm_pytorch_utilities"] = stub
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        from pytorch_mppi import mppi as ref_mppi
    except ImportError:
        pytest.skip("reference implementation not available")
    return ref_mppi


SEED = 42
NX = NU = 2
K, T = 64, 8

B_NP = np.array([[1.0, 0.0], [0.0, -1.0]])
GOAL_NP = np.array([2.0, 2.0])


# --- matched problem definitions -------------------------------------------
B_T = torch.tensor(B_NP, dtype=torch.double)
GOAL_T = torch.tensor(GOAL_NP, dtype=torch.double)
B_J = jnp.asarray(B_NP)
GOAL_J = jnp.asarray(GOAL_NP)


def dyn_t(state, action):
    return state + action @ B_T.T


def cost_t(state, action):
    return ((GOAL_T - state) ** 2).sum(dim=-1)


def term_t(states, actions):
    return ((GOAL_T - states[..., -1, :]) ** 2).sum(dim=-1)


def dyn_j(state, action):
    return state + action @ B_J.T


def cost_j(state, action):
    return ((GOAL_J - state) ** 2).sum(axis=-1)


def term_j(states, actions):
    return ((GOAL_J - states[..., -1, :]) ** 2).sum(axis=-1)


def _preset_noise(shapes_seed=0):
    """Deterministic noise bank: fn(shape)->np.ndarray.  Values depend only on
    (seed, shape) — NOT on request order — so both frameworks receive identical
    noise regardless of extra init-time draws on either side."""
    bank = {}

    def get(shape):
        if shape not in bank:
            rs = np.random.RandomState(
                (shapes_seed * 1000003 + sum((i + 1) * d for i, d in enumerate(shape)))
                % (2**31 - 1)
            )
            bank[shape] = rs.randn(*shape)
        return bank[shape]

    return get


def _patch_ours(monkeypatch, noise_bank):
    """Make our sampler return preset noise (post mu/Sigma transform applied the
    same way both sides: here sigma=I, mu=0, so noise == z)."""

    def fake_sample_noise(key, leading_shape, params, dtype):
        nu = params.noise_mu.shape[-1]
        z = jnp.asarray(noise_bank(tuple(leading_shape) + (nu,)), dtype)
        chol = jnp.linalg.cholesky(params.noise_sigma)
        return z @ chol.T + params.noise_mu

    def fake_sample_noise_flat(key, K, reps, params, dtype, antithetic=False,
                               chol=None, noise_rho=0.0, diag_sigma=False):
        # same bank draw the reference requests as (K, reps, nu), flattened
        # row-major — mirrors the real sample_noise_flat's layout contract
        return fake_sample_noise(key, (K, reps), params, dtype).reshape(
            K, reps * params.noise_mu.shape[-1]
        )

    monkeypatch.setattr(solve_mod, "sample_noise", fake_sample_noise)
    monkeypatch.setattr(solve_mod, "sample_noise_flat", fake_sample_noise_flat)


def _patch_ref(ctrl_t, noise_bank):
    def fake_sample(shape):
        z = torch.tensor(noise_bank(tuple(shape) + (ctrl_t.nu,)), dtype=ctrl_t.dtype)
        if ctrl_t._diagonal_sigma:
            return z * ctrl_t._noise_sigma_sqrt_diag + ctrl_t.noise_mu
        return z @ ctrl_t._noise_sigma_chol.T + ctrl_t.noise_mu

    ctrl_t._sample_noise = fake_sample


CONFIGS = [
    ("base", {}, {}),
    ("bounded", {"u_max": np.array([0.6, 0.6])}, {}),
    ("null_action", {"sample_null_action": True}, {}),
    ("terminal", {"terminal": True}, {}),
    ("u_scale", {"u_scale": 2.5}, {}),
    ("abs_cost", {"noise_abs_cost": True}, {}),
    ("m3_var", {"rollout_samples": 3, "rollout_var_cost": 0.2}, {}),
    ("lambda_u_per", {"lambda_": 0.3, "u_per_command": 3}, {}),
]


@pytest.mark.parametrize("name,opts,_", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_mppi_matches_reference(ref, monkeypatch, name, opts, _):
    opts = dict(opts)
    terminal = opts.pop("terminal", False)
    u_max = opts.pop("u_max", None)

    kw_t = dict(opts)
    kw_j = dict(opts)
    if u_max is not None:
        kw_t["u_max"] = torch.tensor(u_max, dtype=torch.double)
        kw_j["u_max"] = jnp.asarray(u_max)
    if terminal:
        kw_t["terminal_state_cost"] = term_t
        kw_j["terminal_state_cost"] = term_j

    noise_bank = _preset_noise(7)
    torch.manual_seed(SEED)
    ctrl_t = ref.MPPI(dyn_t, cost_t, NX, torch.eye(NU, dtype=torch.double),
                      num_samples=K, horizon=T, device="cpu", **kw_t)
    _patch_ref(ctrl_t, noise_bank)

    _patch_ours(monkeypatch, _preset_noise(7))
    ctrl_j = pm.MPPI(dyn_j, cost_j, NX, jnp.eye(NU, dtype=jnp.float64),
                     num_samples=K, horizon=T, seed=SEED, **kw_j)

    # identical nominal trajectories to start
    U0 = _preset_noise(99)((T, NU))
    ctrl_t.U = torch.tensor(U0, dtype=torch.double)
    ctrl_j.U = jnp.asarray(U0)

    state_np = np.array([-3.0, -2.0])
    for step in range(3):
        a_t = ctrl_t.command(torch.tensor(state_np, dtype=torch.double))
        a_j = ctrl_j.command(jnp.asarray(state_np))
        np.testing.assert_allclose(
            np.asarray(a_j), a_t.numpy(), rtol=1e-9, atol=1e-11,
            err_msg=f"[{name}] action mismatch at step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(ctrl_j.cost_total), ctrl_t.cost_total.numpy(),
            rtol=1e-9, atol=1e-11, err_msg=f"[{name}] cost_total mismatch",
        )
        np.testing.assert_allclose(
            np.asarray(ctrl_j.omega), ctrl_t.omega.numpy(), rtol=1e-8, atol=1e-12,
            err_msg=f"[{name}] omega mismatch",
        )
        np.testing.assert_allclose(
            np.asarray(ctrl_j.U), ctrl_t.U.numpy(), rtol=1e-9, atol=1e-11,
            err_msg=f"[{name}] U mismatch",
        )
        # follow OUR action (they agree anyway) through the true dynamics
        a_first = np.asarray(a_j)[0] if np.asarray(a_j).ndim > 1 else np.asarray(a_j)
        state_np = state_np + a_first @ B_NP.T


def test_smppi_matches_reference(ref, monkeypatch):
    noise_bank_t = _preset_noise(13)
    torch.manual_seed(SEED)
    ctrl_t = ref.SMPPI(dyn_t, cost_t, NX, torch.eye(NU, dtype=torch.double),
                       num_samples=K, horizon=T, device="cpu",
                       w_action_seq_cost=5.0, delta_t=0.5,
                       action_max=torch.tensor([1.0, 1.0], dtype=torch.double))
    _patch_ref(ctrl_t, noise_bank_t)

    _patch_ours(monkeypatch, _preset_noise(13))
    ctrl_j = pm.SMPPI(dyn_j, cost_j, NX, jnp.eye(NU, dtype=jnp.float64),
                      num_samples=K, horizon=T, seed=SEED,
                      w_action_seq_cost=5.0, delta_t=0.5,
                      action_max=jnp.array([1.0, 1.0]))

    state_np = np.array([-1.0, -1.0])
    for step in range(3):
        a_t = ctrl_t.command(torch.tensor(state_np, dtype=torch.double))
        a_j = ctrl_j.command(jnp.asarray(state_np))
        np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(), rtol=1e-9,
                                   atol=1e-11, err_msg=f"SMPPI action step {step}")
        np.testing.assert_allclose(
            np.asarray(ctrl_j.action_sequence), ctrl_t.action_sequence.numpy(),
            rtol=1e-9, atol=1e-11,
        )
        state_np = state_np + np.asarray(a_j) @ B_NP.T


@pytest.mark.parametrize("bounded", [False, True], ids=["unbounded", "bounded"])
def test_kmppi_matches_reference(ref, monkeypatch, bounded):
    nsp = 4
    kw_t, kw_j = {}, {}
    if bounded:
        # the reference clamps BOTH the control points and the interpolated
        # trajectory (mppi.py:657-670) — pin that double-clamp path too
        kw_t["u_max"] = torch.tensor([0.6, 0.6], dtype=torch.double)
        kw_j["u_max"] = jnp.array([0.6, 0.6])
    noise_bank_t = _preset_noise(17)
    torch.manual_seed(SEED)
    ctrl_t = ref.KMPPI(dyn_t, cost_t, NX, torch.eye(NU, dtype=torch.double),
                       num_samples=K, horizon=T, device="cpu",
                       num_support_pts=nsp, kernel=ref.RBFKernel(sigma=2.0),
                       **kw_t)
    _patch_ref(ctrl_t, noise_bank_t)

    _patch_ours(monkeypatch, _preset_noise(17))
    ctrl_j = pm.KMPPI(dyn_j, cost_j, NX, jnp.eye(NU, dtype=jnp.float64),
                      num_samples=K, horizon=T, seed=SEED,
                      num_support_pts=nsp, kernel=pm.RBFKernel(sigma=2.0),
                      **kw_j)

    U0 = _preset_noise(98)((T, NU))
    ctrl_t.U = torch.tensor(U0, dtype=torch.double)
    ctrl_j.U = jnp.asarray(U0)

    state_np = np.array([-2.0, -1.0])
    for step in range(3):
        a_t = ctrl_t.command(torch.tensor(state_np, dtype=torch.double))
        a_j = ctrl_j.command(jnp.asarray(state_np))
        np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(), rtol=1e-8,
                                   atol=1e-10, err_msg=f"KMPPI action step {step}")
        np.testing.assert_allclose(
            np.asarray(ctrl_j.theta), ctrl_t.theta.numpy(), rtol=1e-8, atol=1e-10,
        )
        state_np = state_np + np.asarray(a_j) @ B_NP.T


@pytest.mark.parametrize("M", [1, 3], ids=["m1", "m3"])
def test_specific_action_sampler_matches_reference(ref, monkeypatch, M):
    """SpecificActionSampler injection AND the per-step specific_dynamics hook,
    equivalence-pinned on both rollout paths.  The hook deliberately READS its
    second (previous-state) argument: the reference's M=1 fast path passes the
    *new* state for both state args (mppi.py:315-317) while the M>1 path passes
    the previous state (mppi.py:358-360) — we replicate each path exactly
    (ops/solve.py rollout body), so this asserts the quirk is matched, not
    papered over."""
    n_traj = 2

    class SamplerT(ref.SpecificActionSampler):
        def sample_trajectories(self, state, info):
            ramp = torch.linspace(-0.5, 0.5, T, dtype=torch.double)
            base = torch.stack([ramp, -ramp], dim=-1)  # (T, nu)
            return torch.stack([base * (1.0 + 0.1 * state[0]), base * 0.5])

        def specific_dynamics(self, next_state, state, action, t):
            return next_state + 0.01 * state

    class SamplerJ(pm.SpecificActionSampler):
        num_trajectories = n_traj

        def sample_trajectories(self, state, info):
            ramp = jnp.linspace(-0.5, 0.5, T)
            base = jnp.stack([ramp, -ramp], axis=-1)
            return jnp.stack([base * (1.0 + 0.1 * state[0]), base * 0.5])

        def specific_dynamics(self, next_state, state, action, t):
            return next_state + 0.01 * state

    kw = dict(sample_null_action=True)
    if M > 1:
        kw["rollout_samples"] = M
        kw["rollout_var_cost"] = 0.1

    noise_bank = _preset_noise(31)
    torch.manual_seed(SEED)
    ctrl_t = ref.MPPI(dyn_t, cost_t, NX, torch.eye(NU, dtype=torch.double),
                      num_samples=K, horizon=T, device="cpu",
                      specific_action_sampler=SamplerT(), **kw)
    _patch_ref(ctrl_t, noise_bank)

    _patch_ours(monkeypatch, _preset_noise(31))
    ctrl_j = pm.MPPI(dyn_j, cost_j, NX, jnp.eye(NU, dtype=jnp.float64),
                     num_samples=K, horizon=T, seed=SEED,
                     specific_action_sampler=SamplerJ(), **kw)

    U0 = _preset_noise(96)((T, NU))
    ctrl_t.U = torch.tensor(U0, dtype=torch.double)
    ctrl_j.U = jnp.asarray(U0)

    state_np = np.array([-3.0, -2.0])
    for step in range(3):
        a_t = ctrl_t.command(torch.tensor(state_np, dtype=torch.double))
        a_j = ctrl_j.command(jnp.asarray(state_np))
        np.testing.assert_allclose(
            np.asarray(a_j), a_t.numpy(), rtol=1e-9, atol=1e-11,
            err_msg=f"[sampler M={M}] action mismatch at step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(ctrl_j.cost_total), ctrl_t.cost_total.numpy(),
            rtol=1e-9, atol=1e-11, err_msg=f"[sampler M={M}] cost_total mismatch",
        )
        # both samplers were told the same slice of the sample set
        assert (ctrl_j.specific_action_sampler.start_idx
                == ctrl_t.specific_action_sampler.start_idx == 1)
        assert (ctrl_j.specific_action_sampler.end_idx
                == ctrl_t.specific_action_sampler.end_idx == 1 + n_traj)
        a_first = np.asarray(a_j)
        state_np = state_np + a_first @ B_NP.T


def test_batched_matches_reference(ref, monkeypatch):
    N = 3
    noise_bank_t = _preset_noise(23)
    torch.manual_seed(SEED)
    ctrl_t = ref.MPPI_Batched(dyn_t, cost_t, NX, torch.eye(NU, dtype=torch.double),
                              num_envs=N, num_samples=K, horizon=T, device="cpu",
                              u_max=torch.tensor([0.8, 0.8], dtype=torch.double))
    _patch_ref(ctrl_t, noise_bank_t)

    _patch_ours(monkeypatch, _preset_noise(23))
    ctrl_j = pm.MPPI_Batched(dyn_j, cost_j, NX, jnp.eye(NU, dtype=jnp.float64),
                             num_envs=N, num_samples=K, horizon=T, seed=SEED,
                             u_max=jnp.array([0.8, 0.8]))

    U0 = _preset_noise(97)((N, T, NU))
    ctrl_t.U = torch.tensor(U0, dtype=torch.double)
    ctrl_j.U = jnp.asarray(U0)

    states_np = np.array([[-3.0, -2.0], [1.0, 1.0], [0.5, -0.5]])
    for step in range(3):
        a_t = ctrl_t.command(torch.tensor(states_np, dtype=torch.double))
        a_j = ctrl_j.command(jnp.asarray(states_np))
        np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(), rtol=1e-9,
                                   atol=1e-11, err_msg=f"Batched action step {step}")
        states_np = states_np + np.asarray(a_j) @ B_NP.T
