"""Example integration tests (reference
/root/reference/parapint/examples/tests/test_examples.py): run the shipped
examples headless and assert golden values."""

import numpy as np
import pytest

import parapint_tpu as pt

# reference golden p(t) values, CI CPU, 3 MPI ranks (test_examples.py:46-57)
DYNAMICS_GOLDEN_P = {
    0: 1.6046242850486279,
    1: 2.0,
    2: 1.4792062911745605,
    3: 0.5082444341496647,
    4: -0.009859487375413882,
    5: 0.40043954978583834,
    6: 1.3619861771562247,
    7: 1.99059057528143,
    8: 1.7102013685364827,
}


def test_interior_point_example():
    from parapint_tpu.examples import interior_point

    interface = interior_point.main()
    x = np.asarray(interface.get_primals())
    assert np.isclose(x[0], 0.0, atol=1e-7)
    assert np.isclose(x[1], 1.0, atol=1e-7)


def test_dynamics_example_golden():
    from parapint_tpu.examples import dynamics

    interface, x, p = dynamics.main()
    for k, v in DYNAMICS_GOLDEN_P.items():
        assert np.isclose(p[k], v, atol=1e-6), (k, p[k], v)


def test_stochastic_example_golden():
    from parapint_tpu.examples import stochastic

    interface = stochastic.main()
    acre = np.asarray(interface.get_first_stage_values())
    # golden (reference test_examples.py:31-33): WHEAT=170, CORN=80, BEETS=250
    assert np.isclose(acre[0], 170.0, atol=1e-4)
    assert np.isclose(acre[1], 80.0, atol=1e-4)
    assert np.isclose(acre[2], 250.0, atol=1e-4)


def test_burgers_small():
    from parapint_tpu.examples import burgers

    interface = burgers.main(nfe_x=8, nfe_t=8, num_time_blocks=4)
    obj = float(interface.evaluate_objective())
    assert np.isfinite(obj) and obj > 0
    # continuity across blocks is exact by construction of the SC solve
    xs = np.asarray(interface.get_state().primals["blocks"])
    npts = 9
    nt = 2
    for i in range(3):
        end_states = xs[i, nt * npts + 1 : nt * npts + 8]
        start_next = xs[i + 1, 1:8]
        assert np.allclose(end_states, start_next, atol=1e-10)


def test_burgers_objective_oracle_vs_monolithic():
    """The flagship (benchmarked) Burgers problem checked against an
    in-repo oracle: a MONOLITHIC full-space f64 solve of the same small
    instance through InteriorPointInterface + DenseLDLSolver must match the
    dynamic-SC fused solve to 1e-8 in objective and coupling (block-boundary
    state) values.  The reference validates its SC interfaces the same way
    against full-space + Ipopt (test_sc_ip_interface.py:490-568)."""
    import jax
    import jax.numpy as jnp
    from parapint_tpu.examples import burgers
    from parapint_tpu.models.model import NLPModel

    nfe_x, nfe_t, N = 10, 12, 4
    spec = burgers.build_spec(nfe_x=nfe_x, nfe_t=nfe_t, num_time_blocks=N)

    # -- dynamic-SC fused solve (the production path, production options) --
    iface = pt.DynamicSchurComplementInteriorPointInterface(
        spec, kkt_dtype=jnp.float32
    )
    opts = pt.IPOptions()
    opts.tol = 1e-8
    opts.linalg.solver = pt.SchurComplementSolver(
        block_size=128, explicit_inverse=True, factor_dtype=jnp.float32,
        schur_complement_solver=pt.BlockTridiagSolver(),
    )
    solve = pt.make_fused_ip_solve(iface, opts)
    iface.set_bounds_relaxation_factor(opts.bounds_relaxation_factor)
    res = solve(iface.init_state())
    assert int(res.status) == pt.InteriorPointStatus.optimal.value
    iface._current_state = res.state
    obj_sc = float(iface.evaluate_objective())
    coupling_sc = np.asarray(res.state.primals["coupling"])

    # -- monolithic full-space f64 oracle ---------------------------------
    # variables = all block vectors concatenated; continuity imposed
    # directly (end states of block i == start states of block i+1), which
    # eliminates the coupling variables instead of introducing them
    n = spec.x0.shape[1]
    params = jax.tree_util.tree_map(jnp.asarray, spec.params)
    eq_keep = [np.flatnonzero(np.asarray(spec.eq_mask)[i]) for i in range(N)]
    start_idx = jnp.asarray(np.asarray(spec.start_state_idx))
    end_idx = jnp.asarray(np.asarray(spec.end_state_idx))

    def mono_obj(x):
        xb = x.reshape(N, n)
        per = jax.vmap(spec.objective)(xb, params)
        return jnp.sum(per)

    def mono_eq(x):
        xb = x.reshape(N, n)
        own = jax.vmap(spec.eq_constraints)(xb, params)
        rows = [own[i][jnp.asarray(eq_keep[i])] for i in range(N)]
        links = [
            xb[i][end_idx] - xb[i + 1][start_idx] for i in range(N - 1)
        ]
        return jnp.concatenate(rows + links)

    model = NLPModel(
        objective=mono_obj,
        x0=np.asarray(spec.x0).reshape(-1),
        eq_constraints=mono_eq,
    )
    mono_iface = pt.InteriorPointInterface(model)
    mono_opts = pt.IPOptions()
    mono_opts.tol = 1e-8
    mono_opts.linalg.solver = pt.DenseLDLSolver(block_size=128)
    status = pt.ip_solve(mono_iface, mono_opts)
    assert status == pt.InteriorPointStatus.optimal
    x_opt = np.asarray(mono_iface.get_primals()).reshape(N, n)
    obj_mono = float(mono_obj(jnp.asarray(x_opt).reshape(-1)))

    # objective parity to 1e-8 (BASELINE.md: "obj parity vs MA27-backed
    # reference" — the monolithic f64 solve plays the oracle role here)
    assert abs(obj_sc - obj_mono) <= 1e-8 * max(1.0, abs(obj_mono)), (
        obj_sc, obj_mono,
    )
    # coupling values = the oracle's block-boundary states
    coupling_mono = np.concatenate(
        [x_opt[i][np.asarray(spec.end_state_idx)] for i in range(N - 1)]
    )
    np.testing.assert_allclose(coupling_sc, coupling_mono, atol=1e-7)


@pytest.mark.slow
def test_perf_harness_methods_agree():
    """fs / ssc / psc must produce the same planted-theta recovery error
    (reference test_examples.py:85-99 checks fs and psc give the golden
    max_err on the reduced problem)."""
    from parapint_tpu.examples.performance import schur_complement as perf

    kwargs = dict(
        n_blocks=4, n_q_per_block=32, n_y_multiplier=2, n_theta=5, verbose=False
    )
    r_fs = perf.run(method="fs", **kwargs)
    r_ssc = perf.run(method="ssc", **kwargs)
    r_psc = perf.run(method="psc", **kwargs)
    # every factorization must actually SUCCEED: before the [y, nu, q, lam]
    # quasi-definite reordering, all three methods hit exact-zero pivots and
    # agreed on identical garbage while reporting status=singular
    assert r_fs.status == 0 and r_ssc.status == 0 and r_psc.status == 0
    # recovery error is data-dependent but must be identical across methods
    assert np.isclose(r_fs.max_err, r_ssc.max_err, rtol=1e-6)
    assert np.isclose(r_fs.max_err, r_psc.max_err, rtol=1e-6)
    # planted parameters approximately recovered (noise- and size-dependent;
    # the reference's golden is 0.316 at its reduced size, test_examples.py:95)
    assert r_fs.max_err < 5.0
