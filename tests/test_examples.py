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
