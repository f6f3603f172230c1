"""Block-tridiagonal (cyclic-reduction) Schur-complement solver tests.

Kernel-vs-dense-oracle tests in the style of the reference's SC tests
(/root/reference/parapint/linalg/schur_complement/tests/), plus equivalence
of the tile-form coupling path against the dense SC path on the dynamic
interface, serial and sharded.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import parapint_tpu as pt
from parapint_tpu.linalg import (
    BlockTridiag,
    BlockTridiagSolver,
    SchurComplementSolver,
    ShardedSchurComplementSolver,
)
from parapint_tpu.linalg.tridiag import extract_tridiag

sys.path.insert(0, "tests")


def make_tridiag(m, ns, seed=0):
    rng = np.random.default_rng(seed)
    diag = np.zeros((m, ns, ns))
    upper = rng.standard_normal((max(m - 1, 0), ns, ns))
    for i in range(m):
        A = rng.standard_normal((ns, ns))
        # symmetric, indefinite (random diagonal shift signs)
        diag[i] = A + A.T + (6 + ns) * np.diag(rng.standard_normal(ns))
    return BlockTridiag(jnp.asarray(diag), jnp.asarray(upper))


@pytest.mark.parametrize(
    "m,ns",
    [(1, 3), (2, 4), (5, 4), (7, 3), (8, 6),
     pytest.param(63, 7, marks=pytest.mark.slow)],
)
def test_cr_vs_dense_oracle(m, ns):
    tri = make_tridiag(m, ns, seed=m + ns)
    S = np.asarray(tri.todense())
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(m * ns)
    r = S @ x_true

    solver = BlockTridiagSolver()
    fact = solver.numeric(tri)
    assert int(solver.status(fact)) == 0
    x = np.asarray(solver.solve(fact, jnp.asarray(r)))
    assert np.allclose(x, x_true, rtol=1e-8, atol=1e-8)

    # exact inertia by Haynsworth additivity across CR levels
    w = np.linalg.eigvalsh(S)
    pos, neg, zero = solver.inertia(fact)
    assert (int(pos), int(neg), int(zero)) == ((w > 0).sum(), (w < 0).sum(), 0)


def test_cr_dense_input_and_roundtrip():
    tri = make_tridiag(6, 5, seed=9)
    S = tri.todense()
    # extract_tridiag(todense()) is the identity on the band
    tri2 = extract_tridiag(S, 5)
    assert np.allclose(np.asarray(tri.diag), np.asarray(tri2.diag))
    assert np.allclose(np.asarray(tri.upper), np.asarray(tri2.upper))
    solver = BlockTridiagSolver(ns=5)
    fact = solver.numeric(S)
    r = jnp.arange(30, dtype=S.dtype)
    x = np.asarray(solver.solve(fact, r))
    assert np.allclose(np.asarray(S) @ x, np.asarray(r), atol=1e-8)


def test_cr_singular_tile_reports_singular():
    tri = make_tridiag(3, 4, seed=2)
    diag = np.asarray(tri.diag).copy()
    diag[1] = 0.0  # exactly-singular middle tile
    upper = np.asarray(tri.upper).copy()
    upper[:] = 0.0  # decouple so the zero tile is truly singular
    solver = BlockTridiagSolver()
    fact = solver.numeric(BlockTridiag(jnp.asarray(diag), jnp.asarray(upper)))
    assert int(solver.status(fact)) == int(pt.LinearSolverStatus.singular)


def _kkt_and_rhs(n_blocks):
    from test_dynamic import make_dynamic_spec

    spec = make_dynamic_spec(n_blocks)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    state = interface.init_state()
    interface._current_state = state
    data = interface.eval_kkt_data(state, 0.1)
    kkt = interface.assemble_kkt(data, 1e-6, 1e-8)
    return kkt, interface.kkt_rhs(data)


@pytest.mark.parametrize("n_blocks", [4, 6])
def test_tridiag_sc_matches_dense_sc(n_blocks):
    kkt, rhs = _kkt_and_rhs(n_blocks)
    dense = SchurComplementSolver(block_size=16)
    f1 = dense.numeric(kkt)
    s1 = dense.solve(f1, rhs)
    tri = SchurComplementSolver(
        block_size=16, schur_complement_solver=BlockTridiagSolver()
    )
    f2 = tri.numeric(kkt)
    s2 = tri.solve(f2, rhs)
    assert np.allclose(np.asarray(s1.blocks), np.asarray(s2.blocks), atol=1e-8)
    assert np.allclose(np.asarray(s1.coupling), np.asarray(s2.coupling), atol=1e-8)
    assert [int(v) for v in dense.inertia(f1)] == [int(v) for v in tri.inertia(f2)]


@pytest.mark.slow
def test_tridiag_sc_sharded_matches_serial():
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    from jax.sharding import Mesh

    kkt, rhs = _kkt_and_rhs(6)
    serial = SchurComplementSolver(
        block_size=16, schur_complement_solver=BlockTridiagSolver()
    )
    s1 = serial.solve(serial.numeric(kkt), rhs)
    mesh = Mesh(np.array(jax.devices()[:3]), ("blocks",))
    sharded = ShardedSchurComplementSolver(
        mesh=mesh, block_size=16, schur_complement_solver=BlockTridiagSolver()
    )
    f2 = sharded.numeric(kkt)
    s2 = sharded.solve(f2, rhs)
    assert np.allclose(np.asarray(s1.blocks), np.asarray(s2.blocks), atol=1e-9)
    assert np.allclose(np.asarray(s1.coupling), np.asarray(s2.coupling), atol=1e-9)


def test_ip_solve_and_fused_with_tridiag_sc():
    from test_dynamic import make_dynamic_spec

    spec = make_dynamic_spec(6)
    opts = pt.IPOptions()
    opts.linalg.solver = SchurComplementSolver(
        block_size=16, schur_complement_solver=BlockTridiagSolver()
    )
    iface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    assert pt.ip_solve(iface, opts) == pt.InteriorPointStatus.optimal
    iface2 = pt.DynamicSchurComplementInteriorPointInterface(spec)
    status, result = pt.ip_solve_fused(iface2, opts)
    assert status == pt.InteriorPointStatus.optimal


def test_fused_burgers_fast_path_tridiag():
    """Burgers with the production fast path (explicit W, f32 factor,
    tridiag SC) matches the dense-SC fast path's solution."""
    from parapint_tpu.examples import burgers

    spec = burgers.build_spec(nfe_x=10, nfe_t=32, num_time_blocks=4)
    opts = pt.IPOptions()
    opts.linalg.solver = SchurComplementSolver(
        block_size=128,
        explicit_inverse=True,
        factor_dtype=jnp.float32,
        refine_steps=0,
        schur_complement_solver=BlockTridiagSolver(factor_dtype=jnp.float32),
    )
    iface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    status, result = pt.ip_solve_fused(iface, opts)
    assert status == pt.InteriorPointStatus.optimal
    info = iface.convergence_info(result.state, 0.0, 100.0)

    opts2 = pt.IPOptions()
    opts2.linalg.solver = SchurComplementSolver(
        block_size=128, explicit_inverse=True, factor_dtype=jnp.float32,
        refine_steps=0,
    )
    iface2 = pt.DynamicSchurComplementInteriorPointInterface(spec)
    status2, result2 = pt.ip_solve_fused(iface2, opts2)
    assert status2 == pt.InteriorPointStatus.optimal
    info2 = iface2.convergence_info(result2.state, 0.0, 100.0)
    assert abs(float(info.objective) - float(info2.objective)) < 1e-7
