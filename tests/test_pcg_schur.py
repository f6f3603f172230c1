"""Matrix-free PCG Schur solver vs the explicit solvers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import parapint_tpu as pt
from parapint_tpu.linalg import PCGSchurComplementSolver, SchurComplementSolver


def test_pcg_matches_dense_on_dynamics():
    import sys

    sys.path.insert(0, "tests")
    from test_dynamic import make_dynamic_spec

    spec = make_dynamic_spec(4)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    state = interface.init_state()
    interface._current_state = state
    data = interface.eval_kkt_data(state, 0.1)
    # regularize lightly: the raw KKT has an exactly-zero pivot (end states
    # appear in no objective term), which unpivoted LDL rejects — exactly
    # the case the IP loop's inertia correction handles
    kkt = interface.assemble_kkt(data, 1e-6, 1e-8)
    rhs = interface.kkt_rhs(data)

    dense = SchurComplementSolver(block_size=16)
    f1 = dense.numeric(kkt)
    s1 = dense.solve(f1, rhs)

    pcg = PCGSchurComplementSolver(block_size=16)
    f2 = pcg.numeric(kkt)
    assert int(pcg.status(f2)) == 0
    s2 = pcg.solve(f2, rhs)
    assert np.allclose(np.asarray(s1.blocks), np.asarray(s2.blocks), atol=1e-8)
    assert np.allclose(np.asarray(s1.coupling), np.asarray(s2.coupling), atol=1e-8)
    # block inertia matches; SC part reported as (nc, 0, 0) by construction
    p1, n1, z1 = dense.inertia(f1)
    p2, n2, z2 = pcg.inertia(f2)
    assert (int(p1), int(n1), int(z1)) == (int(p2), int(n2), int(z2))


def test_ip_solve_with_pcg():
    import sys

    sys.path.insert(0, "tests")
    from test_dynamic import make_dynamic_spec, make_monolithic

    spec = make_dynamic_spec(3)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    options = pt.IPOptions()
    options.linalg.solver = PCGSchurComplementSolver(block_size=16)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal


def test_pcg_sharded():
    if len(jax.devices()) < 4:
        pytest.skip("needs devices")
    import sys

    sys.path.insert(0, "tests")
    from jax.sharding import Mesh
    from test_dynamic import make_dynamic_spec

    mesh = Mesh(np.array(jax.devices()[:4]), ("blocks",))
    spec = make_dynamic_spec(4)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec, mesh=mesh)
    options = pt.IPOptions()
    options.linalg.solver = PCGSchurComplementSolver(
        mesh=mesh, axis_name="blocks", block_size=16
    )
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal
