"""Worker body for the 2-process sharded-solver test (the reference's
``mpirun -np 2 ... -m pytest`` analogue, main_ci.yml:33-41).

Run as:  python multiprocess_worker.py <process_id> <num_processes> <port>

Every process builds the SAME deterministic block-bordered system, places
it on a global mesh spanning both processes, runs the sharded Schur solver
(collectives cross the process boundary over TCP), and checks the result
against a dense oracle.  Prints "WORKER_OK <pid>" on success.
"""

import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parapint_tpu.parallel import distributed

distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=proc_id,
    local_device_count=4,
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import parapint_tpu as pt
from parapint_tpu.linalg import BlockTridiagSolver, ShardedSchurComplementSolver
from parapint_tpu.linalg.schur import BlockKKT, BlockRhs

assert len(jax.devices()) == 4 * nprocs, jax.devices()
mesh = distributed.global_mesh("blocks")

# deterministic system, identical on every process
rng = np.random.default_rng(0)
N, nk, nc = 8, 12, 5
diag = np.zeros((N, nk, nk))
border = rng.standard_normal((N, nc, nk))
for i in range(N):
    A = rng.standard_normal((nk, nk))
    diag[i] = A @ A.T + nk * np.eye(nk)
q = np.eye(nc) * nc + 0.1
rhs_blocks = rng.standard_normal((N, nk))
rhs_coupling = rng.standard_normal(nc)

# dense oracle (host, per process)
M = np.zeros((N * nk + nc, N * nk + nc))
for i in range(N):
    M[i * nk : (i + 1) * nk, i * nk : (i + 1) * nk] = diag[i]
    M[N * nk :, i * nk : (i + 1) * nk] = border[i]
    M[i * nk : (i + 1) * nk, N * nk :] = border[i].T
M[N * nk :, N * nk :] = q
expected = np.linalg.solve(M, np.concatenate([rhs_blocks.ravel(), rhs_coupling]))

# global placement: block axis sharded across ALL 8 devices (2 processes)
kkt = BlockKKT.make(
    *distributed.replicated_to_global(mesh, P("blocks"), (diag, border)),
    distributed.replicated_to_global(mesh, P(), q),
)
rhs = BlockRhs(
    blocks=distributed.replicated_to_global(mesh, P("blocks"), rhs_blocks),
    coupling=distributed.replicated_to_global(mesh, P(), rhs_coupling),
)

solver = ShardedSchurComplementSolver(mesh=mesh, block_size=16)
sol = jax.jit(lambda k, r: solver.solve(solver.numeric(k), r))(kkt, rhs)

# coupling is replicated -> fully addressable on every process
y = np.asarray(sol.coupling)
assert np.allclose(y, expected[N * nk :], rtol=1e-8, atol=1e-8), (
    y,
    expected[N * nk :],
)
# block solutions: check the shards THIS process owns
for shard in sol.blocks.addressable_shards:
    lo = shard.index[0].start or 0
    got = np.asarray(shard.data)
    exp = expected[: N * nk].reshape(N, nk)[lo : lo + got.shape[0]]
    assert np.allclose(got, exp, rtol=1e-8, atol=1e-8)

# inertia (psum across processes) must match the dense eigvals
fact = jax.jit(solver.numeric)(kkt)
pos, neg, zero = (int(v) for v in solver.inertia(fact))
w = np.linalg.eigvalsh(M)
assert (pos, neg, zero) == ((w > 0).sum(), (w < 0).sum(), 0), (pos, neg, zero)

# full interface + fused solve across both processes: the multichip dryrun
# under real multi-process execution (2-process analogue of
# __graft_entry__.dryrun_multichip)
from parapint_tpu.examples import burgers

spec = burgers.build_spec(nfe_x=4, nfe_t=16, num_time_blocks=8)
iface = pt.DynamicSchurComplementInteriorPointInterface(spec, mesh=mesh)
opts = pt.IPOptions()
opts.max_iter = 3  # a dryrun: a few sharded iterations, not full convergence
opts.linalg.solver = ShardedSchurComplementSolver(
    mesh, "blocks", block_size=32,
    schur_complement_solver=BlockTridiagSolver(),
)
status, result = pt.ip_solve_fused(iface, opts)
assert int(result.iterations) >= 1
for leaf in jax.tree_util.tree_leaves(result.state):
    if hasattr(leaf, "addressable_shards"):
        for shard in leaf.addressable_shards:
            assert np.all(np.isfinite(np.asarray(shard.data)))

print(f"WORKER_OK {proc_id}", flush=True)
