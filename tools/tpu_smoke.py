"""On-TPU validation gate: compile + run the EXACT production configs.

Round-2 shipped a production config (bench.py: b=128 fused factor+inverse
Pallas kernel) that had never run on a real chip and OOM'd scoped VMEM at
compile time, crashing the benchmark.  This gate exists so that can never
happen again: it jit-compiles and RUNS, on the real TPU backend,

  1. the Pallas panel kernels at every production shape,
  2. the ``__graft_entry__.entry()`` flagship step config,
  3. the exact ``bench.py`` solver config (b=128, winv on, chain SC,
     kkt_dtype=f32) on a reduced-but-same-shape Burgers problem
     (same block KKT size; fewer IP iterations),

and fails loudly on any compile error, runtime error, or non-finite result.

Run before shipping any change to the measured path:

    python tools/tpu_smoke.py

Exit code 0 = all production configs are chip-valid.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[tpu_smoke] {msg}", flush=True)


def check_backend():
    import jax

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        log(f"FAIL: need a real TPU backend, got {backend!r}")
        sys.exit(2)
    log(f"backend={backend} devices={jax.devices()}")


def smoke_pallas_kernels():
    """Production panel shapes: b=128 (bench), b=64 (graft entry)."""
    import jax
    import jax.numpy as jnp
    from parapint_tpu.ops import ldl, pallas_ldl

    rng = np.random.default_rng(0)
    for b, B in ((128, 64), (64, 64)):
        M = rng.standard_normal((B, b, b)).astype(np.float32)
        A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(b, dtype=np.float32))
        F_ref = jax.vmap(ldl._ldl_unblocked)(A)
        t0 = time.time()
        F = jax.block_until_ready(pallas_ldl.ldl_panels_batched(A))
        err = float(jnp.max(jnp.abs(jnp.tril(F) - jnp.tril(F_ref))))
        assert err < 1e-4 * b, f"factor kernel b={b}: err={err}"
        F2, W = jax.block_until_ready(pallas_ldl.ldl_panels_batched_winv(A))
        err2 = float(jnp.max(jnp.abs(jnp.tril(F2) - jnp.tril(F_ref))))
        assert err2 < 1e-4 * b, f"winv kernel b={b}: err={err2}"
        # round-4 slab kernels (the production default, PT_PANEL_ALGO=slab)
        F3 = jax.block_until_ready(pallas_ldl.ldl_panels_slab(A))
        err3 = float(jnp.max(jnp.abs(jnp.tril(F3) - jnp.tril(F_ref))))
        assert err3 < 1e-4 * b, f"slab kernel b={b}: err={err3}"
        F4, W4 = jax.block_until_ready(pallas_ldl.ldl_panels_slab_winv(A))
        L4 = jnp.tril(F4, -1) + jnp.eye(b, dtype=jnp.float32)[None]
        resid4 = float(
            jnp.max(jnp.abs(jnp.einsum("nij,njk->nik", L4, W4) - jnp.eye(b)))
        )
        assert resid4 < 1e-3, f"slab winv kernel b={b}: L@W resid={resid4}"
        # W = L^{-1}: check L @ W == I on a sample
        L = jnp.tril(F2, -1) + jnp.eye(b, dtype=jnp.float32)[None]
        resid = float(
            jnp.max(jnp.abs(jnp.einsum("nij,njk->nik", L, W) - jnp.eye(b)))
        )
        assert resid < 1e-3, f"winv kernel b={b}: L@W resid={resid}"
        log(
            f"pallas kernels b={b} B={B}: factor+winv OK "
            f"(err {err:.1e}/{err2:.1e}, {time.time()-t0:.1f}s incl compile)"
        )


def smoke_graft_entry():
    import jax
    import __graft_entry__ as g

    fn, args = g.entry()
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    leaves = jax.tree_util.tree_leaves(out)
    import jax.numpy as jnp

    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    log(f"__graft_entry__.entry() step OK ({time.time()-t0:.1f}s incl compile)")


def smoke_bench_config():
    """The exact bench.py solver config, on a reduced Burgers problem with
    the SAME per-block KKT shape class (nfe_x=50 -> same panel/block sizes;
    8 time blocks instead of 64 so the smoke stays fast)."""
    import jax
    import bench
    import parapint_tpu as pt

    interface = bench.build_problem(nfe_x=50, nfe_t=32, n_blocks=8)
    options = pt.IPOptions()
    options.tol = bench.TOL
    options.linalg.solver = bench._make_solver()
    solve = pt.make_fused_ip_solve(interface, options)
    interface.set_bounds_relaxation_factor(options.bounds_relaxation_factor)
    t0 = time.time()
    result = solve(interface.init_state())
    status = int(result.status)
    n_iter = int(result.iterations)
    assert status == pt.InteriorPointStatus.optimal.value, (
        status,
        n_iter,
        float(result.primal_inf),
        float(result.dual_inf),
    )
    log(
        f"bench config (b=128 winv, chain SC, kkt=f32) solved 8-block "
        f"Burgers: optimal in {n_iter} iters ({time.time()-t0:.1f}s incl "
        f"compile)"
    )


def smoke_sharded_mesh1():
    """Production config through the SHARDED path on a mesh of 1 chip.

    The sharded graph (shard_map + psum + tile-form SC + group_offset chain
    placement) is otherwise only exercised on the virtual CPU mesh; a
    1-device mesh proves the same program compiles and runs for the real
    TPU backend (collectives degenerate but the lowering is exercised)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    import bench
    import parapint_tpu as pt

    mesh = Mesh(np.array(jax.devices()[:1]), ("blocks",))
    interface = bench.build_problem(nfe_x=50, nfe_t=32, n_blocks=8)
    options = pt.IPOptions()
    options.tol = bench.TOL
    options.linalg.solver = pt.ShardedSchurComplementSolver(
        mesh, "blocks", block_size=128, explicit_inverse=True,
        factor_dtype=jnp.float32, refine_steps=0,
        schur_complement_solver=pt.BlockTridiagSolver(),
    )
    solve = pt.make_fused_ip_solve(interface, options)
    interface.set_bounds_relaxation_factor(options.bounds_relaxation_factor)
    t0 = time.time()
    result = solve(interface.init_state())
    status = int(result.status)
    n_iter = int(result.iterations)
    assert status == pt.InteriorPointStatus.optimal.value, (
        status, n_iter, float(result.primal_inf), float(result.dual_inf),
    )
    log(
        f"SHARDED production config (shard_map mesh=1, b=128 winv, tile-form "
        f"CR SC) solved 8-block Burgers: optimal in {n_iter} iters "
        f"({time.time()-t0:.1f}s incl compile)"
    )


def main():
    check_backend()
    smoke_pallas_kernels()
    smoke_graft_entry()
    smoke_bench_config()
    smoke_sharded_mesh1()
    log("ALL PRODUCTION CONFIGS CHIP-VALID")


if __name__ == "__main__":
    main()
