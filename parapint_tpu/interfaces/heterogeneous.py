"""Heterogeneous block families: different models for different blocks.

The reference allows every time block / scenario to be an arbitrary,
differently-shaped Pyomo model (``build_model_for_time_block`` is called
once per block, sc_ip_interface.py:143-177).  The uniform batched specs
cover the common case (identical structure + masks); this module covers the
general case with *kind-segmented batching*:

- blocks are grouped by "kind" (a shared set of model functions + dims);
- each kind's blocks are evaluated with one vmapped computation over that
  kind's sub-batch (a static gather), results are stitched back into the
  global (N, ...) arrays with static scatters;
- all kinds are padded to common maxima (n_x, n_eq, n_ineq) with the
  framework's mask machinery, so the KKT solver still sees one uniform
  batch of diagonal blocks.

Cost: one vmapped evaluation per kind per operation (kinds are typically
2-3: e.g. a first block with initial conditions, interior blocks, maybe a
terminal block) — no O(kinds^2) blowup, no lax.switch over all branches.
"""

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from parapint_tpu.interfaces.blocked import BatchedNLPFunctions
from parapint_tpu.interfaces.structured import StructuredSCInterface


@dataclasses.dataclass
class KindSpec:
    """One block kind: its model functions, dims, bounds and link indices.

    Functions receive this kind's *unpadded* variable vector (n_x,) and the
    kind's per-block parameter pytree.
    """

    objective: Callable
    n_x: int
    eq_constraints: Optional[Callable] = None
    ineq_constraints: Optional[Callable] = None
    xl: Optional[object] = None  # (n_x,)
    xu: Optional[object] = None
    gl: Optional[object] = None  # (n_ineq,)
    gu: Optional[object] = None
    start_state_idx: Optional[object] = None  # (num_states,), dynamic only
    end_state_idx: Optional[object] = None
    # probe params: an example parameter pytree for shape inference
    example_params: object = None

    def __post_init__(self):
        x = jnp.zeros(self.n_x)
        p = self.example_params
        self.n_eq = (
            int(jax.eval_shape(self.eq_constraints, x, p).shape[0])
            if self.eq_constraints is not None
            else 0
        )
        self.n_ineq = (
            int(jax.eval_shape(self.ineq_constraints, x, p).shape[0])
            if self.ineq_constraints is not None
            else 0
        )
        def _b(v, m, fill):
            return np.full(m, fill) if v is None else np.asarray(v, dtype=np.float64)
        self.xl = _b(self.xl, self.n_x, -np.inf)
        self.xu = _b(self.xu, self.n_x, np.inf)
        self.gl = _b(self.gl, self.n_ineq, -np.inf)
        self.gu = _b(self.gu, self.n_ineq, np.inf)


class MultiKindNLPFunctions:
    """Drop-in for BatchedNLPFunctions over a mixed-kind block batch.

    Parameters are held internally per kind (stacked over that kind's
    blocks); the ``params`` argument of the batched API is accepted for
    interface compatibility and ignored.
    """

    def __init__(
        self,
        kinds: List[KindSpec],
        kind_of_block: np.ndarray,
        params_per_block: Sequence,
        n_x: int,
        n_eq: int,
        n_ineq: int,
    ):
        self.n_x, self.n_eq, self.n_ineq = n_x, n_eq, n_ineq
        self.kinds = kinds
        self.kind_of_block = np.asarray(kind_of_block)
        N = len(self.kind_of_block)
        self.N = N
        self.kind_blocks = [
            np.where(self.kind_of_block == k)[0] for k in range(len(kinds))
        ]
        # stack per-kind params
        self.kind_params = []
        for k, idxs in enumerate(self.kind_blocks):
            if len(idxs) == 0:
                self.kind_params.append(None)
                continue
            stacked = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack([jnp.asarray(l) for l in leaves]),
                *[params_per_block[int(b)] for b in idxs],
            )
            self.kind_params.append(stacked)

        # per-kind padded sub-families reusing the uniform machinery
        self.sub = []
        for k in kinds:
            nk_x, nk_e, nk_i = k.n_x, k.n_eq, k.n_ineq

            def wrap_obj(fn=k.objective, nx=nk_x):
                return lambda x, p: fn(x[:nx], p)

            def wrap_eq(fn=k.eq_constraints, nx=nk_x, me=nk_e):
                if fn is None:
                    return None
                return lambda x, p: jnp.pad(fn(x[:nx], p), (0, n_eq - me))

            def wrap_ineq(fn=k.ineq_constraints, nx=nk_x, mi=nk_i):
                if fn is None:
                    return None
                return lambda x, p: jnp.pad(fn(x[:nx], p), (0, n_ineq - mi))

            self.sub.append(
                BatchedNLPFunctions(
                    wrap_obj(),
                    wrap_eq() if nk_e else None,
                    wrap_ineq() if nk_i else None,
                    n_x,
                    n_eq if nk_e else 0,
                    n_ineq if nk_i else 0,
                )
            )

    def _segmented(self, out_shape_fn, op_name, xs, xm, em, im, extra=None):
        """Run op per kind on its block subset, stitch into (N, ...)."""
        outs = None
        for k, idxs in enumerate(self.kind_blocks):
            if len(idxs) == 0:
                continue
            sub = self.sub[k]
            kspec = self.kinds[k]
            idx = jnp.asarray(idxs)
            args = [xs[idx], self.kind_params[k], xm[idx]]
            if op_name in ("c_eq", "jac_eq"):
                args.append(em[idx])
                fn = getattr(sub, op_name) if kspec.n_eq else None
            elif op_name in ("c_ineq", "jac_ineq"):
                args.append(im[idx])
                fn = getattr(sub, op_name) if kspec.n_ineq else None
            elif op_name == "hess_lag":
                yeq, yineq, obj_factor = extra
                args = [
                    xs[idx],
                    yeq[idx] if kspec.n_eq else jnp.zeros((len(idxs), 0)),
                    yineq[idx] if kspec.n_ineq else jnp.zeros((len(idxs), 0)),
                    obj_factor[idx],
                    self.kind_params[k],
                    xm[idx],
                    em[idx] if kspec.n_eq else jnp.zeros((len(idxs), 0), bool),
                    im[idx] if kspec.n_ineq else jnp.zeros((len(idxs), 0), bool),
                ]
                fn = sub.hess_lag
            else:
                fn = getattr(sub, op_name)
            if fn is None:
                res = jnp.zeros(out_shape_fn(len(idxs)))
            else:
                res = fn(*args)
                if res.shape[1:] != out_shape_fn(1)[1:]:
                    # kind had zero eq/ineq: pad feature dims
                    pads = [(0, 0)] + [
                        (0, t - s)
                        for s, t in zip(res.shape[1:], out_shape_fn(1)[1:])
                    ]
                    res = jnp.pad(res, pads)
            if outs is None:
                outs = jnp.zeros(out_shape_fn(self.N), dtype=res.dtype)
            outs = outs.at[idx].set(res)
        return outs

    # -- BatchedNLPFunctions-compatible API --------------------------------

    def f(self, xs, params, xm):
        return self._segmented(lambda n: (n,), "f", xs, xm, None, None)

    def total_objective(self, xs, params, xm):
        return jnp.sum(self.f(xs, params, xm))

    def grad_f(self, xs, params, xm):
        return self._segmented(lambda n: (n, self.n_x), "grad_f", xs, xm, None, None)

    def c_eq(self, xs, params, xm, em):
        return self._segmented(lambda n: (n, self.n_eq), "c_eq", xs, xm, em, None)

    def c_ineq(self, xs, params, xm, im):
        return self._segmented(
            lambda n: (n, self.n_ineq), "c_ineq", xs, xm, None, im
        )

    def jac_eq(self, xs, params, xm, em):
        return self._segmented(
            lambda n: (n, self.n_eq, self.n_x), "jac_eq", xs, xm, em, None
        )

    def jac_ineq(self, xs, params, xm, im):
        return self._segmented(
            lambda n: (n, self.n_ineq, self.n_x), "jac_ineq", xs, xm, None, im
        )

    def hess_lag(self, xs, yeq, yineq, obj_factor, params, xm, em, im):
        return self._segmented(
            lambda n: (n, self.n_x, self.n_x),
            "hess_lag",
            xs,
            xm,
            em,
            im,
            extra=(yeq, yineq, obj_factor),
        )

    def jtprod(self, xs, yeq, yineq, params, xm, em, im):
        """J_eq^T yeq + J_ineq^T yineq, segmented per kind, via each kind's
        VJP (see BatchedNLPFunctions.jtprod).  Same dual/mask layout as
        :meth:`hess_lag`: the per-kind subs use the unified padded widths."""
        outs = jnp.zeros((self.N, self.n_x), dtype=xs.dtype)
        for k, idxs in enumerate(self.kind_blocks):
            if len(idxs) == 0:
                continue
            sub = self.sub[k]
            kspec = self.kinds[k]
            idx = jnp.asarray(idxs)
            n = len(idxs)
            res = sub.jtprod(
                xs[idx],
                yeq[idx] if kspec.n_eq else jnp.zeros((n, 0)),
                yineq[idx] if kspec.n_ineq else jnp.zeros((n, 0)),
                self.kind_params[k],
                xm[idx],
                em[idx] if kspec.n_eq else jnp.zeros((n, 0)),
                im[idx] if kspec.n_ineq else jnp.zeros((n, 0)),
            )
            outs = outs.at[idx].set(res)
        return outs


class HeterogeneousDynamicInterface(StructuredSCInterface):
    """Dynamic SC interface with per-block kinds (see module docstring).

    Parameters
    ----------
    kinds: list of KindSpec (each with start/end_state_idx of equal length)
    kind_of_block: (N,) int, the kind of each time block
    params_per_block: length-N list of per-block parameter pytrees (the
        structure must match within a kind)
    x0_per_block: length-N list of initial primal vectors (kind-sized)
    """

    def __init__(
        self,
        kinds: List[KindSpec],
        kind_of_block,
        params_per_block,
        x0_per_block,
        mesh=None,
        axis_name: str = "blocks",
        kkt_dtype=None,
    ):
        from parapint_tpu.interfaces.blocked import selector_rows

        kind_of_block = np.asarray(kind_of_block)
        N = len(kind_of_block)
        n = max(k.n_x for k in kinds)
        me = max(k.n_eq for k in kinds)
        mi = max(k.n_ineq for k in kinds)
        ns_list = {
            len(np.asarray(k.start_state_idx)) for k in kinds if k.start_state_idx is not None
        }
        if len(ns_list) != 1:
            raise ValueError(
                "all kinds must declare start/end_state_idx of the same length"
            )
        ns = ns_list.pop()
        self.N, self.n, self.me, self.mi, self.ns = N, n, me, mi, ns
        self.ncv = ns * (N - 1)
        self.n_link = 2 * ns

        self.fns = MultiKindNLPFunctions(
            kinds, kind_of_block, params_per_block, n, me, mi
        )
        self.params = jnp.zeros(N)  # placeholder; MultiKind holds real params

        # per-block masks and bounds from the kind templates
        eq_mask = np.zeros((N, me), dtype=bool)
        ineq_mask = np.zeros((N, mi), dtype=bool)
        x_mask = np.zeros((N, n), dtype=bool)
        xl = np.full((N, n), -np.inf)
        xu = np.full((N, n), np.inf)
        gl = np.full((N, mi), -np.inf)
        gu = np.full((N, mi), np.inf)
        x0 = np.zeros((N, n))
        for b in range(N):
            k = kinds[kind_of_block[b]]
            eq_mask[b, : k.n_eq] = True
            ineq_mask[b, : k.n_ineq] = True
            x_mask[b, : k.n_x] = True
            xl[b, : k.n_x] = k.xl
            xu[b, : k.n_x] = k.xu
            gl[b, : k.n_ineq] = k.gl
            gu[b, : k.n_ineq] = k.gu
            x0[b, : k.n_x] = np.asarray(x0_per_block[b])
        self.eq_mask = jnp.asarray(eq_mask)
        self.ineq_mask = jnp.asarray(ineq_mask)
        self.x_mask = jnp.asarray(x_mask)
        self._xl, self._xu, self._gl, self._gu = xl, xu, gl, gu
        self.x0 = jnp.asarray(x0)

        # link structure with per-kind state indices
        blk = np.arange(N)
        bwd_mask = np.broadcast_to((blk > 0)[:, None], (N, ns)).astype(np.float64)
        fwd_mask = np.broadcast_to((blk < N - 1)[:, None], (N, ns)).astype(np.float64)
        self.bwd_mask = jnp.asarray(bwd_mask)
        self.fwd_mask = jnp.asarray(fwd_mask)
        link_rows = np.zeros((N, 2 * ns, n))
        for b in range(N):
            k = kinds[kind_of_block[b]]
            for j, si in enumerate(np.asarray(k.start_state_idx)):
                link_rows[b, j, si] = bwd_mask[b, j]
            for j, ei in enumerate(np.asarray(k.end_state_idx)):
                link_rows[b, ns + j, ei] = fwd_mask[b, j]
        self.link_rows = jnp.asarray(link_rows)
        self.link_mask = jnp.concatenate([self.bwd_mask, self.fwd_mask], axis=1)

        DUMP = self.ncv
        row_idx = np.full((N, 2 * ns), DUMP, dtype=np.int32)
        for i in range(N):
            if i > 0:
                row_idx[i, :ns] = (i - 1) * ns + np.arange(ns)
            if i < N - 1:
                row_idx[i, ns:] = i * ns + np.arange(ns)
        self.row_idx = jnp.asarray(row_idx)

        self.sc_assembly = "chain"
        # kkt_dtype: the x/dual/mask casts of the mixed-precision sweeps
        # apply; per-kind parameter pytrees stay in their own dtype (values
        # promote inside the kind functions), so the f32 speedup is partial
        # for kinds with f64 params — results are cast at data construction
        # either way.
        self._finalize(mesh=mesh, axis_name=axis_name, kkt_dtype=kkt_dtype)
