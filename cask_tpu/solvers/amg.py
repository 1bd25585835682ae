"""Smoothed-aggregation algebraic multigrid (AMG) preconditioner.

The scalable preconditioner for the Poisson/FEM class of matrices the
framework targets (cask's solver demo matrices — SURVEY.md §2 R7): CG
iteration counts stay O(1) as the grid grows, where ILU/Jacobi degrade.

Split per the architecture invariant (host planning / device compute):

- **Setup (host, once per structure+values):** strength-of-connection
  graph → greedy (Vaněk-style) aggregation → piecewise-constant
  tentative prolongator → Jacobi-smoothed prolongator → Galerkin
  ``A_c = Pᵀ A P`` coarse operators, recursing until the coarsest level
  is small enough to invert densely.  scipy.sparse does the one-off
  triple products, like the ILU(0) host path.
- **Apply (device):** one V-cycle — weighted-Jacobi pre/post smoothing,
  restriction/prolongation as SpMVs on device-resident CSRs, a dense
  matmul coarse solve — unrolled over the (static) level hierarchy into
  a single jittable callable, so ``cg(..., M=amg)`` compiles to one
  device program with no host round-trips.

With ``nu_pre == nu_post`` and the symmetric Jacobi smoother the
V-cycle is a symmetric positive-definite operator for SPD ``A``, hence
a valid CG preconditioner.  Levels are single-shard; distributed AMG
(aggregating within shards) is future work — use
:func:`~cask_tpu.solvers.precond.chebyshev_precond` or ``shard_ilu0``
on meshes.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from cask_tpu.formats.convert import from_scipy, to_scipy
from cask_tpu.formats.matrix import CSR
from cask_tpu.ops.spmv import spmv


def _strength_graph(a_sp, theta: float):
    """Symmetric strength-of-connection mask: |a_ij| ≥ θ·√(a_ii·a_jj)."""
    import scipy.sparse as sp

    d = np.abs(a_sp.diagonal())
    d = np.where(d == 0, 1.0, d)
    coo = a_sp.tocoo()
    scale = np.sqrt(d[coo.row] * d[coo.col])
    keep = (np.abs(coo.data) >= theta * scale) & (coo.row != coo.col)
    s = sp.csr_matrix(
        (np.ones(int(keep.sum())), (coo.row[keep], coo.col[keep])),
        shape=a_sp.shape)
    return s.maximum(s.T).tocsr()


def _aggregate(strength) -> np.ndarray:
    """Greedy aggregation over the strength graph (Vaněk pass 1+2+3).

    Returns ``agg[i]`` = aggregate id of node ``i`` (every node is
    assigned; isolated nodes become singletons).  Routes through the
    native C++ core when available — the row-order greedy passes are a
    pure-Python O(n) loop otherwise, the dominant term of AMG setup at
    1M rows (probe_amg2: 34 s total setup) — with this Python body as
    the bit-identical fallback (parity-tested).
    """
    try:
        from cask_tpu.native import binding

        agg, _ = binding.aggregate(strength.indptr, strength.indices)
        return agg
    except Exception:
        pass
    n = strength.shape[0]
    indptr, indices = strength.indptr, strength.indices
    agg = np.full(n, -1, dtype=np.int64)
    next_id = 0
    # pass 1: roots whose strong neighborhood is fully unaggregated
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        if (agg[nbrs] == -1).all():
            agg[i] = next_id
            agg[nbrs] = next_id
            next_id += 1
    # pass 2: attach leftovers to any aggregated strong neighbor
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        hit = nbrs[agg[nbrs] != -1]
        if hit.size:
            agg[i] = agg[hit[0]]
    # pass 3: remaining isolated nodes become singletons
    for i in range(n):
        if agg[i] == -1:
            agg[i] = next_id
            next_id += 1
    return agg


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AmgLevel:
    # operators are whatever plan the router picked: a DiaMatrix (banded
    # levels), PohMatrix (unstructured levels), dense jax.Array (small
    # levels), or device CSR (route="csr" — the gather fallback); the
    # generic `spmv` dispatch serves them all.  Registered as a pytree
    # so the WHOLE hierarchy can ride into jitted solves as an ARGUMENT
    # instead of closure constants — probe_amg9 measured the
    # closure-constant program compiling 11x slower at 16 call sites,
    # and per-call retrace+hash of inline-constant programs is the
    # ~25-47 s AMG "dispatch wall" of probe_amg6/8
    a: object  # level operator (device)
    p: object  # prolongator (n_fine × n_coarse, device)
    r: object  # restriction = Pᵀ (device)
    dinv: jax.Array  # 1/diag(a) for Jacobi smoothing (device)


def _apply_op(op, x, precision: str = "split"):
    if isinstance(op, jax.Array):
        return op @ x
    if isinstance(op, _FactoredApply):
        return op(x, precision)
    from cask_tpu.ops.pallas.poh_kernels import PohMatrix

    if isinstance(op, PohMatrix):
        return op.spmv(x, precision=precision)
    return spmv(op, x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _FactoredApply:
    """Smoothed prolongator applied in FACTORED form (probe_amg3: the
    materialized smoothed P/R as POH packs were the V-cycle's dominant
    term — 11.5 ms of the 11 ms cycle at 1M rows, ~3 slots/fine-row
    each way).  With ``P = (I − ω_s D⁻¹A)·T``:

        P·xc = t − ω_s·D⁻¹·(A·t),          t = T·xc
        R·r  = Tᵀ·(r − ω_s·A·(D⁻¹·r))      (A symmetric)

    so each application is one ONE-HOT tentative pack (exactly 1
    slot/fine-row — the minimal POH) plus one application of the level
    operator ``a``, which is already routed through the fast device
    path (DIA at the fine level).  Strictly fewer slot-streams and the
    A-apply rides the 0.9-class kernel instead of the ~4 Gnnz/s POH
    floor."""

    kind: str = dataclasses.field(metadata=dict(static=True))  # 'p' | 'r'
    tent: object  # PohMatrix, (n × nc) one-hot
    tent_t: object  # PohMatrix, (nc × n)
    a: object  # routed level operator
    dinv: jax.Array
    omega_s: float = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return self.tent.shape if self.kind == "p" else self.tent_t.shape

    def __call__(self, x, precision: str = "split"):
        w = jnp.asarray(self.omega_s, self.dinv.dtype)
        if self.kind == "p":
            t = _apply_op(self.tent, x, precision)
            return t - w * self.dinv * _apply_op(self.a, t, precision)
        return _apply_op(self.tent_t,
                         x - w * _apply_op(self.a, self.dinv * x, precision),
                         precision)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AmgPrecond:
    """Callable ``r → V-cycle(r) ≈ A⁻¹r``; pass as ``M=`` to the solvers.

    A registered pytree: pass the hierarchy INTO a jitted solve as an
    argument — ``jax.jit(lambda b, M: cg(op, b, M=M).x)(b, M)`` — and
    hold that one jitted callable for repeat solves.  Re-tracing a
    solve that closes over the hierarchy hashes hundreds of MB of
    inline constants per call: that is probe_amg6/8's ~25-47 s
    "dispatch wall" (probe_amg9/10 attribution).

    ``poh_precision``: MXU rounding mode for every POH-routed operator
    in the cycle (level operators and P/R packs).  ``'fast'`` runs the
    one-hot matmuls in a single default-precision pass — bf16-rounded
    products — which is admissible for a *preconditioner* (M need only
    stay a fixed, roughly-SPD linear operator; CG sees the same M every
    iteration) and roughly halves the POH share of the cycle.  Keep
    ``'split'`` (exact f32) when using the cycle as a standalone solver.
    """

    levels: List[AmgLevel]
    coarse_inv: jax.Array  # dense inverse of the coarsest operator
    omega: float = dataclasses.field(metadata=dict(static=True))
    nu_pre: int = dataclasses.field(metadata=dict(static=True))
    nu_post: int = dataclasses.field(metadata=dict(static=True))
    poh_precision: str = dataclasses.field(
        default="split", metadata=dict(static=True))

    @property
    def level_sizes(self) -> List[int]:
        return [lv.a.shape[0] for lv in self.levels] + [self.coarse_inv.shape[0]]

    def _cycle(self, b, lvl: int):
        if lvl == len(self.levels):
            return self.coarse_inv @ b
        level = self.levels[lvl]
        w = self.omega
        prec = self.poh_precision
        x = w * level.dinv * b  # first sweep from x = 0
        for _ in range(self.nu_pre - 1):
            x = x + w * level.dinv * (b - _apply_op(level.a, x, prec))
        resid = b - _apply_op(level.a, x, prec)
        xc = self._cycle(_apply_op(level.r, resid, prec), lvl + 1)
        x = x + _apply_op(level.p, xc, prec)
        for _ in range(self.nu_post):
            x = x + w * level.dinv * (b - _apply_op(level.a, x, prec))
        return x

    def apply(self, r):
        return self._cycle(r, 0)

    def __call__(self, r):
        return self.apply(r)


def smoothed_aggregation_amg(a: CSR, *, theta: float = 0.08, omega: float = 2.0 / 3.0,
                             nu_pre: int = 1, nu_post: int = 1, smooth: bool = True,
                             max_levels: int = 12, coarse_size: int = 256,
                             dtype=None, route: str = "auto",
                             dense_cutoff: int = 2048,
                             poh_precision: str = "split") -> AmgPrecond:
    """Build a smoothed-aggregation AMG hierarchy for SPD ``a``.

    ``theta`` is the strength threshold (smaller ⇒ coarser aggregates);
    ``smooth=False`` gives plain (unsmoothed) aggregation — cheaper
    setup, slower convergence.  ``dtype`` overrides the apply precision
    (e.g. ``jnp.float32`` to run the V-cycle at MXU-native precision
    inside an f64 outer solve via :func:`~cask_tpu.solvers.ir_solve`).

    ``route='auto'`` sends each level operator through the fastest
    device path — DIA plans for banded levels, POH (gather-free one-hot
    MXU) for unstructured ones, dense matmuls below ``dense_cutoff``
    rows.  On TPU the csr_xla gather formulation runs at ~65 Mnnz/s
    (PERF.md), which made the V-cycle apply-dominated exactly like exact
    ILU (probe_amg1: 489 ms/cycle — VERDICT r2 item 7); routing is what
    makes AMG the *usable* shipped alternative.  ``route='csr'`` keeps
    the old behavior (reference/debug).
    """
    import scipy.sparse as sp

    a_sp = to_scipy(a).tocsr().astype(np.float64)
    levels: List[AmgLevel] = []

    def put(mat_sp, row_panel: int = 4096, tile_slots: int = 2048):
        mat_sp = mat_sp.tocsr()
        apply_dt = np.dtype(dtype) if dtype is not None else mat_sp.dtype
        if route == "auto":
            m_, n_ = mat_sp.shape
            if max(m_, n_) <= dense_cutoff:
                return jnp.asarray(mat_sp.toarray().astype(apply_dt))
            csr = from_scipy(mat_sp, format="csr")
            if dtype is not None:
                csr = csr.astype(dtype)
            from cask_tpu.ops.dia import dia_plan, estimate_dia_traffic

            est = estimate_dia_traffic(csr)
            if est is not None:
                return dia_plan(csr).device_put()
            from cask_tpu.ops.pallas.poh_kernels import poh_plan

            # tile size is pattern-dependent (measured): T=2048 is ~4x
            # faster per slot on scattered patterns (probe_poh7's 50k
            # power-law sweep) while the REGULAR perfect-fill tentative
            # packs run ~10% better at T=8192 (probe_amg7 vs amg5) —
            # callers pick per pack
            return poh_plan(csr, tile_slots=tile_slots,
                            row_panel=row_panel).device_put()
        m = from_scipy(mat_sp, format="csr")
        if dtype is not None:
            m = m.astype(dtype)
        return m.device_put()

    while a_sp.shape[0] > coarse_size and len(levels) < max_levels:
        strength = _strength_graph(a_sp, theta)
        agg = _aggregate(strength)
        n_agg = int(agg.max()) + 1
        if n_agg >= a_sp.shape[0]:  # no coarsening possible (e.g. diagonal)
            break
        n = a_sp.shape[0]
        tent = sp.csr_matrix(
            (np.ones(n), (np.arange(n), agg)), shape=(n, n_agg))
        rho = None
        if smooth:
            dvals = a_sp.diagonal()
            dinv_h = np.where(dvals == 0, 0.0, 1.0 / np.where(dvals == 0, 1.0, dvals))
            da = sp.diags(dinv_h) @ a_sp
            # spectral-radius upper bound for the smoothing weight
            rho = float(abs(da).sum(axis=1).max())
            prol = (tent - (4.0 / 3.0 / rho) * (da @ tent)).tocsr()
        else:
            prol = tent
        a_coarse = (prol.T @ a_sp @ prol).tocsr()
        a_coarse.sum_duplicates()

        dvals = a_sp.diagonal()
        dinv = np.where(dvals == 0, 0.0, 1.0 / np.where(dvals == 0, 1.0, dvals))
        apply_dtype = np.dtype(dtype) if dtype is not None else a_sp.dtype
        a_dev = put(a_sp)
        dinv_dev = jnp.asarray(dinv.astype(apply_dtype))
        if smooth and route == "auto" and n > dense_cutoff:
            # factored application: the device never materializes the
            # smoothed P/R — only the one-hot tentative packs (1
            # slot/row) plus the already-routed level operator
            # (_FactoredApply docstring; probe_amg3 decomposition)
            # tall 1-slot/row tentative packs fill tiles poorly at the
            # default 4096-row panels (each (panel, window) group pads
            # to whole 8192-slot tiles); 16384-row panels quarter the
            # group count (probe_amg4's ~2.2 ns/slot floor analysis)
            fp = dict(tent=put(tent, row_panel=16384, tile_slots=8192),
                      tent_t=put(tent.T.tocsr(), row_panel=16384,
                                 tile_slots=8192),
                      a=a_dev, dinv=dinv_dev, omega_s=4.0 / 3.0 / rho)
            p_dev = _FactoredApply(kind="p", **fp)
            r_dev = _FactoredApply(kind="r", **fp)
        else:
            p_dev = put(prol)
            r_dev = put(prol.T.tocsr())
        levels.append(AmgLevel(a=a_dev, p=p_dev, r=r_dev, dinv=dinv_dev))
        a_sp = a_coarse

    coarse = np.linalg.inv(a_sp.toarray())
    if dtype is not None:
        coarse = coarse.astype(np.dtype(dtype))
    return AmgPrecond(levels=levels, coarse_inv=jnp.asarray(coarse),
                      omega=omega, nu_pre=nu_pre, nu_post=nu_post,
                      poh_precision=poh_precision)
