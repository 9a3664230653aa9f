"""On-device optimization loops.

Replaces three reference optimization backends with ``lax.scan`` loops that
run entirely on TPU:

  * torch optimizer loops (``generative_max_likelihood.py:306-341``,
    ``patch_eklt_pyramid2.py:259-288``) → :func:`run_first_order` (optax
    Adam/SGD/etc. + StepLR schedule + best-iterate tracking).
  * vendored scipy+autograd ``minimize`` (``src/solver/scipy_autograd/``)
    → per method family (:func:`run_scipy_method`): quasi-Newton names →
    :func:`run_lbfgs` (optax L-BFGS, zoom line search), derivative-free
    names → :func:`run_nelder_mead` (simplex scan), Hessian/HVP names →
    :func:`run_newton_cg` (CG on jvp-of-grad Hessian products, mirroring
    the torch wrapper's ``vhp`` path, ``torch_wrapper.py:51-73``).
  * optuna samplers (``generative_max_likelihood.py:215-276``)
    → :func:`run_sampler` (random / grid batched objective evaluation,
    vmapped so all trials execute as one device program).

Note: the reference's best-iterate bookkeeping holds a *reference* to the
mutating tensor (``best_x = x0`` at ``patch_eklt_pyramid2.py:275-277``), so it
actually returns the final iterate.  Here best tracking is done by value;
``track_best=False`` reproduces the reference behavior exactly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["OptResult", "run_first_order", "run_lbfgs", "run_nelder_mead",
           "run_newton_cg", "run_scipy_method", "run_sampler",
           "make_optimizer", "FIRST_ORDER_METHODS", "QUASI_NEWTON_METHODS",
           "DERIVATIVE_FREE_METHODS", "HESSIAN_METHODS", "SCIPY_METHODS",
           "SAMPLER_METHODS"]

# Torch-optimizer names accepted by the reference (``src/solver/base.py:37-51``)
# mapped to optax constructors.
FIRST_ORDER_METHODS = {
    "Adam": lambda lr: optax.adam(lr),
    "AdamW": lambda lr: optax.adamw(lr),
    "Adamax": lambda lr: optax.adamax(lr),
    "NAdam": lambda lr: optax.nadam(lr),
    "RAdam": lambda lr: optax.radam(lr),
    "Adagrad": lambda lr: optax.adagrad(lr),
    "Adadelta": lambda lr: optax.adadelta(lr),
    "RMSprop": lambda lr: optax.rmsprop(lr),
    "SGD": lambda lr: optax.sgd(lr),
    "ASGD": lambda lr: optax.sgd(lr),
    "Rprop": lambda lr: optax.rprop(lr),
}

# scipy.optimize methods accepted by the reference (``src/solver/base.py:20-35``)
# mapped per family (round 3 — the per-method table lives in
# docs/migration.md):
#   * quasi-Newton / gradient methods → optax L-BFGS with zoom line search,
#   * derivative-free methods → an on-device Nelder-Mead simplex scan,
#   * Hessian/HVP methods → Newton-CG with jvp-of-grad Hessian products.
QUASI_NEWTON_METHODS = ("BFGS", "L-BFGS-B", "LBFGS", "CG", "SLSQP")
DERIVATIVE_FREE_METHODS = ("Nelder-Mead", "Powell")
HESSIAN_METHODS = ("Newton-CG", "TNC", "trust-constr")
SCIPY_METHODS = (QUASI_NEWTON_METHODS + DERIVATIVE_FREE_METHODS
                 + HESSIAN_METHODS)


def run_scipy_method(objective, x0, n_iter, method, bounds=None) -> "OptResult":
    """Route a scipy method name to its on-device family implementation."""
    if method in DERIVATIVE_FREE_METHODS:
        return run_nelder_mead(objective, x0, n_iter, bounds=bounds)
    if method in HESSIAN_METHODS:
        return run_newton_cg(objective, x0, n_iter, bounds=bounds)
    return run_lbfgs(objective, x0, n_iter, bounds=bounds)

SAMPLER_METHODS = ("random", "grid", "uniform", "TPE")


class OptResult(Dict[str, Any]):
    """Dict result with attribute access (param/loss/best_iter/history)."""

    __getattr__ = dict.__getitem__


def make_optimizer(method: str, lr: float, lr_step: int, lr_decay: float):
    """Optax chain replicating ``torch.optim.<method>`` + ``StepLR``.

    Parity: ``patch_eklt_pyramid2.py:260-265`` — lr drops by ``lr_decay``
    every ``lr_step`` steps (with ``lr_step = n_iter`` the schedule is
    effectively constant, as in the shipped config).
    """
    if method not in FIRST_ORDER_METHODS:
        raise KeyError(f"Unsupported first-order method {method!r}")
    schedule = optax.exponential_decay(
        init_value=lr, transition_steps=max(lr_step, 1), decay_rate=lr_decay,
        staircase=True,
    )
    base = FIRST_ORDER_METHODS[method](schedule)
    return base


def run_first_order(
    objective: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    n_iter: int,
    method: str = "Adam",
    lr: float = 0.05,
    lr_decay: float = 0.1,
    lr_step: Optional[int] = None,
    track_best: bool = True,
    has_aux: bool = False,
    bounds: Optional[Tuple[jax.Array, jax.Array]] = None,
    record_every: int = 0,
) -> OptResult:
    """Run a first-order optimizer for ``n_iter`` steps inside ``lax.scan``.

    Returns the best-loss iterate (``track_best=True``) or the final iterate
    (reference behavior), plus the full loss history.  With ``has_aux`` the
    objective returns ``(loss, aux)`` and the stacked aux pytree is returned
    as ``aux_history`` (per-term cost history parity with
    ``CostBase.register_history``).  ``bounds = (lo, hi)`` projects every
    iterate onto the box (projected gradient step).  ``record_every = k > 0``
    additionally returns every k-th iterate as ``params_history`` (DEBUG
    optimization-evolution videos, the ``LossVideosMaker`` analogue); the
    stride is applied INSIDE the scan via a preallocated
    ``ceil(n_iter/k)``-slot buffer, so recording costs only the frames kept.
    """
    lr_step = n_iter if lr_step is None else lr_step
    opt = make_optimizer(method, lr, lr_step, lr_decay)
    vg = jax.value_and_grad(objective, has_aux=has_aux)
    n_rec = -(-n_iter // record_every) if record_every > 0 else 0

    def step(carry, _):
        x, opt_state, best_x, best_loss, best_it, it, buf = carry
        if has_aux:
            (loss, aux), grad = vg(x)
        else:
            loss, grad = vg(x)
            aux = None
        better = loss < best_loss
        best_x = jnp.where(better, x, best_x) if track_best else best_x
        best_it = jnp.where(better, it, best_it)
        best_loss = jnp.minimum(loss, best_loss)
        if record_every > 0:
            slot = it // record_every
            keep = it % record_every == 0
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(keep, x, buf[slot]), slot, 0)
        updates, opt_state = opt.update(grad, opt_state, x)
        x_new = optax.apply_updates(x, updates)
        if bounds is not None:
            x_new = jnp.clip(x_new, bounds[0], bounds[1])
        return ((x_new, opt_state, best_x, best_loss, best_it, it + 1, buf),
                (loss, aux))

    buf0 = (jnp.zeros((n_rec,) + x0.shape, x0.dtype) if record_every > 0
            else jnp.zeros((0,) + x0.shape, x0.dtype))
    init = (x0, opt.init(x0), x0, jnp.asarray(jnp.inf, x0.dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), buf0)
    carry, (history, aux_history) = jax.lax.scan(step, init, None,
                                                 length=n_iter)
    x, _, best_x, best_loss, best_it, _, buf = carry
    param = best_x if track_best else x
    return OptResult(param=param, loss=best_loss, best_iter=best_it,
                     history=history, aux_history=aux_history, last_param=x,
                     params_history=buf if record_every > 0 else None)


def run_lbfgs(
    objective: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    n_iter: int = 100,
    memory_size: int = 10,
    bounds: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> OptResult:
    """L-BFGS with zoom linesearch — the on-device replacement for the
    reference's scipy BFGS family routed through torch autograd
    (``src/solver/scipy_autograd/scipy_minimize.py:88-126``).

    ``bounds = (lo, hi)`` projects every iterate onto the box (the
    projected-L-BFGS treatment scipy's L-BFGS-B bounds map to on device).
    """
    opt = optax.lbfgs(memory_size=memory_size)
    vg = jax.value_and_grad(objective)

    def step(carry, it):
        x, opt_state, best_x, best_loss, best_it = carry
        loss, grad = vg(x)
        better = loss < best_loss
        best_x = jnp.where(better, x, best_x)
        best_it = jnp.where(better, it, best_it)
        best_loss = jnp.minimum(loss, best_loss)
        updates, opt_state = opt.update(
            grad, opt_state, x, value=loss, grad=grad, value_fn=objective)
        x = optax.apply_updates(x, updates)
        if bounds is not None:
            x = jnp.clip(x, bounds[0], bounds[1])
        return (x, opt_state, best_x, best_loss, best_it), loss

    init = (x0, opt.init(x0), x0, jnp.asarray(jnp.inf, x0.dtype),
            jnp.asarray(0, jnp.int32))
    (x, _, best_x, best_loss, best_it), history = jax.lax.scan(
        step, init, jnp.arange(n_iter, dtype=jnp.int32))
    final_loss = objective(x)
    use_final = final_loss < best_loss
    # when the post-loop iterate wins, report the last valid history index
    # (n_iter - 1) so best_iter always indexes `history`
    return OptResult(param=jnp.where(use_final, x, best_x),
                     loss=jnp.minimum(final_loss, best_loss),
                     best_iter=jnp.where(use_final,
                                         jnp.asarray(n_iter - 1, jnp.int32),
                                         best_it),
                     history=history, last_param=x)


def run_nelder_mead(
    objective: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    n_iter: int = 100,
    bounds: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> OptResult:
    """Derivative-free Nelder-Mead simplex, fully on device.

    The honest mapping for the reference's ``Nelder-Mead`` / ``Powell``
    scipy methods (previously routed to L-BFGS — a semantic change for
    derivative-free requests).  Standard coefficients (ρ=1, χ=2, ψ=0.5,
    σ=0.5) and scipy's initial simplex (x0 ± 5% per coordinate, 0.00025
    for zero coordinates).  The update is branchless — reflection,
    expansion, both contractions and the shrunk simplex are all evaluated
    each iteration and selected with ``where`` (d ≤ 4 for every solver
    here, so the extra evaluations are trivial next to a scan's worth of
    control flow) — making the whole loop one ``lax.scan``.
    """
    d = x0.shape[0]
    rho, chi, psi, sigma = 1.0, 2.0, 0.5, 0.5

    def project(x):
        return jnp.clip(x, bounds[0], bounds[1]) if bounds is not None else x

    x0 = project(x0)
    pert = jnp.where(x0 != 0, x0 * 0.05, 0.00025)
    if bounds is not None:
        # a vertex whose perturbed coordinate clips back onto x0 makes the
        # simplex rank-deficient — every affine combination then keeps that
        # coordinate frozen forever.  Perturb toward whichever side of the
        # box actually moves (both sides immovable only if lo == hi).
        up = jnp.clip(x0 + pert, bounds[0], bounds[1])
        down = jnp.clip(x0 - pert, bounds[0], bounds[1])
        diag_vals = jnp.where(jnp.abs(up - x0) > 0, up, down)
    else:
        diag_vals = x0 + pert
    idx = jnp.arange(d)
    simplex = jnp.concatenate(
        [x0[None], jnp.tile(x0, (d, 1)).at[idx, idx].set(diag_vals)],
        axis=0)
    fvals = jax.vmap(objective)(simplex)

    def step(carry, _it):
        simplex, fvals = carry
        order = jnp.argsort(fvals)
        simplex = simplex[order]
        fvals = fvals[order]
        xbar = jnp.mean(simplex[:d], axis=0)
        worst = simplex[d]

        xr = project(xbar + rho * (xbar - worst))
        xe = project(xbar + rho * chi * (xbar - worst))
        xoc = project(xbar + psi * rho * (xbar - worst))
        xic = project(xbar - psi * (xbar - worst))
        fr, fe, foc, fic = (objective(xr), objective(xe), objective(xoc),
                            objective(xic))

        # single-point replacement candidate per the NM decision tree
        expand = fr < fvals[0]
        new_x = jnp.where(expand & (fe < fr), xe, xr)
        new_f = jnp.where(expand & (fe < fr), fe, fr)
        use_oc = (fr >= fvals[d - 1]) & (fr < fvals[d])
        new_x = jnp.where(use_oc, xoc, new_x)
        new_f = jnp.where(use_oc, foc, new_f)
        use_ic = fr >= fvals[d]
        new_x = jnp.where(use_ic, xic, new_x)
        new_f = jnp.where(use_ic, fic, new_f)
        # shrink when the selected contraction failed to improve
        shrink = (use_oc & (foc > fr)) | (use_ic & (fic >= fvals[d]))

        replaced = simplex.at[d].set(new_x)
        freplaced = fvals.at[d].set(new_f)
        shrunk = project(simplex[0][None] + sigma * (simplex - simplex[0]))
        fshrunk = jax.vmap(objective)(shrunk)
        simplex = jnp.where(shrink, shrunk, replaced)
        fvals = jnp.where(shrink, fshrunk, freplaced)
        return (simplex, fvals), jnp.min(fvals)

    (simplex, fvals), history = jax.lax.scan(
        step, (simplex, fvals), jnp.arange(n_iter, dtype=jnp.int32))
    best = jnp.argmin(fvals)
    return OptResult(param=simplex[best], loss=fvals[best],
                     best_iter=jnp.asarray(n_iter - 1, jnp.int32),
                     history=history, last_param=simplex[best])


def run_newton_cg(
    objective: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    n_iter: int = 50,
    cg_iters: int = 10,
    bounds: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> OptResult:
    """Truncated-Newton via CG on Hessian-vector products.

    The honest mapping for the reference's ``Newton-CG`` / ``TNC`` /
    ``trust-constr`` scipy methods, whose torch wrapper supplies HVPs
    (``scipy_autograd/torch_wrapper.py:51-73``); here the HVP is
    ``jvp``-of-``grad`` (exact, one extra forward-over-reverse pass).  Each
    outer iteration CG-solves ``H d = −g`` (fixed ``cg_iters`` inner
    steps) and takes the largest backtracking step satisfying Armijo
    (branchless: all 8 candidate steps evaluated, first passing one
    selected; no pass → iterate unchanged).
    """
    grad_fn = jax.grad(objective)

    def project(x):
        return jnp.clip(x, bounds[0], bounds[1]) if bounds is not None else x

    ts = 0.5 ** jnp.arange(8, dtype=x0.dtype)

    def step(carry, it):
        x, best_x, best_loss, best_it = carry
        f0 = objective(x)
        g = grad_fn(x)

        def hvp(v):
            return jax.jvp(grad_fn, (x,), (v,))[1]

        d, _ = jax.scipy.sparse.linalg.cg(hvp, -g, maxiter=cg_iters)
        # fall back to steepest descent on a non-finite or ascent direction
        ok = jnp.all(jnp.isfinite(d)) & (jnp.dot(d, g) < 0)
        d = jnp.where(ok, d, -g)
        cand = project(x[None] + ts[:, None] * d[None])
        fc = jax.vmap(objective)(cand)
        armijo = fc <= f0 + 1e-4 * ts * jnp.dot(g, d)
        idx = jnp.argmax(armijo)  # first (largest) passing step
        any_ok = jnp.any(armijo)
        x_new = jnp.where(any_ok, cand[idx], x)
        better = f0 < best_loss
        best_x = jnp.where(better, x, best_x)
        best_loss = jnp.minimum(f0, best_loss)
        best_it = jnp.where(better, it, best_it)
        return (x_new, best_x, best_loss, best_it), f0

    init = (project(x0), x0, jnp.asarray(jnp.inf, x0.dtype),
            jnp.asarray(0, jnp.int32))
    (x, best_x, best_loss, best_it), history = jax.lax.scan(
        step, init, jnp.arange(n_iter, dtype=jnp.int32))
    final_loss = objective(x)
    use_final = final_loss < best_loss
    return OptResult(param=jnp.where(use_final, x, best_x),
                     loss=jnp.minimum(final_loss, best_loss),
                     best_iter=jnp.where(use_final,
                                         jnp.asarray(n_iter - 1, jnp.int32),
                                         best_it),
                     history=history, last_param=x)


def run_sampler(
    objective: Callable[[jax.Array], jax.Array],
    bounds: Tuple[jax.Array, jax.Array],
    n_trials: int,
    sampler: str = "random",
    key: Optional[jax.Array] = None,
) -> OptResult:
    """Batched black-box search over a box: all trials in one vmap.

    Replaces the optuna loop (``generative_max_likelihood.py:215-276``):
      * ``random`` — uniform samples (RandomSampler parity).
      * ``grid`` / ``uniform`` — per-dimension linspace grid, cartesian
        product truncated/cycled to ``n_trials`` like GridSampler over the
        reference's per-key arange (``gml:238-255``).
      * ``TPE`` — **fallback only** (vmapped/mesh contexts): two-stage
        random search — half the budget uniform, half resampled around the
        best decile.  The single-frame GML facade routes ``TPE`` to the
        true sequential sampler (:func:`..tpe.run_tpe`) instead; optuna's
        sequential TPE cannot batch.
    """
    lo, hi = (jnp.asarray(b, jnp.float32) for b in bounds)
    dim = lo.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    if sampler in ("grid", "uniform"):
        per_dim = int(max(2, round(n_trials ** (1.0 / dim))))
        axes = [jnp.linspace(lo[d], hi[d], per_dim) for d in range(dim)]
        mesh = jnp.meshgrid(*axes, indexing="ij")
        xs = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)
        losses = jax.vmap(objective)(xs)
        best = jnp.argmin(losses)
        return OptResult(param=xs[best], loss=losses[best], best_iter=best,
                         history=losses, last_param=xs[best])

    k1, k2 = jax.random.split(key)
    n1 = n_trials if sampler == "random" else max(n_trials // 2, 1)
    xs1 = jax.random.uniform(k1, (n1, dim), jnp.float32, lo, hi)
    losses1 = jax.vmap(objective)(xs1)
    if sampler == "random":
        best = jnp.argmin(losses1)
        return OptResult(param=xs1[best], loss=losses1[best], best_iter=best,
                         history=losses1, last_param=xs1[best])

    # Reaching here with "TPE" means a traced/vmapped context (multi-start
    # lanes, mesh-batched frames) where the sequential host TPE
    # (:mod:`.tpe`, used by the GML facade) cannot run — fall back to the
    # batched two-stage approximation and say so at trace time.
    if sampler == "TPE":
        import logging

        logging.getLogger(__name__).warning(
            "sampler 'TPE' inside a batched/traced context uses the "
            "two-stage random-search approximation, not sequential optuna "
            "TPE semantics (see docs/migration.md).")

    # "TPE"-style refinement: sample around the best-decile candidates.
    n2 = n_trials - n1
    n_top = max(n1 // 10, 1)
    top = jnp.argsort(losses1)[:n_top]
    centers = xs1[top[jax.random.randint(k2, (n2,), 0, n_top)]]
    spread = (hi - lo) * 0.1
    noise = jax.random.normal(jax.random.fold_in(k2, 1), (n2, dim), jnp.float32)
    xs2 = jnp.clip(centers + noise * spread, lo, hi)
    losses2 = jax.vmap(objective)(xs2)
    xs = jnp.concatenate([xs1, xs2])
    losses = jnp.concatenate([losses1, losses2])
    best = jnp.argmin(losses)
    return OptResult(param=xs[best], loss=losses[best], best_iter=best,
                     history=losses, last_param=xs[best])
