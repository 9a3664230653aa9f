"""Whole-ROI generative maximum-likelihood solver (2-4 scalar parameters).

TPU-native re-design of ``GenerativeMaximumLikelihood``
(``src/solver/generative_max_likelihood.py``): one patch covering the ROI,
parameters [angle | vx, vy] (+ optional global pattern shift p_x, p_y), fitted
by an on-device optimizer:

  * torch-optimizer names → optax first-order scan (``gml:306-341``),
  * scipy methods → per-family on-device loops (``gml:278-304``):
    quasi-Newton → optax L-BFGS, Nelder-Mead/Powell → simplex scan,
    Newton-CG/TNC/trust-constr → HVP Newton-CG,
  * optuna samplers → batched random/grid search (``gml:215-276``) or the
    true sequential TPE study (:mod:`..tpe`) via the facade.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.gradients import frame_gradients
from ..optim import (
    FIRST_ORDER_METHODS,
    SAMPLER_METHODS,
    SCIPY_METHODS,
    run_first_order,
    run_sampler,
    run_scipy_method,
)
from ..types import Events
from .generative import (
    GenerativeSpec,
    iwe_cache,
    measured_increment,
    scalar_objective,
    unfold_scalar_params,
)

__all__ = ["GmlSpec", "initialize_theta", "solve_gml", "estimate_frame_gml",
           "make_host_objective", "make_host_tpe_solver"]


@dataclasses.dataclass(frozen=True)
class GmlSpec:
    """Static whole-ROI solver configuration."""

    gen: GenerativeSpec
    roi: Tuple[int, int, int, int]
    method: str = "Adam"
    n_iter: int = 600
    lr: float = 0.01  # reference ``gml:323``
    lr_decay: float = 0.1
    # box bounds per parameter for sampler methods (``hot_plate1.yaml:69-79``)
    param_bounds: Tuple[Tuple[float, float], ...] = ()
    track_best: bool = True
    # > 0: record every k-th iterate for DEBUG evolution videos
    # (first-order methods only; see solver.evolution)
    record_evolution: int = 0

    def __post_init__(self):
        # Sampler methods draw every parameter from its configured box, so
        # a bounds/model mismatch (e.g. `optimize_warp: true` with only
        # v_x/v_y under `optimizer.parameters`) would otherwise surface as
        # an opaque IndexError deep inside `unfold_scalar_params`.  The
        # reference fails on the same mismatch with a KeyError at
        # `_objective_optuna`'s suggest calls (``gml:241-255``); fail loud
        # here with the actual fix instead.
        from ..optim import SAMPLER_METHODS

        if self.method in SAMPLER_METHODS and (
                len(self.param_bounds) != self.gen.param_dim):
            gen = self.gen
            head = (["angle"] if gen.angle_model
                    else ["p_intensity"] if gen.poisson_model
                    else ["v_x", "v_y"])
            warp = ((["p_magn", "p_angle"] if gen.pxpy_as_anglemagn
                     else ["p_x", "p_y"]) if gen.optimize_warp else [])
            raise ValueError(
                f"sampler {self.method!r} needs a bounds box per model "
                f"parameter: this model (angle_model={gen.angle_model}, "
                f"poisson_model={gen.poisson_model}, "
                f"optimize_warp={gen.optimize_warp}) has "
                f"{gen.param_dim} parameters ({', '.join(head + warp)}) "
                f"but `optimizer.parameters` configures "
                f"{len(self.param_bounds)}")


def initialize_theta(key: jax.Array, spec: GmlSpec) -> jax.Array:
    """Initial scalar parameter vector (``gml:425-450``)."""
    gen = spec.gen
    if gen.angle_model:
        head = jnp.array([jnp.pi], gen.dtype)
    elif gen.poisson_model:
        base = jax.random.uniform(key, (), gen.dtype, -1.0, 1.0)
        head = base[None]
    else:
        head = jnp.zeros((2,), gen.dtype)
    if gen.optimize_warp:
        return jnp.concatenate([head, jnp.zeros((2,), gen.dtype)])
    return head


def solve_gml(
    histogram: jax.Array,
    weights: Optional[jax.Array],
    weight_inverse: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    key: jax.Array,
    spec: GmlSpec,
    x0: Optional[jax.Array] = None,
):
    """Fit the scalar parameters; returns ``(theta, result)``."""
    gen = spec.gen
    x0r, x1r, y0r, y1r = spec.roi
    measured = measured_increment(histogram, weights, roi=spec.roi)
    weights_roi = None if weights is None else weights[x0r:x1r, y0r:y1r]

    def objective(theta):
        loss, _terms = scalar_objective(
            theta, measured, gx, gy, weight_inverse, spec.roi, gen,
            weights_roi=weights_roi)
        return loss

    if spec.method in SAMPLER_METHODS:
        lo = jnp.array([b[0] for b in spec.param_bounds], gen.dtype)
        hi = jnp.array([b[1] for b in spec.param_bounds], gen.dtype)
        result = run_sampler(objective, (lo, hi), spec.n_iter, spec.method, key)
        return result.param, result

    if x0 is None:
        x0 = initialize_theta(key, spec)
    if spec.method in FIRST_ORDER_METHODS:
        result = run_first_order(objective, x0, spec.n_iter, spec.method,
                                 lr=spec.lr, lr_decay=spec.lr_decay,
                                 track_best=spec.track_best,
                                 record_every=spec.record_evolution)
    elif spec.method in SCIPY_METHODS:
        # family routing: quasi-Newton → L-BFGS, derivative-free →
        # Nelder-Mead, Hessian/HVP → Newton-CG (docs/migration.md table)
        result = run_scipy_method(objective, x0, spec.n_iter, spec.method)
    else:
        raise KeyError(f"Unknown optimizer method {spec.method!r}")
    return result.param, result


def estimate_frame_gml(
    ev: Events,
    frame: jax.Array,
    key: jax.Array,
    spec: GmlSpec,
    x0: Optional[jax.Array] = None,
):
    """Whole per-frame GML solve → constant dense flow ``[2, H, W]``.

    Parity: ``GenerativeMaximumLikelihood.estimate`` (``gml:681-711``): the
    best (vx, vy) is broadcast over the full original image.
    """
    gen = spec.gen
    frame = frame.astype(gen.dtype)
    gx, gy = frame_gradients(frame, ksize=gen.sobel_ksize,
                             use_log_intensity=gen.use_log_intensity)
    hist, weights, weight_inverse = iwe_cache(ev, gen)
    theta, result = solve_gml(hist, weights, weight_inverse, gx, gy, key,
                              spec, x0=x0)
    vx, vy, _pxy = unfold_scalar_params(theta, gen)
    flow = jnp.broadcast_to(jnp.stack([vx, vy])[:, None, None],
                            (2,) + gen.image_size)
    aux = {"theta": theta, "loss": result.loss, "history": result.history}
    if spec.record_evolution > 0 and result.get("params_history") is not None:
        aux["theta_history"] = result["params_history"]
    return flow, aux


def make_host_objective(spec: GmlSpec):
    """Per-frame host objective factory for host-driven studies.

    Returns ``obj_for(ev, frame) -> objective`` where ``objective`` maps a
    host ``(dim,)`` parameter array to a scalar loss via one small jitted
    device program per call — the reference's optuna-trial execution shape
    (``gml:256-276``).  The heavy per-frame state (measured increment,
    frame gradients, weight maps) is prepared once in a single jitted
    program and stays on device across all trials.  Shared by
    :func:`make_host_tpe_solver` and the sampler-benchmark tests
    (``tests/test_tpe.py``)."""
    import numpy as np

    gen = spec.gen
    x0r, x1r, y0r, y1r = spec.roi

    @jax.jit
    def prepare(ev: Events, frame: jax.Array):
        frame = frame.astype(gen.dtype)
        gx, gy = frame_gradients(frame, ksize=gen.sobel_ksize,
                                 use_log_intensity=gen.use_log_intensity)
        hist, weights, weight_inverse = iwe_cache(ev, gen)
        measured = measured_increment(hist, weights, roi=spec.roi)
        weights_roi = None if weights is None else weights[x0r:x1r, y0r:y1r]
        return measured, weights_roi, weight_inverse, gx, gy

    @jax.jit
    def eval_theta(theta, measured, weights_roi, weight_inverse, gx, gy):
        loss, _terms = scalar_objective(
            theta, measured, gx, gy, weight_inverse, spec.roi, gen,
            weights_roi=weights_roi)
        return loss

    def obj_for(ev: Events, frame: jax.Array):
        prep = prepare(ev, frame)

        def objective(x: np.ndarray) -> float:
            return float(eval_theta(jnp.asarray(x, gen.dtype), *prep))

        return objective

    return obj_for


def make_host_tpe_solver(spec: GmlSpec):
    """Host-driven sequential TPE solve path (true optuna TPE semantics).

    TPE is sequential — each proposal conditions on every previous trial's
    loss — so it cannot live inside one jitted program like the batched
    samplers.  This mirrors the reference's execution shape exactly: the
    study loop runs on host (``gml:215-236``), the objective is one small
    device program per trial (see :func:`make_host_objective`).
    """
    from ..tpe import run_tpe

    gen = spec.gen
    obj_for = make_host_objective(spec)

    def solve(ev: Events, frame: jax.Array, seed: int):
        objective = obj_for(ev, frame)

        lo = [b[0] for b in spec.param_bounds]
        hi = [b[1] for b in spec.param_bounds]
        result = run_tpe(objective, (lo, hi), spec.n_iter, seed=seed)
        theta = jnp.asarray(result.param, gen.dtype)
        vx, vy, _pxy = unfold_scalar_params(theta, gen)
        flow = jnp.broadcast_to(jnp.stack([vx, vy])[:, None, None],
                                (2,) + gen.image_size)
        aux = {"theta": theta, "loss": result.loss,
               "history": jnp.asarray(result.history, gen.dtype)}
        return flow, aux

    return solve
