"""Functional cost layer.

TPU-native re-design of reference ``src/costs/``.  The reference builds a
class registry with history-recording decorators (``src/costs/base.py:29-77``,
``src/costs/__init__.py:9-21``); here each cost is a pure function
``cost(arg: dict) -> scalar`` over a kwargs dict, and :func:`hybrid_cost`
returns a closure computing the weighted sum **and** the per-term breakdown, so
optimizer ``lax.scan`` loops can record loss history as stacked arrays (the
JAX-native replacement for ``CostBase.register_history``).

All costs operate on the same argument keys as the reference
(``prediction``, ``measurement``, ``flow``, ``pxy``, ``weights``,
``intensity``, ``omit_boundary``).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple, Union

import jax
import jax.numpy as jnp

from .ops.gradients import central_gradient

__all__ = [
    "diff_norm",
    "flow_norm",
    "flow_norm_pxy",
    "image_gradient",
    "total_variation",
    "charbonnier",
    "normalized_image_variance",
    "image_variance",
    "functions",
    "hybrid_cost",
    "required_keys",
]


def _acc_dtype(x) -> jnp.dtype:
    """Reduction accumulator dtype: f32 for bf16 inputs (precision floor)."""
    return jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype


def _safe_l2(v: jax.Array, axis=0) -> jax.Array:
    """L2 norm with a zero subgradient at the origin.

    ``jnp.linalg.norm`` propagates NaN gradients at exactly-zero vectors —
    which is the *initial state* of the translation field (p_x = p_y = 0,
    ``gml:425-450``).  torch defines the subgradient there as 0; this
    double-where construction reproduces that.
    """
    sq = jnp.sum((v * v).astype(_acc_dtype(v)), axis=axis)
    zero = sq == 0
    safe = jnp.where(zero, 1.0, sq)
    return jnp.where(zero, 0.0, jnp.sqrt(safe))


def diff_norm(arg: dict) -> jax.Array:
    """Matrix 1-norm of (prediction − measurement).

    Parity: ``DifferenceNorm`` (``src/costs/diff_norm.py:48-67``) computes
    ``torch.linalg.norm(pred - meas, ord=1)`` on a 2-D image — which is the
    *induced* matrix 1-norm, i.e. the maximum absolute column sum (column =
    trailing axis index), not the entrywise L1.  Verified against the
    reference numerically.
    """
    d = jnp.abs(arg["prediction"] - arg["measurement"])
    return jnp.max(jnp.sum(d.astype(_acc_dtype(d)), axis=-2))


def flow_norm(arg: dict) -> jax.Array:
    """Mean L2 magnitude of the flow field, channel axis first.

    Parity: ``FlowNorm`` (``src/costs/flow_norm.py:45-64``).
    """
    return jnp.mean(_safe_l2(arg["flow"], axis=0))


def flow_norm_pxy(arg: dict) -> jax.Array:
    """Mean L2 magnitude of the translation (pxy) field.

    Parity: ``FlowNormPxy`` (``src/costs/flow_norm_pxy.py:26-43``).
    """
    return jnp.mean(_safe_l2(arg["pxy"], axis=0))


def image_gradient(arg: dict) -> jax.Array:
    """Weighted total-variation-like smoothness of the flow.

    Parity: ``ImageGradient.calculate_torch``
    (``src/costs/image_gradient.py:60-76``): central differences of the
    ``[2, H, W]`` flow along both spatial axes, each multiplied by the
    per-pixel weights, mean of absolute sums.  (The reference's numpy branch
    calls an undefined method — fixed here by having one implementation.)

    Formulation note (measured on the 720×1280 solve, round 3): summing the
    interior/edge difference slices directly instead of concatenating them
    into full gradient images first saves ~13 ms/frame (184 → 171) at
    bit-equivalent summands — the 3-part ``concatenate`` per axis
    materialized two extra [2, H, W] arrays per iteration that only fed a
    reduction.
    """
    flow = arg["flow"]
    w = arg.get("weights", None)
    if w is not None and jnp.ndim(w) == 0:
        w = jnp.broadcast_to(jnp.asarray(w, flow.dtype), flow.shape[1:])
    acc = _acc_dtype(flow)
    total = jnp.zeros((), acc)
    for axis in (1, 2):
        n = flow.shape[axis]
        w_axis = axis - 1  # weights are [H, W]

        def wsl(a, b, _wa=w_axis):
            return (1.0 if w is None
                    else jax.lax.slice_in_dim(w, a, b, axis=_wa))

        upper = jax.lax.slice_in_dim(flow, 2, n, axis=axis)
        lower = jax.lax.slice_in_dim(flow, 0, n - 2, axis=axis)
        total = total + jnp.sum(
            jnp.abs((upper - lower) * 0.5 * wsl(1, n - 1)).astype(acc))
        first = (jax.lax.slice_in_dim(flow, 1, 2, axis=axis)
                 - jax.lax.slice_in_dim(flow, 0, 1, axis=axis))
        last = (jax.lax.slice_in_dim(flow, n - 1, n, axis=axis)
                - jax.lax.slice_in_dim(flow, n - 2, n - 1, axis=axis))
        total = total + jnp.sum(jnp.abs(first * wsl(0, 1)).astype(acc))
        total = total + jnp.sum(jnp.abs(last * wsl(n - 1, n)).astype(acc))
    return total / flow.size


def total_variation(arg: dict) -> jax.Array:
    """Anisotropic TV of the flow (forward differences).

    Listed in the reference configs (``configs/hot_plate1.yaml:50-60``
    comments) but absent from its registry; provided here for completeness.

    ``arg["full_domain"] = (H, W)`` (set by the exact-ROI fast path,
    ``solver/pyramid.py``) evaluates the *full-frame* TV from the cropped
    field: the dx/dy means divide by ``(H-1)·W`` and ``H·(W-1)`` — two
    different counts, so no single area factor on the weight can restore
    both — and every nonzero difference is supported inside the margin box
    (the masked flow is zero at and outside the box boundary), so the box
    sums equal the full-frame sums and only the divisors change.
    """
    flow = arg["flow"]
    dx = jnp.abs(flow[..., 1:, :] - flow[..., :-1, :])
    dy = jnp.abs(flow[..., :, 1:] - flow[..., :, :-1])
    full = arg.get("full_domain")
    if full is None:
        return jnp.mean(dx) + jnp.mean(dy)
    h, w = full
    lead = flow.size // (flow.shape[-2] * flow.shape[-1])  # channel count
    acc = _acc_dtype(flow)
    return (jnp.sum(dx.astype(acc)) / (lead * (h - 1) * w)
            + jnp.sum(dy.astype(acc)) / (lead * h * (w - 1)))


def charbonnier(arg: dict, alpha: float = 0.45, epsilon: float = 1e-3) -> jax.Array:
    """Robust Charbonnier penalty of (prediction − measurement).

    Parity: ``charbonnier_loss`` (``src/utils/stat_utils.py:40-45``).

    ``arg["full_domain"] = (H, W)`` (exact-ROI fast path) evaluates the
    full-frame mean from the cropped residual: unlike the other mean costs,
    the summand ``(δ²+ε²)^α`` is ``ε^{2α} > 0`` even where δ = 0, so the
    out-of-box pixels contribute a nonzero *constant* — added here in
    closed form (zero gradient, exact value) rather than folded into an
    area-scaled weight, which could not represent it.
    """
    delta = arg["prediction"] - arg["measurement"]
    vals = (delta**2 + epsilon**2) ** alpha
    full = arg.get("full_domain")
    if full is None:
        return jnp.mean(vals)
    h, w = full
    n_full = vals.size // (vals.shape[-2] * vals.shape[-1]) * h * w
    n_out = n_full - vals.size
    acc = _acc_dtype(vals)
    return ((jnp.sum(vals.astype(acc)) + n_out * epsilon ** (2 * alpha))
            / n_full)


def image_variance(arg: dict) -> jax.Array:
    """Variance of the IWE (contrast; higher = sharper)."""
    return jnp.var(arg["iwe"])


def gradient_magnitude(arg: dict) -> jax.Array:
    """Mean squared gradient magnitude of the IWE (contrast measure).

    The second classical CMax objective (Gallego et al.): sharp IWEs have
    strong edges.  Uses central differences.
    """
    iwe = arg["iwe"]
    gx = central_gradient(iwe, axis=-2)
    gy = central_gradient(iwe, axis=-1)
    return jnp.mean(gx**2 + gy**2)


def normalized_image_variance(arg: dict) -> jax.Array:
    """FWL ratio ``Var(IWE_orig) / Var(IWE)`` — < 1 is better.

    The reference references a ``NormalizedImageVariance`` cost that does not
    exist (``src/solver/base.py:319-340`` dead path); implemented properly
    here so :meth:`SolverBase.calculate_fwl` works.
    """
    return jnp.var(arg["orig_iwe"]) / (jnp.var(arg["iwe"]) + 1e-12)


#: Name → function registry (reference ``src/costs/__init__.py:21``).
functions: Dict[str, Callable[[dict], jax.Array]] = {
    "diff_norm": diff_norm,
    "flow_norm": flow_norm,
    "flow_norm_pxy": flow_norm_pxy,
    "image_gradient": image_gradient,
    "total_variation": total_variation,
    "charbonnier": charbonnier,
    "image_variance": image_variance,
    "gradient_magnitude": gradient_magnitude,
    "normalized_image_variance": normalized_image_variance,
}

_REQUIRED_KEYS = {
    "diff_norm": ["prediction", "measurement"],
    "flow_norm": ["flow"],
    "flow_norm_pxy": ["pxy"],
    "image_gradient": ["flow", "omit_boundary"],
    "total_variation": ["flow"],
    "charbonnier": ["prediction", "measurement"],
    "image_variance": ["iwe"],
    "gradient_magnitude": ["iwe"],
    "normalized_image_variance": ["orig_iwe", "iwe"],
}


def required_keys(cost_with_weight: dict) -> list:
    """Union of required argument keys (``src/costs/hybrid.py:37-39``)."""
    keys = []
    for name in cost_with_weight:
        keys.extend(_REQUIRED_KEYS.get(name, []))
    return keys


def hybrid_cost(
    cost_with_weight: Dict[str, Union[float, str]], direction: str = "minimize"
) -> Callable[[dict], Tuple[jax.Array, Dict[str, jax.Array]]]:
    """Weighted-sum cost combinator.

    Parity: ``HybridCost`` (``src/costs/hybrid.py:45-57``) including the
    ``"inv"`` weight (adds the reciprocal of the term).  Returns
    ``(total, {name: raw_term})`` so callers can record per-term history.

    Internal extension: a weight ``("inv", s)`` adds ``1 / (raw · s)`` —
    the exact-ROI fast path uses it to restore the full-frame mean inside
    the reciprocal for mean-based costs evaluated on the ROI box
    (``solver/pyramid.py``); configs always pass the plain ``"inv"``.
    """
    if direction not in ("minimize", "maximize", "natural"):
        raise ValueError(f"direction should be minimize/maximize/natural, got {direction}")
    items = [(name, functions[name], w) for name, w in cost_with_weight.items()]
    sign = -1.0 if direction == "maximize" else 1.0

    def calculate(arg: dict) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        total = jnp.asarray(0.0)
        terms = {}
        for name, fn, w in items:
            raw = fn(arg)
            terms[name] = raw
            if w == "inv":
                total = total + 1.0 / raw
            elif isinstance(w, tuple) and w[0] == "inv":
                total = total + 1.0 / (raw * w[1])
            else:
                total = total + w * raw
        return sign * total, terms

    return calculate
