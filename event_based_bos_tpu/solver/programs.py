"""Jitted per-frame device programs shared by the solver facades.

Each builder is an ``lru_cache``-memoized ``jax.jit`` factory keyed by the
static shape/config arguments, so a run compiles each program once and every
facade instance shares the cache.  The programs fuse the per-frame
evaluation/visualization device work that the reference performs as separate
host-side passes (``src/solver/base.py:154-340``, ``src/visualizer.py``) —
on a remote-device link every extra dispatch is a full round trip, so the
fusion is the serving path's main latency lever (``docs/performance.md``).

Split out of :mod:`.api` (which keeps the user-facing ``SolverBase``
facade) — round-5 refactor; no public API change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..costs import normalized_image_variance
from ..ops.flow import calculate_flow_error
from ..ops.iwe import create_eventmask, create_image_from_events
from ..ops.warp import warp_event
from ..types import Events

__all__ = [
    "clipped_iwe", "jit_clipped_iwe", "jit_eventmask", "fwl", "jit_fwl",
    "jit_fwl_device", "jit_flow_error", "jit_render_bundle",
    "jit_flow_error_pair", "jit_flow_error_pair_device",
]


def clipped_iwe(ev: Events, image_shape, max_scale: jax.Array) -> jax.Array:
    """IWE render → inverted clipped uint8 — matches the host formula
    bit-for-bit: clip → truncating uint8 cast → inversion (255 − x).
    Shared by the single-call jit and the fused render bundle."""
    im = create_image_from_events(ev, image_shape, sigma=0)
    return 255 - jnp.clip(max_scale * im, 0, 255).astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def jit_clipped_iwe(image_shape):
    """Jitted IWE render → inverted uint8 (the eager per-primitive dispatch
    of this many-op program costs seconds per frame over the remote-TPU
    tunnel; jitted it is one dispatch and a small uint8 fetch)."""
    return jax.jit(lambda ev, max_scale: clipped_iwe(ev, image_shape,
                                                     max_scale))


@functools.lru_cache(maxsize=None)
def jit_eventmask(image_shape):
    return jax.jit(lambda ev: create_eventmask(ev, image_shape))


def fwl(ev: Events, flow: jax.Array, image_shape,
        normalize_t: bool) -> jax.Array:
    """FWL = Var(IWE_orig)/Var(IWE) (< 1 better) — the metric the reference
    defines but leaves dead (``base.py:319-340``)."""
    iwe_orig = create_image_from_events(ev, image_shape, sigma=1)
    warped = warp_event(ev, flow, "dense-flow", direction="middle",
                        normalize_t=normalize_t)
    iwe = create_image_from_events(warped, image_shape, sigma=1)
    return normalized_image_variance({"orig_iwe": iwe_orig, "iwe": iwe})


@functools.lru_cache(maxsize=None)
def jit_fwl(image_shape, normalize_t: bool):
    def f(ev: Events, flow: jax.Array) -> jax.Array:
        return fwl(ev, flow, image_shape, normalize_t)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def jit_fwl_device(image_shape, normalize_t: bool, dtype):
    """FWL from the solve's device-resident UNORIENTED flow: ``scale``
    folds the GT-window time rescale and the output-orientation sign on
    device (see ``SolverBase.calculate_fwl_async``)."""
    def f(ev: Events, est, scale: jax.Array) -> jax.Array:
        flow = (est.astype(jnp.float32) * scale).astype(dtype)
        return fwl(ev, flow, image_shape, normalize_t)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def jit_flow_error(masked: bool):
    def f(gt, pred, mask):
        return calculate_flow_error(gt, pred, event_mask=mask)

    if masked:
        return jax.jit(f)
    return jax.jit(lambda gt, pred: calculate_flow_error(gt, pred))


@functools.lru_cache(maxsize=None)
def jit_render_bundle(image_shape, err_crop=None, gt_cropped=False,
                      est_box=None, pack_mask=False):
    """All per-frame visualization device work in ONE program: clipped IWE,
    event mask, both Poisson-integration views, the HSV-polar planes of
    both flows, and (with ``err_crop``) both flow-error dicts (each extra
    dispatch costs a full round trip over a remote-device link).  The
    Poisson views are shape-agnostic (non-CLI callers may pass crop-shaped
    flows; ``err_crop`` requires the full-frame shapes the CLI loop always
    has — ``frame_flow`` pads every GT branch to the original size).

    ``gt_cropped`` (round 5): the caller uploads only the ``err_crop`` box
    of the GT flow and the program zero-pads it back to the frame — the GT
    is zero outside the evaluation crop by construction
    (``frame_flow._pad_flow`` pads the Farnebäck crop with zeros), so the
    renders are bit-identical while the per-frame GT upload drops by the
    crop ratio (7.4 → 3.7 MB at the benchmark geometry; the caller
    verifies the outside region is zero before taking this path).

    The polar planes ``(ang_u8, magp_f16)`` move the per-frame flow
    colorization's float math (hypot, atan2, **0.5 at 0.9 Mpx — ~400 ms
    *per colorized image* in host float64, of which the loop draws six) to
    the device; the host keeps only the uint8 value-scaling, cv2's SIMD
    HSV→RGB, and the PNG encode (see
    ``visualizer.Visualizer.color_optical_flow_from_polar``).  f16 carries
    ``mag**0.5`` with ≤5e-4 relative error — ≲0.13 of a uint8 LSB after
    the 255 scaling.

    Folding the error pair in (vs the standalone
    :func:`jit_flow_error_pair` dispatch) also drops the per-frame
    re-upload of the cropped pred/gt flows (~12 MB) the loop otherwise
    pays — the bundle already holds both on device.

    ``est_box`` / ``pack_mask`` (round 5, both bitwise-reconstructible —
    the steady visualize loop is tunnel-byte-bound, `docs/performance.md`
    §end-to-end): with ``est_box`` the estimated flow is exactly ±0.0
    outside the solver's ROI box (``pyramid.solve_pyramid`` selects with
    ``jnp.where``), so its polar planes are a *constant* there — the
    program returns the box slice plus that constant computed by the same
    arithmetic on a 1×1 zero flow (`(ang, magp, const_ang, const_magp)`),
    and the caller fills the full frame on host.  ``gt_cropped`` gets the
    same treatment automatically (the padded GT is +0.0 outside
    ``err_crop``).  ``pack_mask`` ships the bool event mask as
    ``jnp.packbits`` uint8 rows (8× fewer bytes; ``np.unpackbits`` on host
    is exact).  Together they cut ~3.6 MB of the ~9 MB per-frame fetch at
    the benchmark geometry."""
    from ..ops.image_warp import standardize_image_center
    from ..ops.poisson import poisson_integrate_flow

    def poisson_view(flow):
        p = poisson_integrate_flow(flow.astype(jnp.float32))
        return standardize_image_center(p).astype(jnp.uint8)

    def polar(flow):
        fx = flow[0].astype(jnp.float32)
        fy = flow[1].astype(jnp.float32)
        fx = jnp.where(jnp.isfinite(fx), fx, 0.0)
        fy = jnp.where(jnp.isfinite(fy), fy, 0.0)
        magp = jnp.sqrt(jnp.sqrt(fx * fx + fy * fy))   # ‖flow‖ ** 0.5
        ang = ((jnp.arctan2(fy, fx) + jnp.pi) * (180.0 / jnp.pi) / 2.0)
        return ang.astype(jnp.uint8), magp.astype(jnp.float16)

    def f(ev: Events, est: jax.Array, gt_flow: jax.Array,
          max_scale: jax.Array, est_scale: jax.Array, err_scale: jax.Array):
        # est_scale folds the GT-window time rescale (and the output
        # orientation sign) on device, so the solve's device-resident flow
        # feeds the renders directly — no 7.4 MB re-upload of the scaled
        # host copy over the remote-device link
        est32 = est.astype(jnp.float32)
        est_scaled = est32 * est_scale
        mask = create_eventmask(ev, image_shape)
        if gt_cropped:
            x0, x1, y0, y1 = err_crop
            gt_full = jnp.pad(gt_flow, ((0, 0), (x0, image_shape[0] - x1),
                                        (y0, image_shape[1] - y1)))
        else:
            gt_full = gt_flow
        if est_box is not None:
            ex0, ex1, ey0, ey1 = est_box
            # the constant uses the SAME elementwise arithmetic on the
            # exact outside value (+0.0 * est_scale), so signed-zero
            # atan2 semantics carry over bit-for-bit
            polar_est = (polar(est_scaled[:, ex0:ex1, ey0:ey1])
                         + polar(jnp.zeros((2, 1, 1)) * est_scale))
        else:
            polar_est = polar(est_scaled)
        if gt_cropped:
            polar_gt = polar(gt_flow) + polar(jnp.zeros((2, 1, 1)))
        else:
            polar_gt = polar(gt_full)
        out_mask = (jnp.packbits(mask, axis=-1) if pack_mask else mask)
        out = (clipped_iwe(ev, image_shape, max_scale), out_mask,
               poisson_view(est_scaled), poisson_view(gt_full),
               polar_est, polar_gt)
        if err_crop is not None:
            # the evaluation pair compares the UNSCALED oriented flow
            # (err_scale = sign, or 1/time-scale on the host-flow path)
            x0, x1, y0, y1 = err_crop
            pred_c = (est32 * err_scale)[None, :, x0:x1, y0:y1]
            gt_c = (gt_flow if gt_cropped
                    else gt_flow[:, x0:x1, y0:y1]).astype(jnp.float32)[None]
            m = mask[:, x0:x1, y0:y1][None]
            out = out + (calculate_flow_error(gt_c, pred_c),
                         calculate_flow_error(gt_c, pred_c, event_mask=m))
        return out

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def jit_flow_error_pair(image_shape, crop):
    """Both per-frame error dicts (unmasked + event-masked) in ONE device
    program: the evaluation loop otherwise pays two dispatch+fetch round
    trips per frame over the remote-device link."""
    x0, x1, y0, y1 = crop

    def f(gt, pred, ev: Events):
        mask = create_eventmask(ev, image_shape)[:, x0:x1, y0:y1]
        return (calculate_flow_error(gt, pred),
                calculate_flow_error(gt, pred, event_mask=mask[None]))

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def jit_flow_error_pair_device(image_shape, crop):
    """Serving-mode twin of the :func:`jit_render_bundle` error branch:
    the (unmasked, event-masked) pair computed from the solve's
    device-resident flow.  Dispatched right behind the solve (see
    ``SolverBase.flow_errors_async``), so in the pipelined loop its
    round trip overlaps the solve instead of queueing behind the *next*
    frame's solve, and the ~7.4 MB pred/gt re-upload the host-flow path
    pays (:func:`jit_flow_error_pair`) shrinks to the cropped GT alone."""
    x0, x1, y0, y1 = crop

    def f(ev: Events, est, gt_c, err_scale):
        mask = create_eventmask(ev, image_shape)[:, x0:x1, y0:y1]
        pred_c = (est.astype(jnp.float32) * err_scale)[None, :, x0:x1, y0:y1]
        g = gt_c.astype(jnp.float32)[None]
        return (calculate_flow_error(g, pred_c),
                calculate_flow_error(g, pred_c, event_mask=mask[None]))

    return jax.jit(f)
