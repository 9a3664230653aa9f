"""Host→device event upload policy (the serving "wire").

Split out of :mod:`.api` (round-5 refactor; no public API change):
:class:`WireUploadMixin` owns the quantized-upload / reduced-precision-fetch
configuration keys and the ``_to_events`` upload path that every facade
method funnels raw event batches through.  Attribute names are part of the
facade's (tested) surface — ``wire_mode`` / ``wire_quantized`` /
``_fetch_dtype`` / ``_wire_fell_back`` — and are unchanged.

Wire background (``docs/performance.md`` §wire): over the remote-TPU tunnel
the per-frame event upload dominates serving-mode host time; the quantized
wire packs (x, y) on a 1/32-px grid and t on a µs grid (5–9 B/event instead
of 16–32), decoded by a tiny jitted program on device.  The reference has no
equivalent (it keeps float64 numpy arrays in-process,
``src/data_loader/ccs.py:274-297``).
"""

from __future__ import annotations

import functools
import logging

import jax
import numpy as np

from ..types import Events, bucket_capacity, events_from_ndarray

logger = logging.getLogger(__name__)

__all__ = ["WireUploadMixin"]


class WireUploadMixin:
    """Upload-policy half of ``SolverBase`` (see :mod:`.api`).

    Expects the inheriting facade to provide ``self.dtype`` and the class
    flags ``SUPPORTS_FLOW_FETCH_DTYPE`` / ``EVENTS_NEED_T`` before calling
    :meth:`_init_wire`.
    """

    def _init_wire(self, slv_config: dict) -> None:
        """Parse + validate the wire config keys (fail-loud on typos).

        Serving-path wire options (docs/performance.md): quantized event
        upload (``True``/"exact" = bit-exact for 1/32-px-aligned
        coordinates — off-µs-grid timestamps ride the mixed-t f32 tier —
        with silent float32 fallback otherwise; "round" = snap onto the
        wire grid, ≤1/64 px / ≤0.5 µs error, so sub-pixel streams keep
        the compact upload) and reduced-precision flow fetch.

        With no ``quantized_upload`` key the facade still tries the exact
        wire *opportunistically* at float32 (``quantized_upload: direct``
        opts out): its contract is bitwise equality with the direct
        upload, so the only observable difference is ~2× fewer
        host→device bytes per frame — on the remote-TPU tunnel the
        dominant plain-serving/visualize cost (docs/performance.md
        §end-to-end).  Batches the exact encoder refuses (sub-1/32-px
        coords, frames beyond 2047 px, fractional polarity) upload
        directly, without the configured modes' fallback warning.
        """
        qu = slv_config.get("quantized_upload", False)
        self.wire_mode = ({True: "exact", "exact": "exact",
                           "round": "round", "direct": None}.get(qu, False)
                          if qu else None)
        if self.wire_mode is False:
            raise ValueError(f"quantized_upload: unknown mode {qu!r} "
                             "(expected true, 'exact', 'round' or 'direct')")
        self.wire_quantized = self.wire_mode is not None
        self._wire_opportunistic = not self.wire_quantized and qu != "direct"
        self._wire_decode_jit: dict = {}
        self._wire_fell_back = False
        fetch = str(slv_config.get("flow_fetch_dtype", "float32"))
        if fetch not in ("float32", "float16", "bfloat16"):
            # fail loudly: a typo ("fp16", "half") would otherwise silently
            # fetch uncompressed float32 while the operator believes the
            # wire bytes were halved
            raise ValueError(f"flow_fetch_dtype: unknown dtype {fetch!r} "
                             "(expected float32, float16 or bfloat16)")
        import jax.numpy as jnp

        self._fetch_dtype = {"float16": jnp.float16,
                             "bfloat16": jnp.bfloat16}.get(fetch)
        if (self._fetch_dtype is not None
                and not type(self).SUPPORTS_FLOW_FETCH_DTYPE):
            # same fail-loud contract as the dtype-name check: a valid value
            # on a solver that never consults it would silently fetch the
            # uncompressed float32 flow
            raise ValueError(
                "flow_fetch_dtype: not supported by "
                f"{type(self).__name__} — only the serving-path solver "
                "(patch_eklt_pyramid2) implements the reduced-precision "
                "flow fetch")

    def _to_events(self, events, need_t: bool = True) -> Events:
        """Upload an event batch (or pass :class:`Events` through).

        ``need_t=False`` lets a caller that never reads timestamps (the
        pyramid solve — its events enter only through the polarity
        histogram) request the t-less quantized wire (5 B/event).  Callers
        that DO consume time (``preprocess`` period, ``calculate_fwl``
        warps) must keep the default.
        """
        import jax.numpy as jnp

        if isinstance(events, Events):
            return events
        arr = np.asarray(events)
        cap = bucket_capacity(len(arr))
        use_wire = self.wire_quantized
        wire_mode = self.wire_mode
        opportunistic = False
        if (not use_wire and self._wire_opportunistic
                and self.dtype == jnp.float32 and arr.ndim == 2):
            # default path: try the exact wire (bitwise-identical decode,
            # ~2× fewer upload bytes); silently upload direct when the
            # encoder refuses the batch
            use_wire, wire_mode, opportunistic = True, "exact", True
        if use_wire and self.dtype != jnp.float32 and wire_mode == "exact":
            # the exact wire contract is bitwise equality at float32; a
            # float64 direct upload carries precision the wire cannot, so
            # honor precision: "64" over the compact upload
            if not self._wire_fell_back:
                self._wire_fell_back = True
                logger.warning(
                    "quantized_upload (exact) is defined at float32; this "
                    "solver runs %s — using direct uploads ('round' mode "
                    "would keep the compact wire).", np.dtype(self.dtype))
            use_wire = False
        if use_wire:
            from ..types import decode_wire_events, encode_wire_events

            wire = encode_wire_events(arr, cap, include_t=need_t,
                                      mode=wire_mode,
                                      t_bitwise=opportunistic)
            if wire is not None:
                key = (cap, "t_us" in wire, "t_f32" in wire)
                fn = self._wire_decode_jit.get(key)
                if fn is None:
                    fn = jax.jit(functools.partial(decode_wire_events,
                                                   dtype=self.dtype))
                    self._wire_decode_jit[key] = fn
                return fn(wire)
            if not opportunistic and not self._wire_fell_back:
                self._wire_fell_back = True
                logger.warning(
                    "quantized_upload (%s): batch not representable on the "
                    "wire grid (%s) — falling back to float32 uploads.",
                    wire_mode,
                    "out-of-range values" if wire_mode == "round"
                    else "sub-1/32-px coordinates or out-of-range values; "
                         "'round' mode would snap them instead")
        return events_from_ndarray(arr, capacity=cap, dtype=self.dtype)
