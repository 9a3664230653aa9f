"""Data-parallel frame batch across a device mesh.

Runs on however many devices are available; to try the multi-chip path on
one machine, ask for virtual CPU devices (the forcing happens in-process —
plain ``XLA_FLAGS``/``JAX_PLATFORMS`` env vars are not always honored when
an accelerator plugin is installed):

    EBT_VIRTUAL_DEVICES=8 python examples/03_multichip_batch.py

The events of each frame are sharded over the ``event`` axis (each chip
scatters a partial vote image; a ``psum`` over ICI reduces them) and the
pyramid solves run independently over the ``data`` axis.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_n = os.environ.get("EBT_VIRTUAL_DEVICES")
if _n:  # must run before the JAX backend initializes
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={_n}")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.data.synthetic import (SyntheticBosConfig,
                                                generate_sequence)
from event_based_bos_tpu.parallel import (make_mesh,
                                          make_multichip_estimator,
                                          stack_events)
from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
from event_based_bos_tpu.solver.pyramid import roi_mask
from event_based_bos_tpu.types import Events


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh()  # splits devices between (data, event) automatically
    batch = mesh.shape["data"]
    print(f"{n_dev} devices → mesh {dict(mesh.shape)}; "
          f"{batch} frames per step")

    h, w = 96, 128
    seq = generate_sequence(SyntheticBosConfig(
        height=h, width=w, duration=(batch + 2) / 30, fps=30,
        events_per_frame=20_000, seed=0))

    gen = GenerativeSpec(image_size=(h, w), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    spec = PyramidSpec(gen=gen, roi=(0, h, 0, w),
                       coarsest_patch=16, finest_patch=8, n_iter=60)

    evs = []
    frames = []
    for i in range(batch):
        lo = np.searchsorted(seq["events"][:, 2], i / 30)
        hi = np.searchsorted(seq["events"][:, 2], (i + 1) / 30)
        evs.append(events_from_ndarray(seq["events"][lo:hi], capacity=1 << 15))
        frames.append(seq["frames"][i + 1])
    ev_b = stack_events(evs)
    frames_b = jnp.asarray(np.stack(frames), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    ev_b = Events(*(jax.device_put(f, NamedSharding(mesh, P("data", "event")))
                    for f in ev_b))
    frames_b = jax.device_put(frames_b, NamedSharding(mesh, P("data")))
    keys = jax.device_put(keys, NamedSharding(mesh, P("data")))

    step = make_multichip_estimator(spec, mesh)
    flows, loss_hist = step(ev_b, frames_b, jnp.asarray(roi_mask(spec)), keys)
    print("flows:", flows.shape,
          "finite:", bool(jnp.isfinite(flows).all()))
    print("final finest-scale losses per frame:",
          np.round(np.asarray(loss_hist[-1])[:, -1], 4))

    # --- sequential mesh mode: scale the WARM-START chain instead ---
    # D contiguous frame segments advance in lockstep; each data lane warm
    # starts from its own previous frame, with the feedback params carried
    # on device (cli: mesh: {data: D, event: E, sequential: true}).
    import dataclasses

    from event_based_bos_tpu.parallel import make_multichip_sequential

    d = mesh.shape["data"]
    mask = jnp.asarray(roi_mask(spec))
    step_cold, step_warm = make_multichip_sequential(
        spec, mesh, steady_spec=dataclasses.replace(spec, n_iter=30))
    ev_d = Events(*(f[:d] for f in ev_b))
    fl, prev, _ = step_cold(ev_d, frames_b[:d], mask, keys[:d])
    fl, prev, _ = step_warm(ev_d, frames_b[:d], mask, keys[:d], prev,
                            jnp.ones((d,), bool))
    print("sequential lockstep (cold 60 iters -> warm 30):",
          fl.shape, "finite:", bool(jnp.isfinite(fl).all()))


if __name__ == "__main__":
    main()
