"""Import the upstream reference (if present) for golden cross-validation.

The reference at /root/reference depends on packages not in this image
(optuna, openpiv, torchvision, skimage, …).  This harness injects minimal
stubs for the import-time dependencies that the exercised code paths don't
actually touch (plus a faithful torchvision resize/gaussian_blur built on
torch.nn.functional), then imports the reference package.

Used only by parity tests; everything is skipped when the reference tree is
absent.  No reference code is copied — it is imported and *executed* as an
oracle.
"""

import math
import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "src"))


def _install_stubs():
    import torch
    import torch.nn.functional as F

    def mod(name):
        """Return the real module when importable, else a fresh stub.

        Never shadow an importable module — attribute assignments below are
        applied only to stubs (guarded by ``_is_stub``).
        """
        m = sys.modules.get(name)
        if m is None:
            try:
                import importlib

                m = importlib.import_module(name)
            except ImportError:
                m = types.ModuleType(name)
                m.__ebt_stub__ = True
                sys.modules[name] = m
        return m

    def _is_stub(m):
        return getattr(m, "__ebt_stub__", False)

    optuna = mod("optuna")
    if _is_stub(optuna):
        samplers = mod("optuna.samplers")
        storages = mod("optuna.storages")
        distributions = mod("optuna.distributions")
        trial = mod("optuna.trial")

        class _InMemoryStorage:
            def __init__(self, *a, **k):
                pass

        storages.InMemoryStorage = _InMemoryStorage
        distributions.BaseDistribution = object
        trial.TrialState = object
        optuna.samplers = samplers
        optuna.storages = storages
        optuna.distributions = distributions
        optuna.trial = trial
        optuna.Trial = object
        optuna.create_study = None

    openpiv = mod("openpiv")
    if _is_stub(openpiv):
        for sub in ("windef", "tools", "filters", "preprocess", "pyprocess",
                    "scaling", "smoothn", "validation"):
            m = mod(f"openpiv.{sub}")
            setattr(openpiv, sub, m)
        sys.modules["openpiv.windef"].Settings = object
        sys.modules["openpiv.windef"].first_pass = None
        sys.modules["openpiv.windef"].multipass_img_deform = None
        sys.modules["openpiv.tools"].transform_coordinates = None

    skimage = mod("skimage")
    if _is_stub(skimage):
        skutil = mod("skimage.util")
        skutil.invert = lambda x: 255 - x
        skimage.util = skutil
        sktr = mod("skimage.transform")
        skimage.transform = sktr

    mod("plotly")
    mod("plotly.graph_objects")
    mod("ffmpeg")
    mod("hdf5plugin")
    mod("h5py")  # real h5py is importable in this image; stub only if absent

    # torchvision: faithful bilinear resize (align_corners=False, no
    # antialias — the semantics of the version the reference pins) and a
    # separable reflect-padded gaussian blur.
    tv = mod("torchvision")
    if not _is_stub(tv):
        return
    transforms = mod("torchvision.transforms")
    tf = mod("torchvision.transforms.functional")

    class InterpolationMode:
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    def resize(img, size, interpolation=InterpolationMode.BILINEAR, **kw):
        if isinstance(size, int):
            size = [size, size]
        x = img
        squeeze = x.dim() == 3
        if squeeze:
            x = x[None]
        out = F.interpolate(x, size=list(size), mode="bilinear",
                            align_corners=False, antialias=False)
        return out[0] if squeeze else out

    def _g1d(ks, sigma, dtype, device):
        r = (ks - 1) // 2
        xs = torch.arange(-r, r + 1, dtype=dtype, device=device)
        k = torch.exp(-(xs**2) / (2 * sigma**2))
        return k / k.sum()

    def gaussian_blur(img, kernel_size, sigma):
        if isinstance(kernel_size, int):
            kernel_size = [kernel_size, kernel_size]
        if isinstance(sigma, (int, float)):
            sigma = [float(sigma), float(sigma)]
        x = img
        n_sq = 0
        while x.dim() < 4:
            x = x[None]
            n_sq += 1
        c = x.shape[1]
        kh = _g1d(kernel_size[0], sigma[0], x.dtype, x.device)
        kw = _g1d(kernel_size[1], sigma[1], x.dtype, x.device)
        ph, pw = (kernel_size[0] - 1) // 2, (kernel_size[1] - 1) // 2
        x = F.pad(x, (pw, pw, ph, ph), mode="reflect")
        x = F.conv2d(x, kh.view(1, 1, -1, 1).expand(c, 1, -1, 1), groups=c)
        x = F.conv2d(x, kw.view(1, 1, 1, -1).expand(c, 1, 1, -1), groups=c)
        for _ in range(n_sq):
            x = x[0]
        return x

    tf.resize = resize
    tf.gaussian_blur = gaussian_blur
    tf.InterpolationMode = InterpolationMode
    transforms.functional = tf
    transforms.InterpolationMode = InterpolationMode
    tv.transforms = transforms


_ref_modules = None


def load_reference():
    """Import and return the reference ``src`` package (cached)."""
    global _ref_modules
    if _ref_modules is not None:
        return _ref_modules
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import src as ref_src  # noqa: F401
    from src import solver as ref_solver
    from src import visualizer as ref_visualizer
    from src import event_image_converter as ref_eic
    from src import warp as ref_warp
    from src import utils as ref_utils

    _ref_modules = types.SimpleNamespace(
        src=ref_src, solver=ref_solver, visualizer=ref_visualizer,
        event_image_converter=ref_eic, warp=ref_warp, utils=ref_utils,
    )
    return _ref_modules


def make_pyramid_solver(H, W, coarsest=16, n_iter=60, weight_inverse=True,
                        optimize_warp=True, iwe_sigma=2):
    """Instantiate the reference PatchEkltPyramid2 with a hot_plate1-like config."""
    ref = load_reference()
    cfg = {
        "filter": {"filters": [],
                   "parameters": {"xmin": 0, "xmax": H, "ymin": 0, "ymax": W}},
        "method": "patch_eklt_pyramid2",
        "outer_padding": 0,
        "cost_with_weight": {"diff_norm": 1.0, "image_gradient": 0.5,
                             "flow_norm_pxy": 0.1},
        "optimizer": {"method": "Adam", "n_iter": n_iter,
                      "parameters": {"angle": {"min": 0, "max": 6.2832},
                                     "p_x": {"min": -0.4, "max": 0.4},
                                     "p_y": {"min": -0.4, "max": 0.4}}},
        "generative_ml": {"weight_loss_by_event_hist": False, "weight_sigma": 5,
                          "weight_loss_by_inverse_event_hist": weight_inverse,
                          "optimize_warp": optimize_warp, "iwe_sigma": iwe_sigma,
                          "viz_diff_scale": [-0.25, 0.25], "no_polarity": False,
                          "model_image": "current", "use_log_intensity": False,
                          "angle_model": False, "poisson_model": True},
        "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                       "do_event_thresholding": False, "event_thres": 8},
    }
    viz = ref.visualizer.Visualizer((H, W), show=False, save=False,
                                    save_dir="/tmp/ref_parity_out")
    solver = ref.solver.collections["patch_eklt_pyramid2"](
        (H, W), (H, W), {}, cfg, viz)
    # the reference hard-codes prepare_pyramidal_patch(image, 64, 8); rebuild
    # the pyramid for the test's smaller scale range
    solver.prepare_pyramidal_patch((H, W), coarsest, 8)
    solver.overload_patch_configuration(solver.coarest_scale)
    return solver


def synthetic_scene(H=64, W=96, du=(2.0, -1.0), n=30000, seed=0):
    """Shared synthetic uniform-displacement scene (pattern, frames, events)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    coarse = rng.uniform(0, 255, (H // 3 + 2, W // 3 + 2))
    ys = np.linspace(0, coarse.shape[0] - 1.001, H)
    xs = np.linspace(0, coarse.shape[1] - 1.001, W)
    y0, x0 = ys.astype(int), xs.astype(int)
    fy, fx = (ys - y0)[:, None], (xs - x0)[None, :]
    I1 = ((1 - fy) * (1 - fx) * coarse[np.ix_(y0, x0)]
          + fy * (1 - fx) * coarse[np.ix_(y0 + 1, x0)]
          + (1 - fy) * fx * coarse[np.ix_(y0, x0 + 1)]
          + fy * fx * coarse[np.ix_(y0 + 1, x0 + 1)])
    gy, gx = np.mgrid[0:H, 0:W].astype(float)
    sy = np.clip(gy - du[0], 0, H - 1)
    sx = np.clip(gx - du[1], 0, W - 1)
    yy0, xx0 = np.floor(sy).astype(int), np.floor(sx).astype(int)
    yy1, xx1 = np.minimum(yy0 + 1, H - 1), np.minimum(xx0 + 1, W - 1)
    fy2, fx2 = sy - yy0, sx - xx0
    I2 = ((1 - fy2) * (1 - fx2) * I1[yy0, xx0] + fy2 * (1 - fx2) * I1[yy1, xx0]
          + (1 - fy2) * fx2 * I1[yy0, xx1] + fy2 * fx2 * I1[yy1, xx1])
    dl = I2 - I1
    mag = np.abs(dl)
    prob = (mag / mag.sum()).reshape(-1)
    idx = rng.choice(H * W, size=n, p=prob)
    r, c = idx // W, idx % W
    pol = np.sign(dl.reshape(-1)[idx])
    pol[pol == 0] = 1
    t = np.sort(rng.uniform(0, 0.008, n))
    events = np.stack([r.astype(float), c.astype(float), t, pol], 1)
    return I1, I2, events
