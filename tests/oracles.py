"""Slow numpy oracles used to validate the JAX kernels.

These are independent straight-line numpy implementations of the documented
semantics (bilinear voting, 2-DoF warp, Sobel, bilinear resize), kept
deliberately naive (per-event Python loops where convenient) so they are easy
to audit.
"""

import numpy as np


def bilinear_vote_oracle(events, image_size, weight=1.0, padding=(0, 0)):
    """Per-event loop bilinear voting. events: (n, 4) rows (x=row, y=col, t, p)."""
    ph, pw = padding
    h, w = image_size[0] + 2 * ph, image_size[1] + 2 * pw
    img = np.zeros((h, w), np.float64)
    wts = np.broadcast_to(np.asarray(weight, np.float64), (len(events),))
    for (x, y, _t, _p), wt in zip(events, wts):
        fx, fy = np.floor(x + 1e-6), np.floor(y + 1e-6)
        dx, dy = x - fx, y - fy
        r0, c0 = int(fx) + ph, int(fy) + pw
        for dr, dc, ww in (
            (0, 0, (1 - dx) * (1 - dy)),
            (1, 0, dx * (1 - dy)),
            (0, 1, (1 - dx) * dy),
            (1, 1, dx * dy),
        ):
            r, c = r0 + dr, c0 + dc
            if 0 <= r < h and 0 <= c < w:
                img[r, c] += ww * wt
    return img


def count_image_oracle(events, image_size, padding=(0, 0)):
    """Each in-bounds corner contributes a unit count."""
    ph, pw = padding
    h, w = image_size[0] + 2 * ph, image_size[1] + 2 * pw
    img = np.zeros((h, w), np.float64)
    for x, y, _t, _p in events:
        r0 = int(np.floor(x + 1e-6)) + ph
        c0 = int(np.floor(y + 1e-6)) + pw
        for dr, dc in ((0, 0), (1, 0), (0, 1), (1, 1)):
            r, c = r0 + dr, c0 + dc
            if 0 <= r < h and 0 <= c < w:
                img[r, c] += 1.0
    return img


def warp_2dof_oracle(events, translation, ref_time, normalize_t=False):
    ev = np.array(events, np.float64, copy=True)
    dt = ev[:, 2] - ref_time
    if normalize_t:
        dt = dt / (dt.max() - dt.min())
    out = ev.copy()
    out[:, 0] = ev[:, 0] + dt * translation[0]
    out[:, 1] = ev[:, 1] + dt * translation[1]
    out[:, 2] = dt
    return out


def sobel_oracle(image, ksize=3, border="replicate"):
    """(d/drow, d/dcol) Sobel via cv2 for cross-checking."""
    import cv2

    border_flag = {"replicate": cv2.BORDER_REPLICATE, "reflect101": cv2.BORDER_DEFAULT}[border]
    gx = cv2.Sobel(image.astype(np.float64), cv2.CV_64F, 0, 1, ksize=ksize,
                   borderType=border_flag)
    gy = cv2.Sobel(image.astype(np.float64), cv2.CV_64F, 1, 0, ksize=ksize,
                   borderType=border_flag)
    return gx, gy


def resize_bilinear_oracle(image, out_shape):
    """torch.nn.functional.interpolate bilinear align_corners=False."""
    import torch

    t = torch.from_numpy(np.asarray(image, np.float64))
    while t.ndim < 4:
        t = t[None]
    out = torch.nn.functional.interpolate(t, size=tuple(out_shape), mode="bilinear",
                                          align_corners=False)
    out = out.numpy()
    return out.reshape(np.asarray(image).shape[:-2] + tuple(out_shape))


def warp_image_forward_oracle(image, flow):
    """grid_sample(align_corners=True, zeros) equivalent via torch."""
    import torch

    im = torch.from_numpy(np.asarray(image, np.float64))[None, None]
    fl = torch.from_numpy(np.asarray(flow, np.float64))[None]
    h, w = image.shape
    cr, cc = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    cr = cr[None, None] / ((h - 1) / 2.0) - 1
    cc = cc[None, None] / ((w - 1) / 2.0) - 1
    wr = cr - fl[:, [0]] / ((h - 1) / 2.0)
    wc = cc - fl[:, [1]] / ((w - 1) / 2.0)
    grid = torch.cat([wc, wr], dim=1).permute(0, 2, 3, 1)
    out = torch.nn.functional.grid_sample(im, grid, mode="bilinear", align_corners=True)
    return out[0, 0].numpy()
