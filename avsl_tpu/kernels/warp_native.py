"""ctypes binding for the native host lip-crop sampler (cpp/avsl_warp).

The minimal-bytes ingest pipeline warps mouth crops ON THE HOST (next to
the media decoder) and uploads only the 96x96/88x88 crops to the TPU —
~2 MB/segment instead of ~25 MB of frames — mirroring the reference's
CPU-side dlib + skimage warp (reference preprocess/video_process.py:
305-490) as a threaded C++ kernel. Semantics are the host twin of
:func:`avsl_tpu.kernels.warp.sample_separable` (per-tap masking, float32
accumulation); the numpy fallback below computes the identical result
when the shared library has not been built (``make -C cpp/avsl_warp``).
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(
        os.path.dirname(__file__), "..", "..", "cpp", "avsl_warp",
        "libavsl_warp.so",
    ),
    os.path.join(os.path.dirname(__file__), "libavsl_warp.so"),
]


@functools.lru_cache(maxsize=1)
def _load_lib() -> Optional[ctypes.CDLL]:
    from avsl_tpu.utils.native_build import ensure_built

    ensure_built(os.path.dirname(_LIB_PATHS[0]), "libavsl_warp.so")
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            common = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.avsl_sample_separable_f32.restype = None
            lib.avsl_sample_separable_f32.argtypes = common + [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.avsl_sample_separable_u8.restype = None
            lib.avsl_sample_separable_u8.argtypes = common + [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
            return lib
    return None


def native_available() -> bool:
    return _load_lib() is not None


def sample_separable_np(
    frames: np.ndarray,  # [..., H, W] uint8 (or float castable)
    ys: np.ndarray,  # [..., crop] per-frame source row coords
    xs: np.ndarray,  # [..., crop] per-frame source col coords
    chunk: int = 64,
) -> np.ndarray:
    """Pure-numpy host twin of ``kernels.warp.sample_separable``.

    Per-tap masking identical to the device kernel (_interp_matrix /
    _bilinear_sample): a bilinear tap contributes iff its integer index
    lies in [0, n); coordinates in (-1, 0) and (n-1, n) keep their single
    in-bounds partial contribution. Processes ``chunk`` frames at a time
    to bound intermediates. Returns float32 [..., crop, crop].
    """
    batch_shape = frames.shape[:-2]
    h, w = frames.shape[-2:]
    c = ys.shape[-1]
    f = frames.reshape(-1, h, w)
    ysf = np.asarray(ys, np.float32).reshape(-1, c)
    xsf = np.asarray(xs, np.float32).reshape(-1, c)
    n = f.shape[0]
    out = np.empty((n, c, c), np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        fb = f[s:e].astype(np.float32)
        xb, yb = xsf[s:e], ysf[s:e]
        x0 = np.floor(xb).astype(np.int64)
        fx = xb - x0
        v0 = (x0 >= 0) & (x0 < w)
        v1 = (x0 + 1 >= 0) & (x0 + 1 < w)
        x0c = np.clip(x0, 0, w - 1)
        x1c = np.clip(x0 + 1, 0, w - 1)
        g0 = np.take_along_axis(fb, x0c[:, None, :], axis=2)
        g1 = np.take_along_axis(fb, x1c[:, None, :], axis=2)
        tmp = g0 * (v0 * (1.0 - fx))[:, None, :] + g1 * (v1 * fx)[:, None, :]
        y0 = np.floor(yb).astype(np.int64)
        fy = yb - y0
        u0 = (y0 >= 0) & (y0 < h)
        u1 = (y0 + 1 >= 0) & (y0 + 1 < h)
        y0c = np.clip(y0, 0, h - 1)
        y1c = np.clip(y0 + 1, 0, h - 1)
        r0 = np.take_along_axis(tmp, y0c[:, :, None], axis=1)
        r1 = np.take_along_axis(tmp, y1c[:, :, None], axis=1)
        out[s:e] = (
            r0 * (u0 * (1.0 - fy))[:, :, None] + r1 * (u1 * fy)[:, :, None]
        )
    return out.reshape(*batch_shape, c, c)


def _as_c_arrays(frames, ys, xs):
    f = np.ascontiguousarray(frames, np.uint8)
    batch_shape = f.shape[:-2]
    h, w = f.shape[-2:]
    c = ys.shape[-1]
    ysf = np.ascontiguousarray(ys, np.float32).reshape(-1, c)
    xsf = np.ascontiguousarray(xs, np.float32).reshape(-1, c)
    n = int(np.prod(batch_shape)) if batch_shape else 1
    if ysf.shape[0] != n or xsf.shape[0] != n:
        raise ValueError(
            f"coords batch {ysf.shape[0]} does not match frames batch {n}"
        )
    return f.reshape(n, h, w), ysf, xsf, batch_shape, h, w, c, n


def sample_separable_host(
    frames: np.ndarray,  # [..., H, W] uint8
    ys: np.ndarray,  # [..., crop]
    xs: np.ndarray,  # [..., crop]
    out_dtype=np.uint8,
    n_threads: Optional[int] = None,
) -> np.ndarray:
    """Threaded native sampler; numpy fallback when the .so is absent.

    ``out_dtype=np.uint8`` clips to [0, 255] and truncates — the exact
    conversion the dataset writer applies (lip_roi.extract_lip_clip), so
    host crops match stored-dataset crops. ``np.float32`` returns the raw
    device-kernel-equivalent values.
    """
    n = int(np.prod(np.shape(frames)[:-2]))
    if (
        int(np.prod(np.shape(ys)[:-1])) != n
        or int(np.prod(np.shape(xs)[:-1])) != n
    ):
        raise ValueError(
            f"coords batch {np.shape(ys)[:-1]}/{np.shape(xs)[:-1]} does not "
            f"match frames batch {np.shape(frames)[:-2]}"
        )
    lib = _load_lib()
    # the C kernel reads uint8 frames only — non-uint8 input (e.g. already
    # normalized float frames) takes the numpy path on BOTH branches, so
    # the result never depends on whether the .so was built
    if lib is None or np.asarray(frames).dtype != np.uint8:
        outf = sample_separable_np(frames, ys, xs)
        if out_dtype == np.uint8:
            return np.clip(outf, 0, 255).astype(np.uint8)
        return outf.astype(out_dtype)
    f, ysf, xsf, batch_shape, h, w, c, n = _as_c_arrays(frames, ys, xs)
    threads = n_threads or min(os.cpu_count() or 1, 8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    if out_dtype == np.uint8:
        out = np.empty((n, c, c), np.uint8)
        lib.avsl_sample_separable_u8(
            f.ctypes.data_as(u8p), n, h, w,
            ysf.ctypes.data_as(f32p), xsf.ctypes.data_as(f32p), c,
            out.ctypes.data_as(u8p), threads,
        )
    elif out_dtype == np.float32:
        out = np.empty((n, c, c), np.float32)
        lib.avsl_sample_separable_f32(
            f.ctypes.data_as(u8p), n, h, w,
            ysf.ctypes.data_as(f32p), xsf.ctypes.data_as(f32p), c,
            out.ctypes.data_as(f32p), threads,
        )
    else:
        raise ValueError(f"unsupported out_dtype {out_dtype}")
    return out.reshape(*batch_shape, c, c)
