"""ctypes bindings for the native host data pipeline (dataio.cpp).

``lib()`` compiles the shared library on first use (g++ -O3, cached next to
the source) and returns the loaded handle, or ``None`` when no compiler is
available — callers fall back to numpy, so the package works everywhere and
is merely faster where the toolchain exists.  Set ``DEEPCGP_NO_NATIVE=1`` to
force the numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'dataio.cpp')
_SO = os.path.join(_HERE, '_dataio.so')
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', _SRC, '-o', _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        try:  # some toolchains reject -march=native
            subprocess.run([a for a in cmd if a != '-march=native'],
                           check=True, capture_output=True)
            return True
        except (OSError, subprocess.CalledProcessError):
            return False


def lib():
    """The loaded native library, or None (numpy fallback)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get('DEEPCGP_NO_NATIVE'):
            return None
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            handle = ctypes.CDLL(_SO)
        except OSError:
            return None
        handle.dcgp_fit_scaler_f64.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        handle.dcgp_standardize_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        handle.dcgp_gather_rows_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64]
        handle.dcgp_extract_patches_f32.argtypes = [
            ctypes.c_void_p] + [ctypes.c_int64] * 6 + [ctypes.c_void_p]
        handle.dcgp_sample_patches_f32.argtypes = [
            ctypes.c_void_p] + [ctypes.c_int64] * 5 + [
            ctypes.c_void_p] * 3 + [ctypes.c_void_p, ctypes.c_int64]
        _lib = handle
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def fit_scaler(X: np.ndarray):
    """Per-column (mean, population std) with zero-std columns -> 1.0."""
    h = lib()
    X64 = np.ascontiguousarray(X, dtype=np.float64)
    n, d = X64.shape
    if h is None:
        mean = X64.mean(axis=0)
        std = X64.std(axis=0)
        return mean, np.where(std == 0, 1.0, std)
    mean = np.empty(d)
    std = np.empty(d)
    h.dcgp_fit_scaler_f64(_ptr(X64), n, d, _ptr(mean), _ptr(std))
    return mean, std


def standardize(X: np.ndarray, mean: np.ndarray, std: np.ndarray,
                dtype=np.float32) -> np.ndarray:
    h = lib()
    if h is None or dtype != np.float32:
        return ((X - mean) / std).astype(dtype)
    Xf = np.ascontiguousarray(X, dtype=np.float32)
    n, d = Xf.shape
    out = np.empty((n, d), np.float32)
    h.dcgp_standardize_f32(
        _ptr(Xf), _ptr(np.ascontiguousarray(mean, np.float32)),
        _ptr(np.ascontiguousarray(std, np.float32)), _ptr(out), n, d)
    return out


def gather_rows(X: np.ndarray, idx: np.ndarray) -> np.ndarray:
    h = lib()
    if h is None or X.dtype != np.float32:
        return X[idx]
    idx64 = np.ascontiguousarray(idx, np.int64)
    if idx64.size and (idx64.min() < 0 or idx64.max() >= X.shape[0]):
        raise IndexError(  # match the numpy fallback instead of OOB reads
            f"gather_rows indices out of range [0, {X.shape[0]})")
    Xc = np.ascontiguousarray(X.reshape(X.shape[0], -1))
    out = np.empty((idx64.shape[0], Xc.shape[1]), np.float32)
    h.dcgp_gather_rows_f32(_ptr(Xc), _ptr(idx64), _ptr(out),
                           idx64.shape[0], Xc.shape[1])
    return out.reshape((idx64.shape[0],) + X.shape[1:])


def extract_patches(NHWC: np.ndarray, f: int, stride: int = 1) -> np.ndarray:
    """Host im2col: [N, H, W, C] -> [N, P, f*f*C]."""
    n, hh, ww, c = NHWC.shape
    ph = (hh - f) // stride + 1
    pw = (ww - f) // stride + 1
    h = lib()
    if h is None or NHWC.dtype != np.float32:
        win = np.lib.stride_tricks.sliding_window_view(NHWC, (f, f),
                                                       axis=(1, 2))
        win = win[:, ::stride, ::stride]          # [N, ph, pw, C, f, f]
        win = np.moveaxis(win, 3, -1)             # [N, ph, pw, f, f, C]
        return win.reshape(n, ph * pw, f * f * c)
    Xc = np.ascontiguousarray(NHWC)
    out = np.empty((n, ph * pw, f * f * c), np.float32)
    h.dcgp_extract_patches_f32(_ptr(Xc), n, hh, ww, c, f, stride, _ptr(out))
    return out


def sample_patches(NHWC: np.ndarray, img: np.ndarray, ys: np.ndarray,
                   xs: np.ndarray, f: int) -> np.ndarray:
    """Gather ``len(img)`` patches at the given (image, y, x) offsets."""
    n, hh, ww, c = NHWC.shape
    img = np.asarray(img)
    ys = np.asarray(ys)
    xs = np.asarray(xs)
    if len(img) and not (
            (0 <= img.min() and img.max() < n)
            and (0 <= ys.min() and ys.max() <= hh - f)
            and (0 <= xs.min() and xs.max() <= ww - f)):
        raise IndexError("sample_patches offsets out of range")
    h = lib()
    if h is None or NHWC.dtype != np.float32:
        win = np.lib.stride_tricks.sliding_window_view(NHWC, (f, f),
                                                       axis=(1, 2))
        patches = win[img, ys, xs]                # [count, C, f, f]
        patches = np.moveaxis(patches, 1, -1)     # [count, f, f, C]
        return patches.reshape(len(img), -1)
    Xc = np.ascontiguousarray(NHWC)
    out = np.empty((len(img), f * f * c), np.float32)
    h.dcgp_sample_patches_f32(
        _ptr(Xc), n, hh, ww, c, f,
        _ptr(np.ascontiguousarray(img, np.int32)),
        _ptr(np.ascontiguousarray(ys, np.int32)),
        _ptr(np.ascontiguousarray(xs, np.int32)), _ptr(out), len(img))
    return out
