"""Python facade for the native IO extension (native/g4d_native.cpp).

Auto-builds the C++ extension on first use (g++ via setuptools); every entry
point has a pure-python fallback so the pipeline works without a compiler.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import List, Optional, Tuple

import numpy as np

_NATIVE = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def ensure_built(quiet: bool = True) -> bool:
    """Build (if needed) and import g4d_native; returns availability."""
    global _NATIVE, _TRIED
    if _NATIVE is not None:
        return True
    if _TRIED:
        return False
    _TRIED = True
    native_dir = os.path.abspath(_NATIVE_DIR)
    sys.path.insert(0, native_dir)
    try:
        import g4d_native  # noqa: F401

        _NATIVE = g4d_native
        return True
    except ImportError:
        pass
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=native_dir, check=True,
            capture_output=quiet)
        import g4d_native

        _NATIVE = g4d_native
        return True
    except Exception:
        return False


def read_bin(path: str) -> np.ndarray:
    """Read a .bin float32 vertex file -> (N, 3). Reference
    `dataloader.py:176` (np.fromfile)."""
    if ensure_built():
        return np.frombuffer(_NATIVE.read_bin(path), np.float32).reshape(-1, 3)
    return np.fromfile(path, np.float32).reshape(-1, 3)


def read_bin_batch(paths: List[str], threads: int = 8) -> List[np.ndarray]:
    """Threaded batch read of .bin files (the per-frame garment files)."""
    if ensure_built():
        bufs = _NATIVE.read_bin_batch(list(paths), threads)
        return [np.frombuffer(b, np.float32).reshape(-1, 3) for b in bufs]
    return [np.fromfile(p, np.float32).reshape(-1, 3) for p in paths]


def parse_obj(path: str) -> Tuple[np.ndarray, list]:
    """Parse an OBJ: (verts (V,3) f32, faces list-of-lists)."""
    if ensure_built():
        vb, fb, ob = _NATIVE.parse_obj(path)
        verts = np.frombuffer(vb, np.float32).reshape(-1, 3)
        idx = np.frombuffer(fb, np.int32)
        off = np.frombuffer(ob, np.int32)
        faces = [idx[off[i]:off[i + 1]].tolist() for i in range(len(off) - 1)]
        return verts, faces
    from garment4d_tpu.data.obj_io import read_obj

    verts, faces, _, _ = read_obj(path)
    return verts, faces


def barycentric(verts: np.ndarray, ind: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Barycentric remesh (reference `mesh_utils.py:136-139`)."""
    if ensure_built():
        v = np.ascontiguousarray(verts, np.float32)
        i = np.ascontiguousarray(ind, np.int64)
        ww = np.ascontiguousarray(w, np.float64)
        out = _NATIVE.barycentric(v.tobytes(), i.tobytes(), ww.tobytes())
        return np.frombuffer(out, np.float32).reshape(-1, 3)
    indv = verts[ind]
    return np.einsum("mk,mkc->mc", w, indv).astype(np.float32)
