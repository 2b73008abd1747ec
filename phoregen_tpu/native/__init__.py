"""ctypes binding for the native host kernels (lazy g++ build, gated).

Provides C implementations of the host-side generation hot path — EDM bond
perception, valence sanitize, connectivity — with transparent fallback to the
pure-Python versions when no compiler is available. See `phoregen_host.cpp`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from ..constants import ATOMIC_NUMBERS, ELEMENT_SYMBOLS, SYMBOL_TO_ATOMIC_NUMBER

_SRC = os.path.join(os.path.dirname(__file__), "phoregen_host.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libphoregen_host.so")

_lib = None
_tables = None
_load_error: Optional[str] = None

N_Z = 120  # table dimension: atomic numbers 0..119


class _BondTables(ctypes.Structure):
    _fields_ = [
        ("bonds1", ctypes.POINTER(ctypes.c_float)),
        ("bonds2", ctypes.POINTER(ctypes.c_float)),
        ("bonds3", ctypes.POINTER(ctypes.c_float)),
        ("n_z", ctypes.c_int),
        ("margin1", ctypes.c_float),
        ("margin2", ctypes.c_float),
        ("margin3", ctypes.c_float),
    ]


def _src_hash() -> str:
    import hashlib
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> bool:
    # rebuild keyed on a content hash of the source (mtimes are not
    # preserved by git, so a stale committed binary could shadow new source)
    stamp = _SO + ".sha256"
    want = _src_hash()
    if os.path.exists(_SO) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == want:
                return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        with open(stamp, "w") as f:
            f.write(want)
        return True
    except Exception as e:  # pragma: no cover - no compiler
        global _load_error
        _load_error = f"native build failed: {e}"
        return False


def _dense_tables():
    """Flatten the symbol-keyed pm tables into dense [N_Z*N_Z] arrays."""
    from ..sample.predict_bonds import (BONDS1, BONDS2, BONDS3, MARGIN1,
                                        MARGIN2, MARGIN3)

    def densify(d):
        arr = np.zeros((N_Z, N_Z), np.float32)
        for s1, row in d.items():
            z1 = SYMBOL_TO_ATOMIC_NUMBER.get(s1, 1 if s1 == "H" else None)
            if z1 is None:
                continue
            for s2, pm in row.items():
                z2 = SYMBOL_TO_ATOMIC_NUMBER.get(s2,
                                                 1 if s2 == "H" else None)
                if z2 is None:
                    continue
                arr[z1, z2] = max(arr[z1, z2], float(pm))
                arr[z2, z1] = max(arr[z2, z1], float(pm))
        return np.ascontiguousarray(arr.reshape(-1))

    # NOTE: the Python path sorts symbols alphabetically before lookup
    # (predict_bonds.py:83-85); densifying symmetrically reproduces the same
    # effective table for every ordered pair.
    b1, b2, b3 = densify(BONDS1), densify(BONDS2), densify(BONDS3)
    return b1, b2, b3, (MARGIN1, MARGIN2, MARGIN3)


def _max_valence_table() -> np.ndarray:
    from ..sample.chem import ALLOWED_VALENCES
    arr = np.zeros(N_Z, np.float32)
    for sym, vals in ALLOWED_VALENCES.items():
        z = SYMBOL_TO_ATOMIC_NUMBER.get(sym, 1 if sym == "H" else None)
        if z is not None:
            arr[z] = max(vals)
    return arr


def _load():
    global _lib, _tables, _load_error
    if os.environ.get("PHOREGEN_NO_NATIVE"):
        return None
    if _lib is not None or _load_error is not None:
        return _lib
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:  # pragma: no cover
        _load_error = str(e)
        return None
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib.predict_bonds.restype = ctypes.c_int
    lib.predict_bonds.argtypes = [
        ctypes.POINTER(_BondTables), ctypes.c_int, c_i32p, c_f32p,
        c_i32p, c_i32p, c_i32p, ctypes.c_int]
    lib.check_mol.restype = ctypes.c_int
    lib.check_mol.argtypes = [
        ctypes.c_int, c_i32p, ctypes.c_int, c_i32p, c_i32p, c_i32p,
        c_f32p, ctypes.c_int]
    b1, b2, b3, margins = _dense_tables()
    tables = _BondTables(
        bonds1=b1.ctypes.data_as(c_f32p),
        bonds2=b2.ctypes.data_as(c_f32p),
        bonds3=b3.ctypes.data_as(c_f32p),
        n_z=N_Z, margin1=margins[0], margin2=margins[1], margin3=margins[2])
    # keep the arrays alive alongside the struct
    tables._keep = (b1, b2, b3)
    _lib = lib
    _tables = tables
    _maxval = _max_valence_table()
    _load.maxval = _maxval
    return _lib


def available() -> bool:
    return _load() is not None


def predict_bonds_native(elements, pos
                         ) -> Optional[Tuple[List[List[int]], List[int]]]:
    """Native EDM bond perception; returns directed lists like the Python
    `predict_bonds`, or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(elements)
    el = np.ascontiguousarray(np.asarray(elements, np.int32))
    p = np.ascontiguousarray(np.asarray(pos, np.float32).reshape(-1))
    cap = max(n * n, 16)
    bi = np.empty(cap, np.int32)
    bj = np.empty(cap, np.int32)
    bo = np.empty(cap, np.int32)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    m = lib.predict_bonds(
        ctypes.byref(_tables), n, el.ctypes.data_as(c_i32p),
        p.ctypes.data_as(c_f32p), bi.ctypes.data_as(c_i32p),
        bj.ctypes.data_as(c_i32p), bo.ctypes.data_as(c_i32p), cap)
    if m < 0:
        return None
    src = np.concatenate([bi[:m], bj[:m]])
    dst = np.concatenate([bj[:m], bi[:m]])
    order = np.concatenate([bo[:m], bo[:m]])
    # interleave to match the Python path's [i, j, i2, j2...] ordering
    idx = np.empty(2 * m, np.int64)
    idx[0::2] = np.arange(m)
    idx[1::2] = np.arange(m) + m
    return [src[idx].tolist(), dst[idx].tolist()], order[idx].tolist()


def check_mol_native(elements, bonds) -> Optional[Tuple[bool, bool]]:
    """(sanitizable, connected) via the C kernel; None if unavailable.

    bonds: iterable of (i, j, order) undirected.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(elements)
    el = np.ascontiguousarray(np.asarray(elements, np.int32))
    bonds = list(bonds)
    m = len(bonds)
    bi = np.ascontiguousarray(np.asarray([b[0] for b in bonds], np.int32))
    bj = np.ascontiguousarray(np.asarray([b[1] for b in bonds], np.int32))
    bo = np.ascontiguousarray(np.asarray([b[2] for b in bonds], np.int32))
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    mv = _load.maxval
    flags = lib.check_mol(
        n, el.ctypes.data_as(c_i32p), m,
        bi.ctypes.data_as(c_i32p) if m else None,
        bj.ctypes.data_as(c_i32p) if m else None,
        bo.ctypes.data_as(c_i32p) if m else None,
        mv.ctypes.data_as(c_f32p), N_Z)
    return bool(flags & 1), bool(flags & 2)
