"""ctypes bindings for the native conformance oracle (native/golden.cpp).

The oracle is an independently written scalar TS38.212 encoder (dense GF(2)
core solve, literal spec rate-matching loop) used by the differential
testbench — the same role nrULSCH plays for the reference (testbench.m:59-68).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgolden.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if necessary) the golden oracle library."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nr_golden_encode.restype = ctypes.c_int
    lib.nr_golden_encode.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.nr_golden_params.restype = ctypes.c_int
    lib.nr_golden_params.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.nr_golden_decode_core.restype = ctypes.c_int
    lib.nr_golden_decode_core.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def golden_encode(
    BG: int,
    A: int,
    G: int,
    Q_m: int,
    a: np.ndarray,
    N_L: int = 1,
    rv_id: int = 0,
    I_LBRM: int = 0,
    TBS_LBRM: Optional[int] = None,
    CBGTI: Sequence[int] = (),
) -> np.ndarray:
    """Encode one transport block with the native oracle; returns G bits."""
    lib = load()
    a = np.ascontiguousarray(np.asarray(a, dtype=np.uint8))
    assert a.size == A
    g = np.zeros(G, dtype=np.uint8)
    cbgti = np.ascontiguousarray(np.asarray(list(CBGTI), dtype=np.int32))
    rc = lib.nr_golden_encode(
        BG, A, G, Q_m, N_L, rv_id,
        I_LBRM, -1 if TBS_LBRM is None else TBS_LBRM,
        cbgti.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(CBGTI),
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"nr_golden_encode failed with code {rc}")
    return g


def golden_params(
    BG: int, A: int, G: int, Q_m: int, N_L: int = 1, rv_id: int = 0,
    I_LBRM: int = 0, TBS_LBRM: Optional[int] = None,
) -> dict:
    lib = load()
    out = np.zeros(8, dtype=np.int64)
    rc = lib.nr_golden_params(
        BG, A, G, Q_m, N_L, rv_id, I_LBRM,
        -1 if TBS_LBRM is None else TBS_LBRM,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    if rc != 0:
        raise RuntimeError(f"nr_golden_params failed with code {rc}")
    keys = ("C", "K_prime", "K_b", "Z_c", "i_LS", "K", "N", "B")
    return dict(zip(keys, out.tolist()))


def golden_decode_core(
    BG: int,
    Z: int,
    llr: np.ndarray,
    iterations: int = 50,
    algorithm: str = "min-sum",
    alpha: float = 0.8125,
    beta: float = 0.15,
):
    """Flooding BP decode with the native oracle (min-sum family only).

    llr: (..., n_cols*Z) float32 lifted-layout channel LLRs.  Returns
    (bits, parity_ok, iterations_used) with the same leading shape —
    bit-exact vs ops.decoder_fast.decode / the Pallas flooding kernel
    (see nr_golden_decode_core in native/golden.cpp for the contract).
    """
    lib = load()
    algo = {"min-sum": 0, "offset-min-sum": 1}[algorithm]
    llr = np.ascontiguousarray(np.asarray(llr, dtype=np.float32))
    nv = llr.shape[-1]
    flat = llr.reshape(-1, nv)
    bits = np.zeros_like(flat, dtype=np.uint8)
    ok = np.zeros(flat.shape[0], dtype=np.int32)
    used = np.zeros(flat.shape[0], dtype=np.int32)
    one_ok = ctypes.c_int(0)
    one_used = ctypes.c_int(0)
    for i in range(flat.shape[0]):
        rc = lib.nr_golden_decode_core(
            BG, Z, iterations, algo,
            ctypes.c_float(alpha), ctypes.c_float(beta),
            flat[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bits[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(one_ok), ctypes.byref(one_used),
        )
        if rc != 0:
            raise RuntimeError(f"nr_golden_decode_core failed with code {rc}")
        ok[i] = one_ok.value
        used[i] = one_used.value
    shape = llr.shape[:-1]
    return (
        bits.reshape(llr.shape),
        ok.astype(bool).reshape(shape),
        used.reshape(shape),
    )
