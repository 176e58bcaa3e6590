"""ORCA graphlet node-orbit counting: C++ core + ctypes binding.

Replaces the reference's vendored ORCA
(molecule/eval_src/evaluation/orca/orca.cpp + orcamodule.cpp): same CLI
contract (`orca node 4 in.txt std`) and a direct in-process API. The shared
library is compiled on first use and cached next to this file.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "orca.cpp")
_LIB = os.path.join(_THIS_DIR, "liborca.so")
_BIN = os.path.join(_THIS_DIR, "orca")

NUM_ORBITS_4 = 15
NUM_ORBITS_5 = 73


def _build(target: str) -> str:
    if target == "lib":
        out, flags = _LIB, ["-shared", "-fPIC", "-DORCA_SHARED"]
    else:
        out, flags = _BIN, []
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(_SRC)):
        subprocess.run(["g++", "-O2", "-std=c++17", *flags, "-o", out, _SRC],
                       check=True)
    return out


_handle: Optional[ctypes.CDLL] = None


def _lib() -> ctypes.CDLL:
    global _handle
    if _handle is None:
        _handle = ctypes.CDLL(_build("lib"))
        _handle.orca_count_node_orbits.restype = ctypes.c_int
        _handle.orca_count_node_orbits.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
    return _handle


def orca_binary_path() -> str:
    """Path to the compiled CLI (subprocess-compatible with the reference)."""
    return _build("bin")


def _count(max_k: int, num_orbits: int, n: int, edges) -> np.ndarray:
    edges = np.ascontiguousarray(np.asarray(edges, np.int32).reshape(-1, 2))
    out = np.zeros((n, num_orbits), np.int64)
    rc = _lib().orca_count_node_orbits(
        max_k, int(n), len(edges), edges.reshape(-1), out.reshape(-1))
    if rc != 0:
        raise ValueError(f"orca failed with code {rc}")
    return out


def count_node_orbits4(n: int, edges) -> np.ndarray:
    """Node orbit counts for graphlets up to 4 nodes: [n, 15] int64.

    edges: [m, 2] int array of undirected edges (duplicates/self-loops
    ignored)."""
    return _count(4, NUM_ORBITS_4, n, edges)


def count_node_orbits5(n: int, edges) -> np.ndarray:
    """Node orbit counts for graphlets up to 5 nodes: [n, 73] int64
    (Przulj atlas orbits 0..72, matching `orca node 5`)."""
    return _count(5, NUM_ORBITS_5, n, edges)
