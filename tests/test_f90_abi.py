"""Fortran-binding ABI validation that runs WITHOUT a Fortran compiler.

The reference executes src/f90-mod/tests/test_coupling.F90 under CTest;
this environment ships no gfortran (VERDICT r1 #6), so the F90 surface is
validated structurally instead: every `bind(c, name=...)` interface in
coupling/rdycore_tpu.F90 must (a) resolve as a symbol in the built
librdycore_tpu_capi.so and (b) agree in argument count with the C
prototype in csrc/capi.c. When gfortran IS present (a real E3SM host),
test_capi.py additionally compile-checks the module."""

import ctypes
import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
F90 = os.path.join(REPO, "coupling", "rdycore_tpu.F90")
CAPI = os.path.join(REPO, "csrc", "capi.c")
SO = os.path.join(REPO, "csrc", "librdycore_tpu_capi.so")


def _build_so():
    if not os.path.exists(SO):
        subprocess.run(
            ["make", "-C", os.path.join(REPO, "csrc"), "capi"],
            check=True, capture_output=True,
        )


def _f90_interfaces():
    """{symbol: n_args} from the bind(c) interface blocks."""
    src = open(F90).read()
    # join continuation lines
    src = re.sub(r"&\s*\n\s*", " ", src)
    out = {}
    # function c_xxx(args) bind(c, name="sym") result(r)
    for m in re.finditer(
        r"function\s+\w+\s*\(([^)]*)\)\s*bind\(c,\s*name=\"(\w+)\"\)",
        src,
        re.IGNORECASE,
    ):
        args = [a.strip() for a in m.group(1).split(",") if a.strip()]
        out[m.group(2)] = len(args)
    return out


def _c_prototypes():
    """{symbol: n_args} from capi.c's exported rdytpu_* definitions."""
    src = open(CAPI).read()
    out = {}
    for m in re.finditer(
        r"^\s*(?:int|int32_t|int64_t)\s+(rdytpu_\w+)\s*\(([^)]*)\)\s*\{",
        src,
        re.MULTILINE | re.DOTALL,
    ):
        args = [a.strip() for a in m.group(2).split(",") if a.strip()]
        if args == ["void"]:
            args = []
        out[m.group(1)] = len(args)
    return out


def test_f90_bind_c_symbols_exist_and_arities_match():
    _build_so()
    lib = ctypes.CDLL(SO)
    interfaces = _f90_interfaces()
    protos = _c_prototypes()
    assert len(interfaces) >= 25, "F90 interface parse looks broken"

    missing, mismatched = [], []
    for sym, nargs in interfaces.items():
        if not hasattr(lib, sym):
            missing.append(sym)
            continue
        if sym in protos and protos[sym] != nargs:
            mismatched.append((sym, nargs, protos[sym]))
    assert not missing, f"F90 binds symbols absent from the .so: {missing}"
    assert not mismatched, (
        "F90/C argument-count mismatches (F90 args, C args): " + str(mismatched)
    )


def test_f90_covers_full_capi_surface():
    """Every exported rdytpu_* C function has a Fortran binding (the
    reference's rdycore.F90 mirrors the whole C API one-for-one)."""
    interfaces = _f90_interfaces()
    protos = _c_prototypes()
    unbound = sorted(set(protos) - set(interfaces))
    assert not unbound, f"C API functions with no F90 binding: {unbound}"
