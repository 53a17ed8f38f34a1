"""rdycore_tpu: a TPU-native compound-flooding dynamical core.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of RDycore
(https://github.com/RDycore/RDycore): 2-D shallow-water-equations +
tracer-transport finite-volume solver on unstructured meshes, built for
TPU hardware (SPMD over jax.sharding meshes, Pallas kernels on the hot
edge-flux/cell-source path).
"""

__version__ = "0.1.0"

import os as _os


def _disable_numpy_thp():
    """Turn off numpy's MADV_HUGEPAGE on fresh allocations.

    With transparent_hugepage=madvise + defrag=madvise (this image's
    kernel config), the first touch of a hugepage-madvised region goes
    through synchronous compaction: measured 0.9 s per 200 MB vs 0.08 s
    for ordinary pages. Host-side setup (mesh build, slotted plan
    packing) allocates ~1.5 GB of one-shot numpy temporaries at the
    2.88M-cell bench mesh, so the stalls dominated the plan-build time.
    The compute path runs on TPU and never touches these pages again,
    so hugepages buy nothing here. RDYTPU_NUMPY_HUGEPAGE=1 restores the
    numpy default."""
    if _os.environ.get("RDYTPU_NUMPY_HUGEPAGE"):
        return
    try:
        try:
            from numpy._core import multiarray as _ma
        except ImportError:  # numpy < 2
            from numpy.core import multiarray as _ma
        _ma._set_madvise_hugepage(False)
    except Exception:
        pass  # private API: a numpy that dropped it just keeps hugepages


_disable_numpy_thp()

from . import mesh  # noqa: F401,E402
