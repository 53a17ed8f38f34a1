"""rdycore_tpu: a TPU-native compound-flooding dynamical core.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of RDycore
(https://github.com/RDycore/RDycore): 2-D shallow-water-equations +
tracer-transport finite-volume solver on unstructured meshes, built for
TPU hardware (SPMD over jax.sharding meshes, Pallas kernels on the hot
edge-flux/cell-source path).
"""

__version__ = "0.1.0"

from . import mesh  # noqa: F401
