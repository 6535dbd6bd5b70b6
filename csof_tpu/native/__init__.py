"""ctypes bindings to the C++ data-plane core (native/csof_native.cpp).

Compiled on first use with the in-image g++ (no pybind11 needed); every
function has a numpy fallback so the framework works without a toolchain.
"""

from csof_tpu.native.bindings import (
    extract_patches_2d,
    extract_patches_3d,
    minmax_normalize,
    native_available,
    one_hot,
    zscore_normalize,
)

__all__ = [
    "native_available",
    "extract_patches_2d",
    "extract_patches_3d",
    "minmax_normalize",
    "zscore_normalize",
    "one_hot",
]
