"""fieldconv_tpu — TPU-native field convolutions on surfaces.

See README.md; the reference capability set is twmitchel/FieldConv
(ICCV 2021), re-designed for JAX/XLA/Pallas on TPU.
"""

from . import (data, deploy, geometry, models, nn, ops, parallel,
               precomp, train, utils)

__version__ = "0.5.0"

__all__ = [
    "data", "deploy", "geometry", "models", "nn", "ops", "parallel", "precomp",
    "train", "utils", "__version__",
]
