from .base import (
    ArtifactStore,
    FieldConvDataset,
    MeshRecord,
    process_mesh,
    shared_bucket,
)
from .faustrm import FAUSTRM
from .shapeseg import SHAPESEG
from .shrec11 import SHREC11
from .shrec19 import SHREC19

__all__ = [
    "ArtifactStore", "FieldConvDataset", "MeshRecord", "process_mesh",
    "shared_bucket", "FAUSTRM", "SHAPESEG", "SHREC11", "SHREC19",
]
