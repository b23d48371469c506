from .classification import ClassificationNet
from .segmentation import SegmentationNet
from .correspondence import CorrespondenceNet
from .matching import MatchingNet

__all__ = [
    "ClassificationNet",
    "SegmentationNet",
    "CorrespondenceNet",
    "MatchingNet",
]
