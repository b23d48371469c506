from .modules import (
    ECHO,
    ECHOBlock,
    FCResNetBlock,
    FieldConv,
    LiftBlock,
    Linear,
    TangentLin,
    TangentNonLin,
    TangentPerceptron,
    TransField,
)
from .losses import (
    cross_entropy,
    label_smoothing_loss,
    twin_eval,
    twin_loss,
)

__all__ = [
    "ECHO", "ECHOBlock", "FCResNetBlock", "FieldConv", "LiftBlock", "Linear",
    "TangentLin", "TangentNonLin", "TangentPerceptron", "TransField",
    "cross_entropy", "label_smoothing_loss", "twin_eval", "twin_loss",
]
