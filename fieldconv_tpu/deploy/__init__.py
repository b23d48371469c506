"""Deployment: self-contained model bundles + AOT-compiled serving.

The reference has no deployment story — trained weights live only in
notebook memory and evaluation reuses the in-session net
(classification.ipynb cells 13-15).  This package makes a trained model a
shippable artifact (`bundle.py`) and serves it with ahead-of-time compiled,
fixed-shape inference (`predictor.py`, `cli.py`).
"""

from .bundle import export_bundle, load_bundle, Bundle
from .predictor import Predictor

__all__ = ["export_bundle", "load_bundle", "Bundle", "Predictor"]
