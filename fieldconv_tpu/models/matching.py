"""SHREC19 feature-matching (Siamese descriptor) network
(reference feature_matching.ipynb cell 9)."""

from __future__ import annotations

from typing import Optional

import flax.linen as lnn

from ..nn.modules import FCResNetBlock, LiftBlock, TangentPerceptron
from ..precomp.edge_table import EdgeTable
from ..utils import complexops as co


class MatchingNet(lnn.Module):
    """Lift(3→16) + 8×FCResNet with 4 meta-residuals + TangentPerceptron→16,
    returning softAbs magnitudes as the descriptor.

    No ECHO stage; an optional CompressedBandedTable only feeds the
    gather-free lift (lift_impl, see models/classification.py)."""

    nf: int = 32
    descriptor_dim: int = 16
    band_limit: int = 1
    n_rings: int = 6
    ftype: int = 1
    d_chunk: int = 128
    lift_impl: str = "auto"
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, pos, table: EdgeTable, banded=None, comp=None):
        B, nf = self.band_limit, self.nf
        kw = dict(
            band_limit=B, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, axis_name=self.axis_name,
        )
        lift_comp = None if self.lift_impl == "gather" else comp
        x1 = LiftBlock(
            3, 16, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, axis_name=self.axis_name, name="lift",
        )(pos, table, (B, B + 1), lift_comp)

        x = FCResNetBlock(16, nf, name="resnet1", **kw)(x1, table, banded)
        x2 = FCResNetBlock(nf, nf, name="resnet2", **kw)(x, table, banded) + \
            TangentPerceptron(16, nf, name="res1")(x1)
        x = FCResNetBlock(nf, nf, name="resnet3", **kw)(x2, table, banded)
        x3 = FCResNetBlock(nf, nf, name="resnet4", **kw)(x, table, banded) + \
            TangentPerceptron(nf, nf, name="res2")(x2)
        x = FCResNetBlock(nf, nf, name="resnet5", **kw)(x3, table, banded)
        x4 = FCResNetBlock(nf, nf, name="resnet6", **kw)(x, table, banded) + \
            TangentPerceptron(nf, nf, name="res3")(x3)
        x = FCResNetBlock(nf, nf, name="resnet7", **kw)(x4, table, banded)
        x = FCResNetBlock(nf, nf, name="resnet8", **kw)(x, table, banded) + \
            TangentPerceptron(nf, nf, name="res4")(x4)

        x = TangentPerceptron(nf, self.descriptor_dim, name="out")(x)
        return co.soft_abs(x)
