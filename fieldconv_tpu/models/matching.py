"""SHREC19 feature-matching (Siamese descriptor) network
(reference feature_matching.ipynb cell 9)."""

from __future__ import annotations

import flax.linen as lnn

from ..nn.modules import FCResNetBlock, LiftBlock, TangentPerceptron
from ..precomp.edge_table import EdgeTable
from ..utils import complexops as co


class MatchingNet(lnn.Module):
    """Lift(3→16) + 8×FCResNet with 4 meta-residuals + TangentPerceptron→16,
    returning softAbs magnitudes as the descriptor."""

    nf: int = 32
    descriptor_dim: int = 16
    band_limit: int = 1
    n_rings: int = 6
    ftype: int = 1
    d_chunk: int = 128

    @lnn.compact
    def __call__(self, pos, table: EdgeTable, banded=None, comp=None):
        if comp is not None:
            raise ValueError(
                "MatchingNet has no ECHO stage; comp tables are for "
                "segmentation/correspondence batches")
        B, nf = self.band_limit, self.nf
        kw = dict(
            band_limit=B, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk,
        )
        x1 = LiftBlock(
            3, 16, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, name="lift",
        )(pos, table, (B, B + 1))

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
