"""Human-body segmentation network (reference segmentation.ipynb cell 9)."""

from __future__ import annotations

import flax.linen as lnn

from ..nn.modules import ECHOBlock, FCResNetBlock, LiftBlock
from ..precomp.edge_table import EdgeTable


class SegmentationNet(lnn.Module):
    """Lift + 4×FCResNet + ECHOBlock(nf→n_classes)."""

    n_classes: int = 8
    nf: int = 48
    n_des: int = 48
    n_bins: int = 3
    band_limit: int = 2
    n_rings: int = 6
    ftype: int = 1
    d_chunk: int = 128

    @lnn.compact
    def __call__(self, pos, table: EdgeTable, banded=None, comp=None):
        B = self.band_limit
        kw = dict(
            band_limit=B, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk,
        )
        x = LiftBlock(
            3, self.nf, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, name="lift",
        )(pos, table, (B, B + 1))
        for i in range(1, 5):
            x = FCResNetBlock(self.nf, self.nf, name=f"resnet{i}", **kw)(x, table, banded)
        return ECHOBlock(
            self.nf, self.n_classes, n_des=self.n_des, n_bins=self.n_bins,
            name="echo", **kw,
        )(x, table, banded, comp)
