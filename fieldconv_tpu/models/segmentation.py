"""Human-body segmentation network (reference segmentation.ipynb cell 9)."""

from __future__ import annotations

from typing import Optional

import flax.linen as lnn

from ..nn.modules import ECHOBlock, FCResNetBlock, LiftBlock
from ..precomp.edge_table import EdgeTable


class SegmentationNet(lnn.Module):
    """Lift + 4×FCResNet + ECHOBlock(nf→n_classes).

    lift_impl / echo_impl: see models/classification.py and nn.modules.ECHO;
    axis_name runs the whole net graph-parallel under shard_map (all stages
    gather-free over local banded tables + halo exchange).
    """

    n_classes: int = 8
    nf: int = 48
    n_des: int = 48
    n_bins: int = 3
    band_limit: int = 2
    n_rings: int = 6
    ftype: int = 1
    d_chunk: int = 128
    lift_impl: str = "auto"
    echo_impl: str = "auto"
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, pos, table: EdgeTable, banded=None, comp=None):
        B = self.band_limit
        kw = dict(
            band_limit=B, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, axis_name=self.axis_name,
        )
        lift_comp = None if self.lift_impl == "gather" else comp
        x = LiftBlock(
            3, self.nf, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, axis_name=self.axis_name, name="lift",
        )(pos, table, (B, B + 1), lift_comp)
        for i in range(1, 5):
            x = FCResNetBlock(self.nf, self.nf, name=f"resnet{i}", **kw)(x, table, banded)
        return ECHOBlock(
            self.nf, self.n_classes, n_des=self.n_des, n_bins=self.n_bins,
            echo_impl=self.echo_impl, name="echo", **kw,
        )(x, table, banded, comp)
