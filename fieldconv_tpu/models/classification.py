"""SHREC11 classification network (reference classification.ipynb cell 8)."""

from __future__ import annotations

import flax.linen as lnn
import jax.numpy as jnp

from ..nn.modules import FCResNetBlock, FieldConv, LiftBlock
from ..precomp.edge_table import EdgeTable
from ..utils import complexops as co


class ClassificationNet(lnn.Module):
    """Lift + 2×FCResNet + FieldConv→classes + masked mean pool + bias.

    Parity quirk (SURVEY.md §6c.1): the notebook passes the *full* stencil to
    LiftBlock, so TransField reads K-columns (0, 1) = frequencies (-B, -B+1)
    instead of (0, +1).  ``legacy_lift_slice`` (default True) reproduces it.
    """

    n_classes: int
    nf: int = 32
    band_limit: int = 2
    n_rings: int = 6
    ftype: int = 1
    legacy_lift_slice: bool = True
    d_chunk: int = 128

    @lnn.compact
    def __call__(self, pos, table: EdgeTable, banded=None, comp=None):
        if comp is not None:
            raise ValueError(
                "ClassificationNet has no ECHO stage; comp tables are for "
                "segmentation/correspondence batches")
        B = self.band_limit
        lift_cols = (0, 1) if self.legacy_lift_slice else (B, B + 1)
        kw = dict(
            band_limit=B, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk,
        )

        x = LiftBlock(
            3, self.nf, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, name="lift",
        )(pos, table, lift_cols)
        x = FCResNetBlock(self.nf, self.nf, name="resnet1", **kw)(x, table, banded)
        x = FCResNetBlock(self.nf, self.nf, name="resnet2", **kw)(x, table, banded)
        x = FieldConv(self.nf, self.n_classes, name="conv_out", **kw)(x, table, banded)

        # Masked mean pool over real vertices (cell 8: mean(softAbs(x))).
        mags = co.soft_abs(x) * table.vmask[:, None]
        pooled = jnp.sum(mags, axis=0, keepdims=True) / table.n_valid

        bias = self.param("bias", lnn.initializers.zeros, (1, self.n_classes))
        return pooled + bias
