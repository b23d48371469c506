"""SHREC11 classification network (reference classification.ipynb cell 8)."""

from __future__ import annotations

from typing import Optional

import flax.linen as lnn
import jax
import jax.numpy as jnp

from ..nn.modules import FCResNetBlock, FieldConv, LiftBlock
from ..precomp.edge_table import EdgeTable
from ..utils import complexops as co


class ClassificationNet(lnn.Module):
    """Lift + 2×FCResNet + FieldConv→classes + masked mean pool + bias.

    Parity quirk (SURVEY.md §6c.1): the notebook passes the *full* stencil to
    LiftBlock, so TransField reads K-columns (0, 1) = frequencies (-B, -B+1)
    instead of (0, +1).  ``legacy_lift_slice`` (default True) reproduces it.

    lift_impl: "auto" (gather-free banded lift when a CompressedBandedTable
    is passed) or "gather" (always the padded-CSR path).
    axis_name: run graph-parallel under shard_map — vertex rows are a local
    shard of that axis; requires banded + comp local tables, and
    ``table.n_valid`` must be the GLOBAL valid-vertex count (the mean pool
    psums over the axis).
    """

    n_classes: int
    nf: int = 32
    band_limit: int = 2
    n_rings: int = 6
    ftype: int = 1
    legacy_lift_slice: bool = True
    d_chunk: int = 128
    lift_impl: str = "auto"
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, pos, table: EdgeTable, banded=None, comp=None):
        B = self.band_limit
        lift_cols = (0, 1) if self.legacy_lift_slice else (B, B + 1)
        kw = dict(
            band_limit=B, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, axis_name=self.axis_name,
        )
        lift_comp = None if self.lift_impl == "gather" else comp

        x = LiftBlock(
            3, self.nf, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, axis_name=self.axis_name, name="lift",
        )(pos, table, lift_cols, lift_comp)
        x = FCResNetBlock(self.nf, self.nf, name="resnet1", **kw)(x, table, banded)
        x = FCResNetBlock(self.nf, self.nf, name="resnet2", **kw)(x, table, banded)
        x = FieldConv(self.nf, self.n_classes, name="conv_out", **kw)(x, table, banded)

        # Masked mean pool over real vertices (cell 8: mean(softAbs(x))).
        mags = co.soft_abs(x) * table.vmask[:, None]
        summed = jnp.sum(mags, axis=0, keepdims=True)
        if self.axis_name is not None:
            summed = jax.lax.psum(summed, self.axis_name)
        pooled = summed / table.n_valid

        bias = self.param("bias", lnn.initializers.zeros, (1, self.n_classes))
        return pooled + bias
