"""Graph-parallel field convolution over panel-CSR tables.

The multi-chip path for 100k+-vertex meshes (BASELINE's north-star
config): the PANEL STENCIL — the dominant memory, 3-5.5GB at 163k
vertices (docs/SCALE_100K.json) — shards by contiguous target-block
ranges over the 'graph' mesh axis (precomp/banded.py::shard_panel_table),
while the small rotated-source tensor g (N x K·2C, ~60MB at 163k/C=16)
is all_gather'ed over ICI each layer.  The gather's transpose is a
psum_scatter, so each shard's masked dG contribution (by-source backward
grid + coverage zeroing, ops/pallas/band_conv.py::_band_panel) sums
exactly onto the owner rows — N-shard values and grads match 1-device
bitwise-modulo-f32 (tests/test_panel_gp.py).

This complements parallel/halo.py (ring-halo exchange for the dense
banded layout): halo riding ppermutes is the low-latency choice when the
support fits a +-nh block window; panel sharding is the scalable choice
when it does not.  The reference has no distributed code at all
(SURVEY.md §2.14b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..precomp.banded import PanelShards


def field_conv_panel_gp(x, shard: PanelShards, zonal, spherical, phase,
                        ftype, axis_name: str, precision: str = "f32"):
    """Shard-local field convolution: (N_local, C, 2) -> (N_local, O, 2).

    Call inside shard_map over `axis_name`; `shard` must be the LOCAL
    row of a PanelShards (leading shard axis already consumed by the
    shard_map in_spec, i.e. arrays carry shapes (P, ...), (4, P), ...).
    """
    from ..ops.field_conv import filter_coefficients
    from ..ops.pallas.band_conv import (_band_panel, filters_to_wmat,
                                        rotated_source_tensor_kmajor)

    g = rotated_source_tensor_kmajor(x, shard.band_limit)
    g_full = jax.lax.all_gather(g, axis_name, axis=0, tiled=True)
    coeff = filter_coefficients(zonal, spherical, phase, ftype,
                                shard.band_limit)
    wmat = filters_to_wmat(coeff)
    y2 = _band_panel(g_full, wmat, shard.sten, shard.meta, shard.meta_s,
                     shard.coverage, shard.tb, shard.n_rings,
                     shard.band_limit, shard.compressed, precision,
                     x.shape[0])
    O = wmat.shape[-1] // 2
    return jnp.stack([y2[:, :O], y2[:, O:]], axis=-1)


def local_shard(shards: PanelShards) -> PanelShards:
    """View the shard_map-local row of a stacked PanelShards: squeeze the
    leading shard axis (shard_map in_specs P(axis) deliver shape (1, ...))."""
    return PanelShards(
        sten=shards.sten[0], meta=shards.meta[0], meta_s=shards.meta_s[0],
        coverage=shards.coverage[0],
        tb=shards.tb, n_pad=shards.n_pad, n_local=shards.n_local,
        band_limit=shards.band_limit, n_rings=shards.n_rings,
        compressed=shards.compressed,
    )
