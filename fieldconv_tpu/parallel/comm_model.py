"""Analytic communication model for the graph-parallel schemes.

Real multi-chip hardware is not reachable in this environment, but the
bytes each scheme moves are exact functions of the shapes — and the
collectives XLA actually emits are checked against these formulas in
tests/test_comm_model.py (compiled-HLO inspection on the virtual mesh).
docs/KERNEL_NOTES.md carries the projection of these numbers to the 163k
north-star config against the measured per-shard compute times.

Conventions: bytes are WIRE bytes per device per collective under a ring
implementation — a device receives (and forwards) everything it does not
already own, (S-1)/S of the full buffer ≈ the non-local rows.  f32 = 4.
"""

from __future__ import annotations


def _k(band_limit: int) -> int:
    return 2 * band_limit + 1


def conv_panel_bytes(n_pad: int, n_local: int, band_limit: int,
                     channels: int, f: int = 4) -> dict:
    """field_conv_panel_gp (parallel/panel_gp.py): forward all_gathers the
    rotated-source tensor g (N, K·2C); the gather's AD transpose is a
    reduce_scatter of dG at the same volume."""
    m = _k(band_limit) * 2 * channels
    per = (n_pad - n_local) * m * f
    return {"fwd_all_gather": per, "bwd_reduce_scatter": per}


def lift_panel_bytes(n_pad: int, n_local: int, channels: int = 3,
                     f: int = 4) -> dict:
    """trans_field_panel_gp: all_gather of the (N, C) scalar features."""
    per = (n_pad - n_local) * channels * f
    return {"fwd_all_gather": per, "bwd_reduce_scatter": per}


def echo_panel_bytes(n_pad: int, n_local: int, channels: int,
                     f: int = 4) -> dict:
    """echo_panel_gp: all_gather of the (N, C, 2) tangent features."""
    per = (n_pad - n_local) * channels * 2 * f
    return {"fwd_all_gather": per, "bwd_reduce_scatter": per}


def conv_compact_halo_bytes(h: int, n_shards: int, channels: int,
                            f: int = 4) -> dict:
    """field_conv_compact_gp over CompactHaloShards (boundary-compressed):
    forward all_to_all of the (S, H) RAW-feature row buffers (H × 2C each;
    the rotated-source tensor is recomputed on the received rows, so the
    K-fold g width never rides the wire); the AD transpose moves the same
    volume back.  Wire bytes per device: the S-1 remote buffers."""
    per = (n_shards - 1) * h * 2 * channels * f
    return {"fwd_all_to_all": per, "bwd_all_to_all": per}


def lift_compact_halo_bytes(h: int, n_shards: int, channels: int = 3,
                            f: int = 4) -> dict:
    """trans_field_compact_gp over CompactHaloShards: all_to_all of the
    (S, H) scalar-feature row buffers."""
    per = (n_shards - 1) * h * channels * f
    return {"fwd_all_to_all": per, "bwd_all_to_all": per}


def echo_compact_halo_bytes(h: int, n_shards: int, channels: int,
                            f: int = 4) -> dict:
    """echo_compact_gp over CompactHaloShards: all_to_all of the (S, H)
    tangent-feature row buffers (H × C × 2)."""
    per = (n_shards - 1) * h * channels * 2 * f
    return {"fwd_all_to_all": per, "bwd_all_to_all": per}


def conv_halo_bytes(nh: int, tb: int, band_limit: int, channels: int,
                    f: int = 4) -> dict:
    """halo_field_conv (parallel/halo.py): two ppermutes (left + right
    boundary windows of g, nh·TB rows each) forward; their transposes move
    the same volume back."""
    m = _k(band_limit) * 2 * channels
    per_dir = nh * tb * m * f
    return {"fwd_ppermute": 2 * per_dir, "bwd_ppermute": 2 * per_dir}


def correspondence_conv_channels(nf: int = 32) -> list:
    """Input-channel width of every FieldConv in the correspondence net
    (the all_gather'd g scales with the INPUT channels): resnet1.conv1
    runs at 16, the echo-block conv at 16, the other 15 at nf."""
    chans = [16, nf]                       # resnet1
    for _ in range(6):                     # resnet2..7
        chans += [nf, nf]
    chans += [nf, nf]                      # resnet8 (frontload: 32->32->16)
    chans += [16]                          # echo-block conv
    return chans


def correspondence_panel_step_bytes(n_pad: int, n_local: int,
                                    band_limit: int = 1, nf: int = 32,
                                    n_des: int = 12, f: int = 4) -> dict:
    """Wire bytes per device for ONE fwd+bwd training step of the full
    correspondence net over panel shards (the 163k config), split by
    direction.  The lift has no backward reduce_scatter: training
    differentiates w.r.t. params, never w.r.t. the gathered positions
    (verified against the compiled step, tests/test_comm_model.py)."""
    ag = rs = 0
    for c in correspondence_conv_channels(nf):
        b = conv_panel_bytes(n_pad, n_local, band_limit, c, f)
        ag += b["fwd_all_gather"]
        rs += b["bwd_reduce_scatter"]
    lift = lift_panel_bytes(n_pad, n_local, 3, f)
    echo = echo_panel_bytes(n_pad, n_local, n_des, f)
    ag += lift["fwd_all_gather"] + echo["fwd_all_gather"]
    rs += echo["bwd_reduce_scatter"]
    return {"all_gather": ag, "reduce_scatter": rs, "total": ag + rs}


def correspondence_compact_halo_step_bytes(h: int, n_shards: int,
                                           nf: int = 32, n_des: int = 12,
                                           f: int = 4) -> dict:
    """Wire bytes per device for ONE fwd+bwd training step of the full
    correspondence net over boundary-compressed compact shards (the
    all-compact 163k multi-chip mode with CompactHaloShards).  The lift
    has no backward all_to_all: training differentiates w.r.t. params,
    never w.r.t. the gathered positions (same structure as the panel
    enumeration, asserted against compiled HLO in
    tests/test_comm_model.py)."""
    a2a = 0
    for c in correspondence_conv_channels(nf):
        b = conv_compact_halo_bytes(h, n_shards, c, f)
        a2a += b["fwd_all_to_all"] + b["bwd_all_to_all"]
    lift = lift_compact_halo_bytes(h, n_shards, 3, f)
    echo = echo_compact_halo_bytes(h, n_shards, n_des, f)
    a2a += lift["fwd_all_to_all"]
    a2a += echo["fwd_all_to_all"] + echo["bwd_all_to_all"]
    return {"all_to_all": a2a, "total": a2a}


def scaling_efficiency(compute_s_1dev: float, n_shards: int,
                       wire_bytes_per_dev: float, link_bytes_per_s: float,
                       overlap: float = 0.0) -> float:
    """Projected efficiency = T1/S / (T1/S + (1-overlap)·Tcomm): perfectly
    divided compute plus un-overlapped serial communication time."""
    t_comp = compute_s_1dev / n_shards
    t_comm = wire_bytes_per_dev / link_bytes_per_s * (1.0 - overlap)
    return t_comp / (t_comp + t_comm)
