"""Independent numpy (complex128) golden implementation of the reference math.

Implemented directly from the documented semantics of the reference ops
(SURVEY.md §2 and the cited reference files) over ragged COO edge lists, as
the torch originals cannot run here (torch_scatter absent).  Used purely as
test fixtures for the TPU ops; deliberately loop-heavy and simple.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-7


# --- soft math (utils/field.py) -------------------------------------------

def is_origin(z, eps=EPS):
    return (np.abs(z.real) < eps) & (np.abs(z.imag) < eps)


def soft_abs(z, eps=EPS):
    return np.where(is_origin(z, eps), 0.0, np.abs(z))


def soft_angle(z, eps=EPS):
    return np.where(is_origin(z, eps), 0.0, np.angle(z))


def soft_absolute(x):
    return np.where(x < 0, -x, x)


def modrelu(x, bias):
    """nn/tangent_nonlin.py:24-35. x: (N, C) complex; bias: (C,)."""
    out = x.copy()
    nz = ~is_origin(x)
    idx = np.nonzero(nz)
    r = np.abs(x[idx])
    theta = np.angle(x[idx])
    out[idx] = np.maximum(r + bias[idx[1]], 0.0) * np.exp(1j * theta)
    return out


# --- FCPrecomp (transforms/fc_precomp.py) ---------------------------------

def radial_interpolant(r, n_rings):
    samples = np.sqrt(np.arange(n_rings) / (n_rings - 1))
    E = len(r)
    weights = np.zeros((E, n_rings))
    for e in range(E):
        diff = samples - r[e]
        diff[diff < 0] = 1e8
        c = int(np.argmin(diff))
        if c == 0:
            c = 1
        f = c - 1
        wc = (r[e] - samples[f]) / (samples[c] - samples[f])
        weights[e, c] = wc
        weights[e, f] = 1.0 - wc
    return weights


def fc_precomp(edges, log_mag, log_ang, w, xp, B, R, epsilon, n_vertices):
    """Returns (edges, supp_sten (E,R,K), ln, wxp) after support filtering."""
    r = log_mag / epsilon
    keep = r <= 1.0
    r, theta = r[keep], log_ang[keep]
    edges, xp = edges[keep], xp[keep]
    src, tgt = edges[:, 0], edges[:, 1]

    denom = np.zeros(n_vertices)
    np.add.at(denom, tgt, w[src])
    w_scatter = w[src] / (1e-12 + denom[tgt])
    wxp = w_scatter * xp

    rsten = radial_interpolant(r, R)
    ks = np.arange(-B, B + 1)
    fsten = np.exp(1j * ks[None, :] * theta[:, None])
    sten = rsten[:, :, None] * fsten[:, None, :] * wxp[:, None, None]
    ln = r * np.exp(1j * theta)
    return edges, sten, ln, wxp


# --- FieldConv (nn/field_conv.py) -----------------------------------------

def field_conv_contrib(x, edges, sten, B, n_vertices):
    """contrib (N, C, R, K)."""
    N, C = n_vertices, x.shape[1]
    E, R, K = sten.shape
    phi = soft_angle(x)
    ks = np.arange(-B, B + 1)
    contrib = np.zeros((N, C, R, K), dtype=np.complex128)
    for e in range(E):
        j, i = edges[e]
        g = x[j][:, None] * np.exp(-1j * ks[None, :] * phi[j][:, None])  # (C, K)
        contrib[i] += g[:, None, :] * sten[e][None, :, :]
    return contrib


def fc_coeff(zonal, spherical, phase, ftype, B):
    if ftype in (0, 1):
        sph = spherical[..., 0] + 1j * spherical[..., 1]      # (O, I, R, B)
        coeff = np.concatenate(
            [np.flip(np.conj(sph), axis=3), zonal[..., None], sph], axis=3
        )
        return coeff
    sph = spherical[..., 0] + 1j * spherical[..., 1]          # (O, I, R, 2B)
    zon = zonal[..., 0] + 1j * zonal[..., 1]
    return np.concatenate([sph[..., :B], zon[..., None], sph[..., B:]], axis=3)


def field_conv(x, edges, sten, zonal, spherical, phase, ftype, B, n_vertices):
    contrib = field_conv_contrib(x, edges, sten, B, n_vertices)
    K = 2 * B + 1
    coeff = fc_coeff(zonal, spherical, phase, ftype, B)
    if ftype == 1:
        weighted = np.einsum("ncrk,ocrk->nock", contrib, coeff)
        phases = np.concatenate([np.flip(phase[..., 1:], axis=-1), phase], axis=-1)
        return np.einsum("nock,ock->no", weighted, np.exp(1j * phases)) / K
    return np.einsum("ncrk,ocrk->no", contrib, coeff) / K


# --- TransField (nn/trans_field.py) ---------------------------------------

def trans_field(x, edges, lift_sten, zonal_ang, zonal_mag, phase, ftype, n_vertices):
    """x: (N, C) real; lift_sten: (E, R, 2) complex (columns 0 and 1)."""
    N, C = n_vertices, x.shape[1]
    E, R = lift_sten.shape[:2]
    contrib_ang = np.zeros((N, C, R), dtype=np.complex128)
    contrib_mag = np.zeros((N, C, R))
    for e in range(E):
        j, i = edges[e]
        xdiff = x[j] - x[i]
        contrib_ang[i] += -1.0 * xdiff[:, None] * lift_sten[e, None, :, 1]
        contrib_mag[i] += x[j][:, None] * soft_abs(lift_sten[e, None, :, 0])
    A = np.einsum("ncr,ocr->noc", contrib_ang, zonal_ang)
    phi = soft_angle(A)
    if ftype == 1:
        phi = phi + phase[None]
    M = np.einsum("ncr,ocr->noc", contrib_mag, zonal_mag)
    rho = soft_absolute(M)
    return np.sum(rho * np.exp(1j * phi), axis=2)


# --- TangentLin ------------------------------------------------------------

def tangent_lin(x, w_re, w_im):
    return x @ (w_re + 1j * w_im).T


# --- ECHO (nn/echo.py) -----------------------------------------------------

def disk_map(n_bins):
    w = 2 * n_bins + 1
    ind = []
    for i in range(w):
        for j in range(w):
            if (i - n_bins) ** 2 + (j - n_bins) ** 2 <= (n_bins + 0.25) ** 2:
                ind.append(w * i + j)
    dmap = np.zeros(w * w, dtype=np.int64)
    dmap[np.array(ind)] = np.arange(len(ind))
    return dmap, len(ind)


def echo(x, edges, ln, wxp, n_bins, n_vertices):
    """x: (N, C) complex. Returns (N, C, dS) real."""
    N, C = n_vertices, x.shape[1]
    dmap, dS = disk_map(n_bins)
    w = 2 * n_bins + 1
    hist = np.zeros((N, C, dS), dtype=np.complex128)
    for e in range(len(edges)):
        j, i = edges[e]
        for c in range(C):
            if is_origin(np.array(x[j, c]))[()]:
                continue
            aligned = ln[e] * np.conj(np.exp(1j * soft_angle(np.array(x[j, c]))[()]))
            p = np.array([aligned.real, aligned.imag]) * n_bins
            pC = np.clip(np.ceil(p), -n_bins, n_bins).astype(np.int64)
            pF = np.clip(np.floor(p), -n_bins, n_bins).astype(np.int64)
            xw = x[j, c] * wxp[e]
            corners = [
                ((pC[0] - p[0]) * (pC[1] - p[1]), dmap[w * (pF[0] + n_bins) + pF[1] + n_bins]),
                ((p[0] - pF[0]) * (p[1] - pF[1]), dmap[w * (pC[0] + n_bins) + pC[1] + n_bins]),
                ((p[0] - pF[0]) * (pC[1] - p[1]), dmap[w * (pC[0] + n_bins) + pF[1] + n_bins]),
                ((pC[0] - p[0]) * (p[1] - pF[1]), dmap[w * (pF[0] + n_bins) + pC[1] + n_bins]),
            ]
            for wt, b in corners:
                hist[i, c, b] += xw * wt
    return soft_abs(hist)
