"""FULL-NETWORK parity against the live torch reference.

Block-level ports (test_reference_parity.py) can't catch composition bugs —
lift-slice plumbing, meta-residual wiring, pooling, head order.  Here each of
the four notebook ``Net``s (classification.ipynb cell 8, segmentation.ipynb
cell 9, correspondence.ipynb cell 8, feature_matching.ipynb cell 9) is
assembled in torch from the reference's own nn modules (imported in place via
the shim — no reference code is copied), every weight is ported into the flax
model, and END-TO-END outputs *and parameter gradients* are asserted to
match.

Gradient check: both sides compute the scalar <out, G> for a fixed random
cotangent G and differentiate w.r.t. every parameter — parity of that linear
functional's gradient covers the whole backward graph.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import random_graph, random_field
from test_reference_parity import (
    make_table,
    planar_pad,
    ref,           # noqa: F401  (fixture)
    ref_precomp_torch,
    set_params,
    tf64,
    _state64,
)

from fieldconv_tpu.models import (
    ClassificationNet,
    CorrespondenceNet,
    MatchingNet,
    SegmentationNet,
)
from fieldconv_tpu.utils.port_weights import (
    flax_to_torch_state_dict,
    torch_state_dict_to_flax,
)

pytestmark = pytest.mark.slow


# --- torch-side notebook Nets (wiring per the cited cells) ------------------

class TorchClassificationNet(torch.nn.Module):
    """classification.ipynb cell 8: lift takes *attr_conv* (the full
    stencil) — the legacy lift-slice quirk (SURVEY.md §6c.1)."""

    def __init__(self, nn_mod, n_classes, nf, band_limit, n_rings, ftype):
        super().__init__()
        self.band_limit = band_limit
        self.lift = nn_mod.LiftBlock(3, nf, n_rings=n_rings, ftype=ftype)
        self.resnet1 = nn_mod.FCResNetBlock(
            nf, nf, band_limit=band_limit, n_rings=n_rings, ftype=ftype)
        self.resnet2 = nn_mod.FCResNetBlock(
            nf, nf, band_limit=band_limit, n_rings=n_rings, ftype=ftype)
        self.conv_out = nn_mod.FieldConv(
            nf, n_classes, band_limit=band_limit, n_rings=n_rings, ftype=ftype)
        self.bias = torch.nn.Parameter(torch.zeros(1, n_classes))
        self._soft_abs = None  # set post-construction (utils.field.softAbs)

    def forward(self, pos, edges, sten):
        attr_conv = (edges, sten)
        x = self.lift(pos, *attr_conv)          # quirk: full stencil
        x = self.resnet1(x, *attr_conv)
        x = self.resnet2(x, *attr_conv)
        x = self.conv_out(x, *attr_conv)
        return torch.mean(self._soft_abs(x), dim=0, keepdim=True) + self.bias


class TorchSegmentationNet(torch.nn.Module):
    """segmentation.ipynb cell 9: lift takes attr_lift (freq 0/+1 slice)."""

    def __init__(self, nn_mod, n_classes, nf, n_des, n_bins, band_limit,
                 n_rings, ftype):
        super().__init__()
        self.band_limit = band_limit
        self.lift = nn_mod.LiftBlock(3, nf, n_rings=n_rings, ftype=ftype)
        for i in range(1, 5):
            setattr(self, f"resnet{i}", nn_mod.FCResNetBlock(
                nf, nf, band_limit=band_limit, n_rings=n_rings, ftype=ftype))
        self.echo = nn_mod.ECHOBlock(
            nf, n_classes, n_des=n_des, n_bins=n_bins,
            band_limit=band_limit, n_rings=n_rings, ftype=ftype)

    def forward(self, pos, edges, sten, ln, wxp):
        B = self.band_limit
        attr_lift = (edges, sten[..., B:(B + 2)])
        attr_conv = (edges, sten)
        x = self.lift(pos, *attr_lift)
        for i in range(1, 5):
            x = getattr(self, f"resnet{i}")(x, *attr_conv)
        return self.echo(x, edges, sten, ln, wxp)


class TorchEightBlockTrunk(torch.nn.Module):
    """The shared 8×FCResNet + 4 meta-residual trunk of correspondence.ipynb
    cell 8 / feature_matching.ipynb cell 9."""

    def __init__(self, nn_mod, nf, out_ch, band_limit, n_rings, ftype,
                 frontload_last):
        super().__init__()
        self.band_limit = band_limit
        self.lift = nn_mod.LiftBlock(3, 16, n_rings=n_rings, ftype=ftype)
        mk = lambda i, o, **kw: nn_mod.FCResNetBlock(
            i, o, band_limit=band_limit, n_rings=n_rings, ftype=ftype, **kw)
        self.resnet1 = mk(16, nf)
        for i in range(2, 8):
            setattr(self, f"resnet{i}", mk(nf, nf))
        self.resnet8 = (mk(nf, out_ch, frontload=True) if frontload_last
                        else mk(nf, out_ch))
        self.res1 = nn_mod.TangentPerceptron(16, nf)
        self.res2 = nn_mod.TangentPerceptron(nf, nf)
        self.res3 = nn_mod.TangentPerceptron(nf, nf)
        self.res4 = nn_mod.TangentPerceptron(nf, out_ch)

    def trunk(self, pos, edges, sten):
        B = self.band_limit
        attr_lift = (edges, sten[..., B:(B + 2)])
        attr_conv = (edges, sten)
        x1 = self.lift(pos, *attr_lift)
        x = self.resnet1(x1, *attr_conv)
        x2 = self.resnet2(x, *attr_conv) + self.res1(x1)
        x = self.resnet3(x2, *attr_conv)
        x3 = self.resnet4(x, *attr_conv) + self.res2(x2)
        x = self.resnet5(x3, *attr_conv)
        x4 = self.resnet6(x, *attr_conv) + self.res3(x3)
        x = self.resnet7(x4, *attr_conv)
        return self.resnet8(x, *attr_conv) + self.res4(x4)


class TorchCorrespondenceNet(TorchEightBlockTrunk):
    """correspondence.ipynb cell 8 (head evaluated in eval mode: the
    dropout is identity, matching deterministic=True on the flax side)."""

    def __init__(self, nn_mod, n_classes, nf, n_des, n_bins, band_limit,
                 n_rings, ftype):
        super().__init__(nn_mod, nf, 16, band_limit, n_rings, ftype,
                         frontload_last=True)
        self.echo = nn_mod.ECHOBlock(
            16, nf, n_des=n_des, n_bins=n_bins,
            band_limit=band_limit, n_rings=n_rings, ftype=ftype)
        self.D = torch.nn.Dropout(p=0.5)
        self.lin1 = torch.nn.Linear(nf, 256)
        self.lin2 = torch.nn.Linear(256, n_classes)

    def forward(self, pos, edges, sten, ln, wxp):
        x = self.trunk(pos, edges, sten)
        x = self.echo(x, edges, sten, ln, wxp)
        x = torch.nn.functional.relu(self.lin1(x))
        x = self.D(x)
        return self.lin2(x)


class TorchMatchingNet(TorchEightBlockTrunk):
    """feature_matching.ipynb cell 9."""

    def __init__(self, nn_mod, nf, band_limit, n_rings, ftype):
        super().__init__(nn_mod, nf, nf, band_limit, n_rings, ftype,
                         frontload_last=False)
        self.out = nn_mod.TangentPerceptron(nf, 16)
        self._soft_abs = None

    def forward(self, pos, edges, sten):
        x = self.trunk(pos, edges, sten)
        return self._soft_abs(self.out(x))


# --- harness ----------------------------------------------------------------

def _torch_forward_backward(model, inputs, G):
    """Forward + grad of <out, G> w.r.t. every parameter, by name."""
    model.eval()
    out = model(*inputs)
    (out * torch.tensor(G, dtype=out.dtype)).sum().backward()
    grads = {k: p.grad.detach().numpy() for k, p in model.named_parameters()}
    return out.detach().numpy(), grads


def _jax_forward_backward(net, params, args, kwargs, G):
    def fwd(p):
        return net.apply(p, *args, **kwargs)

    def scalar(p):
        return jnp.sum(fwd(p) * jnp.asarray(G, jnp.float32))

    out = fwd(params)
    grads = jax.grad(scalar)(params)
    return np.asarray(out), flax_to_torch_state_dict(grads["params"])


def _assert_grads_close(got, want, atol, skip=()):
    assert set(got) == set(want), (
        f"param-name mismatch: only-jax {set(got)-set(want)}, "
        f"only-torch {set(want)-set(got)}")
    for k in sorted(want):
        if any(k.startswith(s) for s in skip):
            continue
        g, w = got[k], want[k].reshape(np.shape(got[k]))
        scale = max(np.abs(w).max(), 1e-3)
        np.testing.assert_allclose(
            g, w, atol=atol * scale, err_msg=f"grad mismatch at '{k}'")


def _prep(ref, rng, B, R, epsilon, n_vertices=26, avg_deg=6):
    g = random_graph(rng, n_vertices=n_vertices, avg_deg=avg_deg, B=B, R=R,
                     epsilon=epsilon)
    edges, sten, ln, wxp = ref_precomp_torch(ref, g)
    table = make_table(g)
    pos = rng.normal(size=(g["n_vertices"], 3)).astype(np.float32)
    pos_j = jnp.asarray(
        np.pad(pos, [(0, table.n_pad - len(pos)), (0, 0)]))
    t_in = (tf64(pos), torch.tensor(edges), torch.tensor(sten))
    return g, table, pos_j, t_in, (ln, wxp)


def _port(net, args, kwargs, tmodel):
    template = net.init(jax.random.key(0), *args, **kwargs)
    return torch_state_dict_to_flax(_state64(tmodel), template)


# --- the four nets -----------------------------------------------------------

def test_full_classification_net_parity(ref, rng):
    B, R, nf, n_classes = 2, 6, 8, 7
    g, table, pos_j, t_in, _ = _prep(ref, rng, B, R, epsilon=0.35)
    N = g["n_vertices"]

    tmodel = TorchClassificationNet(ref.nn, n_classes, nf, B, R, ftype=1)
    tmodel._soft_abs = ref.field.softAbs
    set_params(tmodel, rng, scale=0.4)
    G = rng.normal(size=(1, n_classes)).astype(np.float32)
    want, want_g = _torch_forward_backward(tmodel, t_in, G)

    net = ClassificationNet(n_classes=n_classes, nf=nf, band_limit=B,
                            n_rings=R, ftype=1, legacy_lift_slice=True)
    params = _port(net, (pos_j, table), {}, tmodel)
    got, got_g = _jax_forward_backward(net, params, (pos_j, table), {}, G)

    np.testing.assert_allclose(got, want, atol=2e-4)
    _assert_grads_close(got_g, want_g, atol=2e-3)


def test_full_segmentation_net_parity(ref, rng):
    B, R, nf, n_des, n_bins, n_classes = 2, 6, 6, 6, 3, 5
    g, table, pos_j, t_in, (ln, wxp) = _prep(ref, rng, B, R, epsilon=0.35)
    N = g["n_vertices"]

    tmodel = TorchSegmentationNet(ref.nn, n_classes, nf, n_des, n_bins, B, R,
                                  ftype=1)
    set_params(tmodel, rng, scale=0.35)
    from test_reference_parity import tc
    want, want_g = _torch_forward_backward(
        tmodel, t_in + (tc(ln), tc(wxp)),
        np.ones((N, n_classes), np.float32))

    net = SegmentationNet(n_classes=n_classes, nf=nf, n_des=n_des,
                          n_bins=n_bins, band_limit=B, n_rings=R, ftype=1)
    params = _port(net, (pos_j, table), {}, tmodel)
    Gp = np.zeros((table.n_pad, n_classes), np.float32)
    Gp[:N] = 1.0
    got, got_g = _jax_forward_backward(net, params, (pos_j, table), {}, Gp)

    np.testing.assert_allclose(got[:N], want, atol=5e-4)
    _assert_grads_close(got_g, want_g, atol=4e-3)


def test_full_correspondence_net_parity(ref, rng):
    # the shipped config's shape quirks: in=16, n_des=12 (ECHOBlock bias is
    # 16-wide but only 12 entries are read), frontloaded resnet8, 4 meta
    # residuals, dropout head in eval mode
    B, R, nf, n_des, n_bins, n_classes = 1, 3, 12, 8, 2, 9
    g, table, pos_j, t_in, (ln, wxp) = _prep(ref, rng, B, R, epsilon=0.35)
    N = g["n_vertices"]

    tmodel = TorchCorrespondenceNet(ref.nn, n_classes, nf, n_des, n_bins, B,
                                    R, ftype=1)
    set_params(tmodel, rng, scale=0.3)
    from test_reference_parity import tc
    G = rng.normal(size=(N, n_classes)).astype(np.float32)
    want, want_g = _torch_forward_backward(tmodel, t_in + (tc(ln), tc(wxp)), G)

    net = CorrespondenceNet(n_classes=n_classes, nf=nf, n_des=n_des,
                            n_bins=n_bins, band_limit=B, n_rings=R, ftype=1)
    kwargs = {"deterministic": True}
    params = _port(net, (pos_j, table), kwargs, tmodel)
    Gp = np.zeros((table.n_pad, n_classes), np.float32)
    Gp[:N] = G
    got, got_g = _jax_forward_backward(net, params, (pos_j, table), kwargs, Gp)

    np.testing.assert_allclose(got[:N], want, atol=1e-3)
    _assert_grads_close(got_g, want_g, atol=6e-3)


def test_training_trajectory_parity(ref, rng):
    """50 batch-1 Adam steps, torch vs optax, identical weights / data /
    augmentation stream: per-step losses must track within f32 drift.

    This pins the last untested layer between "ops match" and "training
    matches" (VERDICT r3 #3): torch.optim.Adam vs optax.adam semantics
    (bias correction, eps placement), the CE loss, and the augmentation
    application — the stream itself is generated once in numpy (random
    ±45° rotations + 0.85-1.15 scales, classification.ipynb cell 5) and
    injected into BOTH trainers, the closest obtainable proxy for the
    SHREC11 accuracy-parity north star while archives are unobtainable.
    Both sides run float32 (the reference trains f32 on CUDA)."""
    import optax

    B, R, nf, n_classes, n_steps = 2, 6, 8, 5, 50
    meshes = []
    for m in range(3):
        g, table, pos_j, t_in, _ = _prep(ref, rng, B, R, epsilon=0.35)
        label = int(rng.integers(0, n_classes))
        meshes.append((g, table, t_in, label))

    tmodel = TorchClassificationNet(ref.nn, n_classes, nf, B, R, ftype=1)
    tmodel._soft_abs = ref.field.softAbs
    set_params(tmodel, rng, scale=0.4)
    tmodel = tmodel.float()

    net = ClassificationNet(n_classes=n_classes, nf=nf, band_limit=B,
                            n_rings=R, ftype=1, legacy_lift_slice=True)
    g0, table0, _, _ = meshes[0]
    pos0 = jnp.zeros((table0.n_pad, 3), jnp.float32)
    params = _port(net, (pos0, table0), {}, tmodel)

    # one shared augmentation stream (numpy), applied identically
    def rot_mat(a):
        cx, sx, cy, sy, cz, sz = (np.cos(a[0]), np.sin(a[0]), np.cos(a[1]),
                                  np.sin(a[1]), np.cos(a[2]), np.sin(a[2]))
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return rz @ ry @ rx

    aug_rng = np.random.default_rng(1234)
    base_pos = [np.asarray(m[2][0], np.float64) for m in meshes]
    augs = []
    for step in range(n_steps):
        a = aug_rng.uniform(-np.pi / 4, np.pi / 4, 3)
        s = aug_rng.uniform(0.85, 1.15)
        i = step % len(meshes)
        augs.append((i, (base_pos[i] @ rot_mat(a).T * s).astype(np.float32)))

    # --- torch trajectory (float32, torch.optim.Adam lr .01, CE) ----------
    opt_t = torch.optim.Adam(tmodel.parameters(), lr=0.01)
    crit = torch.nn.CrossEntropyLoss()
    t_losses = []
    for step in range(n_steps):
        i, pos_a = augs[step]
        _, _, (_, edges_t, sten_t), label = meshes[i]
        out = tmodel(torch.tensor(pos_a), edges_t,
                     sten_t.to(torch.complex64))
        loss = crit(out, torch.tensor([label]))
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        t_losses.append(float(loss))

    # --- optax trajectory (the trainer's optimizer construction) ----------
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, pos, table, label):
        def loss_fn(p):
            logits = net.apply(p, pos, table)[0]
            return -jax.nn.log_softmax(logits)[label]

        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    j_losses = []
    for step in range(n_steps):
        i, pos_a = augs[step]
        _, table, _, label = meshes[i]
        pos_pad = np.zeros((table.n_pad, 3), np.float32)
        pos_pad[: len(pos_a)] = pos_a
        params, opt_state, l = step_fn(params, opt_state,
                                       jnp.asarray(pos_pad), table, label)
        j_losses.append(float(l))

    t_losses = np.asarray(t_losses)
    j_losses = np.asarray(j_losses)
    diff = np.abs(j_losses - t_losses)
    # Measured drift shape (seed 0): identical to ~6 decimals over the
    # first 10 steps (<=1e-6), ~1e-3 by step 30, a few 1e-2 by step 48 as
    # both sides converge to loss ~0.008 — compounding f32 rounding in a
    # contracting trajectory, not semantic divergence.  The envelope
    # asserts exactly that shape.
    t = np.arange(n_steps)
    tol = 1e-5 + 0.05 * (t / n_steps) ** 2
    assert np.all(diff <= tol), (
        "trajectories diverged:\n"
        f"torch {t_losses}\njax   {j_losses}\n"
        f"maxdiff {diff.max()} at step {diff.argmax()}")
    # both trainers converged to the same place
    assert t_losses[-1] < 0.05 and j_losses[-1] < 0.05
    assert np.all(diff[:10] <= 5e-5)


def test_full_matching_net_parity(ref, rng):
    B, R, nf = 1, 6, 12
    g, table, pos_j, t_in, _ = _prep(ref, rng, B, R, epsilon=0.35)
    N = g["n_vertices"]

    tmodel = TorchMatchingNet(ref.nn, nf, B, R, ftype=1)
    tmodel._soft_abs = ref.field.softAbs
    set_params(tmodel, rng, scale=0.3)
    G = rng.normal(size=(N, 16)).astype(np.float32)
    want, want_g = _torch_forward_backward(tmodel, t_in, G)

    net = MatchingNet(nf=nf, band_limit=B, n_rings=R, ftype=1)
    params = _port(net, (pos_j, table), {}, tmodel)
    Gp = np.zeros((table.n_pad, 16), np.float32)
    Gp[:N] = G
    got, got_g = _jax_forward_backward(net, params, (pos_j, table), {}, Gp)

    np.testing.assert_allclose(got[:N], want, atol=5e-4)
    _assert_grads_close(got_g, want_g, atol=4e-3)


# --- training-trajectory parity for the other three tasks (VERDICT r4 #3) ---
#
# Same protocol as test_training_trajectory_parity: 50 batch-1 Adam steps,
# identical ported weights, one shared numpy augmentation stream injected
# into both trainers, per-step losses tracked within a measured f32-drift
# envelope.  Each test additionally pins its task's own training-dynamics
# ingredients: LabelSmoothing 0.2 (segmentation.ipynb cell 11), dropout
# realisations + the lr 0.01->0.001@40 decay (correspondence.ipynb cell
# 15), and TwinLoss with one injected uniform stream per step
# (feature_matching.ipynb cell 13).

def _rot_mat(a):
    cx, sx, cy, sy, cz, sz = (np.cos(a[0]), np.sin(a[0]), np.cos(a[1]),
                              np.sin(a[1]), np.cos(a[2]), np.sin(a[2]))
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _aug_stream(meshes, n_steps, seed=1234, scale=True):
    aug_rng = np.random.default_rng(seed)
    base_pos = [np.asarray(m[2][0], np.float64) for m in meshes]
    augs = []
    for step in range(n_steps):
        a = aug_rng.uniform(-np.pi / 4, np.pi / 4, 3)
        s = aug_rng.uniform(0.85, 1.15) if scale else 1.0
        i = step % len(meshes)
        augs.append((i, (base_pos[i] @ _rot_mat(a).T * s).astype(np.float32)))
    return augs


def _assert_trajectory(t_losses, j_losses, n_steps, early=2e-4,
                       early10=5e-2, rel=0.3, tail_frac=0.1):
    """Plateau-safe RELATIVE drift envelope.  Unlike the classification
    trajectory (which contracts to ~0 loss and stays glued), the three
    tasks below settle on a plateau — label smoothing bounds
    segmentation's loss at ~0.8 from below — where compounding f32
    rounding is chaotic (measured: percent-level by step ~10, random-sign
    ~5-10% after).  The pin is three-part: (1) the first steps are TIGHT
    relative to the loss scale (loss/optimizer/augmentation semantics),
    (2) drift never exceeds `rel` of the trajectory (semantic divergence
    — a wrong loss term or schedule — is multiples, not percents),
    (3) both trainers settle on the SAME plateau (tail means within
    tail_frac)."""
    t_losses = np.asarray(t_losses)
    j_losses = np.asarray(j_losses)
    scale = np.maximum(np.abs(t_losses), 1e-3)
    rdiff = np.abs(j_losses - t_losses) / scale
    msg = (f"torch {t_losses}\njax   {j_losses}\n"
           f"max rel diff {rdiff.max()} at step {rdiff.argmax()}")
    assert np.all(rdiff[:5] <= early), f"early steps diverged:\n{msg}"
    assert np.all(rdiff[:10] <= early10), f"steps 5-10 diverged:\n{msg}"
    assert np.all(rdiff <= rel), f"trajectories diverged:\n{msg}"
    # the descent CURVES agree once per-step noise is averaged out
    w = 9
    k = np.ones(w) / w
    st = np.convolve(t_losses, k, mode="valid")
    sj = np.convolve(j_losses, k, mode="valid")
    sdiff = np.abs(sj - st) / np.maximum(np.abs(st), 1e-3)
    assert np.all(sdiff <= 0.2), f"smoothed curves diverged:\n{msg}\n{sdiff}"
    mt = t_losses[-15:].mean()
    mj = j_losses[-15:].mean()
    assert abs(mt - mj) <= tail_frac * max(mt, 1e-3), (mt, mj, msg)


def test_segmentation_trajectory_parity(ref, rng):
    """Segmentation training dynamics: LabelSmoothingLoss(0.2) + Adam 0.01
    (segmentation.ipynb cells 11, 16), torch vs the flax trainer loss."""
    import optax

    from fieldconv_tpu.nn.losses import label_smoothing_loss
    from test_reference_parity import tc

    B, R, nf, n_des, n_bins, n_classes, n_steps = 2, 6, 6, 4, 2, 5, 50
    meshes = []
    for m in range(3):
        g, table, pos_j, t_in, (ln, wxp) = _prep(ref, rng, B, R,
                                                 epsilon=0.35)
        # coordinate-derived labels: fittable, so the trajectory CONTRACTS
        # (a plateaued loss amplifies f32 drift chaotically; the envelope
        # below, like the classification test's, assumes contraction)
        pos_np = np.asarray(t_in[0], np.float64)
        labels = ((pos_np[:, 0] > 0) * 2 + (pos_np[:, 1] > 0)).astype(
            np.int64)
        meshes.append((g, table, t_in, (ln, wxp), labels))

    tmodel = TorchSegmentationNet(ref.nn, n_classes, nf, n_des, n_bins, B,
                                  R, ftype=1)
    set_params(tmodel, rng, scale=0.35)
    tmodel = tmodel.float()

    net = SegmentationNet(n_classes=n_classes, nf=nf, n_des=n_des,
                          n_bins=n_bins, band_limit=B, n_rings=R, ftype=1)
    g0, table0 = meshes[0][:2]
    pos0 = jnp.zeros((table0.n_pad, 3), jnp.float32)
    params = _port(net, (pos0, table0), {}, tmodel)

    augs = _aug_stream(
        [(m[0], m[1], (np.asarray(m[2][0], np.float64),)) for m in meshes],
        n_steps)

    crit = ref.nn.LabelSmoothingLoss(n_classes, smoothing=0.2)
    opt_t = torch.optim.Adam(tmodel.parameters(), lr=0.01)
    t_losses = []
    for step in range(n_steps):
        i, pos_a = augs[step]
        g, _, (_, edges_t, sten_t), (ln, wxp), labels = meshes[i]
        out = tmodel(torch.tensor(pos_a), edges_t,
                     sten_t.to(torch.complex64), tc(ln).to(torch.complex64),
                     tc(wxp).to(torch.complex64))
        loss = crit(out, torch.tensor(labels))
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        t_losses.append(float(loss))

    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, pos, table, labels):
        def loss_fn(p):
            logits = net.apply(p, pos, table)
            return label_smoothing_loss(logits, labels, n_classes, 0.2)

        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    j_losses = []
    for step in range(n_steps):
        i, pos_a = augs[step]
        g, table, _, _, labels = meshes[i]
        pos_pad = np.zeros((table.n_pad, 3), np.float32)
        pos_pad[: len(pos_a)] = pos_a
        lab_pad = np.full(table.n_pad, -1, np.int32)
        lab_pad[: len(labels)] = labels
        params, opt_state, l = step_fn(params, opt_state,
                                       jnp.asarray(pos_pad), table,
                                       jnp.asarray(lab_pad))
        j_losses.append(float(l))

    _assert_trajectory(t_losses, j_losses, n_steps)


def test_correspondence_trajectory_parity(ref, rng):
    """Correspondence training dynamics: ACTIVE dropout with the same
    Bernoulli realisations injected into both nets, and the reference's
    lr 0.01->0.001 decay (correspondence.ipynb cell 15; here at step 40
    of 50), torch vs optax with a schedule."""
    import optax

    from test_reference_parity import tc

    B, R, nf, n_des, n_bins, n_classes, n_steps = 1, 3, 8, 6, 2, 7, 50
    decay_at = 40
    meshes = []
    for m in range(3):
        g, table, pos_j, t_in, (ln, wxp) = _prep(ref, rng, B, R,
                                                 epsilon=0.35)
        pos_np = np.asarray(t_in[0], np.float64)
        labels = ((pos_np[:, 0] > 0) * 2 + (pos_np[:, 1] > 0)).astype(
            np.int64)
        meshes.append((g, table, t_in, (ln, wxp), labels))

    tmodel = TorchCorrespondenceNet(ref.nn, n_classes, nf, n_des, n_bins,
                                    B, R, ftype=1)
    set_params(tmodel, rng, scale=0.3)
    tmodel = tmodel.float()

    # identical dropout realisations on both sides: replace torch's
    # Dropout with an explicit-mask multiply, and pass the same mask to
    # the flax net's dropout_mask hook
    class InjectDropout(torch.nn.Module):
        mask = None

        def forward(self, x):
            return x * InjectDropout.mask / 0.5

    tmodel.D = InjectDropout()
    mask_rng = np.random.default_rng(77)
    N0 = meshes[0][0]["n_vertices"]
    masks = [(mask_rng.random((N0, 256)) < 0.5).astype(np.float32)
             for _ in range(n_steps)]

    net = CorrespondenceNet(n_classes=n_classes, nf=nf, n_des=n_des,
                            n_bins=n_bins, band_limit=B, n_rings=R,
                            ftype=1, dropout=0.5)
    g0, table0 = meshes[0][:2]
    pos0 = jnp.zeros((table0.n_pad, 3), jnp.float32)
    params = _port(net, (pos0, table0), {"deterministic": True}, tmodel)

    augs = _aug_stream(
        [(m[0], m[1], (np.asarray(m[2][0], np.float64),)) for m in meshes],
        n_steps, scale=False)

    crit = torch.nn.CrossEntropyLoss()
    opt_t = torch.optim.Adam(tmodel.parameters(), lr=0.01)
    tmodel.train()
    t_losses = []
    for step in range(n_steps):
        if step == decay_at:
            for grp in opt_t.param_groups:
                grp["lr"] = 0.001
        i, pos_a = augs[step]
        g, _, (_, edges_t, sten_t), (ln, wxp), labels = meshes[i]
        InjectDropout.mask = torch.tensor(masks[step][: g["n_vertices"]])
        out = tmodel(torch.tensor(pos_a), edges_t,
                     sten_t.to(torch.complex64), tc(ln).to(torch.complex64),
                     tc(wxp).to(torch.complex64))
        loss = crit(out, torch.tensor(labels))
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        t_losses.append(float(loss))

    sched = optax.piecewise_constant_schedule(
        0.01, {decay_at: 0.1})   # 0.01 -> 0.001 at step `decay_at`
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, pos, table, labels, mask):
        def loss_fn(p):
            logits = net.apply(p, pos, table, deterministic=False,
                               dropout_mask=mask)
            valid = labels >= 0
            safe = jnp.where(valid, labels, 0)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(logp, safe[:, None], 1)[:, 0]
            per = jnp.where(valid, per, 0.0)
            return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1)

        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    j_losses = []
    for step in range(n_steps):
        i, pos_a = augs[step]
        g, table, _, _, labels = meshes[i]
        pos_pad = np.zeros((table.n_pad, 3), np.float32)
        pos_pad[: len(pos_a)] = pos_a
        lab_pad = np.full(table.n_pad, -1, np.int32)
        lab_pad[: len(labels)] = labels
        mask_pad = np.ones((table.n_pad, 256), np.float32)
        mask_pad[: g["n_vertices"]] = masks[step][: g["n_vertices"]]
        params, opt_state, l = step_fn(params, opt_state,
                                       jnp.asarray(pos_pad), table,
                                       jnp.asarray(lab_pad),
                                       jnp.asarray(mask_pad))
        j_losses.append(float(l))

    # active dropout makes the contracting trajectory oscillate ±40%
    # step-to-step (same masks, but tiny param drift shifts per-mesh
    # losses); the raw per-step bound is therefore the intrinsic noise
    # amplitude — the smoothed-curve / tail-mean checks carry the pin.
    # tail_frac: per-step σ≈0.6 → SE of a 15-sample tail-mean difference
    # ≈ 0.22 ≈ 8% of the ~2.5 plateau; 15% is ~2 SE
    _assert_trajectory(t_losses, j_losses, n_steps, rel=1.0,
                       tail_frac=0.15)
    # direct evidence the 0.01->0.001 decay fired on BOTH sides: the
    # post-decay phase is visibly calmer than the pre-decay plateau
    for ls in (np.asarray(t_losses), np.asarray(j_losses)):
        assert ls[decay_at:].std() < ls[20:decay_at].std(), (
            "lr decay did not calm the trajectory", ls)


def test_matching_trajectory_parity(ref, rng, monkeypatch):
    """Feature-matching training dynamics: two forwards through the shared
    twin net + TwinLoss mu=5 with ONE injected uniform stream per step
    (feature_matching.ipynb cell 13), Adam lr 0.001, torch vs optax."""
    import optax

    from fieldconv_tpu.nn.losses import twin_loss

    B, R, nf, n_steps = 1, 3, 8, 50
    pairs_rng = np.random.default_rng(5)
    # two (source, target) mesh pairs, alternated per step
    cases = []
    for m in range(2):
        gS, tableS, _, tS_in, _ = _prep(ref, rng, B, R, epsilon=0.35)
        gT, tableT, _, tT_in, _ = _prep(ref, rng, B, R, epsilon=0.35)
        NS, NT = gS["n_vertices"], gT["n_vertices"]
        p = np.stack([pairs_rng.integers(0, NT, 10),
                      pairs_rng.integers(0, NS, 10)], 1)
        n = np.stack([pairs_rng.integers(0, NT, 16),
                      pairs_rng.integers(0, NS, 16)], 1)
        cases.append((gS, tableS, tS_in, gT, tableT, tT_in, p, n))

    tmodel = TorchMatchingNet(ref.nn, nf, B, R, ftype=1)
    tmodel._soft_abs = ref.field.softAbs
    set_params(tmodel, rng, scale=0.3)
    tmodel = tmodel.float()

    net = MatchingNet(nf=nf, band_limit=B, n_rings=R, ftype=1)
    g0, table0 = cases[0][:2]
    pos0 = jnp.zeros((table0.n_pad, 3), jnp.float32)
    params = _port(net, (pos0, table0), {}, tmodel)

    # shared augmentation stream: rotate BOTH meshes of the pair per step
    aug_rng = np.random.default_rng(4321)
    augs = []
    for step in range(n_steps):
        i = step % len(cases)
        rS = _rot_mat(aug_rng.uniform(-np.pi / 4, np.pi / 4, 3))
        rT = _rot_mat(aug_rng.uniform(-np.pi / 4, np.pi / 4, 3))
        c = cases[i]
        posS = (np.asarray(c[2][0], np.float64) @ rS.T).astype(np.float32)
        posT = (np.asarray(c[5][0], np.float64) @ rT.T).astype(np.float32)
        augs.append((i, posS, posT))

    # ONE uniform stream for the TwinLoss yN weights, fed to both sides
    keys = [jax.random.key(1000 + s) for s in range(n_steps)]
    yn_streams = [np.asarray(jax.random.uniform(keys[s], (16,)), np.float64)
                  for s in range(n_steps)]

    opt_t = torch.optim.Adam(tmodel.parameters(), lr=0.001)
    t_losses = []
    for step in range(n_steps):
        i, posS, posT = augs[step]
        c = cases[i]
        monkeypatch.setattr(
            torch, "rand", lambda *a, _s=step, **k: torch.tensor(
                yn_streams[_s], dtype=torch.float32))
        crit = ref.nn.TwinLoss(mu=5)
        FS = tmodel(torch.tensor(posS), c[2][1],
                    c[2][2].to(torch.complex64))
        FT = tmodel(torch.tensor(posT), c[5][1],
                    c[5][2].to(torch.complex64))
        loss = crit(FS, FT, torch.tensor(c[6]), torch.tensor(c[7]))
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        t_losses.append(float(loss))
    monkeypatch.undo()

    opt = optax.adam(0.001)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, key, posS, tableS, posT, tableT, p, n):
        def loss_fn(prm):
            fs = net.apply(prm, posS, tableS)
            ft = net.apply(prm, posT, tableT)
            return twin_loss(key, fs, ft, p, n, mu=5.0)

        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    j_losses = []
    for step in range(n_steps):
        i, posS, posT = augs[step]
        c = cases[i]
        posS_pad = np.zeros((c[1].n_pad, 3), np.float32)
        posS_pad[: len(posS)] = posS
        posT_pad = np.zeros((c[4].n_pad, 3), np.float32)
        posT_pad[: len(posT)] = posT
        params, opt_state, l = step_fn(
            params, opt_state, keys[step], jnp.asarray(posS_pad), c[1],
            jnp.asarray(posT_pad), c[4], jnp.asarray(c[6]),
            jnp.asarray(c[7]))
        j_losses.append(float(l))

    _assert_trajectory(t_losses, j_losses, n_steps)
