"""Benchmark: field-convolution SpMM throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

Measures forward+backward of a full FieldConv layer (the reference hot loop,
nn/field_conv.py:104-137) on a synthetic band-limited support graph at
production scale: N=8192 targets x 128 neighbor slots = 1.05M edges, C=32,
B=2, R=6 (the SHREC11 filter configuration).  Default implementation is the
banded Pallas kernel (ops/pallas/band_conv.py); set BENCH_IMPL=xla for the
gather-based XLA path.

vs_baseline compares against bench_baseline.json — the gather-based XLA
path's round-1 number (the reference itself publishes nothing, BASELINE.md).

Budget protocol: the measurement runs in a CHILD process that appends
progressively refined JSON lines to a progress file (a coarse host-loop
number as soon as the first compile lands, then the honest device-loop scan
number).  The parent waits at most BENCH_BUDGET_S seconds (default 900) and
prints the LAST complete line — so a stalled tunnel or a hung compile still
yields a parsed result (round 2 recorded nothing because a single in-process
protocol hit the driver timeout before its first print).

NOTE: all tables are built host-side in numpy and shipped once (device→host
readback through the axon tunnel is ~1 MB/s).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def orchestrate():
    """Parent: run the measurement in a child with a hard wall-clock budget;
    always print exactly one JSON line."""
    budget = float(os.environ.get("BENCH_BUDGET_S", "900"))
    fd, progress = tempfile.mkstemp(prefix="bench_progress_", suffix=".jsonl")
    os.close(fd)
    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    env["BENCH_PROGRESS_FILE"] = progress
    child = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                             env=env, stdout=subprocess.DEVNULL)
    deadline = time.time() + budget
    try:
        while child.poll() is None and time.time() < deadline:
            time.sleep(1.0)
        if child.poll() is None:
            child.kill()  # exact PID of the child we spawned
            child.wait()
    finally:
        line = None
        try:
            with open(progress) as f:
                for raw in f:
                    raw = raw.strip()
                    if raw:
                        try:
                            json.loads(raw)
                            line = raw
                        except ValueError:
                            pass
        except OSError:
            pass
        try:
            os.unlink(progress)
        except OSError:
            pass
    if line is None:
        line = json.dumps({
            "metric": "field_conv_fwd_bwd_edges_per_s_banded",
            "value": 0, "unit": "edges/s", "vs_baseline": 0.0,
            "error": "no measurement completed within budget",
        })
    print(line, flush=True)


def report(payload):
    """Child: append a refined result line to the progress file (parent
    prints the last one), or print directly when run stand-alone."""
    line = json.dumps(payload)
    path = os.environ.get("BENCH_PROGRESS_FILE")
    if path:
        with open(path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())
    else:
        print(line, flush=True)


def build_synthetic_tables(N=8192, D=128, B=2, R=6, seed=0, bandwidth=128):
    """Host-side numpy EdgeTable with band-limited mesh-like locality
    (|src - tgt| <= bandwidth, as RCM ordering guarantees on real meshes)."""
    from fieldconv_tpu.precomp.edge_table import EdgeTable

    rng = np.random.default_rng(seed)
    K = 2 * B + 1
    base = np.arange(N)[:, None]
    # unique neighbors per target (parallel edges are unrepresentable in the
    # factored band layout — see precomp/banded.py)
    if 2 * bandwidth < D:
        raise ValueError("need 2*bandwidth >= D for unique neighbors")
    cand = np.arange(-bandwidth, bandwidth)
    # vectorised unique draws per row: first D of a random permutation
    keys = rng.random((N, len(cand)))
    offs = cand[np.argsort(keys, axis=1)[:, :D]]
    src = np.clip(base + offs, 0, N - 1).astype(np.int32)
    # clipping at the ends can re-introduce duplicates; remap those slots to
    # unused in-range values
    for i in list(range(bandwidth + 1)) + list(range(N - bandwidth - 1, N)):
        row = src[i]
        used = set(row.tolist())
        dup = np.zeros(D, bool)
        seen = set()
        for d in range(D):
            if row[d] in seen:
                dup[d] = True
            seen.add(row[d])
        if dup.any():
            free = [v for v in range(max(0, i - bandwidth),
                                     min(N, i + bandwidth + 1))
                    if v not in used]
            row[dup] = free[: dup.sum()]
            src[i] = row

    r = rng.uniform(0.02, 1.0, (N, D))
    theta = rng.uniform(-np.pi, np.pi, (N, D))
    samples = np.sqrt(np.arange(R) / (R - 1))
    rsten = np.zeros((N, D, R), np.float32)
    ci = np.clip(np.searchsorted(samples, r), 1, R - 1)
    wc = (r - samples[ci - 1]) / (samples[ci] - samples[ci - 1])
    ii, dd = np.meshgrid(np.arange(N), np.arange(D), indexing="ij")
    rsten[ii, dd, ci] = wc
    rsten[ii, dd, ci - 1] = 1.0 - wc

    ks = np.arange(-B, B + 1)
    fs = np.exp(1j * ks[None, None, :] * theta[..., None])
    w = rng.uniform(0.5, 1.5, (N, D)) / D
    xp = np.exp(1j * rng.uniform(-np.pi, np.pi, (N, D)))
    fwxp_c = fs * (w * xp)[..., None]
    fwxp = np.stack([fwxp_c.real, fwxp_c.imag], -1).astype(np.float32)
    ln_c = r * np.exp(1j * theta)
    ln = np.stack([ln_c.real, ln_c.imag], -1).astype(np.float32)
    wxp_c = w * xp
    wxp = np.stack([wxp_c.real, wxp_c.imag], -1).astype(np.float32)

    return EdgeTable(
        src=src, mask=np.ones((N, D), np.float32), rsten=rsten, fwxp=fwxp,
        ln=ln, wxp=wxp, vmask=np.ones((N,), np.float32),
        n_valid=N, band_limit=B, n_rings=R,
    )


def compact_stage(banded_payload):
    """North-star-scale stage (VERDICT r4 #4): measure the compact-layout
    conv fwd+bwd at the REAL 163k mesh structure (icosphere subdiv 7 +
    radius graph + kd order — the stencil VALUES are synthetic, exactly
    like the banded stage's; throughput depends on structure, not values)
    and emit a refined line carrying BOTH numbers.  The headline
    metric/value/vs_baseline stay the banded dense-shape kernel for
    cross-round continuity; the compact keys record scale progress.
    Documented in BASELINE.md."""
    import time

    import jax
    import jax.numpy as jnp

    from fieldconv_tpu.data.synthetic import icosphere
    from fieldconv_tpu.geometry.sampling import radius_graph
    from fieldconv_tpu.ops.pallas.band_conv import field_conv_compact
    from fieldconv_tpu.precomp.banded import (build_compact_panel_table,
                                              kd_order, reorder_precompute)
    from fieldconv_tpu.precomp.pipeline import normalize_area
    from fieldconv_tpu.precomp.stencil import build_edge_table
    from fieldconv_tpu.utils.complexops import modrelu, soft_abs

    subdiv = int(os.environ.get("BENCH_COMPACT_SUBDIV", "7"))
    ctb = int(os.environ.get("BENCH_COMPACT_TB", "32"))
    v, f = icosphere(subdiv=subdiv)
    v = normalize_area(v, f)
    N = len(v)
    eps = float(np.sqrt(64 / (np.pi * N)))
    edges = radius_graph(v, eps)
    r = np.random.default_rng(0)
    E = len(edges)
    lm = r.uniform(0.0, 0.9 * eps, E)
    la = r.uniform(-np.pi, np.pi, E)
    xpc = np.exp(1j * r.uniform(-np.pi, np.pi, E))
    w = r.uniform(0.1, 1.0, N)
    B, R = 1, 3
    perm = kd_order(v, tb=128)
    edges_r, w_r = reorder_precompute(perm, edges, w)
    table = build_edge_table(edges_r, lm, la, w_r, xpc, N, B, R, eps,
                             n_multiple=128)
    comp = jax.device_put(build_compact_panel_table(table, tb=ctb))
    n_edges = float(np.asarray(table.mask, np.float64).sum())

    C = O = 16
    Np = table.n_pad
    x = jnp.asarray(r.normal(size=(Np, C, 2)) * 0.5, jnp.float32)
    zonal = jnp.asarray(r.normal(size=(O, C, R)) * 0.2, jnp.float32)
    sph = jnp.asarray(r.normal(size=(O, C, R, B, 2)) * 0.2, jnp.float32)
    phase = jnp.asarray(r.normal(size=(O, C, B + 1)) * 0.2, jnp.float32)
    bias = jnp.zeros((O,), jnp.float32)

    def fwd(x, comp):
        y = field_conv_compact(x, comp, zonal, sph, phase, 1)
        return jnp.sum(soft_abs(modrelu(y, bias)))

    iters, reps = 10, 3

    @jax.jit
    def run_batch(x, comp):
        def body(x, _):
            dx = jax.grad(fwd)(x, comp)
            return dx * jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-8) * 0.5, ()
        xf, _ = jax.lax.scan(body, x, None, length=iters)
        return xf, jnp.sum(xf)

    xf, chk = run_batch(x, comp)
    float(chk)                      # tunnel barrier
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        xf, chk = run_batch(xf, comp)
        float(chk)
        times.append((time.perf_counter() - t0) / iters)
    dt = sorted(times)[reps // 2]
    report({
        **banded_payload,
        "compact_conv_edges_per_s": round(n_edges / dt),
        "compact_n_vertices": N,
        "compact_ms_per_conv": round(dt * 1e3, 1),
    })


def main():
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    import jax
    import jax.numpy as jnp

    from fieldconv_tpu.ops.field_conv import field_conv
    from fieldconv_tpu.ops.pallas.band_conv import field_conv_banded
    from fieldconv_tpu.precomp.banded import build_banded_table
    from fieldconv_tpu.utils.complexops import modrelu, soft_abs

    N = int(os.environ.get("BENCH_N", "8192"))
    D = int(os.environ.get("BENCH_D", "128"))
    B, R, C, O = 2, 6, 32, 32
    impl = os.environ.get("BENCH_IMPL", "banded")
    table_np = build_synthetic_tables(N=N, D=D, B=B, R=R)
    edges = N * D

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, C, 2)) * 0.5, jnp.float32)
    zonal = jnp.asarray(rng.normal(size=(O, C, R)) * 0.2, jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)) * 0.2, jnp.float32)
    phase = jnp.asarray(rng.normal(size=(O, C, B + 1)) * 0.2, jnp.float32)
    bias = jnp.zeros((O,), jnp.float32)

    if impl == "segmodel":
        # full SegmentationNet train step (ECHO-dominated; 9 convs + ECHO):
        # reports milliseconds per step at SHAPESEG-like scale
        import optax

        from fieldconv_tpu.models import SegmentationNet
        from fieldconv_tpu.nn.losses import label_smoothing_loss

        Nseg = int(os.environ.get("BENCH_N", "2048"))
        table_np = build_synthetic_tables(N=Nseg, D=D, B=B, R=R)
        banded = jax.device_put(build_banded_table(table_np, tb=128))
        table = jax.device_put(table_np)
        pos = jnp.asarray(rng.normal(size=(Nseg, 3)) * 0.1, jnp.float32)
        labels = jnp.asarray(rng.integers(0, 8, Nseg), jnp.int32)
        net = SegmentationNet(n_classes=8, nf=48, band_limit=B, n_rings=R)
        params = jax.jit(net.init)(jax.random.key(0), pos, table)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, pos, table, banded):
            def loss_fn(p):
                logits = net.apply(p, pos, table, banded)
                return label_smoothing_loss(logits, labels, 8, 0.2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state2, loss

        params, opt_state, loss = step(params, opt_state, pos, table, banded)
        float(loss)
        iters, reps = 10, 5
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                params, opt_state, loss = step(params, opt_state, pos,
                                               table, banded)
            float(loss)
            times.append((time.perf_counter() - t0) / iters)
        dt = sorted(times)[reps // 2]
        report({
            "metric": "segmentation_step_ms",
            "value": round(dt * 1e3, 2),
            "unit": "ms",
            "vs_baseline": 1.0,
        })
        return

    if impl == "model":
        # full ClassificationNet train step through the banded path:
        # 5 field convolutions (2 per ResNet block + conv_out) per step
        import optax

        from fieldconv_tpu.models import ClassificationNet
        from fieldconv_tpu.nn.losses import cross_entropy

        banded = jax.device_put(build_banded_table(table_np, tb=128))
        table = jax.device_put(table_np)
        pos = jnp.asarray(rng.normal(size=(N, 3)) * 0.1, jnp.float32)
        label = jnp.zeros((1,), jnp.int32)
        net = ClassificationNet(n_classes=30, nf=C, band_limit=B, n_rings=R)
        params = jax.jit(net.init)(jax.random.key(0), pos, table)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        n_convs = 5

        # tables ride as jit ARGUMENTS: closed-over device arrays are inlined
        # as stablehlo constants, bloating the module past the remote-compile
        # request limit (and the compiler's constant budget) at production N
        @jax.jit
        def step(params, opt_state, pos, table, banded):
            def loss_fn(p):
                logits = net.apply(p, pos, table, banded)
                return cross_entropy(logits, label)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state2, loss

        params, opt_state, loss = step(params, opt_state, pos, table, banded)
        float(loss)   # scalar readback: the reliable tunnel barrier
        iters, reps = 10, 5
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                params, opt_state, loss = step(params, opt_state, pos,
                                               table, banded)
            float(loss)
            times.append((time.perf_counter() - t0) / iters)
        dt = sorted(times)[reps // 2]
        edges_per_s = edges * n_convs / dt
        report({
            "metric": "classification_step_conv_edges_per_s",
            "value": round(edges_per_s),
            "unit": "edges/s",
            "vs_baseline": 1.0,
        })
        return

    if impl == "banded":
        precision = os.environ.get("BENCH_PRECISION", "f32")
        fuse = os.environ.get("BENCH_FUSE", "1") != "0"
        gres_env = os.environ.get("BENCH_G_RESIDENT")  # "1"/"0"/unset=auto
        gres = None if gres_env is None else gres_env != "0"
        pipe = os.environ.get("BENCH_PIPELINE", "auto")  # auto/grid/mega
        tb = int(os.environ.get("BENCH_TB", "128"))
        banded = build_banded_table(table_np, tb=tb)
        banded = jax.device_put(banded)

        # NOTE: the stencil table rides as a jit ARGUMENT (closures inline
        # device arrays as stablehlo constants — module-size blowup)
        def fwd(x, zonal, sph, phase, bias, banded):
            y = field_conv_banded(x, banded, zonal, sph, phase, 1,
                                  precision=precision, fuse_filters=fuse,
                                  g_resident=gres, pipeline=pipe)
            return jnp.sum(soft_abs(modrelu(y, bias)))

        tbl_arg = banded
    else:
        table = jax.device_put(table_np)
        d_chunk = int(os.environ.get("BENCH_D_CHUNK", "32"))

        def fwd(x, zonal, sph, phase, bias, table):
            y = field_conv(x, table, zonal, sph, phase, 1, d_chunk=d_chunk)
            return jnp.sum(soft_abs(modrelu(y, bias)))

        tbl_arg = table

    # Chain iterations through dG (renormalised) so every call has fresh
    # inputs — identical repeated calls through the axon tunnel get deduped
    # and report physically impossible throughput (docs/KERNEL_NOTES.md)
    def one_step(x, zonal, sph, phase, bias, tbl):
        out = jax.grad(fwd, argnums=(0, 1, 2, 3, 4))(
            x, zonal, sph, phase, bias, tbl)
        dx = out[0]
        xn = dx * jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-8) * 0.5
        return xn, jnp.sum(dx)

    # BENCH_LOOP=device (default): run the iteration loop ON DEVICE via
    # lax.scan — one dispatch per timing batch, so the ~1 ms/launch axon
    # tunnel overhead (docs/KERNEL_NOTES.md round-2 notes) is excluded and
    # the measurement is the chip's own step rate.  BENCH_LOOP=host keeps
    # the per-call dispatch in the measurement.
    loop_mode = os.environ.get("BENCH_LOOP", "device")
    iters, reps = 20, 5

    def payload_for(dt):
        vs = 1.0
        base_path = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
        if os.path.exists(base_path):
            with open(base_path) as f:
                base = json.load(f)
            if base.get("value"):
                vs = edges / dt / base["value"]
        return {
            "metric": f"field_conv_fwd_bwd_edges_per_s_{impl}",
            "value": round(edges / dt),
            "unit": "edges/s",
            "vs_baseline": round(vs, 4),
        }

    def emit(dt):
        report(payload_for(dt))

    # --- coarse stage: host-dispatched step, first number on record as soon
    # as the first compile lands (the refined scan protocol below overwrites
    # it; if the tunnel stalls mid-way, this line is what the parent prints).
    # Only under the parent/child progress-file protocol: stand-alone runs
    # (BENCH_NO_FORK=1) must print exactly ONE JSON line, the refined one.
    if os.environ.get("BENCH_PROGRESS_FILE"):
        coarse_step = jax.jit(one_step)
        xc, chk = coarse_step(x, zonal, sph, phase, bias, tbl_arg)
        float(chk)
        t0 = time.perf_counter()
        for _ in range(3):
            xc, chk = coarse_step(xc, zonal, sph, phase, bias, tbl_arg)
        float(chk)
        emit((time.perf_counter() - t0) / 3)

    if loop_mode == "device":
        @jax.jit
        def run_batch(x, zonal, sph, phase, bias, tbl):
            def body(x, _):
                xn, _chk = one_step(x, zonal, sph, phase, bias, tbl)
                return xn, ()
            xf, _ = jax.lax.scan(body, x, None, length=iters)
            return xf, jnp.sum(xf)

        # a scalar READBACK is the only reliable completion barrier through
        # the axon tunnel (block_until_ready can return before remote exec)
        xf, chk = run_batch(x, zonal, sph, phase, bias, tbl_arg)
        float(chk)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            xf, chk = run_batch(x, zonal, sph, phase, bias, tbl_arg)
            float(chk)
            times.append((time.perf_counter() - t0) / iters)
    else:
        step = jax.jit(one_step)
        x, chk = step(x, zonal, sph, phase, bias, tbl_arg)
        float(chk)
        # median over repeats — the shared chip shows ±20% run-to-run noise
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                x, chk = step(x, zonal, sph, phase, bias, tbl_arg)
            float(chk)
            times.append((time.perf_counter() - t0) / iters)
    final = payload_for(sorted(times)[reps // 2])
    do_compact = (impl == "banded"
                  and os.environ.get("BENCH_COMPACT", "1") != "0")
    if os.environ.get("BENCH_PROGRESS_FILE"):
        report(final)            # banded-only on record first (crash-safe)
        if do_compact:
            compact_stage(final)   # appends the combined refined line
    elif do_compact:
        try:
            compact_stage(final)   # stand-alone: exactly ONE line
        except Exception:
            report(final)
    else:
        report(final)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") or os.environ.get("BENCH_NO_FORK"):
        main()
    else:
        orchestrate()
