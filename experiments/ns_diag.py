"""NS identification bias forensics (round 5): WHERE does the ~3-4%
lambda1 error come from?

At an L-BFGS stationary point, (lambda1, lambda2) is exactly the
least-squares solution of the momentum-residual system GIVEN the net
(d loss / d lambda = 0 is the lstsq normal equation).  So the lambda
bias is a property of the trained fields, and we can re-estimate
lambda from the same net under different estimators to localize it:

  momentum   lstsq of  u_t + l1 (u.grad)u + grad p = l2 Lap u  at the
             training points, everything from the net streams — must
             reproduce the trained lambdas (consistency check).
  curl       the same system with the PRESSURE ELIMINATED: curl of
             each term field on a regular grid (spectral derivative in
             the periodic box; the net is near-periodic because the
             data is).  u_t/advection curls come analytically from the
             order-3 streams; curl(Lap u) = Lap w needs order 4, so it
             is taken spectrally from the gridded Lap-u field.  If
             curl-space lambda1 is unbiased while momentum-space is
             not, the bias is pressure-gauge leakage (the net trades
             the gradient part of the advection term against p), and a
             vorticity-form residual is the fix.
  data       the same two estimators with the DNS's exact spectral
             derivatives instead of the net's (dataset quality floor).

Usage: python experiments/ns_diag.py [checkpoint.npz] (CPU, ~seconds)
"""

from __future__ import annotations

import json
import sys

from _common import setup  # noqa: F401 (path side effect)

import jax
import jax.numpy as jnp
import numpy as np

from datagen import navierstokes_spectral
from pinn.models import mlp
from pinn.problems import navierstokes as ns
from pinn.utils import checkpoint as ck

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def lstsq_lambdas(ut_terms, adv_terms, lap_terms):
    """Solve min || ut + l1*adv - l2*lap ||^2 for (l1, l2).

    Each argument is a flat vector stacking every equation (both
    momentum components, all sample points)."""
    G = np.stack([-np.asarray(adv_terms), np.asarray(lap_terms)], axis=1)
    sol, *_ = np.linalg.lstsq(G, np.asarray(ut_terms), rcond=None)
    return float(sol[0]), float(sol[1])


def net_term_fields(params, data, xg, yg, tg):
    """Evaluate (u_t + p_x-type, advection, laplacian) term fields from
    the net's order-3 streams on the (nx, ny) grid at each t in tg.
    Returns dict of (nt, nx, ny) arrays per momentum component."""
    nx, ny = len(xg), len(yg)
    X, Y = np.meshgrid(xg, yg, indexing="ij")
    lb = jnp.asarray(data.lb, jnp.float64)
    ub = jnp.asarray(data.ub, jnp.float64)

    @jax.jit
    def terms(Xpts):
        s = ns.ns_taylor_apply(params.net, Xpts, lb, ub)

        def psi(st):
            return st[:, 0]

        u, v = psi(s.y), -psi(s.x)
        u_t, u_x, u_y = psi(s.yt), psi(s.xy), psi(s.yy)
        u_xx, u_yy = psi(s.xxy), psi(s.yyy)
        v_t, v_x, v_y = -psi(s.xt), -psi(s.xx), -psi(s.xy)
        v_xx, v_yy = -psi(s.xxx), -psi(s.xyy)
        p_x, p_y = s.x[:, 1], s.y[:, 1]
        return dict(
            ut_u=u_t, ut_v=v_t, px=p_x, py=p_y,
            adv_u=u * u_x + v * u_y, adv_v=u * v_x + v * v_y,
            lap_u=u_xx + u_yy, lap_v=v_xx + v_yy)

    out = {k: [] for k in ("ut_u", "ut_v", "px", "py",
                           "adv_u", "adv_v", "lap_u", "lap_v")}
    for t in tg:
        Xpts = jnp.asarray(np.stack(
            [X.ravel(), Y.ravel(), np.full(X.size, t)], axis=1))
        f = terms(Xpts)
        for k in out:
            out[k].append(np.asarray(f[k]).reshape(nx, ny))
    return {k: np.stack(v) for k, v in out.items()}


def spectral_curl(fx, fy):
    """curl of the 2D vector field (fx, fy) on the periodic grid:
    d fy/dx - d fx/dy, spectral derivatives per frame."""
    nx, ny = fx.shape[-2:]
    kx = np.fft.fftfreq(nx, d=1.0 / nx)[:, None]
    ky = np.fft.fftfreq(ny, d=1.0 / ny)[None, :]
    return (np.real(np.fft.ifft2(1j * kx * np.fft.fft2(fy)))
            - np.real(np.fft.ifft2(1j * ky * np.fft.fft2(fx))))


def data_term_fields(data, it_slices):
    """The same term fields from the DNS's own frames with spectral
    space derivatives and 4th-order FD in t (the dataset's effective
    lambdas — its quality floor)."""
    nx, ny, nt = len(data.x), len(data.y), len(data.t)
    U = data.u_star.reshape(nx, ny, nt)
    V = data.v_star.reshape(nx, ny, nt)
    P = data.p_star.reshape(nx, ny, nt)
    dt = data.t[1] - data.t[0]
    kx = np.fft.fftfreq(nx, d=1.0 / nx)[:, None]
    ky = np.fft.fftfreq(ny, d=1.0 / ny)[None, :]

    def dx(f):
        return np.real(np.fft.ifft2(1j * kx * np.fft.fft2(f)))

    def dy(f):
        return np.real(np.fft.ifft2(1j * ky * np.fft.fft2(f)))

    def lap(f):
        return np.real(np.fft.ifft2(-(kx**2 + ky**2) * np.fft.fft2(f)))

    out = {k: [] for k in ("ut_u", "ut_v", "px", "py",
                           "adv_u", "adv_v", "lap_u", "lap_v")}
    for it in it_slices:
        u, v, p = U[:, :, it], V[:, :, it], P[:, :, it]
        # 4th-order centered time derivative (interior slices only).
        ut = (U[:, :, it - 2] - 8 * U[:, :, it - 1]
              + 8 * U[:, :, it + 1] - U[:, :, it + 2]) / (12 * dt)
        vt = (V[:, :, it - 2] - 8 * V[:, :, it - 1]
              + 8 * V[:, :, it + 1] - V[:, :, it + 2]) / (12 * dt)
        out["ut_u"].append(ut); out["ut_v"].append(vt)
        out["px"].append(dx(p)); out["py"].append(dy(p))
        out["adv_u"].append(u * dx(u) + v * dy(u))
        out["adv_v"].append(u * dx(v) + v * dy(v))
        out["lap_u"].append(lap(u)); out["lap_v"].append(lap(v))
    return {k: np.stack(v) for k, v in out.items()}


def estimators(f, tag):
    """Momentum-space and curl-space lambda lstsq from term fields."""
    # Momentum space: stack u- and v-equations, pressure included.
    ut = np.concatenate([(f["ut_u"] + f["px"]).ravel(),
                         (f["ut_v"] + f["py"]).ravel()])
    adv = np.concatenate([f["adv_u"].ravel(), f["adv_v"].ravel()])
    lapv = np.concatenate([f["lap_u"].ravel(), f["lap_v"].ravel()])
    l1m, l2m = lstsq_lambdas(ut, adv, lapv)

    # Curl space: pressure (any gradient) drops out exactly.
    cut = spectral_curl(f["ut_u"], f["ut_v"]).ravel()
    cadv = spectral_curl(f["adv_u"], f["adv_v"]).ravel()
    clap = spectral_curl(f["lap_u"], f["lap_v"]).ravel()
    l1c, l2c = lstsq_lambdas(cut, cadv, clap)

    # Advection-term Helmholtz split: how much of the identification
    # signal lives in the gradient (pressure-absorbable) part?
    sol_frac = float(np.linalg.norm(cadv)
                     / max(np.linalg.norm(np.concatenate(
                         [f["adv_u"].ravel(), f["adv_v"].ravel()])), 1e-300))
    return {f"{tag}_momentum": {"l1": l1m, "l2": l2m},
            f"{tag}_curl": {"l1": l1c, "l2": l2c},
            f"{tag}_curl_to_adv_norm": sol_frac}


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "logs/ns_N2_stage0.npz"
    data = navierstokes_spectral.generate()
    layers = [3] + [20] * 8 + [2]
    net = mlp.init_mlp(jax.random.PRNGKey(0), layers, jnp.float64)
    like = ns.init_ide_params(net, jnp.float64)
    params, _ = ck.load_npz(ckpt, like=like)
    print(f"checkpoint {ckpt}: trained l1={float(params.lambda1[0]):.6f} "
          f"l2={float(params.lambda2[0]):.6f}", flush=True)

    # Interior time slices (4th-order FD in t needs 2 neighbors).
    nt = len(data.t)
    slices = list(range(2, nt - 2, max(1, (nt - 4) // 8)))[:8]
    tg = [float(data.t[i]) for i in slices]

    fn = net_term_fields(params, data, data.x, data.y, tg)
    fd = data_term_fields(data, slices)

    out = {"checkpoint": ckpt,
           "trained_l1": float(params.lambda1[0]),
           "trained_l2": float(params.lambda2[0])}
    out.update(estimators(fn, "net"))
    out.update(estimators(fd, "data"))
    print("DIAG " + json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
