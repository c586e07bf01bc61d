"""Krylov solvers: right-preconditioned BiCGStab, CG, and flexible CG.

BiCGStab follows the IML++-template formulation the reference embeds
(``src/CPU_C++/main.cpp:89-151``, ``src/common/bicg.cpp:74-136``) including
its status codes (0 converged, 1 max-iter, 2 ρ-breakdown, 3 ω-breakdown)
and its convergence test ‖r‖/‖b‖ < tol with the same mid-iteration early
exit on ‖s‖.  Implemented as a single jitted ``lax.while_loop`` so an
entire solve is one XLA program on device — the reference instead pays a
host round-trip per iteration.

Flexible CG (FCG) is the outer method AGMG pairs with K-cycles for SPD
problems (``solve.m:28-31`` uses pcg for the sym case).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..sparse.formats import ELL
from ..sparse import ops


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray   # int32
    relres: jnp.ndarray       # achieved ‖r‖/‖b‖
    status: jnp.ndarray       # 0 ok; 1 maxiter; 2 rho-breakdown; 3 omega=0


def _norm(v):
    return jnp.sqrt(jnp.vdot(v, v).real)


def bicgstab(matvec: Callable, b: jnp.ndarray, precond: Callable | None = None,
             x0: jnp.ndarray | None = None, tol: float = 1e-6,
             maxiter: int = 10000) -> SolveResult:
    """Right-preconditioned BiCGStab, semantics of main.cpp:89-151."""
    if precond is None:
        precond = lambda v: v
    x = jnp.zeros_like(b) if x0 is None else x0
    normb = _norm(b)
    normb = jnp.where(normb == 0.0, 1.0, normb)
    r = b - matvec(x)
    rtilde = r
    resid0 = _norm(r) / normb

    zeros = jnp.zeros_like(b)
    one = jnp.asarray(1.0, b.dtype)

    # state: (i, x, r, p, v, rho_2, alpha, omega, resid, status, done)
    def cond(st):
        return (~st["done"]) & (st["i"] <= maxiter)

    def body(st):
        i = st["i"]
        rho_1 = jnp.vdot(rtilde, st["r"])

        def on_rho_zero(st):
            st = dict(st)
            st["status"] = jnp.int32(2)
            st["resid"] = _norm(st["r"]) / normb
            st["done"] = jnp.bool_(True)
            st["i"] = i + 1
            return st

        def main_step(st):
            first = i == 1
            beta = jnp.where(
                first, 0.0,
                (rho_1 / _nz(st["rho_2"])) * (st["alpha"] / _nz(st["omega"])))
            p = jnp.where(first, st["r"],
                          st["r"] + beta * (st["p"] - st["omega"] * st["v"]))
            phat = precond(p)
            v = matvec(phat)
            alpha = rho_1 / _nz(jnp.vdot(rtilde, v))
            s = st["r"] - alpha * v
            resid_s = _norm(s) / normb

            def early(st):
                st = dict(st)
                st["x"] = st["x"] + alpha * phat
                st["resid"] = resid_s
                st["status"] = jnp.int32(0)
                st["done"] = jnp.bool_(True)
                st["i"] = i
                st["p"], st["v"], st["alpha"] = p, v, alpha
                st["rho_2"] = rho_1
                return st

            def full(st):
                shat = precond(s)
                t = matvec(shat)
                omega = jnp.vdot(t, s) / _nz(jnp.vdot(t, t))
                x = st["x"] + alpha * phat + omega * shat
                r = s - omega * t
                resid = _norm(r) / normb
                conv = resid < tol
                om_zero = (omega == 0.0) & ~conv
                st = dict(st)
                st["x"], st["r"], st["p"], st["v"] = x, r, p, v
                st["alpha"], st["omega"], st["rho_2"] = alpha, omega, rho_1
                st["resid"] = resid
                st["status"] = jnp.where(conv, jnp.int32(0),
                                         jnp.where(om_zero, jnp.int32(3),
                                                   st["status"]))
                st["done"] = conv | om_zero
                st["i"] = jnp.where(conv | om_zero, i, i + 1)
                return st

            return jax.lax.cond(resid_s < tol, early, full, st)

        return jax.lax.cond(rho_1 == 0.0, on_rho_zero, main_step, st)

    init = dict(i=jnp.int32(1), x=x, r=r, p=zeros, v=zeros,
                rho_2=one, alpha=one, omega=one,
                resid=resid0, status=jnp.int32(1), done=resid0 <= tol)
    st = jax.lax.while_loop(cond, body, init)
    # done=True: status set inside the loop (0/2/3).  Otherwise the loop
    # exhausted maxiter → status 1, matching main.cpp:150.
    status = jnp.where(st["done"], st["status"], jnp.int32(1))
    status = jnp.where(resid0 <= tol, jnp.int32(0), status)
    iters = jnp.where(st["done"], st["i"], jnp.int32(maxiter))
    iters = jnp.where(resid0 <= tol, jnp.int32(0), iters)
    return SolveResult(x=st["x"], iterations=iters, relres=st["resid"],
                       status=status)


def _nz(x):
    """Guard exact-zero denominators (breakdowns are caught separately)."""
    return jnp.where(x == 0.0, jnp.asarray(1e-300, x.dtype)
                     if x.dtype == jnp.float64 else
                     jnp.asarray(1e-30, x.dtype), x)


def cg(matvec, b, precond=None, x0=None, tol: float = 1e-6,
       maxiter: int = 10000) -> SolveResult:
    """Standard preconditioned CG (fixed preconditioner)."""
    if precond is None:
        precond = lambda v: v
    x = jnp.zeros_like(b) if x0 is None else x0
    normb = _norm(b)
    normb = jnp.where(normb == 0.0, 1.0, normb)
    r = b - matvec(x)
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)

    def cond(st):
        return (st["resid"] >= tol) & (st["i"] < maxiter)

    def body(st):
        ap = matvec(st["p"])
        alpha = st["rz"] / _nz(jnp.vdot(st["p"], ap))
        x = st["x"] + alpha * st["p"]
        r = st["r"] - alpha * ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / _nz(st["rz"])
        return dict(i=st["i"] + 1, x=x, r=r, p=z + beta * st["p"],
                    rz=rz_new, resid=_norm(r) / normb)

    init = dict(i=jnp.int32(0), x=x, r=r, p=p, rz=rz,
                resid=_norm(r) / normb)
    st = jax.lax.while_loop(cond, body, init)
    return SolveResult(x=st["x"], iterations=st["i"], relres=st["resid"],
                       status=jnp.where(st["resid"] < tol, 0, 1).astype(jnp.int32))


def fcg(matvec, b, precond=None, x0=None, tol: float = 1e-6,
        maxiter: int = 10000, truncate: int = 2) -> SolveResult:
    """Flexible CG with truncated orthogonalisation (Notay's FCG(1)/FCG(2)
    — the recommended outer solver for K-cycle AMG on SPD systems).

    Keeps the last `truncate` directions; suitable for a *variable*
    preconditioner such as a K-cycle whose inner FCG makes M nonlinear.
    """
    if precond is None:
        precond = lambda v: v
    x = jnp.zeros_like(b) if x0 is None else x0
    normb = _norm(b)
    normb = jnp.where(normb == 0.0, 1.0, normb)
    r = b - matvec(x)
    n = b.shape[0]
    hist_p = jnp.zeros((truncate, n), dtype=b.dtype)
    hist_ap = jnp.zeros((truncate, n), dtype=b.dtype)
    hist_den = jnp.ones((truncate,), dtype=b.dtype)
    hist_ok = jnp.zeros((truncate,), dtype=bool)

    def cond(st):
        return (st["resid"] >= tol) & (st["i"] < maxiter)

    def body(st):
        z = precond(st["r"])
        p = z
        # orthogonalise against retained directions
        betas = jnp.where(st["hok"],
                          (st["hap"] @ z) / st["hden"], 0.0)
        p = z - betas @ st["hp"]
        ap = matvec(p)
        den = jnp.vdot(p, ap)
        alpha = jnp.vdot(p, st["r"]) / _nz(den)
        x = st["x"] + alpha * p
        r = st["r"] - alpha * ap
        # rotate history
        hp = jnp.roll(st["hp"], 1, axis=0).at[0].set(p)
        hap = jnp.roll(st["hap"], 1, axis=0).at[0].set(ap)
        hden = jnp.roll(st["hden"], 1).at[0].set(_nz(den))
        hok = jnp.roll(st["hok"], 1).at[0].set(True)
        return dict(i=st["i"] + 1, x=x, r=r, hp=hp, hap=hap, hden=hden,
                    hok=hok, resid=_norm(r) / normb)

    init = dict(i=jnp.int32(0), x=x, r=r, hp=hist_p, hap=hist_ap,
                hden=hist_den, hok=hist_ok, resid=_norm(r) / normb)
    st = jax.lax.while_loop(cond, body, init)
    return SolveResult(x=st["x"], iterations=st["i"], relres=st["resid"],
                       status=jnp.where(st["resid"] < tol, 0, 1).astype(jnp.int32))


def gmres(matvec, b, precond=None, x0=None, tol: float = 1e-6,
          maxiter: int = 1000, restart: int = 30) -> SolveResult:
    """Right-preconditioned restarted GMRES(m).

    Arnoldi with modified Gram-Schmidt in a fixed-size Krylov basis
    (static shapes for jit); the Hessenberg least-squares problem is
    reduced progressively by Givens rotations (the textbook QR — not
    normal equations, which would square the conditioning in f32).  The
    rotations also yield the implicit residual |g[j+1]| at every Arnoldi
    step, so convergence inside a restart is credited with the true step
    count, not a full m.
    """
    if precond is None:
        precond = lambda v: v
    n = b.shape[0]
    m = restart
    x = jnp.zeros_like(b) if x0 is None else x0
    normb = _norm(b)
    normb = jnp.where(normb == 0.0, 1.0, normb)

    def outer_cond(st):
        return (st["resid"] >= tol) & (st["iters"] < maxiter)

    def outer_body(st):
        x = st["x"]
        r = b - matvec(x)
        beta = _norm(r)
        v0 = r / jnp.where(beta == 0.0, 1.0, beta)
        basis = jnp.zeros((m + 1, n), b.dtype).at[0].set(v0)
        rmat = jnp.zeros((m + 1, m), b.dtype)   # rotated (triangular) H
        zs = jnp.zeros((m, n), b.dtype)         # preconditioned directions
        g = jnp.zeros(m + 1, b.dtype).at[0].set(beta)
        cs = jnp.zeros(m, b.dtype)
        sn = jnp.zeros(m, b.dtype)

        def arnoldi(j, carry):
            basis, rmat, zs, g, cs, sn, done_at, resid_c = carry
            z = precond(basis[j])
            w = matvec(z)
            # modified Gram-Schmidt against all basis vectors (masked)
            def mgs(i, acc):
                w, hcol = acc
                hij = jnp.where(i <= j, jnp.vdot(basis[i], w), 0.0)
                w = w - hij * basis[i]
                return w, hcol.at[i].set(hij)

            w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                        (w, jnp.zeros(m + 1, b.dtype)))
            hjj = _norm(w)
            hcol = hcol.at[j + 1].set(hjj)
            vnext = w / jnp.where(hjj == 0.0, 1.0, hjj)
            basis = basis.at[j + 1].set(vnext)

            # apply the previous rotations 0..j-1 to the new column
            def rot(i, hcol):
                hi = cs[i] * hcol[i] + sn[i] * hcol[i + 1]
                hi1 = -sn[i] * hcol[i] + cs[i] * hcol[i + 1]
                return jnp.where(i < j,
                                 hcol.at[i].set(hi).at[i + 1].set(hi1),
                                 hcol)

            hcol = jax.lax.fori_loop(0, m, rot, hcol)
            # new rotation annihilating hcol[j+1]
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c = jnp.where(denom == 0.0, 1.0, hcol[j] / _nz(denom))
            s = jnp.where(denom == 0.0, 0.0, hcol[j + 1] / _nz(denom))
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
            resid_j = jnp.abs(g[j + 1]) / normb
            active = j < done_at
            resid_c = jnp.where(active, resid_j, resid_c)
            done_at = jnp.where(active & (resid_j < tol),
                                jnp.int32(j + 1), done_at)
            return (basis, rmat.at[:, j].set(hcol), zs.at[j].set(z),
                    g, cs.at[j].set(c), sn.at[j].set(s), done_at, resid_c)

        carry = (basis, rmat, zs, g, cs, sn, jnp.int32(m),
                 beta / normb)
        basis, rmat, zs, g, cs, sn, done_at, resid_c = jax.lax.fori_loop(
            0, m, arnoldi, carry)
        # back-substitute only the first done_at columns: mask the rest of
        # R to identity and g to 0 so their y entries vanish
        idx = jnp.arange(m)
        keep = idx < done_at
        r_mm = jnp.where(keep[:, None] & keep[None, :], rmat[:m, :m],
                         jnp.eye(m, dtype=b.dtype))
        g_eff = jnp.where(keep, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(r_mm, g_eff, lower=False)
        x = x + y @ zs
        return dict(x=x, resid=resid_c, iters=st["iters"] + done_at)

    r0 = b - matvec(x)
    st = jax.lax.while_loop(outer_cond, outer_body,
                            dict(x=x, resid=_norm(r0) / normb,
                                 iters=jnp.int32(0)))
    return SolveResult(x=st["x"], iterations=st["iters"],
                       relres=st["resid"],
                       status=jnp.where(st["resid"] < tol, 0, 1
                                        ).astype(jnp.int32))
