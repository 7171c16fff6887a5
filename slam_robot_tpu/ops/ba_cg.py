"""Large-scale bundle adjustment: implicit Schur complement + CG.

The dense solver (ops/ba.py) materializes the frame-point coupling blocks
A[P, W, 6, 4] — perfect for windows, impossible at 500k landmarks. This is
the scalable path, the analog of the reference's ITERATIVE_SCHUR +
SCHUR_JACOBI configuration (slam.cpp:488-490):

- the reduced camera system S = B - E C^-1 E^T is never formed; CG only
  needs S@x, and every term of that matvec is a gather/segment-sum over the
  observation table:
      t1 = Jf x            (per obs, gather by frame slot)
      u  = seg_p Jp^T w t1 (segment-sum into [P,4])
      v  = C^-1 u          (batched closed-form 4x4)
      y  = seg_slot Jf^T w Jp v   (segment-sum into [W,6])
  Peak memory is O(P*16 + O*...), independent of W*P.
- block-Jacobi preconditioner = inverses of the damped 6x6 frame blocks
  (SCHUR_JACOBI's diagonal).
- Gauss-Newton outer loop with fixed Levenberg damping (large maps are
  solved from good initializations — incremental mapping — so the full LM
  accept/reject machinery of the window solver isn't repeated here).
- obs arrays may be sharded across devices: the segment-sums become psums
  under the SPMD partitioner, which is exactly the landmark-ring
  accumulation over ICI described in SURVEY §5.

Same problem semantics as ops/ba.solve (free/const frames and points,
Cauchy IRLS, cheirality masking). Frame-distance priors are supported on
the block diagonal (their off-diagonal coupling is second-order for large
maps and omitted — documented deviation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from slam_robot_tpu.ops import projection as proj
from slam_robot_tpu.ops import quaternion as quat
from slam_robot_tpu.ops.ba import (
    TERM_MAX_ITERS,
    TERM_NOT_RUN,
    BAResult,
    _cauchy_rho,
    _cauchy_weight,
    inv4x4,
)

_HI = lax.Precision.HIGHEST


class CGConfig(NamedTuple):
    range: float = 2.0
    gn_iters: int = 8             # outer Gauss-Newton steps
    cg_iters: int = 30            # inner CG iterations
    damping: float = 1e-4         # Levenberg diagonal scaling
    baseline: float = 150.0
    frame_dist_weight: float = 0.1
    frame_dist_loss: float = 15.0
    uncertainty_free: float = 100.0
    max_free_frames: int = 64     # frame slots in the reduced system
    cheirality_eps: float = 0.001
    precond: str = "block"        # "block" (6x6 inverses) | "diag" (for
                                  # 10k-frame systems where batched LU hurts)


@functools.partial(jax.jit, static_argnames=("cfg",))
def solve(
    frame_quat, frame_trans, frame_cam, cam_k,
    point_loc, point_uncertainty,
    obs_frame, obs_point, obs_px, obs_ok,
    present, free_frame,
    cfg: CGConfig = CGConfig(),
) -> BAResult:
    F = frame_quat.shape[0]
    P = point_loc.shape[0]
    O = obs_frame.shape[0]
    W = cfg.max_free_frames

    f_idx = obs_frame.clip(0)
    p_idx = obs_point.clip(0)
    c_idx = frame_cam[f_idx]

    frame_has_obs = (
        jnp.zeros(F, jnp.int32).at[jnp.where(obs_ok, f_idx, F)].add(1, mode="drop") > 0
    )
    n_used = jnp.sum((present & frame_has_obs).astype(jnp.int32))
    solvable = n_used >= 2
    free_f = free_frame & frame_has_obs & solvable

    point_in = (
        jnp.zeros(P, jnp.int32).at[jnp.where(obs_ok, p_idx, P)].add(1, mode="drop") > 0
    )
    fluid = (
        jnp.zeros(P, jnp.int32)
        .at[jnp.where(obs_ok & free_f[f_idx], p_idx, P)]
        .add(1, mode="drop")
        > 0
    )
    free_p = point_in & (fluid | (point_uncertainty > cfg.uncertainty_free)) & solvable

    slot_of = jnp.where(free_f, jnp.cumsum(free_f) - 1, W).astype(jnp.int32)
    slot_of = jnp.minimum(slot_of, W)
    obs_slot = slot_of[f_idx]

    prev_present = jnp.roll(present, 1).at[0].set(False)
    prior_f = free_f & prev_present & (jnp.arange(F) >= 1)

    def residuals(fq, ft, locs):
        def one(q, t, k, loc, px):
            return proj.reprojection_error(q, t, k, loc, px, cfg.cheirality_eps)

        r, valid = jax.vmap(one)(fq[f_idx], ft[f_idx], cam_k[c_idx],
                                 locs[p_idx], obs_px)
        use = obs_ok & valid & jnp.all(jnp.isfinite(r), axis=-1)
        return jnp.where(use[:, None], r, 0.0), use

    def gn_step(carry, _):
        fq, ft, locs = carry

        def res_params(xi, t, p, q0, px, k):
            qq = quat.retract(q0, xi)
            r, _ = proj.reprojection_error(qq, t, k, p, px, cfg.cheirality_eps)
            return r

        r, use = residuals(fq, ft, locs)
        s = jnp.sum(r * r, axis=-1)
        w = jnp.where(use, _cauchy_weight(s, cfg.range), 0.0)

        zero3 = jnp.zeros(3)
        jxi, jt, jp = jax.vmap(jax.jacfwd(res_params, argnums=(0, 1, 2)))(
            jnp.tile(zero3, (O, 1)), ft[f_idx], locs[p_idx], fq[f_idx],
            obs_px, cam_k[c_idx],
        )
        jf = jnp.concatenate([jxi, jt], axis=-1)
        jf = jf * (use & (obs_slot < W))[:, None, None]
        jp = jp * (use & free_p[p_idx])[:, None, None]
        wr = w[:, None] * r

        # landmark blocks + gradient
        Cp = jnp.zeros((P, 4, 4)).at[p_idx].add(
            jnp.einsum("oia,oib,o->oab", jp, jp, w, precision=_HI), mode="drop")
        bp = jnp.zeros((P, 4)).at[p_idx].add(
            -jnp.einsum("oia,oi->oa", jp, wr, precision=_HI), mode="drop")
        Hff = jnp.zeros((W + 1, 6, 6)).at[obs_slot].add(
            jnp.einsum("oia,oib,o->oab", jf, jf, w, precision=_HI), mode="drop")[:W]
        bf = jnp.zeros((W + 1, 6)).at[obs_slot].add(
            -jnp.einsum("oia,oi->oa", jf, wr, precision=_HI), mode="drop")[:W]

        # frame-distance prior: diagonal contributions
        tprev = jnp.roll(ft, 1, axis=0)
        dvec = ft - tprev
        dnorm = jnp.linalg.norm(dvec, axis=-1)
        dhat = dvec / jnp.maximum(dnorm, 1e-9)[:, None]
        rp = cfg.frame_dist_weight * (dnorm - cfg.baseline)
        wp = jnp.where(prior_f, _cauchy_weight(rp * rp, cfg.frame_dist_loss), 0.0)
        jp_t = cfg.frame_dist_weight * dhat
        blk = jnp.einsum("fa,fb,f->fab", jp_t, jp_t, wp, precision=_HI)
        Hff = Hff.at[slot_of, 3:, 3:].add(
            jnp.where(prior_f[:, None, None], blk, 0.0), mode="drop")
        bf = bf.at[slot_of, 3:].add(
            jnp.where(prior_f[:, None], -(wp * rp)[:, None] * jp_t, 0.0), mode="drop")

        # damping
        lam = cfg.damping
        Hff_d = Hff + lam * jnp.eye(6) * jnp.maximum(
            jnp.einsum("fii->f", Hff)[:, None, None] / 6.0, 1e-6) + 1e-8 * jnp.eye(6)
        Cd = Cp + lam * jnp.eye(4) * jnp.maximum(
            jnp.einsum("pii->p", Cp)[:, None, None] / 4.0, 1e-6) + 1e-8 * jnp.eye(4)
        Cinv = jnp.where(free_p[:, None, None], inv4x4(Cd), 0.0)

        slot_active = jnp.arange(W) < jnp.sum(free_f)

        def schur_matvec(x):  # x: [W, 6]
            xg = jnp.concatenate([x, jnp.zeros((1, 6))])[obs_slot]  # [O,6]
            t1 = jnp.einsum("oia,oa->oi", jf, xg, precision=_HI)
            u = jnp.zeros((P, 4)).at[p_idx].add(
                jnp.einsum("oia,oi,o->oa", jp, t1, w, precision=_HI), mode="drop")
            v = jnp.einsum("pab,pb->pa", Cinv, u, precision=_HI)
            t2 = jnp.einsum("oia,oa->oi", jp, v[p_idx], precision=_HI)
            y = jnp.zeros((W + 1, 6)).at[obs_slot].add(
                jnp.einsum("oia,oi,o->oa", jf, t2, w, precision=_HI), mode="drop")[:W]
            bx = jnp.einsum("wab,wb->wa", Hff_d, x, precision=_HI)
            return jnp.where(slot_active[:, None], bx - y, x)

        # rhs = bf - E C^-1 bp
        v0 = jnp.einsum("pab,pb->pa", Cinv, bp, precision=_HI)
        t2 = jnp.einsum("oia,oa->oi", jp, v0[p_idx], precision=_HI)
        e_cb = jnp.zeros((W + 1, 6)).at[obs_slot].add(
            jnp.einsum("oia,oi,o->oa", jf, t2, w, precision=_HI), mode="drop")[:W]
        rhs = jnp.where(slot_active[:, None], bf - e_cb, 0.0)

        # Jacobi preconditioner (SCHUR_JACOBI)
        if cfg.precond == "block":
            Minv = jnp.where(
                slot_active[:, None, None], jnp.linalg.inv(Hff_d), jnp.eye(6)
            )

            def precond(z):
                return jnp.einsum("wab,wb->wa", Minv, z, precision=_HI)
        else:
            dinv = 1.0 / jnp.maximum(
                jnp.diagonal(Hff_d, axis1=1, axis2=2), 1e-12
            )

            def precond(z):
                return z * dinv

        def cg_body(k, st):
            x, rr, z, pdir, rz = st
            Ap = schur_matvec(pdir)
            alpha = rz / jnp.maximum(jnp.sum(pdir * Ap), 1e-20)
            x = x + alpha * pdir
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            pdir = z + beta * pdir
            return (x, rr, z, pdir, rz_new)

        x0 = jnp.zeros((W, 6))
        z0 = precond(rhs)
        st = (x0, rhs, z0, z0, jnp.sum(rhs * z0))
        x, *_ = lax.fori_loop(0, cfg.cg_iters, cg_body, st)

        # back-substitute points
        xg = jnp.concatenate([x, jnp.zeros((1, 6))])[obs_slot]
        t1 = jnp.einsum("oia,oa->oi", jf, xg, precision=_HI)
        u = jnp.zeros((P, 4)).at[p_idx].add(
            jnp.einsum("oia,oi,o->oa", jp, t1, w, precision=_HI), mode="drop")
        dp = jnp.einsum("pab,pb->pa", Cinv, bp - u, precision=_HI)
        dp = jnp.where(free_p[:, None], dp, 0.0)

        upd = (free_f & (slot_of < W))[:, None]
        dxi = jnp.where(upd, jnp.concatenate([x, jnp.zeros((1, 6))])[slot_of.clip(0, W), :3], 0.0)
        dt = jnp.where(upd, jnp.concatenate([x, jnp.zeros((1, 6))])[slot_of.clip(0, W), 3:], 0.0)

        fq = jnp.where(upd, jax.vmap(quat.retract)(fq, dxi), fq)
        ft = ft + dt
        locs = locs + dp
        return (fq, ft, locs), None

    r0, use0 = residuals(frame_quat, frame_trans, point_loc)
    s0 = jnp.sum(r0 * r0, axis=-1)
    cost0 = 0.5 * jnp.sum(jnp.where(use0, _cauchy_rho(s0, cfg.range), 0.0))

    (fq, ft, locs), _ = lax.scan(
        gn_step, (frame_quat, frame_trans, point_loc), None, length=cfg.gn_iters
    )

    r, use = residuals(fq, ft, locs)
    s = jnp.sum(r * r, axis=-1)
    cost = 0.5 * jnp.sum(jnp.where(use, _cauchy_rho(s, cfg.range), 0.0))

    return BAResult(
        frame_quat=jnp.where(solvable, fq, frame_quat),
        frame_trans=jnp.where(solvable, ft, frame_trans),
        point_loc=jnp.where(solvable, locs, point_loc),
        cam_k=cam_k,
        ok=solvable,
        cost=cost,
        iters=jnp.int32(cfg.gn_iters),
        # fixed-iteration GN: the cap is always the exit reason
        term=jnp.where(solvable, TERM_MAX_ITERS, TERM_NOT_RUN).astype(jnp.int32),
        cost0=cost0,
    )
