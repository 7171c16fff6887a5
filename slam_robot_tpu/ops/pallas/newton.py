"""Fused per-level Newton tracker kernel (hessian.h:147-264 hot loop).

One pallas_call runs ALL Newton iterations of one pyramid level for every
feature lane at once. Per iteration the 13x13 patch is re-sampled from a
per-lane 32x32 VMEM window by two banded bilinear matrix products
(MXU-shaped: [F,S,WW] @ [F,WW,WW] @ [F,WW,S]), and the photometric score's
exact gradient and Hessian are HAND-DERIVED in closed form — the same
quantities ops/tracker.py gets from jax.grad/jacfwd, but with only the
primitives this environment's Mosaic compiler accepts (tools/probe_mosaic*:
reverse-mode AD transposes and multi-axis reductions SIGABRT the remote
compiler; batched dot_general, iota/where, fori_loop + pl.when, and
single-axis reductions are safe).

The window math lives in :func:`newton_window_steps`, a pure jnp function
shared by three backends:
  - the Pallas kernel (TPU hot path, one kernel per level sweep)
  - plain XLA (CPU tests / fallback — identical math, identical results)
  - pallas interpret mode (kernel plumbing tests)

Semantics mirror ops/tracker.track_level exactly: margin OOB test per
iteration, Newton step d = -H^-1 g with unit-norm then per-component
clamp, convergence when both |d| < threshold, done lanes keep their
position, replicate-border patch clamping at window edges (the window is
flush with the level's padded edges whenever clamping bites, so the clamp
reproduces ops/patch.extract's), and validity masks from the raw
(unclamped) support coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OK = 0.0
OUT_OF_BOUNDS = 2.0

_MARGIN = 0.01   # hessian.h:196
MARGIN_PX = 12   # window margin: 6 Newton px + 6 patch half + bilinear fits 32


def _mean2(a):
    """Mean over the last two axes via sequential single-axis sums
    (a fused axis=(1,2) reduce crashes the remote Mosaic compiler)."""
    return jnp.sum(jnp.sum(a, axis=-1), axis=-1) / (a.shape[-1] * a.shape[-2])


def _sum2(a):
    return jnp.sum(jnp.sum(a, axis=-1), axis=-1)


def _banded_pair(frac, start, length: int, size: int):
    """[F, 2*size, length] stacked bilinear selection matrix: rows 0..S-1
    select at k = start[f]+i with weights (1-frac, frac); rows S..2S-1 are
    the derivative w.r.t. the fractional coordinate (-1, +1). Stacking lets
    the interpolation and its derivative ride ONE batched dot_general
    (26-row MXU tiles instead of two 13-row ones)."""
    F = frac.shape[0]
    fr = frac[:, None, None]
    st = start[:, None, None]
    i2 = jax.lax.broadcasted_iota(jnp.int32, (F, 2 * size, length), 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (F, 2 * size, length), 2)
    isd = i2 >= size
    i = jnp.where(isd, i2 - size, i2)
    w0 = jnp.where(isd, -1.0, 1.0 - fr)
    w1 = jnp.where(isd, 1.0, fr)
    return jnp.where(k == i + st, w0, 0.0) + jnp.where(k == i + st + 1, w1, 0.0)


def _bdot(a, b):
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _expand_rows(vals, size: int, G: int):
    """[B, G] per-lane scalars -> [B, G*2S, 1] with each lane's value
    repeated over its 2S rows. jnp.repeat crashes the remote Mosaic
    compiler (tools/probe_mosaic4 G1); a G-term iota-masked sum is in the
    probed-safe set (G4)."""
    B = vals.shape[0]
    M = G * 2 * size
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1) // (2 * size)
    out = jnp.zeros((B, M), vals.dtype)
    for g in range(G):
        out = out + jnp.where(lane == g, vals[:, g][:, None],
                              jnp.zeros((), vals.dtype))
    return out[:, :, None]


def _banded_pair_grouped(frac, start, length: int, size: int, G: int):
    """Grouped [B, G*2S, G*length] banded selection matrix: G lanes share
    one matmul, each lane's 26 rows carrying its bilinear band inside its
    own K-block of ``length`` columns. Contracting against the lanes'
    windows stacked along K ([B, G*length, N]) yields the per-lane products
    vertically stacked — one [104, 128]-shaped MXU op instead of four
    [26, 32] ones (K fills the full 128-deep systolic array). Off-band
    entries are exact +0.0 — an exact identity under the MXU's sequential
    K accumulation (XLA:CPU's blocked reductions may reassociate, ~1e-5)."""
    B = frac.shape[0] // G
    M = G * 2 * size
    K = G * length
    fr = _expand_rows(frac.reshape(B, G), size, G)
    stg = start.reshape(B, G) + length * jax.lax.broadcasted_iota(
        jnp.int32, (B, G), 1
    )
    st = _expand_rows(stg, size, G)
    r = jax.lax.broadcasted_iota(jnp.int32, (B, M, K), 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (B, M, K), 2)
    i2 = r % (2 * size)
    isd = i2 >= size
    i = jnp.where(isd, i2 - size, i2)
    w0 = jnp.where(isd, -1.0, 1.0 - fr)
    w1 = jnp.where(isd, 1.0, fr)
    return jnp.where(k == i + st, w0, 0.0) + jnp.where(k == i + st + 1, w1, 0.0)


def _sample_grouped(win, fx, fy, x0c, y0c, size: int, G: int):
    """The two banded bilinear products with G lanes stacked per MXU op.

    win [F, WH, WW]; returns res [F, 2S, 2S] — numerically the ungrouped
    rowp @ win @ colp (the extra contraction entries multiply exact
    zeros; bit-identity holds under sequential K accumulation, i.e. the
    MXU — XLA:CPU blocked reductions reassociate at ~1e-5).

    Row product: Rstack [B, M, G*WH] @ win stacked along K. Column
    product runs TRANSPOSED to stay banded-grouped without a
    block-diagonal expansion (broadcast-4D+reshape crashes Mosaic,
    probe_mosaic4 G2): res^T = Cstack [B, M, G*WW] @ t^T stacked
    [B, G*WW, 2S], then per-lane [2S,2S] blocks transpose back via the
    probe-safe 4-D reshape+swapaxes (G5)."""
    F, WH, WW = win.shape
    S = size
    B = F // G
    M = G * 2 * S

    rowp = _banded_pair_grouped(fy, y0c, WH, S, G)        # [B, M, G*WH]
    t = _bdot(rowp, win.reshape(B, G * WH, WW))           # [B, M, WW]

    # t^T per lane, stacked along K: [B, M, WW] -> [B, G*WW, 2S]
    tt = jnp.swapaxes(t.reshape(B, G, 2 * S, WW), -1, -2)
    tstack = tt.reshape(B, G * WW, 2 * S)

    colb = _banded_pair_grouped(fx, x0c, WW, S, G)        # [B, M, G*WW]
    res_t = _bdot(colb, tstack)                           # [B, M, 2S]
    res = jnp.swapaxes(res_t.reshape(B, G, 2 * S, 2 * S), -1, -2)
    return res.reshape(F, 2 * S, 2 * S)


def _newton_iter(state, win, org, ref, ref_valid, r_mean, r_sumsq,
                 wmask, width, height, threshold: float, size: int,
                 group: int = 1):
    """One Newton step for all lanes (the shared iteration body). Done
    lanes pass through unchanged, so skipping an all-done iteration is
    bit-identical to running it."""
    F = win.shape[0]
    WH, WW = win.shape[1], win.shape[2]
    S = size
    half = (S - 1) // 2
    eps = 1e-12

    if True:  # keep the historical body indentation
        pos, status, done = state
        x, y = pos[:, 0], pos[:, 1]

        oob = (
            (x < _MARGIN) | (y < _MARGIN)
            | (x + _MARGIN > width) | (y + _MARGIN > height)
        )

        # window-local patch support origin (raw ints for validity, clamped
        # for extraction — exactly ops/patch.extract's clamp)
        lx = x - org[:, 0]
        ly = y - org[:, 1]
        x0f = jnp.floor(lx)
        y0f = jnp.floor(ly)
        fx = lx - x0f
        fy = ly - y0f
        x0 = x0f.astype(jnp.int32) - half
        y0 = y0f.astype(jnp.int32) - half
        x0c = jnp.clip(x0, 0, WW - (S + 1))
        y0c = jnp.clip(y0, 0, WH - (S + 1))

        # one stacked product yields the patch and all its bilinear
        # derivatives: res = [row;drow] @ win @ [col,dcol]. group > 1
        # stacks that many lanes per MXU op (bit-identical — the padding
        # is exact zeros), filling the 128-deep contraction instead of
        # running 26x32 tiles at ~20% utilization (PERF.md r2 lever b)
        if group > 1:
            res = _sample_grouped(win, fx, fy, x0c, y0c, S, group)
        else:
            rowp = _banded_pair(fy, y0c, WH, S)                     # [F,2S,WH]
            colp = _banded_pair(fx, x0c, WW, S).transpose(0, 2, 1)  # [F,WW,2S]
            t = _bdot(rowp, win)       # [F,2S,WW]  rows: interp | d/dy
            res = _bdot(t, colp)       # [F,2S,2S]
        p2 = res[:, :S, :S]        # patch
        u = res[:, :S, S:]         # dp2/dx
        v = res[:, S:, :S]         # dp2/dy
        puv = res[:, S:, S:]       # d2p2/dxdy (d2/dx2 = d2/dy2 = 0: bilinear)

        # validity of the moving patch from RAW support coords (extract's
        # rule: bilinear support inside the true image)
        gxi = jax.lax.broadcasted_iota(jnp.int32, (F, S), 1)
        gx = (x0 + org[:, 0].astype(jnp.int32))[:, None] + gxi
        gy = (y0 + org[:, 1].astype(jnp.int32))[:, None] + gxi
        vx = (gx >= 0) & (gx.astype(jnp.float32) + 1.0 <= width[:, None])
        vy = (gy >= 0) & (gy.astype(jnp.float32) + 1.0 <= height[:, None])
        valid2 = vy.astype(jnp.float32)[:, :, None] * vx.astype(jnp.float32)[:, None, :]

        w2 = wmask[None] * ref_valid * valid2    # [F,S,S]

        # photometric stats over ALL pixels (hessian.h mean = sum/S^2)
        m2 = _mean2(p2)
        ss2 = _mean2(p2 * p2)
        ss2s = jnp.maximum(ss2, eps)
        gate = (ss2 > eps).astype(jnp.float32)   # max() gradient gate
        m2x = _mean2(u)
        m2y = _mean2(v)
        m2xy = _mean2(puv)
        ss2x = 2.0 * _mean2(p2 * u) * gate
        ss2y = 2.0 * _mean2(p2 * v) * gate
        ss2xx = 2.0 * _mean2(u * u) * gate
        ss2yy = 2.0 * _mean2(v * v) * gate
        ss2xy = 2.0 * _mean2(u * v + p2 * puv) * gate

        alpha = jnp.sqrt(r_sumsq / ss2s)
        rx = ss2x / ss2s
        ry = ss2y / ss2s
        ax = -0.5 * alpha * rx
        ay = -0.5 * alpha * ry
        axx = -0.5 * (ax * rx + alpha * (ss2xx / ss2s - rx * rx))
        ayy = -0.5 * (ay * ry + alpha * (ss2yy / ss2s - ry * ry))
        axy = -0.5 * (ay * rx + alpha * (ss2xy / ss2s - rx * ry))

        bx = -ax * m2 - alpha * m2x
        by = -ay * m2 - alpha * m2y
        bxx = -axx * m2 - 2.0 * ax * m2x
        byy = -ayy * m2 - 2.0 * ay * m2y
        bxy = -axy * m2 - ax * m2y - ay * m2x - alpha * m2xy

        def bc(s):  # broadcast per-lane scalar over patch
            return s[:, None, None]

        beta = r_mean - alpha * m2
        e = ref - bc(alpha) * p2 - bc(beta)
        ex = -bc(ax) * p2 - bc(alpha) * u - bc(bx)
        ey = -bc(ay) * p2 - bc(alpha) * v - bc(by)
        exx = -bc(axx) * p2 - 2.0 * bc(ax) * u - bc(bxx)
        eyy = -bc(ayy) * p2 - 2.0 * bc(ay) * v - bc(byy)
        exy = (
            -bc(axy) * p2 - bc(ax) * v - bc(ay) * u - bc(alpha) * puv - bc(bxy)
        )

        gx_ = 2.0 * _sum2(w2 * e * ex)
        gy_ = 2.0 * _sum2(w2 * e * ey)
        hxx = 2.0 * _sum2(w2 * (ex * ex + e * exx))
        hyy = 2.0 * _sum2(w2 * (ey * ey + e * eyy))
        hxy = 2.0 * _sum2(w2 * (ex * ey + e * exy))

        det = hxx * hyy - hxy * hxy
        safe = jnp.where(jnp.abs(det) > 1e-20,
                         det, jnp.where(det >= 0, 1e-20, -1e-20))
        dx = -(hyy * gx_ - hxy * gy_) / safe
        dy = -(-hxy * gx_ + hxx * gy_) / safe
        finite = (jnp.abs(dx) < 1e20) & (jnp.abs(dy) < 1e20)
        dx = jnp.where(finite, dx, 0.0)
        dy = jnp.where(finite, dy, 0.0)

        n = jnp.sqrt(dx * dx + dy * dy)
        scale = jnp.where(n > 1.0, 1.0 / jnp.maximum(n, 1e-20), 1.0)
        dx = dx * scale
        dy = dy * scale
        sx = jnp.clip(dx, -1.0, 1.0)
        sy = jnp.clip(dy, -1.0, 1.0)

        converged = (jnp.abs(dx) < threshold) & (jnp.abs(dy) < threshold)

        move = (~oob) & (done < 0.5)
        new_pos = jnp.stack(
            [jnp.where(move, x + sx, x), jnp.where(move, y + sy, y)], -1
        )
        new_status = jnp.where(
            (done < 0.5) & oob, OUT_OF_BOUNDS, status
        )
        new_done = jnp.maximum(
            done, (oob | converged).astype(jnp.float32)
        )
        return new_pos, new_status, new_done


def newton_window_steps(
    win, pos0, org, ref, ref_valid, ref_mean, ref_sumsq, active,
    wmask, bounds,
    threshold: float, max_iters: int, size: int, group: int = 1,
):
    """Run ``max_iters`` Newton steps for all lanes against per-lane windows.

    win        [F, WH, WW] level pixels; window covers absolute level coords
               org[f] + (0..WH, 0..WW) (org may be negative: pad offset)
    pos0       [F, 2] absolute level-coords start (x, y)
    org        [F, 2] window origin (x, y) in absolute level coords
    ref*       reference patch stack data/valid/mean/sumsq for this level
    active     [F] f32 1/0
    bounds     [F, 2] true level extents (w, h) — runtime values so one
               kernel serves every pyramid level of a given window shape

    Returns (pos [F,2], status [F] f32, done [F] f32). Pure jnp — runs
    identically under XLA and inside the Pallas kernel.
    """
    F = pos0.shape[0]
    width = bounds[:, 0]
    height = bounds[:, 1]

    pos = pos0
    status = jnp.zeros((F,), jnp.float32)
    done = 1.0 - active

    def body(_, state):
        return _newton_iter(
            state, win, org, ref, ref_valid, ref_mean, ref_sumsq,
            wmask, width, height, threshold, size, group,
        )

    pos, status, done = jax.lax.fori_loop(0, max_iters, body, (pos, status, done))

    x, y = pos[:, 0], pos[:, 1]
    final_oob = (
        (x < _MARGIN) | (y < _MARGIN)
        | (x + _MARGIN > width) | (y + _MARGIN > height)
    )
    status = jnp.where(final_oob & (active > 0.5), OUT_OF_BOUNDS, status)
    return pos, status, done


def _kernel(win_ref, pos_ref, org_ref, ref_ref, rv_ref, rstat_ref, act_ref,
            w_ref, bounds_ref, pos_out, st_out, done_scr, red_scr, *,
            threshold, max_iters, size, group):
    """Kernel body with an ALL-DONE early exit: a done lane passes through
    ``_newton_iter`` unchanged, so once every lane in the block is done the
    remaining iterations are identities — ``pl.when`` skips their compute
    entirely (bit-identical results). Straggler-retry sweeps whose lanes
    mostly start done, and levels that converge in 2-3 of the budgeted
    iterations, stop paying for the full budget (~3.1 ms/frame of
    newton_level custom-calls at the full budget, trace r3).

    Mosaic gotcha (probed): pl.when directly on a vector-reduced value —
    or on an SMEM store of one — HTTP-500s the remote compiler. The
    supported route is vector-reduce -> VECTOR store into a VMEM scratch
    row -> scalar ELEMENT read as the condition (red_scr)."""
    win = win_ref[:]
    org = org_ref[:]
    ref = ref_ref[:]
    rv = rv_ref[:]
    r_mean = rstat_ref[:, 0]
    r_sumsq = rstat_ref[:, 1]
    active = act_ref[:, 0]
    wmask = w_ref[:]
    bounds = bounds_ref[:]
    width = bounds[:, 0]
    height = bounds[:, 1]
    F = pos_ref.shape[0]

    pos_out[:] = pos_ref[:]
    st_out[:] = jnp.zeros_like(st_out)
    done0 = 1.0 - active
    done_scr[:] = jnp.stack([done0, done0], -1)

    def body(_, carry):
        red_scr[0, :] = jnp.sum(done_scr[:], axis=0)

        @pl.when(red_scr[0, 0] < float(F))
        def _():
            pos, status, done = _newton_iter(
                (pos_out[:], st_out[:][:, 0], done_scr[:][:, 0]),
                win, org, ref, rv, r_mean, r_sumsq,
                wmask, width, height, threshold, size, group,
            )
            pos_out[:] = pos
            st_out[:] = jnp.stack([status, status], -1)
            done_scr[:] = jnp.stack([done, done], -1)

        return carry

    jax.lax.fori_loop(0, max_iters, body, 0)

    pos = pos_out[:]
    x, y = pos[:, 0], pos[:, 1]
    final_oob = (
        (x < _MARGIN) | (y < _MARGIN)
        | (x + _MARGIN > width) | (y + _MARGIN > height)
    )
    status = jnp.where(final_oob & (active > 0.5), OUT_OF_BOUNDS,
                       st_out[:][:, 0])
    st_out[:] = jnp.stack([status, status], -1)


@functools.partial(
    jax.jit,
    static_argnames=("threshold", "max_iters", "size", "backend", "group"),
)
def newton_level(win, pos0, org, ref, ref_valid, ref_mean, ref_sumsq, active,
                 wmask, bounds, threshold=0.001, max_iters=6,
                 size=13, backend="pallas", group=1):
    """Batched per-level Newton refinement. Returns (pos [F,2], status [F]).

    ``bounds`` [F,2]: the level's true (width, height) per lane.
    backend: "pallas" (TPU kernel), "interpret" (kernel in interpreter for
    host tests), "xla" (same math as plain XLA ops).
    """
    active = jnp.asarray(active, jnp.float32)
    bounds = jnp.asarray(bounds, jnp.float32)
    if backend == "xla":
        pos, status, _ = newton_window_steps(
            win, pos0, org, ref, ref_valid, ref_mean, ref_sumsq, active,
            wmask, bounds, float(threshold),
            int(max_iters), int(size), int(group),
        )
        return pos, status

    F = pos0.shape[0]
    S = int(size)
    WH, WW = win.shape[1], win.shape[2]
    kern = functools.partial(
        _kernel,
        threshold=float(threshold), max_iters=int(max_iters), size=S,
        group=int(group),
    )
    rstat = jnp.stack([ref_mean, ref_sumsq], -1)
    act2 = jnp.stack([active, active], -1)

    # block the lane axis: one whole-F program needs ~40MB of scoped VMEM
    # for the Newton body's temporaries (> the 16MB budget); 64-lane blocks
    # stay ~10MB and the grid pipelines block loads against compute
    bf = min(64, F)
    grid = (pl.cdiv(F, bf),)

    def at_f(i):
        return (i, 0, 0)

    pos, st = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((F, 2), jnp.float32),
            jax.ShapeDtypeStruct((F, 2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((bf, WH, WW), at_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, S, S), at_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, S, S), at_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bf, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((bf, 2), jnp.float32),
                        pltpu.VMEM((1, 2), jnp.float32)],
        interpret=(backend == "interpret"),
    )(win, pos0, org, ref, ref_valid, rstat, act2, wmask, bounds)
    return pos, st[:, 0]
