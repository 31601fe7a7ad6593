"""Numpy replay of the backward-kernel math for the dumped NaN tiles.

Consumes /tmp/nan_tile_dump.npz (drill_nan.py) and recomputes the
per-batch backward chain in f64/f32, printing every intermediate at the
NaN lanes to identify the exact term that produces NaN on TPU.
"""
import numpy as np

TILE_WIDTH = 16
TILE_SIZE = 256
K = 512
COLOR_LO, COLOR_HI = -4.0, 4.0
COLOR_SCALE = 65535.0 / (COLOR_HI - COLOR_LO)
OPAC_SCALE = 65535.0
from brush_tpu.constants import ALPHA_EPS, ALPHA_MAX  # noqa: E402

d = np.load("/tmp/nan_tile_dump.npz")
nan_slots = np.load("/tmp/nan_slots.npy")

for i, t in enumerate(d["tiles"]):
    start, end, base = int(d["starts"][i]), int(d["ends"][i]), int(d["bases"][i])
    tid = int(d["tile_ids"][i])
    pk = d["packed_windows"][i]  # (8, 2K) u32 from base
    vout = d["vout"][i]          # (P, 4)
    log_t_final = d["log_t"][i][:, None]  # (P, 1)
    fidx = d["fidx"][i][:, None]
    gw = d["grads_windows"][i]
    print(f"\n=== tile {t} (id {tid}) range [{start},{end}) base {base}")

    slots = nan_slots[(nan_slots >= start) & (nan_slots < end)]
    lanes = slots - base
    print(f"NaN slots {slots} -> lanes {lanes}")

    # decode batch 0 (lanes 0..K)
    blk = pk[:, :K]
    f = lambda v: v.view(np.float32)
    m16 = np.uint32(0xFFFF)
    x = f(blk[0]); y = f(blk[1])
    cxx = f(blk[2]); cxy = f(blk[3]); cyy = f(blk[4])
    cr = (blk[5] & m16).astype(np.float32) / COLOR_SCALE + COLOR_LO
    cg = (blk[5] >> 16).astype(np.float32) / COLOR_SCALE + COLOR_LO
    cb = (blk[6] & m16).astype(np.float32) / COLOR_SCALE + COLOR_LO
    op = (blk[6] >> 16).astype(np.float32) / OPAC_SCALE

    for ln in lanes:
        print(f" lane {ln}: x={x[ln]:.6g} y={y[ln]:.6g} conic=({cxx[ln]:.6g},"
              f"{cxy[ln]:.6g},{cyy[ln]:.6g}) rgb=({cr[ln]:.3g},{cg[ln]:.3g},"
              f"{cb[ln]:.3g}) opac={op[ln]:.6g}")

    # pixel basis (cell 1x1): tile-local coords
    k = np.arange(TILE_SIZE)
    px = (k % TILE_WIDTH).astype(np.float64) + 0.5 - 8.0
    py = (k // TILE_WIDTH).astype(np.float64) + 0.5 - 8.0
    tiles_x = 50
    cx_t = (tid % tiles_x) * 16 + 8.0
    cy_t = (tid // tiles_x) * 16 + 8.0

    def run(dtype):
        X = (x - cx_t).astype(dtype); Y = (y - cy_t).astype(dtype)
        CXX, CXY, CYY = cxx.astype(dtype), cxy.astype(dtype), cyy.astype(dtype)
        PX, PY = px.astype(dtype)[:, None], py.astype(dtype)[:, None]
        # expanded rank-6 form, matching the kernel
        b0 = 0.5 * CXX; b1 = 0.5 * CYY; b2 = CXY
        b3 = -(CXX * X + CXY * Y); b4 = -(CXY * X + CYY * Y)
        b5 = 0.5 * (CXX * X * X + CYY * Y * Y) + CXY * X * Y
        sigma = (b0 * PX * PX + b1 * PY * PY + b2 * PX * PY
                 + b3 * PX + b4 * PY + b5)
        vis = np.exp(-sigma)
        alpha = np.minimum(ALPHA_MAX, op.astype(dtype) * vis)
        isect = base + np.arange(K)
        lane_ok = (isect >= start) & (isect < end)
        okm = (sigma >= 0.0) & (alpha >= ALPHA_EPS) & lane_ok
        alpha = np.where(okm, alpha, 0.0)
        act = (isect <= fidx) & (alpha > 0.0)
        m = np.log1p(-alpha) * act
        m_inc = np.cumsum(m, axis=1)
        m_tot = m_inc[:, -1:]
        log_t_after = log_t_final.astype(dtype) - (m_tot - m_inc)
        t_before = np.exp(log_t_after - m)
        fac = alpha * t_before * act
        cw = (vout[:, 0:1].astype(dtype) * cr + vout[:, 1:2].astype(dtype) * cg
              + vout[:, 2:3].astype(dtype) * cb)
        contrib = cw * fac
        c_inc = np.cumsum(contrib, axis=1)
        c_tot = c_inc[:, -1:]
        buffer_excl = c_tot - c_inc
        ra = 1.0 / (1.0 - alpha)
        t_fin = np.exp(log_t_final.astype(dtype))
        v_a = vout[:, 3:4].astype(dtype)
        v_alpha = act * (cw * t_before - buffer_excl * ra + t_fin * ra * v_a)
        v_sigma = -op.astype(dtype) * vis * v_alpha
        return dict(sigma=sigma, vis=vis, alpha=alpha, ok=okm, act=act,
                    t_before=t_before, v_alpha=v_alpha, v_sigma=v_sigma)

    for dt in (np.float32, np.float64):
        r = run(dt)
        print(f" dtype {dt.__name__}:")
        for ln in lanes:
            sg = r["sigma"][:, ln]
            print(f"  lane {ln}: sigma[min={sg.min():.6g} max={sg.max():.6g}] "
                  f"vis[max={r['vis'][:, ln].max():.6g}] "
                  f"alpha[max={r['alpha'][:, ln].max():.6g}] "
                  f"ok={r['ok'][:, ln].sum()} act={r['act'][:, ln].sum()} "
                  f"tb[max={r['t_before'][:, ln].max():.6g}] "
                  f"va[nan={np.isnan(r['v_alpha'][:, ln]).sum()}] "
                  f"vs[nan={np.isnan(r['v_sigma'][:, ln]).sum()}]")
        # any NaN anywhere in replay?
        print(f"  total v_sigma NaNs: {np.isnan(r['v_sigma']).sum()} "
              f"(lanes {np.unique(np.argwhere(np.isnan(r['v_sigma']))[:, 1])[:10]})")
    # actual kernel grads at those lanes
    for ln in lanes:
        print(f" kernel grads lane {ln}: {gw[:9, ln]}")
