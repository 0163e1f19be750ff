"""Fused photometric-error kernel (Pallas TPU).

Computes the MonoDepth2 per-pixel photometric map in ONE VMEM pass:

    photo = α · mean_c(clip((1 − SSIM(a,b))/2, 0, 1)) + (1−α) · mean_c(|a−b|)

where SSIM uses the reference's 3×3 reflect-padded window
(reference ssim_loss.py:6-53 + MonoDepth2.py:130-151). The unfused jnp
composition materializes ~12 HBM intermediates (6 window sums × 2 moments);
the kernel keeps everything in VMEM — per-batch-item grid, whole image block
(loss-scale images are ≤ 192×640×3 ≈ 1.4 MB, well inside VMEM).

Backward is the ANALYTIC VJP — the gradient of the SSIM+L1 map is itself a
3×3-window composition (adjoint box filters on five cotangent planes), so
it runs as a second fused Pallas kernel on TPU (``_bwd_kernel``) instead of
replaying the unfused jnp composition, which re-materialized the ~12 HBM
intermediates. The batched jnp analytic VJP
(:func:`photometric_vjp_reference`) is the oracle and the off-TPU path;
both are tested against ``jax.vjp`` of the forward composition.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp


def photometric_map_reference(a: jnp.ndarray, b: jnp.ndarray, alpha: float,
                              C1: float, C2: float) -> jnp.ndarray:
    """Unfused jnp reference (oracle + fallback + backward)."""
    from ..models import losses as L

    l1 = jnp.mean(jnp.abs(a - b), axis=-1, keepdims=True)
    s = jnp.mean(L.ssim(a, b, C1, C2), axis=-1, keepdims=True)
    return alpha * s + (1.0 - alpha) * l1


def _pool9_plane(x, H: int, W: int):
    """3×3 reflect-padded mean on a [H, W] plane (slice composition —
    Mosaic-safe, no jnp.pad 'reflect')."""
    x = jnp.concatenate([x[1:2], x, x[H - 2 : H - 1]], axis=0)
    x = jnp.concatenate([x[:, 1:2], x, x[:, W - 2 : W - 1]], axis=1)
    acc = None
    for dy in range(3):
        for dx in range(3):
            piece = x[dy : dy + H, dx : dx + W]
            acc = piece if acc is None else acc + piece
    return acc / 9.0


def _pool9_adjoint_plane(u, H: int, W: int):
    """Adjoint of :func:`_pool9_plane`: zero-padded 3×3 correlation of the
    cotangent, then the reflect-pad adjoint folds the border contributions
    back onto rows/cols 1 and H−2/W−2."""
    zrow = jnp.zeros((2, W), u.dtype)
    zcol = jnp.zeros((H + 4, 2), u.dtype)
    up = jnp.concatenate([zrow, u, zrow], axis=0)
    up = jnp.concatenate([zcol, up, zcol], axis=1)  # [H+4, W+4]
    gxp = None
    for dy in range(3):
        for dx in range(3):
            piece = up[dy : dy + H + 2, dx : dx + W + 2]
            gxp = piece if gxp is None else gxp + piece
    gxp = gxp / 9.0  # [H+2, W+2]: cotangent of the reflect-padded array

    # fold the W padding (cols 0 / W+1 were copies of interior cols 1 / W−2)
    body = gxp[:, 1 : W + 1]
    col1 = body[:, 1:2] + gxp[:, 0:1]
    colw = body[:, W - 2 : W - 1] + gxp[:, W + 1 : W + 2]
    body = jnp.concatenate(
        [body[:, 0:1], col1, body[:, 2 : W - 2], colw, body[:, W - 1 : W]], axis=1
    )
    # fold the H padding
    out = body[1 : H + 1]
    row1 = out[1:2] + body[0:1]
    rowh = out[H - 2 : H - 1] + body[H + 1 : H + 2]
    return jnp.concatenate(
        [out[0:1], row1, out[2 : H - 2], rowh, out[H - 1 : H]], axis=0
    )


def _photo_vjp_plane(a, b, g, alpha: float, C1: float, C2: float, H: int, W: int):
    """Analytic (g_a, g_b) for one channel plane; ``g`` is the per-channel
    cotangent (the channel-mean factor already folded in by the caller)."""
    pool = lambda x: _pool9_plane(x, H, W)
    poolT = lambda x: _pool9_adjoint_plane(x, H, W)

    mu_a, mu_b = pool(a), pool(b)
    p_aa, p_bb, p_ab = pool(a * a), pool(b * b), pool(a * b)
    sig_a = p_aa - mu_a * mu_a
    sig_b = p_bb - mu_b * mu_b
    sig_ab = p_ab - mu_a * mu_b
    n1 = 2.0 * mu_a * mu_b + C1
    n2 = 2.0 * sig_ab + C2
    d1 = mu_a * mu_a + mu_b * mu_b + C1
    d2 = sig_a + sig_b + C2
    n = n1 * n2
    d = d1 * d2
    r = (1.0 - n / d) * 0.5
    in_range = ((r > 0.0) & (r < 1.0)).astype(a.dtype)

    g_sd = alpha * g * in_range
    g_ratio = -0.5 * g_sd
    g_n = g_ratio / d
    g_d = -g_ratio * n / (d * d)
    g_n1, g_n2 = g_n * n2, g_n * n1
    g_d1, g_d2 = g_d * d2, g_d * d1

    g_sig_ab = 2.0 * g_n2
    g_mu_a = 2.0 * mu_b * g_n1 + 2.0 * mu_a * g_d1 - 2.0 * mu_a * g_d2 - mu_b * g_sig_ab
    g_mu_b = 2.0 * mu_a * g_n1 + 2.0 * mu_b * g_d1 - 2.0 * mu_b * g_d2 - mu_a * g_sig_ab

    sgn = jnp.sign(a - b)
    l1_g = (1.0 - alpha) * g * sgn
    tp_ab = poolT(g_sig_ab)
    g_a = poolT(g_mu_a) + 2.0 * a * poolT(g_d2) + b * tp_ab + l1_g
    g_b = poolT(g_mu_b) + 2.0 * b * poolT(g_d2) + a * tp_ab - l1_g
    return g_a, g_b


def photometric_vjp_reference(a, b, g, alpha: float, C1: float, C2: float):
    """Batched analytic VJP (NHWC): cotangent ``g`` is [B,H,W,1] wrt the
    channel-mean output. Oracle + off-TPU backward path."""
    B, H, W, C = a.shape
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    gc = (g[..., 0] / C).astype(jnp.float32)  # per-channel cotangent

    gas, gbs = [], []
    for c in range(C):
        ga, gb = jax.vmap(
            lambda ap, bp, gp: _photo_vjp_plane(ap, bp, gp, alpha, C1, C2, H, W)
        )(a32[..., c], b32[..., c], gc)
        gas.append(ga)
        gbs.append(gb)
    g_a = jnp.stack(gas, axis=-1).astype(a.dtype)
    g_b = jnp.stack(gbs, axis=-1).astype(b.dtype)
    return g_a, g_b


def _bwd_kernel(a_ref, b_ref, g_ref, ga_ref, gb_ref, *, alpha, C1, C2, inv_c):
    """Fused analytic backward on a [1, 1, H, W] channel plane."""
    a = a_ref[0, 0].astype(jnp.float32)
    b = b_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32) * inv_c
    H, W = a.shape
    g_a, g_b = _photo_vjp_plane(a, b, g, alpha, C1, C2, H, W)
    ga_ref[0, 0] = g_a
    gb_ref[0, 0] = g_b


def _pallas_backward(a, b, g, alpha, C1, C2, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = a.shape
    a_cf = a.transpose(0, 3, 1, 2)
    b_cf = b.transpose(0, 3, 1, 2)
    g_cf = g.transpose(0, 3, 1, 2)  # [B, 1, H, W]
    kernel = functools.partial(
        _bwd_kernel, alpha=alpha, C1=C1, C2=C2, inv_c=1.0 / C
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    plane = pl.BlockSpec((1, 1, H, W), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM)
    gplane = pl.BlockSpec((1, 1, H, W), lambda i, c: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    ga, gb = pl.pallas_call(
        kernel,
        grid=(B, C),
        in_specs=[plane, plane, gplane],
        out_specs=[plane, plane],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(a_cf, b_cf, g_cf)
    return (
        ga.transpose(0, 2, 3, 1).astype(a.dtype),
        gb.transpose(0, 2, 3, 1).astype(b.dtype),
    )


def _kernel(a_ref, b_ref, out_ref, *, alpha: float, C1: float, C2: float):
    """Single-channel photometric contribution on a [1, H, W, 1] block.

    Per-(batch, channel) grid keeps VMEM residency at ~8 single-channel
    [H, W] f32 buffers (≈4 MB at 192×640) — the full-RGB variant overflowed
    the ~16 MB VMEM at the benchmark shape. Operands arrive [B, C, H, W]
    (Mosaic requires the trailing block dims to span the array dims)."""
    a = a_ref[0, 0].astype(jnp.float32)  # [H, W]
    b = b_ref[0, 0].astype(jnp.float32)
    H, W = a.shape

    def reflect_pad(x):
        # reflect by 1 on H and W using slices (no jnp.pad reflect in mosaic)
        x = jnp.concatenate([x[1:2], x, x[H - 2 : H - 1]], axis=0)
        return jnp.concatenate([x[:, 1:2], x, x[:, W - 2 : W - 1]], axis=1)

    def pool9(x):
        xp = reflect_pad(x)
        acc = None
        for dy in range(3):
            for dx in range(3):
                piece = xp[dy : dy + H, dx : dx + W]
                acc = piece if acc is None else acc + piece
        return acc / 9.0

    mu_a = pool9(a)
    mu_b = pool9(b)
    sig_a = pool9(a * a) - mu_a * mu_a
    sig_b = pool9(b * b) - mu_b * mu_b
    sig_ab = pool9(a * b) - mu_a * mu_b

    n = (2.0 * mu_a * mu_b + C1) * (2.0 * sig_ab + C2)
    d = (mu_a * mu_a + mu_b * mu_b + C1) * (sig_a + sig_b + C2)
    ssim_dist = jnp.clip((1.0 - n / d) * 0.5, 0.0, 1.0)

    out_ref[0, 0] = alpha * ssim_dist + (1.0 - alpha) * jnp.abs(a - b)


def _pallas_forward(a, b, alpha: float, C1: float, C2: float, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = a.shape
    a_cf = a.transpose(0, 3, 1, 2)  # [B, C, H, W]
    b_cf = b.transpose(0, 3, 1, 2)
    kernel = functools.partial(_kernel, alpha=alpha, C1=C1, C2=C2)
    kwargs = {}
    if not interpret:
        # the default Mosaic VMEM budget rejects the 192×640 plane; an
        # explicit 100 MB cap (v5e VMEM is large enough with pipelining)
        # compiles and matches the oracle at 1e-7
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    per_channel = pl.pallas_call(
        kernel,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, W), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, W), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(a_cf, b_cf)
    return jnp.mean(per_channel, axis=1)[..., None]  # [B, H, W, 1]


def _tiled_kernel(
    a_hbm, b_hbm, out_ref, a_t, a_up, a_dn, b_t, b_up, b_dn, sem,
    *, alpha, C1, C2, tile_h,
):
    """H-tiled variant with manual halo DMA: full arrays stay in HBM/ANY;
    each grid step DMAs its tile plus one 8-row block above and below and
    computes one output tile. Lifts the whole-plane VMEM limit that caps the
    fused kernel at ~1 MPix planes.

    Every DMA is 8-row aligned (Mosaic rejects unaligned sublane slices —
    the original (tile_h+2)-row halo window failed with 'Slice shape along
    dimension 2 must be aligned to tiling (8)'): with ``tile_h % 8 == 0``
    the tile slice is aligned, and the 1-row halos sit at STATIC offsets
    inside the aligned 8-row neighbor blocks (above-halo = row 7 of the
    block ending at the tile start; below-halo = row 0 of the block at the
    tile end). Image-boundary tiles reflect instead (rows 1 / H-2), matching
    the reference SSIM's reflection padding."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bi = pl.program_id(0)
    ci = pl.program_id(1)
    t = pl.program_id(2)
    n_tiles = pl.num_programs(2)
    H = a_hbm.shape[2]
    W = a_hbm.shape[3]

    tile0 = t * tile_h
    # express the neighbor-block starts as 8·(clamped block index) so Mosaic
    # can PROVE 8-divisibility (jnp.clip on the row offset is opaque to its
    # divisibility analysis: 'Failed to prove that a tile index ... is
    # divisible by the tiling')
    k = tile_h // 8
    up0 = 8 * jnp.maximum(k * t - 1, 0)
    dn0 = 8 * jnp.minimum(k * (t + 1), H // 8 - 1)

    copies = [
        pltpu.make_async_copy(a_hbm.at[bi, ci, pl.ds(tile0, tile_h), :], a_t, sem.at[0]),
        pltpu.make_async_copy(a_hbm.at[bi, ci, pl.ds(up0, 8), :], a_up, sem.at[1]),
        pltpu.make_async_copy(a_hbm.at[bi, ci, pl.ds(dn0, 8), :], a_dn, sem.at[2]),
        pltpu.make_async_copy(b_hbm.at[bi, ci, pl.ds(tile0, tile_h), :], b_t, sem.at[3]),
        pltpu.make_async_copy(b_hbm.at[bi, ci, pl.ds(up0, 8), :], b_up, sem.at[4]),
        pltpu.make_async_copy(b_hbm.at[bi, ci, pl.ds(dn0, 8), :], b_dn, sem.at[5]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    def compute(a_pad_rows, b_pad_rows):
        # a_pad_rows: [tile_h+2, W] rows (already halo'd); reflect-pad W
        def wpad(x):
            return jnp.concatenate([x[:, 1:2], x, x[:, W - 2 : W - 1]], axis=1)

        a = wpad(a_pad_rows.astype(jnp.float32))
        b = wpad(b_pad_rows.astype(jnp.float32))

        def pool9(x):
            acc = None
            for dy in range(3):
                for dx in range(3):
                    piece = x[dy : dy + tile_h, dx : dx + W]
                    acc = piece if acc is None else acc + piece
            return acc / 9.0

        mu_a = pool9(a)
        mu_b = pool9(b)
        sig_a = pool9(a * a) - mu_a * mu_a
        sig_b = pool9(b * b) - mu_b * mu_b
        sig_ab = pool9(a * b) - mu_a * mu_b
        n = (2.0 * mu_a * mu_b + C1) * (2.0 * sig_ab + C2)
        d = (mu_a * mu_a + mu_b * mu_b + C1) * (sig_a + sig_b + C2)
        ssim_dist = jnp.clip((1.0 - n / d) * 0.5, 0.0, 1.0)
        center_a = a[1 : 1 + tile_h, 1 : 1 + W]
        center_b = b[1 : 1 + tile_h, 1 : 1 + W]
        return alpha * ssim_dist + (1.0 - alpha) * jnp.abs(center_a - center_b)

    is_first = t == 0
    is_last = t == n_tiles - 1

    def padded(tile, up, dn):
        rows = tile[...]
        top = jnp.where(is_first, rows[1:2], up[7:8])  # reflect row 1 at t=0
        bot = jnp.where(is_last, rows[tile_h - 2 : tile_h - 1], dn[0:1])
        return jnp.concatenate([top, rows, bot], axis=0)

    out_ref[0, 0] = compute(padded(a_t, a_up, a_dn), padded(b_t, b_up, b_dn))


def _pallas_forward_tiled(a, b, alpha, C1, C2, tile_h: int = 32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = a.shape
    assert tile_h % 8 == 0 and H % tile_h == 0 and H >= 2 * tile_h
    a_cf = a.transpose(0, 3, 1, 2)
    b_cf = b.transpose(0, 3, 1, 2)
    kernel = functools.partial(
        _tiled_kernel, alpha=alpha, C1=C1, C2=C2, tile_h=tile_h
    )
    per_channel = pl.pallas_call(
        kernel,
        grid=(B, C, H // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_h, W), lambda i, c, t: (i, c, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h, W), a.dtype),
            pltpu.VMEM((8, W), a.dtype),
            pltpu.VMEM((8, W), a.dtype),
            pltpu.VMEM((tile_h, W), b.dtype),
            pltpu.VMEM((8, W), b.dtype),
            pltpu.VMEM((8, W), b.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )(a_cf, b_cf)
    return jnp.mean(per_channel, axis=1)[..., None]


# largest per-channel plane the whole-plane kernel handles with the raised
# 100 MB VMEM cap (192×640 verified on v5e; headroom to ~1 MPix)
_MAX_PIXELS_FUSED = 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def photometric_map_fused(a, b, alpha: float = 0.85, C1: float = 1e-4, C2: float = 9e-4):
    """Fused photometric map [B,H,W,1]; whole-plane kernel within the VMEM
    budget, H-tiled halo-DMA kernel above it (v5e-verified at 1e-7 up to
    768×1920 planes), jnp composition otherwise / off-TPU."""
    H, W = a.shape[1:3]
    if jax.default_backend() != "tpu":
        return photometric_map_reference(a, b, alpha, C1, C2)
    if H * W > _MAX_PIXELS_FUSED:
        # W must stay lane-aligned (hardware-verified at W multiples of 128;
        # unaligned lane dims may be rejected by Mosaic at compile time
        # rather than falling back)
        if H % 32 == 0 and H >= 64 and W % 128 == 0:
            return _pallas_forward_tiled(a, b, alpha, C1, C2, tile_h=32)
        return photometric_map_reference(a, b, alpha, C1, C2)
    return _pallas_forward(a, b, alpha, C1, C2)


def _fwd(a, b, alpha, C1, C2):
    return photometric_map_fused(a, b, alpha, C1, C2), (a, b)


def _bwd(alpha, C1, C2, residuals, g):
    a, b = residuals
    H, W = a.shape[1:3]
    if jax.default_backend() == "tpu" and H * W <= _MAX_PIXELS_FUSED:
        return _pallas_backward(a, b, g, alpha, C1, C2)
    return photometric_vjp_reference(a, b, g, alpha, C1, C2)


photometric_map_fused.defvjp(_fwd, _bwd)
