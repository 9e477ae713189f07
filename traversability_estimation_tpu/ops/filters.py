"""The filter chain as fused, jit-compiled device compute (XLA path).

TPU-first re-design of the reference's per-cell iterator filters
(/root/reference/traversability_estimation_filters/src/{Slope,Step,Roughness}Filter.cpp
plus grid_map_filters' NormalVectorsFilter and MathExpressionFilter configured
in config/robot_filter_parameter.yaml). Instead of nested C++ loops with
per-cell Eigen solves, every window operation is a static-offset shifted
reduction over whole (rows, cols) planes, the 3x3 eigenproblem is solved in
closed form for all cells at once, and XLA fuses the lot into a handful of
kernels. NaN layers ("unknown") propagate exactly as in the reference.

Numerical design: the reference accumulates point moments in float64 over
ABSOLUTE map coordinates. On TPU we accumulate in float32 over LOCAL
coordinates (offsets from the center cell, elevation as-is) — mathematically
the same covariance/scatter matrices (shift invariance), but without the
catastrophic cancellation that absolute coordinates would cause in f32.

A Pallas fused-stencil version of this chain lives in ``ops.pallas_chain``;
this module is the reference device implementation and the fallback.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from traversability_estimation_tpu.grid.geometry import circle_offsets

Array = jnp.ndarray

# plain Python floats: jnp scalars here would become captured constants
# inside Pallas kernel bodies that reuse this module's compute
_NEG = float(np.float32(-3.0e38))
_POS = float(np.float32(3.0e38))


@dataclasses.dataclass(frozen=True)
class ChainConfig:
    """Static filter-chain parameters; names follow the reference YAML
    (config/robot_filter_parameter.yaml)."""

    resolution: float
    normals_radius: float = 0.05
    slope_critical_value: float = 1.0
    step_critical_value: float = 0.12
    step_first_window_radius: float = 0.04
    step_second_window_radius: float = 0.04
    step_critical_cell_number: int = 4
    roughness_critical_value: float = 0.05
    roughness_estimation_radius: float = 0.05
    # weighted fusion: traversability = sum(w * layer); default = reference's
    # MathExpressionFilter "(1/3)*(slope+step+roughness)"
    fusion_weights: Tuple[Tuple[str, float], ...] = (
        ("traversability_slope", 1.0 / 3.0),
        ("traversability_step", 1.0 / 3.0),
        ("traversability_roughness", 1.0 / 3.0),
    )
    # general MathExpressionFilter parity: an arithmetic expression over layer
    # names (e.g. "(1.0/3.0)*(traversability_slope + ...)"); overrides
    # fusion_weights when set
    fusion_expression: str = ""
    compute_roughness: bool = True


def _shifted(arr: Array, di: int, dj: int, fill) -> Array:
    """Value of arr at index (i+di, j+dj), `fill` outside (static offsets).

    Implemented as pad + static slice (not scatter) so it traces cleanly both
    under XLA and inside Pallas kernel bodies."""
    if arr.dtype == jnp.bool_:
        # Mosaic cannot pad/bitcast i1 vectors; shift a float mask instead
        f = _shifted(arr.astype(jnp.float32), di, dj, 1.0 if fill else 0.0)
        return f > 0.5
    rows, cols = arr.shape
    if abs(di) >= rows or abs(dj) >= cols:
        return jnp.full((rows, cols), fill, dtype=arr.dtype)
    padded = jnp.pad(
        arr,
        ((max(-di, 0), max(di, 0)), (max(-dj, 0), max(dj, 0))),
        constant_values=fill,
    )
    return padded[max(di, 0) : max(di, 0) + rows, max(dj, 0) : max(dj, 0) + cols]


# ---------------------------------------------------------------------------
# Closed-form symmetric 3x3 eigensolver (batched over the whole map)
# ---------------------------------------------------------------------------


def smallest_eigvec_planes(c00, c01, c02, c11, c12, c22, sweeps: int = 4):
    """Smallest-eigenpair of symmetric 3x3 matrices given as six coefficient
    PLANES (any common shape). Returns (vx, vy, vz, eig_min, eig_mid).

    Cyclic Jacobi, fixed schedule, fully branchless. Everything is expressed
    on scalar planes — no (..., 3, 3) stacking — which is both faster on the
    VPU and required for Mosaic (Pallas) lowering, whose vector layouts
    reject small trailing-dim concatenates. No matmuls (the TPU bf16 matmul
    default would stall convergence).

    Sweep count (measured, round 4): 3 sweeps match 4 on the golden map
    and pass the random-matrix accuracy gate, but the shallower polish
    leaves near-tie eigenvectors ~60 ulp more sensitive to compilation-
    dependent rounding — the fused-vs-unfused online-tick equivalence
    drifted past its 1e-6 gate on one cell. The ~5% op saving is not worth
    weakening cross-path agreement; 4 sweeps stays. 2 sweeps fail the
    golden gate outright (~6e-4 good-cell error).
    """
    a = {
        (0, 0): c00, (0, 1): c01, (0, 2): c02,
        (1, 1): c11, (1, 2): c12, (2, 2): c22,
    }
    one = jnp.ones_like(c00)
    zero = jnp.zeros_like(c00)
    v = {(i, j): (one if i == j else zero) for i in range(3) for j in range(3)}

    def A(i, j):
        return a[(i, j) if i <= j else (j, i)]

    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            k = 3 - p - q
            app, aqq, apq = A(p, p), A(q, q), A(p, q)
            apk, aqk = A(p, k), A(q, k)
            # tan(2 theta) = 2 apq / (aqq - app); stable branchless rotation
            tau = (aqq - app) / jnp.where(apq == 0.0, 1.0, 2.0 * apq)
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(tau == 0.0, 1.0, t)
            t = jnp.where(apq == 0.0, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            a[(p, p) if p <= p else (p, p)] = (
                c * c * app - 2.0 * s * c * apq + s * s * aqq
            )
            a[(q, q)] = s * s * app + 2.0 * s * c * apq + c * c * aqq
            a[(p, q) if p <= q else (q, p)] = zero
            new_pk = c * apk - s * aqk
            new_qk = s * apk + c * aqk
            a[(p, k) if p <= k else (k, p)] = new_pk
            a[(q, k) if q <= k else (k, q)] = new_qk
            for i in range(3):
                vip, viq = v[(i, p)], v[(i, q)]
                v[(i, p)] = c * vip - s * viq
                v[(i, q)] = s * vip + c * viq

    d0, d1, d2 = a[(0, 0)], a[(1, 1)], a[(2, 2)]
    is0 = (d0 <= d1) & (d0 <= d2)
    is1 = (~is0) & (d1 <= d2)
    eig_min = jnp.where(is0, d0, jnp.where(is1, d1, d2))
    eig_max = jnp.maximum(d0, jnp.maximum(d1, d2))
    eig_mid = d0 + d1 + d2 - eig_min - eig_max

    def pick(i):
        return jnp.where(is0, v[(i, 0)], jnp.where(is1, v[(i, 1)], v[(i, 2)]))

    return pick(0), pick(1), pick(2), eig_min, eig_mid


def smallest_eigpair_sym3(A: Array, sweeps: int = 4) -> Tuple[Array, Array, Array]:
    """Matrix-form wrapper over ``smallest_eigvec_planes`` for (..., 3, 3)
    inputs; returns (eig_min, eig_mid, v_min)."""
    vx, vy, vz, eig_min, eig_mid = smallest_eigvec_planes(
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
        A[..., 1, 1], A[..., 1, 2], A[..., 2, 2],
        sweeps=sweeps,
    )
    v = jnp.stack([vx, vy, vz], axis=-1)
    return eig_min, eig_mid, v


# ---------------------------------------------------------------------------
# Chain stages
# ---------------------------------------------------------------------------


def moment_planes(
    elevation: Array, resolution: float, radius: float
) -> Tuple[Array, ...]:
    """Windowed point moments in LOCAL coordinates, shared by the normals
    and roughness stages (identical when their radii match — the shipped
    config uses 0.05 m for both, so ``run_chain`` computes these once
    instead of relying on XLA to CSE two textually separate loops).

    Returns (n, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz)."""
    elev = elevation.astype(jnp.float32)
    valid = jnp.isfinite(elev)
    zf = jnp.where(valid, elev, 0.0)
    vf = valid.astype(jnp.float32)

    n = jnp.zeros_like(zf)
    sx = jnp.zeros_like(zf)
    sy = jnp.zeros_like(zf)
    sz = jnp.zeros_like(zf)
    sxx = jnp.zeros_like(zf)
    sxy = jnp.zeros_like(zf)
    sxz = jnp.zeros_like(zf)
    syy = jnp.zeros_like(zf)
    syz = jnp.zeros_like(zf)
    szz = jnp.zeros_like(zf)
    for di, dj in circle_offsets(radius, resolution).tolist():
        # neighbor local coordinates: grid_map x decreases with row index
        dx = jnp.float32(-di * resolution)
        dy = jnp.float32(-dj * resolution)
        v = _shifted(vf, di, dj, 0.0)
        # elevation relative to the center cell: shift-invariant moments that
        # stay well-conditioned in float32 at any absolute altitude
        z = _shifted(zf, di, dj, 0.0) - zf * v
        n = n + v
        sx = sx + v * dx
        sy = sy + v * dy
        sz = sz + z
        sxx = sxx + v * dx * dx
        sxy = sxy + v * dx * dy
        sxz = sxz + z * dx
        syy = syy + v * dy * dy
        syz = syz + z * dy
        szz = szz + z * z
    return n, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz


def surface_normals(
    elevation: Array, resolution: float, radius: float,
    moments: Optional[Tuple[Array, ...]] = None,
) -> Dict[str, Array]:
    """PCA surface normals over a circular window (NormalVectorsFilter 'area').

    NaN where the center cell's elevation is invalid. Degenerate windows
    (second eigenvalue <= 1e-8) take the +z axis, matching the reference
    dependency's guard. `moments` short-circuits the window accumulation
    with precomputed ``moment_planes`` (must be for the same radius).
    """
    elev = elevation.astype(jnp.float32)
    valid = jnp.isfinite(elev)
    if moments is None:
        moments = moment_planes(elevation, resolution, radius)
    n, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz = moments

    ns = jnp.maximum(n, 1.0)
    mx, my, mz = sx / ns, sy / ns, sz / ns
    vx, vy, vz, _, eig_mid = smallest_eigvec_planes(
        sxx / ns - mx * mx,
        sxy / ns - mx * my,
        sxz / ns - mx * mz,
        syy / ns - my * my,
        syz / ns - my * mz,
        szz / ns - mz * mz,
    )
    degenerate = eig_mid <= 1e-8
    vx = jnp.where(degenerate, 0.0, vx)
    vy = jnp.where(degenerate, 0.0, vy)
    vz = jnp.where(degenerate, 1.0, vz)
    flip = vz < 0.0
    vx = jnp.where(flip, -vx, vx)
    vy = jnp.where(flip, -vy, vy)
    vz = jnp.where(flip, -vz, vz)
    nan = jnp.float32(jnp.nan)
    return {
        "surface_normal_x": jnp.where(valid, vx, nan),
        "surface_normal_y": jnp.where(valid, vy, nan),
        "surface_normal_z": jnp.where(valid, vz, nan),
    }


def _acos(x: Array) -> Array:
    """acos from scratch — Mosaic (Pallas TPU) implements neither acos nor
    atan2. 7-term minimax polynomial (Abramowitz & Stegun 4.4.46 form),
    |error| <= 2e-8 rad — below f32 resolution. Branchless sign handling:
    acos(-x) = pi - acos(x). NaN propagates."""
    y = jnp.abs(x)
    p = jnp.float32(-0.0012624911)
    for c in (
        0.0066700901,
        -0.0170881256,
        0.0308918810,
        -0.0501743046,
        0.0889789874,
        -0.2145988016,
        1.5707963050,
    ):
        p = p * y + jnp.float32(c)
    r = jnp.sqrt(jnp.maximum(1.0 - y, 0.0)) * p
    return jnp.where(x < 0.0, jnp.float32(np.pi) - r, r)


def slope_from_normals(normal_z: Array, critical_value: float) -> Array:
    """SlopeFilter formula: 1 - acos(nz)/critical, clamped to 0; NaN kept."""
    nz = normal_z
    slope = _acos(jnp.clip(nz, -1.0, 1.0))
    out = jnp.where(slope < critical_value, 1.0 - slope / critical_value, 0.0)
    return jnp.where(jnp.isfinite(nz), out, jnp.nan).astype(jnp.float32)


def step_layer(
    elevation: Array,
    resolution: float,
    critical_value: float,
    first_window_radius: float,
    second_window_radius: float,
    critical_cell_number: int,
) -> Array:
    """StepFilter: windowed (max-min), then windowed max/count mixing.

    Validity is DERIVED from the +/-3e38 sentinel encodings instead of
    shifting separate validity planes (bit-identical for any physical
    elevation: a window with no valid cell leaves the running max at the
    sentinel, so ``hmax > 0.5 * _NEG`` is exactly the old OR of shifted
    validity masks). 25 plane shifts -> 15; measured fastest of three
    variants and bit-exact on the chip (ABLATE_last.json E3)."""
    elev = elevation.astype(jnp.float32)
    valid = jnp.isfinite(elev)
    zmax_in = jnp.where(valid, elev, _NEG)
    zmin_in = jnp.where(valid, elev, _POS)

    hmax = jnp.full_like(elev, _NEG)
    hmin = jnp.full_like(elev, _POS)
    for di, dj in circle_offsets(first_window_radius, resolution).tolist():
        hmax = jnp.maximum(hmax, _shifted(zmax_in, di, dj, _NEG))
        hmin = jnp.minimum(hmin, _shifted(zmin_in, di, dj, _POS))
    any1 = hmax > 0.5 * _NEG  # some valid neighbor iff hmax left the sentinel
    step_height = jnp.where(valid & any1, hmax - hmin, jnp.nan)

    sh_max_in = jnp.where(jnp.isfinite(step_height), step_height, _NEG)
    smax_raw = jnp.full_like(elev, _NEG)
    ncrit = jnp.zeros_like(elev)
    for di, dj in circle_offsets(second_window_radius, resolution).tolist():
        shn = _shifted(sh_max_in, di, dj, _NEG)
        smax_raw = jnp.maximum(smax_raw, shn)
        ncrit = ncrit + jnp.where(shn > critical_value, 1.0, 0.0)
    any2 = smax_raw > 0.5 * _NEG
    # valid step heights are >= 0, so clamping the sentinel to 0 reproduces
    # the old "invalid neighbors contribute 0 to the max" exactly
    smax = jnp.maximum(smax_raw, 0.0)
    step = jnp.minimum(smax, ncrit / float(critical_cell_number) * smax)
    out = jnp.where(step < critical_value, 1.0 - step / critical_value, 0.0)
    return jnp.where(any2, out, jnp.nan).astype(jnp.float32)


def roughness_layer(
    elevation: Array,
    normals: Dict[str, Array],
    resolution: float,
    critical_value: float,
    estimation_radius: float,
    moments: Optional[Tuple[Array, ...]] = None,
) -> Array:
    """RoughnessFilter: std of distances to the center cell's tangent plane.

    `moments` short-circuits the window accumulation with precomputed
    ``moment_planes`` for the same radius (shared with the normals stage
    when the radii match)."""
    if moments is None:
        moments = moment_planes(elevation, resolution, estimation_radius)
    n, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz = moments

    nx = normals["surface_normal_x"]
    ny = normals["surface_normal_y"]
    nz = normals["surface_normal_z"]
    has_normal = jnp.isfinite(nx)
    nx0 = jnp.where(has_normal, nx, 0.0)
    ny0 = jnp.where(has_normal, ny, 0.0)
    nz0 = jnp.where(has_normal, nz, 0.0)

    ns = jnp.maximum(n, 1.0)
    mx, my, mz = sx / ns, sy / ns, sz / ns
    # scatter matrix S = sum (q - mean)(q - mean)^T ; quad = n^T S n
    cxx = sxx - n * mx * mx
    cxy = sxy - n * mx * my
    cxz = sxz - n * mx * mz
    cyy = syy - n * my * my
    cyz = syz - n * my * mz
    czz = szz - n * mz * mz
    quad = (
        nx0 * (cxx * nx0 + cxy * ny0 + cxz * nz0)
        + ny0 * (cxy * nx0 + cyy * ny0 + cyz * nz0)
        + nz0 * (cxz * nx0 + cyz * ny0 + czz * nz0)
    )
    quad = jnp.maximum(quad, 0.0)
    denom = n - 1.0
    roughness = jnp.sqrt(quad / jnp.where(denom > 0.0, denom, jnp.nan))
    out = jnp.where(roughness < critical_value, 1.0 - roughness / critical_value, 0.0)
    return jnp.where(has_normal, out, jnp.nan).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Full chain
# ---------------------------------------------------------------------------


def run_chain(elevation: Array, config: ChainConfig) -> Dict[str, Array]:
    """Elevation -> all traversability layers (one traced computation).

    Equivalent of filter_chain_.update(...) at
    /root/reference/traversability_estimation/src/TraversabilityMap.cpp:214
    with the default chain; the DeletionFilter stage is a no-op here because
    normals never leave the traced computation unless requested.
    """
    shared = (
        moment_planes(elevation, config.resolution, config.normals_radius)
        if config.compute_roughness
        and config.roughness_estimation_radius == config.normals_radius
        else None
    )
    normals = surface_normals(
        elevation, config.resolution, config.normals_radius, moments=shared
    )
    out: Dict[str, Array] = {}
    out["traversability_slope"] = slope_from_normals(
        normals["surface_normal_z"], config.slope_critical_value
    )
    out["traversability_step"] = step_layer(
        elevation,
        config.resolution,
        config.step_critical_value,
        config.step_first_window_radius,
        config.step_second_window_radius,
        config.step_critical_cell_number,
    )
    if config.compute_roughness:
        out["traversability_roughness"] = roughness_layer(
            elevation,
            normals,
            config.resolution,
            config.roughness_critical_value,
            config.roughness_estimation_radius,
            moments=shared,
        )
    if config.fusion_expression:
        # MathExpressionFilter parity: arithmetic over layer-name variables,
        # compiled by the safe expression compiler (ops/expr.py — no eval)
        from traversability_estimation_tpu.ops import expr as expr_mod

        fused = expr_mod.evaluate(expr_mod.parse(config.fusion_expression), out)
    else:
        fused = jnp.zeros_like(out["traversability_slope"])
        for layer, w in config.fusion_weights:
            if layer in out:
                fused = fused + jnp.float32(w) * out[layer]
    out["traversability"] = fused.astype(jnp.float32)
    return out


@partial(jax.jit, static_argnums=(1,))
def run_chain_jit(elevation: Array, config: ChainConfig) -> Dict[str, Array]:
    """Jitted chain; `config` is static (hashable dataclass) so each distinct
    configuration compiles exactly once."""
    return run_chain(elevation, config)
