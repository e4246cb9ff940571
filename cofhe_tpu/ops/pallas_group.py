"""Pallas TPU kernels for the class-group hot loops.

The v2 compose kernel's dominant cost is the batched Bernstein-Yang divstep
xgcd (ops/xgcd2.py): ~185 while-loop iterations, each a dozen elementwise
passes over (batch, L) int32 limb arrays. Under plain XLA every pass is its
own HBM-roundtrip fusion; here the ENTIRE loop runs as one Pallas kernel
per 128-lane batch tile with all state resident in VMEM — the TPU
equivalent of the tight GMP mpn loops behind the reference's BICYCL nucomp
(/root/reference/include/x86_64/qfi.inl:1-135).

The kernel BODY reuses the exact pure-jnp implementation (xgcd2.xgcd_coeff_g
on values loaded from VMEM refs): every op in that path is Mosaic-lowerable
(elementwise int32/f32, limb-axis concats/shifts, log-depth associative
scans, max-reductions; the one gather was removed from limb.mag_cmp), so
the Pallas path is bit-identical to the XLA path by construction and is
validated against it in tests/test_pallas.py (interpret mode) and on real
hardware by the engine's decrypt spot checks.

Selection: OPT-IN only — JaxEngine passes use_pallas=env_enabled(False),
so this kernel runs only with COFHE_PALLAS=1. It is disabled by default
because it measured ~2x slower than the XLA while-loop at every VMEM tile
size tried (engine.py:79-88); kept as the foundation for larger fused
compose segments.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from . import xgcd2

try:  # pallas TPU backend is optional at import time (CPU test tier)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

TILE = int(os.environ.get("COFHE_PALLAS_TILE", "128"))


def env_enabled(default: bool) -> bool:
    v = os.environ.get("COFHE_PALLAS")
    if v is None:
        return default and HAVE_PALLAS
    return v not in ("0", "false", "no") and HAVE_PALLAS


# 256 lanes x 264 limbs: the loop body holds ~30 live (tile, L) int32
# temporaries on the Mosaic VMEM stack; 512 lanes measured 16.88M > the
# 16M scoped-vmem limit on v5e
MU_TILE = int(os.environ.get("COFHE_PALLAS_MU_TILE", "256"))


def env_enabled_mu(default: bool) -> bool:
    v = os.environ.get("COFHE_PALLAS_MU")
    if v is None:
        return default and HAVE_PALLAS
    return v not in ("0", "false", "no") and HAVE_PALLAS


def mod_topdown(x, m_mag, max_iters: int, tile: int = MU_TILE,
                interpret: bool = False):
    """Pallas drop-in for rl.mod_topdown (x mod m, signed redundant x,
    canonical m) with the ENTIRE estimated-digit while loop VMEM-resident
    per batch tile.

    Round-4 profile (one v5e, compose2 @8192): the XLA lowering of this
    loop materializes ~15 HBM passes per iteration (328 us/iter at width
    264 — 5x off the bandwidth roofline) and was 72% of compose2 device
    time. Keeping the (x, msh, m12sh) state in VMEM turns those into
    register/VMEM traffic; each tile's loop also early-exits on its own
    lanes instead of waiting for the whole batch's stragglers. (Contrast
    with the xgcd kernel above, where XLA already ran at roofline and the
    Pallas version measured ~2x slower.)

    The body reuses rl.mod_topdown verbatim on values loaded from VMEM, so
    it is bit-identical to the XLA path by construction."""
    from . import rl

    lead = x.shape[:-1]
    Lx = x.shape[-1]
    Lm = m_mag.shape[-1]
    x = x.reshape(-1, Lx)
    m_mag = jnp.broadcast_to(m_mag, lead + (Lm,)).reshape(-1, Lm)
    B = x.shape[0]
    Bp = -(-B // tile) * tile
    if Bp != B:
        padn = Bp - B
        x = jnp.concatenate(
            [x, jnp.zeros((padn, Lx), x.dtype)])
        one = jnp.zeros((padn, Lm), m_mag.dtype).at[:, 0].set(1)
        m_mag = jnp.concatenate([m_mag, one])

    def kernel(x_ref, m_ref, out_ref):
        out_ref[:] = rl.mod_topdown(x_ref[:], m_ref[:],
                                    max_iters=max_iters).astype(jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[pl.BlockSpec((tile, Lx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, Lm), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, Lx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Lx), jnp.int32),
        interpret=interpret,
    )(x.astype(jnp.int32), m_mag.astype(jnp.int32))
    return out[:B].reshape(lead + (Lx,))


def xgcd_coeff_g(f_mag, g_mag, m_mag, nbits: int, need_u: bool = False,
                 tile: int = TILE, interpret: bool = False):
    """Pallas-tiled drop-in for xgcd2.xgcd_coeff_g (same contract: f ODD,
    m | f0, returns canonical (d, cg[, cu]) with cg*g0 ≡ d (mod m)).

    Batch is padded to a tile multiple with (f=1, g=0, m=1) dummy rows whose
    loop exits immediately."""
    B, L = f_mag.shape
    nout = 3 if need_u else 2
    Bp = -(-B // tile) * tile
    if Bp != B:
        padn = Bp - B
        one = jnp.zeros((padn, L), f_mag.dtype).at[:, 0].set(1)
        zero = jnp.zeros((padn, L), f_mag.dtype)
        f_mag = jnp.concatenate([f_mag, one])
        g_mag = jnp.concatenate([g_mag, zero])
        m_mag = jnp.concatenate([m_mag, one])

    def kernel(f_ref, g_ref, m_ref, *out_refs):
        res = xgcd2.xgcd_coeff_g(f_ref[:], g_ref[:], m_ref[:], nbits,
                                 need_u=need_u)
        for ref, val in zip(out_refs, res):
            ref[:] = val.astype(jnp.int32)

    spec = pl.BlockSpec((tile, L), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[spec] * 3,
        out_specs=[spec] * nout,
        out_shape=[jax.ShapeDtypeStruct((Bp, L), jnp.int32)] * nout,
        interpret=interpret,
    )(f_mag.astype(jnp.int32), g_mag.astype(jnp.int32),
      m_mag.astype(jnp.int32))
    outs = [o[:B] for o in outs]
    return tuple(outs) if need_u else (outs[0], outs[1])
