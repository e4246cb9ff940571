"""Batched fixed-width big-integer arithmetic on limb arrays (JAX).

This is the TPU replacement for the reference's GMP layer (L0 in SURVEY.md):
where the reference calls BICYCL::Mpz / GMP mpn primitives on one number at a
time, here every operation acts on a whole batch of numbers at once as
`(batch..., L)` int32 arrays.

Representation
--------------
* A magnitude is `(..., L)` int32, little-endian base-2^16 limbs in
  [0, 2^16). A signed number is a pair `(sign, mag)` with `sign` int32 in
  {-1, 0, +1} of shape `(...,)`.
* "Redundant" intermediates carry arbitrary int32 limbs (|limb| < 2^31);
  `canonicalize` turns them back into sign-magnitude via carry scans.
* Multiplication splits limbs into 8-bit halves so the inner products ride
  the MXU as an int32 batched matmul in Toeplitz/convolution form (int8
  Pallas variant comes later; accumulations stay < 2^25 so they are exact).
* Long-division digits are estimated with float32 (mant, exp) surrogates and
  repaired with masked exact corrections; exact division by odd divisors is
  Hensel (LSB-first) and needs no estimation at all.

All shapes and trip counts are static: everything jits, vmaps and shards.
Overflow discipline: any product fed to int32 accumulation keeps one operand
<= 2^8 or 2^14 so that sums stay below 2^31.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BASE_BITS = 16
BASE = 1 << BASE_BITS
MASK = BASE - 1

# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------


def ints_to_limbs(values, L: int) -> np.ndarray:
    """Python ints -> (n, L) int32 magnitude limbs (host-side; one
    int.to_bytes per value, C-speed)."""
    n = len(values)
    buf = bytearray(n * L * 2)
    nb = L * 2
    for i, v in enumerate(values):
        a = abs(int(v))
        buf[i * nb:(i + 1) * nb] = a.to_bytes(nb, "little")  # raises if too big
    return np.frombuffer(bytes(buf), dtype="<u2").reshape(n, L).astype(np.int32)


def ints_to_signed(values, L: int):
    sign = np.array([(int(v) > 0) - (int(v) < 0) for v in values], dtype=np.int32)
    return sign, ints_to_limbs(values, L)


def limbs_to_ints(mag, sign=None) -> list[int]:
    mag = np.asarray(mag)
    flat = np.ascontiguousarray(mag.reshape(-1, mag.shape[-1]).astype("<u2"))
    nb = flat.shape[1] * 2
    raw = flat.tobytes()
    vals = [int.from_bytes(raw[i * nb:(i + 1) * nb], "little")
            for i in range(flat.shape[0])]
    if sign is not None:
        s = np.asarray(sign).reshape(-1)
        vals = [int(si) * v for si, v in zip(s, vals)]
    return vals


# ---------------------------------------------------------------------------
# carries / canonicalization
# ---------------------------------------------------------------------------


def _carry_scan(limbs):
    """Propagate carries LSB->MSB over redundant limbs. Returns
    (mag with limbs in [0, BASE), final carry of shape (...,))."""
    x = jnp.moveaxis(limbs, -1, 0)  # (L, ...)

    def step(carry, limb):
        t = limb + carry
        r = t & MASK
        c = t >> BASE_BITS  # arithmetic shift = floor division
        return c, r

    final_c, rows = jax.lax.scan(step, jnp.zeros(x.shape[1:], jnp.int32), x)
    return jnp.moveaxis(rows, 0, -1), final_c


def _negate_mag(mag):
    """Magnitude of (2^(16L) - mag); used to recover |value| when the carry
    scan reports a negative total."""
    neg, _ = _carry_scan(-mag)
    return neg


def canonicalize(limbs):
    """Redundant signed limbs -> (sign, mag). Requires |value| < 2^(16 L)."""
    mag, c = _carry_scan(limbs)
    is_neg = c < 0
    mag = jnp.where(is_neg[..., None], _negate_mag(mag), mag)
    nonzero = jnp.any(mag != 0, axis=-1)
    sign = jnp.where(is_neg, -1, 1) * nonzero.astype(jnp.int32)
    return sign, mag


def mag_is_zero(mag):
    return jnp.all(mag == 0, axis=-1)


def canonicalize_fast(limbs):
    """Log-depth canonicalization (Kogge-Stone carry resolve) of redundant
    signed limbs -> (sign, mag). Same contract as `canonicalize`
    (|value| < 2^(16 L)) but with O(log L) elementwise passes instead of an
    O(L) sequential scan — this is the TPU-friendly variant used inside hot
    loops.

    Stage 1: two elementwise carry passes bound every limb to [-1, 2^16).
    Stage 2: each limb's carry-out becomes a 3-state transfer function of
    its carry-in (in {-1,0,+1}); an associative prefix composition resolves
    all carries in log2(L) steps.
    """
    x = limbs
    Ll = x.shape[-1]
    for _ in range(2):
        c = x >> BASE_BITS
        r = x - (c << BASE_BITS)
        x = r + jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
        x = jnp.concatenate(
            [x[..., :Ll - 1],
             (x[..., Ll - 1] + (c[..., Ll - 1] << BASE_BITS))[..., None]],
            axis=-1)
    # top limb may still be big (guard-limb contract keeps it in int32 range)
    # limbs now in [-1, 2^16) except possibly the top; transfer functions:
    # T_i(c) = floor((x_i + c) / 2^16) for c in {-1, 0, +1}.
    # Hand-rolled Kogge-Stone prefix composition (Mosaic cannot lower
    # lax.associative_scan or negative static indices, and the unrolled
    # form is equivalent under XLA):
    om = (x - 1) >> BASE_BITS
    oz = x >> BASE_BITS
    op = (x + 1) >> BASE_BITS
    k = 1
    while k < Ll:
        def shift(v, fill):
            return jnp.concatenate(
                [jnp.full_like(v[..., :k], fill), v[..., :Ll - k]], axis=-1)

        sm, sz, sp = shift(om, -1), shift(oz, 0), shift(op, 1)

        def sel(idx, bm=om, bz=oz, bp=op):
            return jnp.where(idx < 0, bm, jnp.where(idx > 0, bp, bz))

        om, oz, op = sel(sm), sel(sz), sel(sp)
        k *= 2
    pz = oz
    # carry into limb i = prefix of limbs < i evaluated at initial carry 0
    carry_in = jnp.concatenate([jnp.zeros_like(pz[..., :1]), pz[..., :-1]], axis=-1)
    t = x + carry_in
    mag = t & MASK
    final_c = pz[..., Ll - 1]  # total carry out of the top limb
    is_neg = final_c < 0
    # negative: value = mag_part - 2^(16L); recompute magnitude = 2^(16L)-mag
    neg_mag = _negate_mag_fast(mag)
    mag = jnp.where(is_neg[..., None], neg_mag, mag)
    nonzero = jnp.any(mag != 0, axis=-1)
    sign = jnp.where(is_neg, -1, 1) * nonzero.astype(jnp.int32)
    return sign, mag


def _negate_mag_fast(mag):
    """2^(16L) - mag via complement + increment with log-depth carry."""
    comp = MASK - mag  # in [0, 2^16)
    # add 1 at limb 0: carry propagates through limbs equal to 2^16 - 1
    one0 = jnp.concatenate([jnp.ones_like(comp[..., :1]),
                            jnp.zeros_like(comp[..., 1:])], axis=-1)
    inc = comp + one0
    # single Kogge-Stone pass: carries are 0/1 only (hand-rolled prefix,
    # see canonicalize_fast)
    oz = inc >> BASE_BITS
    op = (inc + 1) >> BASE_BITS
    Ll = inc.shape[-1]
    k = 1
    while k < Ll:
        def shift(v, fill):
            return jnp.concatenate(
                [jnp.full_like(v[..., :k], fill), v[..., :Ll - k]], axis=-1)

        sz, sp = shift(oz, 0), shift(op, 1)

        def sel(idx, bz=oz, bp=op):
            return jnp.where(idx > 0, bp, bz)

        oz, op = sel(sz), sel(sp)
        k *= 2
    pz = oz
    carry_in = jnp.concatenate([jnp.zeros_like(pz[..., :1]), pz[..., :-1]], axis=-1)
    return (inc + carry_in) & MASK


def canonicalize_nonneg(limbs):
    """Canonical magnitude of a NONNEGATIVE redundant value (all limbs
    >= 0, < ~2^26): like canonicalize_fast but carries are {0, +1} after
    the bounding passes, so the prefix needs only a 2-state composition
    and no sign/negate handling (~40% cheaper; used by mag_mul, whose
    products are nonneg by construction)."""
    x = limbs
    Ll = x.shape[-1]
    for _ in range(2):
        c = x >> BASE_BITS
        r = x - (c << BASE_BITS)
        x = r + jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
        x = jnp.concatenate(
            [x[..., :Ll - 1],
             (x[..., Ll - 1] + (c[..., Ll - 1] << BASE_BITS))[..., None]],
            axis=-1)
    oz = x >> BASE_BITS
    op = (x + 1) >> BASE_BITS
    k = 1
    while k < Ll:
        def shift(v, fill):
            return jnp.concatenate(
                [jnp.full_like(v[..., :k], fill), v[..., :Ll - k]], axis=-1)

        sz, sp = shift(oz, 0), shift(op, 1)

        def sel(idx, bz=oz, bp=op):
            return jnp.where(idx > 0, bp, bz)

        oz, op = sel(sz), sel(sp)
        k *= 2
    carry_in = jnp.concatenate([jnp.zeros_like(oz[..., :1]), oz[..., :-1]],
                               axis=-1)
    return (x + carry_in) & MASK


def resize(mag, L: int):
    """Zero-pad (or truncate — caller must guarantee value-preserving) the
    limb axis to length L."""
    cur = mag.shape[-1]
    if cur == L:
        return mag
    if cur < L:
        pad = [(0, 0)] * (mag.ndim - 1) + [(0, L - cur)]
        return jnp.pad(mag, pad)
    return mag[..., :L]


# ---------------------------------------------------------------------------
# signed arithmetic
# ---------------------------------------------------------------------------


def sm_redundant(a):
    """Signed (sign, mag) -> redundant limbs with the sign folded in."""
    sign, mag = a
    return sign[..., None] * mag


def sm_add(a, b):
    sa, ma = a
    sb, mb = b
    L = max(ma.shape[-1], mb.shape[-1])
    return canonicalize_fast(sa[..., None] * resize(ma, L) + sb[..., None] * resize(mb, L))


def sm_sub(a, b):
    sb, mb = b
    return sm_add(a, (-sb, mb))


def sm_neg(a):
    s, m = a
    return -s, m


def sm_cmp(a, b):
    """sign(a - b) as (...,) int32."""
    s, _ = sm_sub(a, b)
    return s


def mag_cmp(ma, mb):
    """Lexicographic magnitude compare -> (...,) int32 in {-1, 0, 1}.
    Log-depth and GATHER-FREE (runs inside hot loop conditions and inside
    Pallas kernels): encode (limb index, diff sign) into one int and
    max-reduce — the highest differing limb dominates, its low bit is the
    sign."""
    L = max(ma.shape[-1], mb.shape[-1])
    d = resize(ma, L) - resize(mb, L)
    idx = jnp.arange(L, dtype=jnp.int32)
    enc = jnp.where(d != 0, 2 * idx + (d > 0), -1)
    best = jnp.max(enc, axis=-1)
    return jnp.where(best < 0, 0, jnp.where((best & 1) == 1, 1, -1))


# ---------------------------------------------------------------------------
# multiplication
# ---------------------------------------------------------------------------


def _to8(mag):
    """16-bit limbs (..., L) -> 8-bit limbs (..., 2L)."""
    lo = mag & 0xFF
    hi = (mag >> 8) & 0xFF
    return jnp.stack([lo, hi], axis=-1).reshape(*mag.shape[:-1], 2 * mag.shape[-1])


def _from8(x8):
    """8-bit limb vector (possibly redundant, values < 2^25) -> redundant
    16-bit limbs. Carry-aware recombination: (odd << 8) could overflow int32,
    so only the low byte of the odd limbs is shifted in; the rest moves one
    16-bit limb up."""
    L2 = x8.shape[-1]
    if L2 % 2:
        x8 = jnp.pad(x8, [(0, 0)] * (x8.ndim - 1) + [(0, 1)])
        L2 += 1
    x = x8.reshape(*x8.shape[:-1], L2 // 2, 2)
    even, odd = x[..., 0], x[..., 1]
    lo = even + ((odd & 0xFF) << 8)          # < 2^25 + 2^16
    hi_carry = odd >> 8                       # < 2^17, belongs one limb up
    return lo + jnp.concatenate(
        [jnp.zeros_like(hi_carry[..., :1]), hi_carry[..., :-1]], axis=-1)


_CONV_CHUNK = 256  # kernel chunk width: 255^2 * 256 < 2^24 keeps f32 exact


def _poly_mul8(a8, b8):
    """Exact per-batch polynomial product of 8-bit limb vectors via grouped
    (depthwise) convolution on the MXU: (B, n) x (B, m) -> (B, n+m-1) int32.

    f32 accumulation is exact because the kernel is chunked to <= 256 taps
    (255^2 * 256 < 2^24). No Toeplitz materialization — O(B*(n+m)) memory."""
    B, n = a8.shape
    m = b8.shape[-1]
    lhs = a8.astype(jnp.float32)[None]  # (1, B, n)  'NCH'
    out = jnp.zeros((B, n + m - 1), jnp.float32)
    for start in range(0, m, _CONV_CHUNK):
        mc = min(_CONV_CHUNK, m - start)
        kern = b8[:, start:start + mc].astype(jnp.float32)
        kern = jnp.flip(kern, axis=-1)[:, None, :]  # (B, 1, mc) 'OIH'
        res = jax.lax.conv_general_dilated(
            lhs, kern, window_strides=(1,), padding=[(mc - 1, mc - 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=B)[0]  # (B, n + mc - 1)
        out = out.at[:, start:start + n + mc - 1].add(res)
    return out.astype(jnp.int32)


def mag_mul(ma, mb, L_out: int | None = None):
    """Magnitude product via 8-bit grouped convolution. Output (..., L_out)."""
    La, Lb = ma.shape[-1], mb.shape[-1]
    if L_out is None:
        L_out = La + Lb
    a8 = _to8(ma)
    b8 = _to8(mb)
    lead = a8.shape[:-1]
    c8 = _poly_mul8(a8.reshape(-1, a8.shape[-1]), b8.reshape(-1, b8.shape[-1]))
    c8 = c8.reshape(*lead, c8.shape[-1])
    red16 = resize(_from8(c8), L_out)
    return canonicalize_nonneg(red16)


def mag_sqr(ma, L_out: int | None = None):
    return mag_mul(ma, ma, L_out)


def sm_mul(a, b, L_out: int | None = None):
    sa, ma = a
    sb, mb = b
    return sa * sb, mag_mul(ma, mb, L_out)


def sm_scalar_mul(a, scalar, L_out: int | None = None):
    """Signed value times per-element int32 scalar with |scalar| < 2^15."""
    s, m = a
    if L_out is not None:
        m = resize(m, L_out)
    red = m * jnp.abs(scalar)[..., None]  # < 2^31
    sgn, mag = canonicalize_fast(red)
    return sgn * s * jnp.sign(scalar), mag


# ---------------------------------------------------------------------------
# shifts
# ---------------------------------------------------------------------------


def mag_shl_limbs(mag, n: int, L_out: int | None = None):
    L = mag.shape[-1]
    if L_out is None:
        L_out = L + n
    pad = [(0, 0)] * (mag.ndim - 1) + [(n, max(0, L_out - L - n))]
    return jnp.pad(mag, pad)[..., :L_out]


def mag_shr_limbs(mag, n: int):
    return mag[..., n:]


def mag_shl_bits(mag, bits: int, L_out: int | None = None):
    limbs, rem = divmod(bits, BASE_BITS)
    x = mag_shl_limbs(mag, limbs, L_out)
    if rem == 0:
        return x
    _, mag2 = canonicalize_fast(x << rem)
    return mag2


def mag_shr_bits(mag, bits: int):
    limbs, rem = divmod(bits, BASE_BITS)
    x = mag_shr_limbs(mag, limbs) if limbs else mag
    if rem == 0:
        return x
    up = jnp.concatenate([x[..., 1:], jnp.zeros_like(x[..., :1])], axis=-1)
    return (x >> rem) | ((up << (BASE_BITS - rem)) & MASK)


def _shl_limbs_bin(mag, j):
    """Shift left by per-element j limbs (0 <= j < L), GATHER-FREE: binary
    decomposition of j into log2(L) masked static shifts (Pallas-lowerable;
    gathers along the limb axis are not)."""
    L = mag.shape[-1]
    out = mag
    sh = 1
    while sh < L:
        shifted = jnp.concatenate(
            [jnp.zeros_like(out[..., :sh]), out[..., :L - sh]], axis=-1)
        out = jnp.where(((j[..., None] & sh) != 0), shifted, out)
        sh <<= 1
    return out * (j[..., None] < L)


def _shr_limbs_bin(mag, j):
    """Shift right by per-element j limbs (0 <= j), gather-free."""
    L = mag.shape[-1]
    out = mag
    sh = 1
    while sh < L:
        shifted = jnp.concatenate(
            [out[..., sh:], jnp.zeros_like(out[..., :sh])], axis=-1)
        out = jnp.where(((j[..., None] & sh) != 0), shifted, out)
        sh <<= 1
    return out * (j[..., None] < L)


def mag_shl_bits_dyn(mag, bits):
    """Left shift by per-element dynamic bit count; caller guarantees the
    result fits the buffer."""
    limbs = bits // BASE_BITS
    rem = bits % BASE_BITS
    lo = _shl_limbs_bin(mag, limbs)
    dn = _shl_limbs_bin(mag, limbs + 1)
    r = rem[..., None]
    out = jnp.where(r == 0, lo, ((lo << r) & MASK) | (dn >> (BASE_BITS - r)))
    return out


def mag_shr_bits_dyn(mag, bits):
    """Right shift by per-element dynamic bit count (0 <= bits < 16*L);
    gather-free (binary limb shifts)."""
    limbs = bits // BASE_BITS
    rem = bits % BASE_BITS
    lo = _shr_limbs_bin(mag, limbs)
    up = _shr_limbs_bin(mag, limbs + 1)
    r = rem[..., None]
    return jnp.where(r == 0, lo, (lo >> r) | ((up << (BASE_BITS - r)) & MASK))


def mag_shl_limbs_dyn(mag, j, L_out: int):
    """Shift left by j limbs (j traced: scalar or per-batch), length L_out;
    gather-free."""
    j = jnp.asarray(j, jnp.int32)
    if j.ndim == 0:
        j = jnp.broadcast_to(j, mag.shape[:-1])
    return _shl_limbs_bin(resize(mag, L_out), j)


# ---------------------------------------------------------------------------
# bit length / float32 surrogates
# ---------------------------------------------------------------------------


def _limb_bitlen(limb):
    acc = jnp.zeros_like(limb)
    for j in range(BASE_BITS):
        acc = acc + (limb >= (1 << j)).astype(jnp.int32)
    return acc


def mag_bitlen(mag):
    """Bit length per element; 0 for zero."""
    L = mag.shape[-1]
    nz = mag != 0
    idx = jnp.arange(L, dtype=jnp.int32)
    top = jnp.max(jnp.where(nz, idx, -1), axis=-1)
    # one-hot select instead of gather (Pallas-lowerable)
    top_limb = jnp.sum(jnp.where(idx == top[..., None], mag, 0), axis=-1)
    return jnp.where(top < 0, 0, top * BASE_BITS + _limb_bitlen(top_limb))


def mag_float(mag):
    """value ~= mant * 2^exp with mant f32 built from the top 48 bits.
    Underestimates by < 2^-32 relative (truncation)."""
    L = mag.shape[-1]
    nz = mag != 0
    idx = jnp.arange(L, dtype=jnp.int32)
    top = jnp.clip(jnp.max(jnp.where(nz, idx, 0), axis=-1), 0, L - 1)
    d = top[..., None] - idx  # one-hot selects instead of gathers
    t0 = jnp.sum(jnp.where(d == 0, mag, 0), axis=-1)
    t1 = jnp.sum(jnp.where(d == 1, mag, 0), axis=-1)
    t2 = jnp.sum(jnp.where(d == 2, mag, 0), axis=-1)
    mant = (t0.astype(jnp.float32) * float(BASE) ** 2
            + t1.astype(jnp.float32) * float(BASE)
            + t2.astype(jnp.float32))
    exp = (top - 2) * BASE_BITS
    return mant, exp


def _div_digit_estimate(x_mant, x_exp, y_mant, y_exp, shift_bits):
    """Estimate floor(X / (Y * 2^shift_bits)), clamped to [0, 2^16 - 1]."""
    ratio = x_mant / jnp.maximum(y_mant, 1.0)
    e = (x_exp - y_exp - shift_bits).astype(jnp.float32)
    q = ratio * jnp.exp2(jnp.clip(e, -30.0, 17.0))
    return jnp.clip(q, 0.0, float(MASK)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# division
# ---------------------------------------------------------------------------


def mag_v2(mag):
    """2-adic valuation per element (trailing zero bits); 16*L for zero."""
    L = mag.shape[-1]
    nz = mag != 0
    idx = jnp.arange(L, dtype=jnp.int32)
    first = jnp.min(jnp.where(nz, idx, L), axis=-1)  # (...,)
    limb = jnp.sum(jnp.where(idx == first[..., None], mag, 0), axis=-1)
    tz = jnp.zeros_like(limb)
    done = jnp.zeros_like(limb, dtype=bool)
    for j in range(BASE_BITS):
        bit = (limb >> j) & 1
        done = done | (bit == 1)
        tz = tz + jnp.logical_not(done).astype(jnp.int32)
    return jnp.where(first >= L, L * BASE_BITS, first * BASE_BITS + tz)


def modinv16(y0):
    """Inverse of odd y0 modulo 2^16 (elementwise Newton)."""
    x = y0
    for _ in range(4):
        x = (x * (2 - y0 * x)) & MASK
    return x & MASK


def _shl8(mag, L: int):
    """Canonical magnitude of (mag << 8), length L."""
    m = resize(mag, L)
    _, out = canonicalize_fast(m << 8)
    return out


def mag_divexact_odd(x, y, L_out: int):
    """Exact division x / y for ODD y (Hensel, LSB-first); requires y | x.
    x, y magnitudes; returns (..., L_out) quotient magnitude."""
    Lx = x.shape[-1]
    yv = resize(y, Lx)
    y8 = _shl8(yv, Lx)  # y << 8, canonical
    yinv = modinv16(yv[..., 0])

    def step(rem, _):
        # rem: redundant limbs, |limb| < 2^26; value ≡ x / 2^(16*step) * ...
        d = ((rem[..., 0] & MASK) * yinv) & MASK  # value mod 2^16 times yinv
        d_lo = d & 0xFF
        d_hi = d >> 8
        sub = rem - d_lo[..., None] * yv - d_hi[..., None] * y8  # |limb| < 2^26
        # value(sub) ≡ 0 mod 2^16: fold limb0 upward, shift right one limb
        c0 = sub[..., 0] >> BASE_BITS  # limb0 value is a multiple of 2^16
        shifted = jnp.concatenate(
            [(sub[..., 1] + c0)[..., None], sub[..., 2:],
             jnp.zeros_like(sub[..., :1])], axis=-1)
        # partial carry pass to keep limbs bounded
        carry = shifted >> BASE_BITS
        shifted = (shifted & MASK) + jnp.concatenate(
            [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1)
        return shifted, d

    _, digits = jax.lax.scan(step, x, None, length=L_out)
    return jnp.moveaxis(digits, 0, -1)


def mag_divmod(x, y, Lq: int):
    """Schoolbook long division of magnitudes: (q, r) with x = q*y + r,
    0 <= r < y. Lq must satisfy 16*Lq >= bitlen(x) - bitlen(y) + 1 for every
    batch element. y must be nonzero."""
    Lx = x.shape[-1]
    yv = resize(y, Lx)
    y8 = _shl8(yv, Lx)
    y_mant, y_exp = mag_float(yv)
    y_bits = mag_bitlen(yv)

    def digit_step(rem_sm, j):
        sgn, rem = rem_sm  # invariant: sgn >= 0, rem < y * 2^(16*(j+1))
        yshift = mag_shl_limbs_dyn(yv, j, Lx)
        # y << 16j overflowing the buffer means the true shifted divisor
        # exceeds rem, so this digit must be 0 and no fixes may run (yshift
        # would be a truncated garbage value).
        ok = (y_bits + j * BASE_BITS) <= Lx * BASE_BITS
        x_mant, x_exp = mag_float(rem)
        qd = _div_digit_estimate(x_mant, x_exp, y_mant, y_exp, j * BASE_BITS)
        qd = jnp.where(ok, qd, 0)
        q_lo = qd & 0xFF
        q_hi = qd >> 8
        sub = q_lo[..., None] * yv + q_hi[..., None] * y8  # < 2^25
        sub_shifted = mag_shl_limbs_dyn(sub, j, Lx)
        s2, m2 = canonicalize_fast(sgn[..., None] * rem - sub_shifted)
        # fix down: while negative, qd -= 1, rem += y<<16j
        for _ in range(3):
            neg = (s2 < 0) & ok
            s2, m2 = canonicalize_fast(s2[..., None] * m2 + jnp.where(neg[..., None], yshift, 0))
            qd = qd - neg.astype(jnp.int32)
        # fix up: while rem >= y<<16j, qd += 1, rem -= y<<16j
        for _ in range(2):
            ge = (s2 > 0) & ok & (mag_cmp(m2, yshift) >= 0)
            s2, m2 = canonicalize_fast(s2[..., None] * m2 - jnp.where(ge[..., None], yshift, 0))
            qd = qd + ge.astype(jnp.int32)
        return (s2, m2), qd

    js = jnp.arange(Lq - 1, -1, -1, dtype=jnp.int32)
    init = (jnp.ones(x.shape[:-1], jnp.int32), x)
    (_, rem), digits = jax.lax.scan(digit_step, init, js)
    digits = jnp.moveaxis(digits, 0, -1)[..., ::-1]  # little-endian
    return digits, rem


def mag_mod(x, y, Lq: int):
    return mag_divmod(x, y, Lq)[1]
