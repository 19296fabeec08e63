"""Double-float (pair) arithmetic namespace for element physics.

The fused kernel's compensated residual evaluation (res(q_hi) + Jq q_lo)
removes the error from representing q in float32, but the rounding *inside*
the element physics (exp/tanh chains, catastrophic row cancellations) still
floors the residual near 1e-7 of the largest internal term.  Near a
condition-number spike of the Newton Jacobian, that noise floor is amplified
by cond(J) into the solution: z acquires errors along the near-null
direction that no residual criterion can see (measured: -50 dB output
excursions at pot end-stops, and marginal lanes "walking" off the solution
when extra polish steps re-amplify fresh noise).

This module evaluates the SAME element functions in double-float: every
value is an unevaluated (hi, lo) float32 pair carrying ~48 bits of
significand, built from error-free transforms (TwoSum / Dekker TwoProd --
no FMA required, so it maps 1:1 onto the TPU VPU inside Pallas kernels).
:class:`DF` mimics enough of the ndarray surface (shape/dtype/indexing/
arithmetic) that the element library's ``fn(xp, q)`` physics runs unchanged
with ``xp = acme_tpu.ops.dfmath`` and ``q`` a :class:`DF`.

The residual floor drops from ~1e-7 to ~1e-14 of the internal term scale,
so even cond ~ 1e5 Jacobians resolve z to float32 representation accuracy.

Everything here traces to plain float32 jnp ops: usable inside Pallas
kernels, jit, vmap, and on CPU for tests.
"""

from __future__ import annotations

import math

import jax.lax
import jax.numpy as jnp

float32 = jnp.float32


def _exp2_exact(k):
    """Exact 2**k for integer-valued float32 k in [-126, 126] (bit-level;
    jnp.exp2 is NOT exact -- measured up to 100% off at range edges)."""
    ki = jnp.clip(k, -126.0, 126.0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)


# -- error-free transforms ---------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def _split(a):
    # Operand bound: |a| must stay below 2^126/4097 (~8.3e34) -- the 4097*a
    # scaling otherwise overflows to inf and the product EFTs NaN where
    # plain f32 would survive.  Element physics respects this by clamping
    # exp arguments at 80 (exp(80) ~ 5.5e34); new element code introducing
    # larger magnitudes must rescale before entering df arithmetic.
    c = 4097.0 * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _renorm(hi, lo):
    return _quick_two_sum(hi, lo)


# -- the DF pair -------------------------------------------------------------

def _const(c):
    """Split a Python float into an exact (hi, lo) float32 pair."""
    import numpy as np
    hi = np.float32(c)
    lo = np.float32(float(c) - float(hi))
    return float(hi), float(lo)


class DF:
    """An array-of-double-float: two float32 jnp arrays (hi, lo) with
    value hi + lo, |lo| <= ulp(hi)/2."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo=None):
        self.hi = hi
        self.lo = jnp.zeros_like(hi) if lo is None else lo

    # ndarray mimicry used by the element library / composition
    @property
    def shape(self):
        return self.hi.shape

    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def ndim(self):
        return self.hi.ndim

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])

    def value(self):
        """Collapse to a single float32 array (correctly rounded-ish)."""
        return self.hi + self.lo

    # -- arithmetic ----------------------------------------------------------
    def _coerce(self, other):
        if isinstance(other, DF):
            return other
        if isinstance(other, (int, float)):
            hi, lo = _const(other)
            z = jnp.zeros_like(self.hi)
            return DF(z + hi, z + lo)
        return DF(jnp.asarray(other, self.hi.dtype))

    def __add__(self, other):
        o = self._coerce(other)
        s, e = _two_sum(self.hi, o.hi)
        e = e + (self.lo + o.lo)
        return DF(*_renorm(s, e))

    __radd__ = __add__

    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __sub__(self, other):
        return self + (-self._coerce(other))

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        o = self._coerce(other)
        p, e = _two_prod(self.hi, o.hi)
        e = e + (self.hi * o.lo + self.lo * o.hi)
        return DF(*_renorm(p, e))

    __rmul__ = __mul__

    def __truediv__(self, other):
        o = self._coerce(other)
        q0 = self.hi / o.hi
        # one Newton correction: q = q0 + (a - b q0) / b
        p, e = _two_prod(q0, o.hi)
        r = ((self.hi - p) - e) + self.lo - q0 * o.lo
        return DF(*_renorm(q0, r / o.hi))

    def __rtruediv__(self, other):
        return self._coerce(other) / self

    def __pow__(self, n):
        if not isinstance(n, int) or n < 0:
            raise NotImplementedError("DF.__pow__ supports non-negative ints")
        out = None
        base = self
        k = n
        while k:
            if k & 1:
                out = base if out is None else out * base
            base = base * base
            k >>= 1
        if out is None:
            return DF(jnp.ones_like(self.hi))
        return out

    # comparisons decide branches: the hi part is plenty
    def __lt__(self, other):
        o = self._coerce(other)
        return (self.hi + self.lo) < (o.hi + o.lo)

    def __le__(self, other):
        o = self._coerce(other)
        return (self.hi + self.lo) <= (o.hi + o.lo)

    def __gt__(self, other):
        o = self._coerce(other)
        return (self.hi + self.lo) > (o.hi + o.lo)

    def __ge__(self, other):
        o = self._coerce(other)
        return (self.hi + self.lo) >= (o.hi + o.lo)

    def __repr__(self):
        return f"DF(hi={self.hi!r}, lo={self.lo!r})"


def _as_df(x, like=None):
    if isinstance(x, DF):
        return x
    if isinstance(x, (int, float)) and like is not None:
        hi, lo = _const(x)
        z = jnp.zeros_like(like.hi)
        return DF(z + hi, z + lo)
    return DF(jnp.asarray(x, float32))


# -- namespace functions (the xp surface used by elements.py/circuit.py) -----

def stack(parts, axis=0):
    parts = [p if isinstance(p, DF) else _as_df(p) for p in parts]
    return DF(jnp.stack([p.hi for p in parts], axis=axis),
              jnp.stack([p.lo for p in parts], axis=axis))


def concatenate(parts, axis=0):
    parts = [p if isinstance(p, DF) else _as_df(p) for p in parts]
    return DF(jnp.concatenate([p.hi for p in parts], axis=axis),
              jnp.concatenate([p.lo for p in parts], axis=axis))


def zeros(shape, dtype=float32):
    z = jnp.zeros(shape, float32)
    return DF(z, z)


def zeros_like(x):
    z = jnp.zeros_like(x.hi if isinstance(x, DF) else x)
    return DF(z, z)


def ones_like(x):
    h = x.hi if isinstance(x, DF) else x
    return DF(jnp.ones_like(h), jnp.zeros_like(h))


def full_like(x, v):
    h = x.hi if isinstance(x, DF) else x
    hi, lo = _const(float(v))
    return DF(jnp.full_like(h, hi), jnp.full_like(h, lo))


def where(c, a, b):
    if not isinstance(a, DF) and not isinstance(b, DF):
        return jnp.where(c, a, b)
    like = a if isinstance(a, DF) else b
    a = _as_df(a, like)
    b = _as_df(b, like)
    return DF(jnp.where(c, a.hi, b.hi), jnp.where(c, a.lo, b.lo))


def sign(x):
    if isinstance(x, DF):
        return DF(jnp.sign(x.hi + x.lo))
    return jnp.sign(x)


def abs(x):  # noqa: A001 - mirrors the numpy namespace
    if isinstance(x, DF):
        neg = (x.hi + x.lo) < 0
        return DF(jnp.where(neg, -x.hi, x.hi), jnp.where(neg, -x.lo, x.lo))
    return jnp.abs(x)


def minimum(a, b):
    if isinstance(a, DF) or isinstance(b, DF):
        like = a if isinstance(a, DF) else b
        a = _as_df(a, like)
        b = _as_df(b, like)
        take_a = (a.hi + a.lo) <= (b.hi + b.lo)
        return DF(jnp.where(take_a, a.hi, b.hi),
                  jnp.where(take_a, a.lo, b.lo))
    return jnp.minimum(a, b)


def maximum(a, b):
    if isinstance(a, DF) or isinstance(b, DF):
        like = a if isinstance(a, DF) else b
        a = _as_df(a, like)
        b = _as_df(b, like)
        take_a = (a.hi + a.lo) >= (b.hi + b.lo)
        return DF(jnp.where(take_a, a.hi, b.hi),
                  jnp.where(take_a, a.lo, b.lo))
    return jnp.maximum(a, b)


def logical_and(a, b):
    return jnp.logical_and(a, b)


def logical_not(a):
    return jnp.logical_not(a)


def isfinite(x):
    if isinstance(x, DF):
        return jnp.isfinite(x.hi) & jnp.isfinite(x.lo)
    return jnp.isfinite(x)


# -- transcendentals ---------------------------------------------------------

_LN2 = _const(0.6931471805599453)
_INV_LN2 = 1.4426950408889634
# Taylor 1/k! for exp on |r| <= ln2/2; degree 12 puts the truncation tail
# (0.347^13/13!) below 2e-16 relative
_EXP_COEFFS = [_const(1.0 / math.factorial(k)) for k in range(13)]


def _poly_exp(r):
    """exp(r) for |r| <= ln2/2, in df (Horner with split f64 coefficients)."""
    acc = DF(jnp.zeros_like(r.hi) + _EXP_COEFFS[-1][0],
             jnp.zeros_like(r.hi) + _EXP_COEFFS[-1][1])
    for c_hi, c_lo in reversed(_EXP_COEFFS[:-1]):
        acc = acc * r
        s, e = _two_sum(acc.hi, c_hi)
        acc = DF(*_renorm(s, e + (acc.lo + c_lo)))
    return acc


def _exp_reduced(x):
    """Range-reduce and return (exp(r) df, k) with x = k ln2 + r."""
    xv = x.hi + x.lo
    k = jnp.round(xv * _INV_LN2)
    # r = x - k*ln2 in df (k exact in f32 for |k| <= 2^23)
    p1, e1 = _two_prod(k, jnp.float32(_LN2[0]))
    r_hi, r_e = _two_sum(x.hi, -p1)
    r_lo = r_e + x.lo - e1 - k * _LN2[1]
    r = DF(*_renorm(r_hi, r_lo))
    return _poly_exp(r), k


def exp(x):
    if not isinstance(x, DF):
        return jnp.exp(x)
    # clamp at +-87 (f32 exp range; callers clamp at 80 already)
    xc = minimum(x, 87.0)
    xc = maximum(xc, -87.0)
    p, k = _exp_reduced(xc)
    s = _exp2_exact(k)
    return DF(p.hi * s, p.lo * s)


def expm1(x):
    if not isinstance(x, DF):
        return jnp.expm1(x)
    xc = minimum(x, 87.0)
    xc = maximum(xc, -87.0)
    p, k = _exp_reduced(xc)
    s = _exp2_exact(k)
    # k != 0: exp - 1 loses nothing (exp far from 1); k == 0: subtract the
    # leading 1 exactly from the polynomial
    scaled = DF(*_renorm(p.hi * s, p.lo * s))
    big = scaled - 1.0
    small = DF(*_renorm(p.hi - 1.0, p.lo))
    return where(k == 0, small, big)


def tanh(x):
    if not isinstance(x, DF):
        return jnp.tanh(x)
    a = abs(x)
    em = expm1(DF(-2.0 * a.hi, -2.0 * a.lo))  # in [-1, 0]
    t = (-em) / (em + 2.0)
    sgn = jnp.sign(x.hi + x.lo)
    return DF(t.hi * sgn, t.lo * sgn)


def sqrt(x):
    if not isinstance(x, DF):
        return jnp.sqrt(x)
    s = jnp.sqrt(x.hi)
    # one df Newton step: s + (x - s^2) / (2 s); guard the s == 0 input
    # (exactly-zero x) where the correction would be 0/0 -> NaN
    p, e = _two_prod(s, s)
    r = ((x.hi - p) - e) + x.lo
    corr = jnp.where(s > 0, r / jnp.where(s > 0, 2.0 * s, 1.0),
                     jnp.zeros_like(s))
    return DF(*_renorm(s, corr))
