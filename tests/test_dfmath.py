"""Double-float arithmetic accuracy (the fused kernel's polish backbone).

The production kernel configuration (df polish + homotopy + df rescue) is
too large for interpret-mode CI; its accuracy-critical substrate -- the
double-float namespace that the element physics runs on -- is validated
here directly against float64, including a full element-function
evaluation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import acme_tpu.ops.dfmath as dfm


def df_of(x64):
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return dfm.DF(jnp.asarray(hi), jnp.asarray(lo))


def relerr(df, truth):
    got = np.asarray(df.hi, np.float64) + np.asarray(df.lo, np.float64)
    return np.max(np.abs(got - truth) / np.maximum(np.abs(truth), 1e-30))


RNG = np.random.default_rng(7)


def test_df_arithmetic():
    a = RNG.normal(0, 10, 5000)
    b = np.where(np.abs(RNG.normal(0, 10, 5000)) < 1e-3, 1.0,
                 RNG.normal(0, 10, 5000))
    assert relerr(df_of(a) * df_of(b), a * b) < 1e-13
    assert relerr(df_of(a) / df_of(b), a / b) < 1e-13
    s = df_of(a) + df_of(b)
    got = np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64)
    # addition is exact up to renormalization of the pair
    assert np.max(np.abs(got - (a + b))) < 1e-10 * np.max(np.abs(a))


def test_df_transcendentals():
    x = RNG.uniform(-60, 60, 5000)
    assert relerr(dfm.exp(df_of(x)), np.exp(x)) < 1e-12
    x2 = RNG.uniform(-30, 30, 5000)
    assert relerr(dfm.tanh(df_of(x2)), np.tanh(x2)) < 1e-11
    x3 = RNG.uniform(-5, 5, 5000)
    assert relerr(dfm.expm1(df_of(x3)), np.expm1(x3)) < 1e-11
    x4 = RNG.uniform(1e-9, 1e6, 5000)
    assert relerr(dfm.sqrt(df_of(x4)), np.sqrt(x4)) < 1e-13


def test_df_exp2_exact():
    k = jnp.asarray(np.arange(-126, 127), jnp.float32)
    got = np.asarray(dfm._exp2_exact(k), np.float64)
    assert np.array_equal(got, 2.0 ** np.arange(-126, 127).astype(np.float64))


def test_df_element_physics_floor():
    """The superover subsystem residual evaluated through the df namespace
    must beat the plain-f32 evaluation floor by orders of magnitude --
    this is what bounds the fused kernel's z error at cond(J) spikes."""
    from acme_tpu.models import superover_model
    model = superover_model(drive=1.0, tone=1.0, level=1.0, fs=44100)
    q0 = np.asarray(model.q0s[0], float)
    Q = q0[:, None] + RNG.normal(0, 0.3, (len(q0), 64))
    res64, J64 = model.nl_funcs[0](np, Q)
    resdf, _ = model.nl_funcs[0](dfm, df_of(Q))
    err_df = np.abs(np.asarray(resdf.hi, np.float64)
                    + np.asarray(resdf.lo, np.float64) - res64)
    res32, _ = model.nl_funcs[0](jnp, jnp.asarray(Q, jnp.float32))
    err_32 = np.abs(np.asarray(res32, np.float64) - res64)
    scale = np.max(np.einsum("acl,cl->al", np.abs(J64), np.abs(Q)), axis=0)
    assert (err_df.max(0) / scale).max() < 1e-12
    assert (err_df.max(0) / scale).max() < 1e-3 * (err_32.max(0) / scale).max()


def test_df_where_select_and_compare():
    a = df_of(RNG.normal(0, 1, 100))
    b = df_of(RNG.normal(0, 1, 100))
    c = a < b
    m = dfm.where(c, a, b)
    lo = np.minimum(np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64),
                    np.asarray(b.hi, np.float64) + np.asarray(b.lo, np.float64))
    got = np.asarray(m.hi, np.float64) + np.asarray(m.lo, np.float64)
    assert np.array_equal(got, lo)
    assert np.array_equal(np.asarray(dfm.minimum(a, b).hi), np.asarray(m.hi))
