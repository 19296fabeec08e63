"""Device-physics tests against closed-form equations.

Mirrors the reference's core validation pattern (test/runtests.jl:482-662):
build a tiny circuit of ideal sources and probes around one device, run the
model, and compare with the analytic device equation evaluated in the test.
"""

import math

import numpy as np
import pytest

import acme_tpu as A


def _bjt_fixture(typ, **kw):
    circ = A.Circuit()
    circ.add("t", A.bjt(typ, **kw))
    circ.add("isrc", A.currentsource())
    circ.add("vsrc", A.voltagesource())
    circ.add("veprobe", A.voltageprobe())
    circ.add("vcprobe", A.voltageprobe())
    circ.add("ieprobe", A.currentprobe())
    circ.add("icprobe", A.currentprobe())
    circ.connect(("isrc", "+"), ("t", "base"))
    circ.connect(("vsrc", "-"), ("isrc", "-"))
    circ.connect(("veprobe", "+"), ("t", "base"))
    circ.connect(("veprobe", "-"), ("isrc", "-"))
    circ.connect(("vcprobe", "+"), ("t", "base"))
    circ.connect(("vcprobe", "-"), ("vsrc", "+"))
    circ.connect(("ieprobe", "+"), ("t", "emitter"))
    circ.connect(("ieprobe", "-"), ("isrc", "-"))
    circ.connect(("icprobe", "+"), ("t", "collector"))
    circ.connect(("icprobe", "-"), ("vsrc", "+"))
    return A.DiscreteModel(circ, 1)


ISC, ISE = 1e-6, 2e-6
ETAC, ETAE = 1.1, 1.0
BF, BR = 100.0, 10.0


@pytest.mark.parametrize("typ,ib", [("npn", 1e-3), ("pnp", -1e-3)])
def test_bjt_ebers_moll(typ, ib):
    model = _bjt_fixture(typ, isc=ISC, ise=ISE, etac=ETAC, etae=ETAE,
                         bf=BF, br=BR)
    N = 40
    u = np.vstack([np.linspace(0, ib, N),
                   np.concatenate([np.linspace(1, -1, N // 2),
                                   np.linspace(-1, 1, N // 2)])])
    out = A.run(model, u)
    if typ == "pnp":
        out = -out
    for n in range(N):
        ve, vc, ie, ic = out[:, n]
        ie_ref = ISE * (math.exp(ve / (ETAE * 25e-3)) - 1) \
            - BR / (1 + BR) * ISC * (math.exp(vc / (ETAC * 25e-3)) - 1)
        ic_ref = -BF / (1 + BF) * ISE * (math.exp(ve / (ETAE * 25e-3)) - 1) \
            + ISC * (math.exp(vc / (ETAC * 25e-3)) - 1)
        assert ie == pytest.approx(ie_ref, abs=1e-10)
        assert ic == pytest.approx(ic_ref, abs=1e-10)


@pytest.mark.parametrize("ile,ilc", [(0, 0), (50e-9, 100e-9)])
@pytest.mark.parametrize("vaf,var", [(math.inf, math.inf), (10, 50)])
@pytest.mark.parametrize("ikf,ikr", [(math.inf, math.inf), (50e-3, 500e-3)])
@pytest.mark.parametrize("typ,ib", [("npn", 1e-3), ("pnp", -1e-3)])
def test_bjt_gummel_poon(ile, ilc, vaf, var, ikf, ikr, typ, ib):
    etacl, etael = 1.2, 1.1
    model = _bjt_fixture(typ, isc=ISC, ise=ISE, etac=ETAC, etae=ETAE,
                         bf=BF, br=BR, ile=ile, ilc=ilc, etacl=etacl,
                         etael=etael, vaf=vaf, var=var, ikf=ikf, ikr=ikr)
    N = 40
    u = np.vstack([np.linspace(0, ib, N),
                   np.concatenate([np.linspace(1, -1, N // 2),
                                   np.linspace(-1, 1, N // 2)])])
    out = A.run(model, u)
    if typ == "pnp":
        out = -out
    for n in range(N):
        ve, vc, ie, ic = out[:, n]
        i_f = BF / (1 + BF) * ISE * (math.exp(ve / (ETAE * 25e-3)) - 1)
        i_r = BR / (1 + BR) * ISC * (math.exp(vc / (ETAC * 25e-3)) - 1)
        icc = (2 * (1 - ve / var - vc / vaf)) \
            / (1 + math.sqrt(1 + 4 * (i_f / ikf + i_r / ikr))) * (i_f - i_r)
        ibe = i_f / BF + ile * (math.exp(ve / (etael * 25e-3)) - 1)
        ibc = i_r / BR + ilc * (math.exp(vc / (etacl * 25e-3)) - 1)
        assert ie == pytest.approx(icc + ibe, abs=1e-10)
        assert ic == pytest.approx(-icc + ibc, abs=1e-10)


@pytest.mark.parametrize("typ,vce", [("npn", 1.0), ("pnp", -1.0)])
def test_bjt_terminal_resistances(typ, vce):
    """bjt(re, rc, rb) equals external resistors (ref runtests.jl:551-587)."""
    rb, re, rc = 100.0, 10.0, 20.0
    ib = 1e-3 if typ == "npn" else -1e-3
    circ = A.Circuit()
    circ.add("t1", A.bjt(typ))
    circ.add("rbref", A.resistor(rb))
    circ.add("rcref", A.resistor(rc))
    circ.add("reref", A.resistor(re))
    circ.add("isrc1", A.currentsource(ib))
    circ.add("vsrc1", A.voltagesource(vce))
    circ.add("vep1", A.voltageprobe())
    circ.add("vcp1", A.voltageprobe())
    circ.add("iep1", A.currentprobe())
    circ.add("icp1", A.currentprobe())
    circ.connect(("t1", "base"), ("rbref", "1"))
    circ.connect(("rbref", "2"), ("isrc1", "+"), ("vep1", "+"), ("vcp1", "+"))
    circ.connect(("t1", "collector"), ("rcref", "1"))
    circ.connect(("rcref", "2"), ("icp1", "+"))
    circ.connect(("vcp1", "-"), ("icp1", "-"), ("vsrc1", "+"))
    circ.connect(("t1", "emitter"), ("reref", "1"))
    circ.connect(("reref", "2"), ("iep1", "+"))
    circ.connect(("vep1", "-"), ("iep1", "-"), ("vsrc1", "-"), ("isrc1", "-"))
    circ.add("t2", A.bjt(typ, rb=rb, re=re, rc=rc))
    circ.add("isrc2", A.currentsource(ib))
    circ.add("vsrc2", A.voltagesource(vce))
    circ.add("vep2", A.voltageprobe())
    circ.add("vcp2", A.voltageprobe())
    circ.add("iep2", A.currentprobe())
    circ.add("icp2", A.currentprobe())
    circ.connect(("t2", "base"), ("isrc2", "+"), ("vep2", "+"), ("vcp2", "+"))
    circ.connect(("t2", "collector"), ("icp2", "+"))
    circ.connect(("vcp2", "-"), ("icp2", "-"), ("vsrc2", "+"))
    circ.connect(("t2", "emitter"), ("iep2", "+"))
    circ.connect(("vep2", "-"), ("iep2", "-"), ("vsrc2", "-"), ("isrc2", "-"))
    model = A.DiscreteModel(circ, 1)
    out = A.run(model, np.zeros((0, 1)))
    np.testing.assert_allclose(out[0:4, :], out[4:8, :], atol=1e-12)


def _mosfet_fixture(typ, **kw):
    circ = A.Circuit()
    circ.add("vgs", A.voltagesource())
    circ.add("vds", A.voltagesource())
    circ.add("J", A.mosfet(typ, **kw))
    circ.add("out", A.currentprobe())
    circ.connect(("vgs", "-"), "gnd")
    circ.connect(("vds", "-"), "gnd")
    circ.connect(("J", "gate"), ("vgs", "+"))
    circ.connect(("J", "drain"), ("vds", "+"))
    circ.connect(("out", "+"), ("J", "source"))
    circ.connect(("out", "-"), "gnd")
    return A.DiscreteModel(circ, 1)


@pytest.mark.parametrize("typ,pol", [("n", 1), ("p", -1)])
def test_mosfet_regions(typ, pol):
    model = _mosfet_fixture(typ, vt=1, alpha=1e-4)
    y = A.run(model, pol * np.array([[0, 1, 2, 2, 2],
                                     [5, 5, 0.5, 1, 1.5]], float))
    expect = pol * np.array([0, 0, 1e-4 * (1 - 0.5 / 2) * 0.5,
                             1e-4 * (1 - 1 / 2) * 1, 1e-4 / 2 * 1 ** 2])
    np.testing.assert_allclose(y[0], expect, atol=1e-14)


@pytest.mark.parametrize("typ,pol", [("n", 1), ("p", -1)])
@pytest.mark.parametrize("alpha", [2e-5, (0.0205, -0.0017)])
@pytest.mark.parametrize("vt", [1, (1.2078, 0.3238), (-1.2454, -0.199, -0.0483)])
def test_mosfet_polynomial_vt_alpha(typ, pol, alpha, vt):
    model = _mosfet_fixture(typ, vt=vt, alpha=alpha, lam=0.05)
    vt_t = np.atleast_1d(vt).astype(float)
    a_t = np.atleast_1d(alpha).astype(float)
    for vgs in np.linspace(0, 5, 5):
        for vds in np.linspace(0, 5, 5):
            y = A.run(model, pol * np.array([[vgs], [vds]]))[0, 0]
            # the element evaluates its vt/alpha polynomials at
            # polarity * v_GS (ref elements.jl:456-461, runtests.jl:613-614)
            a_ = np.polyval(a_t[::-1], pol * vgs)
            vt_ = np.polyval(vt_t[::-1], pol * vgs)
            if vgs <= vt_:
                assert y == 0
            elif vds <= vgs - vt_:
                assert y == pytest.approx(
                    pol * a_ * (vgs - vt_ - vds / 2) * vds * (1 + 0.05 * vds))
            else:
                assert y == pytest.approx(
                    pol * a_ / 2 * (vgs - vt_) ** 2 * (1 + 0.05 * vds))


@pytest.mark.parametrize("Amax", [10, math.inf])
@pytest.mark.parametrize("GBP", [50e3, math.inf])
def test_opamp_transfer_function(Amax, GBP):
    """Impulse-response FFT vs analytic transfer function with bilinear
    prewarping (ref runtests.jl:626-650)."""
    circ = A.Circuit()
    circ.add("input", A.voltagesource())
    circ.connect(("input", "-"), "gnd")
    circ.add("op", A.opamp(maxgain=Amax, gain_bw_prod=GBP))
    circ.connect(("op", "in+"), ("input", "+"))
    circ.connect(("op", "out-"), "gnd")
    circ.add("r1", A.resistor(109e3))
    circ.connect(("r1", "1"), ("op", "out+"))
    circ.connect(("r1", "2"), ("op", "in-"))
    circ.add("r2", A.resistor(1e3))
    circ.connect(("r2", "1"), ("op", "in-"))
    circ.add("c", A.capacitor(22e-9))
    circ.connect(("c", "1"), ("r2", "2"))
    circ.connect(("c", "2"), "gnd")
    circ.add("output", A.voltageprobe())
    circ.connect(("output", "+"), ("op", "out+"))
    circ.connect(("output", "-"), "gnd")
    model = A.DiscreteModel(circ, 1 / 44100)
    u = np.zeros((1, 4096))
    u[0, 0] = 1.0
    y = A.run(model, u)[0]
    Y = np.fft.rfft(y)

    def G_inv(s):
        return math.sqrt(1 - 1 / Amax ** 2) * s / (2 * math.pi * GBP) + 1 / Amax

    def H(s):
        return (1e3 * 22e-9 * s + 1) / ((109e3 + 1e3) * 22e-9 * s + 1)

    k = np.arange(len(Y))
    w = 2 * 44100 * np.tan(np.pi * k / len(y))
    Yref = 1.0 / (G_inv(1j * w) + H(1j * w))
    np.testing.assert_allclose(Y, Yref, atol=1e-8 * np.max(np.abs(Yref)))


def test_opamp_macak_tanh():
    circ = A.Circuit()
    circ.add("input", A.voltagesource())
    circ.connect(("input", "-"), "gnd")
    circ.add("op", A.opamp(model="macak", gain=100, vomin=-3, vomax=4))
    circ.connect(("op", "in+"), ("input", "+"))
    circ.connect(("op", "in-"), ("op", "out-"), "gnd")
    circ.add("output", A.voltageprobe())
    circ.connect(("output", "+"), ("op", "out+"))
    circ.connect(("output", "-"), "gnd")
    u = np.linspace(-1, 1, 200)[None, :]
    model = A.DiscreteModel(circ, 1 / 44100)
    y = A.run(model, u)[0]
    yref = 0.5 * (4 + -3) + 0.5 * (4 - -3) * np.tanh(100 / (0.5 * (4 - -3)) * u[0])
    np.testing.assert_allclose(y, yref, atol=1e-9)


def test_jiles_atherton_inductor():
    """Qualitative magnetics physics (ref runtests.jl:432-457)."""
    circ = A.Circuit()
    circ.add("Jin", A.voltagesource())
    circ.add("Jout1", A.currentprobe())
    circ.add("Jout2", A.currentprobe())
    circ.add("L_JA", A.inductor(model="JA"))
    circ.add("L_lin", A.inductor(174e-3))
    circ.connect(("Jout1", "+"), ("Jin", "+"))
    circ.connect(("Jout2", "+"), ("Jin", "+"))
    circ.connect(("L_JA", "1"), ("Jout1", "-"))
    circ.connect(("L_JA", "2"), ("Jin", "-"))
    circ.connect(("L_lin", "1"), ("Jout2", "-"))
    circ.connect(("L_lin", "2"), ("Jin", "-"))
    model = A.DiscreteModel(circ, 1 / 44100)
    # starting non-magnetized, the JA inductor is first sub-linear
    # (the 174 mH linear stand-in is the reference's *approximate*
    # linearization, docstring elements.jl:139; deviation reaches ~1.1%
    # by sample 9)
    y = A.run(model, np.full((1, 750), 0.1))
    np.testing.assert_allclose(y[0, :9], y[1, :9], rtol=1.5e-2)
    assert np.all(y[0] < y[1])
    # towards saturation it becomes super-linear
    A.run(model, np.full((1, 500), 0.1))
    y = A.run(model, np.full((1, 750), 0.1))
    assert np.all(y[0] > y[1])
    # hysteresis: equal negative drive pushes the current below zero
    y = A.run(model, np.full((1, 2000), -0.1))
    assert y[0, -1] < -2e-3
    # shorted (zero volts): the current stays put (remanence)
    y = A.run(model, np.zeros((1, 1000)))
    assert y[0, 0] < -2e-3
    np.testing.assert_allclose(y, np.broadcast_to(y[:, :1], y.shape), atol=1e-9)


def test_jiles_atherton_transformer():
    """JA transformer is near-linear for small drive (ref runtests.jl:458-479)."""
    circ = A.Circuit()
    circ.add("Jin", A.voltagesource())
    circ.add("R1", A.resistor(10))
    circ.add("R2", A.resistor(10))
    circ.add("T_JA", A.transformer(model="JA", ns=[10, 100]))
    circ.add("T_lin", A.transformer(330e-6, 33e-3))
    circ.add("Jout1", A.voltageprobe(gp=1e-3))
    circ.add("Jout2", A.voltageprobe(gp=1e-3))
    circ.connect(("R1", "1"), ("Jin", "+"))
    circ.connect(("R2", "1"), ("Jin", "+"))
    circ.connect(("T_JA", "1"), ("R1", "2"))
    circ.connect(("T_JA", "2"), ("Jin", "-"))
    circ.connect(("T_lin", "primary1"), ("R2", "2"))
    circ.connect(("T_lin", "primary2"), ("Jin", "-"))
    circ.connect(("Jout1", "+"), ("T_JA", "3"))
    circ.connect(("Jout1", "-"), ("T_JA", "4"))
    circ.connect(("Jout2", "+"), ("T_lin", "secondary1"))
    circ.connect(("Jout2", "-"), ("T_lin", "secondary2"))
    model = A.DiscreteModel(circ, 1 / 44100)
    u = np.sin(2 * np.pi * 1000 / 44100 * np.arange(500))[None, :]
    y = A.run(model, 0.001 * u)[:, 200:]
    # the 330uH/33mH pair approximates the JA small-signal behaviour to ~2%
    np.testing.assert_allclose(y[0], y[1], rtol=2.5e-2)
    y = A.run(model, 10 * u)[:, 200:]
    assert not np.allclose(y[0], y[1], rtol=0.5)


@pytest.mark.slow
@pytest.mark.parametrize("typ,ib", [("npn", 1e-3), ("pnp", -1e-3)])
def test_bjt_gummel_poon_full_grid(typ, ib):
    """The reference's full 2^9 Gummel-Poon grid: every one of ile, ilc,
    etacl, etael, vaf, var, ikf, ikr toggled independently between its
    Ebers-Moll default and a non-trivial value, x npn/pnp
    (ref test/runtests.jl:513-546), each swept and checked against the
    closed-form equations to 1e-10."""
    import itertools
    N = 10
    u = np.vstack([np.linspace(0, ib, N),
                   np.concatenate([np.linspace(1, -1, N // 2),
                                   np.linspace(-1, 1, N - N // 2)])])
    for (ile, ilc, etacl, etael, vaf, var, ikf, ikr) in itertools.product(
            (0.0, 50e-9), (0.0, 100e-9), (1.0, 1.2), (1.0, 1.1),
            (math.inf, 10.0), (math.inf, 50.0),
            (math.inf, 50e-3), (math.inf, 500e-3)):
        model = _bjt_fixture(typ, isc=ISC, ise=ISE, etac=ETAC, etae=ETAE,
                             bf=BF, br=BR, ile=ile, ilc=ilc, etacl=etacl,
                             etael=etael, vaf=vaf, var=var, ikf=ikf,
                             ikr=ikr)
        out = A.run(model, u)
        if typ == "pnp":
            out = -out
        for n in range(N):
            ve, vc, ie, ic = out[:, n]
            i_f = BF / (1 + BF) * ISE * (math.exp(ve / (ETAE * 25e-3)) - 1)
            i_r = BR / (1 + BR) * ISC * (math.exp(vc / (ETAC * 25e-3)) - 1)
            icc = (2 * (1 - ve / var - vc / vaf)) \
                / (1 + math.sqrt(1 + 4 * (i_f / ikf + i_r / ikr))) \
                * (i_f - i_r)
            ibe = i_f / BF + ile * (math.exp(ve / (etael * 25e-3)) - 1)
            ibc = i_r / BR + ilc * (math.exp(vc / (etacl * 25e-3)) - 1)
            assert ie == pytest.approx(icc + ibe, abs=1e-10), \
                (ile, ilc, etacl, etael, vaf, var, ikf, ikr, n)
            assert ic == pytest.approx(-icc + ibc, abs=1e-10), \
                (ile, ilc, etacl, etael, vaf, var, ikf, ikr, n)
