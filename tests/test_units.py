"""Units frontend tests (mirrors test/unitful.jl): every constructor's
unit-quantity form equals the plain-number form; wrong dimensions raise."""

import numpy as np
import pytest

import acme_tpu as A
from acme_tpu.utils.units import UnitError, units as U


def _eq(e1, e2):
    assert e1 == e2


def test_constructors_accept_units():
    # note: 22 * U.nF rounds like 22 * 1e-9 (one multiplication), which can
    # differ from the decimal literal 22e-9 by 1 ulp -- so compare against
    # the multiplicative form, as the exact-rational pipeline preserves ulps
    _eq(A.resistor(4.7 * U.kohm), A.resistor(4.7 * 1e3))
    _eq(A.potentiometer(100 * U.kohm, 0.4), A.potentiometer(100 * 1e3, 0.4))
    _eq(A.potentiometer(100 * U.kohm), A.potentiometer(100 * 1e3))
    _eq(A.capacitor(22 * U.nF), A.capacitor(22 * 1e-9))
    _eq(A.inductor(10 * U.mH), A.inductor(10 * 1e-3))
    _eq(A.transformer(10 * U.mH, 100 * U.mH),
        A.transformer(10 * 1e-3, 100 * 1e-3))
    _eq(A.voltagesource(9 * U.V, rs=1 * U.ohm), A.voltagesource(9.0, rs=1.0))
    _eq(A.voltagesource(rs=10 * U.ohm), A.voltagesource(rs=10.0))
    _eq(A.currentsource(5 * U.mA, gp=1e-5 * U.S),
        A.currentsource(5 * 1e-3, gp=1e-5))
    _eq(A.voltageprobe(gp=1e-4 * U.S), A.voltageprobe(gp=1e-4))
    _eq(A.currentprobe(rs=2 * U.ohm), A.currentprobe(rs=2.0))
    _eq(A.diode(is_=12 * U.nA, eta=2), A.diode(is_=12 * 1e-9, eta=2))
    _eq(A.bjt("npn", is_=80 * U.fA, vaf=10 * U.V, ikf=50 * U.mA,
              re=10 * U.ohm),
        A.bjt("npn", is_=80 * 1e-15, vaf=10.0, ikf=50 * 1e-3, re=10.0))
    _eq(A.mosfet("n", vt=0.7 * U.V, alpha=20 * U.uA / U.V ** 2),
        A.mosfet("n", vt=0.7, alpha=20 * 1e-6))
    _eq(A.opamp(model="macak", gain=100, vomin=-4 * U.V, vomax=4 * U.V),
        A.opamp(model="macak", gain=100, vomin=-4.0, vomax=4.0))
    _eq(A.inductor(model="JA", n=230, D=2.4e-2 * U.m, a=14.1 * U.A / U.m),
        A.inductor(model="JA", n=230, D=2.4e-2, a=14.1))


def test_wrong_dimension_raises():
    with pytest.raises(UnitError):
        A.resistor(1 * U.F)
    with pytest.raises(UnitError):
        A.capacitor(1 * U.ohm)
    with pytest.raises(UnitError):
        A.voltagesource(1 * U.A)
    with pytest.raises(UnitError):
        A.diode(is_=1 * U.V)
    with pytest.raises(UnitError):
        A.inductor(3 * U.kohm)


def test_quantity_arithmetic():
    r = 2 * U.kohm
    assert (r / U.ohm).to(U.one) == pytest.approx(2000.0)
    v = 5 * U.V
    i = v / r
    assert i.to(U.mA) == pytest.approx(2.5)
    with pytest.raises(UnitError):
        _ = v + i
    with pytest.raises(UnitError):
        float(v)


def test_units_run_end_to_end():
    circ = A.Circuit()
    circ.add("src", A.voltagesource(5 * U.V))
    circ.add("r", A.resistor(1 * U.kohm))
    circ.add("p", A.currentprobe())
    circ.connect(("src", "+"), ("p", "+"))
    circ.connect(("p", "-"), ("r", "1"))
    circ.connect(("r", "2"), ("src", "-"))
    model = A.DiscreteModel(circ, 1)
    y = A.run(model, np.zeros((0, 1)))
    assert y[0, 0] == pytest.approx(0.005)


def test_mosfet_polynomial_units():
    """Degree-k coefficient of vt carries V^(1-k), of alpha A/V^(2+k)
    (ref ext/UnitfulExt.jl:89-110)."""
    # correct per-degree units round-trip to the plain-number element
    e1 = A.mosfet("n", vt=(0.7 * U.V, 2.0 * U.one, 0.5 / U.V),
                  alpha=(20e-6 * U.A_per_V2, 1e-6 * U.A_per_V2 / U.V))
    e2 = A.mosfet("n", vt=(0.7, 2.0, 0.5), alpha=(20e-6, 1e-6))
    assert e1 == e2
    # the degree-0 unit on a degree-1 coefficient must be rejected
    with pytest.raises(UnitError):
        A.mosfet("n", vt=(0.7 * U.V, 2.0 * U.V))
    with pytest.raises(UnitError):
        A.mosfet("n", vt=0.7, alpha=(20e-6 * U.A_per_V2,
                                     1e-6 * U.A_per_V2))
