"""Host-runtime circuit tests: device physics against closed-form equations
and circuit-graph manipulation (mirrors test/runtests.jl:53-184, 386-429).
"""

import math
import warnings

import numpy as np
import pytest

import acme_tpu as A


def test_empty_circuit():
    circ = A.Circuit()
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 20))).shape == (0, 20)


def test_shorted_resistor():
    circ = A.Circuit()
    circ.add("r", A.resistor(0))
    circ.connect(("r", "1"), ("r", "2"))
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 20))).shape == (0, 20)


def test_resistor_diode_operating_point():
    i = 1e-3
    r = 10e3
    is_ = 1e-12
    v_r = i * r
    v_d = 25e-3 * math.log(i / is_ + 1)
    circ = A.Circuit()
    circ.add("vsrc", A.voltagesource(v_r + v_d))
    circ.add("r1", A.resistor(r))
    circ.add("d", A.diode(is_=is_))
    circ.add("vprobe", A.voltageprobe())
    circ.connect(("vsrc", "+"), "supply")
    circ.connect(("vsrc", "-"), "gnd")
    circ.connect(("d", "-"), "gnd")
    circ.connect(("d", "+"), ("r1", "2"))
    circ.connect(("vprobe", "-"), "gnd")
    circ.connect(("vprobe", "+"), ("r1", "2"))
    circ.connect(("r1", "1"), "supply")
    model = A.DiscreteModel(circ, 1)
    y = A.run(model, np.zeros((0, 1)))
    # bound follows from the solver contract, not exactness: Newton stops
    # at residual < 1e-10 A, and dv = res/(di/dv) with di/dv = (i+is)/vt
    # = 0.04 A/V here gives ~2.5e-9 V of admissible slack (the previous
    # 1e-10 bound only held by the accident of one particular iterate
    # path; the round-5 junction limiting lands a different, equally
    # converged final iterate)
    assert y[0, 0] == pytest.approx(v_d, abs=2.5e-9)


def test_programmatic_reconnection():
    circ = A.Circuit()
    circ.add("r1", A.resistor(10))
    circ.add("r2", A.resistor(100))
    circ.connect(("r2", "1"), ("r1", "1"))
    circ.connect(("r2", "2"), ("r1", "2"))
    circ.add("src", A.voltagesource(1))
    circ.connect(("src", "-"), ("r1", "2"))
    circ.add("probe", A.currentprobe())
    circ.connect(("probe", "+"), ("src", "+"))
    circ.connect(("probe", "-"), ("r1", "1"))
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 1)))[0, 0] == pytest.approx(1 / 10 + 1 / 100)
    circ.disconnect(("r2", "1"))
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 1)))[0, 0] == pytest.approx(1 / 10)
    circ.disconnect(("r1", "2"))
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 1)))[0, 0] == pytest.approx(0.0)
    circ.connect(("r1", "2"), ("r2", "1"))
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 1)))[0, 0] == pytest.approx(1 / (10 + 100))


def test_element_deletion():
    circ = A.Circuit()
    circ.add("r1", A.resistor(10))
    r2 = circ.add(A.resistor(100))
    circ.add("r3", A.resistor(470))
    r4 = circ.add(A.resistor(1000))
    circ.add("src", A.voltagesource(1))
    circ.add("probe", A.currentprobe())
    circ.connect(("src", "+"), ("probe", "+"))
    circ.connect(("probe", "-"), ("r1", "1"), (r2, "1"), ("r3", "1"), (r4, "1"))
    circ.connect(("src", "-"), ("r1", "2"), (r2, "2"), ("r3", "2"), (r4, "2"))
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 1)))[0, 0] == pytest.approx(1/10 + 1/100 + 1/470 + 1/1000)
    circ.delete("r1")
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 1)))[0, 0] == pytest.approx(1/100 + 1/470 + 1/1000)
    circ.delete(r4)
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 1)))[0, 0] == pytest.approx(1/100 + 1/470)
    circ.delete("r3")
    circ.delete(r2)
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, np.zeros((0, 1)))[0, 0] == pytest.approx(0.0)


def test_indeterminate_output_warns():
    circ = A.Circuit()
    circ.add("r", A.resistor(0))
    circ.add("probe", A.currentprobe())
    circ.connect(("probe", "+"), ("r", "1"))
    circ.connect(("probe", "-"), ("r", "2"))
    with pytest.warns(UserWarning, match="Model output depends on indeterminate"):
        A.DiscreteModel(circ, 1)


def test_indeterminate_state_warns():
    circ = A.Circuit()
    circ.add("u", A.opamp())
    circ.connect(("u", "in+"), ("u", "in-"))
    circ.add("c", A.capacitor(1e-6))
    circ.connect(("c", "1"), ("u", "out-"))
    circ.connect(("c", "2"), ("u", "out+"))
    with pytest.warns(UserWarning, match="State update depends on indeterminate"):
        A.DiscreteModel(circ, 1)


def test_no_solution_semantics():
    # current source driving a diode backwards: no solution for i < -is
    circ = A.Circuit()
    circ.add("d", A.diode())
    circ.add("src", A.currentsource())
    circ.connect(("src", "+"), ("d", "+"))
    circ.connect(("src", "-"), ("d", "-"))
    circ.add("probe", A.voltageprobe())
    circ.connect(("probe", "+"), ("d", "+"))
    circ.connect(("probe", "-"), ("d", "-"))
    model = A.DiscreteModel(circ, 1)
    assert model.nn() == 1
    y = A.run(model, np.array([[1.0, 1.0]]))
    assert y.shape == (1, 2)
    assert y[0, 0] == y[0, 1]
    with pytest.raises(RuntimeError):
        A.run(model, np.array([[np.inf]]))
    with pytest.warns(UserWarning, match="Failed to converge"):
        y = A.run(model, np.array([[-1.0]]))
        assert y.shape == (1, 1)


@pytest.mark.parametrize("kind", ["isrc_internal_gp", "isrc_input", "probe_gp",
                                  "vsrc_internal_rs", "vsrc_input", "probe_rs"])
def test_sources_probes_internal_resistance(kind):
    circ = A.Circuit()
    if kind == "isrc_internal_gp":
        circ.add("src", A.currentsource(100e-3, gp=1e-5))
        circ.add("probe", A.voltageprobe())
        u = np.zeros((0, 1))
        expected = 1e5 * 100e-3
    elif kind == "isrc_input":
        circ.add("src", A.currentsource(gp=1e-5))
        circ.add("probe", A.voltageprobe())
        u = np.array([[100e-3]])
        expected = 1e5 * 100e-3
    elif kind == "probe_gp":
        circ.add("src", A.currentsource(100e-3))
        circ.add("probe", A.voltageprobe(gp=1e-5))
        u = np.zeros((0, 1))
        expected = 1e5 * 100e-3
    elif kind == "vsrc_internal_rs":
        circ.add("src", A.voltagesource(10, rs=100000))
        circ.add("probe", A.currentprobe())
        u = np.zeros((0, 1))
        expected = 10 / 100000
    elif kind == "vsrc_input":
        circ.add("src", A.voltagesource(rs=100000))
        circ.add("probe", A.currentprobe())
        u = np.array([[10.0]])
        expected = 10 / 100000
    else:
        circ.add("src", A.voltagesource(10))
        circ.add("probe", A.currentprobe(rs=100000))
        u = np.zeros((0, 1))
        expected = 10 / 100000
    circ.connect(("probe", "+"), ("src", "+"))
    circ.connect(("probe", "-"), ("src", "-"))
    model = A.DiscreteModel(circ, 1)
    assert A.run(model, u)[0, 0] == pytest.approx(expected)


def test_nonlinearity_decomposition():
    # mirrors test/runtests.jl:267-292
    circ = A.Circuit()
    circ.add("src1", A.voltagesource())
    circ.add("probe1", A.currentprobe())
    circ.add("d1", A.diode())
    circ.connect(("d1", "+"), ("src1", "+"))
    circ.add("d2", A.diode())
    circ.connect(("d2", "+"), ("d1", "-"))
    circ.connect(("d2", "-"), ("probe1", "+"))
    circ.connect(("probe1", "-"), ("src1", "-"))
    circ.add("src2", A.voltagesource())
    circ.add("probe2", A.currentprobe())
    circ.add("d3", A.diode())
    circ.connect(("src2", "+"), ("d3", "+"))
    circ.connect(("d3", "-"), ("probe2", "+"))
    circ.connect(("probe2", "-"), ("src2", "-"))

    model = A.DiscreteModel(circ, 1, decompose_nonlinearity=False)
    y = A.run(model, np.array([[2.0], [1.0]]))
    assert model.nn(0) == 3
    iref = 1e-12 * (math.exp(1 / 25e-3) - 1)
    assert y[0, 0] == pytest.approx(iref, rel=1e-4)
    assert y[1, 0] == pytest.approx(iref, rel=1e-4)

    model = A.DiscreteModel(circ, 1)
    y = A.run(model, np.array([[2.0], [1.0]]))
    # single diode is extracted first, although it was added last
    assert model.nn(0) == 1
    assert model.nn(1) == 2
    assert y[0, 0] == pytest.approx(y[1, 0], rel=1e-6)
    assert y[0, 0] == pytest.approx(iref, rel=1e-4)
