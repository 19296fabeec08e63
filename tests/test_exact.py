"""Algebraic postcondition tests for the exact build-time linear algebra.

Mirrors the reference's pure-function unit tests
(/root/reference/test/runtests.jl:12-21, 221-265).
"""

import numpy as np
import pytest
from fractions import Fraction

from acme_tpu.exact import (fmat, fzeros, gensolve, rank_factorize, topomat)
from acme_tpu import model as model_mod


def _allzero(a):
    return all(v == 0 for v in np.asarray(a).reshape(-1))


def test_topomat_basic():
    tv, ti = topomat(np.array([[1, -1, 1], [-1, 1, -1]]))
    assert _allzero(np.dot(tv, ti.T))


def test_topomat_short_circuit():
    # two nodes, one loop branch (short-circuited): voltage==0, current arbitrary
    tv, ti = topomat(np.zeros((2, 1), dtype=int))
    assert tv.shape == (1, 1) and tv[0, 0] == 1
    assert ti.shape == (0, 1)


def test_topomat_dangling():
    # two nodes, one branch between them: voltage arbitrary, current==0
    tv, ti = topomat(np.array([[1], [-1]]))
    assert tv.shape == (0, 1)
    assert ti.shape == (1, 1) and ti[0, 0] == 1


def test_gensolve_nullspace_and_rank_factorize():
    a = fmat([[1, 1, 1], [1, 1, 2], [1, 2, 1], [1, 2, 2], [2, 1, 1], [2, 1, 2]])
    b = fmat([[1, 2, 3, 4, 5, 6], [6, 5, 4, 3, 2, 1], [1, 0, 1, 0, 1, 0]])
    nullspace = gensolve(a.T.copy(), np.empty((a.shape[1], 0), dtype=object))[1]
    assert _allzero(np.dot(nullspace.T, a))
    c, f = rank_factorize(np.dot(a, b))
    assert _allzero(np.dot(c, f) - np.dot(a, b))
    assert c.shape[1] == 3  # exact rank


def test_gensolve_solves():
    a = fmat([[2, 0, 1], [0, 3, 0]])
    b = fmat([[1], [6]])
    x, h = gensolve(a, b)
    assert _allzero(np.dot(a, x) - b)
    assert _allzero(np.dot(a, h))
    assert h.shape[1] == 1  # one-dimensional nullspace


@pytest.mark.parametrize("zx_nonzero", [False, True])
@pytest.mark.parametrize("zu_nonzero", [False, True])
def test_reduce_pdims(zx_nonzero, zu_nonzero):
    # mirrors test/runtests.jl:230-265
    a = fmat([[-1, -1, -4, -3, 0, -1], [2, -1, -5, 3, -4, 0],
              [-2, 2, -5, -2, 5, 1], [-5, 4, -3, 0, 5, -5],
              [4, 3, 0, -1, 0, 2], [0, -3, -4, -4, -3, 4]])
    b = fmat([[1], [2], [3], [-2], [-1], [0]])
    c = fmat([[4, 2, -1], [-1, -3, 0], [-3, 5, 3], [0, 0, 0],
              [-4, -1, -1], [-1, -1, 5]])
    dy = fmat([[1, 2, 3, -2, -1, 0]])
    ey = fmat([[5]])
    fy = fmat([[-2, -1, 3]])
    p = fmat([[1, 1, 1], [1, 1, 2], [1, 2, 1], [1, 2, 2], [2, 1, 1], [2, 1, 2]])
    dq = fmat([[1, 2, 3, 4, 5, 6], [6, 5, 4, 3, 2, 1], [1, 0, 1, 0, 1, 0]])
    eq = fmat([[1], [2], [3]])
    fq = fmat([[1, 0, 0], [10, 0, 0], [0, 1, 0], [0, 10, 0], [0, 0, 1], [0, 0, 10]])
    zxin = fmat([[1, 2, 0, 0, 2, 1], [0, 1, 2, 2, 0, 1], [0, 0, 1, 0, 1, 1]]) \
        if zx_nonzero else fzeros(3, 6)
    zuin = fmat([[1], [2], [-1]]) if zu_nonzero else fzeros(3, 1)

    dq_full = np.dot(p, dq) + np.dot(fq, zxin)
    eq_full = np.dot(p, eq) + np.dot(fq, zuin)
    mats = {"a": a, "b": b, "c": c, "dy": dy, "ey": ey, "fy": fy,
            "dq_fulls": [dq_full.copy()], "eq_fulls": [eq_full.copy()],
            "fqprev_fulls": [eq_full.copy()], "fqs": [fq]}
    mats = model_mod.reduce_pdims(mats)
    assert mats["pexps"][0].shape[1] == 3
    assert _allzero(np.dot(mats["pexps"][0], mats["dqs"][0]) - mats["dq_fulls"][0])
    assert _allzero(np.dot(mats["pexps"][0], mats["eqs"][0]) - mats["eq_fulls"][0])
    # fold-back identities: a_new == a - c*zx etc.
    fqtfq = np.dot(fq.T, fq)
    zx = gensolve(fqtfq, np.dot(fq.T, dq_full - mats["dq_fulls"][0]))[0]
    zu = gensolve(fqtfq, np.dot(fq.T, eq_full - mats["eq_fulls"][0]))[0]
    assert _allzero(mats["a"] - (a - np.dot(c, zx)))
    assert _allzero(mats["b"] - (b - np.dot(c, zu)))
    assert _allzero(mats["dy"] - (dy - np.dot(fy, zx)))
    assert _allzero(mats["ey"] - (ey - np.dot(fy, zu)))


def feye_like(n):
    from acme_tpu.exact import feye
    return feye(n)


def test_tryextract_identity_when_enough_cols():
    fq = fmat([[1, 2], [3, 4]])
    a = model_mod.tryextract(fq.copy(), 2)
    assert a is not None and _allzero(a - feye_like(2))
