"""Fused Pallas kernel tests (interpret mode on CPU).

Interpret mode executes the kernel op-by-op, so these use short sequences
and mostly run with the cheap kernel options (no compensated residual /
extrapolation); the full-accuracy configuration is exercised on real TPU
hardware by bench.py and recorded in BENCH_r*.json.
"""

import numpy as np
import pytest

import acme_tpu as A
from acme_tpu import models as M
from acme_tpu.engine import compile_model
from acme_tpu.ops.fused import FusedRunner

FAST = dict(newton_iters=12, tol=1e-9, interpret=True,
            compensated=False, extrapolate=False)


@pytest.fixture(scope="module")
def clipper_ref():
    T = 384
    u = (0.5 * np.sin(2 * np.pi * 1000 / 44100 * np.arange(T)))[None, :]
    y64 = np.asarray(compile_model(M.diodeclipper_model()).run(u)[0])
    return u, y64


def test_fused_clipper_parity(clipper_ref):
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), time_chunk=128, **FAST)
    y, st, fails = fr.run(u, np.zeros((128, 0)))
    fails = fails.fails
    assert int(np.asarray(fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0]))
    ref = np.max(np.abs(y64))
    assert 20 * np.log10(err / ref) < -100


def test_fused_clipper_compensated(clipper_ref):
    # the full-accuracy configuration (compensated residual + extrapolated
    # warm starts), short run
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True)
    y, st, fails = fr.run(u[:, :128], np.zeros((128, 0)))
    fails = fails.fails
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :128]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_state_carry(clipper_ref):
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), time_chunk=128, **FAST)
    y1, st, _ = fr.run(u[:, :200], np.zeros((128, 0)))
    y2, st, _ = fr.run(u[:, 200:], np.zeros((128, 0)), state=st)
    y = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=2)
    err = np.max(np.abs(y[0, 0] - y64[0]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_uneven_length_exact_tail(clipper_ref):
    # T not divisible by the chunk: the padded tail is masked and must not
    # advance the state
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), time_chunk=256, **FAST)
    y, st, _ = fr.run(u[:, :300], np.zeros((128, 0)))
    assert np.asarray(y).shape[2] == 300
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :300]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_lane_sweep_birdie():
    T = 104
    u = (0.1 * np.sin(2 * np.pi * 1000 / 44100 * np.arange(T)))[None, :]
    m = M.birdie_model()  # vol pot = input 1
    fr = FusedRunner(m, lane_input_idx=(1,), time_chunk=104, **FAST)
    vols = np.full((128, 1), 0.8)
    vols[64:] = 0.3
    y, st, fails = fr.run(u, vols)
    fails = fails.fails
    # lane 0 (vol=0.8) against the f64 engine with the full input
    u_full = np.vstack([u, np.full((1, T), 0.8)])
    y64, _, _ = compile_model(M.birdie_model()).run(u_full)
    err = np.max(np.abs(np.asarray(y)[0, 0] - np.asarray(y64)[0]))
    ref = np.max(np.abs(np.asarray(y64)))
    # loose bound: this FAST config trades accuracy for interpret-mode
    # speed (no compensated residual, relative gates, K=12); the production
    # configuration measures -93 dB on this sweep on real TPU (STATUS.md)
    assert 20 * np.log10(err / ref) < -60
    # lanes with different vol differ
    assert not np.allclose(np.asarray(y)[0, 0], np.asarray(y)[100, 0])


def test_fused_rejects_bad_lanes():
    fr = FusedRunner(M.birdie_model(), lane_input_idx=(1,), **FAST)
    with pytest.raises(ValueError, match="multiple of 128"):
        fr.run(np.zeros((1, 8)), np.full((7, 1), 0.5))
