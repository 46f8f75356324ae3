"""r13: the bench artifact's ``contended`` flag distrusts its own
measurements — BENCH_r12.json stamped ``contended: false`` at load
6.72 with a calibration 1.6x the clean floor (the quarter-of-CPUs
wait threshold passed it), which cost r12 its adjudication run.  The
rule: load over ~2, or either bracketing calibration over 1.3x the
recorded clean floor, stamps contended=true."""

from __future__ import annotations

import importlib.util

spec = importlib.util.spec_from_file_location(
    "bench_mod", "/root/repo/bench.py"
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_r12_artifact_conditions_stamp_contended():
    # the exact numbers the r12 driver artifact recorded
    assert bench._contended_verdict(6.72, 0.2469, 0.24) is True


def test_quiet_session_reads_false():
    # the judge's clean readings (load 1.04, cal 0.1455-0.1612)
    assert bench._contended_verdict(1.04, 0.1612, 0.1455) is False
    assert bench._contended_verdict(0.0, 0.145, 0.145) is False


def test_each_signal_alone_suffices():
    assert bench._contended_verdict(2.5, 0.14, 0.14) is True   # load
    assert bench._contended_verdict(0.5, 0.20, 0.14) is True   # start cal
    assert bench._contended_verdict(0.5, 0.14, 0.20) is True   # end cal
    # boundary: exactly at the thresholds is still quiet
    assert (
        bench._contended_verdict(
            bench.LOAD_CONTENDED,
            bench.CAL_CONTENDED_RATIO * bench.CAL_FLOOR_SEC,
        )
        is False
    )
