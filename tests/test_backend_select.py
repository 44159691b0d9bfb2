"""Drift-proof kernel-backend selection (utils/backend_select.py).

The tunnel's per-pallas_call dispatch latency drifts by orders of
magnitude between (and within) sessions; the selector re-probes with
hysteresis.  These tests inject synthetic latencies: a mid-run latency
flip must produce exactly one switch, and drift inside the hysteresis
band must never flap the backend.
"""

import pytest

from seq2seq_abcd_vae_tpu.utils.backend_select import (BackendSelector,
                                                       SELECTOR,
                                                       backend_report)


@pytest.fixture(autouse=True)
def _auto_mode(monkeypatch):
    monkeypatch.delenv("SEQ2SEQ_RNN_BACKEND", raising=False)
    monkeypatch.delenv("SEQ2SEQ_PALLAS_DISPATCH_MS_MAX", raising=False)


def _selector(latency_box, platform="tpu"):
    return BackendSelector(measure=lambda: latency_box["ms"],
                           platform=lambda: platform)


def test_latency_flip_switches_exactly_once():
    lat = {"ms": 1.0}
    sel = _selector(lat)
    assert sel.current() == "pallas"
    for _ in range(3):
        assert sel.maybe_reprobe() == "pallas"
    lat["ms"] = 500.0  # tunnel degrades 500x mid-run
    assert sel.maybe_reprobe() == "scan"
    for _ in range(5):
        assert sel.maybe_reprobe() == "scan"
    assert [d["switched"] for d in sel.decisions].count(True) == 1


def test_flip_back_allows_second_switch():
    lat = {"ms": 1.0}
    sel = _selector(lat)
    assert sel.current() == "pallas"
    lat["ms"] = 500.0
    assert sel.maybe_reprobe() == "scan"
    lat["ms"] = 1.0
    assert sel.maybe_reprobe() == "pallas"
    assert [d["switched"] for d in sel.decisions].count(True) == 2


def test_hysteresis_band_never_flaps():
    # default limit 20 ms: band is [10, 40) once chosen
    lat = {"ms": 1.0}
    sel = _selector(lat)
    assert sel.current() == "pallas"
    for ms in (25.0, 39.0, 15.0, 35.0):  # above limit but below 2x
        lat["ms"] = ms
        assert sel.maybe_reprobe() == "pallas"
    lat["ms"] = 41.0  # crosses 2x -> leave pallas
    assert sel.maybe_reprobe() == "scan"
    for ms in (15.0, 11.0, 39.0):  # above 0.5x -> stay scan
        lat["ms"] = ms
        assert sel.maybe_reprobe() == "scan"
    lat["ms"] = 9.0  # below 0.5x -> re-enter pallas
    assert sel.maybe_reprobe() == "pallas"
    assert [d["switched"] for d in sel.decisions].count(True) == 2


def test_forced_mode_never_probes(monkeypatch):
    monkeypatch.setenv("SEQ2SEQ_RNN_BACKEND", "scan")

    def boom():
        raise AssertionError("forced mode must not probe")

    sel = BackendSelector(measure=boom, platform=lambda: "tpu")
    assert sel.current() == "scan"
    assert sel.maybe_reprobe() == "scan"
    assert sel.decisions == []


def test_cpu_always_scan():
    lat = {"ms": 0.01}
    sel = _selector(lat, platform="cpu")
    assert sel.current() == "scan"
    assert sel.maybe_reprobe() == "scan"


def test_measure_failure_falls_back_to_scan():
    def boom():
        raise RuntimeError("no pallas on this backend")

    sel = BackendSelector(measure=boom, platform=lambda: "tpu")
    assert sel.current() == "scan"
    # the failure reason is visible in the decision trail, never silent
    assert "no pallas" in sel.decisions[-1]["error"]


def test_measure_failure_keeps_prior_pallas():
    """A transient probe failure must not flip a working pallas session
    to scan (round-3 regression: a TracerArrayConversionError during a
    traced first resolution silently poisoned the session)."""
    state = {"ms": 1.0, "boom": False}

    def measure():
        if state["boom"]:
            raise RuntimeError("transient tunnel hiccup")
        return state["ms"]

    sel = BackendSelector(measure=measure, platform=lambda: "tpu")
    assert sel.current() == "pallas"
    state["boom"] = True
    assert sel.maybe_reprobe() == "pallas"  # keep prior choice
    assert sel.decisions[-1]["dispatch_ms"] is None
    assert "hiccup" in sel.decisions[-1]["error"]
    state["boom"] = False
    state["ms"] = 500.0
    assert sel.maybe_reprobe() == "scan"  # real measurements still act


def test_report_exposes_trail():
    lat = {"ms": 1.0}
    sel = _selector(lat)
    sel.current()
    lat["ms"] = 500.0
    sel.maybe_reprobe()
    rep = sel.report()
    assert rep["rnn_backend"] == "scan"
    assert rep["pallas_dispatch_ms"] == 500.0
    assert len(rep["decision_trail"]) == 2
    assert rep["decision_trail"][-1]["switched"]


def test_global_selector_compat_api():
    # the module-level shim used by scripts: reset + re-resolve on CPU
    from seq2seq_abcd_vae_tpu.utils.backend_select import resolve_rnn_backend
    resolve_rnn_backend.cache_clear()
    assert resolve_rnn_backend() == "scan"  # tests run on CPU
    assert backend_report()["rnn_backend"] == "scan"
    assert SELECTOR.current() == "scan"
