"""PESQ resolution tests (round-3): the from-spec P.862 model's behavior is
regression-pinned, and the external-implementation hook contract is tested
both ways (preferred when installed, explicit opt-in required otherwise).

The from-spec model is UNCERTIFIED (module docstring documents the
deviations); what these tests pin is (a) its psychoacoustic orderings are
right, (b) its numeric outputs don't silently drift, (c) the CLI hook
behaves per contract.
"""

import sys
import types

import numpy as np
import pytest

from aec_tpu.train.pesq import pesq, pesq_available, pesq_score
from benchmarks.scenes import speech_like


@pytest.fixture(scope="module")
def clean():
    rng = np.random.default_rng(0)
    return speech_like(rng, 3 * 16000, f0=120.0, gain=0.3).astype(np.float64)


def _noisy(clean, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(clean))
    noise *= np.sqrt(np.mean(clean**2) / np.mean(noise**2)) * 10 ** (
        -snr_db / 20
    )
    return clean + noise


def test_identity_is_max(clean):
    s = pesq(clean, clean)
    assert s > 4.55  # the WB map's ceiling is ~4.64


def test_monotone_in_snr(clean):
    scores = [pesq(clean, _noisy(clean, s)) for s in (30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 4.2  # 30 dB: nearly transparent
    assert scores[-1] < 2.2  # 0 dB: bad


def test_monotone_in_clipping(clean):
    peak = float(np.abs(clean).max())
    scores = [
        pesq(clean, np.clip(clean, -c * peak, c * peak))
        for c in (0.8, 0.4, 0.15)
    ]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores


def test_delay_invariance(clean):
    """The alignment stage must absorb bulk delay (AEC outputs are aligned
    by construction, but the metric should not depend on it)."""
    delayed = np.concatenate([np.zeros(640), clean])[: len(clean)]
    assert abs(pesq(clean, delayed) - pesq(clean, clean)) < 0.05


def test_regression_pins(clean):
    """Numeric pins: catch silent behavior drift of the from-spec model.
    (These are THIS implementation's values, not ITU-certified scores.)"""
    got = {
        "identity": pesq(clean, clean),
        "snr20": pesq(clean, _noisy(clean, 20)),
        "snr5": pesq(clean, _noisy(clean, 5)),
    }
    want = {"identity": 4.644, "snr20": 4.085, "snr5": 2.057}
    for k in want:
        assert abs(got[k] - want[k]) < 0.15, (k, got[k], want[k])


def test_nb_mode_runs():
    rng = np.random.default_rng(3)
    c = speech_like(rng, 2 * 8000 * 2, f0=120.0, gain=0.3)[: 2 * 8000]
    s = pesq(c.astype(np.float64), c.astype(np.float64), sr=8000)
    assert 1.0 <= s <= 4.6


def test_hook_requires_opt_in_without_external(clean, monkeypatch):
    if pesq_available():  # pragma: no cover - not in this image
        pytest.skip("external pesq installed")
    with pytest.raises(RuntimeError, match="allow-approx-pesq"):
        pesq_score(clean, clean, 16000)
    out = pesq_score(clean, clean, 16000, allow_fallback=True)
    assert out["pesq_impl"] == "p862_from_spec"
    assert out["pesq"] > 4.5


def test_hook_prefers_external(clean, monkeypatch):
    """When an external `pesq` module exists it wins, without any opt-in."""
    fake = types.ModuleType("pesq")
    fake.pesq = lambda sr, ref, deg, mode: 3.21
    monkeypatch.setitem(sys.modules, "pesq", fake)
    out = pesq_score(clean, clean, 16000)
    assert out == {"pesq": 3.21, "pesq_impl": "external"}


def test_measure_cli_pesq(clean, tmp_path, monkeypatch):
    """End-to-end through the metric CLI: gated without the flag, scored
    with it."""
    from scipy.io import wavfile

    from aec_tpu.cli import measure

    ref_p, est_p = str(tmp_path / "ref.wav"), str(tmp_path / "est.wav")
    wavfile.write(ref_p, 16000, clean.astype(np.float32))
    wavfile.write(est_p, 16000, _noisy(clean, 15).astype(np.float32))

    if not pesq_available():
        with pytest.raises(SystemExit, match="allow-approx-pesq"):
            measure.main(["--est", est_p, "--ref", ref_p, "--metrics", "pesq"])

    out_json = str(tmp_path / "scores.json")
    measure.main(
        ["--est", est_p, "--ref", ref_p, "--metrics", "pesq,stoi",
         "--allow-approx-pesq", "--json_out", out_json]
    )
    import json

    report = json.load(open(out_json))
    got = report["utterances"][0]
    assert 1.0 <= got["pesq"] <= 4.7
    assert got["pesq_impl"] in ("external", "p862_from_spec")
    assert 0.0 <= got["stoi"] <= 1.0
