"""Browser-demo page tests.

The reference drives its demo in headless Chromium via Playwright
(``tests/e2e_browser.spec.ts:38-116``).  This image has no browser and no
JS engine (zero egress), so the strategy is:

1. REAL-JS execution when a runtime exists: ``tests/test_demo_e2e_js.py``
   runs the shipped ``<script>`` verbatim under Node/deno against a live
   server (skips in this image, which has neither);
2. a sha256 source tripwire on the shipped ``StreamResampler``
   (``test_demo_e2e_js.py``): any JS edit fails tests until the mirror
   below is re-synced — the mirror can no longer silently drift;
3. structural checks that the page ships the anti-aliased streaming
   resampler + AudioWorklet capture + the ``window.__voxtral`` test hooks
   (and NOT the naive nearest-sample decimation);
4. a line-for-line Python mirror of the page's ``StreamResampler``
   asserted for DSP quality (passband fidelity, alias rejection,
   chunk-size invariance) — the constants and control flow are kept
   identical so the JS inherits the guarantees;
5. the /stream protocol the page's driveSynthetic() hook uses is covered
   against a live server in tests/test_serving.py.

Manual browser run (documented for environments with Chrome):
    python -m voxtral_tpu.serving.server --random-weights --port 8377
    open http://127.0.0.1:8377/ and run in the console:
        await window.__voxtral.driveSynthetic(6)
    -> {sent16k: ~96000, tokens: >0, text: ...}
"""

from __future__ import annotations

import math
import re
from pathlib import Path

import numpy as np

PAGE = Path(__file__).parent.parent / "voxtral_tpu/serving/static/index.html"


class PyStreamResampler:
    """Python mirror of the page's StreamResampler (keep in sync!)."""

    def __init__(self, from_rate: int, to_rate: int = 16000, lobes: int = 8):
        self.ratio = from_rate / to_rate
        self.lobes = lobes
        self.half = math.ceil(lobes * max(1.0, self.ratio))
        self.fc = 0.45 * min(1.0, 1.0 / self.ratio)
        self.tail = np.zeros(0, np.float32)
        self.tail_start = 0
        self.next_out = 0

    def _kernel(self, x: float) -> float:
        if x == 0:
            return 2 * self.fc
        pix = math.pi * x
        return (math.sin(2 * self.fc * pix) / pix) * (
            0.5 + 0.5 * math.cos(pix / self.half)
        )

    def process(self, chunk: np.ndarray) -> np.ndarray:
        buf = np.concatenate([self.tail, chunk.astype(np.float32)])
        start = self.tail_start
        out = []
        while math.floor(self.next_out * self.ratio) + self.half < start + len(buf):
            center = self.next_out * self.ratio
            lo = max(0, math.ceil(center - self.half) - start)
            hi = min(len(buf) - 1, math.floor(center + self.half) - start)
            acc = 0.0
            for i in range(lo, hi + 1):
                acc += buf[i] * self._kernel(start + i - center)
            out.append(acc)
            self.next_out += 1
        keep_from = max(
            0, math.ceil(self.next_out * self.ratio - self.half) - start
        )
        self.tail = buf[keep_from:]
        self.tail_start = start + keep_from
        return np.asarray(out, np.float32)


def test_page_has_antialiased_resampler_and_hooks():
    src = PAGE.read_text()
    assert "StreamResampler" in src
    assert "audioWorklet" in src, "capture should prefer AudioWorklet"
    assert "window.__voxtral" in src and "driveSynthetic" in src
    # The old aliasing nearest-sample decimation must be gone.
    assert not re.search(r"buf\[Math\.floor\(i \* ratio\)\]", src)
    # Mirror-sync guards: the constants the Python mirror encodes.
    assert "0.45 * Math.min(1, 1 / this.ratio)" in src
    assert "0.5 + 0.5 * Math.cos(pix / this.half)" in src


def _run(rs, signal, block=4096):
    outs = [rs.process(signal[o:o + block]) for o in range(0, len(signal), block)]
    return np.concatenate(outs)


def test_resampler_passband_fidelity():
    """1 kHz sine at 48 kHz -> 16 kHz must match the ideal 16 kHz sine."""
    n = 48000
    t = np.arange(n) / 48000.0
    sig = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    out = _run(PyStreamResampler(48000), sig)
    assert len(out) > 15000
    j = np.arange(len(out))
    ideal = np.sin(2 * np.pi * 1000 * j / 16000.0)
    interior = slice(200, len(out) - 200)
    rmse = float(np.sqrt(np.mean((out[interior] - ideal[interior]) ** 2)))
    assert rmse < 0.02, rmse


def test_resampler_alias_rejection():
    """An 11 kHz tone (above the 8 kHz output Nyquist) must be suppressed,
    not folded into the speech band like the old nearest-sample decimation
    did."""
    n = 48000
    t = np.arange(n) / 48000.0
    sig = np.sin(2 * np.pi * 11000 * t).astype(np.float32)
    out = _run(PyStreamResampler(48000), sig)
    rms = float(np.sqrt(np.mean(out[200:-200] ** 2)))
    # input RMS is 0.707; demand >30 dB rejection.
    assert rms < 0.022, rms


def test_resampler_chunk_size_invariance():
    """Streaming in ragged blocks must produce the same samples as one
    big block (the FIR state carries across chunk boundaries)."""
    rng = np.random.default_rng(0)
    sig = (rng.normal(size=44100) * 0.3).astype(np.float32)

    one = PyStreamResampler(44100).process(sig)
    ragged = PyStreamResampler(44100)
    pieces = np.array_split(sig, [700, 701, 5000, 12345, 30000])
    out = np.concatenate([ragged.process(p) for p in pieces])
    n = min(len(one), len(out))
    np.testing.assert_allclose(out[:n], one[:n], atol=1e-6)


def test_resampler_non_integer_ratio():
    """44.1 kHz -> 16 kHz (ratio 2.75625) passband check."""
    n = 44100
    t = np.arange(n) / 44100.0
    sig = np.sin(2 * np.pi * 700 * t).astype(np.float32)
    out = _run(PyStreamResampler(44100), sig)
    j = np.arange(len(out))
    ideal = np.sin(2 * np.pi * 700 * j / 16000.0)
    interior = slice(200, len(out) - 200)
    rmse = float(np.sqrt(np.mean((out[interior] - ideal[interior]) ** 2)))
    assert rmse < 0.02, rmse
