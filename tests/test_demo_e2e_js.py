"""Real-JS execution of the shipped demo page (skips without a JS runtime).

The reference proves its browser demo by executing it in headless
Chromium (``tests/e2e_browser.spec.ts:38-116``).  The TPU demo is a
served page whose client JS needs only ``fetch`` — so the equivalent
proof is running the SHIPPED ``<script>`` under any JS runtime against a
live server and asserting the real capture→resample→/stream pipeline
transcribes (``tests/js/demo_e2e.mjs``).

This image carries no browser and no JS engine (zero egress), so the
test self-skips here — the same tier-degradation the reference uses for
its GPU tests in CI (``.github/workflows/ci.yml:42-52``).  To keep the
page's DSP guaranteed in THIS environment regardless, a source tripwire
pins the resampler class: any edit to the shipped JS fails the pin until
the Python mirror in ``test_demo_page.py`` is re-synced and re-verified.
"""

from __future__ import annotations

import hashlib
import json
import re
import shutil
import subprocess
import threading
from pathlib import Path

import pytest

PAGE = Path(__file__).parent.parent / "voxtral_tpu/serving/static/index.html"
RUNNER = Path(__file__).parent / "js" / "demo_e2e.mjs"

# sha256 of the page's StreamResampler class source.  If this fails you
# edited the shipped resampler: (1) mirror the change in
# tests/test_demo_page.py::PyStreamResampler, (2) re-run its DSP tests,
# (3) update this pin.  (With a JS runtime present, the E2E below
# executes the real artifact instead.)
RESAMPLER_SHA256 = (
    "f1fee9bd3cb9f5ce42a4fe672a8962b44ef2d0c6e8093ba914096cf9762508b6"
)


def _resampler_source() -> str:
    src = PAGE.read_text()
    m = re.search(r"class StreamResampler \{[\s\S]*?\n\}", src)
    assert m, "StreamResampler class not found in page"
    return m.group(0)


def test_resampler_source_pinned():
    digest = hashlib.sha256(_resampler_source().encode()).hexdigest()
    assert digest == RESAMPLER_SHA256, (
        "shipped StreamResampler changed — re-sync PyStreamResampler in "
        f"test_demo_page.py, re-run its DSP tests, then pin {digest}"
    )


def _js_runtime():
    return shutil.which("node") or shutil.which("deno")


@pytest.mark.skipif(_js_runtime() is None,
                    reason="no JS runtime (node/deno) in this image")
def test_demo_page_js_executes_against_live_server(tmp_path):
    """Run the SHIPPED page script under Node against make_server with a
    tiny random model; the page's driveSynthetic() must stream synthetic
    audio through the real resampler + /stream protocol and decode."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.pipeline import TranscribePipeline
    from voxtral_tpu.serving.server import make_server
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    cfg = VoxtralConfig.from_file(
        Path(__file__).parent / "fixtures" / "params_tiny.json")
    model = VoxtralModel.init_random(jax.random.PRNGKey(0), cfg, jnp.float32)
    pipeline = TranscribePipeline(
        model, VoxtralTokenizer([None] * 131072, {}, 131072))
    server = make_server(pipeline, port=0, pool_streams=2)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        runtime = _js_runtime()
        cmd = [runtime]
        if runtime and runtime.endswith("deno"):
            cmd += ["run", "--allow-read", "--allow-net"]
        cmd += [str(RUNNER), f"http://127.0.0.1:{port}", str(PAGE), "4"]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        assert 0.9 * 64000 < res["sent16k"] <= 64000
        assert res["tokens"] > 0
    finally:
        server.shutdown()
