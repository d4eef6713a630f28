"""CLI tests: flag contract, error paths, end-to-end with random tiny weights."""

from pathlib import Path

import numpy as np
import pytest

from voxtral_tpu.audio import AudioBuffer, save_wav

FIXTURES = Path(__file__).parent / "fixtures"
REPO = Path(__file__).parent.parent


def run_cli(*argv, timeout=300):
    """Run the CLI in-process via main() for speed; returns (code, out, err)."""
    import contextlib
    import io

    from voxtral_tpu.cli import main

    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        code = main(list(argv))
    return code, out.getvalue(), err.getvalue()


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    path = tmp_path_factory.mktemp("audio") / "tone.wav"
    t = np.arange(32000) / 16000.0
    sig = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    save_wav(AudioBuffer(sig, 16000), path)
    return str(path)


def test_no_audio_is_error():
    code, out, err = run_cli("--random-weights")
    assert code == 2
    assert "no audio files" in err


def test_audio_conflicts_with_audio_list(wav):
    code, out, err = run_cli("--audio", wav, "--audio-list", "x.txt")
    assert code == 2
    assert "conflicts" in err


def test_bad_max_mel_frames(wav):
    code, out, err = run_cli(
        "--audio", wav, "--random-weights", "--max-mel-frames", "0"
    )
    assert code == 2
    assert "max-mel-frames" in err


def test_missing_model_dir(wav):
    code, out, err = run_cli("--audio", wav, "--model", "/nonexistent")
    assert code == 2
    assert "model not found" in err


def test_gguf_requires_tokenizer(wav):
    code, out, err = run_cli("--audio", wav, "--gguf", "/nonexistent.gguf")
    assert code == 2
    assert "requires --tokenizer" in err


def test_missing_audio_file_continues():
    code, out, err = run_cli(
        "--audio", "/nonexistent.wav", "--random-weights",
        "--params", str(FIXTURES / "params_tiny.json"),
    )
    assert code == 1
    assert "audio file not found" in err
    assert out == "\n"  # empty line still printed (one line per file)


def test_end_to_end_random_tiny(wav, tmp_path):
    """Full pipeline through the CLI with tiny random weights: one line per file."""
    code, out, err = run_cli(
        "--audio", wav, "--audio", wav,
        "--random-weights", "--params", str(FIXTURES / "params_tiny.json"),
        "--dtype", "float32",
    )
    assert code == 0
    lines = out.splitlines()
    assert len(lines) == 2  # one line per input file


def test_audio_list(wav, tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text(f"{wav}\n\n{wav}\n")
    code, out, err = run_cli(
        "--audio-list", str(lst),
        "--random-weights", "--params", str(FIXTURES / "params_tiny.json"),
        "--dtype", "float32",
    )
    assert code == 0
    assert len(out.splitlines()) == 2


@pytest.fixture(scope="module")
def tiny_params_file():
    return str(FIXTURES / "params_tiny.json")


def test_cli_tp_matches_single_device(wav, tiny_params_file):
    """``--tp 2`` on the virtual mesh must run end-to-end and produce
    byte-identical stdout to the single-device run (token-level identity
    is pinned in tests/test_parallel.py; this covers the flag surface:
    mesh construction -> shard_params -> sharded transcribe)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    base = ["--audio", wav, "--random-weights",
            "--params", tiny_params_file, "--dtype", "float32"]
    code_ref, out_ref, _ = run_cli(*base)
    assert code_ref == 0
    code_tp, out_tp, _ = run_cli(*base, "--tp", "2")
    assert code_tp == 0
    assert out_tp == out_ref
    code_dp, out_dp, _ = run_cli(*base, "--dp", "4")
    assert code_dp == 0
    assert out_dp == out_ref


def test_cli_tp_too_many_devices(wav, tiny_params_file):
    code, out, err = run_cli(
        "--audio", wav, "--random-weights", "--params", tiny_params_file,
        "--tp", "64",
    )
    assert code == 2
    assert "devices" in err


def test_cli_tp_invalid(wav, tiny_params_file):
    code, out, err = run_cli(
        "--audio", wav, "--random-weights", "--params", tiny_params_file,
        "--tp", "0",
    )
    assert code == 2


def test_cli_batch_files_matches_sequential(wav, tiny_params_file, tmp_path):
    """--batch-files must produce the same lines in the same order as the
    sequential per-file loop (duplicate files included)."""
    base = ["--audio", wav, "--audio", wav,
            "--random-weights", "--params", tiny_params_file,
            "--dtype", "float32"]
    code_seq, out_seq, _ = run_cli(*base)
    code_b, out_b, _ = run_cli(*base, "--batch-files", "4")
    assert code_seq == 0 and code_b == 0
    assert out_b == out_seq
    assert len(out_b.splitlines()) == 2


def test_cli_batch_files_missing_file(wav, tiny_params_file):
    code, out, err = run_cli(
        "--audio", wav, "--audio", "/nonexistent.wav",
        "--random-weights", "--params", tiny_params_file,
        "--dtype", "float32", "--batch-files", "4",
    )
    assert code == 1
    assert "not found" in err
    lines = out.splitlines()
    assert len(lines) == 2 and lines[1] == ""  # placeholder line kept


def test_cli_timestamps(wav):
    """--timestamps prints one JSON object per file with text + words."""
    import json

    code, out, err = run_cli(
        "--audio", wav, "--random-weights",
        "--params", str(FIXTURES / "params_tiny.json"),
        "--dtype", "float32", "--timestamps",
    )
    assert code == 0
    payload = json.loads(out.splitlines()[0])
    assert payload["file"] == wav
    assert "text" in payload and isinstance(payload["words"], list)
    for w in payload["words"]:
        assert 0.0 <= w["start"] <= w["end"]


def test_cli_timestamps_conflicts_with_batch_files(wav):
    code, out, err = run_cli(
        "--audio", wav, "--random-weights", "--timestamps",
        "--batch-files", "4",
    )
    assert code == 2
    assert "timestamps" in err


# -- --server remote mode (thin client, no local weights) ---------------------


@pytest.fixture(scope="module")
def cli_server():
    import threading

    import jax
    import jax.numpy as jnp

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.serving import make_server
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    tokenizer = VoxtralTokenizer([None] * 500, {}, 500)
    pipeline = TranscribePipeline(model, tokenizer, PipelineConfig())
    srv = make_server(pipeline, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    srv.shutdown()


def test_cli_server_mode(wav, cli_server):
    code, out, err = run_cli("-a", wav, "--server", cli_server)
    assert code == 0, err
    assert out.endswith("\n")  # one text line per file


def test_cli_server_timestamps(wav, cli_server):
    import json

    code, out, err = run_cli("-a", wav, "--server", cli_server,
                             "--timestamps")
    assert code == 0, err
    payload = json.loads(out.strip())
    assert payload["file"] == wav
    assert set(payload) == {"file", "text", "words"}


def test_cli_server_missing_file_and_errors(cli_server, wav):
    code, out, err = run_cli("-a", "/nope.wav", "-a", wav,
                             "--server", cli_server)
    assert code == 1
    assert "not found" in err
    assert len(out.splitlines()) == 2  # blank line then the real file

    # Conflicting flags fail before any network traffic.
    code, _, err = run_cli("-a", wav, "--server", cli_server, "--tp", "2")
    assert code == 2 and "--tp" in err
    code, _, err = run_cli("-a", wav, "--server", cli_server,
                           "--random-weights")
    assert code == 2 and "--random-weights" in err

    # https is refused up front (stdlib server is plain http).
    code, _, err = run_cli("-a", wav, "--server", "https://x")
    assert code == 2 and "scheme" in err

    # Unreachable server -> per-file error, exit 1.
    code, out, err = run_cli("-a", wav, "--server", "http://127.0.0.1:9")
    assert code == 1 and "failed" in err
