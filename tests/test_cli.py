"""CLI surface tests (reference: src/sopro/cli.py) on a random-init stack."""

import subprocess
import sys

import numpy as np
import pytest


def run_cli(args, timeout=900):
    return subprocess.run(
        [sys.executable, "-m", "sopro_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
    )


def test_cli_help():
    r = run_cli(["--help"])
    assert r.returncode == 0
    assert "--ref_audio" in r.stdout and "--max_frames" in r.stdout
    # dead reference flags are not replicated (SURVEY.md §2.1)
    assert "--stop_patience" not in r.stdout


def test_cli_requires_exactly_one_ref(tmp_path):
    r = run_cli(["--text", "hi", "--random_init", "--device", "cpu",
                 "--out", str(tmp_path / "o.wav")])
    assert r.returncode == 2
    assert "exactly one" in r.stderr


@pytest.mark.slow
def test_cli_synthesize_random(tmp_path):
    toks = np.random.default_rng(0).integers(0, 2048, size=(24, 32)).astype(np.int32)
    np.save(tmp_path / "ref.npy", toks)
    out = tmp_path / "out.wav"
    r = run_cli([
        "--text", "hello world", "--random_init", "--device", "cpu",
        "--ref_tokens", str(tmp_path / "ref.npy"), "--out", str(out),
        "--max_frames", "16", "--seed", "1",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 44
    from sopro_tpu.audio import load_audio_file

    wav, sr = load_audio_file(str(out))
    assert sr == 24000
    assert wav.shape[0] % 1920 == 0


@pytest.mark.slow
def test_cli_long_form(tmp_path):
    """--long splits into sentence chunks, batches, and stitches with
    silence gaps (capability past the reference's 32 s cap)."""
    toks = np.random.default_rng(0).integers(0, 2048, size=(24, 32)).astype(np.int32)
    np.save(tmp_path / "ref.npy", toks)
    out = tmp_path / "out.wav"
    r = run_cli([
        "--text", "First sentence. Second sentence. Third one.",
        "--random_init", "--device", "cpu",
        "--ref_tokens", str(tmp_path / "ref.npy"), "--out", str(out),
        "--max_frames", "12", "--seed", "1", "--long", "--gap_ms", "50",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    from sopro_tpu.audio import load_audio_file

    wav, sr = load_audio_file(str(out))
    assert sr == 24000 and wav.size > 0


def test_cli_stream_long_conflict(tmp_path):
    r = run_cli(["--text", "hi", "--random_init", "--device", "cpu",
                 "--ref_tokens", "x.npy", "--stream", "--long",
                 "--out", str(tmp_path / "o.wav")])
    assert r.returncode == 2
    assert "mutually exclusive" in r.stderr
