"""Run the shipped example scripts (tiny mode) so the docs stay honest
— the reference keeps the same tier (tests/examples/)."""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _run(args, timeout=420):
    env = dict(os.environ, HT_OMNI_EXAMPLE_TINY="1",
               HT_OMNI_PLATFORM="cpu")
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        timeout=timeout, cwd=_ROOT, env=env,
    )


def test_offline_chat_example():
    out = _run(["examples/offline_chat.py"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip()


def test_offline_image_example():
    out = _run(["examples/offline_image.py"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "image:" in out.stdout


def test_offline_image_family_example():
    out = _run(["examples/offline_image_family.py", "z-image", "a tree"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "family z-image: image" in out.stdout


def test_offline_tts_example(tmp_path):
    wav = str(tmp_path / "out.wav")
    out = _run(["examples/offline_tts.py", wav])
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(wav) and os.path.getsize(wav) > 44
