"""End-to-end stdin subprocess tests (ref tests/test_stdin.rs:1-140): pipe
plain and compressed streams into the real ``examples/stdin_pipe.py``
process and assert on its stdout text — the reference's only
multi-process test, reproduced byte-for-byte ('8 bases', '0 AAAAs')."""

import bz2
import gzip
import lzma
import os
import subprocess
import sys

import pytest

from conftest import REPO_ROOT

PIPELINE = REPO_ROOT / "examples" / "stdin_pipe.py"
PAYLOAD = b">id1\nAGTCGTCA"
EXPECTED = "There are 8 bases in your file.\nThere are 0 AAAAs in your file.\n"


def _run(stdin_bytes: bytes) -> str:
    proc = subprocess.run(
        [sys.executable, str(PIPELINE)],
        input=stdin_bytes,
        capture_output=True,
        cwd=str(REPO_ROOT),
        env={
            **os.environ,
            "PYTHONPATH": str(REPO_ROOT) + os.pathsep + os.environ.get("PYTHONPATH", ""),
        },
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr.decode(errors="replace")
    return proc.stdout.decode()


def test_plain_stdin():
    assert _run(PAYLOAD) == EXPECTED


def test_gzip_stdin():
    assert _run(gzip.compress(PAYLOAD)) == EXPECTED


def test_bzip2_stdin():
    assert _run(bz2.compress(PAYLOAD)) == EXPECTED


def test_xz_stdin():
    assert _run(lzma.compress(PAYLOAD)) == EXPECTED


def test_zstd_stdin():
    zstd = pytest.importorskip("zstandard")
    assert _run(zstd.ZstdCompressor().compress(PAYLOAD)) == EXPECTED


def test_error_via_stdin():
    proc = subprocess.run(
        [sys.executable, str(PIPELINE)],
        input=b"\x00\x01garbage",
        capture_output=True,
        cwd=str(REPO_ROOT),
        env={
            **os.environ,
            "PYTHONPATH": str(REPO_ROOT) + os.pathsep + os.environ.get("PYTHONPATH", ""),
        },
        timeout=300,
    )
    assert proc.returncode != 0
