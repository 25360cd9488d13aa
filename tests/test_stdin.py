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


BATCH_PROG = """
import jax
jax.config.update("jax_platforms", "cpu")  # env var alone loses to sitecustomize
from needletail_tpu.device.pipeline import count_file
n_bases, spec = count_file("-", k=4)
print(f"{n_bases} {int(spec.sum())}")
"""


@pytest.mark.parametrize(
    "codec", [lambda b: b, gzip.compress, bz2.compress, lzma.compress],
    ids=["plain", "gz", "bz2", "xz"],
)
def test_batched_stdin_count(codec):
    """count_file('-') streams batched stdin through every codec."""
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", BATCH_PROG],
        input=codec(b">id1\nAGTCGTCA\n"),
        capture_output=True,
        cwd=str(REPO_ROOT),
        env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr.decode(errors="replace")
    assert proc.stdout.decode().strip().endswith("8 5")
