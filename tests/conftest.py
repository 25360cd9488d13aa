"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment pins ``JAX_PLATFORMS=axon`` (one real TPU chip via a tunnel)
through a sitecustomize hook that also overrides the jax config, so setting
the env var is not enough — we update the jax config directly before any
backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

DATA_DIR = REPO_ROOT / "tests" / "data"
SPECIMEN_DIR = REPO_ROOT / "tests" / "specimen"

import pytest


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA_DIR


@pytest.fixture(scope="session")
def specimen_dir() -> pathlib.Path:
    return SPECIMEN_DIR
