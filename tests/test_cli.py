"""CLI smoke tests (the product surface over the TPU pipelines)."""

import json
import subprocess
import sys

import numpy as np

from conftest import DATA_DIR, REPO_ROOT


def _run(*argv):
    import os

    # run CLI children on local CPU: drop the axon-TPU registration (the
    # tunnel's congestion would make these tests flaky-slow) and let the
    # JAX_PLATFORMS env var take effect
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "needletail_tpu.cli", *argv],
        capture_output=True,
        cwd=str(REPO_ROOT),
        env=env,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr.decode(errors="replace")
    return proc.stdout.decode(), proc.stderr.decode()


def test_stats():
    out, _ = _run("stats", str(DATA_DIR / "PRJNA271013_head.fq"))
    d = json.loads(out)
    assert d["reads"] == 2000 and d["bases"] == 250_000


def test_count_top_and_output(tmp_path):
    out_npz = tmp_path / "spec.npz"
    out, err = _run(
        "count", str(DATA_DIR / "test.fa"), "-k", "4", "--top", "2", "-o", str(out_npz)
    )
    assert "8 canonical 4-mers" in err
    assert len(out.strip().splitlines()) == 2
    with np.load(out_npz) as z:
        assert z["counts"].sum() == 8


def test_hash_count():
    out, _ = _run("hash-count", str(DATA_DIR / "PRJNA271013_head.fq"), "-k", "21")
    d = json.loads(out)
    assert d["windows"] == 209_965 and d["forward"] == 106_181


def test_count_multi_k(tmp_path):
    out_npz = tmp_path / "multi.npz"
    _, err = _run(
        "count", str(DATA_DIR / "test.fa"), "-k", "2,4", "-o", str(out_npz)
    )
    assert "2 k values in one pass" in err
    with np.load(out_npz) as z:
        assert set(z["ks"]) == {2, 4}
        assert z["counts_4"].sum() == 8


def test_bgzip_roundtrip(tmp_path):
    out = tmp_path / "r.fq.bgz"
    _run("bgzip", str(DATA_DIR / "PRJNA271013_head.fq"), "-o", str(out))
    from needletail_tpu.io.bgzf import BGZFReader, is_bgzf

    assert is_bgzf(out)
    r = BGZFReader(out)
    data = r.read()
    r.close()
    assert data == (DATA_DIR / "PRJNA271013_head.fq").read_bytes()
    # and the framer reads it transparently (it IS multi-member gzip)
    o, _ = _run("stats", str(out))
    assert json.loads(o)["bases"] == 250_000
