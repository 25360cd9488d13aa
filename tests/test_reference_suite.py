"""Drop-in parity: the reference's OWN Python binding test suite must pass
unmodified against this package (``sys.modules['needletail'] = needletail_tpu``).

Runs only where a reference checkout is present (this repo's dev
environment); ``tests/test_api.py`` carries the same vectors natively for
CI.  Ref: /root/reference/test_python.py (27 tests).
"""

import pathlib
import subprocess
import sys

import pytest

REFERENCE = pathlib.Path("/root/reference/test_python.py")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not present"
)

_PROG = """
import sys
import needletail_tpu
sys.modules["needletail"] = needletail_tpu
sys.path.insert(0, "/root/reference")
import unittest
suite = unittest.TestLoader().discover("/root/reference", pattern="test_python.py")
r = unittest.TextTestRunner(verbosity=0).run(suite)
print(f"RAN={r.testsRun} FAIL={len(r.failures)} ERR={len(r.errors)}")
sys.exit(0 if r.wasSuccessful() and r.testsRun >= 27 else 1)
"""


def test_reference_binding_suite_passes_unmodified():
    proc = subprocess.run(
        [sys.executable, "-c", _PROG],
        capture_output=True,
        cwd=str(pathlib.Path(__file__).resolve().parent.parent),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()
    assert "FAIL=0 ERR=0" in proc.stdout.decode()
