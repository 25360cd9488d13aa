"""Build hook: compile the native framer into the wheel.

The framer (csrc/framer.cpp) exposes a plain C ABI loaded via ctypes —
there is no Python extension module to import.  We still build it through
setuptools' Extension machinery so wheels carry a platform-correct shared
object at ``needletail_tpu/_ntframer*.so`` (``io.native`` looks there
first, then falls back to lazily ``make``-ing ``csrc/`` in a source
checkout, then to the pure-Python framers).
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class ctypes_build_ext(build_ext):
    """Skip the PyInit export check: the library is ctypes-loaded."""

    def get_export_symbols(self, ext):
        return []


setup(
    ext_modules=[
        Extension(
            "needletail_tpu._ntframer",
            sources=["csrc/framer.cpp"],
            language="c++",
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
    cmdclass={"build_ext": ctypes_build_ext},
)
