"""Build hook for the OPTIONAL native rANS kernel.

The pure-Python/numpy engine is fully functional without this; the
extension only accelerates rANS-4x8 block decode/encode-walk inside
CRAM scans (see formats/rans_native.py). ``Extension(optional=True)``
makes a missing compiler a logged skip, never an install failure —
the runtime then falls back to the per-machine JIT compile of the SAME
rans_kernel.c, and failing that to the numpy/scalar codecs.

The artifact is a plain shared library loaded via ctypes (dlopen), not
imported — it has no PyInit entry point, so ``import _rans_kernel``
would fail by design; formats/rans_native.py locates the ABI-tagged
.so next to itself (_packaged_so).
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "hadoop_bam_spark.formats._rans_kernel",
            sources=["hadoop_bam_spark/formats/rans_kernel.c"],
            optional=True,
            extra_compile_args=["-O2"],
        )
    ],
)
