"""Native (C++) runtime components.

Where the reference leans on native C below the JVM (GMP byte-array
plumbing, VCR eio — SURVEY.md §2.3/§2.4), this package holds the
framework's C++ host-path code, compiled on demand with the system
toolchain and loaded via ctypes.  Every native function has a
vectorized numpy fallback so the framework runs without a compiler.
"""

from vmn_tpu.native.build import get_lib  # noqa: F401
