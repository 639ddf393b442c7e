"""Native (C++) bit-I/O engine with ctypes bindings.

`load()` returns the binding or None if the shared library is absent and
cannot be built; callers fall back to the pure-Python implementations
(p64tpu.entropy.{bitio,encode,parse}), which remain the oracle."""

from .binding import NativeBitIO, load  # noqa: F401
