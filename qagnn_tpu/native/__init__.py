"""Native (C++) host-side components, loaded via ctypes.

The shared library is built on demand with g++ (cached next to the source);
every native entry point has a pure-numpy fallback so the framework works
without a toolchain.
"""

from qagnn_tpu.native.build import load_native

__all__ = ["load_native"]
