"""Native (C++) runtime components, loaded via ctypes.

Where the reference uses C++ for its I/O-bound runtime (BGZF compression,
src/c++/lib/bgzf), this package holds the equivalent native code.  Each
component degrades gracefully to a pure-Python fallback when the shared
library cannot be built.
"""

from .build import load_library  # noqa: F401
