"""Reference seed-index build & access (reference analog: src/c++/lib/reference)."""

from .build import SeedIndex, build_index, TOO_MANY_POS  # noqa: F401
