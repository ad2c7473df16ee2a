"""Checkpointed alignment workflow + CLI (reference analog:
src/c++/lib/workflow AlignWorkflow and bin/isaac-align)."""

from .align import AlignWorkflow  # noqa: F401
