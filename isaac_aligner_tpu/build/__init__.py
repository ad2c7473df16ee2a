"""Output pipeline: coordinate sort, duplicate marking, BAM generation.

Reference analog: src/c++/lib/build (Build / BinSorter /
DuplicatePairEndFilter / BamSerializer).
"""

from .dedup import mark_duplicates, coordinate_sort  # noqa: F401
