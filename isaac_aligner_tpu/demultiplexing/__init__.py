"""Demultiplexing: sample sheets and barcode resolution.

Reference analog: src/c++/lib/demultiplexing (SampleSheetCsv,
BarcodeLoader/BarcodeResolver, DemultiplexingStats).
"""

from .samplesheet import BarcodeSpec, parse_sample_sheet  # noqa: F401
from .resolver import resolve_barcodes  # noqa: F401
