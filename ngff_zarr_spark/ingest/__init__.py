"""Ingest adapters (SURVEY S11-S17): multi-format file → pixel-table
NgffImage, with backend auto-detection.

The imaging libraries the reference wraps (nibabel, tifffile, imageio,
itk) are not installed in this environment, so the formats the test
suite exercises are parsed directly from their public binary layouts
(ingest/nifti.py, ingest/tiff.py, ingest/png.py); a real installation
of those libraries slots in behind the same functions via import-try.
"""

from .detect import ConversionBackend, detect_cli_io_backend
from .cli import cli_input_to_ngff_image

__all__ = ["ConversionBackend", "detect_cli_io_backend", "cli_input_to_ngff_image"]
