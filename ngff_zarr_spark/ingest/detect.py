"""Backend auto-detection (S12).

Parity: /root/reference py/ngff_zarr/detect_cli_io_backend.py:21-128 —
`.zarray` probe first, then extension tables in priority order
(ngff-zarr, nibabel-for-NIfTI, itkwasm under the 2 GB single-file
cutoff, itk, tifffile, imageio fallback). The extension tables are the
reference's published lists; tifffile's table is snapshotted statically
because the library is not importable here.
"""

from __future__ import annotations

from enum import Enum
from pathlib import Path

ITKWASM_SINGLE_FILE_CUTOFF_BYTES = 2e9  # detect_cli_io_backend.py:73


class ConversionBackend(Enum):
    NGFF_ZARR = "ngff_zarr"
    ZARR_ARRAY = "zarr"
    NIBABEL = "nibabel"
    ITKWASM = "itkwasm_image_io"
    ITK = "itk"
    TIFFFILE = "tifffile"
    IMAGEIO = "imageio"


NGFF_ZARR_EXTENSIONS = (".zarr", ".ome.zarr")
NIBABEL_EXTENSIONS = (".nii", ".nii.gz")

ITKWASM_EXTENSIONS = (
    ".bmp", ".dcm", ".gipl", ".gipl.gz", ".hdf5", ".jpg", ".jpeg", ".iwi",
    ".iwi.cbor", ".iwi.cbor.zst", ".lsm", ".mnc", ".mnc.gz", ".mnc2",
    ".mgh", ".mhz", ".mha", ".mhd", ".mrc", ".nia", ".nii", ".nii.gz",
    ".hdr", ".nrrd", ".nhdr", ".png", ".pic", ".vtk", ".aim", ".isq",
    ".fdf",
)

ITK_EXTENSIONS = (
    ".bmp", ".dcm", ".gipl", ".gipl.gz", ".hdf5", ".jpg", ".jpeg", ".iwi",
    ".iwi.cbor", ".iwi.cbor.zst", ".lsm", ".mnc", ".mnc.gz", ".mnc2",
    ".mgh", ".mhz", ".mha", ".mhd", ".mrc", ".nia", ".nii", ".nii.gz",
    ".hdr", ".nrrd", ".nhdr", ".png", ".pic", ".vtk", ".isq", ".aim",
    ".fdf",
)

# tifffile.TIFF.FILE_EXTENSIONS snapshot (tifffile is a public library;
# the reference builds this list at runtime, detect_cli_io_backend.py:115-121)
TIFFFILE_EXTENSIONS = (
    ".tif", ".tiff", ".ome.tif", ".ome.tiff", ".lsm", ".stk", ".qpi",
    ".pcoraw", ".qptiff", ".ptif", ".ndpi", ".scn", ".svs", ".avs",
    ".bif", ".gel", ".svslide", ".philips.tif",
)


def detect_cli_io_backend(input: list[str]) -> ConversionBackend:
    """Pick the ingest backend for a list of input paths."""
    first = Path(input[0])
    if (first / ".zarray").exists():
        return ConversionBackend.ZARR_ARRAY

    extension = "".join(first.suffixes).lower()

    if extension in NGFF_ZARR_EXTENSIONS:
        return ConversionBackend.NGFF_ZARR
    if extension in NIBABEL_EXTENSIONS:
        return ConversionBackend.NIBABEL
    if (
        extension in ITKWASM_EXTENSIONS
        and len(input) == 1
        and first.is_file()
        and first.stat().st_size < ITKWASM_SINGLE_FILE_CUTOFF_BYTES
    ):
        return ConversionBackend.ITKWASM
    if extension in ITK_EXTENSIONS:
        return ConversionBackend.ITK
    if extension in TIFFFILE_EXTENSIONS:
        return ConversionBackend.TIFFFILE
    return ConversionBackend.IMAGEIO
