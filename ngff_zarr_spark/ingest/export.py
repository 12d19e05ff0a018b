"""Non-Zarr CLI outputs (reference cli.py:384-396: ``itk.imwrite`` on
the converted NgffImage when the OUTPUT path detects as an ITK format).

The reference hands the dense array to ITK's writer registry; here each
supported suffix dispatches to this package's native encoder, with the
axis reorderings each container expects. Export is inherently a
single-file materialization (the reference's ``.compute()`` before
``itk.imwrite``), so the pixel table is gathered to the driver through
one Arrow ``toPandas`` — the distributed path for big images is the
OME-Zarr store writer, not these interchange formats.
"""

from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np

from ..model import NgffImage

# suffixes this module can write; the CLI uses membership here as its
# output-backend detection (reference detect_cli_io_backend on the
# output path, cli.py:352-356)
EXPORT_SUFFIXES = (
    ".nii", ".nii.gz", ".mgh", ".mgz", ".mrc", ".nrrd", ".mha",
    ".png", ".bmp", ".tif", ".tiff", ".gif", ".webp", ".jpg", ".jpeg",
)


def detect_export_suffix(path: str) -> str | None:
    low = str(path).lower()
    for s in sorted(EXPORT_SUFFIXES, key=len, reverse=True):
        if low.endswith(s):
            return s
    return None


def _dense_array(image: NgffImage) -> np.ndarray:
    """Gather the pixel table to a dense ndarray indexed in the image's
    own dims order, cast to the logical dtype."""
    dims = list(image.dims)
    dtype = np.dtype(image.dtype or "float64")
    shape = tuple(int(image.shape[d]) for d in dims)
    arr = np.zeros(shape, dtype=dtype)
    pdf = image.data.select(*dims, "v").toPandas()
    idx = tuple(pdf[d].to_numpy() for d in dims)
    vals = pdf["v"].to_numpy()
    if np.issubdtype(dtype, np.integer):
        vals = np.rint(vals)
    arr[idx] = vals.astype(dtype)
    return arr


def _squeeze_to(image: NgffImage, arr: np.ndarray, want: list[str]):
    """Reorder/squeeze ``arr`` (in image dims order) to the dims in
    ``want`` (subset order), dropping singleton dims not wanted and
    refusing to drop non-singletons."""
    dims = list(image.dims)
    for d in list(dims):
        if d not in want:
            if image.shape.get(d, 1) != 1:
                raise ValueError(
                    f"cannot export dim {d!r} of size {image.shape[d]} "
                    f"to a container limited to dims {want}"
                )
            arr = np.take(arr, 0, axis=dims.index(d))
            dims.remove(d)
    order = [dims.index(d) for d in want if d in dims]
    arr = np.transpose(arr, order)
    return arr, [d for d in want if d in dims]


def export_ngff_image(image: NgffImage, path: str) -> None:
    """Write one resolution level to a non-Zarr interchange format,
    dispatched on the path suffix. Round-trips exactly with this
    package's own readers (and, formats permitting, any spec-compliant
    reader): geometry (scale/translation) is carried where the
    container has a slot for it."""
    suffix = detect_export_suffix(path)
    if suffix is None:
        raise ValueError(
            f"no exporter for {path!r}; supported: {EXPORT_SUFFIXES}"
        )
    p = Path(path)
    arr0 = _dense_array(image)

    if suffix in (".nii", ".nii.gz"):
        from .nifti import write_nifti

        # NIfTI voxel order is (x, y, z[, t, c]); sform = diag(scale) +
        # translation (the same mapping nifti_to_ngff_image decomposes)
        want = [d for d in ("x", "y", "z", "t", "c") if d in image.dims]
        if not want:
            raise ValueError("NIfTI export needs at least an x axis")
        arr, dims = _squeeze_to(image, arr0, want)
        affine = np.eye(4)
        for i, d in enumerate(("x", "y", "z")):
            affine[i, i] = float(image.scale.get(d, 1.0))
            affine[i, 3] = float(image.translation.get(d, 0.0))
        write_nifti(p, arr, affine=affine)
        return

    if suffix in (".mgh", ".mgz"):
        from .mgh import mgh_encode

        arr, dims = _squeeze_to(image, arr0, ["z", "y", "x"])
        spacing = tuple(float(image.scale.get(d, 1.0)) for d in ("z", "y", "x"))
        blob = mgh_encode(arr, spacing=spacing)
        p.write_bytes(gzip.compress(blob) if suffix == ".mgz" else blob)
        return

    if suffix == ".mrc":
        from .mrc import mrc_encode

        arr, dims = _squeeze_to(image, arr0, ["z", "y", "x"])
        voxel = tuple(float(image.scale.get(d, 1.0)) for d in ("z", "y", "x"))
        p.write_bytes(mrc_encode(arr, voxel_size=voxel))
        return

    if suffix == ".nrrd":
        from .nrrd import nrrd_write

        want = [d for d in ("z", "y", "x") if d in image.dims]
        arr, dims = _squeeze_to(image, arr0, want)
        p.write_bytes(
            nrrd_write(
                arr,
                spacings=[float(image.scale.get(d, 1.0)) for d in dims],
                origin=[float(image.translation.get(d, 0.0)) for d in dims],
            )
        )
        return

    if suffix == ".mha":
        from .mha import mha_write

        want = [d for d in ("z", "y", "x") if d in image.dims]
        arr, dims = _squeeze_to(image, arr0, want)
        p.write_bytes(
            mha_write(
                arr,
                spacing=[float(image.scale.get(d, 1.0)) for d in dims],
                origin=[float(image.translation.get(d, 0.0)) for d in dims],
            )
        )
        return

    # 2-D rasters: (y, x[, c]) with c squeezed or size 3
    want = ["y", "x", "c"] if image.shape.get("c", 1) == 3 else ["y", "x"]
    arr, dims = _squeeze_to(image, arr0, want)
    if suffix == ".png":
        from .png import png_encode

        p.write_bytes(png_encode(arr))
    elif suffix == ".bmp":
        from .bmp import bmp_encode

        p.write_bytes(bmp_encode(arr))
    elif suffix in (".tif", ".tiff"):
        from .tiff import tiff_encode

        p.write_bytes(tiff_encode(arr))
    elif suffix == ".gif":
        from .gif import gif_encode

        p.write_bytes(gif_encode(arr))
    elif suffix == ".webp":
        from .webp import webp_encode

        p.write_bytes(webp_encode(arr))
    else:  # .jpg / .jpeg — lossy by design
        from .jpeg import jpeg_encode

        p.write_bytes(jpeg_encode(arr))
