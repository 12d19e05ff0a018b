"""CLI multi-format ingest dispatch (S11).

Parity: /root/reference py/ngff_zarr/cli_input_to_ngff_image.py:17-95 —
one function mapping (backend, input paths) → NgffImage, with the
glob/series branch for multi-file inputs. Library-backed backends
(itk/itkwasm/imageio/tifffile/nibabel) use the pure-binary parsers in
this package when the library is absent; output_scale picks a pyramid
level for NGFF inputs (F1).
"""

from __future__ import annotations

from .detect import ConversionBackend


def cli_input_to_ngff_image(
    spark,
    backend: ConversionBackend,
    input: list[str],
    output_scale: int = 0,
):
    if backend == ConversionBackend.NGFF_ZARR:
        from ..ome_zarr_api import from_ngff_zarr

        ms = from_ngff_zarr(spark, input[0])
        return ms.images[output_scale]

    if backend == ConversionBackend.ZARR_ARRAY:
        from ..model import to_ngff_image
        from ..ome_zarr_api import read_image
        from ..sources.zarr_store import ZarrStore
        from pathlib import Path

        root = str(Path(input[0]).parent)
        array_path = Path(input[0]).name
        store = ZarrStore(root)
        meta = store.read_array_meta(array_path, 2)
        df = read_image(spark, root, array_path, zarr_format=2)
        dims = ["t", "c", "z", "y", "x"][5 - len(meta.shape):]
        img = to_ngff_image(df, dims=dims, shape=dict(zip(dims, meta.shape)))
        img.dtype = meta.dtype.name
        return img

    if backend == ConversionBackend.NIBABEL:
        from .nifti import nifti_to_ngff_image

        return nifti_to_ngff_image(spark, input[0])

    if backend == ConversionBackend.TIFFFILE:
        if len(input) > 1:
            from .series import series_to_ngff_image

            return series_to_ngff_image(spark, input)
        from .tiff import tiff_to_ngff_image

        return tiff_to_ngff_image(spark, input[0])

    if backend in (ConversionBackend.ITKWASM, ConversionBackend.ITK):
        # real itk/itkwasm if installed; else the formats this package
        # parses natively (png/tiff/nii)
        try:  # pragma: no cover - library not in this image
            import itk  # type: ignore

            from .itk import itk_image_to_ngff_image

            return itk_image_to_ngff_image(spark, itk.imread(input[0]))
        except ImportError:
            pass
        suffix = input[0].lower()
        if suffix.endswith(".dcm"):
            if len(input) > 1:
                from .dicom import dicom_series_to_ngff_image

                return dicom_series_to_ngff_image(spark, input)
            from .dicom import dicom_to_ngff_image

            return dicom_to_ngff_image(spark, input[0])
        if suffix.endswith((".nii", ".nii.gz")):
            from .nifti import nifti_to_ngff_image

            return nifti_to_ngff_image(spark, input[0])
        if suffix.endswith((".nrrd", ".nhdr")):
            from .nrrd import nrrd_to_ngff_image

            return nrrd_to_ngff_image(spark, input[0])
        if suffix.endswith((".mha", ".mhd")):
            from .mha import mha_to_ngff_image

            return mha_to_ngff_image(spark, input[0])
        if suffix.endswith((".mgh", ".mgz")):
            from .mgh import mgh_to_ngff_image

            return mgh_to_ngff_image(spark, input[0])
        if suffix.endswith(".mrc"):
            from .mrc import mrc_to_ngff_image

            return mrc_to_ngff_image(spark, input[0])
        if suffix.endswith((".png", ".jpg", ".jpeg", ".bmp")):
            return _decode_2d_to_ngff_image(spark, input[0])
        from .tiff import tiff_to_ngff_image

        return tiff_to_ngff_image(spark, input[0])

    if backend == ConversionBackend.IMAGEIO:
        if len(input) > 1:
            from .series import series_to_ngff_image

            return series_to_ngff_image(spark, input)
        # RIFF/WAVE audio takes the imageio fallback route like any
        # unknown extension (detect_cli_io_backend.py:124-128); the
        # magic check (not the extension) picks the decoder so a
        # mis-suffixed file still routes right. RIFF+WEBP stays an
        # image and falls through to the raster dispatch.
        with open(input[0], "rb") as f:
            head = f.read(12)
        if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
            from .wav import wav_to_ngff_image

            return wav_to_ngff_image(spark, input[0])
        return _decode_2d_to_ngff_image(spark, input[0])

    raise ValueError(f"Unsupported backend {backend}")


def _decode_2d_to_ngff_image(spark, path: str):
    """Decode a single 2D raster (PNG, baseline JPEG, or BMP —
    dispatched on the magic bytes; reference routes these through
    itk-wasm/imageio, cli_input_to_ngff_image.py:49-95) into an
    NgffImage."""
    from ..model import to_ngff_image
    from .nifti import array_to_pixel_df

    data = open(path, "rb").read()
    if data[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decode

        arr = jpeg_decode(data)
    elif data[:2] == b"BM":
        from .bmp import bmp_decode

        arr = bmp_decode(data)
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import gif_decode

        arr = gif_decode(data)
    elif data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from .webp import webp_decode

        arr = webp_decode(data)
    else:
        from .png import png_decode

        arr = png_decode(data)
    if arr.ndim == 2:
        dims = ["y", "x"]
    elif arr.ndim == 3 and arr.shape[-1] == 3:
        dims = ["y", "x", "c"]
    elif arr.ndim == 3:
        dims = ["t", "y", "x"]  # animated GIF frame stack
    else:
        dims = ["t", "y", "x", "c"]
    df = array_to_pixel_df(spark, arr, dims)
    img = to_ngff_image(
        df, dims=dims, shape={d: int(s) for d, s in zip(dims, arr.shape)}
    )
    img.dtype = arr.dtype.name
    return img
