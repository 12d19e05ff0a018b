"""NIfTI-1 and NIfTI-2 ingest (S16/S17) without nibabel.

Parses the public NIfTI binary header layouts (NIfTI-1: 348 bytes per
nifti1.h; NIfTI-2: 540 bytes, 'n+2' magic, 8-byte dims and
double-precision geometry per nifti2.h), little- or big-endian,
plain or gzipped, and applies the same semantics the reference gets
from nibabel (/root/reference
py/ngff_zarr/nibabel_image_to_ngff_image.py:90-181):

- affine from srow (sform_code > 0), else the quaternion qform, else
  diag(pixdim);
- scl_slope/scl_inter data scaling with nibabel's defaulting rules
  (slope 0/NaN → 1.0, inter NaN → 0.0; identity scaling keeps the raw
  dtype, otherwise float32);
- affine decomposition into translation / scale / shear / orthonormal
  orientation via column-norm + Gram-Schmidt (the scipy/ITK/transforms3d
  convention, nibabel_image_to_ngff_image.py:10-54);
- RAS axcodes from the affine (nibabel io_orientation equivalent) →
  RFC-4 anatomical orientations;
- OMERO window from cal_min/cal_max (:183-239).

The voxel buffer → Spark path here is driver-side (numpy → Arrow →
DataFrame), appropriate for single files; many-file ingest at scale
goes through ``ingest.series`` (binaryFile source + mapInPandas so the
decode runs ON EXECUTORS).
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

from ..model import NgffImage, Omero, OmeroChannel, OmeroWindow

# nifti1.h datatype codes
_DTYPES = {
    2: "uint8", 4: "int16", 8: "int32", 16: "float32", 64: "float64",
    256: "int8", 512: "uint16", 768: "uint32", 1024: "int64", 1280: "uint64",
}


@dataclass
class Nifti1Image:
    """Minimal parsed NIfTI-1: raw array (Fortran voxel order reshaped),
    affine (RAS world), header scalars."""

    data: np.ndarray
    affine: np.ndarray
    scl_slope: float
    scl_inter: float
    cal_min: float
    cal_max: float
    dtype: str


def _quaternion_affine(b, c, d, qx, qy, qz, pixdim, qfac):
    a2 = 1.0 - (b * b + c * c + d * d)
    a = np.sqrt(max(a2, 0.0))
    R = np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
            [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
            [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c],
        ]
    )
    S = np.diag([pixdim[0], pixdim[1], pixdim[2] * (qfac if qfac != 0 else 1.0)])
    aff = np.eye(4)
    aff[:3, :3] = R @ S
    aff[:3, 3] = (qx, qy, qz)
    return aff


_NIFTI2_MAGIC = b"n+2\x00\r\n\x1a\n"  # nifti2.h: magic at offset 4


def _header_version(raw: bytes) -> tuple[int, str]:
    """(nifti_version, endian_char) from sizeof_hdr — 348 = NIfTI-1,
    540 = NIfTI-2 (nifti2.h), either byte order."""
    for end in ("<", ">"):
        size = struct.unpack_from(f"{end}i", raw, 0)[0]
        if size == 348:
            return 1, end
        if size == 540:
            return 2, end
    raise ValueError(
        f"not a NIfTI file (sizeof_hdr={struct.unpack_from('<i', raw, 0)[0]})"
    )


def read_nifti(path: str | Path) -> Nifti1Image:
    """Parse NIfTI-1 (348-byte header) or NIfTI-2 (540-byte header,
    magic 'n+2', 8-byte dims/offsets, double-precision geometry fields
    — nifti2.h public layout), little- or big-endian, plain or
    gzipped. The reference reads both through nibabel; field semantics
    downstream (affine precedence, scaling defaults) are identical."""
    return parse_nifti_bytes(Path(path).read_bytes())


def parse_nifti_bytes(raw: bytes) -> Nifti1Image:
    """Bytes-level core of :func:`read_nifti` (plain or gzipped)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    if len(raw) < 348:
        raise ValueError("not a NIfTI file (truncated header)")
    version, e = _header_version(raw)
    if version == 1:
        # nifti1.h magic at offset 344: "n+1\0" single-file, "ni1\0"
        # hdr/img pair — without this check any blob whose first 4
        # bytes decode to 348 would "parse" as NIfTI
        if raw[344:348] not in (b"n+1\x00", b"ni1\x00"):
            raise ValueError(f"bad NIfTI-1 magic {raw[344:348]!r}")
        dim = struct.unpack_from(f"{e}8h", raw, 40)
        datatype = struct.unpack_from(f"{e}h", raw, 70)[0]
        pixdim = struct.unpack_from(f"{e}8f", raw, 76)
        vox_offset = int(struct.unpack_from(f"{e}f", raw, 108)[0])
        scl_slope, scl_inter = struct.unpack_from(f"{e}2f", raw, 112)
        cal_max = struct.unpack_from(f"{e}f", raw, 124)[0]
        cal_min = struct.unpack_from(f"{e}f", raw, 128)[0]
        qform_code, sform_code = struct.unpack_from(f"{e}2h", raw, 252)
        quatern = struct.unpack_from(f"{e}3f", raw, 256)
        qoffset = struct.unpack_from(f"{e}3f", raw, 268)
        srow = np.array(struct.unpack_from(f"{e}12f", raw, 280)).reshape(3, 4)
        min_offset = 352
    else:
        if len(raw) < 540:
            raise ValueError("not a NIfTI-2 file (truncated header)")
        if raw[4:12] != _NIFTI2_MAGIC:
            raise ValueError(f"bad NIfTI-2 magic {raw[4:12]!r}")
        datatype = struct.unpack_from(f"{e}h", raw, 12)[0]
        dim = struct.unpack_from(f"{e}8q", raw, 16)
        pixdim = struct.unpack_from(f"{e}8d", raw, 104)
        vox_offset = int(struct.unpack_from(f"{e}q", raw, 168)[0])
        scl_slope, scl_inter = struct.unpack_from(f"{e}2d", raw, 176)
        cal_max = struct.unpack_from(f"{e}d", raw, 192)[0]
        cal_min = struct.unpack_from(f"{e}d", raw, 200)[0]
        qform_code, sform_code = struct.unpack_from(f"{e}2i", raw, 344)
        quatern = struct.unpack_from(f"{e}3d", raw, 352)
        qoffset = struct.unpack_from(f"{e}3d", raw, 376)
        srow = np.array(struct.unpack_from(f"{e}12d", raw, 400)).reshape(3, 4)
        min_offset = 544

    ndim = dim[0]
    # 2-D planar NIfTI is legal (dim[0]=2); nibabel reads it the same way
    if not 2 <= ndim <= 5:
        raise ValueError(f"unsupported NIfTI ndim {ndim}")
    shape = tuple(int(d) for d in dim[1 : 1 + ndim])
    if datatype not in _DTYPES:
        raise ValueError(f"unsupported NIfTI datatype code {datatype}")
    np_dtype = np.dtype(_DTYPES[datatype]).newbyteorder(e)
    count = int(np.prod(shape))
    data = np.frombuffer(
        raw, dtype=np_dtype, count=count, offset=max(vox_offset, min_offset)
    )
    # NIfTI voxel order: first index varies fastest (Fortran)
    data = data.reshape(shape, order="F")

    if sform_code > 0:
        affine = np.eye(4)
        affine[:3, :] = srow
    elif qform_code > 0:
        affine = _quaternion_affine(*quatern, *qoffset, pixdim[1:4], pixdim[0])
    else:
        affine = np.diag([pixdim[1], pixdim[2], pixdim[3], 1.0])

    # nibabel defaulting: slope 0/NaN → 1.0, inter NaN → 0.0
    slope = 1.0 if (scl_slope == 0 or np.isnan(scl_slope)) else float(scl_slope)
    inter = 0.0 if np.isnan(scl_inter) else float(scl_inter)
    return Nifti1Image(
        data=data,
        affine=affine,
        scl_slope=slope,
        scl_inter=inter,
        cal_min=float(cal_min),
        cal_max=float(cal_max),
        dtype=np.dtype(_DTYPES[datatype]).name,
    )


_DTYPE_CODES = {v: k for k, v in _DTYPES.items()}


def write_nifti(
    path: str | Path,
    arr: np.ndarray,
    affine: Optional[np.ndarray] = None,
    scl_slope: float = 0.0,
    scl_inter: float = 0.0,
    cal_min: float = 0.0,
    cal_max: float = 0.0,
    version: int = 1,
) -> None:
    """Write a minimal single-file NIfTI (.nii / .nii.gz): sform affine,
    Fortran voxel order — the writer counterpart used by round-trip
    tests and as a light-weight export path. ``version`` 1 (348-byte
    header) or 2 (540-byte nifti2.h header: 8-byte dims/offsets,
    double geometry fields)."""
    path = Path(path)
    if arr.dtype.name not in _DTYPE_CODES:
        raise ValueError(f"unsupported NIfTI dtype {arr.dtype}")
    if version not in (1, 2):
        raise ValueError(f"NIfTI version must be 1 or 2, got {version}")
    if affine is None:
        affine = np.eye(4)
    ndim = arr.ndim
    dim = [ndim] + list(arr.shape) + [1] * (7 - ndim)
    pixdim = [1.0] + [float(np.linalg.norm(affine[:3, i])) for i in range(min(3, ndim))]
    pixdim += [1.0] * (8 - len(pixdim))

    if version == 1:
        hdr = bytearray(348)
        struct.pack_into("<i", hdr, 0, 348)
        struct.pack_into("<8h", hdr, 40, *dim)
        struct.pack_into("<h", hdr, 70, _DTYPE_CODES[arr.dtype.name])
        struct.pack_into("<h", hdr, 72, arr.dtype.itemsize * 8)
        struct.pack_into("<8f", hdr, 76, *pixdim)
        struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
        struct.pack_into("<2f", hdr, 112, scl_slope, scl_inter)
        struct.pack_into("<f", hdr, 124, cal_max)
        struct.pack_into("<f", hdr, 128, cal_min)
        struct.pack_into("<2h", hdr, 252, 0, 1)  # qform=0, sform=1
        struct.pack_into("<12f", hdr, 280, *affine[:3, :].reshape(-1).tolist())
        hdr[344:348] = b"n+1\x00"
        body = bytes(hdr) + b"\x00" * 4
    else:
        hdr = bytearray(540)
        struct.pack_into("<i", hdr, 0, 540)
        hdr[4:12] = _NIFTI2_MAGIC
        struct.pack_into("<h", hdr, 12, _DTYPE_CODES[arr.dtype.name])
        struct.pack_into("<h", hdr, 14, arr.dtype.itemsize * 8)
        struct.pack_into("<8q", hdr, 16, *dim)
        struct.pack_into("<8d", hdr, 104, *pixdim)
        struct.pack_into("<q", hdr, 168, 544)  # vox_offset
        struct.pack_into("<2d", hdr, 176, scl_slope, scl_inter)
        struct.pack_into("<d", hdr, 192, cal_max)
        struct.pack_into("<d", hdr, 200, cal_min)
        struct.pack_into("<2i", hdr, 344, 0, 1)  # qform=0, sform=1
        struct.pack_into("<12d", hdr, 400, *affine[:3, :].reshape(-1).tolist())
        body = bytes(hdr) + b"\x00" * 4
    body += np.asfortranarray(
        arr.astype(arr.dtype.newbyteorder("<"))
    ).tobytes(order="F")
    if str(path).endswith(".gz"):
        path.write_bytes(gzip.compress(body))
    else:
        path.write_bytes(body)


def decompose_affine_with_shear(affine: np.ndarray) -> dict:
    """Column-norm + Gram-Schmidt decomposition into translation, scale,
    shear, orthonormal orientation (the scipy/ITK/transforms3d
    convention; parity nibabel_image_to_ngff_image.py:10-54)."""
    matrix = affine[:3, :3]
    translation = affine[:3, 3]
    scale = np.linalg.norm(matrix, axis=0)
    normed = matrix / scale
    shear_xy = float(np.dot(normed[:, 0], normed[:, 1]))
    y_orth = normed[:, 1] - shear_xy * normed[:, 0]
    shear_y = np.linalg.norm(y_orth)
    shear_xz = float(np.dot(normed[:, 0], normed[:, 2]))
    shear_yz = float(np.dot(normed[:, 1], normed[:, 2]))
    z_orth = normed[:, 2] - shear_xz * normed[:, 0] - shear_yz * normed[:, 1]
    shear_z = np.linalg.norm(z_orth)
    orientation = np.stack([normed[:, 0], y_orth / shear_y, z_orth / shear_z], axis=1)
    return {
        "translation": translation,
        "scale": scale,
        "shear": np.array([shear_xy, shear_xz, shear_yz]),
        "orientation": orientation,
    }


def affine_axcodes(affine: np.ndarray) -> dict[str, str]:
    """RAS axis codes per voxel axis (nibabel io_orientation+ornt2axcodes
    equivalent): for each voxel column, the dominant world axis and its
    sign pick the RFC-4 orientation label."""
    labels = (
        ("right-to-left", "left-to-right"),       # world x
        ("anterior-to-posterior", "posterior-to-anterior"),  # world y
        ("superior-to-inferior", "inferior-to-superior"),    # world z
    )
    matrix = affine[:3, :3]
    out = {}
    for col, dim in enumerate(("x", "y", "z")):
        world = int(np.argmax(np.abs(matrix[:, col])))
        positive = matrix[world, col] > 0
        out[dim] = labels[world][1 if positive else 0]
    return out


def nifti_to_ngff_image(
    spark,
    path: str | Path,
    add_anatomical_orientation: bool = True,
) -> NgffImage:
    """S16: NIfTI file → pixel-table NgffImage with spatial metadata."""
    img = read_nifti(path)
    deco = decompose_affine_with_shear(img.affine)
    ndim = img.data.ndim
    dims = ["x", "y", "z", "t", "c"][:ndim]  # NIfTI voxel axis order

    scale = {d: float(deco["scale"][i]) for i, d in enumerate(("x", "y", "z"))}
    translation = {d: float(deco["translation"][i]) for i, d in enumerate(("x", "y", "z"))}
    if ndim >= 4:
        scale["t"], translation["t"] = 1.0, 0.0
    if ndim == 5:
        scale["c"], translation["c"] = 1.0, 0.0

    if img.scl_slope == 1.0 and img.scl_inter == 0.0:
        arr = img.data
        dtype = img.dtype
    else:
        arr = img.data.astype(np.float32) * img.scl_slope + img.scl_inter
        dtype = "float32"

    axes_orientations = None
    if add_anatomical_orientation:
        codes = affine_axcodes(img.affine)
        axes_orientations = {d: codes[d] for d in dims if d in ("x", "y", "z")}

    df = array_to_pixel_df(spark, arr, dims)
    return NgffImage(
        data=df,
        dims=dims,
        shape={d: int(s) for d, s in zip(dims, arr.shape)},
        scale=scale,
        translation=translation,
        name="nibabel_converted_image",
        axes_orientations=axes_orientations,
        dtype=dtype,
    )


def extract_omero_metadata(img: Nifti1Image) -> Optional[Omero]:
    """S17: OMERO window from cal_min/cal_max (parity
    nibabel_image_to_ngff_image.py:183-239)."""
    cal_min, cal_max = img.cal_min, img.cal_max
    if (cal_min == 0.0 and cal_max == 0.0) or np.isnan(cal_min) or np.isnan(cal_max):
        return None
    data_min = float(img.data.min())
    data_max = float(img.data.max())
    window = OmeroWindow(min=data_min, max=data_max, start=cal_min, end=cal_max)
    return Omero(channels=[OmeroChannel(color="FFFFFF", window=window, label="")])


def array_to_pixel_df(spark, arr: np.ndarray, dims: list[str]):
    """numpy array → pixel table (t, c, z, y, x, v); axis i of the array
    is coordinate dims[i]. Driver-side Arrow conversion — for many-file
    datasets use ingest.series (executor-side decode)."""
    import pandas as pd

    idx = np.indices(arr.shape).reshape(len(dims), -1)
    cols = {d: np.zeros(arr.size, dtype=np.int64) for d in ("t", "c", "z", "y", "x")}
    for i, d in enumerate(dims):
        cols[d] = idx[i].astype(np.int64)
    cols["v"] = arr.reshape(-1).astype(np.float64)
    return spark.createDataFrame(pd.DataFrame(cols))
