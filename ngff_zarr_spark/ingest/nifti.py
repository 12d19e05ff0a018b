"""NIfTI-1 ingest (S16/S17) without nibabel.

Parses the public NIfTI-1 binary header layout (348 bytes, fields at
fixed offsets per the nifti1.h spec), applies the same semantics the
reference gets from nibabel (/root/reference
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


def read_nifti(path: str | Path) -> Nifti1Image:
    raw = Path(path).read_bytes()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    if len(raw) < 348:
        raise ValueError("not a NIfTI-1 file (truncated header)")
    sizeof_hdr = struct.unpack_from("<i", raw, 0)[0]
    if sizeof_hdr != 348:
        raise ValueError(f"not a NIfTI-1 file (sizeof_hdr={sizeof_hdr})")
    dim = struct.unpack_from("<8h", raw, 40)
    datatype = struct.unpack_from("<h", raw, 70)[0]
    pixdim = struct.unpack_from("<8f", raw, 76)
    vox_offset = int(struct.unpack_from("<f", raw, 108)[0])
    scl_slope, scl_inter = struct.unpack_from("<2f", raw, 112)
    cal_max = struct.unpack_from("<f", raw, 124)[0]
    cal_min = struct.unpack_from("<f", raw, 128)[0]
    qform_code, sform_code = struct.unpack_from("<2h", raw, 252)
    quatern = struct.unpack_from("<3f", raw, 256)
    qoffset = struct.unpack_from("<3f", raw, 268)
    srow = np.array(struct.unpack_from("<12f", raw, 280)).reshape(3, 4)

    ndim = dim[0]
    if not 3 <= ndim <= 5:
        raise ValueError(f"unsupported NIfTI ndim {ndim}")
    shape = tuple(dim[1 : 1 + ndim])
    if datatype not in _DTYPES:
        raise ValueError(f"unsupported NIfTI datatype code {datatype}")
    np_dtype = np.dtype(_DTYPES[datatype]).newbyteorder("<")
    count = int(np.prod(shape))
    data = np.frombuffer(raw, dtype=np_dtype, count=count, offset=max(vox_offset, 352))
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
) -> None:
    """Write a minimal single-file NIfTI-1 (.nii / .nii.gz): sform affine,
    Fortran voxel order — the writer counterpart used by round-trip
    tests and as a light-weight export path."""
    path = Path(path)
    if arr.dtype.name not in _DTYPE_CODES:
        raise ValueError(f"unsupported NIfTI dtype {arr.dtype}")
    if affine is None:
        affine = np.eye(4)
    ndim = arr.ndim
    dim = [ndim] + list(arr.shape) + [1] * (7 - ndim)
    pixdim = [1.0] + [float(np.linalg.norm(affine[:3, i])) for i in range(min(3, ndim))]
    pixdim += [1.0] * (8 - len(pixdim))

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
    body = bytes(hdr) + b"\x00" * 4 + np.asfortranarray(
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
