"""S11 user-facing CLI (``python -m ngff_zarr_spark``) — end-to-end
tiff → OME-Zarr conversion with the reference's core flag surface
(reference py/ngff_zarr/cli.py:164-440)."""

import json

import numpy as np
import pytest

from ngff_zarr_spark.__main__ import build_parser, main
from ngff_zarr_spark.ingest.tiff import tiff_encode


@pytest.fixture()
def tiff_file(tmp_path):
    arr = (np.arange(48 * 40, dtype=np.uint16) % 251).reshape(48, 40)
    p = tmp_path / "img.tif"
    p.write_bytes(tiff_encode(arr))
    return p, arr


def test_cli_tiff_to_ome_zarr(spark, tmp_path, tiff_file):
    p, arr = tiff_file
    out = tmp_path / "out.ome.zarr"
    rc = main(
        [
            "-i", str(p),
            "-o", str(out),
            "-m", "ITKWASM_BIN_SHRINK",
            "-c", "16",
            "-n", "cli-test",
            "-s", "y", "2.0", "x", "2.0",
            "--min-length", "16",
            "-q",
        ],
        spark=spark,
    )
    assert rc == 0
    attrs = json.loads((out / ".zattrs").read_text())
    ms = attrs["multiscales"][0]
    assert ms["name"] == "cli-test"
    assert ms["version"] == "0.4"
    assert [a["name"] for a in ms["axes"]] == ["y", "x"]
    assert len(ms["datasets"]) >= 2  # 48x40 → at least one downsample to ≤16
    assert ms["datasets"][0]["coordinateTransformations"][0]["scale"] == [2.0, 2.0]
    # pixel values round-trip through the store
    from ngff_zarr_spark.ome_zarr_api import read_image

    df = read_image(spark, str(out), ms["datasets"][0]["path"])
    got = {(r.y, r.x): r.v for r in df.collect()}
    assert got[(0, 0)] == float(arr[0, 0])
    assert got[(47, 39)] == float(arr[47, 39])


def test_cli_info_only(spark, tmp_path, tiff_file, capsys):
    p, _ = tiff_file
    rc = main(["-i", str(p), "--min-length", "16", "-q"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "dims: ['y', 'x']" in out
    assert "levels:" in out


def test_cli_sharded_v05(spark, tmp_path, tiff_file):
    p, arr = tiff_file
    out = tmp_path / "out5.ome.zarr"
    rc = main(
        [
            "-i", str(p), "-o", str(out),
            "--ome-zarr-version", "0.5",
            "-c", "16", "--chunks-per-shard", "2",
            "--compressor", "zstd", "--min-length", "64", "-q",
        ],
        spark=spark,
    )
    assert rc == 0
    doc = json.loads((out / "zarr.json").read_text())
    assert doc["attributes"]["ome"]["version"] == "0.5"
    arr_doc = json.loads((out / "scale0/image/zarr.json").read_text())
    assert arr_doc["codecs"][0]["name"] == "sharding_indexed"


def test_cli_rejects_same_in_out(tiff_file):
    p, _ = tiff_file
    with pytest.raises(SystemExit):
        main(["-i", str(p), "-o", str(p)])


def test_cli_flag_surface_matches_reference_core():
    """The reference's core conversion flags all exist (cli.py:164-290);
    cluster-sizing flags are intentionally delegated to Spark conf."""
    parser = build_parser()
    flags = {a for action in parser._actions for a in action.option_strings}
    for needed in [
        "-i", "-o", "-d", "-u", "-s", "-t", "-n",
        "--output-scale", "--ome-zarr-version",
        "-c", "--chunks-per-shard", "-m", "-q", "--input-backend",
    ]:
        assert needed in flags, needed


def test_cli_ngff_to_ngff_version_upgrade(spark, tmp_path, tiff_file):
    """The reference CLI's NGFF->NGFF passthrough: an existing OME-Zarr
    store as input, re-written at another version (0.4 store -> 0.5
    sharded store), pixel-identical."""
    p, arr = tiff_file
    v04 = tmp_path / "v04.ome.zarr"
    assert main(["-i", str(p), "-o", str(v04), "-c", "16", "--min-length", "64", "-q"], spark=spark) == 0

    v05 = tmp_path / "v05.ome.zarr"
    rc = main(
        ["-i", str(v04), "-o", str(v05), "--ome-zarr-version", "0.5",
         "-c", "16", "--min-length", "64", "-q"],
        spark=spark,
    )
    assert rc == 0
    doc = json.loads((v05 / "zarr.json").read_text())
    assert doc["attributes"]["ome"]["version"] == "0.5"
    from ngff_zarr_spark.ome_zarr_api import read_image

    a = {(r.y, r.x): r.v for r in read_image(spark, str(v04), "scale0/image").collect()}
    b = {(r.y, r.x): r.v for r in read_image(spark, str(v05), "scale0/image", zarr_format=3).collect()}
    assert a == b and a[(0, 0)] == float(arr[0, 0])


def test_cli_passthrough_preserves_levels(spark, tmp_path, tiff_file):
    """NGFF->NGFF passthrough (reference cli.py:398-408) must copy the
    pyramid verbatim — same level count and paths, NO re-downsample."""
    p, arr = tiff_file
    src = tmp_path / "src.ome.zarr"
    assert main(["-i", str(p), "-o", str(src), "-c", "16", "--min-length", "16", "-q"], spark=spark) == 0
    n_src = len(json.loads((src / ".zattrs").read_text())["multiscales"][0]["datasets"])
    assert n_src >= 2

    dst = tmp_path / "dst.ome.zarr"
    # note: no --min-length; passthrough must not rebuild the pyramid
    assert main(["-i", str(src), "-o", str(dst), "-q"], spark=spark) == 0
    ms = json.loads((dst / ".zattrs").read_text())["multiscales"][0]
    assert len(ms["datasets"]) == n_src
    assert [d["path"] for d in ms["datasets"]] == [
        d["path"]
        for d in json.loads((src / ".zattrs").read_text())["multiscales"][0]["datasets"]
    ]


def test_cli_export_nii_roundtrip(spark, tmp_path, tiff_file):
    """Non-Zarr output: OME-Zarr (or any input) -> .nii via the native
    writer, re-ingested pixel-exact (reference cli.py:384-396)."""
    p, arr = tiff_file
    store = tmp_path / "s.ome.zarr"
    assert main(["-i", str(p), "-o", str(store), "-c", "16", "--min-length", "64",
                 "-s", "y", "2.0", "x", "3.0", "-q"], spark=spark) == 0

    nii = tmp_path / "out.nii"
    assert main(["-i", str(store), "-o", str(nii), "-q"], spark=spark) == 0

    from ngff_zarr_spark.ingest.nifti import nifti_to_ngff_image

    img = nifti_to_ngff_image(spark, nii)
    assert img.shape == {"x": 40, "y": 48}
    assert img.scale["x"] == 3.0 and img.scale["y"] == 2.0
    got = {(r.x, r.y): r.v for r in img.data.collect()}
    assert got[(0, 0)] == float(arr[0, 0])
    assert got[(39, 47)] == float(arr[47, 39])


def test_cli_export_png(spark, tmp_path, tiff_file):
    p, arr = tiff_file
    png = tmp_path / "out.png"
    assert main(["-i", str(p), "-o", str(png), "-q"], spark=spark) == 0
    from ngff_zarr_spark.ingest.png import png_decode

    assert np.array_equal(png_decode(png.read_bytes()), arr)


def test_cli_enable_rfc4(spark, tmp_path):
    """--enable-rfc 4 preserves anatomical orientation in the written
    axes; without the flag it is stripped (reference
    _pop_metadata_optionals + rfc4.py:154-156)."""
    from ngff_zarr_spark.ingest.nifti import write_nifti

    arr = (np.arange(6 * 5 * 4, dtype=np.int16) % 97).reshape(6, 5, 4)
    nii = tmp_path / "vol.nii"
    write_nifti(nii, arr, affine=np.diag([2.0, 3.0, 4.0, 1.0]))

    off = tmp_path / "off.ome.zarr"
    assert main(["-i", str(nii), "-o", str(off), "--min-length", "4", "-q"], spark=spark) == 0
    axes = json.loads((off / ".zattrs").read_text())["multiscales"][0]["axes"]
    assert all("orientation" not in a for a in axes)

    on = tmp_path / "on.ome.zarr"
    assert main(["-i", str(nii), "-o", str(on), "--min-length", "4",
                 "--enable-rfc", "4", "-q"], spark=spark) == 0
    axes = json.loads((on / ".zattrs").read_text())["multiscales"][0]["axes"]
    spatial = [a for a in axes if a["type"] == "space"]
    assert spatial and all(
        a["orientation"]["type"] == "anatomical" for a in spatial
    )
    # identity-ish diag affine → +x is left-to-right etc. (RAS codes)
    byname = {a["name"]: a for a in axes}
    assert byname["x"]["orientation"]["value"] == "left-to-right"
    assert byname["z"]["orientation"]["value"] == "inferior-to-superior"


def test_cli_passthrough_preserves_source_chunks(spark, tmp_path, tiff_file):
    """Review finding: 'write it verbatim' includes the CHUNK GRID —
    a bare passthrough must not silently rechunk to default_chunks."""
    p, _ = tiff_file
    src = tmp_path / "cs.ome.zarr"
    assert main(["-i", str(p), "-o", str(src), "-c", "16", "--min-length", "64", "-q"], spark=spark) == 0
    dst = tmp_path / "cd.ome.zarr"
    assert main(["-i", str(src), "-o", str(dst), "-q"], spark=spark) == 0
    za_src = json.loads((src / "scale0/image/.zarray").read_text())
    za_dst = json.loads((dst / "scale0/image/.zarray").read_text())
    assert za_dst["chunks"] == za_src["chunks"] == [16, 16]

    # -c rechunks inside the passthrough
    dst2 = tmp_path / "ce.ome.zarr"
    assert main(["-i", str(src), "-o", str(dst2), "-c", "8", "-q"], spark=spark) == 0
    za2 = json.loads((dst2 / "scale0/image/.zarray").read_text())
    assert za2["chunks"] == [8, 8]


def test_cli_ngff_metadata_override_takes_rebuild_path(spark, tmp_path, tiff_file):
    """Review finding: -n (or any image-changing flag) on an NGFF input
    must not be silently dropped by the passthrough — it picks the
    single-level rebuild path and lands in the output metadata."""
    p, _ = tiff_file
    src = tmp_path / "ns.ome.zarr"
    assert main(["-i", str(p), "-o", str(src), "-c", "16", "--min-length", "64", "-q"], spark=spark) == 0
    dst = tmp_path / "nd.ome.zarr"
    assert main(["-i", str(src), "-o", str(dst), "-n", "renamed",
                 "--min-length", "64", "-q"], spark=spark) == 0
    ms = json.loads((dst / ".zattrs").read_text())["multiscales"][0]
    assert ms["name"] == "renamed"


def test_convert_version_preserves_orientation_with_rfc4(spark, tmp_path):
    """Review finding: version conversion is a write — orientation
    survives it only with enabled_rfcs=[4], and the default strips."""
    from ngff_zarr_spark.ingest.nifti import write_nifti
    from ngff_zarr_spark.ome_zarr_api import convert_ome_zarr_version

    arr = (np.arange(4 * 4 * 4, dtype=np.int16) % 11).reshape(4, 4, 4)
    nii = tmp_path / "o.nii"
    write_nifti(nii, arr, affine=np.diag([1.0, 1.0, 1.0, 1.0]))
    src = tmp_path / "o04.ome.zarr"
    assert main(["-i", str(nii), "-o", str(src), "--min-length", "4",
                 "--enable-rfc", "4", "-q"], spark=spark) == 0

    kept = tmp_path / "o05_rfc.ome.zarr"
    convert_ome_zarr_version(spark, str(src), str(kept), "0.5", enabled_rfcs=[4])
    doc = json.loads((kept / "zarr.json").read_text())
    axes = doc["attributes"]["ome"]["multiscales"][0]["axes"]
    assert all("orientation" in a for a in axes if a["type"] == "space")

    stripped = tmp_path / "o05_plain.ome.zarr"
    convert_ome_zarr_version(spark, str(src), str(stripped), "0.5")
    doc = json.loads((stripped / "zarr.json").read_text())
    axes = doc["attributes"]["ome"]["multiscales"][0]["axes"]
    assert all("orientation" not in a for a in axes)
