"""LIVE reference-code oracle (VERDICT r8 asks #1/#2).

Every test here executes the ACTUAL reference implementation's code
(imported in-place from /root/reference/py/ngff_zarr via
tests/_reference_import.py — no zarr/dask wheels needed for these leaf
modules) and compares it against the engine. Unlike the transcribed
layout literals in test_reference_layout.py, a transcription error
cannot pass here: the expected values are computed by the reference's
own functions at test time.

Covered surfaces:
- C1 sigma-from-factor         ref methods/_support.py:159  _compute_sigma
- A9/C2 factor+metadata chain  ref methods/_support.py:107,191
- C2 block shapes              ref methods/_support.py:215  _next_block_shape
- C4 unit/dim support          ref v04/zarr_metadata.py:131,136
- C6 metadata serialization    ref v04+v05 Metadata dataclasses +
                               to_ngff_zarr.py:48 _pop_metadata_optionals
                               (pruning re-applied per that function)
- C7 schema validation         ref validate.py:31 validate() run on docs
                               the ENGINE writes (0.4 + 0.5, strict too)
- C8 RFC-4                     ref rfc4.py + rfc4_validation.py executed
                               on engine-written axes
- C10 provenance shape         ref methods/_metadata.py get_method_metadata
- refpy: oracle literals       pins the `refpy:` VALUES rows in
                               ngff_zarr_spark/oracle.py to live output
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil

import numpy as np
import pytest

from tests._reference_import import load_reference, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

REF = load_reference()

from ngff_zarr_spark import rfc4 as eng_rfc4
from ngff_zarr_spark.ingest.nifti import array_to_pixel_df
from ngff_zarr_spark.model import (
    is_dimension_supported,
    is_unit_supported,
    to_ngff_image,
)
from ngff_zarr_spark.plans import planner
from ngff_zarr_spark.ome_zarr_api import to_multiscales, to_ngff_zarr


# ---------------------------------------------------------------- C1 sigma
def test_sigma_matches_reference_exactly():
    for factors in ([2], [3], [2, 2, 2], [1, 2, 3, 4, 5, 6, 7, 8], [10]):
        assert planner.compute_sigma(factors) == REF.support._compute_sigma(
            factors
        ), factors


# ------------------------------------------------- A9 factor chain parity
@pytest.mark.parametrize(
    "dims,scale_factors",
    [
        (["z", "y", "x"], [2, 4, 8]),
        (["t", "z", "y", "x"], [2, 4]),
        (["y", "x"], [3, 9, 27]),
        (["z", "y", "x"], [{"z": 1, "y": 2, "x": 2}, {"z": 2, "y": 4, "x": 4}]),
        (["c", "y", "x"], [2]),
    ],
)
def test_dim_factor_chain_matches_reference(dims, scale_factors):
    spatial = [d for d in dims if d in ("x", "y", "z")]
    prev_ref = {d: 1 for d in dims}
    prev_eng = {d: 1 for d in dims}
    for sf in scale_factors:
        ref_f = REF.support._dim_scale_factors(dims, sf, prev_ref)
        eng_f = planner.relative_dim_factors(dims, sf, prev_eng)
        assert eng_f == ref_f, (sf, eng_f, ref_f)
        prev_ref = REF.support._update_previous_dim_factors(sf, spatial, prev_ref)
        prev_eng = planner.update_previous_dim_factors(sf, spatial, prev_eng)
        assert prev_eng == prev_ref


# ------------------------------------------ C2 scale/translation and shape
def test_scale_translation_matches_reference():
    class _Img:  # duck-typed previous_image for the reference helper
        dims = ["z", "y", "x"]
        scale = {"z": 2.0, "y": 0.5, "x": 0.5}
        translation = {"z": 10.0, "y": -3.0, "x": 0.25}

    spatial = ("x", "y", "z")
    for factors in ({"z": 2, "y": 2, "x": 2}, {"z": 1, "y": 4, "x": 4}):
        ref_t, ref_s = REF.support._next_scale_metadata(_Img(), factors, spatial)
        eng_s, eng_t = planner.next_scale_metadata(
            _Img.scale, _Img.translation, factors
        )
        assert eng_s == ref_s and eng_t == ref_t, factors


def test_block_shape_matches_reference():
    class _Img:
        dims = ["t", "z", "y", "x"]

    block = np.zeros((3, 7, 11, 13))
    factors = {"z": 2, "y": 3, "x": 4}
    ref_shape = REF.support._next_block_shape(_Img(), factors, ("x", "y", "z"), block)
    eng = planner.next_block_shape(
        {"t": 3, "z": 7, "y": 11, "x": 13}, factors
    )
    assert tuple(eng[d] for d in _Img.dims) == ref_shape


# ---------------------------------------------- chunk alignment, live
def test_aligned_chunks_matches_reference():
    """Reference _align_chunks (methods/_support.py:137) decides the
    chunk grid used before a downsample step; duck-typed arrays record
    whether it rechunks and to what. The engine's aligned_chunks must
    make the same decision for the same geometry."""

    class _Arr:
        def __init__(self, chunk):
            self.chunks = tuple((c,) for c in chunk)
            self.rechunked_to = None

        def rechunk(self, spec):
            self.rechunked_to = spec
            return self

    class _Img:
        def __init__(self, dims, chunk):
            self.dims = dims
            self.data = _Arr(chunk)

    cases = [
        # (dims, current chunk, default_chunks, dim_factors)
        (["z", "y", "x"], (16, 64, 64), {"z": 16, "y": 64, "x": 64},
         {"z": 2, "y": 2, "x": 2}),                       # aligned
        (["z", "y", "x"], (15, 64, 64), {"z": 16, "y": 64, "x": 64},
         {"z": 2, "y": 2, "x": 2}),                       # z misaligned
        (["z", "y", "x"], (7, 9, 64), {"z": 16, "y": 64, "x": 64},
         {"z": 3, "y": 2, "x": 4}),                       # two misaligned
        (["t", "z", "y", "x"], (1, 16, 33, 64),
         {"t": 1, "z": 16, "y": 64, "x": 64}, {"z": 2, "y": 2, "x": 2}),
    ]
    for dims, chunk, default, factors in cases:
        img = _Img(dims, chunk)
        REF.support._align_chunks(img, default, factors)
        ref_spec = img.data.rechunked_to  # None = no rechunk needed
        eng_chunks, eng_changed = planner.aligned_chunks(
            dict(zip(dims, chunk)), default, factors
        )
        assert eng_changed == (ref_spec is not None), (dims, chunk)
        if ref_spec is not None:
            # reference rechunks only the misaligned dims (by index)
            for idx, target in ref_spec.items():
                assert eng_chunks[dims[idx]] == target, (dims, chunk, idx)


# ----------------------------------------- channel-last decision, live
def test_channel_dim_last_order_matches_engine_rule():
    """The engine addresses pixels by dim NAME (no physical transpose),
    so its ITK export just computes the target order: non-c dims in
    source order, then c (ingest/itk.py). Reference _channel_dim_last
    must produce the same order for every placement of c."""

    class _Arr:
        def transpose(self, order):
            return self

    class _Img:
        def __init__(self, dims):
            self.dims = tuple(dims)
            self.data = _Arr()

    for dims in (["c", "z", "y", "x"], ["z", "c", "y", "x"],
                 ["t", "c", "y", "x"], ["z", "y", "x", "c"],
                 ["z", "y", "x"], ["c", "y", "x"]):
        got = list(REF.support._channel_dim_last(_Img(dims)).dims)
        expect = ([d for d in dims if d != "c"] + ["c"]) if "c" in dims \
            else list(dims)
        assert got == expect, dims


# ------------------------------------------------------- C4 units and dims
def _literal_values(tp):
    """Flatten a typing.Union/Literal tree into its string values
    (reference SpaceUnits/TimeUnits are Unions of Literals)."""
    import typing

    args = typing.get_args(tp)
    if not args:
        return [tp] if isinstance(tp, str) else []
    out = []
    for a in args:
        out.extend(_literal_values(a))
    return out


def test_unit_and_dim_support_matches_reference():
    units = _literal_values(REF.v04_zarr_metadata.SpaceUnits) + _literal_values(
        REF.v04_zarr_metadata.TimeUnits
    ) + ["furlong", "fortnight", ""]
    assert len(units) > 20  # the Literal tree actually flattened
    for u in units:
        assert is_unit_supported(u) == REF.v04_zarr_metadata.is_unit_supported(
            u
        ), u
    for d in ["t", "c", "z", "y", "x", "q", "w", ""]:
        assert is_dimension_supported(
            d
        ) == REF.v04_zarr_metadata.is_dimension_supported(d), d


# ------------------------------- C6/C7: engine-written stores, ref-checked
def _ref_prune(metadata_dict, rfc4_enabled=False):
    """Reapply to_ngff_zarr.py:48 _pop_metadata_optionals verbatim
    semantics (that module itself imports zarr, so the 4 pops are
    re-stated here with a test pinning them against the source text)."""
    for ax in metadata_dict["axes"]:
        if ax["unit"] is None:
            ax.pop("unit")
        if not rfc4_enabled and "orientation" in ax:
            ax.pop("orientation")
        elif ax.get("orientation") is None:
            ax.pop("orientation", None)
    if metadata_dict["coordinateTransformations"] is None:
        metadata_dict.pop("coordinateTransformations")
    if metadata_dict["omero"] is None:
        metadata_dict.pop("omero")
    return metadata_dict


@pytest.fixture(scope="module")
def engine_stores(spark, tmp_path_factory):
    """One engine-written pyramid store per version, plus its logical
    description (the inputs both sides derive their metadata from)."""
    root = tmp_path_factory.mktemp("refcode")
    arr = (np.indices((4, 6, 8)).sum(0) % 7).astype("uint16")
    dims = ["z", "y", "x"]
    df = array_to_pixel_df(spark, arr, dims)
    img = to_ngff_image(
        df, dims=dims, shape={"z": 4, "y": 6, "x": 8},
        scale={"z": 2.0, "y": 0.5, "x": 0.5},
        translation={"z": 1.0, "y": 0.0, "x": -2.0},
        axes_units={"z": "micrometer", "y": "micrometer", "x": "micrometer"},
    )
    img.dtype = "uint16"
    ms = to_multiscales(
        img, scale_factors=[2], method="ITKWASM_BIN_SHRINK",
        chunks={"z": 2, "y": 3, "x": 4},
    )
    out = {}
    for version in ("0.4", "0.5"):
        store = str(root / f"v{version.replace('.', '')}.ome.zarr")
        shutil.rmtree(store, ignore_errors=True)
        to_ngff_zarr(store, ms, version=version)
        out[version] = store
    return out, img


def _store_attrs(store, version):
    if version == "0.4":
        return json.load(open(os.path.join(store, ".zattrs")))
    return json.load(open(os.path.join(store, "zarr.json")))["attributes"]


def _reference_expected_entry(img, version):
    """Build the multiscale entry the REFERENCE would store for the
    fixture image, using only reference code: v04/v05 Metadata
    dataclasses, _dim_scale_factors + _next_scale_metadata for the
    level-1 transforms, asdict + optional-pruning."""
    v04 = REF.v04_zarr_metadata
    dims = img.dims
    units = img.axes_units or {}
    axes = [v04.Axis(name=d, type="space", unit=units.get(d)) for d in dims]

    def transforms(scale, translation):
        return [
            v04.Scale([float(scale[d]) for d in dims]),
            v04.Translation([float(translation[d]) for d in dims]),
        ]

    prev = {d: 1 for d in dims}
    factors = REF.support._dim_scale_factors(dims, 2, prev)

    class _Prev:
        pass

    _Prev.dims = dims
    _Prev.scale = img.scale
    _Prev.translation = img.translation
    t1, s1 = REF.support._next_scale_metadata(_Prev(), factors, ("x", "y", "z"))
    datasets = [
        v04.Dataset("scale0/image", transforms(img.scale, img.translation)),
        v04.Dataset("scale1/image", transforms(s1, t1)),
    ]
    cls = v04.Metadata if version == "0.4" else REF.v05_zarr_metadata.Metadata
    meta = cls(
        axes=axes, datasets=datasets, coordinateTransformations=None,
        name="image", type="itkwasm_bin_shrink",
    )
    return _ref_prune(dataclasses.asdict(meta))


@pytest.mark.parametrize("version", ["0.4", "0.5"])
def test_engine_store_doc_equals_reference_dataclass_doc(engine_stores, version):
    stores, img = engine_stores
    attrs = _store_attrs(stores[version], version)
    if version == "0.5":
        assert attrs["ome"]["version"] == "0.5"
        got = attrs["ome"]["multiscales"][0]
    else:
        got = attrs["multiscales"][0]
    expected = _reference_expected_entry(img, version)
    # engine provenance block describes the engine (by design, C10);
    # reference adds "@type" — compare the spec'd body exactly
    got = dict(got)
    prov = got.pop("metadata")
    assert set(prov) == {"description", "method", "version"}
    expected.pop("metadata", None)
    assert got == expected


@pytest.mark.parametrize("version", ["0.4", "0.5"])
def test_reference_validator_accepts_engine_store(engine_stores, version):
    """reference validate() raises on failure; passing = parity.

    strict=True is not runnable here: the vendored strict_*.schema files
    carry no ``$schema`` key, so this environment's referencing release
    refuses to build the resource inside the reference's own validate()
    — independent of the engine. The engine's strict checks are covered
    by c7_validate_battery against the same vendored strict schemas.
    """
    stores, _img = engine_stores
    attrs = _store_attrs(stores[version], version)
    REF.validate.validate(attrs, version=version, model="image")


def test_reference_validator_still_rejects_garbage():
    with pytest.raises(Exception):
        REF.validate.validate(
            {"multiscales": [{"axes": [], "datasets": []}]},
            version="0.4", model="image",
        )


# --------------------------------------------------------------- C8 RFC-4
def test_rfc4_enum_and_axis_functions_match_reference():
    ref_vals = {v.value for v in REF.rfc4.AnatomicalOrientationValues}
    assert eng_rfc4.ORIENTATION_VALUES == ref_vals
    for val in sorted(ref_vals):
        ro = REF.rfc4.AnatomicalOrientation(
            value=REF.rfc4.AnatomicalOrientationValues(val)
        )
        eo = eng_rfc4.AnatomicalOrientation(val)
        ax_ref = REF.rfc4.add_anatomical_orientation_to_axis(
            {"name": "x", "type": "space"}, ro
        )
        ax_eng = eng_rfc4.add_anatomical_orientation_to_axis(
            {"name": "x", "type": "space"}, eo
        )
        # reference stores the enum member; compare the serialized form
        ax_ref["orientation"]["value"] = str(
            ax_ref["orientation"]["value"].value
            if hasattr(ax_ref["orientation"]["value"], "value")
            else ax_ref["orientation"]["value"]
        )
        assert ax_eng == ax_ref, val
        assert REF.rfc4.remove_anatomical_orientation_from_axis(
            dict(ax_ref)
        ) == eng_rfc4.remove_anatomical_orientation_from_axis(dict(ax_eng))


def test_itk_lps_mapping_matches_reference():
    for name in ("x", "y", "z", "t", "c"):
        ref = REF.rfc4.itk_lps_to_anatomical_orientation(name)
        eng = eng_rfc4.itk_lps_to_anatomical_orientation(name)
        if ref is None:
            assert eng is None
        else:
            assert eng is not None and eng.value == ref.value.value


def test_is_rfc4_enabled_matches_reference():
    for flags in (None, [], [4], [1, 2], [4, 9]):
        assert eng_rfc4.is_rfc4_enabled(flags) == REF.rfc4.is_rfc4_enabled(flags)


def test_reference_rfc4_validator_accepts_engine_rfc4_store(spark, tmp_path):
    """Engine writes an RFC-4-enabled store; the reference's own
    validate_rfc4_orientation (jsonschema over the vendored RFC-4
    schema) must accept its axes."""
    arr = np.arange(24, dtype="uint8").reshape(2, 3, 4)
    dims = ["z", "y", "x"]
    df = array_to_pixel_df(spark, arr, dims)
    img = to_ngff_image(df, dims=dims, shape={"z": 2, "y": 3, "x": 4},
                        scale={d: 1.0 for d in dims})
    img.dtype = "uint8"
    img.axes_orientations = {
        "x": "right-to-left",
        "y": "anterior-to-posterior",
        "z": "inferior-to-superior",
    }
    ms = to_multiscales(img, scale_factors=[], method="ITKWASM_BIN_SHRINK",
                        chunks={"z": 2, "y": 3, "x": 4})
    store = str(tmp_path / "rfc4.ome.zarr")
    to_ngff_zarr(store, ms, version="0.4", enabled_rfcs=[4])
    axes = json.load(open(os.path.join(store, ".zattrs")))["multiscales"][0]["axes"]
    REF.rfc4_validation.validate_rfc4_orientation(axes)  # raises on failure
    assert REF.rfc4_validation.has_rfc4_orientation_metadata(axes)
    # flag off -> no orientation; reference agrees nothing is present
    store2 = str(tmp_path / "norfc4.ome.zarr")
    to_ngff_zarr(store2, ms, version="0.4")
    axes2 = json.load(open(os.path.join(store2, ".zattrs")))["multiscales"][0]["axes"]
    assert not REF.rfc4_validation.has_rfc4_orientation_metadata(axes2)


# ----------------------------------------- S12 backend detection, live
def test_detect_backend_matches_reference(tmp_path, monkeypatch):
    """Run the reference's detect_cli_io_backend LIVE against the
    engine's, over real files for every decision branch. The reference's
    tifffile fallback imports the tifffile library only for its
    FILE_EXTENSIONS data table, which isn't installed here — stub that
    one data table with the engine's snapshot of the same public list
    (ingest/detect.py documents its provenance); all decision LOGIC
    executed is the reference's own."""
    import sys as _sys
    import types as _types

    from ngff_zarr_spark.ingest.detect import (
        TIFFFILE_EXTENSIONS,
        detect_cli_io_backend as eng_detect,
    )

    tiff_stub = _types.ModuleType("tifffile")

    class _TIFF:
        FILE_EXTENSIONS = [e.lstrip(".") for e in TIFFFILE_EXTENSIONS]

    tiff_stub.TIFF = _TIFF
    monkeypatch.setitem(_sys.modules, "tifffile", tiff_stub)

    def mk(name, size=16):
        p = tmp_path / name
        p.write_bytes(b"\x00" * size)
        return str(p)

    cases = []
    for ext in (
        ".tif", ".tiff", ".ome.tif", ".svs", ".png", ".jpg", ".jpeg",
        ".bmp", ".dcm", ".nrrd", ".nhdr", ".mha", ".mhd", ".mgh",
        ".mrc", ".vtk", ".nii", ".nii.gz", ".gif", ".webp", ".xyz",
        ".iwi.cbor", ".gipl.gz",
    ):
        cases.append([mk("f" + ext.replace(".", "_") + ext)])
    # multi-file series -> itk branch (itkwasm requires len==1)
    cases.append([mk("s1.png"), mk("s2.png")])
    cases.append([mk("d1.dcm"), mk("d2.dcm")])
    # zarr array dir / ome.zarr store dir
    za = tmp_path / "arr"
    za.mkdir()
    (za / ".zarray").write_text("{}")
    cases.append([str(za)])
    omz = tmp_path / "p.ome.zarr"
    omz.mkdir()
    cases.append([str(omz)])
    plainz = tmp_path / "q.zarr"
    plainz.mkdir()
    cases.append([str(plainz)])

    for paths in cases:
        ref = REF.detect_cli_io_backend.detect_cli_io_backend(paths)
        eng = eng_detect(paths)
        assert eng.value == ref.value, paths


# -------------------------------------------- A11 memory estimator, live
def test_memory_usage_matches_reference():
    class _Arr:  # geometry-only stand-in for the reference's dask array
        def __init__(self, shape, chunk, itemsize):
            self.shape = shape
            self.chunks = tuple((c,) for c in chunk)
            self.itemsize = itemsize
            self.ndim = len(shape)

    class _Img:
        def __init__(self, dims, arr):
            self.dims = dims
            self.data = arr

    cases = [
        (["z", "y", "x"], (64, 256, 256), (16, 64, 64), 2, set()),
        (["z", "y", "x"], (64, 256, 256), (16, 64, 64), 2, {"z"}),
        (["t", "z", "y", "x"], (5, 64, 128, 128), (1, 16, 64, 64), 4,
         {"t", "z"}),
        (["y", "x"], (1024, 1024), (256, 256), 8, {"y", "x"}),
    ]
    for dims, shape, chunk, itemsize, constrained in cases:
        ref = REF.memory_usage.memory_usage(
            _Img(dims, _Arr(shape, chunk, itemsize)), constrained
        )
        eng = planner.memory_usage_bytes(
            dict(zip(dims, shape)), itemsize, dict(zip(dims, chunk)),
            tuple(constrained),
        )
        # The reference multiplies arr.itemsize into EVERY dim's extent
        # (memory_usage.py:19-23), i.e. itemsize**ndim, not itemsize —
        # the engine computes true bytes (itemsize once). Pin the exact
        # relationship so the divergence is deliberate and tracked: if
        # the reference ever fixes the factor, this test fails loudly.
        assert eng * itemsize ** (len(dims) - 1) == ref, (dims, constrained)


# ------------------------------------------------------ C10 provenance shape
def test_method_metadata_shape_matches_reference():
    from ngff_zarr_spark.ome_zarr_api import get_method_metadata

    class _M:  # reference get_method_metadata wants an enum-like .name
        name = "ITKWASM_BIN_SHRINK"

    ref_md = dataclasses.asdict(REF.metadata.get_method_metadata(_M())) \
        if hasattr(REF, "metadata") else None
    eng_md = get_method_metadata("ITKWASM_BIN_SHRINK")
    assert set(eng_md) == {"description", "method", "version"}
    if ref_md is not None:
        assert set(ref_md) == set(eng_md)


# ---------------------------------- C7 verdict matrix vs live reference
def test_c7_schema_verdicts_match_reference_validator():
    """Replay the driver-graded c7 schema battery through the
    reference's validate() — engine verdict (0 problems vs >=1) must
    equal the reference's pass/raise for every non-strict row (strict
    rows can't run reference-side: vendored strict schemas lack
    $schema for this referencing release)."""
    from ngff_zarr_spark.gate import C7_SCHEMA_BATTERY
    from ngff_zarr_spark.validate import validate_schema

    checked = 0
    for key, (ver, model, strict, attrs) in sorted(C7_SCHEMA_BATTERY.items()):
        if strict:
            continue
        eng_ok = len(validate_schema(attrs, ver, model)) == 0
        try:
            REF.validate.validate(attrs, version=ver, model=model)
            ref_ok = True
        except Exception:
            ref_ok = False
        assert eng_ok == ref_ok, key
        checked += 1
    assert checked >= 10


def test_version_converted_store_passes_reference_validator(
    spark, engine_stores, tmp_path
):
    """Engine 0.4->0.5 and 0.5->0.4 conversions (C9) must both produce
    documents the reference's validator accepts."""
    from ngff_zarr_spark.ome_zarr_api import convert_ome_zarr_version

    stores, _img = engine_stores
    up = str(tmp_path / "up05.ome.zarr")
    convert_ome_zarr_version(spark, stores["0.4"], up, "0.5")
    REF.validate.validate(_store_attrs(up, "0.5"), version="0.5", model="image")
    down = str(tmp_path / "down04.ome.zarr")
    convert_ome_zarr_version(spark, stores["0.5"], down, "0.4")
    REF.validate.validate(_store_attrs(down, "0.4"), version="0.4", model="image")


# --------------------------- differential mutation fuzz vs ref validator
def _key_paths(doc, prefix=(), max_depth=5):
    """Enumerate every (path, container, key) in a nested doc."""
    out = []
    if len(prefix) >= max_depth:
        return out
    if isinstance(doc, dict):
        items = list(doc.items())
    elif isinstance(doc, list):
        items = list(enumerate(doc))
    else:
        return out
    for k, v in items:
        out.append((prefix + (k,), doc, k))
        out.extend(_key_paths(v, prefix + (k,), max_depth))
    return out


@pytest.mark.parametrize("version,model,valid", [
    ("0.4", "image", {"multiscales": [{
        "version": "0.4",
        "axes": [{"name": "y", "type": "space"},
                 {"name": "x", "type": "space"}],
        "datasets": [{"path": "0", "coordinateTransformations": [
            {"type": "scale", "scale": [1.0, 1.0]}]}],
    }]}),
    ("0.5", "image", {"ome": {"version": "0.5", "multiscales": [{
        "axes": [{"name": "z", "type": "space"},
                 {"name": "y", "type": "space"},
                 {"name": "x", "type": "space"}],
        "datasets": [{"path": "0", "coordinateTransformations": [
            {"type": "scale", "scale": [1.0, 1.0, 1.0]}]}],
    }]}}),
    ("0.4", "plate", {"plate": {
        "columns": [{"name": "1"}], "rows": [{"name": "A"}],
        "wells": [{"path": "A/1", "rowIndex": 0, "columnIndex": 0}],
        "version": "0.4"}}),
])
def test_mutation_fuzz_verdicts_match_reference(version, model, valid):
    """Differential fuzz: for EVERY key in a valid document, (a) delete
    it, (b) replace its value with a type-mismatched 42 — the engine's
    schema verdict must equal the reference validate()'s pass/raise on
    every mutant. A systematic sweep, not sampling: any divergence in
    required/type/enum handling between the two validators surfaces
    here."""
    import copy

    from ngff_zarr_spark.validate import validate_schema

    def verdicts(doc):
        eng_ok = len(validate_schema(doc, version, model)) == 0
        try:
            REF.validate.validate(doc, version=version, model=model)
            ref_ok = True
        except Exception:
            ref_ok = False
        return eng_ok, ref_ok

    eng_ok, ref_ok = verdicts(valid)
    assert eng_ok and ref_ok, "fixture must start valid on both sides"

    mutants = 0
    for path, _cont, _key in _key_paths(valid):
        for mode in ("delete", "retype"):
            doc = copy.deepcopy(valid)
            cont = doc
            for p in path[:-1]:
                cont = cont[p]
            if mode == "delete":
                if isinstance(cont, list):
                    del cont[path[-1]]
                else:
                    cont.pop(path[-1])
            else:
                cont[path[-1]] = 42
            eng_ok, ref_ok = verdicts(doc)
            assert eng_ok == ref_ok, (path, mode, eng_ok, ref_ok)
            mutants += 2
    assert mutants >= 30


# ----------------------------------------------- C5 omero color, live
def test_omero_color_validation_matches_reference():
    """The engine validates at construction (__post_init__); the
    reference on an explicit validate_color() call — compare the
    accept/reject decision itself."""
    from ngff_zarr_spark.model import (
        OmeroChannel as EngChannel,
        OmeroWindow as EngWindow,
    )

    ref_v04 = REF.v04_zarr_metadata
    for color in ("00FF00", "ffffff", "AbCdEf", "000000",
                  "greenish", "00FF0", "00FF000", "GGHHII", "", "#00FF00"):
        ref_ch = ref_v04.OmeroChannel(
            color=color, window=ref_v04.OmeroWindow(0.0, 1.0, 0.0, 1.0)
        )
        try:
            ref_ch.validate_color()
            ref_ok = True
        except ValueError:
            ref_ok = False
        try:
            EngChannel(color=color, window=EngWindow(0.0, 1.0, 0.0, 1.0))
            eng_ok = True
        except ValueError:
            eng_ok = False
        assert eng_ok == ref_ok, color


# ------------------------------------------ refpy oracle-literal honesty
def test_refpy_oracle_literals_match_live_reference():
    """The `refpy:` rows in oracle.sql_parity_battery are transcribed
    reference-code outputs; recompute them LIVE so a transcription error
    cannot survive."""
    from ngff_zarr_spark.gate import _refpy_expected_live
    from ngff_zarr_spark.oracle import REFPY_EXPECTED

    live = _refpy_expected_live(REF)
    assert live == REFPY_EXPECTED
