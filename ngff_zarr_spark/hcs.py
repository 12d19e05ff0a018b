"""High-Content-Screening plate/well catalog as partitioned DataFrames.

Reference model (/root/reference py/ngff_zarr/v04/zarr_metadata.py:206-253,
hcs.py:91-316): a plate is a rows × columns grid of wells, each well
holding fields-of-view, optionally grouped into acquisitions. In Spark
the plate IS a partitioned catalog — natural partition keys
(plate, row, col, field) — so well/image lookups (F7) are broadcast
joins or partition-pruned point reads, and the reference's LRU caches
(hcs.py:41-88) are subsumed by Spark block-manager caching.

``synthesize_plate`` builds a deterministic catalog from ``spark.range``
(the driver testdata has no HCS tables); the same derivation is emitted
as DuckDB SQL by oracle.py so lookups/joins are oracle-checked.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Plate metadata model (reference v04/zarr_metadata.py:206-253)


@dataclass
class PlateColumn:
    name: str


@dataclass
class PlateRow:
    name: str


@dataclass
class PlateWell:
    path: str
    rowIndex: int
    columnIndex: int


@dataclass
class PlateAcquisition:
    id: int
    name: Optional[str] = None
    maximumfieldcount: Optional[int] = None
    description: Optional[str] = None
    starttime: Optional[int] = None
    endtime: Optional[int] = None


@dataclass
class Plate:
    columns: list
    rows: list
    wells: list
    version: str = "0.4"
    acquisitions: Optional[list] = None
    field_count: Optional[int] = None
    name: Optional[str] = None


@dataclass
class WellImage:
    path: str
    acquisition: int = 0


@dataclass
class Well:
    images: list
    version: Optional[str] = None


@dataclass
class PlateSpec:
    plate_id: str = "plate0"
    n_rows: int = 8          # A..H
    n_cols: int = 12         # 1..12
    fields_per_well: int = 2
    n_acquisitions: int = 1


def synthesize_plate(spark: SparkSession, spec: PlateSpec | None = None) -> dict[str, DataFrame]:
    """Deterministic plate catalog: wells (row/col grid) and well_images
    (fields × acquisitions). Row names are letters, column names are
    1-based zero-padded numbers, well_path = row/col — mirroring the
    reference's path layout (hcs.py:586-600)."""
    spec = spec or PlateSpec()
    n_wells = spec.n_rows * spec.n_cols
    wells = spark.range(n_wells).select(
        F.lit(spec.plate_id).alias("plate_id"),
        (F.col("id") / spec.n_cols).cast("long").alias("row_index"),
        (F.col("id") % spec.n_cols).cast("long").alias("col_index"),
    ).select(
        "plate_id",
        "row_index",
        "col_index",
        F.char(F.col("row_index") + 65).alias("row_name"),
        (F.col("col_index") + 1).cast("string").alias("col_name"),
    ).withColumn(
        "well_path", F.concat_ws("/", F.col("row_name"), F.col("col_name"))
    )

    n_images = n_wells * spec.fields_per_well * spec.n_acquisitions
    per_well = spec.fields_per_well * spec.n_acquisitions
    well_images = spark.range(n_images).select(
        F.lit(spec.plate_id).alias("plate_id"),
        (F.col("id") / per_well).cast("long").alias("well_id"),
        ((F.col("id") / spec.fields_per_well).cast("long") % spec.n_acquisitions).alias("acquisition_id"),
        (F.col("id") % spec.fields_per_well).alias("field_index"),
    ).select(
        "plate_id",
        (F.col("well_id") / spec.n_cols).cast("long").alias("row_index"),
        (F.col("well_id") % spec.n_cols).alias("col_index"),
        "acquisition_id",
        "field_index",
    ).withColumn(
        "well_path",
        F.concat_ws("/", F.char(F.col("row_index") + 65), (F.col("col_index") + 1).cast("string")),
    ).withColumn(
        "image_path",
        F.concat_ws("/", F.col("well_path"), F.col("field_index").cast("string")),
    )
    return {"wells": wells, "well_images": well_images}


def get_well(wells: DataFrame, row_name: str, col_name: str) -> DataFrame:
    """F7 point lookup: well by (row, col) — reference hcs.py:140-160."""
    return wells.filter((F.col("row_name") == row_name) & (F.col("col_name") == col_name))


def get_image_by_acquisition(
    well_images: DataFrame, acquisition_id: int, field_index: int
) -> DataFrame:
    """F7: image by acquisition + field — reference hcs.py:300-316."""
    return well_images.filter(
        (F.col("acquisition_id") == acquisition_id) & (F.col("field_index") == field_index)
    )


# ---------------------------------------------------------------------------
# Real HCS store I/O (S18-S20)


def _plate_to_dict(plate: Plate) -> dict:
    """Parity: to_hcs_zarr's plate_dict assembly (reference hcs.py:481-512)."""
    doc: dict = {
        "columns": [{"name": c.name} for c in plate.columns],
        "rows": [{"name": r.name} for r in plate.rows],
        "wells": [
            {"path": w.path, "rowIndex": w.rowIndex, "columnIndex": w.columnIndex}
            for w in plate.wells
        ],
        "version": plate.version,
    }
    if plate.acquisitions:
        doc["acquisitions"] = []
        for a in plate.acquisitions:
            acq: dict = {"id": a.id}
            for key in ("name", "maximumfieldcount", "description", "starttime", "endtime"):
                v = getattr(a, key)
                if v is not None:
                    acq[key] = v
            doc["acquisitions"].append(acq)
    if plate.field_count is not None:
        doc["field_count"] = plate.field_count
    if plate.name is not None:
        doc["name"] = plate.name
    return doc


def _plate_from_dict(plate_data: dict) -> Plate:
    """Defensive-typed parse (parity from_hcs_zarr, hcs.py:369-456)."""
    columns = [
        PlateColumn(name=c["name"])
        for c in plate_data.get("columns", [])
        if isinstance(c, dict) and isinstance(c.get("name"), str)
    ]
    rows = [
        PlateRow(name=r["name"])
        for r in plate_data.get("rows", [])
        if isinstance(r, dict) and isinstance(r.get("name"), str)
    ]
    wells = [
        PlateWell(path=w["path"], rowIndex=w["rowIndex"], columnIndex=w["columnIndex"])
        for w in plate_data.get("wells", [])
        if isinstance(w, dict)
        and isinstance(w.get("path"), str)
        and isinstance(w.get("rowIndex"), int)
        and isinstance(w.get("columnIndex"), int)
    ]
    acquisitions = None
    if isinstance(plate_data.get("acquisitions"), list):
        acquisitions = []
        for a in plate_data["acquisitions"]:
            if isinstance(a, dict) and isinstance(a.get("id"), int):
                acquisitions.append(
                    PlateAcquisition(
                        id=a["id"],
                        name=a.get("name") if isinstance(a.get("name"), str) else None,
                        maximumfieldcount=a.get("maximumfieldcount")
                        if isinstance(a.get("maximumfieldcount"), int)
                        else None,
                        description=a.get("description")
                        if isinstance(a.get("description"), str)
                        else None,
                        starttime=a.get("starttime") if isinstance(a.get("starttime"), int) else None,
                        endtime=a.get("endtime") if isinstance(a.get("endtime"), int) else None,
                    )
                )
    return Plate(
        columns=columns,
        rows=rows,
        wells=wells,
        version=plate_data.get("version") if isinstance(plate_data.get("version"), str) else "0.4",
        acquisitions=acquisitions,
        field_count=plate_data.get("field_count")
        if isinstance(plate_data.get("field_count"), int)
        else None,
        name=plate_data.get("name") if isinstance(plate_data.get("name"), str) else None,
    )


def to_hcs_zarr(plate: Plate, store_path: str) -> None:
    """S19: write the plate structure (root group + ome/plate attrs) —
    reference to_hcs_zarr (hcs.py:460-535): zarr v2 for 0.4, v3 for
    0.5+, attrs under the 'ome' key in both."""
    from .sources.zarr_store import open_store

    zarr_format = 2 if plate.version == "0.4" else 3
    store = open_store(store_path)
    attrs = {"ome": {"version": plate.version, "plate": _plate_to_dict(plate)}}
    store.write_group("", attrs, zarr_format)


def from_hcs_zarr(spark: SparkSession, store_path: str, validate: bool = False) -> dict:
    """S18: read a real plate store → Plate metadata + catalog
    DataFrames (wells / well_images), image loads lazily via read_image
    at ``{well}/{field}`` prefixes (S1 with path pushdown)."""
    from .sources.zarr_store import open_store

    store = open_store(store_path)
    if store.exists("zarr.json"):
        attrs = store.get_json("zarr.json").get("attributes", {})
    else:
        attrs = store.get_json(".zattrs")
    if validate:
        from .validate import validate as validate_attrs

        validate_attrs(attrs, model="plate", strict=True)
    if isinstance(attrs.get("ome"), dict) and "plate" in attrs["ome"]:
        plate_data = attrs["ome"]["plate"]
    elif "plate" in attrs:
        plate_data = attrs["plate"]
    else:
        raise ValueError("No plate metadata found in store")
    plate = _plate_from_dict(plate_data)

    wells_rows = []
    for w in plate.wells:
        # names come from the WELL PATH ("{row}/{column}", authoritative
        # per the NGFF spec) — rowIndex/columnIndex are LOGICAL plate
        # coordinates and need not index into the rows/columns arrays
        # (sparse plates; reference bug class
        # py/test/test_index_out_of_range.py)
        parts = w.path.split("/")
        if len(parts) == 2:
            row_name, col_name = parts
        else:
            row_name = plate.rows[w.rowIndex].name if w.rowIndex < len(plate.rows) else None
            col_name = (
                plate.columns[w.columnIndex].name if w.columnIndex < len(plate.columns) else None
            )
        wells_rows.append((store_path.rstrip("/").rsplit("/", 1)[-1], w.rowIndex, w.columnIndex, row_name, col_name, w.path))
    wells = spark.createDataFrame(
        wells_rows,
        "plate_id string, row_index long, col_index long, row_name string, col_name string, well_path string",
    )

    image_rows = []
    for w in plate.wells:
        well_attrs = None
        for key in (f"{w.path}/.zattrs", f"{w.path}/zarr.json"):
            if store.exists(key):
                doc = store.get_json(key)
                well_attrs = doc.get("attributes", doc)
                break
        if well_attrs is None:
            continue
        well_doc = (
            well_attrs.get("ome", {}).get("well")
            if isinstance(well_attrs.get("ome"), dict)
            else None
        ) or well_attrs.get("well")
        if not well_doc:
            continue
        for img in well_doc.get("images", []):
            # defensive-typed like the rest of this parser: an image entry
            # without an addressable path can't be catalogued — skip it
            # rather than KeyError mid-catalog (same posture as the well
            # filter). Spec-lax stores write "path": 0 as a JSON integer;
            # coerce numeric paths to str instead of silently dropping
            # the image (ADVICE r18)
            if not isinstance(img, dict):
                continue
            raw_path = img.get("path")
            if isinstance(raw_path, bool) or not isinstance(raw_path, (str, int)):
                continue
            img_path = str(raw_path)
            image_rows.append(
                (
                    store_path.rstrip("/").rsplit("/", 1)[-1],
                    w.rowIndex,
                    w.columnIndex,
                    int(img.get("acquisition", 0)),
                    int(img_path) if img_path.isdigit() else 0,
                    w.path,
                    f"{w.path}/{img_path}",
                )
            )
    well_images = spark.createDataFrame(
        image_rows,
        "plate_id string, row_index long, col_index long, acquisition_id long, "
        "field_index long, well_path string, image_path string",
    )
    return {"plate": plate, "wells": wells, "well_images": well_images}


def write_hcs_well_image(
    spark: SparkSession,
    store_path: str,
    multiscales,
    plate_metadata: Plate,
    row_name: str,
    column_name: str,
    field_index: int = 0,
    acquisition_id: int = 0,
    well_metadata: Optional[Well] = None,
    version: str = "0.4",
    **kwargs,
) -> None:
    """S20: write one field-of-view into a plate store — validates
    row/col/well against the plate metadata, UPSERTS the well's image
    list into its attrs, then delegates the pixel write to to_ngff_zarr
    at ``{row}/{col}/{field}`` (reference hcs.py:538-765; the attr-merge
    branch :655-716 is the incremental-acquisition hook T1 builds on)."""
    from .ome_zarr_api import to_ngff_zarr
    from .sources.zarr_store import open_store

    if not any(r.name == row_name for r in plate_metadata.rows):
        raise ValueError(f"Row '{row_name}' not found in plate metadata")
    if not any(c.name == column_name for c in plate_metadata.columns):
        raise ValueError(f"Column '{column_name}' not found in plate metadata")
    well_path = f"{row_name}/{column_name}"
    if not any(w.path == well_path for w in plate_metadata.wells):
        raise ValueError(f"Well '{well_path}' not found in plate metadata")

    zarr_format = 2 if version == "0.4" else 3
    store = open_store(store_path)
    _upsert_well_attrs(
        store, well_path, field_index, acquisition_id, well_metadata,
        version, zarr_format,
    )

    field_store = f"{store_path}/{well_path}/{field_index}"
    to_ngff_zarr(field_store, multiscales, version=version, **kwargs)


def _upsert_well_attrs(
    store,
    well_path: str,
    field_index: int,
    acquisition_id: int,
    well_metadata: Optional[Well],
    version: str,
    zarr_format: int,
) -> None:
    """Merge one field into the well's image-list attrs (the reference
    attr-merge branch, hcs.py:655-716)."""
    # merge with any existing well attrs (metadata upsert)
    if well_metadata is None:
        existing = None
        for key in (f"{well_path}/.zattrs", f"{well_path}/zarr.json"):
            if store.exists(key):
                doc = store.get_json(key)
                existing = doc.get("attributes", doc)
                break
        if existing:
            well_doc = (
                existing.get("ome", {}).get("well")
                if isinstance(existing.get("ome"), dict)
                else None
            ) or existing.get("well")
            if well_doc:
                well_metadata = Well(
                    images=[
                        WellImage(path=i["path"], acquisition=i.get("acquisition", 0))
                        for i in well_doc.get("images", [])
                    ],
                    version=well_doc.get("version", version),
                )
    if well_metadata is None:
        well_metadata = Well(
            images=[WellImage(path=str(field_index), acquisition=acquisition_id)],
            version=version,
        )
    elif not any(
        i.path == str(field_index) and i.acquisition == acquisition_id
        for i in well_metadata.images
    ):
        well_metadata.images.append(
            WellImage(path=str(field_index), acquisition=acquisition_id)
        )

    well_dict = {
        "images": [
            {"path": i.path, "acquisition": i.acquisition} for i in well_metadata.images
        ],
        "version": well_metadata.version or version,
    }
    if version == "0.4":
        well_attrs = {"well": well_dict}
    elif version == "0.5":
        well_dict.pop("version", None)
        well_attrs = {"ome": {"well": well_dict, "version": version}}
    else:
        raise ValueError(f"Unsupported OME-Zarr version: {version}")
    store.write_group(well_path, well_attrs, zarr_format)
    # r19: hand the merged Well back so a multi-field caller can chain
    # upserts without re-reading the JSON it just wrote (the store
    # read happens once per well per call instead of once per field —
    # N GET + N PUT → W GET + N PUT driver/store round trips on a
    # 384-field acquisition batch). Same bytes: each write carries the
    # full image list accumulated so far, exactly as the re-read path.
    return well_metadata


def write_hcs_fields(
    spark: SparkSession,
    store_path: str,
    fields: list[tuple],
    plate_metadata: Plate,
    version: str = "0.4",
    compressor: Optional[str] = "gzip",
    max_fields_per_job: int = 64,
    **to_zarr_kwargs,
) -> None:
    """Batched T1 ingestion: write MANY fields-of-view into a plate
    store with the per-field metadata of :func:`write_hcs_well_image`
    but the pixels of up to ``max_fields_per_job`` fields per Spark job
    (ome_zarr_api.write_image_batch — field index folded into the
    packed chunk key). ``fields`` entries are
    ``(row_name, column_name, field_index, multiscales[, acquisition_id])``.

    Single-level multiscales with a common (shape, chunks, dtype) batch
    together; anything else — true pyramids, mixed geometries, or ANY
    extra ``to_zarr_kwargs`` (chunks_per_shard, dtype, enabled_rfcs, …
    options the batch plan doesn't model) — falls back to the per-field
    :func:`write_hcs_well_image` path with those kwargs forwarded
    verbatim. Store bytes are IDENTICAL to the per-field path (pinned
    in tests) — only the job count changes: a 96-well x 4-field
    acquisition batch goes from 384 scheduled writes to
    ceil(384/64) = 6."""
    from .ome_zarr_api import default_chunks, to_ngff_zarr as _tz, write_image_batch
    from .sources.zarr_store import open_store

    from .phases import phase

    zarr_format = 2 if version == "0.4" else 3
    store = open_store(store_path)
    batchable = not to_zarr_kwargs  # extra kwargs → per-field semantics
    groups: dict = {}
    # per-well merged attrs cache (r19): the first field of a well
    # reads whatever the store already holds (prior micro-batches),
    # later fields of the same well chain the in-memory Well instead
    # of re-reading the JSON this loop just wrote
    well_cache: dict = {}
    for entry in fields:
        row_name, column_name, field_index, multiscales = entry[:4]
        acquisition_id = entry[4] if len(entry) > 4 else 0
        well_path = f"{row_name}/{column_name}"
        if not any(w.path == well_path for w in plate_metadata.wells):
            raise ValueError(f"Well '{well_path}' not found in plate metadata")
        with phase("attr_upsert"):
            well_cache[well_path] = _upsert_well_attrs(
                store, well_path, field_index, acquisition_id,
                well_cache.get(well_path), version, zarr_format,
            )
        prefix = f"{well_path}/{field_index}"
        ms = multiscales
        img = ms.images[0]
        if len(ms.images) != 1 or not batchable:
            # true pyramid (level recompute) or caller-supplied
            # to_ngff_zarr options: the per-field writer owns the
            # semantics verbatim
            _tz(
                f"{store_path}/{prefix}", ms, version=version,
                compressor=compressor, **to_zarr_kwargs,
            )
            continue
        from .metadata import group_attributes

        attrs = group_attributes(ms.metadata, version) if ms.metadata else {}
        ms_doc = (attrs.get("ome", attrs)).get("multiscales")
        if ms_doc:
            for ax in ms_doc[0].get("axes", []):
                ax.pop("orientation", None)  # enabled_rfcs default
        store.write_group(prefix, attrs, zarr_format)
        path0 = ms.metadata.datasets[0].path if ms.metadata else "scale0/image"
        if "/" in path0:
            store.write_group(
                f"{prefix}/{path0.rsplit('/', 1)[0]}", {}, zarr_format
            )
        # SAME default as to_ngff_zarr (default_chunks), or the batched
        # and per-field stores diverge on chunk grid
        chunks = ms.chunks or default_chunks(img.dims)
        lvl_chunks = {
            d: min(chunks.get(d, 1), max(1, img.shape[d])) for d in img.dims
        }
        key = (
            tuple(img.dims),
            tuple(sorted(img.shape.items())),
            tuple(sorted(lvl_chunks.items())),
            img.dtype or "float64",
        )
        groups.setdefault(key, []).append(
            (img, f"{prefix}/{path0}", prefix)
        )

    for (dims_t, _shape_t, _chunks_t, dtype), members in groups.items():
        shape = members[0][0].shape
        lvl_chunks = dict(_chunks_t)
        batches = [
            members[i : i + max_fields_per_job]
            for i in range(0, len(members), max_fields_per_job)
        ]

        def _write_one(batch):
            write_image_batch(
                [(im.data, ap) for im, ap, _ in batch],
                store_path,
                shape,
                list(dims_t),
                lvl_chunks,
                dtype=dtype,
                compressor=compressor,
                zarr_format=zarr_format,
            )

        # overlap the independent per-batch Spark jobs (guide §2.6):
        # each batched write is latency-bound (64 coalesce-1 map tasks
        # + a handful of write tasks never fill the cluster), and the
        # batches touch DISJOINT array paths of the store, so jobs in
        # flight back-fill the executor slots a single job's tail
        # leaves idle. These jobs are scheduling-latency-bound, not
        # executor-bound, so wider beats the guide's 2-3 rule of thumb:
        # 6 workers measured pixel_jobs 9.0 -> 6.0 s over three
        # interleaved solo pairs vs 3 workers (r19).
        # Temp-view names are unique per call (the
        # _ngff_wib_ counter), so concurrent batches never collide.
        # The phase span wraps the WHOLE overlapped region once —
        # per-batch spans would overlap and sum to more than the wall
        # actually spent, corrupting the pixel_jobs tripwire.
        with phase("pixel_jobs"):
            if len(batches) == 1:
                _write_one(batches[0])
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=6) as pool:
                    for _ in pool.map(_write_one, batches):
                        pass
        with phase("consolidate"):
            for im, _ap, prefix in members:
                sub = open_store(f"{store_path}/{prefix}")
                if zarr_format == 2:
                    sub.consolidate_metadata_v2()
                else:
                    sub.consolidate_metadata_v3()
                for cb in list(im.computed_callbacks):
                    cb()


def well_image_catalog(wells: DataFrame, well_images: DataFrame) -> DataFrame:
    """J3 metadata join: enrich every field image with its well's grid
    coordinates. The wells side is tiny → broadcast hash join, no
    shuffle of the (large, at real plate scale) image table."""
    return (
        well_images.alias("i")
        .join(
            F.broadcast(wells.select("plate_id", "well_path", "row_name", "col_name").alias("w")),
            ["plate_id", "well_path"],
        )
        .select(
            "plate_id", "well_path", "row_name", "col_name",
            "acquisition_id", "field_index", "image_path",
        )
    )
