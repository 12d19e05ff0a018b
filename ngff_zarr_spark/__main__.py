"""``python -m ngff_zarr_spark`` — the user-facing conversion CLI
(S11 surface; reference: /root/reference py/ngff_zarr/cli.py:164-440).

Mirrors the reference's core flags — input(s)/output, dims/units/
scale/translation/name metadata overrides, downsample method, chunking,
sharding, OME-Zarr version — re-expressed over the Spark engine:

    python -m ngff_zarr_spark -i vol.tif -o vol.ome.zarr -m ITKWASM_GAUSSIAN
    python -m ngff_zarr_spark -i img.nii.gz -o out.ome.zarr \
        --ome-zarr-version 0.5 -c 64 --chunks-per-shard 2
    python -m ngff_zarr_spark -i in.ome.zarr             # info to stdout

Reference flags intentionally absent, with their Spark replacement:
``--local-cluster``/``--memory-target`` (cluster sizing belongs to
spark-submit/Spark conf), ``--cache-dir`` (Spark spill dirs),
``--use-tensorstore`` (single write path). ``--master`` / ``--cpus``
control the local SparkSession when the CLI creates one.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _pairs_to_dict(pairs: list[str], cast, flag: str) -> dict:
    """['z', '4.0', 'y', '1.0'] → {'z': 4.0, 'y': 1.0} (reference cli.py
    parses -s/-t the same way)."""
    if len(pairs) % 2 != 0:
        raise SystemExit(f"{flag} expects dim value pairs, got {pairs!r}")
    out = {}
    for i in range(0, len(pairs), 2):
        dim = pairs[i]
        if dim not in ("t", "c", "z", "y", "x"):
            raise SystemExit(f"{flag}: unknown dimension {dim!r}")
        out[dim] = cast(pairs[i + 1])
    return out


def _chunks_arg(vals: list[int] | None, dims: list[str]) -> dict[str, int] | None:
    """Single int or one int per dim (reference -c semantics)."""
    if not vals:
        return None
    spatial = [d for d in dims if d in ("z", "y", "x")]
    if len(vals) == 1:
        return {d: (vals[0] if d in spatial else 1) for d in dims}
    if len(vals) == len(dims):
        return dict(zip(dims, vals))
    if len(vals) == len(spatial):
        return {d: (vals[spatial.index(d)] if d in spatial else 1) for d in dims}
    raise SystemExit(
        f"--chunks expects 1, {len(spatial)} (spatial) or {len(dims)} values, got {len(vals)}"
    )


def build_parser() -> argparse.ArgumentParser:
    from .ome_zarr_api import METHODS

    p = argparse.ArgumentParser(
        prog="ngff-zarr-spark",
        description="Convert datasets to and from OME-Zarr with the Spark engine.",
    )
    p.add_argument("-i", "--input", nargs="+", required=True, help="Input image(s)")
    p.add_argument(
        "-o", "--output", help="Output store. If not given, print info to stdout."
    )

    meta = p.add_argument_group("metadata")
    meta.add_argument("-d", "--dims", nargs="+", metavar="DIM", help="Ordered dims from {t,c,z,y,x}")
    meta.add_argument("-u", "--units", nargs="+", metavar="U", help="dim unit pairs, e.g. z micrometer")
    meta.add_argument("-s", "--scale", nargs="+", metavar="S", help="dim spacing pairs, e.g. z 4.0 y 1.0")
    meta.add_argument("-t", "--translation", nargs="+", metavar="T", help="dim origin pairs")
    meta.add_argument("-n", "--name", help="Image name")
    meta.add_argument("--output-scale", type=int, default=0, help="Pyramid level to pick from multiscale input")
    meta.add_argument("--ome-zarr-version", default="0.4", choices=["0.4", "0.5"])
    meta.add_argument(
        "--enable-rfc", action="append", type=int, metavar="RFC_NUMBER",
        help="Enable specific RFC features (repeatable). Currently: 4 (anatomical orientation)",
    )

    proc = p.add_argument_group("processing")
    proc.add_argument("-c", "--chunks", nargs="+", type=int, metavar="N")
    proc.add_argument("--chunks-per-shard", type=int, help="Chunks per shard axis (OME-Zarr 0.5 only)")
    proc.add_argument(
        "-m", "--method", default="ITKWASM_GAUSSIAN",
        choices=sorted(METHODS), help="Downsampling method",
    )
    proc.add_argument("--compressor", default="gzip", help="gzip | zlib | zstd | blosc:<cname>:<clevel>:<shuffle> | none")
    proc.add_argument("--min-length", type=int, default=128, help="Pyramid stop size (A9 planner min_length)")
    proc.add_argument("--input-backend", help="Force an ingest backend (default: auto-detect)")
    proc.add_argument("-q", "--quiet", action="store_true", help="No progress output")

    sparkg = p.add_argument_group("spark")
    sparkg.add_argument("--cpus", type=int, default=0, help="local[N] cores for a CLI-created session (0 = all)")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)

    out = Path(args.output).resolve() if args.output else None
    if out is not None and any(out == Path(i).resolve() for i in args.input):
        raise SystemExit("Input and output must not be the same path.")

    from .ingest.cli import cli_input_to_ngff_image
    from .ingest.detect import ConversionBackend, detect_cli_io_backend
    from .ome_zarr_api import NgffProgress, to_multiscales, to_ngff_zarr

    if spark is None:
        from .session import get_spark

        spark = get_spark("ngff-zarr-spark-cli", cpus=(args.cpus or None))

    backend = (
        ConversionBackend(args.input_backend)
        if args.input_backend
        else detect_cli_io_backend(args.input)
    )

    from .ingest.export import detect_export_suffix, export_ngff_image

    # NGFF → NGFF passthrough (reference cli.py:398-408): the pyramid is
    # data, not a plan — read every level and write it verbatim (source
    # chunking preserved; -c rechunks; version conversion / resharding
    # apply), never re-downsample. Flags that change the IMAGE — dims/
    # scale/translation/units/name overrides or --output-scale — need
    # the single-level rebuild path below instead.
    rebuild_flags = any(
        v is not None and v != 0
        for v in (args.dims, args.scale, args.translation, args.units,
                  args.name, args.output_scale)
    )
    if (
        backend == ConversionBackend.NGFF_ZARR
        and out is not None
        and detect_export_suffix(str(out)) is None
        and not rebuild_flags
    ):
        from .ome_zarr_api import from_ngff_zarr

        ms = from_ngff_zarr(spark, args.input[0])
        if args.chunks:
            ms.chunks = _chunks_arg(args.chunks, ms.images[0].dims)
        progress = None
        if not args.quiet:
            progress = NgffProgress(
                on_update=lambda stage, i, n: print(f"[{i}/{n}] {stage}", file=sys.stderr)
            )
        to_ngff_zarr(
            str(out),
            ms,
            version=args.ome_zarr_version,
            compressor=(None if args.compressor == "none" else args.compressor),
            chunks_per_shard=args.chunks_per_shard,
            progress=progress,
            enabled_rfcs=args.enable_rfc,
        )
        if not args.quiet:
            print(f"wrote {out}", file=sys.stderr)
        return 0

    img = cli_input_to_ngff_image(spark, backend, args.input, args.output_scale)

    # metadata overrides (reference cli.py applies them post-ingest)
    if args.dims:
        from .model import rename_image_dims

        try:
            rename_image_dims(img, args.dims)
        except ValueError as exc:
            raise SystemExit(f"--{exc}")
    if args.scale:
        img.scale.update(_pairs_to_dict(args.scale, float, "--scale"))
    if args.translation:
        img.translation.update(_pairs_to_dict(args.translation, float, "--translation"))
    if args.units:
        img.axes_units = {
            **(img.axes_units or {}),
            **_pairs_to_dict(args.units, str, "--units"),
        }
    if args.name:
        img.name = args.name

    # non-Zarr output (reference cli.py:384-396 routes these through
    # itk.imwrite; here the native encoders): single level, no pyramid
    if out is not None and detect_export_suffix(str(out)) is not None:
        export_ngff_image(img, str(out))
        if not args.quiet:
            print(f"wrote {out}", file=sys.stderr)
        return 0

    chunks = _chunks_arg(args.chunks, img.dims)
    ms = to_multiscales(
        img, scale_factors=args.min_length, method=args.method, chunks=chunks
    )

    if out is None:
        print(f"name: {img.name}")
        print(f"dims: {img.dims}")
        print(f"shape: {img.shape}")
        print(f"scale: {img.scale}")
        print(f"translation: {img.translation}")
        print(f"dtype: {img.dtype}")
        print(f"levels: {len(ms.images)}")
        for i, lv in enumerate(ms.images):
            print(f"  scale{i}: {lv.shape}")
        return 0

    progress = None
    if not args.quiet:
        progress = NgffProgress(
            on_update=lambda stage, i, n: print(f"[{i}/{n}] {stage}", file=sys.stderr)
        )
    to_ngff_zarr(
        str(out),
        ms,
        version=args.ome_zarr_version,
        compressor=(None if args.compressor == "none" else args.compressor),
        chunks_per_shard=args.chunks_per_shard,
        progress=progress,
        enabled_rfcs=args.enable_rfc,
    )
    if not args.quiet:
        print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
