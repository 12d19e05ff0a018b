"""MCP server binding for the driver API (reference parity:
/root/reference mcp/ngff_zarr_mcp/server.py:33-212).

The capability layer lives in :mod:`ngff_zarr_spark.driver_api`; this
module is ONLY the protocol adapter — it binds the five verbs
(convert / info / read / validate / optimize) as MCP tools and the
three static catalogs as MCP resources. The ``mcp`` package is not in
this image, so the import is gated: :func:`build_server` raises a clear
ImportError here and works wherever ``pip install mcp`` has run.

Run: ``python -m ngff_zarr_spark.mcp_server`` (stdio transport).
"""

from __future__ import annotations

import json
from typing import Optional

SUPPORTED_INPUT_FORMATS = [
    ".tif", ".tiff", ".png", ".nii", ".nii.gz", ".zarr", ".ome.zarr",
]
SUPPORTED_OUTPUT_VERSIONS = ["0.4", "0.5"]
DOWNSAMPLING_METHODS = [
    "ITKWASM_GAUSSIAN", "ITKWASM_BIN_SHRINK", "ITKWASM_LABEL_IMAGE",
    "ITK_GAUSSIAN", "DASK_IMAGE_GAUSSIAN", "DASK_IMAGE_MODE",
    "DASK_IMAGE_NEAREST",
]
COMPRESSION_CODECS = [
    "gzip", "zlib", "zstd", "none",
    "blosc:lz4", "blosc:zstd", "blosc:zlib", "blosc:snappy",
]


def _get_spark():
    from .session import get_spark

    return get_spark("ngff-zarr-spark-mcp")


def build_server():
    """Construct the FastMCP server over the driver API. Requires the
    ``mcp`` package (ImportError with install hint otherwise)."""
    try:
        from mcp.server.fastmcp import FastMCP
    except ImportError as exc:  # pragma: no cover - mcp not in this image
        raise ImportError(
            "the 'mcp' package is required for the MCP transport — "
            "pip install mcp; the same capabilities are available "
            "directly via ngff_zarr_spark.driver_api"
        ) from exc

    from . import driver_api as api

    server = FastMCP("ngff-zarr-spark")

    @server.tool()
    def convert_images_to_ome_zarr(
        input_paths: list[str],
        output_path: str,
        ome_zarr_version: str = "0.4",
        dims: Optional[list[str]] = None,
        scale: Optional[dict] = None,
        translation: Optional[dict] = None,
        units: Optional[dict] = None,
        name: Optional[str] = None,
        chunks: Optional[list[int]] = None,
        chunks_per_shard: Optional[list[int]] = None,
        method: str = "ITKWASM_GAUSSIAN",
        scale_factors: Optional[list] = None,
        compression_codec: Optional[str] = "gzip",
    ) -> dict:
        """Convert images to OME-Zarr (distributed Spark jobs)."""
        return api.convert_images_to_ome_zarr(
            _get_spark(), input_paths, output_path,
            ome_zarr_version=ome_zarr_version, dims=dims, scale=scale,
            translation=translation, units=units, name=name, chunks=chunks,
            chunks_per_shard=chunks_per_shard, method=method,
            scale_factors=scale_factors, compression_codec=compression_codec,
        ).__dict__

    @server.tool()
    def get_ome_zarr_info(store_path: str) -> dict:
        """Inspect an OME-Zarr store (metadata only, no pixel scan)."""
        return api.get_ome_zarr_info(_get_spark(), store_path).__dict__

    @server.tool()
    def read_ome_zarr_store(store_path: str, validate: bool = False) -> dict:
        """Open a store lazily and report what was found."""
        return api.read_ome_zarr_store(_get_spark(), store_path, validate).__dict__

    @server.tool()
    def validate_ome_zarr_store(store_path: str) -> dict:
        """Structural + JSON-Schema validation of store metadata."""
        return api.validate_ome_zarr_store(store_path).__dict__

    @server.tool()
    def optimize_ome_zarr_store(
        input_path: str,
        output_path: str,
        compression_codec: Optional[str] = None,
        chunks: Optional[list[int]] = None,
        chunks_per_shard: Optional[list[int]] = None,
    ) -> dict:
        """Rewrite a store with new compression/chunking (values
        preserved exactly; distributed chunk writer)."""
        return api.optimize_ome_zarr_store(
            _get_spark(), input_path, output_path,
            compression_codec=compression_codec, chunks=chunks,
            chunks_per_shard=chunks_per_shard,
        ).__dict__

    @server.resource("ngff-zarr://supported-formats")
    def supported_formats() -> str:
        return json.dumps(
            {
                "input": SUPPORTED_INPUT_FORMATS,
                "output_versions": SUPPORTED_OUTPUT_VERSIONS,
            }
        )

    @server.resource("ngff-zarr://downsampling-methods")
    def downsampling_methods() -> str:
        return json.dumps(DOWNSAMPLING_METHODS)

    @server.resource("ngff-zarr://compression-codecs")
    def compression_codecs() -> str:
        return json.dumps(COMPRESSION_CODECS)

    return server


def main() -> None:  # pragma: no cover - needs the mcp package
    build_server().run()


if __name__ == "__main__":  # pragma: no cover
    main()
