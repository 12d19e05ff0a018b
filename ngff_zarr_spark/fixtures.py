"""Deterministic synthetic pixel tables, derivable identically in Spark
and DuckDB.

The driver's correctness gate (CORRECTNESS_r{N}.json) runs each Spark
query side-by-side with an ANSI-SQL oracle in DuckDB over the same
parquet tables. The image operators (SURVEY.md §2.2-2.3) need a pixel
table ``P(t, c, z, y, x, v)`` that does not exist in the star schema —
so both engines *synthesize* it from a row-number generator with pure
integer arithmetic (no floats, no engine-specific hashing):

    i in [0, T*C*Z*Y*X)
    t = i // (C*Z*Y*X); c = (i // (Z*Y*X)) % C
    z = (i // (Y*X)) % Z; y = (i // X) % Y; x = i % X
    v = (t*97 + c*131 + z*73 + y*179 + x*283) % 251

Integer-valued ``v`` keeps downstream averages exactly reproducible
(integer sums < 2^53 are exact doubles in any summation order), which is
what makes the value-hash comparison robust across engines.

The default shape has odd Y/X (67, 65) to exercise the reference's
floor-crop semantics for trailing partial blocks
(/root/reference py/ngff_zarr/methods/_support.py:215-230).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ImageSpec:
    name: str
    t: int = 1
    c: int = 1
    z: int = 1
    y: int = 1
    x: int = 1

    @property
    def n(self) -> int:
        return self.t * self.c * self.z * self.y * self.x

    @property
    def shape(self) -> dict[str, int]:
        return {"t": self.t, "c": self.c, "z": self.z, "y": self.y, "x": self.x}


# Mirrors FIXTURES.md §3: a 3D anisotropic-ish volume with odd Y/X for
# partial-block coverage, a 5D tiny volume, and a 2D label image.
IMG3D = ImageSpec("img3d", t=1, c=1, z=32, y=67, x=65)       # 139,360 px
IMG5D = ImageSpec("img5d", t=2, c=2, z=16, y=33, x=33)        # 69,696 px
IMG2D_LABEL = ImageSpec("img2d_label", y=256, x=256)          # 65,536 px

# Value-mixing coefficients — shared constants for both engines.
_COEF = {"t": 97, "c": 131, "z": 73, "y": 179, "x": 283}
_MOD = 251
_LABEL_MOD = 5  # label images draw from a small label set


def pixel_df(spark: SparkSession, spec: ImageSpec, label: bool = False) -> DataFrame:
    """Build the pixel table as a DataFrame from ``spark.range`` —
    embarrassingly parallel, no data read, scales linearly with the
    requested volume (bench uses a much larger spec than the gate)."""
    i = F.col("id")
    czyx = spec.c * spec.z * spec.y * spec.x
    zyx = spec.z * spec.y * spec.x
    yx = spec.y * spec.x
    # exact integer division (`div`), not `/`+cast: double division is
    # only exact below 2^53 and bench-scale specs must stay exact
    t = F.expr(f"id div {czyx}")
    c = F.expr(f"id div {zyx}") % spec.c
    z = F.expr(f"id div {yx}") % spec.z
    y = F.expr(f"id div {spec.x}") % spec.y
    x = i % spec.x
    mod = _LABEL_MOD if label else _MOD
    v = (
        t * _COEF["t"] + c * _COEF["c"] + z * _COEF["z"] + y * _COEF["y"] + x * _COEF["x"]
    ) % mod
    return spark.range(spec.n).select(
        t.alias("t"), c.alias("c"), z.alias("z"), y.alias("y"), x.alias("x"),
        v.cast("long").alias("v"),
    )


def pixel_cte_sql(spec: ImageSpec, label: bool = False, alias: str = "P") -> str:
    """The equivalent DuckDB CTE text. Same arithmetic, DuckDB `//` for
    integer division; emitted as the prelude of every image-operator
    oracle query."""
    mod = _LABEL_MOD if label else _MOD
    czyx = spec.c * spec.z * spec.y * spec.x
    zyx = spec.z * spec.y * spec.x
    yx = spec.y * spec.x
    return f"""{alias} AS (
  SELECT t, c, z, y, x,
         CAST((t*{_COEF['t']} + c*{_COEF['c']} + z*{_COEF['z']} + y*{_COEF['y']} + x*{_COEF['x']}) % {mod} AS BIGINT) AS v
  FROM (
    SELECT CAST(i // {czyx} AS BIGINT) AS t,
           CAST((i // {zyx}) % {spec.c} AS BIGINT) AS c,
           CAST((i // {yx}) % {spec.z} AS BIGINT) AS z,
           CAST((i // {spec.x}) % {spec.y} AS BIGINT) AS y,
           CAST(i % {spec.x} AS BIGINT) AS x
    FROM range({spec.n}) r(i)
  )
)"""
