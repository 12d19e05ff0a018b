"""DuckDB oracle SQL for every gate query (the independent check side).

Each SQL string recomputes the Spark query's semantics from scratch in
DuckDB's dialect over the same parquet views (plus the shared
``range``-derived pixel/plate fixtures). The SQL here deliberately does
NOT share code with the Spark implementations — it is the oracle.

Dialect correspondences used throughout (verified in tests):
- Spark ``conv(substr(md5(s),1,15),16,10)``  ==  DuckDB
  ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)`` (the portable h64)
- Spark ``regexp_replace`` is global; DuckDB needs the ``'g'`` flag.
- Spark ``sequence(0,n)`` is inclusive; DuckDB ``range(0,n)`` exclusive.
- DuckDB ``SUM(BIGINT)`` widens to HUGEINT → always CAST back.
- Spark list indexing ``element_at`` is 1-based, as is DuckDB ``l[i]``.
"""

from __future__ import annotations

from .fixtures import IMG2D_LABEL, IMG3D, IMG5D, pixel_cte_sql
from .functions.text import EN_STOPWORDS, LANG_STOPWORDS
from .gate import (
    ANN_K,
    CHUNKS3D,
    DTYPE_BYTES,
    EMB_DIM,
    F2D4,
    G_WEIGHTS,
    IMG3D_SCALE,
    IMG3D_TRANSLATION,
    N_LEVELS,
    NEAR_DUP_COS,
    Q3_DATE,
    Q3_SEGMENT,
    Q5_HI,
    Q5_LO,
    Q5_REGION,
    ROI_RANGES,
    SKEW_BASE_ID,
    SKEW_N,
    SKEW_TEXT,
    TPCH_Q1_CUTOFF,
)

H64 = "CAST(concat('0x', substr(md5({s}),1,15)) AS BIGINT)"
NORM = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"
TOKS_RAW = "list_filter(string_split(trim(regexp_replace({c}, '\\s+', ' ', 'g')), ' '), t -> t != '')"


def _crop3d(spec, f):
    conds = []
    for d in ("z", "y", "x"):
        fd = f.get(d, 1)
        if fd > 1:
            lim = fd * (spec.shape[d] // fd)
            conds.append(f"{d} < {lim}")
    return " AND ".join(conds) if conds else "TRUE"


def _block_sel(f):
    cols = ["t", "c"]
    for d in ("z", "y", "x"):
        fd = f.get(d, 1)
        cols.append(f"{d}//{fd} AS {d}" if fd > 1 else d)
    return ", ".join(cols)


def _stride(f):
    return " AND ".join(f"{d}%{f[d]}=0" for d in ("z", "y", "x") if f.get(d, 1) > 1) or "TRUE"


def sql_f1_level_pick():
    f = {"z": 2, "y": 2, "x": 2}
    return f"""WITH {pixel_cte_sql(IMG3D)}
SELECT CAST(1 AS BIGINT) AS scale, t, c, z//2 AS z, y//2 AS y, x//2 AS x, v
FROM P WHERE {_crop3d(IMG3D, f)} AND {_stride(f)}"""


def sql_f2_roi():
    r = ROI_RANGES
    conds = " AND ".join(f"{d} >= {lo} AND {d} < {hi}" for d, (lo, hi) in r.items())
    return f"""WITH {pixel_cte_sql(IMG3D)}
SELECT t, c, z, y, x, v FROM P WHERE {conds}"""


def sql_f3_f4_tc_select():
    return f"""WITH {pixel_cte_sql(IMG5D)}
SELECT t, c, z, y, x, v FROM P WHERE t = 1 AND c = 1"""


def sql_f5_transpose():
    return f"""WITH {pixel_cte_sql(IMG3D)}
SELECT t, c, z, x AS y, y AS x, v FROM P WHERE z >= 0 AND z < 4"""


def _sql_bin_shrink(spec, f, label=False):
    return f"""WITH {pixel_cte_sql(spec, label=label)}
SELECT {_block_sel(f)}, AVG(v) AS v
FROM P WHERE {_crop3d(spec, f)}
GROUP BY 1,2,3,4,5"""


def sql_a2_bin_shrink():
    return _sql_bin_shrink(IMG3D, {"z": 2, "y": 2, "x": 2})


def sql_a2_bin_shrink_aniso():
    return _sql_bin_shrink(IMG3D, {"z": 1, "y": 2, "x": 2})


def sql_a7_nearest():
    f = {"z": 2, "y": 2, "x": 2}
    return f"""WITH {pixel_cte_sql(IMG3D)}
SELECT {_block_sel(f)}, v FROM P WHERE {_crop3d(IMG3D, f)} AND {_stride(f)}"""


def sql_a8_mode():
    f = F2D4
    return f"""WITH {pixel_cte_sql(IMG2D_LABEL, label=True)},
cnt AS (
  SELECT {_block_sel(f)}, v, COUNT(*) AS cnt
  FROM P WHERE {_crop3d(IMG2D_LABEL, f)}
  GROUP BY 1,2,3,4,5,6
),
rk AS (
  SELECT t, c, z, y, x, v,
         row_number() OVER (PARTITION BY t, c, z, y, x ORDER BY cnt DESC, v ASC) AS rn
  FROM cnt
)
SELECT t, c, z, y, x, v FROM rk WHERE rn = 1"""


def sql_a8_mode_centered():
    """Centered-window mode (generic_filter size=f mode='nearest' at
    stride f): per-dim window maps from range(), broadcast-joined, then
    weighted mode with smallest-value tie-break."""
    f = F2D4
    spec = IMG2D_LABEL
    maps = []
    join_conds = []
    out_cols = {"t": "t", "c": "c"}
    for d in ("z", "y", "x"):
        fd = f.get(d, 1)
        if fd <= 1:
            out_cols[d] = f"P.{d}"
            continue
        n = spec.shape[d]
        half = fd // 2
        maps.append(
            f"""m_{d} AS (
  SELECT src, outp, COUNT(*) AS mult FROM (
    SELECT CAST(i//{fd} AS BIGINT) AS outp,
           greatest(0, least({n - 1}, CAST(i//{fd} AS BIGINT)*{fd} + (i%{fd}) - {half})) AS src
    FROM range({(n // fd) * fd}) r(i)
  ) GROUP BY 1, 2
)"""
        )
        join_conds.append(f"JOIN m_{d} ON m_{d}.src = P.{d}")
        out_cols[d] = f"m_{d}.outp"
    mult = " * ".join(f"m_{d}.mult" for d in ("z", "y", "x") if f.get(d, 1) > 1)
    sel = ", ".join(f"{out_cols[d]} AS {d}" for d in ("t", "c", "z", "y", "x"))
    joins = "\n  ".join(join_conds)
    return f"""WITH {pixel_cte_sql(IMG2D_LABEL, label=True)},
{",".join(maps)},
cnt AS (
  SELECT {sel}, P.v AS v, CAST(SUM({mult}) AS BIGINT) AS wsum
  FROM P
  {joins}
  GROUP BY 1,2,3,4,5,6
),
rk AS (
  SELECT t, c, z, y, x, v,
         row_number() OVER (PARTITION BY t, c, z, y, x ORDER BY wsum DESC, v ASC) AS rn
  FROM cnt
)
SELECT t, c, z, y, x, v FROM rk WHERE rn = 1"""


def sql_a3_label_downsample():
    # Linear-weighted label interpolation (the itkwasm
    # downsample_label_image algorithm): only the per-dim center voxels
    # (floor/ceil of the sample point f*k + (f-1)/2) vote, equal
    # weights → integer vote count; ties → smallest label.
    f = F2D4
    center_terms = []
    for d in ("z", "y", "x"):
        fd = f.get(d, 1)
        if fd > 1:
            offs = sorted({(fd - 1) // 2, fd // 2})
            in_list = ", ".join(str(o) for o in offs)
            center_terms.append(f"({d} % {fd}) IN ({in_list})")
    centers = " AND ".join(center_terms)
    return f"""WITH {pixel_cte_sql(IMG2D_LABEL, label=True)},
w AS (
  SELECT t, c, z, y, x, v
  FROM P WHERE {_crop3d(IMG2D_LABEL, f)} AND {centers}
),
cnt AS (
  SELECT {_block_sel(f)}, v, CAST(COUNT(*) AS BIGINT) AS votes
  FROM w GROUP BY 1,2,3,4,5,6
),
rk AS (
  SELECT t, c, z, y, x, v,
         row_number() OVER (PARTITION BY t, c, z, y, x ORDER BY votes DESC, v ASC) AS rn
  FROM cnt
)
SELECT t, c, z, y, x, v FROM rk WHERE rn = 1"""


def _gauss_pass(src: str, axis: str, weights: list[int]) -> str:
    others = ", ".join(d for d in ("t", "c", "z", "y", "x") if d != axis)
    terms = [f"{weights[0]}*v"]
    for k in range(1, len(weights)):
        terms.append(
            f"{weights[k]}*(COALESCE(lag(v,{k}) OVER line_w, first_value(v) OVER full_w)"
            f" + COALESCE(lead(v,{k}) OVER line_w, last_value(v) OVER full_w))"
        )
    expr = " + ".join(terms)
    return f"""SELECT t, c, z, y, x, CAST({expr} AS BIGINT) AS v
  FROM {src}
  WINDOW line_w AS (PARTITION BY {others} ORDER BY {axis}),
         full_w AS (PARTITION BY {others} ORDER BY {axis}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""


def _sql_gaussian(weights):
    f = {"z": 2, "y": 2, "x": 2}
    return f"""WITH {pixel_cte_sql(IMG3D)},
gz AS ({_gauss_pass('P', 'z', weights)}),
gy AS ({_gauss_pass('gz', 'y', weights)}),
gx AS ({_gauss_pass('gy', 'x', weights)})
SELECT {_block_sel(f)}, v FROM gx WHERE {_crop3d(IMG3D, f)} AND {_stride(f)}"""


def sql_a1_gaussian():
    return _sql_gaussian(G_WEIGHTS)


def sql_a4_itk_gaussian():
    from .gate import ITK_G_WEIGHTS

    return _sql_gaussian(ITK_G_WEIGHTS)


def sql_a10_minmax():
    return f"""WITH {pixel_cte_sql(IMG3D)}
SELECT MIN(v) AS v_min, MAX(v) AS v_max FROM P"""


def sql_a11_chunk_cost():
    sh, ch = IMG3D.shape, CHUNKS3D
    ncz = -(-sh["z"] // ch["z"])
    ncy = -(-sh["y"] // ch["y"])
    ncx = -(-sh["x"] // ch["x"])
    return f"""WITH g AS (
  SELECT CAST(i//{ncy * ncx} AS BIGINT) AS cz,
         CAST((i//{ncx})%{ncy} AS BIGINT) AS cy,
         CAST(i%{ncx} AS BIGINT) AS cx
  FROM range({ncz * ncy * ncx}) r(i)
),
e AS (
  SELECT least({ch['z']}, {sh['z']} - cz*{ch['z']}) AS ez,
         least({ch['y']}, {sh['y']} - cy*{ch['y']}) AS ey,
         least({ch['x']}, {sh['x']} - cx*{ch['x']}) AS ex
  FROM g
)
SELECT COUNT(*) AS n_chunks,
       CAST(SUM(CAST(ez*ey*ex*{DTYPE_BYTES} AS BIGINT)) AS BIGINT) AS total_bytes
FROM e"""


def sql_c2_scale_translation():
    cols = ["CAST(i AS BIGINT) AS level"]
    for d in ("z", "y", "x"):
        s0, t0 = IMG3D_SCALE[d], IMG3D_TRANSLATION[d]
        cols.append(f"{s0} * pow(2, i) AS scale_{d}")
        cols.append(f"{t0} + 0.5 * (pow(2, i) - 1.0) * {s0} AS translation_{d}")
    sel = ",\n       ".join(cols)
    return f"SELECT {sel}\nFROM range({N_LEVELS}) r(i)"


# ---------------------------------------------------------------------------
# Documents / embeddings / events


def _toks_cte(lower: bool, table: str = "documents") -> str:
    src = NORM.format(c="text") if lower else None
    if lower:
        toks = f"list_filter(string_split({NORM.format(c='text')}, ' '), t -> t != '')"
    else:
        toks = TOKS_RAW.format(c="text")
    return f"q AS (SELECT doc_id, {toks} AS toks FROM {table})"


_SHINGLE = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(0, len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) "
    "ELSE [] END"
)

def _sig_cte(table: str = "documents") -> str:
    return f"""{_toks_cte(lower=True, table=table)},
sh0 AS (SELECT doc_id, unnest({_SHINGLE}) AS shingle FROM q),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
h2 AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(shingle),1,8)) AS BIGINT) AS ha,
         CAST(concat('0x', substr(md5(shingle),9,8)) AS BIGINT) AS hb
  FROM sh
),
sig AS (
  SELECT doc_id, p.i AS perm,
         MIN((ha + p.i * hb) % 4294967291) AS minhash
  FROM h2 CROSS JOIN range(16) p(i) GROUP BY 1, 2
)"""


_SIG_CTE = _sig_cte()


def sql_a9_pyramid_plan():
    """Independently hand-derived from the reference's planner rule
    (halve every spatial dim whose size exceeds half the current
    maximum; stop when another halving would drop below 2×min_length —
    to_multiscales.py:45-79) for shape (z=512, y=1024, x=2048),
    min_length=128:
      L1: only x (2048>1024)        → cumulative (1,1,2)
      L2: y,x (1024>512)            → cumulative (1,2,4)
      L3: all (512=max)             → cumulative (2,4,8)
      stop: next halving → 128 < 2·128."""
    return """SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(4 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(4 AS BIGINT), CAST(8 AS BIGINT))
) t(level, fz, fy, fx)"""


def sql_s1_s4_zarr_roundtrip():
    # The Spark side goes pixels → zarr store → pixels; the oracle just
    # recomputes the pixels. Equality proves the store codec round-trips.
    return f"""WITH {pixel_cte_sql(IMG3D)}
SELECT t, c, z, y, x, v FROM P"""


def sql_s1_roi_pruned_read():
    # the pruned ROI scan must return EXACTLY the pixel formula under
    # the same WHERE — no chunk the pruner dropped may contain ROI rows
    from .gate import ROI_PRUNED_FILTER

    where = " AND ".join(
        f"{d} >= {lo} AND {d} < {hi}" for d, (lo, hi) in ROI_PRUNED_FILTER.items()
    )
    return f"""WITH {pixel_cte_sql(IMG3D)}
SELECT t, c, z, y, x, v FROM P WHERE {where}"""


def sql_dtype_complex_roundtrip():
    # complex roundtrip gates fold struct<re,im> back into one BIGINT
    # v = re + 251*im; re is the standard pixel formula, im its second
    # independent integer formula (gate._complex_roundtrip)
    return f"""WITH {pixel_cte_sql(IMG3D)}
SELECT t, c, z, y, x, CAST(v + 251 * ((v*3 + 7) % 251) AS BIGINT) AS v FROM P"""


def sql_s4_multiscale_level1():
    return _sql_bin_shrink(IMG3D, {"z": 2, "y": 2, "x": 2})


def sql_chunk_table_sums():
    ch = CHUNKS3D
    return f"""WITH {pixel_cte_sql(IMG3D)}
SELECT z//{ch['z']} AS cz, y//{ch['y']} AS cy, x//{ch['x']} AS cx,
       COUNT(*) AS n_vox, CAST(SUM(v) AS BIGINT) AS vsum
FROM P GROUP BY 1, 2, 3"""


def sql_s16_nifti_ingest():
    from .gate import NIFTI_SHAPE

    nx, ny, nz = NIFTI_SHAPE
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c,
       CAST(i % {nz} AS BIGINT) AS z,
       CAST((i // {nz}) % {ny} AS BIGINT) AS y,
       CAST(i // {ny * nz} AS BIGINT) AS x,
       CAST(((i // {ny * nz}) * 283 + ((i // {nz}) % {ny}) * 179 + (i % {nz}) * 73) % 251 AS BIGINT) AS v
FROM range({nx * ny * nz}) r(i)"""


def sql_s11_tiff_ingest():
    from .gate import TIFF_SHAPE

    h, w = TIFF_SHAPE
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS z,
       CAST(i // {w} AS BIGINT) AS y,
       CAST(i % {w} AS BIGINT) AS x,
       CAST(((i // {w}) * 179 + (i % {w}) * 283) % 251 AS BIGINT) AS v
FROM range({h * w}) r(i)"""


def sql_s11_tiff_series():
    from .gate import TIFF_SERIES_SHAPE

    nz, h, w = TIFF_SERIES_SHAPE
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c,
       CAST(i // {h * w} AS BIGINT) AS z,
       CAST((i // {w}) % {h} AS BIGINT) AS y,
       CAST(i % {w} AS BIGINT) AS x,
       CAST(((i // {h * w}) * 73 + ((i // {w}) % {h}) * 179 + (i % {w}) * 283) % 251 AS BIGINT) AS v
FROM range({nz * h * w}) r(i)"""


def sql_s13_png_series():
    from .gate import SERIES_SHAPE

    nz, h, w = SERIES_SHAPE
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c,
       CAST(i // {h * w} AS BIGINT) AS z,
       CAST((i // {w}) % {h} AS BIGINT) AS y,
       CAST(i % {w} AS BIGINT) AS x,
       CAST(((i // {h * w}) * 73 + ((i // {w}) % {h}) * 179 + (i % {w}) * 283) % 251 AS BIGINT) AS v
FROM range({nz * h * w}) r(i)"""


def sql_s11_jpeg_ingest():
    # the fixture is per-8x8-block-constant, so the lossy codec
    # round-trips exactly (see gate.q_s11_jpeg_ingest) and the oracle
    # recomputes the block formula straight from pixel coordinates
    from .gate import JPEG_BLOCKS

    gy, gx = JPEG_BLOCKS
    h, w = gy * 8, gx * 8
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS z,
       CAST(i // {w} AS BIGINT) AS y,
       CAST(i % {w} AS BIGINT) AS x,
       CAST((((i // {w}) // 8) * 179 + ((i % {w}) // 8) * 283) % 251 AS BIGINT) AS v
FROM range({h * w}) r(i)"""


def sql_s11_dicom_ingest():
    # the series gate writes instance k at z=k-1 with a coordinate
    # formula; header-ordered stacking makes z == instance-1 regardless
    # of the (reversed) filename order, so the oracle is the formula
    from .gate import DICOM_SHAPE

    nz, h, w = DICOM_SHAPE
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c,
       CAST(i // {h * w} AS BIGINT) AS z,
       CAST((i // {w}) % {h} AS BIGINT) AS y,
       CAST(i % {w} AS BIGINT) AS x,
       CAST(((i // {h * w}) * 73 + ((i // {w}) % {h}) * 179 + (i % {w}) * 283) % 251 AS BIGINT) AS v
FROM range({nz * h * w}) r(i)"""


def sql_s11_gif_ingest():
    # GIF is lossless-paletted, so the animated fixture's frame formula
    # round-trips exactly; frames land on the t axis (gate.q_s11_gif_ingest)
    from .gate import GIF_SHAPE

    nt, h, w = GIF_SHAPE
    return f"""SELECT CAST(i // {h * w} AS BIGINT) AS t, CAST(0 AS BIGINT) AS c,
       CAST(0 AS BIGINT) AS z,
       CAST((i // {w}) % {h} AS BIGINT) AS y,
       CAST(i % {w} AS BIGINT) AS x,
       CAST(((i // {h * w}) * 73 + ((i // {w}) % {h}) * 179 + (i % {w}) * 283) % 251 AS BIGINT) AS v
FROM range({nt * h * w}) r(i)"""


def sql_s11_webp_ingest():
    # VP8L is lossless, so the fixture's pixel formula round-trips
    # exactly (gate.q_s11_webp_ingest)
    from .gate import WEBP_SHAPE

    h, w = WEBP_SHAPE
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS z,
       CAST(i // {w} AS BIGINT) AS y,
       CAST(i % {w} AS BIGINT) AS x,
       CAST(((i // {w}) * 179 + (i % {w}) * 283) % 251 AS BIGINT) AS v
FROM range({h * w}) r(i)"""


def sql_s11_mgh_ingest():
    from .gate import MGH_SHAPE

    nz, ny, nx = MGH_SHAPE
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c,
       CAST(i // {ny * nx} AS BIGINT) AS z,
       CAST((i // {nx}) % {ny} AS BIGINT) AS y,
       CAST(i % {nx} AS BIGINT) AS x,
       CAST(((i // {ny * nx}) * 73 + ((i // {nx}) % {ny}) * 179 + (i % {nx}) * 283) % 251 AS BIGINT) AS v
FROM range({nz * ny * nx}) r(i)"""


def sql_s11_mrc_ingest():
    from .gate import MRC_SHAPE

    nz, ny, nx = MRC_SHAPE
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c,
       CAST(i // {ny * nx} AS BIGINT) AS z,
       CAST((i // {nx}) % {ny} AS BIGINT) AS y,
       CAST(i % {nx} AS BIGINT) AS x,
       CAST(((i // {ny * nx}) * 73 + ((i // {nx}) % {ny}) * 179 + (i % {nx}) * 283) % 251 AS BIGINT) AS v
FROM range({nz * ny * nx}) r(i)"""


def sql_s11_wav_ingest():
    from .gate import WAV_SHAPE

    nch, ns = WAV_SHAPE
    return f"""SELECT CAST(0 AS BIGINT) AS t,
       CAST(i // {ns} AS BIGINT) AS c,
       CAST(0 AS BIGINT) AS z, CAST(0 AS BIGINT) AS y,
       CAST(i % {ns} AS BIGINT) AS x,
       CAST(((i // {ns}) * 101 + (i % {ns}) * 13 + 37) % 2048 AS BIGINT) AS v
FROM range({nch * ns}) r(i)"""


def sql_ingest_battery():
    return (
        f"SELECT 'tiff' AS fmt, * FROM ({sql_s11_tiff_ingest()})\n"
        f"UNION ALL\nSELECT 'tiff_series' AS fmt, * FROM ({sql_s11_tiff_series()})\n"
        f"UNION ALL\nSELECT 'png_series' AS fmt, * FROM ({sql_s13_png_series()})\n"
        f"UNION ALL\nSELECT 'jpeg' AS fmt, * FROM ({sql_s11_jpeg_ingest()})\n"
        f"UNION ALL\nSELECT 'dicom' AS fmt, * FROM ({sql_s11_dicom_ingest()})\n"
        f"UNION ALL\nSELECT 'gif' AS fmt, * FROM ({sql_s11_gif_ingest()})\n"
        f"UNION ALL\nSELECT 'webp' AS fmt, * FROM ({sql_s11_webp_ingest()})\n"
        f"UNION ALL\nSELECT 'mgh' AS fmt, * FROM ({sql_s11_mgh_ingest()})\n"
        f"UNION ALL\nSELECT 'mrc' AS fmt, * FROM ({sql_s11_mrc_ingest()})\n"
        f"UNION ALL\nSELECT 'wav' AS fmt, * FROM ({sql_s11_wav_ingest()})"
    )


def sql_dedup_exact():
    return f"""SELECT md5({NORM.format(c='text')}) AS content_md5,
       COUNT(*) AS n_docs, MIN(doc_id) AS representative
FROM documents GROUP BY 1"""


def sql_text_gopher(table: str = "documents"):
    """``table`` re-parameterizes the source for composed-pipeline
    twins (r16 web_pipeline_battery runs it over the crawl-budget
    survivors)."""
    from .functions.text import (
        EN_STOPWORDS,
        GOPHER_MAX_TOP_BIGRAM_FRAC,
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_DISTINCT_STOPWORDS,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_WORDS,
    )

    stops = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""WITH {_toks_cte(lower=True, table=table)},
w AS (SELECT doc_id, unnest(toks) AS tok FROM q),
ws AS (
  SELECT doc_id, COUNT(*) AS n_words,
         round(CAST(SUM(length(tok)) AS DOUBLE) / COUNT(*), 6) AS mean_word_len,
         COUNT(DISTINCT tok) AS n_distinct,
         CAST(COUNT(DISTINCT CASE WHEN tok IN ({stops}) THEN tok END) AS BIGINT) AS n_distinct_stopwords
  FROM w GROUP BY 1
),
bg0 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2 THEN
            list_transform(range(0, len(toks)-1), i -> toks[i+1] || ' ' || toks[i+2])
         ELSE [] END) AS bigram
  FROM q
),
bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg0 GROUP BY 1, 2),
bgs AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS total_c FROM bgc GROUP BY 1),
j AS (
  SELECT ws.doc_id, n_words, mean_word_len, n_distinct_stopwords,
         round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac,
         COALESCE(round(CAST(top_c AS DOUBLE) / total_c, 6), 0.0) AS top_bigram_frac
  FROM ws LEFT JOIN bgs ON bgs.doc_id = ws.doc_id
)
SELECT *,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
        AND mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN}
        AND n_distinct_stopwords >= {GOPHER_MIN_DISTINCT_STOPWORDS}
        AND top_bigram_frac <= {GOPHER_MAX_TOP_BIGRAM_FRAC}) AS passes
FROM j"""


def _sql_pii_augmented() -> str:
    """Mirror of gate._pii_augmented_docs: deterministic synthetic PII
    appended per doc_id residue class."""
    return (
        "aug AS (SELECT doc_id, text"
        " || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 + 1 AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END"
        " AS t FROM documents)"
    )


def sql_text_pii():
    # same patterns the Spark side runs (functions/pii.PII_PATTERNS are
    # written in the Java-regex ∩ RE2 subset); counts scan the raw
    # augmented text, redaction applies the classes in declared order
    from .functions.pii import PII_PATTERNS

    counts = ",\n       ".join(
        "CAST(len(regexp_extract_all(t, '" + pat + "')) AS BIGINT) AS n_" + name
        for name, pat, _ in PII_PATTERNS
    )
    red = "t"
    for _, pat, repl in PII_PATTERNS:
        red = "regexp_replace(" + red + ", '" + pat + "', '" + repl + "', 'g')"
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""WITH {_sql_pii_augmented()},
c AS (SELECT doc_id,
       {counts},
       md5({red}) AS redacted_md5
FROM aug)
SELECT *, CAST({total} AS BIGINT) AS n_pii FROM c"""


def sql_text_repetition():
    # Gopher dup-ngram char fractions: per (doc, n) the share of n-gram
    # char mass (count x length) in n-grams occurring >= 2 times
    from .functions.repetition import REP_NS

    vals = ", ".join(f"({n})" for n in REP_NS)
    pivots = ",\n       ".join(
        f"COALESCE(MAX(CASE WHEN n = {n} THEN frac END), 0.0) AS dup{n}_frac"
        for n in REP_NS
    )
    return f"""WITH {_toks_cte(lower=True)},
alln AS (
  SELECT doc_id, n,
         unnest(CASE WHEN len(toks) >= n THEN
            list_transform(generate_series(1, len(toks)-n+1), i -> array_to_string(toks[i:i+n-1], ' '))
         ELSE [] END) AS gram
  FROM q, (VALUES {vals}) v(n)
),
pg AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM alln GROUP BY 1, 2, 3),
pd AS (
  SELECT doc_id, n,
         round(COALESCE(CAST(SUM(CASE WHEN c >= 2 THEN c * length(gram) END) AS DOUBLE)
                        / SUM(c * length(gram)), 0.0), 6) AS frac
  FROM pg GROUP BY 1, 2
)
SELECT d.doc_id,
       {pivots}
FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
GROUP BY 1"""


def sql_corpus_pack_stats():
    from .functions.packing import DEFAULT_BUDGET, DEFAULT_BUCKETS  # noqa: F401

    budget, n_buckets = 512, 8  # gate.q_corpus_pack_stats parameters
    h = H64.format(s="concat('pack:', CAST(doc_id AS VARCHAR))")
    toks = TOKS_RAW.format(c="text")
    return f"""WITH t AS (
  SELECT doc_id,
         CAST(len({toks}) AS BIGINT) AS n_tokens,
         ({h}) AS h
  FROM documents
),
b AS (SELECT doc_id, LEAST(n_tokens, {budget}) AS ct, h % {n_buckets} AS bucket, h FROM t),
w AS (
  SELECT bucket, ct,
         SUM(ct) OVER (PARTITION BY bucket ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM b
)
SELECT bucket, CAST((cum - ct) // {budget} AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs, CAST(SUM(ct) AS BIGINT) AS n_tokens_packed
FROM w GROUP BY 1, 2"""


def _sql_span_table() -> str:
    """CTE chain producing the duplicated-span table (mirrors
    functions/spans.duplicated_spans; validated on hand-worked
    fixtures in tests/test_r08_ops.py)."""
    from .functions.spans import SPAN_N as N

    gram = f"array_to_string(toks[i:i+{N - 1}], ' ')"
    return f"""q AS (
  SELECT doc_id, list_filter(string_split({NORM.format(c='text')}, ' '), t -> t != '') AS toks
  FROM documents
),
pg AS (
  SELECT doc_id, i - 1 AS pos, {H64.format(s=gram)} AS gh
  FROM q, unnest(generate_series(1, len(toks) - {N} + 1)) AS u(i)
),
gc AS (SELECT gh, COUNT(*) AS cnt FROM pg GROUP BY 1),
dup AS (SELECT doc_id, pos FROM pg JOIN gc USING (gh) WHERE cnt >= 2),
mk AS (
  SELECT doc_id, pos,
         MAX(pos + {N - 1}) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dup
),
ns AS (SELECT doc_id, pos,
         CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS is_new
       FROM mk),
sp AS (SELECT doc_id, pos,
         SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
       FROM ns),
spans AS (
  SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
         CAST(MAX(pos) + {N - 1} AS BIGINT) AS span_end,
         CAST(MAX(pos) + {N} - MIN(pos) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_windows
  FROM sp GROUP BY doc_id, span_id
)"""


# r9 (VERDICT r8 asks #1/#2): expected values below are OUTPUTS OF THE
# REFERENCE IMPLEMENTATION'S OWN CODE (methods/_support.py:107-240,
# rfc4.py:129-181, v04/zarr_metadata.py:131-138), computed by executing
# the reference modules in-place (tests/_reference_import.py) and
# transcribed here so the DuckDB oracle stays self-contained.
# tests/test_reference_code_oracle.py::test_refpy_oracle_literals_match_
# live_reference recomputes them against the live reference every run —
# a transcription error cannot survive.
REFPY_EXPECTED = [
    ("refpy:sigma_f2_3_4", "0.735534255037,1.20112240879,1.64470459404"),
    ("refpy:dimf_chain_int", "z2y2x2|z2y2x2|z2y2x2"),
    ("refpy:dimf_chain_dict", "z1y2x2|z2y2x2"),
    ("refpy:next_scale", "s=4,1,1;t=2,0.25,-1.75"),
    ("refpy:block_shape", "3,3,3,3"),
    ("refpy:lps_x", "right-to-left:anatomical"),
    ("refpy:lps_y", "anterior-to-posterior:anatomical"),
    ("refpy:lps_z", "inferior-to-superior:anatomical"),
    ("refpy:orientation_md5", "15062af2cd9dfb97ada0a57caf447640"),
    ("refpy:units", "true,true,true,false,false"),
]


def sql_parity_battery():
    """Literal VALUES oracle for the S10/S12/S19/C4/C5/J4 parity facts
    (gate.q_parity_battery) — the a9_pyramid_plan pattern: expected
    values pinned independently of the code that produces them."""
    expected = [
        ("s12:tif_single", "tifffile"),
        ("s12:png_single", "itkwasm_image_io"),
        ("s12:png_multi", "itk"),
        ("s12:nii_gz", "nibabel"),
        ("s12:unknown_ext", "imageio"),
        ("s12:dcm_multi", "itk"),
        ("s12:zarr_array_dir", "zarr"),
        ("s12:ome_zarr_ext", "ngff_zarr"),
        ("c4:unit_micrometer", "true"),
        ("c4:unit_parsec", "true"),
        ("c4:unit_furlong", "false"),
        ("c4:dim_z_type", "space"),
        ("c4:dim_t_type", "time"),
        ("c4:dim_q_supported", "false"),
        ("c5:color_00FF00", "ok"),
        ("c5:color_badhex", "error"),
        ("j4:equal", "true"),
        ("j4:diff_kinds", "chunk bytes,metadata"),
        ("s10:format", "1"),
        ("s10:keys", ".zattrs,.zgroup,0/.zarray,0/.zattrs"),
        ("s10:roundtrip", "true"),
        ("s19:version", "0.4"),
        ("s19:wells", "A/1,B/2"),
        ("s19:well0", "0:0"),
        ("s19:acq0", "0:acq0:2"),
        ("s19:reread_name", "Parity Plate"),
        ("s19:reread_wells", "2"),
        ("s19:v05_node", "group"),
        ("s19:v05_version", "0.5"),
        # r9: independent-implementation interop (tools/minizarr.py)
        ("interop:engine_v2_indep_read", "equal"),
        ("interop:engine_v3_indep_read", "equal"),
        ("interop:engine_sharded_indep_read", "equal"),
        ("interop:indep_write_engine_read", "equal"),
    ] + REFPY_EXPECTED
    vals = ",\n ".join(f"('{c}', '{r}')" for c, r in expected)
    return f"SELECT * FROM (VALUES\n {vals}) t(chk, result)"


def sql_dedup_dup_spans():
    return f"WITH {_sql_span_table()}\nSELECT * FROM spans"


def sql_dedup_dup_token_frac():
    return f"""WITH {_sql_span_table()},
per_doc AS (SELECT doc_id, SUM(n_tokens) AS dup_tokens FROM spans GROUP BY 1),
tot AS (SELECT doc_id, CAST(len(list_filter(string_split({NORM.format(c='text')}, ' '), t -> t != '')) AS BIGINT) AS total FROM documents)
SELECT tot.doc_id,
       CAST(COALESCE(dup_tokens, 0) AS BIGINT) AS dup_tokens,
       total,
       round(CAST(COALESCE(dup_tokens, 0) AS DOUBLE) / total, 6) AS dup_frac
FROM tot LEFT JOIN per_doc ON per_doc.doc_id = tot.doc_id"""


def sql_dedup_substring_cut():
    """Keep-one substring-dedup deletion budget (mirrors
    functions/spans.substring_dedup_stats): removal set = every
    occurrence of a corpus-repeated N-gram window EXCEPT the
    lexicographically smallest (doc_id, pos) witness; cut_tokens is
    the interval union of the removal windows, computed here with the
    classic lead() gaps formula (the Spark side's closed-form array
    aggregate is exactly equal — consecutive positions contribute
    min(N, gap), the last contributes N)."""
    from .functions.spans import SPAN_N as N

    gram = f"array_to_string(toks[i:i+{N - 1}], ' ')"
    toks = f"list_filter(string_split({NORM.format(c='text')}, ' '), t -> t != '')"
    return f"""WITH q AS (
  SELECT doc_id, {toks} AS toks FROM documents
),
pg AS (
  SELECT doc_id, i - 1 AS pos, {H64.format(s=gram)} AS gh
  FROM q, unnest(generate_series(1, len(toks) - {N} + 1)) AS u(i)
),
r AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY gh) AS n_occ
  FROM pg
),
d AS (SELECT doc_id, pos FROM r WHERE n_occ >= 2 AND rn > 1),
g AS (
  SELECT doc_id, pos,
         lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS np
  FROM d
),
cov AS (
  SELECT doc_id, COUNT(*) AS n_rep,
         SUM(CASE WHEN np IS NULL THEN {N} ELSE LEAST({N}, np - pos) END) AS cut_tokens
  FROM g GROUP BY 1
),
tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM q)
SELECT tot.doc_id, n_tokens,
       CAST(GREATEST(n_tokens - {N - 1}, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(n_rep, 0) AS BIGINT) AS n_rep,
       CAST(COALESCE(cut_tokens, 0) AS BIGINT) AS cut_tokens,
       CASE WHEN n_tokens > 0
            THEN round(CAST(COALESCE(cut_tokens, 0) AS DOUBLE) / n_tokens, 6)
            ELSE 0.0 END AS cut_frac
FROM tot LEFT JOIN cov ON cov.doc_id = tot.doc_id"""


def sql_corpus_kmeans_profile():
    # reuse the IVF oracle's learned-quantizer assignment CTEs; the
    # profile is just the per-cell count over the assignments
    from .gate import KMEANS_ITERS

    return f"""WITH {_UNROLL},
{_kmeans_ctes(KMEANS_ITERS)},
adots AS (
  SELECT d.vec_id, d.cell, round(d.dot / knorm.norm, 6) AS dot FROM (
    SELECT e.vec_id, c.cell,
           SUM(CAST(e.embedding[CAST(c.pos AS INTEGER)+1] AS DOUBLE) * c.val) AS dot
    FROM embeddings e CROSS JOIN kcent c
    GROUP BY e.vec_id, c.cell
  ) d JOIN knorm USING (cell)
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM adots
  ) WHERE rn = 1
)
SELECT CAST(cell AS BIGINT) AS cell, CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM cells GROUP BY 1"""


def sql_corpus_chunking():
    ck, st = 32, 24  # gate.q_corpus_chunking parameters
    toks = TOKS_RAW.format(c="text")
    ln = f"LEAST({ck}, len(toks) - start_tok)"
    return f"""WITH q AS (SELECT doc_id, {toks} AS toks FROM documents)
SELECT doc_id,
       CAST(start_tok // {st} AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST({ln} AS BIGINT) AS n_tokens,
       md5(array_to_string(toks[start_tok + 1 : start_tok + {ln}], ' ')) AS chunk_md5
FROM q, unnest(CASE WHEN len(toks) > 0
                    THEN generate_series(0, len(toks) - 1, {st})
                    ELSE [] END) AS u(start_tok)"""


def sql_corpus_cap_per_source():
    # the NAIVE single-window form — the Spark side's two-phase top-k
    # must match it exactly
    h = H64.format(s="concat('cap:', CAST(doc_id AS VARCHAR))")
    return f"""SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rk
  FROM documents
) WHERE rk <= 3"""


def sql_corpus_rebalance():
    from .functions.corpus import REBALANCE_BUCKETS as B

    h = H64.format(s="concat('mix:', CAST(doc_id AS VARCHAR))")
    return f"""WITH c AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY 1),
mm AS (SELECT MIN(n_total) AS m FROM c),
t AS (SELECT lang, n_total, ({B} * m) // n_total AS threshold FROM c, mm),
k AS (
  SELECT d.lang, CASE WHEN ({h}) % {B} < t.threshold THEN 1 ELSE 0 END AS kept
  FROM documents d JOIN t ON t.lang = d.lang
)
SELECT t.lang, CAST(t.n_total AS BIGINT) AS n_total,
       CAST(t.threshold AS BIGINT) AS threshold,
       CAST(SUM(k.kept) AS BIGINT) AS n_kept
FROM k JOIN t ON t.lang = k.lang
GROUP BY 1, 2, 3"""


def _sql_bigram_cte(table_expr: str = "documents", prefix: str = "") -> str:
    """(doc_id, g2, g1) hashed bigrams with duplicates — mirrors
    functions/lm._doc_bigrams. ``prefix`` namespaces the CTE names so
    two instances (corpus + target) compose in one WITH chain without
    post-hoc string surgery (the r9-advisor anti-pattern)."""
    from .functions.lm import LM_BUCKETS as B

    g2 = H64.format(s="toks[i] || ' ' || toks[i+1]")
    g1 = H64.format(s="toks[i]")
    toks = f"list_filter(string_split({NORM.format(c='text')}, ' '), t -> t != '')"
    return f"""{prefix}q AS (SELECT doc_id, {toks} AS toks FROM {table_expr}),
{prefix}bg AS (
  SELECT doc_id, ({g2}) % {B} AS g2, ({g1}) % {B} AS g1
  FROM {prefix}q, unnest(generate_series(1, len(toks) - 1)) AS u(i)
)"""


def sql_text_lm_perplexity():
    return f"""WITH {_sql_bigram_cte()},
c2 AS (SELECT g2, COUNT(*) AS c12 FROM bg GROUP BY 1),
c1 AS (SELECT g1, COUNT(*) AS c1n FROM bg GROUP BY 1),
v AS (SELECT COUNT(*) AS v FROM c2),
term AS (
  SELECT bg.doc_id,
         CAST(floor(log2(CAST(c2.c12 + 1 AS DOUBLE) / (c1.c1n + v.v)) * 1000000 + 0.5) AS BIGINT) AS lp
  FROM bg JOIN c2 USING (g2) JOIN c1 USING (g1) CROSS JOIN v
),
sc AS (SELECT doc_id, COUNT(*) AS nb, SUM(lp) AS s FROM term GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(sc.s AS BIGINT) AS logprob_micro,
       CAST(sc.s // sc.nb AS BIGINT) AS avg_micro
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id"""


def _tfidf_w_cte(max_df: int) -> str:
    """tf/df/smooth-idf weight CTEs shared by the TF-IDF oracles —
    first-principles mirror of functions/ir.tfidf_weights (same
    tokenization CTE as every text oracle, same sklearn smooth-idf
    formula, same absolute df cap)."""
    return f"""{_toks_cte(lower=True)},
tfx AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_SHINGLE}) AS term FROM q) GROUP BY 1, 2
),
dfx AS (SELECT term, COUNT(*) AS df FROM tfx GROUP BY 1),
nx AS (SELECT COUNT(*) AS n_total FROM documents),
wx AS (
  SELECT doc_id, term,
         tf * (ln((1.0 + n_total) / (1.0 + df)) + 1.0) AS w
  FROM tfx JOIN dfx USING (term) CROSS JOIN nx
  WHERE df <= {max_df}
)"""


def sql_text_quality_classifier():
    from .functions.text import QC_KEEP_FRAC, QC_N_FEAT

    bucket = H64.format(s="concat('qc:', t)")
    wexpr = (
        H64.format(s=f"concat('qcw:', CAST(({bucket}) % {QC_N_FEAT} AS VARCHAR))")
        + " % 2001 - 1000"
    )
    q = 1.0 - QC_KEEP_FRAC
    return f"""WITH {_toks_cte(lower=True)},
s AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(COALESCE(list_sum(list_transform(toks, t -> {wexpr})), 0) AS BIGINT) AS score
  FROM q WHERE len(toks) > 0
),
s2 AS (SELECT *, round(CAST(score AS DOUBLE) / n_tokens, 6) AS score_per_tok FROM s),
c AS (SELECT round(quantile_cont(score_per_tok, {q}), 6) AS cutoff FROM s2)
SELECT doc_id, n_tokens, score, score_per_tok,
       score_per_tok >= cutoff AS keep
FROM s2 CROSS JOIN c"""


def _bpe_ctes(n_merges: int) -> str:
    """K-stage BPE merge unroll — the CTE-chain mirror of
    functions/bpe._learn. Stage i: pair counts p{i} over vocab w{i-1}
    (adjacent symbols weighted by word count), argmax b{i} with the
    sentinel fallback and (count desc, left, right) tie-break, then
    w{i} applies the merge as ONE literal replace (DuckDB's replace is
    left-to-right non-overlapping — greedy BPE application, same as
    Spark's)."""
    sep = "chr(31)"
    sent = "chr(2)"
    parts = [
        _toks_cte(lower=True),
        f"""wc AS (
  SELECT word, COUNT(*) AS cnt FROM (SELECT unnest(toks) AS word FROM q)
  WHERE word NOT LIKE '%' || {sep} || '%' AND word NOT LIKE '%' || {sent} || '%'
  GROUP BY 1
)""",
        f"""w0 AS (
  SELECT word, cnt,
         {sep} || array_to_string(regexp_extract_all(word, '.'), {sep} || {sep}) || {sep} AS seq
  FROM wc
)""",
    ]
    for i in range(1, int(n_merges) + 1):
        parts.append(f"""p{i} AS (
  SELECT string_split(pr, {sep})[1] AS la, string_split(pr, {sep})[2] AS rb,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM (
    SELECT cnt, unnest(CASE WHEN len(sy) >= 2 THEN
        list_transform(range(0, len(sy)-1), j -> sy[j+1] || {sep} || sy[j+2])
      ELSE [] END) AS pr
    FROM (SELECT cnt, string_split(trim(seq, {sep}), {sep} || {sep}) AS sy FROM w{i-1})
  ) GROUP BY 1, 2
)""")
        parts.append(f"""b{i} AS (
  SELECT la, rb, c FROM (
    SELECT la, rb, c FROM p{i}
    UNION ALL SELECT {sent}, {sent}, CAST(-1 AS BIGINT)
  ) ORDER BY c DESC, la, rb LIMIT 1
)""")
        parts.append(f"""w{i} AS (
  SELECT word, cnt,
         replace(seq, {sep} || la || {sep} || {sep} || rb || {sep},
                 {sep} || la || rb || {sep}) AS seq
  FROM w{i-1} CROSS JOIN b{i}
)""")
    return ",\n".join(parts)


def sql_text_bpe_merges():
    from .functions.bpe import BPE_MERGES

    steps = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, la AS left, rb AS right, c AS pair_count FROM b{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return f"""WITH {_bpe_ctes(BPE_MERGES)}
SELECT * FROM ({steps}) WHERE pair_count > 0"""


def sql_text_bpe_subwords():
    from .functions.bpe import BPE_MERGES

    sep = "chr(31)"
    sent = "chr(2)"
    return f"""WITH {_bpe_ctes(BPE_MERGES)},
seg AS (
  SELECT word, CAST(len(string_split(trim(seq, {sep}), {sep} || {sep})) AS BIGINT) AS n_syms
  FROM w{BPE_MERGES}
),
dwc AS (
  SELECT doc_id, word, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(toks) AS word FROM q)
  WHERE word NOT LIKE '%' || {sep} || '%' AND word NOT LIKE '%' || {sent} || '%'
  GROUP BY 1, 2
)
SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
       CAST(SUM(cnt * n_syms) AS BIGINT) AS n_subwords
FROM dwc JOIN seg USING (word)
GROUP BY 1"""


def sql_ir_bm25_topk():
    from .functions.ir import BM25_B, BM25_K1, TFIDF_MAX_DF, TFIDF_TOPK

    qids = ", ".join(str(i) for i in range(10))
    return f"""WITH {_toks_cte(lower=True)},
tfx AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_SHINGLE}) AS term FROM q) GROUP BY 1, 2
),
dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfx GROUP BY 1),
nx AS (SELECT COUNT(*) AS n_total FROM documents),
dlx AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tfx GROUP BY 1),
ax AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dlx),
qt AS (
  SELECT tfx.doc_id AS query_id, tfx.term
  FROM tfx JOIN dfx USING (term)
  WHERE tfx.doc_id IN ({qids}) AND df <= {TFIDF_MAX_DF}
),
sc AS (
  SELECT qt.query_id, tfx.doc_id,
         round(SUM(
           ln(1.0 + (n_total - df + 0.5) / (df + 0.5))
           * (tf * ({BM25_K1} + 1.0))
           / (tf + {BM25_K1} * ((1.0 - {BM25_B}) + {BM25_B} * dl / avgdl))
         ), 6) AS score
  FROM qt
  JOIN tfx USING (term)
  JOIN dfx USING (term)
  JOIN dlx ON dlx.doc_id = tfx.doc_id
  CROSS JOIN nx CROSS JOIN ax
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM sc
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score
FROM r WHERE rank <= {TFIDF_TOPK}"""


def sql_ir_bm25_query():
    """Free-text BM25 twin: the SAME corpus CTE stack as the
    doc-as-query oracle, with the query terms shingled from a VALUES
    CTE of the gate's literal strings (functions/ir.IR_EVAL_QUERIES is
    the single source of truth for both engines)."""
    from .functions.ir import BM25_B, BM25_K1, IR_EVAL_QUERIES, TFIDF_MAX_DF, TFIDF_TOPK

    vals = ", ".join(
        "({}, '{}')".format(q, t.replace("'", "''")) for q, t in IR_EVAL_QUERIES
    )
    qnorm = NORM.format(c="qtext")
    return f"""WITH {_toks_cte(lower=True)},
tfx AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_SHINGLE}) AS term FROM q) GROUP BY 1, 2
),
dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfx GROUP BY 1),
nx AS (SELECT COUNT(*) AS n_total FROM documents),
dlx AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tfx GROUP BY 1),
ax AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dlx),
qq AS (SELECT * FROM (VALUES {vals}) AS t(query_id, qtext)),
qtk AS (
  SELECT query_id,
         list_filter(string_split({qnorm}, ' '), t -> t != '') AS toks
  FROM qq
),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest({_SHINGLE}) AS term FROM qtk)
  JOIN dfx USING (term)
  WHERE df <= {TFIDF_MAX_DF}
),
sc AS (
  SELECT qt.query_id, tfx.doc_id,
         round(SUM(
           ln(1.0 + (n_total - df + 0.5) / (df + 0.5))
           * (tf * ({BM25_K1} + 1.0))
           / (tf + {BM25_K1} * ((1.0 - {BM25_B}) + {BM25_B} * dl / avgdl))
         ), 6) AS score
  FROM qt
  JOIN tfx USING (term)
  JOIN dfx USING (term)
  JOIN dlx ON dlx.doc_id = tfx.doc_id
  CROSS JOIN nx CROSS JOIN ax
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM sc
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank, doc_id, score
FROM r WHERE rank <= {TFIDF_TOPK}"""


def sql_text_bpe_encode():
    from .functions.bpe import BPE_MERGES

    sep = "chr(31)"
    sent = "chr(2)"
    return f"""WITH {_bpe_ctes(BPE_MERGES)},
seg AS (
  SELECT word, string_split(trim(seq, {sep}), {sep} || {sep}) AS syms
  FROM w{BPE_MERGES}
),
ids AS (
  SELECT token, CAST(row_number() OVER (ORDER BY token) AS BIGINT) AS token_id
  FROM (SELECT DISTINCT unnest(syms) AS token FROM seg)
),
dw0 AS (
  SELECT doc_id,
         unnest(list_transform(range(len(toks)),
                i -> CAST(i AS VARCHAR) || {sep} || toks[i+1])) AS pr
  FROM q
),
dw AS (
  SELECT doc_id,
         CAST(string_split(pr, {sep})[1] AS BIGINT) AS word_idx,
         substr(pr, position({sep} IN pr) + 1) AS word
  FROM dw0
),
ex0 AS (
  SELECT doc_id, word_idx,
         unnest(list_transform(range(len(syms)),
                j -> CAST(j AS VARCHAR) || {sep} || syms[j+1])) AS pr2
  FROM dw JOIN seg USING (word)
  WHERE word NOT LIKE '%' || {sep} || '%' AND word NOT LIKE '%' || {sent} || '%'
),
ex AS (
  SELECT doc_id, word_idx,
         CAST(string_split(pr2, {sep})[1] AS BIGINT) AS sym_idx,
         substr(pr2, position({sep} IN pr2) + 1) AS token
  FROM ex0
)
SELECT doc_id, word_idx, sym_idx, token_id, token
FROM ex JOIN ids USING (token)"""


def sql_events_zorder_key():
    from .functions.layout import ZORDER_BITS

    k = (1 << ZORDER_BITS) - 1
    def bucket(col, lo, hi):
        # constant-dimension guard mirrors the engine: hi == lo -> 0
        return (
            f"CASE WHEN CAST({hi} AS DOUBLE) = CAST({lo} AS DOUBLE) THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(LEAST(CAST({k} AS BIGINT), GREATEST(CAST(0 AS BIGINT), "
            f"CAST(floor((CAST({col} AS DOUBLE) - CAST({lo} AS DOUBLE)) * {k}.0 "
            f"/ (CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE))) AS BIGINT))) AS BIGINT) END"
        )
    # independent multiplication-form interleave (the Spark side uses
    # shifts/ORs): bit i of b1 lands at weight 2^(2i+1), of b2 at 2^(2i)
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((b1 >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"((b2 >> {i}) & 1) * {1 << (2 * i)}")
    inter = " + ".join(terms)
    return f"""WITH stats AS (
  SELECT MIN(user_id) AS lo1, MAX(user_id) AS hi1,
         MIN(value) AS lo2, MAX(value) AS hi2
  FROM events
),
b AS (
  SELECT event_id, {bucket("user_id", "lo1", "hi1")} AS b1,
         {bucket("value", "lo2", "hi2")} AS b2
  FROM events CROSS JOIN stats
)
SELECT event_id, b1, b2, CAST({inter} AS BIGINT) AS zkey FROM b"""


def sql_ann_cosine_query():
    """Free-vector twin: literal query vectors from a VALUES CTE (the
    gate's ANN_EVAL_QUERIES — exact eighths, so decimal literals parse
    bit-identical), indexed-sum dot products against the corpus, ranks
    on the ROUNDED cosine exactly like sql_ann_cosine_topk."""
    from .functions.similarity import ANN_EVAL_QUERIES

    vals = ", ".join(
        "({}, [{}])".format(q, ", ".join(repr(float(x)) for x in v))
        for q, v in ANN_EVAL_QUERIES
    )
    return f"""WITH {_UNROLL},
qv AS (SELECT * FROM (VALUES {vals}) AS t(query_id, qemb)),
qn AS (
  SELECT query_id, qemb,
         sqrt(list_sum(list_transform(qemb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
  FROM qv
),
dots AS (
  SELECT qn.query_id, c.vec_id AS neighbor_id, qn.qnorm AS qnorm, c.norm AS cn,
         SUM(CAST(c.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)
             * CAST(qn.qemb[CAST(r.i AS INTEGER)+1] AS DOUBLE)) AS dot
  FROM u c
  CROSS JOIN qn
  CROSS JOIN range({EMB_DIM}) r(i)
  GROUP BY 1, 2, 3, 4
),
rk AS (
  SELECT query_id, neighbor_id, round(dot / (qnorm * cn), 6) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY round(dot / (qnorm * cn), 6) DESC, neighbor_id) AS rank
  FROM dots
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
FROM rk WHERE rank <= {ANN_K}"""


def sql_ir_eval_metrics():
    """Retrieval-eval twin: the BM25 run CTE and the (df-capped)
    Jaccard pair CTE are the SAME oracle SQL those gates grade with;
    the metrics layer re-derives recall/MRR/nDCG including the
    ideal-DCG prefix via a list fold."""
    from .functions.dedup import DEFAULT_MAX_DF
    from .functions.ir import TFIDF_TOPK

    k = TFIDF_TOPK
    return f"""WITH run AS MATERIALIZED (
{sql_ir_bm25_topk()}
),
jac AS MATERIALIZED (
{sql_dedup_ngram_jaccard(max_df=DEFAULT_MAX_DF)}
),
qr AS (
  SELECT DISTINCT query_id, doc_id FROM (
    SELECT doc_a AS query_id, doc_b AS doc_id FROM jac
    UNION ALL
    SELECT doc_b AS query_id, doc_a AS doc_id FROM jac
    UNION ALL
    SELECT r.i AS query_id, r.i AS doc_id FROM range(10) r(i)
  ) WHERE query_id < 10
),
nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM qr GROUP BY 1),
hits AS (
  SELECT run.query_id, run.rank
  FROM run JOIN qr ON qr.query_id = run.query_id AND qr.doc_id = run.doc_id
  WHERE run.rank <= {k}
),
agg AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_hits, MIN(rank) AS first_rank,
         SUM(1.0 / log2(rank + 1)) AS dcg
  FROM hits GROUP BY 1
)
SELECT n.query_id, n.n_rel,
  CAST(COALESCE(a.n_hits, 0) AS BIGINT) AS n_hits,
  round(COALESCE(a.n_hits, 0) / n.n_rel, 6) AS recall,
  round(COALESCE(1.0 / a.first_rank, 0), 6) AS mrr,
  round(COALESCE(a.dcg, 0) / list_sum(list_transform(
    range(1, CAST(least(n.n_rel, {k}) AS BIGINT) + 1),
    i -> 1.0 / log2(i + 1))), 6) AS ndcg
FROM nrel n LEFT JOIN agg a USING (query_id)"""


def sql_events_zorder_nd():
    """3-dim twin of sql_events_zorder_key: same guarded bucket
    expression per dimension (user_id, value, ts-as-epoch-ns), and the
    independent multiplication-form interleave with bit i of dim j at
    weight 2^(i*3 + (2-j))."""
    from .functions.layout import ZORDER_BITS

    n = 3
    bits = min(ZORDER_BITS, 62 // n)
    k = (1 << bits) - 1

    def bucket(col, lo, hi):
        return (
            f"CASE WHEN CAST({hi} AS DOUBLE) = CAST({lo} AS DOUBLE) THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(LEAST(CAST({k} AS BIGINT), GREATEST(CAST(0 AS BIGINT), "
            f"CAST(floor((CAST({col} AS DOUBLE) - CAST({lo} AS DOUBLE)) * {k}.0 "
            f"/ (CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE))) AS BIGINT))) AS BIGINT) END"
        )

    terms = []
    for i in range(bits):
        for j in range(n):
            terms.append(f"((b{j + 1} >> {i}) & 1) * {1 << (i * n + (n - 1 - j))}")
    inter = " + ".join(terms)
    return f"""WITH stats AS (
  SELECT MIN(user_id) AS lo1, MAX(user_id) AS hi1,
         MIN(value) AS lo2, MAX(value) AS hi2,
         MIN(epoch_ns(ts)) AS lo3, MAX(epoch_ns(ts)) AS hi3
  FROM events
),
b AS (
  SELECT event_id, {bucket("user_id", "lo1", "hi1")} AS b1,
         {bucket("value", "lo2", "hi2")} AS b2,
         {bucket("epoch_ns(ts)", "lo3", "hi3")} AS b3
  FROM events CROSS JOIN stats
)
SELECT event_id, b1, b2, b3, CAST({inter} AS BIGINT) AS zkey FROM b"""


def sql_ir_rrf_fusion():
    from .functions.ir import RRF_K, RRF_UNIT, TFIDF_TOPK

    return f"""WITH t_run AS MATERIALIZED (
{sql_ir_bm25_topk()}
),
e_run AS MATERIALIZED (
{sql_ann_cosine_topk()}
),
contrib AS (
  SELECT query_id, doc_id, {RRF_UNIT} // ({RRF_K} + rank) AS c FROM t_run
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id, {RRF_UNIT} // ({RRF_K} + rank) AS c FROM e_run
),
sc AS (
  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_micro
  FROM contrib GROUP BY 1, 2
),
r AS (
  SELECT query_id, doc_id, rrf_micro,
         row_number() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id) AS rank
  FROM sc
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf_micro
FROM r WHERE rank <= {TFIDF_TOPK}"""


def sql_ir_tfidf_weights():
    from .functions.ir import TFIDF_MAX_DF

    return f"""WITH {_tfidf_w_cte(TFIDF_MAX_DF)}
SELECT doc_id, term, round(w, 6) AS w FROM wx"""


def sql_ir_tfidf_topk():
    from .functions.ir import TFIDF_MAX_DF, TFIDF_TOPK

    return f"""WITH {_tfidf_w_cte(TFIDF_MAX_DF)},
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM wx GROUP BY 1),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
  FROM wx a JOIN wx b ON a.term = b.term AND a.doc_id != b.doc_id
  GROUP BY 1, 2
),
cosx AS (
  SELECT doc_a, doc_b, round(dot / (na.nrm * nb.nrm), 6) AS cos
  FROM dots
  JOIN nrm na ON na.doc_id = doc_a
  JOIN nrm nb ON nb.doc_id = doc_b
),
r AS (
  SELECT doc_a, doc_b, cos,
         row_number() OVER (PARTITION BY doc_a ORDER BY cos DESC, doc_b) AS rank
  FROM cosx
)
SELECT doc_a, CAST(rank AS BIGINT) AS rank, doc_b, cos
FROM r WHERE rank <= {TFIDF_TOPK}"""


def sql_corpus_dsir_weights():
    from .functions.lm import LM_BUCKETS as B

    return f"""WITH {_sql_bigram_cte()},
{_sql_bigram_cte("(SELECT * FROM documents WHERE lang = 'en')", prefix="t")},
tg AS (SELECT g2, COUNT(*) AS ct FROM tbg GROUP BY 1),
rg AS (SELECT g2, COUNT(*) AS cr FROM bg GROUP BY 1),
nt AS (SELECT SUM(ct) AS n_t FROM tg),
nr AS (SELECT SUM(cr) AS n_r FROM rg),
term AS (
  SELECT bg.doc_id,
         CAST(floor(log2(CAST(COALESCE(tg.ct, 0) + 1 AS DOUBLE) / (nt.n_t + {B})) * 1000000 + 0.5) AS BIGINT)
         - CAST(floor(log2(CAST(COALESCE(rg.cr, 0) + 1 AS DOUBLE) / (nr.n_r + {B})) * 1000000 + 0.5) AS BIGINT) AS lr
  FROM bg LEFT JOIN tg USING (g2) LEFT JOIN rg USING (g2)
  CROSS JOIN nt CROSS JOIN nr
),
sc AS (SELECT doc_id, COUNT(*) AS nb, SUM(lr) AS s FROM term GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(sc.s AS BIGINT) AS weight_micro,
       CAST(sc.s // sc.nb AS BIGINT) AS weight_avg_micro
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id"""


def sql_dedup_substring_stream():
    """Batch recomputation of the streaming gram ledger (repeated
    windows only): per gram hash the occurrence count and the
    lexicographically smallest (doc_id, pos) witness — stream == batch
    is the correctness claim."""
    from .functions.spans import SPAN_N as N

    gram = f"array_to_string(toks[i:i+{N - 1}], ' ')"
    toks = f"list_filter(string_split({NORM.format(c='text')}, ' '), t -> t != '')"
    return f"""WITH q AS (
  SELECT doc_id, {toks} AS toks FROM documents
),
pg AS (
  SELECT doc_id, i - 1 AS pos, {H64.format(s=gram)} AS gh
  FROM q, unnest(generate_series(1, len(toks) - {N} + 1)) AS u(i)
),
r AS (
  SELECT gh, doc_id, pos,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY gh) AS n_occ
  FROM pg
)
SELECT gh, CAST(n_occ AS BIGINT) AS n_occ,
       doc_id AS rep_doc, CAST(pos AS BIGINT) AS rep_pos
FROM r WHERE rn = 1 AND n_occ >= 2"""


def sql_corpus_seeded_shuffle():
    h = H64.format(s="concat('shuffle:', CAST(doc_id AS VARCHAR))")
    return f"""WITH k AS (SELECT doc_id, {h} AS h FROM documents),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY h, doc_id) - 1 AS rnk,
         COUNT(*) OVER () AS n
  FROM k
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rank,
       CAST((rnk * 8) // n AS BIGINT) AS shard
FROM r"""


def _sql_temperature_plan() -> str:
    """CTE chain for the temperature-mixture plan (mirrors
    functions/corpus.temperature_mixture, alpha=0.5): the only float
    op is pow(n, 0.5) rounded half-up to integer micro-units; share,
    rate, epoch count, and threshold are all BIGINT arithmetic, so the
    two engines agree exactly."""
    from .functions.corpus import MIX_BUCKETS as B

    return f"""c AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY 1),
w AS (SELECT lang, n_total,
        CAST(floor(pow(CAST(n_total AS DOUBLE), 0.5) * {B} + 0.5) AS BIGINT) AS w_micro
      FROM c),
t AS (SELECT SUM(w_micro) AS s_micro, SUM(n_total) AS n_corpus FROM w),
plan AS (
  SELECT lang, n_total, w_micro,
         CAST((CAST({B} AS BIGINT) * n_corpus * w_micro) // (s_micro * n_total)
              AS BIGINT) AS rate_micro
  FROM w CROSS JOIN t
)"""


def sql_corpus_temperature_mix():
    from .functions.corpus import MIX_BUCKETS as B

    h = H64.format(s="concat('temp:', CAST(doc_id AS VARCHAR))")
    return f"""WITH {_sql_temperature_plan()},
keyed AS (SELECT doc_id, lang, ({h}) % {B} AS bucket FROM documents),
e AS (
  SELECT k.doc_id, k.lang, k.bucket,
         CAST(plan.rate_micro // {B} AS BIGINT) AS n_full,
         plan.rate_micro % {B} AS frac_thr,
         u.epoch
  FROM keyed k
  JOIN plan ON plan.lang = k.lang,
       unnest(generate_series(0, CAST(plan.rate_micro // {B} AS BIGINT))) AS u(epoch)
)
SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch
FROM e WHERE epoch < n_full OR bucket < frac_thr"""


def sql_corpus_temperature_report():
    return f"""WITH {_sql_temperature_plan()},
mix AS ({sql_corpus_temperature_mix()}),
em AS (SELECT lang, COUNT(*) AS n_emitted FROM mix GROUP BY 1)
SELECT plan.lang, CAST(plan.n_total AS BIGINT) AS n_total,
       plan.w_micro, plan.rate_micro,
       CAST(COALESCE(em.n_emitted, 0) AS BIGINT) AS n_emitted
FROM plan LEFT JOIN em ON em.lang = plan.lang"""


def sql_corpus_filter_pipeline():
    return f"""WITH g AS ({sql_text_gopher()}),
k AS (SELECT doc_id, lang, md5({NORM.format(c='text')}) AS cm FROM documents),
r AS (SELECT cm, MIN(doc_id) AS rep FROM k GROUP BY 1),
j AS (
  SELECT k.doc_id,
         CASE WHEN k.doc_id != r.rep THEN 'duplicate'
              WHEN k.lang != 'en' THEN 'lang'
              WHEN NOT g.passes THEN 'quality'
              ELSE 'kept' END AS reason
  FROM k JOIN r ON r.cm = k.cm JOIN g ON g.doc_id = k.doc_id
)
SELECT doc_id, reason, reason = 'kept' AS keep FROM j"""


def sql_corpus_pipeline_battery():
    """Composed corpus-pipeline twin (r15, VERDICT r14 ask #1): the
    end-to-end pretraining hygiene chain filter_pipeline → line_dedup →
    minhash near-dup keep → 13-gram decontamination → temperature
    mixture → sequence packing, re-derived from scratch as ONE chained
    CTE stack with every stage consuming the previous stage's
    SURVIVORS — the cross-operator composition real users run (the
    reference's CLI trace analog, reference cli.py:164-440). Each
    stage's FULL table is digest-reduced, so the gate value-checks all
    six intermediates, not just the final pack table. Stage bodies are
    the existing per-operator oracles re-parameterized to the survivor
    CTEs (filter: sql_corpus_filter_pipeline verbatim; lines:
    _sql_line_dedup('s1'); keep: sql_dedup_clusters('s2') + the
    NOT-IN representative rule; contamination: the sql_dedup_
    contamination derivation with the bench excerpts still drawn from
    the ORIGINAL corpus; mixture: the integer-exact alpha=0.5 plan
    keyed on source; packing: the hashed-bucket block contract)."""
    from .functions.corpus import MIX_BUCKETS as B
    from .functions.spans import CONTAM_N
    from .gate import (
        CONTAM_MOD,
        PIPE_MIX_MUL,
        PIPE_PACK_BUCKETS,
        PIPE_PACK_BUDGET,
    )

    g = CONTAM_N - 1
    norm = NORM.format(c="text")
    toks_raw = TOKS_RAW.format(c="text")
    h_mix = H64.format(s="concat('temp:', CAST(doc_id AS VARCHAR))")
    h_pack = H64.format(s="concat('pack:', CAST(mix_id AS VARCHAR))")
    specs = {
        "pipe_filter": ("SELECT doc_id, reason, keep FROM dec",
                        {"doc_id": "l", "reason": "s", "keep": "s"}),
        "pipe_lines": ("SELECT * FROM ld",
                       {"doc_id": "l", "clean_text": "s", "n_lines": "l",
                        "n_kept": "l", "n_dropped": "l"}),
        "pipe_dedup": ("SELECT doc_id FROM keep3", {"doc_id": "l"}),
        "pipe_contam": ("SELECT * FROM contam",
                        {"doc_id": "l", "n_grams": "l", "n_hit": "l",
                         "hit_frac": "d", "dirty": "l"}),
        "pipe_mix": ("SELECT * FROM mix",
                     {"doc_id": "l", "source": "s", "epoch": "l"}),
        "pipe_pack": ("SELECT * FROM packed",
                      {"doc_id": "l", "bucket": "l", "n_tokens": "l",
                       "pack_offset": "l", "pack_id": "l"}),
    }
    digests = "\nUNION ALL\n".join(
        _digest_sql(name, inner, spec) for name, (inner, spec) in specs.items()
    )
    return f"""WITH dec AS MATERIALIZED ({sql_corpus_filter_pipeline()}),
s1 AS MATERIALIZED (
  SELECT d.doc_id, d.text FROM documents d
  JOIN dec ON dec.doc_id = d.doc_id AND dec.keep
),
ld AS MATERIALIZED ({_sql_line_dedup("s1")}),
s2 AS MATERIALIZED (SELECT doc_id, clean_text AS text FROM ld WHERE clean_text != ''),
clusters AS MATERIALIZED ({sql_dedup_clusters(table="s2")}),
keep3 AS MATERIALIZED (
  SELECT doc_id FROM s2
  WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
),
s3 AS MATERIALIZED (SELECT s2.doc_id, s2.text FROM s2 JOIN keep3 USING (doc_id)),
ct AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split({norm}, ' '), t -> t != '') AS t FROM s3
),
btoks AS (
  SELECT list_filter(string_split({norm}, ' '), t -> t != '')[11:40] AS bt
  FROM documents WHERE doc_id % {CONTAM_MOD} = 0
),
bgrams AS MATERIALIZED (
  SELECT DISTINCT array_to_string(bt[i:i+{g}], ' ') AS gram
  FROM btoks, unnest(generate_series(1, greatest(len(bt) - {g}, 0))) AS u(i)
),
cg AS (
  SELECT doc_id, array_to_string(t[i:i+{g}], ' ') AS gram
  FROM ct, unnest(generate_series(1, greatest(len(t) - {g}, 0))) AS u(i)
),
chits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM cg JOIN bgrams USING (gram) GROUP BY 1
),
contam AS MATERIALIZED (
  SELECT ct.doc_id,
         CAST(greatest(len(t) - {g}, 0) AS BIGINT) AS n_grams,
         COALESCE(n_hit, 0) AS n_hit,
         CASE WHEN len(t) - {g} > 0
              THEN round(COALESCE(n_hit, 0) / (len(t) - {g}), 6)
              ELSE 0.0 END AS hit_frac,
         CAST(CASE WHEN COALESCE(n_hit, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS dirty
  FROM ct LEFT JOIN chits USING (doc_id)
),
s4 AS MATERIALIZED (
  SELECT s3.doc_id, s3.text, d.source
  FROM s3 JOIN contam ON contam.doc_id = s3.doc_id
  JOIN documents d ON d.doc_id = s3.doc_id
  WHERE contam.dirty = 0
),
mc AS (SELECT source, COUNT(*) AS n_total FROM s4 GROUP BY 1),
mw AS (SELECT source, n_total,
              CAST(floor(pow(CAST(n_total AS DOUBLE), 0.5) * {B} + 0.5) AS BIGINT) AS w_micro
       FROM mc),
mt AS (SELECT SUM(w_micro) AS s_micro, SUM(n_total) AS n_corpus FROM mw),
mplan AS (
  SELECT source, n_total, w_micro,
         CAST((CAST({B} AS BIGINT) * n_corpus * w_micro) // (s_micro * n_total)
              AS BIGINT) AS rate_micro
  FROM mw CROSS JOIN mt
),
mkeyed AS (SELECT doc_id, source, ({h_mix}) % {B} AS bucket FROM s4),
mix AS MATERIALIZED (
  SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
  FROM (
    SELECT k.doc_id, k.source, k.bucket,
           CAST(p.rate_micro // {B} AS BIGINT) AS n_full,
           p.rate_micro % {B} AS frac_thr, u.epoch
    FROM mkeyed k JOIN mplan p ON p.source = k.source,
         unnest(generate_series(0, CAST(p.rate_micro // {B} AS BIGINT))) AS u(epoch)
  ) WHERE epoch < n_full OR bucket < frac_thr
),
mixdocs AS MATERIALIZED (
  SELECT mix.doc_id * {PIPE_MIX_MUL} + mix.epoch AS mix_id, s4.text
  FROM mix JOIN s4 ON s4.doc_id = mix.doc_id
),
pt AS (SELECT mix_id, CAST(len({toks_raw}) AS BIGINT) AS n_tokens, ({h_pack}) AS h
       FROM mixdocs),
pb AS (SELECT mix_id, n_tokens, LEAST(n_tokens, {PIPE_PACK_BUDGET}) AS ct,
              h % {PIPE_PACK_BUCKETS} AS bucket, h
       FROM pt),
packed AS MATERIALIZED (
  SELECT mix_id AS doc_id, bucket, n_tokens,
         CAST(cum - ct AS BIGINT) AS pack_offset,
         CAST((cum - ct) // {PIPE_PACK_BUDGET} AS BIGINT) AS pack_id
  FROM (SELECT mix_id, n_tokens, ct, bucket,
               SUM(ct) OVER (PARTITION BY bucket ORDER BY h, mix_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM pb)
)
{digests}"""


def sql_events_pipeline_battery():
    """Composed events-pipeline twin (r15): sessionize → engaged cut →
    as-of attribution → funnel + retention → converting-user
    percentiles, as ONE chained CTE stack over the engaged subset —
    the events-side sibling of sql_corpus_pipeline_battery. Stage
    bodies are the existing per-operator oracles re-parameterized to
    the survivor CTEs (sessionize: sql_events_sessionize verbatim;
    as-of: the native ASOF LEFT JOIN with the max_by click tie-break;
    funnel/retention: the s0/s1/s2 and cohort derivations over `ee`;
    percentiles: quantile_cont over converting users)."""
    from .gate import EPIPE_MIN_SESSIONS

    week_ns = 7 * 86400 * 1_000_000_000
    specs = {
        "epipe_sessions": (
            "SELECT * FROM sess",
            {"user_id": "l", "n_sessions": "l", "n_events": "l"},
        ),
        "epipe_asof": (
            "SELECT * FROM att",
            {"user_id": "l", "ts": "l", "event_id": "l",
             "event_id_click": "l", "ts_click": "l"},
        ),
        "epipe_funnel": (
            "SELECT * FROM fun",
            {"step_index": "l", "step": "s", "n_users": "l"},
        ),
        "epipe_retention": (
            "SELECT * FROM ret",
            {"cohort_week": "l", "week_offset": "l", "n_users": "l"},
        ),
        "epipe_percentiles": (
            "SELECT * FROM pct",
            {"event_type": "s", "n": "l", "p50": "d", "p90": "d", "p99": "d"},
        ),
    }
    digests = "\nUNION ALL\n".join(
        _digest_sql(name, inner, spec) for name, (inner, spec) in specs.items()
    )
    return f"""WITH ev AS MATERIALIZED (
  SELECT event_id, user_id, event_type, value,
         CAST(epoch_ns(ts) AS BIGINT) AS ts
  FROM events
),
sg AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > 1800000000000 THEN 1 ELSE 0 END AS new_session
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS MATERIALIZED (
  SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
         COUNT(*) AS n_events
  FROM sg GROUP BY 1
),
engaged AS MATERIALIZED (
  SELECT user_id FROM sess WHERE n_sessions >= {EPIPE_MIN_SESSIONS}
),
ee AS MATERIALIZED (SELECT ev.* FROM ev JOIN engaged USING (user_id)),
p AS (SELECT user_id, ts, event_id FROM ee WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts, MAX(event_id) AS event_id_click
  FROM ee WHERE event_type = 'click' GROUP BY 1, 2
),
att AS MATERIALIZED (
  SELECT p.user_id, p.ts, p.event_id, c.event_id_click, c.ts AS ts_click
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
),
s0 AS (SELECT user_id AS u, MIN(ts) AS done FROM ee WHERE event_type = 'view' GROUP BY 1),
s1 AS (SELECT ee.user_id AS u, MIN(ee.ts) AS done FROM ee JOIN s0 ON s0.u = ee.user_id
       WHERE ee.event_type = 'click' AND ee.ts >= s0.done GROUP BY 1),
s2 AS (SELECT ee.user_id AS u, MIN(ee.ts) AS done FROM ee JOIN s1 ON s1.u = ee.user_id
       WHERE ee.event_type = 'purchase' AND ee.ts >= s1.done GROUP BY 1),
fun AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT) AS step_index, 'view' AS step,
         CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_users
  UNION ALL
  SELECT CAST(1 AS BIGINT), 'click', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'purchase', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
),
co AS (SELECT user_id AS u, MIN(ts // {week_ns}) AS cohort_week
       FROM ee WHERE event_type = 'signup' GROUP BY 1),
ac AS (SELECT DISTINCT user_id AS u, ts // {week_ns} AS week FROM ee),
ret AS MATERIALIZED (
  SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
         CAST(week - cohort_week AS BIGINT) AS week_offset,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM ac JOIN co ON co.u = ac.u
  WHERE week >= cohort_week GROUP BY 1, 2
),
conv AS MATERIALIZED (
  SELECT DISTINCT user_id FROM att WHERE event_id_click IS NOT NULL
),
pct AS MATERIALIZED (
  SELECT event_type, COUNT(*) AS n,
         round(quantile_cont(value, 0.5), 6) AS p50,
         round(quantile_cont(value, 0.9), 6) AS p90,
         round(quantile_cont(value, 0.99), 6) AS p99
  FROM ee JOIN conv USING (user_id) GROUP BY 1
)
{digests}"""


def sql_multimodal_pipeline_battery():
    """Composed multimodal-pipeline twin (r15): decode features → size
    admission → aHash near-dup pairs → cross-modal keep verdict →
    resize of the kept docs, as ONE chained CTE stack over the
    survivor CTEs — every pixel/bit re-derived from the generator
    formula (the Spark side decodes real PNG bytes; the twin checks
    semantics at every stage). Stage bodies mirror the per-operator
    oracles (sql_multimodal_features / _image_dedup / _dedup_verdict /
    _resize) re-parameterized to the admitted set."""
    from .functions.dedup import DEFAULT_MAX_BUCKET
    from .functions.multimodal import (
        AUD_A,
        AUD_FP_FRAMES,
        AUD_I,
        AUD_LEN_BASE,
        AUD_LEN_MOD,
        AUD_MOD,
        H_BASE,
        H_MOD,
        PIX_A,
        PIX_MOD,
        PIX_X,
        PIX_Y,
        W_BASE,
        W_MOD,
    )
    from .gate import MPIPE_MIN_PX

    max_px = (W_BASE + W_MOD - 1) * (H_BASE + H_MOD - 1)
    k = AUD_FP_FRAMES
    max_n = AUD_LEN_BASE + AUD_LEN_MOD - 1
    specs = {
        "mpipe_features": (
            "SELECT * FROM feats",
            {"doc_id": "l", "n_chars": "l", "img_h": "l", "img_w": "l",
             "n_px": "l", "px_mean": "d"},
        ),
        "mpipe_sizecut": ("SELECT doc_id FROM s2", {"doc_id": "l"}),
        "mpipe_pairs": (
            "SELECT * FROM pairs",
            {"doc_a": "l", "doc_b": "l", "dist": "l"},
        ),
        "mpipe_verdict": (
            "SELECT doc_id, reason, keep FROM verdict",
            {"doc_id": "l", "reason": "s", "keep": "s"},
        ),
        "mpipe_resize": (
            "SELECT * FROM resized",
            {"doc_id": "l", "y": "l", "x": "l", "v": "l"},
        ),
    }
    digests = "\nUNION ALL\n".join(
        _digest_sql(name, inner, spec) for name, (inner, spec) in specs.items()
    )
    return f"""WITH fdims AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         {H_BASE} + doc_id % {H_MOD} AS h,
         {W_BASE} + doc_id % {W_MOD} AS w
  FROM documents
),
fpx AS (
  SELECT doc_id, n_chars, h, w,
         SUM((doc_id * {PIX_A} + (i // w) * {PIX_Y} + (i % w) * {PIX_X}) % {PIX_MOD}) AS s
  FROM fdims CROSS JOIN range({max_px}) r(i)
  WHERE i < h * w
  GROUP BY 1, 2, 3, 4
),
feats AS MATERIALIZED (
  SELECT doc_id, n_chars, CAST(h AS BIGINT) AS img_h, CAST(w AS BIGINT) AS img_w,
         CAST(h * w AS BIGINT) AS n_px,
         round(CAST(s AS DOUBLE) / (h * w), 6) AS px_mean
  FROM fpx
),
s2 AS MATERIALIZED (
  SELECT d.* FROM documents d JOIN feats USING (doc_id)
  WHERE feats.n_px >= {MPIPE_MIN_PX}
),
{_sql_ahash_cte(table="s2")},
bb AS (
  SELECT doc_id, b.i AS band,
         CASE b.i
           WHEN 0 THEN h_hi // 65536
           WHEN 1 THEN h_hi % 65536
           WHEN 2 THEN h_lo // 65536
           ELSE h_lo % 65536
         END AS bucket
  FROM ah CROSS JOIN range(4) b(i)
),
bocc AS (
  SELECT band, bucket, COUNT(*) AS occ, MIN(doc_id) AS hub
  FROM bb GROUP BY 1, 2
),
bbx AS (
  SELECT b.doc_id, b.band, b.bucket, o.occ, o.hub
  FROM bb b JOIN bocc o ON b.band = o.band AND b.bucket = o.bucket
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bbx a JOIN bbx b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE a.occ <= {DEFAULT_MAX_BUCKET}
    UNION ALL
    SELECT hub AS doc_a, doc_id AS doc_b FROM bbx
    WHERE occ > {DEFAULT_MAX_BUCKET} AND doc_id <> hub
  )
),
pairs AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b,
         CAST(bit_count(xor(ha.h_hi, hb.h_hi)) + bit_count(xor(ha.h_lo, hb.h_lo)) AS BIGINT) AS dist
  FROM cand c
  JOIN ah ha ON ha.doc_id = c.doc_a
  JOIN ah hb ON hb.doc_id = c.doc_b
  WHERE bit_count(xor(ha.h_hi, hb.h_hi)) + bit_count(xor(ha.h_lo, hb.h_lo)) <= 1
),
tkey AS (SELECT doc_id, md5({NORM.format(c="text")}) AS ck FROM s2),
trep AS (SELECT ck, MIN(doc_id) AS rep FROM tkey GROUP BY 1),
tdup AS (SELECT t.doc_id, t.doc_id <> r.rep AS text_dup FROM tkey t JOIN trep r USING (ck)),
arep AS (SELECT h_hi, h_lo, MIN(doc_id) AS rep FROM ah GROUP BY 1, 2),
adup AS (SELECT a.doc_id, a.doc_id <> r.rep AS image_dup
         FROM ah a JOIN arep r ON a.h_hi = r.h_hi AND a.h_lo = r.h_lo),
adims AS (SELECT doc_id, {AUD_LEN_BASE} + doc_id % {AUD_LEN_MOD} AS n FROM s2),
asmp AS (
  SELECT doc_id, n, (r.i * {k}) // n AS f,
         (doc_id * {AUD_A} + r.i * {AUD_I}) % {AUD_MOD} AS w
  FROM adims CROSS JOIN range({max_n}) r(i) WHERE r.i < n
),
aen AS (SELECT doc_id, f, SUM(w * w) AS energy FROM asmp GROUP BY 1, 2),
abits AS (
  SELECT doc_id, f,
         CASE WHEN energy > lag(energy) OVER (PARTITION BY doc_id ORDER BY f)
              THEN 1 ELSE 0 END AS b
  FROM aen
),
afps AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN f >= 1 THEN b * power(2, {k} - 1 - f) ELSE 0 END) AS BIGINT) AS fp
  FROM abits GROUP BY 1
),
frep AS (SELECT fp, MIN(doc_id) AS rep FROM afps GROUP BY 1),
fdup AS (SELECT a.doc_id, a.doc_id <> r.rep AS audio_dup FROM afps a JOIN frep r USING (fp)),
verdict AS MATERIALIZED (
  SELECT d.doc_id,
         CASE WHEN tdup.text_dup THEN 'text_dup'
              WHEN adup.image_dup THEN 'image_dup'
              WHEN fdup.audio_dup THEN 'audio_dup'
              ELSE 'unique' END AS reason,
         CASE WHEN tdup.text_dup OR adup.image_dup OR fdup.audio_dup
              THEN 'no' ELSE 'yes' END AS keep
  FROM s2 d
  JOIN tdup ON tdup.doc_id = d.doc_id
  JOIN adup ON adup.doc_id = d.doc_id
  JOIN fdup ON fdup.doc_id = d.doc_id
),
s4 AS (SELECT s2.doc_id FROM s2 JOIN verdict USING (doc_id) WHERE verdict.keep = 'yes'),
rdims AS (
  SELECT doc_id, {H_BASE} + doc_id % {H_MOD} AS h, {W_BASE} + doc_id % {W_MOD} AS w
  FROM s4
),
resized AS MATERIALIZED (
  SELECT doc_id, CAST(yy.i AS BIGINT) AS y, CAST(xx.i AS BIGINT) AS x,
         CAST((doc_id * {PIX_A} + ((yy.i * h) // 4) * {PIX_Y} + ((xx.i * w) // 4) * {PIX_X}) % {PIX_MOD} AS BIGINT) AS v
  FROM rdims CROSS JOIN range(4) yy(i) CROSS JOIN range(4) xx(i)
)
{digests}"""


def sql_web_pipeline_battery():
    """Composed crawl-pipeline twin (r16): canonicalize+cluster →
    host profile → per-host budget cap → Gopher quality over the
    survivors, as one chained CTE stack. Stage bodies mirror the
    per-operator oracles (sql_web_url_dedup / sql_web_host_stats /
    sql_corpus_cap_per_source's naive window / sql_text_gopher
    re-parameterized to the survivor set)."""
    from .gate import WPIPE_CAP

    h = H64.format(s="concat('wpipe:', CAST(doc_id AS VARCHAR))")
    gopher_sv = "(" + sql_text_gopher(table="sv") + ")"
    specs = {
        "wpipe_clusters": (
            "SELECT * FROM clusters",
            {"canonical_url": "s", "rep_id": "l", "n_docs": "l", "n_raw_forms": "l"},
        ),
        "wpipe_hosts": (
            "SELECT * FROM hosts",
            {"host": "s", "n_pages": "l", "n_urls": "l", "dup_factor": "d"},
        ),
        "wpipe_budget": (
            "SELECT * FROM budget",
            {"doc_id": "l", "source": "s", "rk": "l"},
        ),
        "wpipe_quality": (
            f"SELECT * FROM {gopher_sv} _g",
            {"doc_id": "l", "n_words": "l", "mean_word_len": "d",
             "n_distinct_stopwords": "l", "dup_word_frac": "d",
             "top_bigram_frac": "d", "passes": "s"},
        ),
    }
    digests = "\nUNION ALL\n".join(
        _digest_sql(name, inner, spec) for name, (inner, spec) in specs.items()
    )
    return f"""WITH {_sql_web_urls()},
clusters AS MATERIALIZED (
  SELECT canonical_url, MIN(doc_id) AS rep_id, COUNT(*) AS n_docs,
         CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms
  FROM u GROUP BY 1
),
hosts AS (
  SELECT host, COUNT(*) AS n_pages,
         CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_urls,
         round(COUNT(*) / COUNT(DISTINCT canonical_url), 6) AS dup_factor
  FROM u GROUP BY 1
),
pages AS (
  SELECT rep_id AS doc_id,
         regexp_extract(canonical_url, '^https?://([^/:]+)', 1) AS source
  FROM clusters
),
budget AS MATERIALIZED (
  SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rk
    FROM pages
  ) WHERE rk <= {WPIPE_CAP}
),
sv AS (SELECT d.doc_id, d.text FROM documents d JOIN budget USING (doc_id))
{digests}"""


def sql_imaging_pipeline_battery():
    """Composed imaging-pipeline twin (r16, VERDICT r15 ask #2): the
    reference CLI journey — TIFF ingest → A1 Gaussian pyramid →
    sharded v3 write → pruned ROI read-back → 0.5→0.4 conversion →
    validate — re-derived entirely from the generator formula. Stages
    1–5 are the pixel CTE, the window-form Gaussian (sql_a1_gaussian's
    machinery re-parameterized to IPIPE), its kernel-mass
    renormalization, and the ROI restriction; stage 6 is the
    deterministic metadata literal. The Spark side runs real codecs
    (LZW TIFF, zstd shards, blosc v2) at every stage — equality means
    every byte survived every hop."""
    from .gate import G_WEIGHTS, IPIPE, IPIPE_ROI, IPIPE_S3

    f = {"z": 2, "y": 2, "x": 2}
    roi_where = " AND ".join(
        f"{d} >= {lo} AND {d} < {hi}" for d, (lo, hi) in IPIPE_ROI.items()
    )
    pix = {"t": "l", "c": "l", "z": "l", "y": "l", "x": "l", "v": "l"}
    meta_vals = """SELECT * FROM (VALUES
  ('v05', '0.5', 0, 'z,y,x', 'scale0/image,scale1/image',
   '[4.0, 1.0, 1.0]', '[11.0, 20.25, 0.25]'),
  ('v04', '0.4', 0, 'z,y,x', 'scale0/image,scale1/image',
   '[4.0, 1.0, 1.0]', '[11.0, 20.25, 0.25]')
) t(tag, version, n_problems, axes, ds_paths, ds1_scale, ds1_translation)"""
    specs = {
        "ipipe_ingest": ("SELECT * FROM P", pix),
        "ipipe_pyramid": ("SELECT * FROM l1", pix),
        "ipipe_store": ("SELECT * FROM l1n", pix),
        "ipipe_roi": (f"SELECT * FROM P WHERE {roi_where}", pix),
        "ipipe_convert": ("SELECT * FROM l1n", pix),
        "ipipe_meta": (
            meta_vals,
            {"tag": "s", "version": "s", "n_problems": "l", "axes": "s",
             "ds_paths": "s", "ds1_scale": "s", "ds1_translation": "s"},
        ),
    }
    digests = "\nUNION ALL\n".join(
        _digest_sql(name, inner, spec) for name, (inner, spec) in specs.items()
    )
    return f"""WITH {pixel_cte_sql(IPIPE)},
gz AS ({_gauss_pass('P', 'z', G_WEIGHTS)}),
gy AS ({_gauss_pass('gz', 'y', G_WEIGHTS)}),
gx AS ({_gauss_pass('gy', 'x', G_WEIGHTS)}),
l1 AS MATERIALIZED (
  SELECT {_block_sel(f)}, v FROM gx WHERE {_crop3d(IPIPE, f)} AND {_stride(f)}
),
l1n AS (SELECT t, c, z, y, x, CAST(v // {IPIPE_S3} AS BIGINT) AS v FROM l1)
{digests}"""


def sql_sketch_heavy_hitters():
    """Twin of gate.q_sketch_heavy_hitters: the Misra-Gries candidate
    pass is correctness-transparent in the guaranteed regime
    (phi > 1/(k+1): no heavy key can be missed; the recount removes
    false candidates), so the oracle is the plain exact
    GROUP BY + integer-threshold HAVING."""
    from .gate import HH_PHI_DEN, HH_PHI_NUM

    return f"""WITH t AS (
  SELECT lang, unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS token
  FROM documents
),
n AS (SELECT COUNT(*) AS nn FROM t)
SELECT lang, token, COUNT(*) AS n,
       round(COUNT(*) / (SELECT nn FROM n), 6) AS frac
FROM t GROUP BY 1, 2
HAVING COUNT(*) * {HH_PHI_DEN} >= {HH_PHI_NUM} * (SELECT nn FROM n)"""


# the synthesized raw-URL expression — MUST stay arithmetic-identical
# to gate._doc_urls
_WEB_RAW_URL = """(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' ||
    (CASE WHEN doc_id % 5 = 0 THEN 'WWW.' || upper(source || '.example.com')
          WHEN doc_id % 5 = 1 THEN 'www.' || source || '.example.com'
          ELSE source || '.example.com' END) ||
    (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END) ||
    '/' || lang || '/page-' || CAST(doc_id % {slots} AS VARCHAR) ||
    (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END) ||
    (CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&b=2&a=1'
                     WHEN 1 THEN '?a=1&b=2'
                     WHEN 2 THEN '?b=2&a=1&utm_campaign=x'
                     ELSE '' END) ||
    (CASE WHEN doc_id % 13 = 0 THEN '#sec' ELSE '' END)"""

# the INDEPENDENT canonical derivation: straight from the generator
# fields, never through the parser — the twin checks the
# canonicalizer's semantics, not its mechanics
_WEB_CANON_URL = """'https://' || source || '.example.com/' || lang || '/page-'
    || CAST(doc_id % {slots} AS VARCHAR)
    || (CASE WHEN doc_id % 4 = 3 THEN '' ELSE '?a=1&b=2' END)"""


def _sql_web_urls():
    from .gate import WEB_PATH_SLOTS

    raw = _WEB_RAW_URL.format(slots=WEB_PATH_SLOTS)
    canon = _WEB_CANON_URL.format(slots=WEB_PATH_SLOTS)
    return f"""u AS (
  SELECT doc_id, {raw} AS url, {canon} AS canonical_url,
         source || '.example.com' AS host
  FROM documents
)"""


def sql_web_url_dedup():
    return f"""WITH {_sql_web_urls()}
SELECT canonical_url, MIN(doc_id) AS rep_id, COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms
FROM u GROUP BY 1"""


def sql_web_host_stats():
    return f"""WITH {_sql_web_urls()}
SELECT host, COUNT(*) AS n_pages,
       CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_urls,
       round(COUNT(*) / COUNT(DISTINCT canonical_url), 6) AS dup_factor
FROM u GROUP BY 1"""


def sql_dedup_shingle_frac():
    from .functions.dedup import SHINGLE_K  # noqa: F401 — k=3 pinned in _SHINGLE

    return f"""WITH {_toks_cte(lower=True)},
sh0 AS (SELECT doc_id, unnest({_SHINGLE}) AS shingle FROM q),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
SELECT sh.doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
       round(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS dup_frac
FROM sh JOIN dfreq ON dfreq.shingle = sh.shingle
GROUP BY 1"""


def sql_dedup_minhash_sig():
    return f"WITH {_SIG_CTE}\nSELECT doc_id, perm, minhash FROM sig"


def sql_dedup_minhash(table: str = "documents"):
    # order-independent polynomial band key (sum of minhash * 31^(perm%4));
    # bucket-occupancy cap mirrors _capped_band_pairs: pairwise at or
    # below DEFAULT_MAX_BUCKET, star edges (bucket-min hub <-> member) above
    from .functions.dedup import DEFAULT_MAX_BUCKET

    band_sig = "CAST(SUM(minhash * ([1,31,961,29791])[CAST(perm%4 AS INTEGER)+1]) AS BIGINT)"
    return f"""WITH {_sig_cte(table)},
bands AS (
  SELECT doc_id, band, {band_sig} AS band_key
  FROM (SELECT doc_id, perm, minhash, perm//4 AS band FROM sig)
  GROUP BY doc_id, band
),
occ AS (
  SELECT band, band_key, COUNT(*) AS occ, MIN(doc_id) AS hub
  FROM bands GROUP BY 1, 2
),
bx AS (
  SELECT b.doc_id, b.band, b.band_key, o.occ, o.hub
  FROM bands b JOIN occ o ON b.band = o.band AND b.band_key = o.band_key
),
cand AS (
  -- pairwise arm prefilters BOTH join inputs to capped buckets (the
  -- Spark twin filters before its self-join too): an over-cap bucket
  -- must never reach the equi-join, or a 20k boilerplate bucket costs
  -- 20k^2 match attempts before any WHERE applies
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM (SELECT * FROM bx WHERE occ <= {DEFAULT_MAX_BUCKET}) a
    JOIN (SELECT * FROM bx WHERE occ <= {DEFAULT_MAX_BUCKET}) b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    UNION ALL
    SELECT hub AS doc_a, doc_id AS doc_b FROM bx
    WHERE occ > {DEFAULT_MAX_BUCKET} AND doc_id <> hub
  )
),
est AS (
  SELECT c.doc_a, c.doc_b,
         CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS BIGINT) / 16 AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.perm = sa.perm
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.125"""


def sql_dedup_incremental():
    """Twin of the incremental ingest gatekeeper: one unioned CTE stack
    derives both sides' signatures (identical content-hash
    construction), the ref-side witness cap mirrors the Spark
    row_number-by-doc_id rule, and pairing is STRICTLY new × ref."""
    from .functions.dedup import DEFAULT_MAX_BUCKET
    from .gate import INCR_ID_BASE, INCR_MOD

    norm = NORM.format(c="text")
    band_sig = "CAST(SUM(minhash * ([1,31,961,29791])[CAST(perm%4 AS INTEGER)+1]) AS BIGINT)"
    return f"""WITH newdocs AS (
  SELECT doc_id + {INCR_ID_BASE} AS doc_id,
         CASE WHEN doc_id % {INCR_MOD} = 0 THEN text
              ELSE array_to_string(list_reverse(list_filter(string_split({norm}, ' '), t -> t != '')), ' ')
         END AS text
  FROM documents WHERE doc_id % {INCR_MOD} < 2
),
alldocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM newdocs
),
{_sig_cte("alldocs")},
bands AS (
  SELECT doc_id, band, {band_sig} AS band_key
  FROM (SELECT doc_id, perm, minhash, perm//4 AS band FROM sig)
  GROUP BY doc_id, band
),
rb AS (
  SELECT band, band_key, doc_id,
         row_number() OVER (PARTITION BY band, band_key ORDER BY doc_id) AS rn
  FROM bands WHERE doc_id < {INCR_ID_BASE}
),
nb AS (SELECT band, band_key, doc_id AS new_doc FROM bands WHERE doc_id >= {INCR_ID_BASE}),
cand AS (
  SELECT DISTINCT nb.new_doc, rb.doc_id AS ref_doc
  FROM nb JOIN rb USING (band, band_key)
  WHERE rb.rn <= {DEFAULT_MAX_BUCKET}
),
est AS (
  SELECT c.new_doc, c.ref_doc,
         CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS BIGINT) / 16 AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.new_doc
  JOIN sig sb ON sb.doc_id = c.ref_doc AND sb.perm = sa.perm
  GROUP BY 1, 2
),
hits AS (
  SELECT new_doc, CAST(COUNT(*) AS BIGINT) AS n_ref_matches, MAX(est_jaccard) AS best
  FROM est WHERE est_jaccard >= 0.5 GROUP BY 1
)
SELECT nd.doc_id,
       COALESCE(n_ref_matches, 0) AS n_ref_matches,
       round(COALESCE(best, 0.0), 6) AS best_est_jaccard,
       CAST(CASE WHEN COALESCE(n_ref_matches, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM newdocs nd LEFT JOIN hits ON hits.new_doc = nd.doc_id"""


def sql_dedup_index_refresh():
    """Twin of the persisted-index refresh gate: the verdicts are
    re-derived FROM SCRATCH over ref = A ∪ B (slice A + the re-crawled
    admitted batch B) with the same witness cap, banded candidates, and
    signature-agreement scoring — so a hash match proves the engine's
    append-refreshed STORED index is exactly the from-scratch witness
    structure. Rank-by-doc_id inside each bucket equals the append
    order because B's ids sit strictly above A's (the monotonic-id
    refresh contract)."""
    from .functions.dedup import DEFAULT_MAX_BUCKET
    from .gate import IDXR_B_BASE, IDXR_PROBE_BASE

    norm = NORM.format(c="text")
    band_sig = "CAST(SUM(minhash * ([1,31,961,29791])[CAST(perm%4 AS INTEGER)+1]) AS BIGINT)"
    return f"""WITH refdocs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 != 4
  UNION ALL
  SELECT doc_id + {IDXR_B_BASE} AS doc_id, text FROM documents WHERE doc_id % 5 = 4
),
newdocs AS (
  SELECT doc_id + {IDXR_PROBE_BASE} AS doc_id,
         CASE WHEN doc_id % 5 >= 3 THEN text
              ELSE array_to_string(list_reverse(list_filter(string_split({norm}, ' '), t -> t != '')), ' ')
         END AS text
  FROM documents WHERE doc_id % 5 >= 3 OR doc_id % 10 = 1
),
alldocs AS (
  SELECT doc_id, text FROM refdocs
  UNION ALL SELECT doc_id, text FROM newdocs
),
{_sig_cte("alldocs")},
bands AS (
  SELECT doc_id, band, {band_sig} AS band_key
  FROM (SELECT doc_id, perm, minhash, perm//4 AS band FROM sig)
  GROUP BY doc_id, band
),
rb AS (
  SELECT band, band_key, doc_id,
         row_number() OVER (PARTITION BY band, band_key ORDER BY doc_id) AS rn
  FROM bands WHERE doc_id < {IDXR_PROBE_BASE}
),
nb AS (SELECT band, band_key, doc_id AS new_doc FROM bands WHERE doc_id >= {IDXR_PROBE_BASE}),
cand AS (
  SELECT DISTINCT nb.new_doc, rb.doc_id AS ref_doc
  FROM nb JOIN rb USING (band, band_key)
  WHERE rb.rn <= {DEFAULT_MAX_BUCKET}
),
est AS (
  SELECT c.new_doc, c.ref_doc,
         CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS BIGINT) / 16 AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.new_doc
  JOIN sig sb ON sb.doc_id = c.ref_doc AND sb.perm = sa.perm
  GROUP BY 1, 2
),
hits AS (
  SELECT new_doc, CAST(COUNT(*) AS BIGINT) AS n_ref_matches, MAX(est_jaccard) AS best
  FROM est WHERE est_jaccard >= 0.5 GROUP BY 1
)
SELECT nd.doc_id,
       COALESCE(n_ref_matches, 0) AS n_ref_matches,
       round(COALESCE(best, 0.0), 6) AS best_est_jaccard,
       CAST(CASE WHEN COALESCE(n_ref_matches, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM newdocs nd LEFT JOIN hits ON hits.new_doc = nd.doc_id"""


def sql_dedup_edit_distance():
    from .functions.dedup import EDIT_MAX_DIST

    norm = NORM.format(c="text")
    return f"""WITH cand2 AS (
{sql_dedup_minhash()}
),
nt AS (SELECT doc_id, {norm} AS t FROM documents)
SELECT c.doc_a, c.doc_b, CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM cand2 c
JOIN nt a ON a.doc_id = c.doc_a
JOIN nt b ON b.doc_id = c.doc_b
WHERE levenshtein(a.t, b.t) <= {EDIT_MAX_DIST}"""


def sql_dedup_lines():
    """First-principles twin of functions/spans.line_dedup: same
    normalize → 6-token block segmentation → distinct-doc frequency →
    cut-and-rejoin, derived directly from the C4 rule (frequency keyed
    on the full line STRING here vs the 64-bit line hash in Spark — an
    intentionally independent derivation)."""
    return _sql_line_dedup("documents")


def _sql_line_dedup(table: str) -> str:
    """Table-parameterized body of sql_dedup_lines (the composed
    corpus-pipeline oracle runs it over the filter-stage survivors)."""
    from .functions.spans import LINE_LEN as L

    norm = NORM.format(c="text")
    return f"""WITH toks AS (
  SELECT doc_id, list_filter(string_split({norm}, ' '), t -> t != '') AS t
  FROM {table}
),
blocks AS (
  SELECT doc_id, CAST((i-1)//{L} AS BIGINT) AS blk,
         string_agg(t[i], ' ' ORDER BY i) AS line
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
  GROUP BY 1, 2
),
freq AS (SELECT line, COUNT(DISTINCT doc_id) AS line_df FROM blocks GROUP BY 1)
SELECT b.doc_id,
       COALESCE(string_agg(CASE WHEN line_df <= 1 THEN b.line END, ' ' ORDER BY b.blk), '') AS clean_text,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN line_df <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN line_df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM blocks b JOIN freq USING (line)
GROUP BY 1"""


def sql_dedup_lines_nl():
    """Twin of the newline-mode line_dedup gate: same synthesized
    3-line newline corpus (boilerplate middle line in every third doc),
    then frequency keyed on the verbatim line STRING (vs the 64-bit
    hash in Spark — intentionally independent), cut-and-rejoin with
    chr(10)."""
    from .gate import NL_BOILER

    return f"""WITH nl AS (
  SELECT doc_id,
         concat_ws(chr(10),
           substr(text, 1, 40),
           CASE WHEN doc_id % 3 = 0 THEN '{NL_BOILER}'
                ELSE substr(text, 41, 40) END,
           substr(text, 81, 40)) AS text
  FROM documents
),
lines AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS blk, ls[i] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM nl),
       unnest(generate_series(1, len(ls))) AS u(i)
),
freq AS (SELECT line, COUNT(DISTINCT doc_id) AS line_df FROM lines GROUP BY 1)
SELECT l.doc_id,
       COALESCE(string_agg(CASE WHEN line_df <= 1 THEN l.line END, chr(10) ORDER BY l.blk), '') AS clean_text,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN line_df <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN line_df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM lines l JOIN freq USING (line)
GROUP BY 1"""


def sql_dedup_contamination():
    """Twin of the 13-gram decontamination scan: same normalized
    tokenization and excerpt construction, membership keyed on the
    verbatim gram string."""
    from .functions.spans import CONTAM_N as N
    from .gate import CONTAM_MOD

    norm = NORM.format(c="text")
    g = N - 1  # slice span arithmetic below
    return f"""WITH toks AS (
  SELECT doc_id, list_filter(string_split({norm}, ' '), t -> t != '') AS t
  FROM documents
),
bench AS (
  SELECT t[11:40] AS bt FROM toks WHERE doc_id % {CONTAM_MOD} = 0
),
bgrams AS (
  SELECT DISTINCT array_to_string(bt[i:i+{g}], ' ') AS gram
  FROM bench, unnest(generate_series(1, greatest(len(bt) - {g}, 0))) AS u(i)
),
cg AS (
  SELECT doc_id, array_to_string(t[i:i+{g}], ' ') AS gram
  FROM toks, unnest(generate_series(1, greatest(len(t) - {g}, 0))) AS u(i)
),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM cg JOIN bgrams USING (gram) GROUP BY 1
)
SELECT toks.doc_id,
       CAST(greatest(len(t) - {g}, 0) AS BIGINT) AS n_grams,
       COALESCE(n_hit, 0) AS n_hit,
       CASE WHEN len(t) - {g} > 0
            THEN round(COALESCE(n_hit, 0) / (len(t) - {g}), 6)
            ELSE 0.0 END AS hit_frac,
       CAST(CASE WHEN COALESCE(n_hit, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS dirty
FROM toks LEFT JOIN hits USING (doc_id)"""


def sql_graph_triangles():
    """Independent twin of functions/graph.triangle_stats: triangles
    enumerated the TEXTBOOK way — canonical a<b edges joined three-fold
    with a<b<c — no degree ordering at all (the orientation is the
    Spark side's skew defense, not part of the semantics)."""
    return f"""WITH cand AS MATERIALIZED (
{sql_dedup_minhash()}
),
canon AS (
  SELECT DISTINCT LEAST(doc_a, doc_b) AS a, GREATEST(doc_a, doc_b) AS b
  FROM cand WHERE doc_a <> doc_b
),
degx AS (
  SELECT doc_id, COUNT(*) AS deg FROM (
    SELECT a AS doc_id FROM canon UNION ALL SELECT b AS doc_id FROM canon
  ) GROUP BY 1
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM canon e1
  JOIN canon e2 ON e2.a = e1.b
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
pern AS (
  SELECT doc_id, COUNT(*) AS n_tri FROM (
    SELECT x AS doc_id FROM tri
    UNION ALL SELECT y AS doc_id FROM tri
    UNION ALL SELECT z AS doc_id FROM tri
  ) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(degx.deg, 0) AS deg,
       COALESCE(pern.n_tri, 0) AS n_tri,
       CASE WHEN COALESCE(degx.deg, 0) >= 2
            THEN round(2 * COALESCE(pern.n_tri, 0) / (degx.deg * (degx.deg - 1)), 6)
            ELSE 0.0 END AS clustering
FROM documents d
LEFT JOIN degx ON degx.doc_id = d.doc_id
LEFT JOIN pern ON pern.doc_id = d.doc_id"""


def sql_text_vocab_coverage():
    """Twin of functions/text.vocab_coverage: same whitespace
    tokenization, frequency summary, prefix sums, and the integer
    ceil-division pick (all BIGINT; ties need no break — tokens inside
    one frequency group are interchangeable)."""
    from .functions.text import VOCAB_COVERAGE_FRACTIONS

    vals = ", ".join(f"({n}, {d})" for n, d in VOCAB_COVERAGE_FRACTIONS)
    return f"""WITH toks AS (
  SELECT list_filter(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '), t -> t != '') AS t
  FROM documents
),
cnt AS (
  SELECT t[i] AS tok, COUNT(*) AS freq
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
  GROUP BY 1
),
fsum AS (SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_toks FROM cnt GROUP BY 1),
pref AS (
  SELECT freq, n_toks,
         CAST(COALESCE(SUM(freq * n_toks) OVER (ORDER BY freq DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(COALESCE(SUM(n_toks) OVER (ORDER BY freq DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS vocab_before
  FROM fsum
),
tot AS (
  SELECT CAST(SUM(freq * n_toks) AS BIGINT) AS total_tokens,
         CAST(SUM(n_toks) AS BIGINT) AS vocab_size
  FROM fsum
),
fr AS (SELECT * FROM (VALUES {vals}) v(cov_num, cov_den))
SELECT CAST(cov_num AS BIGINT) AS cov_num,
       CAST(cov_den AS BIGINT) AS cov_den,
       CAST((total_tokens * cov_num + cov_den - 1) // cov_den AS BIGINT) AS threshold_tokens,
       CAST(vocab_before
            + (((total_tokens * cov_num + cov_den - 1) // cov_den) - cum_before + freq - 1) // freq
         AS BIGINT) AS n_vocab_needed,
       vocab_size, total_tokens
FROM pref CROSS JOIN fr CROSS JOIN tot
WHERE cum_before < (total_tokens * cov_num + cov_den - 1) // cov_den
  AND cum_before + freq * n_toks >= (total_tokens * cov_num + cov_den - 1) // cov_den"""


def sql_graph_pagerank():
    from .functions.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_SCALE

    base_num = PR_DAMP_DEN - PR_DAMP_NUM
    # MATERIALIZED: ed is referenced by every iteration's c{i}; left
    # to the default heuristic DuckDB may inline and re-run the heavy
    # minhash candidate derivation once per round (measured 94 s vs
    # ~2 s materialized)
    parts = [f"""cand AS MATERIALIZED (
{sql_dedup_minhash()}
)""", """und AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM cand
)""", """degx AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY 1)""",
"""ed AS MATERIALIZED (SELECT und.src, und.dst, deg FROM und JOIN degx USING (src))""",
"""nx AS (SELECT COUNT(*) AS n_total FROM documents)""",
f"""r0 AS (
  SELECT doc_id, CAST({PR_SCALE} // n_total AS BIGINT) AS r,
         CAST(({base_num} * ({PR_SCALE} // n_total)) // {PR_DAMP_DEN} AS BIGINT) AS base
  FROM documents CROSS JOIN nx
)"""]
    for i in range(1, PR_ITERS + 1):
        parts.append(f"""c{i} AS (
  SELECT dst, CAST(SUM(r // deg) AS BIGINT) AS s
  FROM r{i-1} JOIN ed ON r{i-1}.doc_id = ed.src GROUP BY 1
)""")
        parts.append(f"""r{i} AS (
  SELECT r{i-1}.doc_id,
         CAST(base + ({PR_DAMP_NUM} * COALESCE(s, 0)) // {PR_DAMP_DEN} AS BIGINT) AS r,
         base
  FROM r{i-1} LEFT JOIN c{i} ON r{i-1}.doc_id = c{i}.dst
)""")
    ctes = ",\n".join(parts)
    return f"WITH {ctes}\nSELECT doc_id, r AS rank_micro FROM r{PR_ITERS}"


def sql_s14_itk_adapter():
    # deterministic 3x4x5 ITK fixture: v = (z*73+y*179+x*283) % 251,
    # spacing (x,y,z)=(0.5,0.75,2.0) origin (1,2,3) — physical coords
    # recomputed straight from the mapping the adapter must implement
    return """SELECT z, y, x,
       CAST((z*73 + y*179 + x*283) % 251 AS BIGINT) AS v,
       CAST(z*2.0 + 3.0 AS DOUBLE) AS pz,
       CAST(y*0.75 + 2.0 AS DOUBLE) AS py,
       CAST(x*0.5 + 1.0 AS DOUBLE) AS px
FROM (
  SELECT CAST(i // 20 AS BIGINT) AS z,
         CAST((i // 5) % 4 AS BIGINT) AS y,
         CAST(i % 5 AS BIGINT) AS x
  FROM range(60) r(i)
)"""


def sql_s17_omero_nifti():
    # window min/max = data range of the NIfTI formula volume;
    # start/end = the cal_min/cal_max literals the fixture writes
    nx, ny, nz = 13, 11, 7
    return f"""WITH v AS (
  SELECT CAST(((i % {nx})*283 + ((i // {nx}) % {ny})*179 + (i // {nx * ny})*73) % 251 AS DOUBLE) AS val
  FROM range({nx * ny * nz}) r(i)
)
SELECT 'FFFFFF' AS color, MIN(val) AS wmin, MAX(val) AS wmax,
       CAST(5.0 AS DOUBLE) AS wstart, CAST(200.0 AS DOUBLE) AS wend
FROM v"""


def sql_c8_rfc4_orientation():
    return """SELECT * FROM (VALUES
  ('x', 'right-to-left', 'left-to-right', 'anatomical'),
  ('y', 'anterior-to-posterior', 'posterior-to-anterior', 'anatomical'),
  ('z', 'inferior-to-superior', 'inferior-to-superior', 'anatomical'),
  ('flag_off', 'absent', 'absent', 'verdict'),
  ('flag_on', 'present:inferior-to-superior', 'present:left-to-right', 'verdict')
) AS t(axis, lps, ras, otype)"""


def sql_c9_version_roundtrip():
    row = "'z,y,x', 'scale0/image', '[2.5, 1.4, 1.4]', '[332.5, 360.0, 0.0]'"
    return f"""SELECT * FROM (VALUES
  ('a04', '0.4', {row}),
  ('a05', '0.5', {row}),
  ('back04', '0.4', {row})
) AS t(step, version, axes, ds_path, ds_scale, ds_translation)"""


def sql_c10_method_provenance():
    return """SELECT * FROM (VALUES
  ('DASK_IMAGE_GAUSSIAN', 'ngff_zarr_spark', 'gaussian_downsample[sampled]'),
  ('DASK_IMAGE_MODE', 'ngff_zarr_spark', 'mode_downsample'),
  ('DASK_IMAGE_NEAREST', 'ngff_zarr_spark', 'nearest'),
  ('ITKWASM_BIN_SHRINK', 'ngff_zarr_spark', 'bin_shrink'),
  ('ITKWASM_GAUSSIAN', 'ngff_zarr_spark', 'gaussian_downsample[itk_bessel]'),
  ('ITKWASM_LABEL_IMAGE', 'ngff_zarr_spark', 'label_downsample'),
  ('ITK_BIN_SHRINK', 'ngff_zarr_spark', 'bin_shrink'),
  ('ITK_GAUSSIAN', 'ngff_zarr_spark', 'gaussian_downsample[itk_bessel]')
) AS t(method, package, function)"""


def sql_c7_validate_battery():
    # js_* rows are full JSON-Schema verdicts (0 = valid, 1 = invalid)
    # against the vendored OME-NGFF spec schemas; the rest are
    # structural problem counts (gate.q_c7_validate_battery)
    return """SELECT doc, CAST(n_problems AS INTEGER) AS n_problems FROM (VALUES
  ('empty', 1),
  ('v02_ok', 0),
  ('v03_ok', 0),
  ('v04_bad_axis', 1),
  ('v04_no_transforms', 1),
  ('v04_ok', 0),
  ('js_v01_ok', 0),
  ('js_v03_ok', 0),
  ('js_v04_bad_transform', 1),
  ('js_v04_no_axes', 1),
  ('js_v04_ok', 0),
  ('js_v04_plate_bad_well', 1),
  ('js_v04_plate_ok', 0),
  ('js_v04_strict_gap', 1),
  ('js_v04_well_bad', 1),
  ('js_v04_well_ok', 0),
  ('js_v05_bad_version', 1),
  ('js_v05_ok', 0)
) AS t(doc, n_problems)"""


def sql_t2_t3_callbacks():
    return """SELECT kind, what, CAST(a AS INTEGER) AS a, CAST(b AS INTEGER) AS b FROM (VALUES
  ('update', 'scale0', 0, 2),
  ('update', 'scale1', 1, 2),
  ('callback', 'base', 1, 1)
) AS t(kind, what, a, b)"""


def sql_t1_stream_pixels():
    from .fixtures import ImageSpec

    return f"""WITH {pixel_cte_sql(ImageSpec("sg", z=4, y=8, x=8))}
SELECT t, c, z, y, x, v FROM P"""


def sql_dedup_clusters(table: str = "documents"):
    # transitive closure by recursive CTE over the SAME candidate pairs
    # the Spark side feeds its hash-min propagation; cluster label =
    # smallest reachable doc_id
    return f"""WITH RECURSIVE pairs AS ({sql_dedup_minhash(table)}),
edges AS (
  SELECT doc_a AS u, doc_b AS w FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS w FROM pairs
),
reach(u, label) AS (
  SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
  UNION
  -- monotone restriction: only labels SMALLER than the entered node
  -- propagate. The component minimum is smaller than every node on
  -- every path, so it still reaches everywhere and MIN(label) is
  -- unchanged — but a k-member near-dup cluster now materializes O(k)
  -- reach rows instead of the full O(k^2) transitive closure (which
  -- at the 20k adversarial-skew cluster would be 4e8 rows)
  SELECT e.u, r.label FROM edges e JOIN reach r ON e.w = r.u
  WHERE r.label < e.u
)
SELECT u AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY u"""


def sql_dedup_clusters_chain():
    """Chain-graph closure twin for the star-contraction CC gate: the
    SAME monotone recursive CTE as sql_dedup_clusters, over pairs built
    by the identical consecutive-event_id-within-512-blocks join. For a
    512-chain the monotone restriction materializes O(len²/2) reach
    rows per chain (~2.6M total at sf0.01 — measured 3.3 s)."""
    return """WITH RECURSIVE pairs AS (
  SELECT e1.event_id AS doc_a, e2.event_id AS doc_b
  FROM events e1 JOIN events e2 ON e2.event_id = e1.event_id + 1
  WHERE (e1.event_id + 1) % 512 != 0
),
edges AS (
  SELECT doc_a AS u, doc_b AS w FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS w FROM pairs
),
reach(u, label) AS (
  SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.label FROM edges e JOIN reach r ON e.w = r.u
  WHERE r.label < e.u
)
SELECT u AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY u"""


def sql_dedup_keep():
    return f"""WITH clusters AS ({sql_dedup_clusters()})
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)"""


def sql_corpus_decontaminate():
    from .gate import DECON_MOD, DECON_N, DECON_REM

    n = DECON_N
    h = H64.format(s="array_to_string(list_slice(toks, i+1, i+" + str(n) + "), ' ')")
    return f"""WITH {_toks_cte(lower=True)},
g AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(toks) >= {n}
      THEN list_transform(range(0, len(toks) - {n} + 1), i -> {h})
      ELSE [] END) AS grams
  FROM q),
bench AS (
  SELECT DISTINCT unnest(grams) AS hh FROM g
  WHERE doc_id % {DECON_MOD} = {DECON_REM}),
tg AS (SELECT doc_id, unnest(grams) AS hh FROM g),
hits AS (
  SELECT tg.doc_id, COUNT(*) AS n_hits
  FROM tg JOIN bench ON tg.hh = bench.hh GROUP BY 1)
SELECT g.doc_id,
  CAST(len(g.grams) AS BIGINT) AS n_grams,
  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
  COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id"""


def sql_dedup_skew_cluster():
    """The capped pipeline re-run INDEPENDENTLY over the same
    corpus ∪ boilerplate union the gate generates (gate._skew_docs):
    the metrics are computed twice, not pinned, so a cap bug on either
    engine shows as a mismatch."""
    inner = sql_dedup_clusters(table="documents_skew")
    lim = SKEW_BASE_ID
    return f"""WITH documents_skew AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT {SKEW_BASE_ID} + i AS doc_id, '{SKEW_TEXT}' AS text
  FROM range({SKEW_N}) r(i)
),
clusters AS MATERIALIZED ({inner}),
kept AS (
  SELECT doc_id FROM documents_skew
  WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
)
SELECT 'boiler_docs_clustered' AS metric, CAST(COUNT(*) AS BIGINT) AS v
  FROM clusters WHERE doc_id >= {lim}
UNION ALL SELECT 'boiler_clusters', CAST(COUNT(DISTINCT cluster_id) AS BIGINT)
  FROM clusters WHERE doc_id >= {lim}
UNION ALL SELECT 'boiler_min_label', CAST(MIN(cluster_id) AS BIGINT)
  FROM clusters WHERE doc_id >= {lim}
UNION ALL SELECT 'boiler_kept', CAST(COUNT(*) AS BIGINT)
  FROM kept WHERE doc_id >= {lim}
UNION ALL SELECT 'base_cluster_rows', CAST(COUNT(*) AS BIGINT)
  FROM clusters WHERE doc_id < {lim}
UNION ALL SELECT 'base_label_sum', CAST(SUM(cluster_id) AS BIGINT)
  FROM clusters WHERE doc_id < {lim}"""


def sql_dedup_simhash():
    h = H64.format(s="tok")
    return f"""WITH {_toks_cte(lower=True)},
tk AS (SELECT doc_id, unnest(toks) AS tok FROM q),
hs AS (SELECT doc_id, {h} AS h FROM tk),
votes AS (
  SELECT doc_id, b.i AS b,
         CAST(SUM(((h >> CAST(b.i AS INTEGER)) & 1) * 2 - 1) AS BIGINT) AS s
  FROM hs CROSS JOIN range(60) b(i)
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY 1"""


def sql_dedup_ngram_jaccard(max_df: int | None = None):
    cap_cte = ""
    sh_src = "sh"
    if max_df is not None:
        cap_cte = f""",
dfreq AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {max_df}),
shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle))"""
        sh_src = "shc"
    return f"""WITH {_toks_cte(lower=True)},
sh0 AS (SELECT doc_id, unnest({_SHINGLE}) AS shingle FROM q),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0){cap_cte},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM {sh_src} GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM {sh_src} a JOIN {sh_src} b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1"""


def sql_text_token_count():
    return f"""SELECT doc_id,
       CAST(len({TOKS_RAW.format(c='text')}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_subtokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents"""


def sql_text_top_tokens():
    return f"""SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest({TOKS_RAW.format(c='lower(text)')}) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token ASC LIMIT 50"""


def sql_text_quality():
    stop_list = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    return f"""WITH q AS (
  SELECT doc_id, {TOKS_RAW.format(c='text')} AS toks,
         CAST(length(text) AS BIGINT) AS n_char,
         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents
),
m AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
         CAST(len(list_filter(toks, t -> list_contains({stop_list}, lower(t)))) AS BIGINT) AS n_stop,
         n_char, n_punct
  FROM q
)
SELECT doc_id, n_tok AS n_tokens,
       round((n_char - (n_tok - 1)) / n_tok, 6) AS mean_token_len,
       round(n_punct / n_char, 6) AS punct_ratio,
       round(n_stop / n_tok, 6) AS stopword_ratio,
       round(least(n_tok / 100.0, 1.0) * 0.4 + (n_stop / n_tok) * 0.4 + (1.0 - n_punct / n_char) * 0.2, 6) AS quality
FROM m"""


def sql_text_lang_id():
    langs = sorted(LANG_STOPWORDS)
    score_cols = []
    for lang in langs:
        lst = "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"
        score_cols.append(
            f"CAST(len(list_filter(toks, t -> list_contains({lst}, t))) AS BIGINT) AS s_{lang}"
        )
    scores = ",\n         ".join(score_cols)
    # argmax with lexicographic tie-break (langs checked in sorted order)
    cases = []
    for i, lang in enumerate(langs):
        rest = [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        cond = " AND ".join(rest) if rest else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_expr = "CASE " + " ".join(cases) + " END"
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    return f"""WITH {_toks_cte(lower=True)},
s AS (
  SELECT doc_id,
         {scores}
  FROM q
)
SELECT doc_id, {case_expr} AS pred_lang, {greatest} AS votes FROM s"""


def sql_text_fingerprint():
    return f"""WITH n AS (SELECT doc_id, {NORM.format(c='text')} AS norm FROM documents)
SELECT doc_id, md5(norm) AS fp_md5, {H64.format(s='norm')} AS fp64 FROM n"""


def sql_text_winnow():
    h = H64.format(s="tok")
    return f"""WITH {_toks_cte(lower=False)},
tk AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) - 1 AS pos FROM q),
hs AS (SELECT doc_id, pos, {h} AS h FROM tk),
m AS (
  SELECT DISTINCT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
  FROM hs
)
SELECT doc_id, COUNT(*) AS n_fp, MIN(fp) AS fp_min, MAX(fp) AS fp_max FROM m GROUP BY 1"""


_UNROLL = f"""u AS (
  SELECT vec_id,
         sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS norm,
         embedding
  FROM embeddings
)"""


def sql_emb_label_centroids():
    """Twin of functions/similarity.label_centroid_similarity: same SQ8
    codes, per-(label, dim) BIGINT sums, pairwise centroid cosine with
    per-side sqrt (the BIGINT na*nb product would overflow at corpus
    scale; the doubles cannot)."""
    from .functions.similarity import SQ8_LEVELS

    return f"""WITH mx AS (
  SELECT vec_id, label, embedding,
         list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS maxabs
  FROM embeddings
),
qv AS (
  SELECT vec_id, label,
         CASE WHEN maxabs > 0
              THEN list_transform(embedding,
                     v -> CAST(round(({SQ8_LEVELS}.0 * CAST(v AS DOUBLE)) / maxabs) AS BIGINT))
              ELSE list_transform(embedding, v -> CAST(0 AS BIGINT)) END AS q
  FROM mx
),
sums AS (
  SELECT label, CAST(r.i AS BIGINT) AS pos,
         CAST(SUM(q[CAST(r.i AS INTEGER)+1]) AS BIGINT) AS s
  FROM qv CROSS JOIN range({EMB_DIM}) r(i)
  GROUP BY 1, 2
),
counts AS (SELECT label, COUNT(*) AS n FROM qv GROUP BY 1),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(SUM(a.s * b.s) AS BIGINT) AS dot
  FROM sums a JOIN sums b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2
),
norms AS (
  SELECT label, CAST(SUM(s * s) AS BIGINT) AS nrm FROM sums GROUP BY 1
)
SELECT CAST(d.label_a AS BIGINT) AS label_a,
       CAST(d.label_b AS BIGINT) AS label_b,
       ca.n AS n_a, cb.n AS n_b,
       CASE WHEN na.nrm > 0 AND nb.nrm > 0
            THEN round(dot / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))), 6)
            ELSE 0.0 END AS cos_centroid
FROM dots d
JOIN norms na ON na.label = d.label_a
JOIN norms nb ON nb.label = d.label_b
JOIN counts ca ON ca.label = d.label_a
JOIN counts cb ON cb.label = d.label_b"""


def sql_ann_mmr_rerank(query_literals=False):
    """Unrolled twin of functions/similarity.mmr_rerank_sq8: the same
    SQ8 micro-unit relevance/similarity tables, then ANN_K greedy
    selection rounds as explicit CTEs (the pagerank-style unroll) —
    BIGINT scores end-to-end, ties to the smaller neighbor_id. With
    ``query_literals`` the relevance side is the ANN_EVAL_QUERIES
    VALUES list quantized through the SAME expression as the corpus
    (free-vector serving twin, no self-exclusion)."""
    from .functions.similarity import (
        MMR_LAM_DEN,
        MMR_LAM_NUM,
        MMR_POOL,
        SQ8_LEVELS,
    )

    ln, comp = MMR_LAM_NUM, MMR_LAM_DEN - MMR_LAM_NUM
    parts = [f"""mx AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS maxabs
  FROM embeddings
)""", f"""qv AS (
  SELECT vec_id,
         CASE WHEN maxabs > 0
              THEN list_transform(embedding,
                     v -> CAST(round(({SQ8_LEVELS}.0 * CAST(v AS DOUBLE)) / maxabs) AS BIGINT))
              ELSE list_transform(embedding, v -> CAST(0 AS BIGINT)) END AS q
  FROM mx
)""", """nn AS MATERIALIZED (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn
  FROM qv
)"""]
    if query_literals:
        from .functions.similarity import ANN_EVAL_QUERIES

        vals = ", ".join(
            "({}, [{}])".format(qi, ", ".join(repr(float(x)) for x in v))
            for qi, v in ANN_EVAL_QUERIES
        )
        parts.append(f"""qlit AS (
  SELECT query_id,
         CASE WHEN maxabs > 0
              THEN list_transform(qemb,
                     v -> CAST(round(({SQ8_LEVELS}.0 * CAST(v AS DOUBLE)) / maxabs) AS BIGINT))
              ELSE list_transform(qemb, v -> CAST(0 AS BIGINT)) END AS q
  FROM (
    SELECT query_id, qemb,
           list_max(list_transform(qemb, v -> abs(CAST(v AS DOUBLE)))) AS maxabs
    FROM (VALUES {vals}) AS t(query_id, qemb)
  )
)""")
        parts.append("""qn2 AS (
  SELECT query_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn
  FROM qlit
)""")
        parts.append(f"""qdots AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(SUM(c.q[CAST(r.i AS INTEGER)+1] * q.q[CAST(r.i AS INTEGER)+1]) AS BIGINT) AS dot_q,
         q.qn AS qn_q, c.qn AS qn_n
  FROM qn2 q
  CROSS JOIN nn c
  CROSS JOIN range({EMB_DIM}) r(i)
  GROUP BY 1, 2, 4, 5
)""")
    else:
        parts.append(f"""qdots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(c.q[CAST(r.i AS INTEGER)+1] * q.q[CAST(r.i AS INTEGER)+1]) AS BIGINT) AS dot_q,
         q.qn AS qn_q, c.qn AS qn_n
  FROM nn q
  JOIN nn c ON c.vec_id != q.vec_id
  CROSS JOIN range({EMB_DIM}) r(i)
  WHERE q.vec_id < 10
  GROUP BY 1, 2, 4, 5
)""")
    parts += [f"""cands AS MATERIALIZED (
  SELECT query_id, neighbor_id,
         CAST(round(est_cos * 1000000) AS BIGINT) AS rel_u
  FROM (
    SELECT query_id, neighbor_id,
           CASE WHEN qn_q > 0 AND qn_n > 0
                THEN round(dot_q / sqrt(CAST(qn_q * qn_n AS DOUBLE)), 6)
                ELSE 0.0 END AS est_cos,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY (CASE WHEN qn_q > 0 AND qn_n > 0
                            THEN round(dot_q / sqrt(CAST(qn_q * qn_n AS DOUBLE)), 6)
                            ELSE 0.0 END) DESC, neighbor_id) AS prk
    FROM qdots
  ) WHERE prk <= {MMR_POOL}
)""", f"""pdots AS (
  SELECT c1.query_id, c1.neighbor_id AS a, c2.neighbor_id AS b,
         CAST(SUM(na.q[CAST(r.i AS INTEGER)+1] * nb.q[CAST(r.i AS INTEGER)+1]) AS BIGINT) AS dot_q,
         na.qn AS qn_a, nb.qn AS qn_b
  FROM cands c1
  JOIN cands c2 ON c2.query_id = c1.query_id AND c2.neighbor_id != c1.neighbor_id
  JOIN nn na ON na.vec_id = c1.neighbor_id
  JOIN nn nb ON nb.vec_id = c2.neighbor_id
  CROSS JOIN range({EMB_DIM}) r(i)
  GROUP BY 1, 2, 3, 5, 6
)""", """sims AS MATERIALIZED (
  SELECT query_id, a, b,
         CAST(round((CASE WHEN qn_a > 0 AND qn_b > 0
                          THEN round(dot_q / sqrt(CAST(qn_a * qn_b AS DOUBLE)), 6)
                          ELSE 0.0 END) * 1000000) AS BIGINT) AS sim_u
  FROM pdots
)""", f"""sel1 AS (
  SELECT query_id, neighbor_id, CAST({ln} * rel_u AS BIGINT) AS mmr_u
  FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY rel_u DESC, neighbor_id) AS rn
        FROM cands)
  WHERE rn = 1
)""", """picked1 AS (SELECT query_id, neighbor_id FROM sel1)"""]
    for i in range(2, ANN_K + 1):
        parts.append(f"""sc{i} AS (
  SELECT c.query_id, c.neighbor_id, c.rel_u, MAX(s.sim_u) AS msim
  FROM cands c
  JOIN sims s ON s.query_id = c.query_id AND s.a = c.neighbor_id
  JOIN picked{i-1} p ON p.query_id = s.query_id AND p.neighbor_id = s.b
  WHERE NOT EXISTS (SELECT 1 FROM picked{i-1} x
                    WHERE x.query_id = c.query_id
                      AND x.neighbor_id = c.neighbor_id)
  GROUP BY 1, 2, 3
)""")
        parts.append(f"""sel{i} AS (
  SELECT query_id, neighbor_id,
         CAST({ln} * rel_u - {comp} * msim AS BIGINT) AS mmr_u
  FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id
          ORDER BY ({ln} * rel_u - {comp} * msim) DESC, neighbor_id) AS rn
        FROM sc{i})
  WHERE rn = 1
)""")
        parts.append(
            f"""picked{i} AS (SELECT query_id, neighbor_id FROM picked{i-1}
  UNION ALL SELECT query_id, neighbor_id FROM sel{i})"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, CAST({i} AS BIGINT) AS pick_rank, neighbor_id, mmr_u FROM sel{i}"
        for i in range(1, ANN_K + 1)
    )
    ctes = ",\n".join(parts)
    return f"WITH {ctes}\n{union}"


def sql_ann_sq8_topk():
    """Twin of functions/similarity.sq8_topk: identical expression tree
    (abs/max exact; one multiply, one divide, round; integer dot and
    norms BIGINT-exact) so no rounding slack is needed beyond the
    shared 6dp on the final estimate."""
    from .functions.similarity import SQ8_LEVELS

    return f"""WITH mx AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS maxabs
  FROM embeddings
),
qv AS (
  SELECT vec_id,
         CASE WHEN maxabs > 0
              THEN list_transform(embedding,
                     v -> CAST(round(({SQ8_LEVELS}.0 * CAST(v AS DOUBLE)) / maxabs) AS BIGINT))
              ELSE list_transform(embedding, v -> CAST(0 AS BIGINT)) END AS q
  FROM mx
),
nn AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn
  FROM qv
),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(c.q[CAST(r.i AS INTEGER)+1] * q.q[CAST(r.i AS INTEGER)+1]) AS BIGINT) AS dot_q,
         q.qn AS qn_q, c.qn AS qn_n
  FROM nn q
  JOIN nn c ON c.vec_id != q.vec_id
  CROSS JOIN range({EMB_DIM}) r(i)
  WHERE q.vec_id < 10
  GROUP BY 1, 2, 4, 5
),
rk AS (
  SELECT query_id, neighbor_id,
         CASE WHEN qn_q > 0 AND qn_n > 0
              THEN round(dot_q / sqrt(CAST(qn_q * qn_n AS DOUBLE)), 6)
              ELSE 0.0 END AS est_cos,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY (CASE WHEN qn_q > 0 AND qn_n > 0
                          THEN round(dot_q / sqrt(CAST(qn_q * qn_n AS DOUBLE)), 6)
                          ELSE 0.0 END) DESC, neighbor_id) AS rank
  FROM dots
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, est_cos
FROM rk WHERE rank <= {ANN_K}"""


def sql_ann_cosine_topk():
    # ranks on the ROUNDED cosine (ties → neighbor_id) so last-ulp
    # summation-order differences across engines cannot flip ranks
    return f"""WITH {_UNROLL},
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.norm AS qn, c.norm AS cn,
         SUM(CAST(c.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE) * CAST(q.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)) AS dot
  FROM u q
  JOIN u c ON c.vec_id != q.vec_id
  CROSS JOIN range({EMB_DIM}) r(i)
  WHERE q.vec_id < 10
  GROUP BY 1, 2, 3, 4
),
rk AS (
  SELECT query_id, neighbor_id, round(dot / (qn * cn), 6) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY round(dot / (qn * cn), 6) DESC, neighbor_id) AS rank
  FROM dots
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
FROM rk WHERE rank <= {ANN_K}"""


# hyperplane sign s(plane, pos) = ±1 from bit 0 of the portable h64 of
# 'plane:pos' — recomputed symbolically here; the Spark side embeds the
# same values as compile-time literal arrays (hyperplane_signs).
from .functions.similarity import BAND_PLANES as _BP, N_BANDS as _NB  # noqa: E402

_N_PLANES = _NB * _BP
_LSH_BANDS_CTE = f"""planes AS (
  SELECT p.i AS plane, r.i AS pos,
         ((CAST(concat('0x', substr(md5(concat(CAST(p.i AS VARCHAR), ':', CAST(r.i AS VARCHAR))),1,15)) AS BIGINT) & 1) * 2 - 1) AS s
  FROM range({_N_PLANES}) p(i) CROSS JOIN range({EMB_DIM}) r(i)
),
proj AS (
  SELECT e.vec_id, pl.plane,
         SUM(CAST(e.embedding[CAST(pl.pos AS INTEGER)+1] AS DOUBLE) * pl.s) AS proj
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY 1, 2
),
bb AS (
  SELECT vec_id, plane//{_BP} AS band,
         CAST(SUM(CASE WHEN proj > 0 THEN (1 << CAST(plane % {_BP} AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY 1, 2
)"""


def _kmeans_ctes(n_iters: int) -> str:
    """Unrolled k-means CTE chain mirroring
    similarity.kmeans_centroids: centroids kept in LONG form
    (cell, pos, val); per iteration assign by rounded cosine argmax
    (ties → lowest cell), then re-center with the integer-quantized
    mean — ``CAST(round(v·10⁹) AS BIGINT)`` sums are exact and
    order-independent, so both engines land on bit-identical
    centroids; empty cells COALESCE to the previous centroid. Ends
    with ``kcent``/``knorm`` = the final centroids and their norms."""
    from .gate import IVF_CELLS

    parts = [
        f"""c0 AS (
  SELECT vec_id AS cell, r.i AS pos,
         CAST(embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range({EMB_DIM}) r(i) WHERE vec_id < {IVF_CELLS}
)"""
    ]
    for t in range(n_iters):
        parts.append(
            f"""n{t} AS (SELECT cell, sqrt(SUM(val*val)) AS norm FROM c{t} GROUP BY cell)"""
        )
        parts.append(
            f"""ad{t} AS (
  SELECT d.vec_id, d.cell, round(d.dot / n{t}.norm, 6) AS dot FROM (
    SELECT e.vec_id, c.cell,
           SUM(CAST(e.embedding[CAST(c.pos AS INTEGER)+1] AS DOUBLE) * c.val) AS dot
    FROM embeddings e CROSS JOIN c{t} c
    GROUP BY e.vec_id, c.cell
  ) d JOIN n{t} USING (cell)
)"""
        )
        parts.append(
            f"""asg{t} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM ad{t}
  ) WHERE rn = 1
)"""
        )
        parts.append(
            f"""sm{t} AS (
  SELECT a.cell, r.i AS pos,
         CAST(SUM(CAST(round(CAST(e.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)
                             * 1000000000.0) AS BIGINT)) AS DOUBLE)
           / (COUNT(*) * 1000000000.0) AS val
  FROM embeddings e JOIN asg{t} a USING (vec_id) CROSS JOIN range({EMB_DIM}) r(i)
  GROUP BY a.cell, r.i
)"""
        )
        parts.append(
            f"""c{t + 1} AS (
  SELECT p.cell, p.pos, COALESCE(s.val, p.val) AS val
  FROM c{t} p LEFT JOIN sm{t} s ON s.cell = p.cell AND s.pos = p.pos
)"""
        )
    parts.append(
        f"""kcent AS (SELECT cell, pos, val FROM c{n_iters})"""
    )
    parts.append(
        """knorm AS (SELECT cell, sqrt(SUM(val*val)) AS norm FROM kcent GROUP BY cell)"""
    )
    return ",\n".join(parts)


def sql_ann_ivf_topk():
    # IVF-flat twin with the LEARNED quantizer: unroll KMEANS_ITERS
    # Lloyd iterations from the lowest-id seed, then assignment/probe
    # by rounded dot with the (norm-divided) centroid — |v| is constant
    # per row so it cannot change the per-vector ORDER over cells and
    # is omitted on both sides; re-rank = the exact rounded cosine.
    from .gate import IVF_PROBE, KMEANS_ITERS

    return f"""WITH {_UNROLL},
{_kmeans_ctes(KMEANS_ITERS)},
adots AS (
  SELECT d.vec_id, d.cell, round(d.dot / knorm.norm, 6) AS dot FROM (
    SELECT e.vec_id, c.cell,
           SUM(CAST(e.embedding[CAST(c.pos AS INTEGER)+1] AS DOUBLE) * c.val) AS dot
    FROM embeddings e CROSS JOIN kcent c
    GROUP BY e.vec_id, c.cell
  ) d JOIN knorm USING (cell)
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM adots
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM adots WHERE vec_id < 10
  ) WHERE rn <= {IVF_PROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM cells c JOIN probes p USING (cell)
  WHERE c.vec_id != p.query_id
),
dots AS (
  SELECT cd.query_id, cd.neighbor_id, q.norm AS qn, c.norm AS cn,
         SUM(CAST(c.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)
             * CAST(q.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)) AS dot
  FROM cand cd
  JOIN u q ON q.vec_id = cd.query_id
  JOIN u c ON c.vec_id = cd.neighbor_id
  CROSS JOIN range({EMB_DIM}) r(i)
  GROUP BY 1, 2, 3, 4
),
rk AS (
  SELECT query_id, neighbor_id, round(dot / (qn * cn), 6) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY round(dot / (qn * cn), 6) DESC, neighbor_id) AS rank
  FROM dots
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
FROM rk WHERE rank <= {ANN_K}"""


def sql_ann_ivf_balanced():
    # Capacity-bounded quantizer twin: re-derives the clustered corpus
    # (4 of 5 vectors collapsed onto vec 0's direction), assigns by
    # seed-centroid rounded-cosine argmax (ties → lowest cell), then
    # global rank within cell under the total order
    # (portable-h64(vec_id) % P, vec_id) and subcell = rank // cap.
    # The Spark side computes the rank two-phase (bounded per-task
    # sort); the single row_number here is the same total order, so the
    # occupancy tables match exactly.
    from .gate import EMB_DIM as _D
    from .gate import IVF_CAP, IVF_CELLS, IVF_PREBUCKETS

    h = H64.format(s="CAST(vec_id AS VARCHAR)")
    return f"""WITH hub AS (
  SELECT embedding FROM embeddings WHERE vec_id = 0
),
corpus AS (
  SELECT e.vec_id,
         CASE WHEN e.vec_id % 5 <> 0 THEN h.embedding ELSE e.embedding END AS embedding
  FROM embeddings e CROSS JOIN hub h
),
cent AS (
  SELECT vec_id AS cell, r.i AS pos,
         CAST(embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range({_D}) r(i) WHERE vec_id < {IVF_CELLS}
),
cn AS (SELECT cell, sqrt(SUM(val*val)) AS norm FROM cent GROUP BY cell),
adots AS (
  SELECT d.vec_id, d.cell, round(d.dot / cn.norm, 6) AS dot FROM (
    SELECT e.vec_id, c.cell,
           SUM(CAST(e.embedding[CAST(c.pos AS INTEGER)+1] AS DOUBLE) * c.val) AS dot
    FROM corpus e CROSS JOIN cent c
    GROUP BY e.vec_id, c.cell
  ) d JOIN cn USING (cell)
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM adots
  ) WHERE rn = 1
),
rk AS (
  SELECT vec_id, cell,
         row_number() OVER (
           PARTITION BY cell ORDER BY {h} % {IVF_PREBUCKETS}, vec_id
         ) - 1 AS grk
  FROM cells
)
SELECT CAST(cell AS BIGINT) AS cell, CAST(grk // {IVF_CAP} AS BIGINT) AS subcell,
       CAST(COUNT(*) AS BIGINT) AS n
FROM rk GROUP BY 1, 2"""


def sql_semantic_dedup():
    # SemDeDup twin: same clustered corpus + capacity-bounded lists as
    # sql_ann_ivf_balanced, then within-list pairwise rounded cosines
    # and the single-pass lowest-id drop rule. Every stage re-derived
    # in SQL — lists, pair dots, verdicts.
    from .gate import EMB_DIM as _D
    from .gate import IVF_CAP, IVF_CELLS, IVF_PREBUCKETS, SEMDEDUP_TAU

    h = H64.format(s="CAST(vec_id AS VARCHAR)")
    return f"""WITH hub AS (
  SELECT embedding FROM embeddings WHERE vec_id = 0
),
corpus AS (
  SELECT e.vec_id,
         CASE WHEN e.vec_id % 5 <> 0 THEN h.embedding ELSE e.embedding END AS embedding
  FROM embeddings e CROSS JOIN hub h
),
cent AS (
  SELECT vec_id AS cell, r.i AS pos,
         CAST(embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range({_D}) r(i) WHERE vec_id < {IVF_CELLS}
),
cn AS (SELECT cell, sqrt(SUM(val*val)) AS norm FROM cent GROUP BY cell),
adots AS (
  SELECT d.vec_id, d.cell, round(d.dot / cn.norm, 6) AS dot FROM (
    SELECT e.vec_id, c.cell,
           SUM(CAST(e.embedding[CAST(c.pos AS INTEGER)+1] AS DOUBLE) * c.val) AS dot
    FROM corpus e CROSS JOIN cent c
    GROUP BY e.vec_id, c.cell
  ) d JOIN cn USING (cell)
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM adots
  ) WHERE rn = 1
),
sc AS (
  SELECT vec_id, cell,
         (row_number() OVER (
            PARTITION BY cell ORDER BY {h} % {IVF_PREBUCKETS}, vec_id
          ) - 1) // {IVF_CAP} AS subcell
  FROM cells
),
cnorm AS (
  SELECT vec_id,
         sqrt(list_sum(list_transform(embedding,
              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS norm
  FROM corpus
),
pairs AS (
  SELECT pa.u, pa.v, round(pa.dot / (na.norm * nb.norm), 6) AS cos
  FROM (
    SELECT a.vec_id AS u, b.vec_id AS v,
           SUM(CAST(ca.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)
               * CAST(cb.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)) AS dot
    FROM sc a
    JOIN sc b ON a.cell = b.cell AND a.subcell = b.subcell AND a.vec_id < b.vec_id
    JOIN corpus ca ON ca.vec_id = a.vec_id
    JOIN corpus cb ON cb.vec_id = b.vec_id
    CROSS JOIN range({_D}) r(i)
    GROUP BY 1, 2
  ) pa
  JOIN cnorm na ON na.vec_id = pa.u
  JOIN cnorm nb ON nb.vec_id = pa.v
),
drp AS (
  SELECT v AS vec_id, MIN(u) AS dup_of
  FROM pairs WHERE cos >= {SEMDEDUP_TAU} GROUP BY 1
)
SELECT s.vec_id, d.dup_of IS NULL AS keep,
       CAST(COALESCE(d.dup_of, -1) AS BIGINT) AS dup_of
FROM sc s LEFT JOIN drp d USING (vec_id)"""


def sql_ann_recall_eval():
    # recall@k twin: both result sets re-derived (the brute and IVF
    # oracles verbatim, as subqueries), overlap by id-set join.
    from .gate import ANN_K

    return f"""WITH ex AS (
  SELECT query_id, neighbor_id FROM ({sql_ann_cosine_topk()}) t_ex
),
ap AS (
  SELECT query_id, neighbor_id FROM ({sql_ann_ivf_topk()}) t_ap
),
h AS (
  SELECT e.query_id, COUNT(*) AS n_hit
  FROM ex e JOIN ap a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
)
SELECT q.query_id, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       round(COALESCE(h.n_hit, 0) / {ANN_K}, 6) AS recall
FROM (SELECT DISTINCT query_id FROM ex) q LEFT JOIN h USING (query_id)"""


def sql_ann_pq_topk():
    # PQ/ADC twin: codebooks = subvectors of the n_codes lowest-id rows
    # (the deterministic seed rule); encode = per-subspace argmin of the
    # 6dp-rounded squared distance (ties → lowest code); query tables =
    # 6dp-rounded subspace dots scaled to exact int64 micros; ADC score
    # = integer SUM of table entries (order-independent across engines).
    from .gate import ANN_K, PQ_CODES, PQ_SUBSPACES

    dsub = EMB_DIM // PQ_SUBSPACES
    return f"""WITH cb AS (
  SELECT CAST(r.i // {dsub} AS INTEGER) AS s, vec_id AS j,
         CAST(r.i AS INTEGER) AS pos,
         CAST(embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range({EMB_DIM}) r(i) WHERE vec_id < {PQ_CODES}
),
enc AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT d.vec_id, d.s, d.j,
           row_number() OVER (PARTITION BY d.vec_id, d.s
                              ORDER BY d.d2 ASC, d.j ASC) AS rn
    FROM (
      SELECT e.vec_id, c.s, c.j,
             round(SUM((CAST(e.embedding[c.pos+1] AS DOUBLE) - c.val)
                     * (CAST(e.embedding[c.pos+1] AS DOUBLE) - c.val)), 6) AS d2
      FROM embeddings e CROSS JOIN cb c
      GROUP BY e.vec_id, c.s, c.j
    ) d
  ) WHERE rn = 1
),
qt AS (
  SELECT q.vec_id AS query_id, c.s, c.j,
         CAST(round(round(SUM(CAST(q.embedding[c.pos+1] AS DOUBLE) * c.val), 6)
                    * 1000000) AS BIGINT) AS t_u
  FROM embeddings q CROSS JOIN cb c
  WHERE q.vec_id < 10
  GROUP BY q.vec_id, c.s, c.j
),
sc AS (
  SELECT qt.query_id, enc.vec_id AS neighbor_id, SUM(qt.t_u) AS score_u
  FROM enc JOIN qt ON qt.s = enc.s AND qt.j = enc.code
  WHERE enc.vec_id != qt.query_id
  GROUP BY 1, 2
),
rk AS (
  SELECT query_id, neighbor_id, score_u,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_u DESC, neighbor_id) AS rank
  FROM sc
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       CAST(score_u AS BIGINT) AS score_u
FROM rk WHERE rank <= {ANN_K}"""


def sql_ann_ivfpq_topk():
    # IVF (seed quantizer, _kmeans_ctes(0) → kcent/knorm) prunes the
    # candidate set; PQ (cb/enc/qt from the sql_ann_pq_topk twin) scores
    # it with exact integer ADC sums. Every step reuses a CTE pattern
    # already verified by the standalone ivf/pq gates.
    from .gate import ANN_K, IVF_PROBE, PQ_CODES, PQ_SUBSPACES

    dsub = EMB_DIM // PQ_SUBSPACES
    return f"""WITH {_kmeans_ctes(0)},
adots AS (
  SELECT d.vec_id, d.cell, round(d.dot / knorm.norm, 6) AS dot FROM (
    SELECT e.vec_id, c.cell,
           SUM(CAST(e.embedding[CAST(c.pos AS INTEGER)+1] AS DOUBLE) * c.val) AS dot
    FROM embeddings e CROSS JOIN kcent c
    GROUP BY e.vec_id, c.cell
  ) d JOIN knorm USING (cell)
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM adots
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM adots WHERE vec_id < 10
  ) WHERE rn <= {IVF_PROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM cells c JOIN probes p USING (cell)
  WHERE c.vec_id != p.query_id
),
cb AS (
  SELECT CAST(r.i // {dsub} AS INTEGER) AS s, vec_id AS j,
         CAST(r.i AS INTEGER) AS pos,
         CAST(embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range({EMB_DIM}) r(i) WHERE vec_id < {PQ_CODES}
),
enc AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT d.vec_id, d.s, d.j,
           row_number() OVER (PARTITION BY d.vec_id, d.s
                              ORDER BY d.d2 ASC, d.j ASC) AS rn
    FROM (
      SELECT e.vec_id, c.s, c.j,
             round(SUM((CAST(e.embedding[c.pos+1] AS DOUBLE) - c.val)
                     * (CAST(e.embedding[c.pos+1] AS DOUBLE) - c.val)), 6) AS d2
      FROM embeddings e CROSS JOIN cb c
      GROUP BY e.vec_id, c.s, c.j
    ) d
  ) WHERE rn = 1
),
qt AS (
  SELECT q.vec_id AS query_id, c.s, c.j,
         CAST(round(round(SUM(CAST(q.embedding[c.pos+1] AS DOUBLE) * c.val), 6)
                    * 1000000) AS BIGINT) AS t_u
  FROM embeddings q CROSS JOIN cb c
  WHERE q.vec_id < 10
  GROUP BY q.vec_id, c.s, c.j
),
sc AS (
  SELECT cd.query_id, cd.neighbor_id, SUM(qt.t_u) AS score_u
  FROM cand cd
  JOIN enc ON enc.vec_id = cd.neighbor_id
  JOIN qt ON qt.query_id = cd.query_id AND qt.s = enc.s AND qt.j = enc.code
  GROUP BY 1, 2
),
rk AS (
  SELECT query_id, neighbor_id, score_u,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_u DESC, neighbor_id) AS rank
  FROM sc
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       CAST(score_u AS BIGINT) AS score_u
FROM rk WHERE rank <= {ANN_K}"""


def sql_ann_ivfpq_residual_topk():
    # Residual IVFPQ twin: codebooks are RESIDUALS of the seed vectors
    # (seed - its centroid), every vector encodes its own residual, and
    # score = round6(dot(q, centroid))·1e6 + Σ ADC table micros — both
    # integer terms, order-independent. All CTEs below are the verified
    # ivf/pq patterns plus a residual join through kcent.
    from .gate import ANN_K, IVF_PROBE, PQ_CODES, PQ_SUBSPACES

    dsub = EMB_DIM // PQ_SUBSPACES
    return f"""WITH {_kmeans_ctes(0)},
adots AS (
  SELECT d.vec_id, d.cell, round(d.dot / knorm.norm, 6) AS dot FROM (
    SELECT e.vec_id, c.cell,
           SUM(CAST(e.embedding[CAST(c.pos AS INTEGER)+1] AS DOUBLE) * c.val) AS dot
    FROM embeddings e CROSS JOIN kcent c
    GROUP BY e.vec_id, c.cell
  ) d JOIN knorm USING (cell)
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM adots
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM adots WHERE vec_id < 10
  ) WHERE rn <= {IVF_PROBE}
),
rcb AS (
  SELECT CAST(kc.pos // {dsub} AS INTEGER) AS s, e.vec_id AS j,
         CAST(kc.pos AS INTEGER) AS pos,
         CAST(e.embedding[CAST(kc.pos AS INTEGER)+1] AS DOUBLE) - kc.val AS val
  FROM embeddings e
  JOIN cells sc ON sc.vec_id = e.vec_id
  JOIN kcent kc ON kc.cell = sc.cell
  WHERE e.vec_id < {PQ_CODES}
),
res AS (
  SELECT e.vec_id, CAST(kc.pos AS INTEGER) AS pos,
         CAST(e.embedding[CAST(kc.pos AS INTEGER)+1] AS DOUBLE) - kc.val AS val
  FROM embeddings e
  JOIN cells c ON c.vec_id = e.vec_id
  JOIN kcent kc ON kc.cell = c.cell
),
enc AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT d.vec_id, d.s, d.j,
           row_number() OVER (PARTITION BY d.vec_id, d.s
                              ORDER BY d.d2 ASC, d.j ASC) AS rn
    FROM (
      SELECT rs.vec_id, rc.s, rc.j,
             round(SUM((rs.val - rc.val) * (rs.val - rc.val)), 6) AS d2
      FROM res rs JOIN rcb rc ON rc.pos = rs.pos
      GROUP BY rs.vec_id, rc.s, rc.j
    ) d
  ) WHERE rn = 1
),
qt AS (
  SELECT q.vec_id AS query_id, rc.s, rc.j,
         CAST(round(round(SUM(CAST(q.embedding[rc.pos+1] AS DOUBLE) * rc.val), 6)
                    * 1000000) AS BIGINT) AS t_u
  FROM embeddings q CROSS JOIN rcb rc
  WHERE q.vec_id < 10
  GROUP BY 1, 2, 3
),
qcd AS (
  SELECT q.vec_id AS query_id, kc.cell,
         CAST(round(round(SUM(CAST(q.embedding[CAST(kc.pos AS INTEGER)+1] AS DOUBLE)
                              * kc.val), 6) * 1000000) AS BIGINT) AS c_u
  FROM embeddings q CROSS JOIN kcent kc
  WHERE q.vec_id < 10
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id, c.cell
  FROM cells c JOIN probes p USING (cell)
  WHERE c.vec_id != p.query_id
),
sc AS (
  SELECT cd.query_id, cd.neighbor_id, MAX(qcd.c_u) + SUM(qt.t_u) AS score_u
  FROM cand cd
  JOIN qcd ON qcd.query_id = cd.query_id AND qcd.cell = cd.cell
  JOIN enc ON enc.vec_id = cd.neighbor_id
  JOIN qt ON qt.query_id = cd.query_id AND qt.s = enc.s AND qt.j = enc.code
  GROUP BY 1, 2
),
rk AS (
  SELECT query_id, neighbor_id, score_u,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_u DESC, neighbor_id) AS rank
  FROM sc
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       CAST(score_u AS BIGINT) AS score_u
FROM rk WHERE rank <= {ANN_K}"""


def sql_ann_lsh_topk():
    return f"""WITH {_UNROLL},
{_LSH_BANDS_CTE},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bb c JOIN bb q ON c.band = q.band AND c.bucket = q.bucket
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
),
dots AS (
  SELECT cd.query_id, cd.neighbor_id, q.norm AS qn, c.norm AS cn,
         SUM(CAST(c.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE) * CAST(q.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)) AS dot
  FROM cand cd
  JOIN u q ON q.vec_id = cd.query_id
  JOIN u c ON c.vec_id = cd.neighbor_id
  CROSS JOIN range({EMB_DIM}) r(i)
  GROUP BY 1, 2, 3, 4
),
rk AS (
  SELECT query_id, neighbor_id, round(dot / (qn * cn), 6) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY round(dot / (qn * cn), 6) DESC, neighbor_id) AS rank
  FROM dots
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
FROM rk WHERE rank <= {ANN_K}"""


def sql_ann_lsh_multiprobe_topk():
    # multi-probe twin: query probes = own bucket PLUS every Hamming-1
    # neighbor (xor one plane bit); corpus buckets unchanged
    return f"""WITH {_UNROLL},
{_LSH_BANDS_CTE},
qprobes AS (
  SELECT vec_id, band, bucket FROM bb WHERE vec_id < 10
  UNION
  SELECT vec_id, band,
         xor(bucket, CAST(1 << CAST(f.i AS INTEGER) AS BIGINT)) AS bucket
  FROM bb CROSS JOIN range({_BP}) f(i) WHERE vec_id < 10
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bb c JOIN qprobes q ON c.band = q.band AND c.bucket = q.bucket
  WHERE c.vec_id != q.vec_id
),
dots AS (
  SELECT cd.query_id, cd.neighbor_id, q.norm AS qn, c.norm AS cn,
         SUM(CAST(c.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE) * CAST(q.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)) AS dot
  FROM cand cd
  JOIN u q ON q.vec_id = cd.query_id
  JOIN u c ON c.vec_id = cd.neighbor_id
  CROSS JOIN range({EMB_DIM}) r(i)
  GROUP BY 1, 2, 3, 4
),
rk AS (
  SELECT query_id, neighbor_id, round(dot / (qn * cn), 6) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY round(dot / (qn * cn), 6) DESC, neighbor_id) AS rank
  FROM dots
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
FROM rk WHERE rank <= {ANN_K}"""


def sql_emb_near_dup_lsh():
    # bucket-occupancy cap mirrors _capped_band_pairs (see sql_dedup_minhash)
    from .functions.dedup import DEFAULT_MAX_BUCKET

    return f"""WITH {_UNROLL},
{_LSH_BANDS_CTE},
bocc AS (
  SELECT band, bucket, COUNT(*) AS occ, MIN(vec_id) AS hub
  FROM bb GROUP BY 1, 2
),
bbx AS (
  SELECT b.vec_id, b.band, b.bucket, o.occ, o.hub
  FROM bb b JOIN bocc o ON b.band = o.band AND b.bucket = o.bucket
),
cand AS (
  SELECT DISTINCT vec_a, vec_b FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bbx a JOIN bbx b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE a.occ <= {DEFAULT_MAX_BUCKET}
    UNION ALL
    SELECT hub AS vec_a, vec_id AS vec_b FROM bbx
    WHERE occ > {DEFAULT_MAX_BUCKET} AND vec_id <> hub
  )
),
dots AS (
  SELECT c.vec_a, c.vec_b, ea.norm AS na, eb.norm AS nb,
         SUM(CAST(ea.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE) * CAST(eb.embedding[CAST(r.i AS INTEGER)+1] AS DOUBLE)) AS dot
  FROM cand c
  JOIN u ea ON ea.vec_id = c.vec_a
  JOIN u eb ON eb.vec_id = c.vec_b
  CROSS JOIN range({EMB_DIM}) r(i)
  GROUP BY 1, 2, 3, 4
)
SELECT vec_a, vec_b, round(dot / (na * nb), 6) AS cosine
FROM dots WHERE round(dot / (na * nb), 6) >= {NEAR_DUP_COS}"""


def _sql_ahash_cte(table: str = "documents") -> str:
    """(doc_id, h_hi, h_lo) aHash table from the synthetic pixel
    formula — mirrors functions/multimodal.image_ahash (8×8 nearest
    sample, integer mean threshold 64·p > Σp, two 32-bit halves).
    ``table`` re-parameterizes the source for composed-pipeline twins
    (r15 multimodal_pipeline_battery)."""
    from .functions.multimodal import (
        AHASH_SIZE,
        H_BASE,
        H_MOD,
        PIX_A,
        PIX_MOD,
        PIX_X,
        PIX_Y,
        W_BASE,
        W_MOD,
    )

    s8 = AHASH_SIZE
    return f"""dims AS (
  SELECT doc_id, {H_BASE} + doc_id % {H_MOD} AS h, {W_BASE} + doc_id % {W_MOD} AS w
  FROM {table}
),
samp AS (
  SELECT doc_id, g.i AS i,
         (doc_id * {PIX_A}
          + (((g.i // {s8}) * h) // {s8}) * {PIX_Y}
          + (((g.i % {s8}) * w) // {s8}) * {PIX_X}) % {PIX_MOD} AS p
  FROM dims CROSS JOIN range({s8 * s8}) g(i)
),
tot AS (SELECT doc_id, SUM(p) AS s FROM samp GROUP BY 1),
bits AS (
  SELECT samp.doc_id, samp.i,
         CASE WHEN samp.p * {s8 * s8} > tot.s THEN 1 ELSE 0 END AS b
  FROM samp JOIN tot ON tot.doc_id = samp.doc_id
),
ah AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN i < 32 THEN b * power(2, 31 - i) ELSE 0 END) AS BIGINT) AS h_hi,
         CAST(SUM(CASE WHEN i >= 32 THEN b * power(2, 63 - i) ELSE 0 END) AS BIGINT) AS h_lo
  FROM bits GROUP BY 1
)"""


def sql_multimodal_ahash():
    return f"WITH {_sql_ahash_cte()}\nSELECT doc_id, h_hi, h_lo FROM ah"


def sql_multimodal_image_dedup():
    # banding + occupancy cap mirror functions/multimodal.image_near_dup
    # (same shape as sql_emb_near_dup_lsh); threshold 1 < n_bands means
    # the banded candidates are complete, so this is an exact-pairs
    # comparison
    from .functions.dedup import DEFAULT_MAX_BUCKET

    return f"""WITH {_sql_ahash_cte()},
bb AS (
  SELECT doc_id, b.i AS band,
         CASE b.i
           WHEN 0 THEN h_hi // 65536
           WHEN 1 THEN h_hi % 65536
           WHEN 2 THEN h_lo // 65536
           ELSE h_lo % 65536
         END AS bucket
  FROM ah CROSS JOIN range(4) b(i)
),
bocc AS (
  SELECT band, bucket, COUNT(*) AS occ, MIN(doc_id) AS hub
  FROM bb GROUP BY 1, 2
),
bbx AS (
  SELECT b.doc_id, b.band, b.bucket, o.occ, o.hub
  FROM bb b JOIN bocc o ON b.band = o.band AND b.bucket = o.bucket
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bbx a JOIN bbx b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE a.occ <= {DEFAULT_MAX_BUCKET}
    UNION ALL
    SELECT hub AS doc_a, doc_id AS doc_b FROM bbx
    WHERE occ > {DEFAULT_MAX_BUCKET} AND doc_id <> hub
  )
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(ha.h_hi, hb.h_hi)) + bit_count(xor(ha.h_lo, hb.h_lo)) AS BIGINT) AS dist
FROM cand c
JOIN ah ha ON ha.doc_id = c.doc_a
JOIN ah hb ON hb.doc_id = c.doc_b
WHERE bit_count(xor(ha.h_hi, hb.h_hi)) + bit_count(xor(ha.h_lo, hb.h_lo)) <= 1"""


def sql_multimodal_dedup_verdict():
    from .functions.multimodal import (
        AUD_A,
        AUD_FP_FRAMES,
        AUD_I,
        AUD_LEN_BASE,
        AUD_LEN_MOD,
        AUD_MOD,
    )

    k = AUD_FP_FRAMES
    max_n = AUD_LEN_BASE + AUD_LEN_MOD - 1
    return f"""WITH {_sql_ahash_cte()},
tkey AS (SELECT doc_id, md5({NORM.format(c='text')}) AS ck FROM documents),
trep AS (SELECT ck, MIN(doc_id) AS rep FROM tkey GROUP BY 1),
tdup AS (SELECT t.doc_id, t.doc_id <> r.rep AS text_dup FROM tkey t JOIN trep r USING (ck)),
arep AS (SELECT h_hi, h_lo, MIN(doc_id) AS rep FROM ah GROUP BY 1, 2),
adup AS (SELECT a.doc_id, a.doc_id <> r.rep AS image_dup
         FROM ah a JOIN arep r ON a.h_hi = r.h_hi AND a.h_lo = r.h_lo),
adims AS (SELECT doc_id, {AUD_LEN_BASE} + doc_id % {AUD_LEN_MOD} AS n FROM documents),
asmp AS (
  SELECT doc_id, n, (r.i * {k}) // n AS f,
         (doc_id * {AUD_A} + r.i * {AUD_I}) % {AUD_MOD} AS w
  FROM adims CROSS JOIN range({max_n}) r(i) WHERE r.i < n
),
aen AS (SELECT doc_id, f, SUM(w * w) AS energy FROM asmp GROUP BY 1, 2),
abits AS (
  SELECT doc_id, f,
         CASE WHEN energy > lag(energy) OVER (PARTITION BY doc_id ORDER BY f)
              THEN 1 ELSE 0 END AS b
  FROM aen
),
afps AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN f >= 1 THEN b * power(2, {k} - 1 - f) ELSE 0 END) AS BIGINT) AS fp
  FROM abits GROUP BY 1
),
frep AS (SELECT fp, MIN(doc_id) AS rep FROM afps GROUP BY 1),
fdup AS (SELECT a.doc_id, a.doc_id <> r.rep AS audio_dup FROM afps a JOIN frep r USING (fp))
SELECT d.doc_id,
       CASE WHEN tdup.text_dup THEN 'text_dup'
            WHEN adup.image_dup THEN 'image_dup'
            WHEN fdup.audio_dup THEN 'audio_dup'
            ELSE 'unique' END AS reason,
       CASE WHEN tdup.text_dup OR adup.image_dup OR fdup.audio_dup
            THEN 'no' ELSE 'yes' END AS keep
FROM documents d
JOIN tdup ON tdup.doc_id = d.doc_id
JOIN adup ON adup.doc_id = d.doc_id
JOIN fdup ON fdup.doc_id = d.doc_id"""


def sql_multimodal_video_clips():
    from .functions.multimodal import (
        FRAME_H,
        FRAME_W,
        N_FRAMES_BASE,
        N_FRAMES_MOD,
        VID_A,
        VID_CLIP_W,
        VID_F,
        VID_MOD,
        VID_TOKEN_BASE,
        VID_TOKEN_MOD,
        VID_X,
        VID_Y,
        video_frame_tokens,  # noqa: F401  (parity anchor)
    )

    fb = FRAME_H * FRAME_W
    # power-mod coefficients: 263^(fb-1-i) mod 2^31 — the iterative
    # pixel fold mod 2^31 equals this polynomial because mod
    # distributes over the fold
    coef = [pow(VID_TOKEN_BASE, fb - 1 - i, VID_TOKEN_MOD) for i in range(fb)]
    px = (
        f"(doc_id * {VID_A} + fr.f * {VID_F} + (p.i // {FRAME_W}) * {VID_Y}"
        f" + (p.i % {FRAME_W}) * {VID_X}) % {VID_MOD}"
    )
    coef_case = "CASE p.i " + " ".join(
        f"WHEN {i} THEN {c}" for i, c in enumerate(coef)
    ) + " END"
    w = VID_CLIP_W
    gram = "array_to_string(toks[i:i+" + str(w - 1) + "], ' ')"
    return f"""WITH dims AS (
  SELECT doc_id, {N_FRAMES_BASE} + doc_id % {N_FRAMES_MOD} AS nf FROM documents
),
tok AS (
  SELECT doc_id, fr.f AS f,
         CAST(SUM(({px}) * ({coef_case})) % {VID_TOKEN_MOD} AS BIGINT) AS token
  FROM dims
  CROSS JOIN range({N_FRAMES_BASE + N_FRAMES_MOD - 1}) fr(f)
  CROSS JOIN range({fb}) p(i)
  WHERE fr.f < nf
  GROUP BY 1, 2
),
arrs AS (
  SELECT doc_id, list(CAST(token AS VARCHAR) ORDER BY f) AS toks FROM tok GROUP BY 1
),
og AS (
  SELECT doc_id, i - 1 AS pos, {H64.format(s=gram)} AS gh
  FROM arrs, unnest(generate_series(1, len(toks) - {w} + 1)) AS u(i)
),
r AS (
  SELECT doc_id, pos, gh,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY gh) AS n_occ,
         MIN(doc_id) OVER (PARTITION BY gh) AS _d0
  FROM og
),
wit AS (
  SELECT gh, doc_id AS rep_doc, CAST(pos AS BIGINT) AS rep_pos FROM r WHERE rn = 1
)
SELECT r.doc_id, CAST(r.pos AS BIGINT) AS pos, r.gh,
       CAST(r.n_occ AS BIGINT) AS n_occ, w.rep_doc, w.rep_pos,
       (r.doc_id = w.rep_doc AND r.pos = w.rep_pos) AS is_canonical
FROM r JOIN wit w ON w.gh = r.gh
WHERE r.n_occ >= 2"""


def sql_multimodal_audio_dedup():
    from .functions.multimodal import (
        AUD_A,
        AUD_FP_FRAMES,
        AUD_I,
        AUD_LEN_BASE,
        AUD_LEN_MOD,
        AUD_MOD,
    )

    k = AUD_FP_FRAMES
    max_n = AUD_LEN_BASE + AUD_LEN_MOD - 1
    return f"""WITH dims AS (
  SELECT doc_id, {AUD_LEN_BASE} + doc_id % {AUD_LEN_MOD} AS n FROM documents
),
s AS (
  SELECT doc_id, n, (r.i * {k}) // n AS f,
         (doc_id * {AUD_A} + r.i * {AUD_I}) % {AUD_MOD} AS w
  FROM dims CROSS JOIN range({max_n}) r(i)
  WHERE r.i < n
),
e AS (SELECT doc_id, f, SUM(w * w) AS energy FROM s GROUP BY 1, 2),
bits AS (
  SELECT doc_id, f,
         CASE WHEN energy > lag(energy) OVER (PARTITION BY doc_id ORDER BY f)
              THEN 1 ELSE 0 END AS b
  FROM e
),
fps AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN f >= 1 THEN b * power(2, {k} - 1 - f) ELSE 0 END) AS BIGINT) AS fp
  FROM bits GROUP BY 1
)
SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS representative
FROM fps GROUP BY 1"""


def sql_events_sliding_distinct():
    """Trailing-window HLL merge mirror of sliding_distinct_users:
    hourly registers, bounded fan-out to contributing output hours,
    max-merge, same estimate formula as sql_sketch_hll_distinct."""
    from .functions.sketch import _HLL_REM_BITS, HLL_ALPHA, HLL_M

    m, rb = HLL_M, _HLL_REM_BITS
    h = H64.format(s="CAST(user_id AS VARCHAR)")
    w = 24
    return f"""WITH e AS (
  SELECT epoch_ns(ts) // 3600000000000 AS hr, {h} AS h FROM events
),
hashed AS (SELECT hr, h % {m} AS b, h // {m} AS rem FROM e),
regs AS (
  SELECT hr, b,
         MAX(CASE WHEN rem = 0 THEN {rb + 1}
                  ELSE {rb + 1} - length(bin(rem)) END) AS reg
  FROM hashed GROUP BY 1, 2
),
hours AS (SELECT DISTINCT hr FROM regs),
fanned AS (
  SELECT u.oh AS out_hr, r.b, r.reg
  FROM regs r, unnest(generate_series(r.hr, r.hr + {w - 1})) AS u(oh)
  WHERE u.oh IN (SELECT hr FROM hours)
),
merged AS (SELECT out_hr, b, MAX(reg) AS reg FROM fanned GROUP BY 1, 2),
agg AS (
  SELECT out_hr, COUNT(*) AS n_nonempty,
         SUM(power(2.0, -reg)) AS s_ne,
         CAST(SUM((b + 1) * reg) AS BIGINT) AS reg_checksum
  FROM merged GROUP BY 1
)
SELECT CAST(out_hr * 3600 AS BIGINT) AS hour_epoch,
       CAST(n_nonempty AS BIGINT) AS n_nonempty,
       reg_checksum,
       round(CASE WHEN {HLL_ALPHA * m * m} / (s_ne + ({m} - n_nonempty)) <= {2.5 * m}
                   AND n_nonempty < {m}
             THEN {float(m)} * ln({float(m)} / ({m} - n_nonempty))
             ELSE {HLL_ALPHA * m * m} / (s_ne + ({m} - n_nonempty)) END, 6) AS est
FROM agg"""


def sql_multimodal_features():
    from .functions.multimodal import H_BASE, H_MOD, PIX_A, PIX_MOD, PIX_X, PIX_Y, W_BASE, W_MOD

    max_px = (W_BASE + W_MOD - 1) * (H_BASE + H_MOD - 1)
    return f"""WITH dims AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         {H_BASE} + doc_id % {H_MOD} AS h,
         {W_BASE} + doc_id % {W_MOD} AS w
  FROM documents
),
px AS (
  SELECT doc_id, n_chars, h, w,
         SUM((doc_id * {PIX_A} + (i // w) * {PIX_Y} + (i % w) * {PIX_X}) % {PIX_MOD}) AS s
  FROM dims CROSS JOIN range({max_px}) r(i)
  WHERE i < h * w
  GROUP BY 1, 2, 3, 4
)
SELECT doc_id, n_chars, CAST(h AS BIGINT) AS img_h, CAST(w AS BIGINT) AS img_w,
       CAST(h * w AS BIGINT) AS n_px,
       round(CAST(s AS DOUBLE) / (h * w), 6) AS px_mean
FROM px"""


def sql_multimodal_resize():
    from .functions.multimodal import H_BASE, H_MOD, PIX_A, PIX_MOD, PIX_X, PIX_Y, W_BASE, W_MOD

    return f"""WITH dims AS (
  SELECT doc_id, {H_BASE} + doc_id % {H_MOD} AS h, {W_BASE} + doc_id % {W_MOD} AS w
  FROM documents
)
SELECT doc_id, CAST(yy.i AS BIGINT) AS y, CAST(xx.i AS BIGINT) AS x,
       CAST((doc_id * {PIX_A} + ((yy.i * h) // 4) * {PIX_Y} + ((xx.i * w) // 4) * {PIX_X}) % {PIX_MOD} AS BIGINT) AS v
FROM dims CROSS JOIN range(4) yy(i) CROSS JOIN range(4) xx(i)"""


def sql_multimodal_augment():
    from .functions.multimodal import (
        AUG_CROP_H,
        AUG_CROP_W,
        H_BASE,
        H_MOD,
        PIX_A,
        PIX_MOD,
        PIX_X,
        PIX_Y,
        W_BASE,
        W_MOD,
    )

    hv = H64.format(s="concat('aug:', CAST(doc_id AS VARCHAR))")
    ch, cw = AUG_CROP_H, AUG_CROP_W
    return f"""WITH dims AS (
  SELECT doc_id,
         {H_BASE} + doc_id % {H_MOD} AS h,
         {W_BASE} + doc_id % {W_MOD} AS w,
         ({hv}) AS hv
  FROM documents
),
par AS (
  SELECT doc_id, h, w, hv % 2 AS flip,
         (hv // 2) % (h - {ch} + 1) AS oy,
         (hv // 8) % (w - {cw} + 1) AS ox
  FROM dims
)
SELECT doc_id, CAST(yy.i AS BIGINT) AS y, CAST(xx.i AS BIGINT) AS x,
       CAST((doc_id * {PIX_A} + (oy + yy.i) * {PIX_Y}
             + (CASE WHEN flip = 1 THEN w - 1 - (ox + xx.i) ELSE ox + xx.i END) * {PIX_X})
            % {PIX_MOD} AS BIGINT) AS v
FROM par CROSS JOIN range({ch}) yy(i) CROSS JOIN range({cw}) xx(i)"""


def sql_multimodal_frame_sample():
    from .functions.multimodal import (
        FRAME_H,
        FRAME_W,
        N_FRAMES_BASE,
        N_FRAMES_MOD,
        VID_A,
        VID_F,
        VID_MOD,
        VID_X,
        VID_Y,
    )

    max_f = N_FRAMES_BASE + N_FRAMES_MOD - 1
    return f"""WITH vids AS (
  SELECT doc_id, {N_FRAMES_BASE} + doc_id % {N_FRAMES_MOD} AS nf FROM documents
),
frames AS (
  SELECT doc_id, f.i AS frame, nf FROM vids CROSS JOIN range({max_f}) f(i)
  WHERE f.i < nf AND f.i % 2 = 0
)
SELECT doc_id, CAST(frame AS BIGINT) AS frame,
       CAST(SUM((doc_id * {VID_A} + frame * {VID_F} + (p.i // {FRAME_W}) * {VID_Y} + (p.i % {FRAME_W}) * {VID_X}) % {VID_MOD}) AS BIGINT) AS px_sum
FROM frames CROSS JOIN range({FRAME_H * FRAME_W}) p(i)
GROUP BY doc_id, frame"""


def sql_multimodal_audio():
    from .functions.multimodal import (
        AUD_A, AUD_I, AUD_LEN_BASE, AUD_LEN_MOD, AUD_MOD, AUD_RATE,
    )

    max_n = AUD_LEN_BASE + AUD_LEN_MOD - 1
    return f"""WITH auds AS (
  SELECT doc_id, {AUD_LEN_BASE} + doc_id % {AUD_LEN_MOD} AS n FROM documents
)
SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
       CAST({AUD_RATE} AS BIGINT) AS sample_rate,
       CAST(SUM(((doc_id * {AUD_A} + s.i * {AUD_I}) % {AUD_MOD}) * ((doc_id * {AUD_A} + s.i * {AUD_I}) % {AUD_MOD})) AS BIGINT) AS sq_sum
FROM auds CROSS JOIN range({max_n}) s(i)
WHERE s.i < n
GROUP BY doc_id, n"""


def sql_sketch_kmv_distinct():
    h = H64.format(s="text")
    return f"""WITH hs AS (SELECT DISTINCT {h} AS h FROM documents),
topk AS (SELECT h FROM hs ORDER BY h LIMIT 64),
agg AS (SELECT COUNT(*) AS k_used, MAX(h) AS kth_hash FROM topk)
SELECT CAST(k_used AS BIGINT) AS k_used, kth_hash,
       round(CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
                  ELSE (k_used - 1) * CAST({1 << 60} AS DOUBLE) / kth_hash END, 6) AS est
FROM agg"""


def sql_sketch_count_min():
    depth, width = 4, 256
    h = lambda r: H64.format(s=f"concat('{r}:', CAST(event_type AS VARCHAR))")
    cells = " UNION ALL ".join(
        f"SELECT {r} AS row, {h(r)} % {width} AS bucket FROM events" for r in range(depth)
    )
    probes = " UNION ALL ".join(
        f"SELECT value, exact_n, {r} AS row, "
        + H64.format(s=f"concat('{r}:', value)")
        + f" % {width} AS bucket FROM vals"
        for r in range(depth)
    )
    return f"""WITH cm AS (
  SELECT row, bucket, COUNT(*) AS cnt FROM ({cells}) GROUP BY 1, 2
),
vals AS (
  SELECT CAST(event_type AS VARCHAR) AS value, COUNT(*) AS exact_n
  FROM events GROUP BY 1
),
probes AS ({probes})
SELECT p.value, CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(MIN(cm.cnt) AS BIGINT) AS cm_est
FROM probes p JOIN cm ON cm.row = p.row AND cm.bucket = p.bucket
GROUP BY 1, 2"""


def sql_events_rollup():
    """Twin of gate.q_events_rollup: DuckDB ROLLUP with GROUPING()
    (bit order MSB=first key matches Spark grouping_id — verified on a
    hand fixture), same exact-decimal money summation."""
    return """SELECT COALESCE(event_type, '<all>') AS event_type,
       CAST(COALESCE(day_epoch, -1) AS BIGINT) AS day_epoch,
       CAST(GROUPING(event_type, day_epoch) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (
  SELECT event_type,
         CAST(epoch_ns(ts) // 86400000000000 * 86400 AS BIGINT) AS day_epoch,
         value
  FROM events
)
GROUP BY ROLLUP(event_type, day_epoch)"""


def sql_events_hourly():
    return """SELECT CAST(epoch_ns(ts) // 3600000000000 * 3600 AS BIGINT) AS hour_epoch, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2"""


def sql_events_sessionize():
    return """WITH e AS (SELECT user_id, epoch_ns(ts) AS ns FROM events),
g AS (
  SELECT user_id,
         CASE WHEN lag(ns) OVER w IS NULL
                OR ns - lag(ns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ns)
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM g GROUP BY 1"""


def sql_events_session_window():
    # session windows by 30-min gap: session id = running sum of gap
    # breaks; start = first event, end = last event + gap (Spark
    # session_window semantics). µs integer arithmetic throughout.
    return """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
g AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT user_id,
       CAST(MIN(us) AS BIGINT) AS start_us,
       CAST(MAX(us) + 1800000000 AS BIGINT) AS end_us,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid"""


def sql_tpch_q1():
    return f"""SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{TPCH_Q1_CUTOFF}'
GROUP BY 1, 2"""


def sql_tpch_q3():
    return f"""SELECT o_orderkey, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY 1, 2
ORDER BY revenue DESC, o_orderkey
LIMIT 10"""


def sql_tpch_q6():
    from .gate import Q6_HI, Q6_LO

    return f"""SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_LO}' AND l_shipdate < TIMESTAMP '{Q6_HI}'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24"""


def sql_tpch_q4():
    from .gate import Q10_HI, Q10_LO

    return f"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q10_LO}' AND o.o_orderdate < TIMESTAMP '{Q10_HI}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY 1"""


def sql_tpch_q14():
    from .gate import Q14_HI, Q14_LO

    return f"""WITH j AS (
  SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev, p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_LO}' AND l_shipdate < TIMESTAMP '{Q14_HI}'
),
a AS (
  SELECT SUM(CASE WHEN p_type = 'PROMO' THEN rev END) AS p, SUM(rev) AS t FROM j
)
SELECT CAST(p AS DOUBLE) AS promo_revenue, CAST(t AS DOUBLE) AS total_revenue,
       round(100.0 * CAST(p AS DOUBLE) / CAST(t AS DOUBLE), 6) AS promo_pct
FROM a"""


def sql_tpch_q19():
    return """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""


def sql_tpch_q7():
    from .gate import Q7_HI, Q7_LO, Q7_NATIONS

    a, b = Q7_NATIONS
    return f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_LO}' AND l_shipdate < TIMESTAMP '{Q7_HI}'
  AND ((n1.n_name = '{a}' AND n2.n_name = '{b}')
    OR (n1.n_name = '{b}' AND n2.n_name = '{a}'))
GROUP BY 1, 2, 3"""


def sql_tpch_q8():
    from .gate import Q8_HI, Q8_LO, Q8_NATION, Q8_REGION, Q8_TYPE

    return f"""WITH allv AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE p.p_type = '{Q8_TYPE}' AND r.r_name = '{Q8_REGION}'
    AND o_orderdate >= TIMESTAMP '{Q8_LO}' AND o_orderdate < TIMESTAMP '{Q8_HI}'
)
SELECT o_year,
       round(CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END)
                  / SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM allv GROUP BY 1"""


def sql_tpch_q9():
    from .gate import Q9_NAME_FRAG

    return f"""SELECT n.n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%{Q9_NAME_FRAG}%'
GROUP BY 1, 2"""


def sql_tpch_q13():
    from .gate import Q13_EXCL_PRIORITY

    return f"""WITH pc AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN (SELECT * FROM orders WHERE o_orderpriority <> '{Q13_EXCL_PRIORITY}') o
    ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM pc GROUP BY 1"""


def sql_tpch_q15():
    from .gate import Q15_HI, Q15_LO

    return f"""WITH pr AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}' AND l_shipdate < TIMESTAMP '{Q15_HI}'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name,
       round(CAST(total_rev AS DOUBLE), 6) AS total_revenue
FROM pr JOIN supplier s ON pr.l_suppkey = s.s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM pr)"""


def sql_tpch_q18():
    from .gate import Q18_MIN_QTY

    return f"""WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > {Q18_MIN_QTY}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 6) AS o_totalprice,
       round(sum_qty, 6) AS sum_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey"""


def sql_tpch_q2():
    from .gate import Q2_REGION, Q2_SIZE

    return f"""WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(round(l_extendedprice / l_quantity, 6)) AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
elig AS (
  SELECT s_suppkey, s_name FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{Q2_REGION}'
),
pc AS (
  SELECT p.p_partkey, e.s_suppkey, e.s_name, c.unit_cost
  FROM cost c
  JOIN elig e ON c.l_suppkey = e.s_suppkey
  JOIN part p ON c.l_partkey = p.p_partkey
  WHERE p.p_size = {Q2_SIZE}
),
mc AS (SELECT p_partkey, MIN(unit_cost) AS min_cost FROM pc GROUP BY 1)
SELECT pc.p_partkey, pc.s_suppkey, pc.s_name, mc.min_cost
FROM pc JOIN mc ON pc.p_partkey = mc.p_partkey AND pc.unit_cost = mc.min_cost"""


def sql_tpch_q11():
    from .gate import Q11_FRAC_INV, Q11_NATION

    return f"""WITH v AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = '{Q11_NATION}'
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, round(CAST(value AS DOUBLE), 6) AS value
FROM v WHERE value * {Q11_FRAC_INV} > (SELECT SUM(value) FROM v)"""


def sql_tpch_q12():
    from .gate import Q12_HI, Q12_LATE_DAYS, Q12_LO

    return f"""SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_LO}' AND l_shipdate < TIMESTAMP '{Q12_HI}'
  AND l_shipdate >= o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY 1"""


def sql_tpch_q16():
    from .gate import Q16_EXCL_BRAND, Q16_SIZES

    sizes = ", ".join(str(s) for s in Q16_SIZES)
    return f"""WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM rel
JOIN part p ON rel.l_partkey = p.p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_size IN ({sizes})
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3"""


def sql_tpch_q20():
    from .gate import Q20_HI, Q20_LO, Q20_NAME_FRAG

    return f"""WITH sh AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%{Q20_NAME_FRAG}%'
    AND l_shipdate >= TIMESTAMP '{Q20_LO}' AND l_shipdate < TIMESTAMP '{Q20_HI}'
  GROUP BY 1, 2
),
tot AS (SELECT l_partkey, SUM(q) AS t FROM sh GROUP BY 1),
dom AS (
  SELECT DISTINCT l_suppkey FROM sh JOIN tot USING (l_partkey) WHERE q * 2 > t
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM dom)"""


def sql_tpch_q17():
    # decorrelated form written out (per-part agg joined back) — the
    # threshold compare is the integer-exact qty*5*cnt < sum rewrite of
    # qty < 0.2*avg (l_quantity is integral, sums stay under 2^53)
    from .gate import Q17_BRAND, Q17_MAX_SIZE

    return f"""WITH pf AS (
  SELECT p_partkey FROM part
  WHERE p_brand = '{Q17_BRAND}' AND p_size <= {Q17_MAX_SIZE}
),
lf AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN pf ON pf.p_partkey = l.l_partkey
),
t AS (
  SELECT l_partkey, SUM(l_quantity) AS sq, COUNT(*) AS cq FROM lf GROUP BY 1
)
SELECT round(CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,6))),
                           CAST(0 AS DECIMAL(18,6))) / 7.0 AS DOUBLE), 6)
         AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small_lines
FROM lf JOIN t USING (l_partkey)
WHERE l_quantity * 5 * cq < sq"""


def sql_tpch_q21():
    from .gate import Q21_LATE_DAYS, Q21_NATIONS

    nations = ", ".join(f"'{n}'" for n in Q21_NATIONS)
    return f"""WITH lf AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lf l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name IN ({nations})
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lf l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lf l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10"""


def sql_tpch_q22():
    from .gate import Q22_CUTOFF, Q22_SEGMENTS

    segs = ", ".join(str(s) for s in Q22_SEGMENTS)
    return f"""WITH seg AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
  WHERE c_nationkey IN ({segs})
),
thr AS (SELECT round(AVG(c_acctbal), 6) AS a FROM seg WHERE c_acctbal > 0.0)
SELECT c_nationkey AS cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM seg, thr
WHERE c_acctbal > thr.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = seg.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
GROUP BY 1"""


def sql_tpch_q10():
    from .gate import Q10_HI, Q10_LO

    return f"""SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{Q10_LO}' AND o_orderdate < TIMESTAMP '{Q10_HI}'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20"""


def sql_tpch_q5():
    return f"""SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_LO}'
  AND o_orderdate < TIMESTAMP '{Q5_HI}'
GROUP BY 1"""


_WELLS_CTE = """wells AS (
  SELECT 'plate0' AS plate_id,
         CAST(i//12 AS BIGINT) AS row_index,
         CAST(i%12 AS BIGINT) AS col_index,
         chr(65 + CAST(i//12 AS INTEGER)) AS row_name,
         CAST(i%12 + 1 AS VARCHAR) AS col_name
  FROM range(96) r(i)
),
wells2 AS (SELECT *, row_name || '/' || col_name AS well_path FROM wells)"""

_IMAGES_CTE = """imgs AS (
  SELECT 'plate0' AS plate_id,
         CAST((i//2)//12 AS BIGINT) AS row_index,
         CAST((i//2)%12 AS BIGINT) AS col_index,
         CAST((i//2)%1 AS BIGINT) AS acquisition_id,
         CAST(i%2 AS BIGINT) AS field_index
  FROM range(192) r(i)
),
imgs2 AS (
  SELECT *,
         chr(65 + CAST(row_index AS INTEGER)) || '/' || CAST(col_index + 1 AS VARCHAR) AS well_path
  FROM imgs
),
imgs3 AS (
  SELECT *, well_path || '/' || CAST(field_index AS VARCHAR) AS image_path FROM imgs2
)"""


def sql_j3_well_catalog():
    return f"""WITH {_WELLS_CTE},
{_IMAGES_CTE}
SELECT i.plate_id, i.well_path, w.row_name, w.col_name,
       i.acquisition_id, i.field_index, i.image_path
FROM imgs3 i JOIN wells2 w ON i.plate_id = w.plate_id AND i.well_path = w.well_path"""


def sql_f7_well_lookup():
    return f"""WITH {_WELLS_CTE}
SELECT plate_id, row_index, col_index, row_name, col_name, well_path
FROM wells2 WHERE row_name = 'D' AND col_name = '7'"""


def sql_s18_hcs_store_read():
    # expected catalog of the gate's 3 written fields (A/1 f0, A/1 f1,
    # B/2 f0) joined with the plate grid
    return """SELECT * FROM (VALUES
  ('A/1', 'A', '1', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'A/1/0'),
  ('A/1', 'A', '1', CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'A/1/1'),
  ('B/2', 'B', '2', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'B/2/0')
) t(well_path, row_name, col_name, acquisition_id, field_index, image_path)"""


def sql_multimodal_resize_packed():
    """Digest form of the packed-array resize: count / sum /
    position-weighted sum per document over the same per-pixel mapping
    (row-major position = y*4 + x, 1-based — matches the Spark side's
    zip_with(pixels, sequence(1, n)))."""
    return f"""SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(SUM(v * (y * 4 + x + 1)) AS BIGINT) AS px_wsum
FROM ({sql_multimodal_resize()})
GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# Battery oracles (r4 driver-slot consolidation): tagged unions / joins
# of the single-operator oracles, mirroring gate.py's battery gates.


def _tagged_union_sql(parts: dict[str, str], cols: str) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT '{name}' AS gate, {cols} FROM ({sql})" for name, sql in parts.items()
    )


def sql_slicing_battery():
    return _tagged_union_sql(
        {
            "f1": sql_f1_level_pick(),
            "f2": sql_f2_roi(),
            "f3_f4": sql_f3_f4_tc_select(),
            "f5": sql_f5_transpose(),
        },
        "t, c, z, y, x, v",
    )


def sql_downsample_battery():
    return _tagged_union_sql(
        {
            "a2": sql_a2_bin_shrink(),
            "a7": sql_a7_nearest(),
            "a8": sql_a8_mode(),
            "a8c": sql_a8_mode_centered(),
            "a3": sql_a3_label_downsample(),
        },
        "t, c, z, y, x, CAST(v AS DOUBLE) AS v",
    )


def sql_gaussian_battery():
    return _tagged_union_sql(
        {"a1": sql_a1_gaussian(), "a4": sql_a4_itk_gaussian()},
        "t, c, z, y, x, v",
    )


def sql_s2_http_read():
    # the golden store holds the standard pixel formula at (z=5, y=9,
    # x=8); zstd+sharded zarr is lossless, so the formula is exact
    z, y, x = 5, 9, 8
    return f"""SELECT CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS c,
       CAST(i // {y * x} AS BIGINT) AS z,
       CAST((i // {x}) % {y} AS BIGINT) AS y,
       CAST(i % {x} AS BIGINT) AS x,
       CAST(((i // {y * x}) * 73 + ((i // {x}) % {y}) * 179 + (i % {x}) * 283) % 251 AS BIGINT) AS v
FROM range({z * y * x}) r(i)"""


def sql_sketch_hll_distinct():
    from .functions.sketch import HLL_ALPHA, HLL_M

    m = HLL_M
    am2 = repr(HLL_ALPHA * m * m)
    h = H64.format(s="CAST(event_id AS VARCHAR)")
    return f"""WITH h AS (SELECT ({h}) AS h FROM events),
b AS (SELECT h % {m} AS b, h // {m} AS rem FROM h),
r AS (SELECT b, CASE WHEN rem = 0 THEN 55 ELSE 55 - length(bin(rem)) END AS rank FROM b),
regs AS (SELECT b, MAX(rank) AS reg FROM r GROUP BY 1),
agg AS (SELECT COUNT(*) AS ne, SUM(power(2.0, -reg)) AS s_ne,
               CAST(SUM((b + 1) * reg) AS BIGINT) AS reg_checksum FROM regs)
SELECT CAST({m} AS BIGINT) AS m, CAST(ne AS BIGINT) AS n_nonempty, reg_checksum,
       round(CASE WHEN {am2} / (s_ne + ({m} - ne)) <= {2.5 * m}
                       AND {m} - ne > 0
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - ne))
                  ELSE {am2} / (s_ne + ({m} - ne)) END, 6) AS est
FROM agg"""


def sql_events_funnel():
    return """WITH e AS (
  SELECT user_id AS u, event_type AS et, CAST(epoch_ns(ts) AS BIGINT) AS ts FROM events
),
s0 AS (SELECT u, MIN(ts) AS done FROM e WHERE et = 'view' GROUP BY 1),
s1 AS (SELECT e.u, MIN(e.ts) AS done FROM e JOIN s0 ON s0.u = e.u
       WHERE e.et = 'click' AND e.ts >= s0.done GROUP BY 1),
s2 AS (SELECT e.u, MIN(e.ts) AS done FROM e JOIN s1 ON s1.u = e.u
       WHERE e.et = 'purchase' AND e.ts >= s1.done GROUP BY 1)
SELECT CAST(0 AS BIGINT) AS step_index, 'view' AS step,
       CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_users
UNION ALL
SELECT CAST(1 AS BIGINT), 'click', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
UNION ALL
SELECT CAST(2 AS BIGINT), 'purchase', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)"""


def sql_events_cohort_retention():
    week_ns = 7 * 86400 * 1_000_000_000
    return f"""WITH e AS (
  SELECT user_id AS u, event_type AS et,
         CAST(epoch_ns(ts) AS BIGINT) // {week_ns} AS week
  FROM events
),
c AS (SELECT u, MIN(week) AS cohort_week FROM e WHERE et = 'signup' GROUP BY 1),
a AS (SELECT DISTINCT u, week FROM e)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(week - cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN c ON c.u = a.u
WHERE week >= cohort_week
GROUP BY 1, 2"""


def sql_events_bloom_semijoin():
    # the bloom prefilter is correctness-transparent (no false
    # negatives; positives removed by the exact join) — the oracle is
    # the plain semi-join
    return """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE user_id IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
GROUP BY 1"""


def sql_storage_roundtrip_battery():
    # every write→read variant round-trips the SAME pixel table — the
    # oracle is the recomputed pixel formula per tag; the http tag
    # reads the (differently-shaped) golden store, so it carries its
    # own formula
    tags = [
        "v2_gzip", "v2_dotsep", "v2_blosc", "v3_sharded",
        "uint16", "float16", "int64", "uint64",
    ]
    d = {t: sql_s1_s4_zarr_roundtrip() for t in tags}
    # complex tags fold re+251*im into the shared single-column shape
    d["complex64"] = sql_dtype_complex_roundtrip()
    d["complex128"] = sql_dtype_complex_roundtrip()
    d["roi_pruned"] = sql_s1_roi_pruned_read()
    d["http_sharded"] = sql_s2_http_read()
    # r16: the optimize verb (recompress+rechunk+shard rewrite) copies
    # levels verbatim, so its read-back is the same pixel formula
    d["optimized"] = sql_s1_s4_zarr_roundtrip()
    return _tagged_union_sql(d, "t, c, z, y, x, v")


def sql_text_battery():
    return f"""SELECT tc.doc_id, tc.n_tokens, tc.n_subtokens, tc.n_chars,
       q.mean_token_len, q.punct_ratio, q.stopword_ratio, q.quality,
       l.pred_lang, l.votes AS lang_votes,
       f.fp_md5, f.fp64,
       w.n_fp, w.fp_min, w.fp_max
FROM ({sql_text_token_count()}) tc
JOIN ({sql_text_quality()}) q ON q.doc_id = tc.doc_id
JOIN ({sql_text_lang_id()}) l ON l.doc_id = tc.doc_id
JOIN ({sql_text_fingerprint()}) f ON f.doc_id = tc.doc_id
JOIN ({sql_text_winnow()}) w ON w.doc_id = tc.doc_id"""


_DIGEST_P = 1_000_000_007

# Column kinds for digest batteries: "d" doubles render as
# round(v*1e6) BIGINT, anything else CASTs to VARCHAR directly.
# Declaration order is irrelevant — rendering sorts columns by name,
# mirroring gate._digest_gate exactly. Parts lists below mirror
# gate.EVENTS_ANALYTICS_PARTS etc. (equality pinned in pytest).
_DIGEST_SPECS = {
    "events_percentiles": {"event_type": "s", "n": "l", "p50": "d", "p90": "d", "p99": "d"},
    "events_percentiles_residual": {"event_type": "s", "n": "l", "p50": "d", "p90": "d", "p99": "d"},
    "events_user_topn": {"event_type": "s", "rank": "l", "user_id": "l", "n": "l"},
    "events_daily_running": {"event_type": "s", "day": "l", "n": "l", "running_n": "l"},
    "events_asof_attribution": {
        "user_id": "l", "ts": "l", "event_id": "l", "event_id_click": "l", "ts_click": "l",
    },
    "events_asof_forward": {
        "user_id": "l", "ts": "l", "event_id": "l", "event_id_click": "l", "ts_click": "l",
    },
    "events_asof_tolerance": {
        "user_id": "l", "ts": "l", "event_id": "l", "event_id_click": "l", "ts_click": "l",
    },
    "events_range_windows": {"start_ts": "l", "event_type": "s", "n": "l"},
    "events_dedup_stream": {
        "event_id": "l", "ts": "l", "user_id": "l", "event_type": "s", "value": "d",
    },
    # r15: the skew twins folded into events_skew_battery (shapes ==
    # their plain forms) and the web-hygiene constituents
    "events_sessionize_segmented": {"user_id": "l", "n_sessions": "l", "n_events": "l"},
    "events_asof_segmented": {
        "user_id": "l", "ts": "l", "event_id": "l", "event_id_click": "l", "ts_click": "l",
    },
    "events_percentiles_bucketed": {"event_type": "s", "n": "l", "p50": "d", "p90": "d", "p99": "d"},
    "events_user_topn_bucketed": {"event_type": "s", "rank": "l", "user_id": "l", "n": "l"},
    "web_url_dedup": {"canonical_url": "s", "rep_id": "l", "n_docs": "l", "n_raw_forms": "l"},
    "web_host_stats": {"host": "s", "n_pages": "l", "n_urls": "l", "dup_factor": "d"},
    "web_url_dedup_stream": {"canonical_url": "s", "rep_id": "l", "n_docs": "l", "n_raw_forms": "l"},
    "events_range_windows_bucketed": {"start_ts": "l", "event_type": "s", "n": "l"},
    "events_count_sessions_stream": {
        "user_id": "l", "chunk": "l", "n_events": "l", "start_ts": "l", "end_ts": "l",
    },
    "corpus_split_counts": {"split": "s", "lang": "s", "n_docs": "l"},
    "corpus_stratified_sample": {"source": "s", "sample_rank": "l", "doc_id": "l"},
    "corpus_priority_sample": {
        "doc_id": "l", "stratum": "s", "weight": "l",
        "sample_rank": "l", "est_w": "d",
    },
    "corpus_priority_sample_stream": {
        "doc_id": "l", "stratum": "s", "weight": "l",
        "sample_rank": "l", "est_w": "d",
    },
    "text_gopher": {
        "doc_id": "l", "n_words": "l", "mean_word_len": "d",
        "n_distinct_stopwords": "l", "dup_word_frac": "d",
        "top_bigram_frac": "d", "passes": "s",
    },
    "dedup_shingle_frac": {
        "doc_id": "l", "n_shingles": "l", "n_dup_shingles": "l", "dup_frac": "d",
    },
    "ann_ivfpq_residual_topk": {
        "query_id": "l", "rank": "l", "neighbor_id": "l", "score_u": "l",
    },
    "text_pii": {
        "doc_id": "l", "n_email": "l", "n_ssn": "l", "n_phone": "l",
        "n_ipv4": "l", "redacted_md5": "s", "n_pii": "l",
    },
    "text_repetition": {
        "doc_id": "l", "dup2_frac": "d", "dup3_frac": "d", "dup4_frac": "d",
    },
    "corpus_pack_stats": {
        "bucket": "l", "pack_id": "l", "n_docs": "l", "n_tokens_packed": "l",
    },
    "corpus_filter_pipeline": {"doc_id": "l", "reason": "s", "keep": "s"},
    "corpus_decontaminate": {
        "doc_id": "l", "n_grams": "l", "n_hits": "l", "contaminated": "s",
    },
    "corpus_cap_per_source": {"doc_id": "l", "source": "s", "rk": "l"},
    "dedup_dup_spans": {
        "doc_id": "l", "span_start": "l", "span_end": "l",
        "n_tokens": "l", "n_windows": "l",
    },
    "dedup_dup_token_frac": {
        "doc_id": "l", "dup_tokens": "l", "total": "l", "dup_frac": "d",
    },
    "dedup_substring_cut": {
        "doc_id": "l", "n_tokens": "l", "n_windows": "l", "n_rep": "l",
        "cut_tokens": "l", "cut_frac": "d",
    },
    "corpus_temperature_mix": {"doc_id": "l", "lang": "s", "epoch": "l"},
    "corpus_seeded_shuffle": {"doc_id": "l", "rank": "l", "shard": "l"},
    "text_lm_perplexity": {
        "doc_id": "l", "n_bigrams": "l", "logprob_micro": "l", "avg_micro": "l",
    },
    "corpus_dsir_weights": {
        "doc_id": "l", "n_bigrams": "l", "weight_micro": "l",
        "weight_avg_micro": "l",
    },
    "ir_tfidf_weights": {"doc_id": "l", "term": "s", "w": "d"},
    "ir_tfidf_topk": {"doc_a": "l", "rank": "l", "doc_b": "l", "cos": "d"},
    "ir_bm25_topk": {"query_id": "l", "rank": "l", "doc_id": "l", "score": "d"},
    "ir_bm25_query": {"query_id": "l", "rank": "l", "doc_id": "l", "score": "d"},
    "ir_rrf_fusion": {"query_id": "l", "rank": "l", "doc_id": "l", "rrf_micro": "l"},
    "text_quality_classifier": {
        "doc_id": "l", "n_tokens": "l", "score": "l",
        "score_per_tok": "d", "keep": "s",
    },
    "text_quality_stream": {
        "doc_id": "l", "n_tokens": "l", "score": "l",
        "score_per_tok": "d", "keep": "s",
    },
    "text_bpe_merges": {"step": "l", "left": "s", "right": "s", "pair_count": "l"},
    "text_bpe_subwords": {"doc_id": "l", "n_words": "l", "n_subwords": "l"},
    "text_bpe_encode": {"doc_id": "l", "word_idx": "l", "sym_idx": "l", "token_id": "l", "token": "s"},
    "events_zorder_key": {"event_id": "l", "b1": "l", "b2": "l", "zkey": "l"},
    "events_zorder_nd": {"event_id": "l", "b1": "l", "b2": "l", "b3": "l", "zkey": "l"},
    "multimodal_features": {
        "doc_id": "l", "n_chars": "l", "img_h": "l", "img_w": "l",
        "n_px": "l", "px_mean": "d",
    },
    "multimodal_resize": {"doc_id": "l", "y": "l", "x": "l", "v": "l"},
    "multimodal_augment": {"doc_id": "l", "y": "l", "x": "l", "v": "l"},
    "multimodal_ahash": {"doc_id": "l", "h_hi": "l", "h_lo": "l"},
    "multimodal_audio_dedup": {"fp": "l", "n_docs": "l", "representative": "l"},
    "multimodal_image_dedup": {"doc_a": "l", "doc_b": "l", "dist": "l"},
    "multimodal_video_clips": {
        "doc_id": "l", "pos": "l", "gh": "l", "n_occ": "l",
        "rep_doc": "l", "rep_pos": "l", "is_canonical": "s",
    },
    "multimodal_dedup_verdict": {"doc_id": "l", "reason": "s", "keep": "s"},
    "events_rollup": {
        "event_type": "s", "day_epoch": "l", "gid": "l", "n": "l",
        "sum_value": "d",
    },
    "events_sliding_distinct": {
        "hour_epoch": "l", "n_nonempty": "l", "reg_checksum": "l", "est": "d",
    },
    "multimodal_frame_sample": {"doc_id": "l", "frame": "l", "px_sum": "l"},
    "multimodal_audio": {"doc_id": "l", "n_samples": "l", "sample_rate": "l", "sq_sum": "l"},
    "sketch_kmv_distinct": {"k_used": "l", "kth_hash": "l", "est": "d"},
    "sketch_count_min": {"value": "s", "exact_n": "l", "cm_est": "l"},
    "sketch_heavy_hitters_stream": {"lang": "s", "token": "s", "n": "l", "frac": "d"},
    "dedup_minhash": {"doc_a": "l", "doc_b": "l", "est_jaccard": "d"},
    "dedup_edit_distance": {"doc_a": "l", "doc_b": "l", "dist": "l"},
    "dedup_lines": {
        "doc_id": "l", "clean_text": "s", "n_lines": "l",
        "n_kept": "l", "n_dropped": "l",
    },
    "dedup_lines_nl": {
        "doc_id": "l", "clean_text": "s", "n_lines": "l",
        "n_kept": "l", "n_dropped": "l",
    },
    "dedup_contamination": {
        "doc_id": "l", "n_grams": "l", "n_hit": "l",
        "hit_frac": "d", "dirty": "l",
    },
    "dedup_contamination_stream": {
        "doc_id": "l", "n_grams": "l", "n_hit": "l",
        "hit_frac": "d", "dirty": "l",
    },
    "dedup_incremental": {
        "doc_id": "l", "n_ref_matches": "l",
        "best_est_jaccard": "d", "keep": "l",
    },
    "dedup_incremental_stream": {
        "doc_id": "l", "n_ref_matches": "l",
        "best_est_jaccard": "d", "keep": "l",
    },
    "graph_pagerank": {"doc_id": "l", "rank_micro": "l"},
    "text_vocab_coverage": {
        "cov_num": "l", "cov_den": "l", "threshold_tokens": "l",
        "n_vocab_needed": "l", "vocab_size": "l", "total_tokens": "l",
    },
    # r14: hcs_battery constituents
    "s18_hcs_store_read": {
        "well_path": "s", "row_name": "s", "col_name": "s",
        "acquisition_id": "l", "field_index": "l", "image_path": "s",
    },
    "f7_well_lookup": {
        "plate_id": "s", "row_index": "l", "col_index": "l",
        "row_name": "s", "col_name": "s", "well_path": "s",
    },
    "j3_well_catalog": {
        "plate_id": "s", "well_path": "s", "row_name": "s",
        "col_name": "s", "acquisition_id": "l", "field_index": "l",
        "image_path": "s",
    },
    "s17_omero_nifti": {
        "color": "s", "wmin": "d", "wmax": "d", "wstart": "d", "wend": "d",
    },
    "s16_nifti_ingest": {
        "t": "l", "c": "l", "z": "l", "y": "l", "x": "l", "v": "l",
    },
    "graph_triangles": {
        "doc_id": "l", "deg": "l", "n_tri": "l", "clustering": "d",
    },
    "dedup_clusters": {"doc_id": "l", "cluster_id": "l"},
    "dedup_clusters_chain": {"doc_id": "l", "cluster_id": "l"},
    # r13 planner/metadata battery constituents
    "a10_minmax": {"v_min": "l", "v_max": "l"},
    "a11_chunk_cost": {"n_chunks": "l", "total_bytes": "l"},
    "c2_scale_translation": {
        "level": "l", "scale_z": "d", "translation_z": "d",
        "scale_y": "d", "translation_y": "d",
        "scale_x": "d", "translation_x": "d",
    },
    "a9_pyramid_plan": {"level": "l", "fz": "l", "fy": "l", "fx": "l"},
    "chunk_table_sums": {"cz": "l", "cy": "l", "cx": "l", "n_vox": "l", "vsum": "l"},
    "c8_rfc4_orientation": {"axis": "s", "lps": "s", "ras": "s", "otype": "s"},
    "c9_version_roundtrip": {
        "step": "s", "version": "s", "axes": "s",
        "ds_path": "s", "ds_scale": "s", "ds_translation": "s",
    },
    "c10_method_provenance": {"method": "s", "package": "s", "function": "s"},
    "dedup_keep": {"doc_id": "l"},
    "dedup_simhash": {"doc_id": "l", "simhash": "l"},
    "dedup_ngram_jaccard": {"doc_a": "l", "doc_b": "l", "jaccard": "d"},
    "ann_cosine_topk": {"query_id": "l", "rank": "l", "neighbor_id": "l", "cosine": "d"},
    "ann_cosine_query": {"query_id": "l", "rank": "l", "neighbor_id": "l", "cosine": "d"},
    "ann_sq8_topk": {"query_id": "l", "rank": "l", "neighbor_id": "l", "est_cos": "d"},
    "ann_mmr_rerank": {"query_id": "l", "pick_rank": "l", "neighbor_id": "l", "mmr_u": "l"},
    "ann_mmr_query": {"query_id": "l", "pick_rank": "l", "neighbor_id": "l", "mmr_u": "l"},
    "emb_label_centroids": {
        "label_a": "l", "label_b": "l", "n_a": "l", "n_b": "l",
        "cos_centroid": "d",
    },
    "ir_eval_metrics": {
        "query_id": "l", "n_rel": "l", "n_hits": "l",
        "recall": "d", "mrr": "d", "ndcg": "d",
    },
    "ann_lsh_topk": {"query_id": "l", "rank": "l", "neighbor_id": "l", "cosine": "d"},
    "ann_ivf_topk": {"query_id": "l", "rank": "l", "neighbor_id": "l", "cosine": "d"},
    "ann_ivfpq_topk": {"query_id": "l", "rank": "l", "neighbor_id": "l", "score_u": "l"},
    "ann_pq_topk": {"query_id": "l", "rank": "l", "neighbor_id": "l", "score_u": "l"},
    "emb_near_dup_lsh": {"vec_a": "l", "vec_b": "l", "cosine": "d"},
    "sketch_hll_distinct": {
        "m": "l", "n_nonempty": "l", "reg_checksum": "l", "est": "d",
    },
    "events_funnel": {"step_index": "l", "step": "s", "n_users": "l"},
    "events_cohort_retention": {
        "cohort_week": "l", "week_offset": "l", "n_users": "l",
    },
    "events_bloom_semijoin": {"event_type": "s", "n": "l"},
    "corpus_chunking": {
        "doc_id": "l", "chunk_idx": "l", "start_tok": "l",
        "n_tokens": "l", "chunk_md5": "s",
    },
    "corpus_rebalance": {
        "lang": "s", "n_total": "l", "threshold": "l", "n_kept": "l",
    },
    "corpus_kmeans_profile": {"cell": "l", "n_vectors": "l"},
    # r11 folds (VERDICT r10 ask #2)
    "ann_ivf_balanced": {"cell": "l", "subcell": "l", "n": "l"},
    "semantic_dedup": {"vec_id": "l", "keep": "s", "dup_of": "l"},
    "ann_recall_eval": {"query_id": "l", "n_hit": "l", "recall": "d"},
    "dedup_substring_stream": {
        "gh": "l", "n_occ": "l", "rep_doc": "l", "rep_pos": "l",
    },
    # r11 TPC-H battery constituents (VERDICT r10 ask #4)
    "tpch_q4": {"o_orderpriority": "s", "order_count": "l"},
    "tpch_q6": {"revenue": "d"},
    "tpch_q10": {"c_custkey": "l", "c_name": "s", "n_name": "s", "revenue": "d"},
    "tpch_q14": {"promo_revenue": "d", "total_revenue": "d", "promo_pct": "d"},
    "tpch_q19": {"revenue": "d"},
    "tpch_q17": {"avg_yearly": "d", "n_small_lines": "l"},
    "tpch_q7": {"supp_nation": "s", "cust_nation": "s", "l_year": "l", "revenue": "d"},
    "tpch_q8": {"o_year": "l", "mkt_share": "d"},
    "tpch_q9": {"nation": "s", "o_year": "l", "sum_profit": "d"},
    "tpch_q13": {"c_count": "l", "custdist": "l"},
    "tpch_q15": {"s_suppkey": "l", "s_name": "s", "total_revenue": "d"},
    "tpch_q18": {"c_custkey": "l", "c_name": "s", "o_orderkey": "l", "o_orderdate": "s", "o_totalprice": "d", "sum_qty": "d"},
    "tpch_q2": {"p_partkey": "l", "s_suppkey": "l", "s_name": "s", "min_cost": "d"},
    "tpch_q11": {"p_partkey": "l", "value": "d"},
    "tpch_q12": {"l_returnflag": "s", "high_line_count": "l", "low_line_count": "l"},
    "tpch_q16": {"p_brand": "s", "p_type": "s", "p_size": "l", "supplier_cnt": "l"},
    "tpch_q20": {"s_suppkey": "l", "s_name": "s"},
    "tpch_q21": {"s_name": "s", "numwait": "l"},
    "tpch_q22": {"cntrycode": "l", "numcust": "l", "totacctbal": "d"},
}

PLANNER_PARTS = [
    "a10_minmax",
    "a11_chunk_cost",
    "c2_scale_translation",
    "a9_pyramid_plan",
    "chunk_table_sums",
]

METADATA_PARTS = [
    "c8_rfc4_orientation",
    "c9_version_roundtrip",
    "c10_method_provenance",
]

# r14: mirrors gate.HCS_PARTS (pinned equal in pytest)
HCS_PARTS = [
    "s18_hcs_store_read",
    "f7_well_lookup",
    "j3_well_catalog",
    "s17_omero_nifti",
    "s16_nifti_ingest",
]

# r15: mirrors gate.EVENTS_SKEW_PARTS / gate.WEB_PARTS (pinned equal
# in pytest)
EVENTS_SKEW_PARTS = [
    "events_sessionize_segmented",
    "events_asof_segmented",
    "events_percentiles_bucketed",
    "events_user_topn_bucketed",
]
WEB_PARTS = [
    "web_url_dedup",
    "web_host_stats",
    "web_url_dedup_stream",
]

EVENTS_ANALYTICS_PARTS = [
    "events_percentiles",
    "events_user_topn",
    "events_daily_running",
    "events_asof_attribution",
    "events_asof_forward",
    "events_asof_tolerance",
    "events_range_windows",
    "events_range_windows_bucketed",
    "events_count_sessions_stream",
    "events_funnel",
    "events_cohort_retention",
    "events_bloom_semijoin",
    # r10: trailing-window HLL distinct
    "events_sliding_distinct",
    # r12: forced descent-exhaustion residual path
    "events_percentiles_residual",
    # r12: Z-order layout keys (data-skipping clustering)
    "events_zorder_key",
    # r13: native multi-level ROLLUP report
    "events_rollup",
    # r15: replay-dedup exactly-once stream (folded from its direct slot)
    "events_dedup_stream",
]
CORPUS_SAMPLING_PARTS = [
    "corpus_split_counts",
    "corpus_stratified_sample",
    "corpus_priority_sample",
    "corpus_priority_sample_stream",
    "text_gopher",
    "dedup_shingle_frac",
    "ann_ivfpq_residual_topk",
    # r8 additions: PII scrub, within-doc repetition, sequence packing,
    # end-to-end filter pipeline, duplicated-substring spans
    "text_pii",
    "text_repetition",
    "corpus_pack_stats",
    "corpus_filter_pipeline",
    "dedup_dup_spans",
    "dedup_dup_token_frac",
    "corpus_chunking",
    "corpus_rebalance",
    "corpus_kmeans_profile",
    # r9: benchmark decontamination (n-gram overlap vs the eval slice)
    # and the per-domain frequency cap (two-phase exact top-k)
    "corpus_decontaminate",
    "corpus_cap_per_source",
    # r10: keep-one substring-dedup deletion budget (canonical-
    # witness removal set over corpus-repeated windows)
    "dedup_substring_cut",
    # r10: temperature mixture realization (integer-exact alpha mix)
    "corpus_temperature_mix",
    "corpus_seeded_shuffle",
    # r10: hashed-bigram LM scoring (all-integer rows)
    "text_lm_perplexity",
    "corpus_dsir_weights",
    # r12: TF-IDF sparse weights + term-partitioned top-k similarity,
    # hashed linear quality classifier with calibrated keep threshold
    "ir_tfidf_weights",
    "ir_tfidf_topk",
    "ir_bm25_topk",
    "ir_rrf_fusion",
    # r13: free-text query serving path
    "ir_bm25_query",
    # r13: retrieval-quality metrics vs the Jaccard relevance set
    "ir_eval_metrics",
    "text_quality_classifier",
    "text_quality_stream",
    # r12: distributed BPE tokenizer training + subword segmentation
    "text_bpe_merges",
    "text_bpe_subwords",
    "text_bpe_encode",
    # r13: vocabulary coverage curve
    "text_vocab_coverage",
]
MULTIMODAL_PARTS = [
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_audio",
    "multimodal_augment",
    "multimodal_ahash",
    "multimodal_audio_dedup",
    "multimodal_image_dedup",
    "multimodal_video_clips",
    "multimodal_dedup_verdict",
]
SKETCH_PARTS = [
    "sketch_kmv_distinct",
    "sketch_count_min",
    "sketch_hll_distinct",
    "sketch_heavy_hitters_stream",
]
# r15 split (VERDICT r14 ask #6) — mirrors gate.DEDUP_PARTS /
# gate.HYGIENE_PARTS (pinned equal in pytest)
DEDUP_PARTS = [
    "dedup_minhash",
    "dedup_clusters",
    "dedup_keep",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # r12: exact Levenshtein re-rank of the capped band candidates
    "dedup_edit_distance",
    # r12/r13: iterative graph analytics over the candidate edges
    "graph_pagerank",
    "graph_triangles",
]
HYGIENE_PARTS = [
    "dedup_lines",
    "dedup_lines_nl",
    "dedup_substring_stream",
    "dedup_contamination",
    "dedup_contamination_stream",
    "dedup_incremental",
    "dedup_incremental_stream",
]
ANN_PARTS = [
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "emb_near_dup_lsh",
    # r11 (VERDICT r10 ask #2): the three r10 additions previously at
    # slots 143-145 (past the window, ungraded) now grade via digest
    "ann_ivf_balanced",
    "semantic_dedup",
    "ann_recall_eval",
    # r13: free-vector serving path
    "ann_cosine_query",
    # r13: int8 scalar-quantized serving path
    "ann_sq8_topk",
    # r13: MMR diversity re-rank over the SQ8 pool
    "ann_mmr_rerank",
    # r13: label-centroid separation diagnostic
    "emb_label_centroids",
    # r13: free-vector MMR serving path
    "ann_mmr_query",
]
# r11 (VERDICT r10 ask #4): mirror of gate.TPCH_PARTS
TPCH_PARTS = [
    "tpch_q4",
    "tpch_q6",
    "tpch_q10",
    "tpch_q14",
    "tpch_q19",
    "tpch_q17",
    "tpch_q21",
    "tpch_q22",
    # r12: the remaining slim-schema-expressible plan families
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q13",
    "tpch_q15",
    "tpch_q18",
    # r12: partsupp/shipmode-dependent families via documented stand-ins
    "tpch_q2",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q20",
]


def _digest_sql(name: str, inner: str, spec: dict[str, str]) -> str:
    """DuckDB twin of gate._digest_gate: reduce a constituent oracle's
    full result to (gate, n_rows, d1, d2) — two salted order-
    insensitive content digests (per-row h64 of canonically rendered
    columns, mod a prime, summed)."""
    rend = []
    for c in sorted(spec):
        # identifiers are double-quoted: constituent columns may be
        # reserved words ("left"/"right" in the BPE merge table)
        expr = (
            f'CAST(round(("{c}") * 1000000, 0) AS BIGINT)'
            if spec[c] == "d"
            else f'"{c}"'
        )
        rend.append(f"COALESCE(CAST({expr} AS VARCHAR), '@')")
    row = "concat_ws('|', " + ", ".join(rend) + ")"
    h1 = H64.format(s=f"concat('1:', {row})")
    h2 = H64.format(s=f"concat('2:', {row})")
    return (
        f"SELECT '{name}' AS gate, COUNT(*) AS n_rows,\n"
        f"  COALESCE(CAST(SUM(({h1}) % {_DIGEST_P}) AS BIGINT), 0) AS d1,\n"
        f"  COALESCE(CAST(SUM(({h2}) % {_DIGEST_P}) AS BIGINT), 0) AS d2\n"
        f"FROM ({inner}) _dig"
    )


def oracles() -> dict[str, str]:
    """All oracle SQL keyed identically to gate.queries(). Coverage is
    FULL: every registered gate — not just the first 50 — has an oracle
    entry (pinned by tests/test_r04_batteries.py::
    test_full_oracle_coverage), so the driver's weaker rows-only
    fallback is never exercised."""
    d = {
        "f1_level_pick": sql_f1_level_pick(),
        "f2_roi": sql_f2_roi(),
        "f3_f4_tc_select": sql_f3_f4_tc_select(),
        "f5_transpose": sql_f5_transpose(),
        "a2_bin_shrink": sql_a2_bin_shrink(),
        "a2_bin_shrink_aniso": sql_a2_bin_shrink_aniso(),
        "a7_nearest": sql_a7_nearest(),
        "a8_mode": sql_a8_mode(),
        "a8_mode_centered": sql_a8_mode_centered(),
        "a3_label_downsample": sql_a3_label_downsample(),
        "a1_gaussian": sql_a1_gaussian(),
        "a1_gaussian_window": sql_a1_gaussian(),
        "a4_itk_gaussian": sql_a4_itk_gaussian(),
        "a10_minmax": sql_a10_minmax(),
        "a11_chunk_cost": sql_a11_chunk_cost(),
        "c2_scale_translation": sql_c2_scale_translation(),
        "a9_pyramid_plan": sql_a9_pyramid_plan(),
        "s1_s4_zarr_roundtrip": sql_s1_s4_zarr_roundtrip(),
        "s1_dot_separator_read": sql_s1_s4_zarr_roundtrip(),
        "s9_blosc_roundtrip": sql_s1_s4_zarr_roundtrip(),
        "s8_sharded_roundtrip": sql_s1_s4_zarr_roundtrip(),
        "dtype_uint16_roundtrip": sql_s1_s4_zarr_roundtrip(),
        "dtype_float16_roundtrip": sql_s1_s4_zarr_roundtrip(),
        "dtype_int64_roundtrip": sql_s1_s4_zarr_roundtrip(),
        "dtype_uint64_roundtrip": sql_s1_s4_zarr_roundtrip(),
        "dtype_complex64_roundtrip": sql_dtype_complex_roundtrip(),
        "dtype_complex128_roundtrip": sql_dtype_complex_roundtrip(),
        "s1_roi_pruned_read": sql_s1_roi_pruned_read(),
        "slicing_battery": sql_slicing_battery(),
        "downsample_battery": sql_downsample_battery(),
        "gaussian_battery": sql_gaussian_battery(),
        "storage_roundtrip_battery": sql_storage_roundtrip_battery(),
        "text_battery": sql_text_battery(),
        "multimodal_resize_packed": sql_multimodal_resize_packed(),
        "chunk_table_sums": sql_chunk_table_sums(),
        "s4_multiscale_level1": sql_s4_multiscale_level1(),
        "s16_nifti_ingest": sql_s16_nifti_ingest(),
        "s11_tiff_ingest": sql_s11_tiff_ingest(),
        "s11_tiff_series": sql_s11_tiff_series(),
        "s13_png_series": sql_s13_png_series(),
        "s11_jpeg_ingest": sql_s11_jpeg_ingest(),
        "s11_dicom_ingest": sql_s11_dicom_ingest(),
        "s11_gif_ingest": sql_s11_gif_ingest(),
        "s11_webp_ingest": sql_s11_webp_ingest(),
        "s11_mgh_ingest": sql_s11_mgh_ingest(),
        "s11_mrc_ingest": sql_s11_mrc_ingest(),
        "s11_wav_ingest": sql_s11_wav_ingest(),
        "ingest_battery": sql_ingest_battery(),
        "dedup_exact": sql_dedup_exact(),
        "dedup_minhash_sig": sql_dedup_minhash_sig(),
        "dedup_minhash": sql_dedup_minhash(),
        "dedup_clusters": sql_dedup_clusters(),
        "dedup_clusters_chain": sql_dedup_clusters_chain(),
        "dedup_keep": sql_dedup_keep(),
        "dedup_skew_cluster": sql_dedup_skew_cluster(),
        "corpus_decontaminate": sql_corpus_decontaminate(),
        "corpus_cap_per_source": sql_corpus_cap_per_source(),
        "dedup_simhash": sql_dedup_simhash(),
        "dedup_ngram_jaccard": sql_dedup_ngram_jaccard(),
        "dedup_ngram_jaccard_capped": sql_dedup_ngram_jaccard(max_df=20),
        "text_token_count": sql_text_token_count(),
        "text_quality": sql_text_quality(),
        "text_lang_id": sql_text_lang_id(),
        "text_fingerprint": sql_text_fingerprint(),
        "text_winnow": sql_text_winnow(),
        "ann_cosine_topk": sql_ann_cosine_topk(),
        "ann_sq8_topk": sql_ann_sq8_topk(),
        "ann_mmr_rerank": sql_ann_mmr_rerank(),
        "ann_mmr_query": sql_ann_mmr_rerank(query_literals=True),
        "emb_label_centroids": sql_emb_label_centroids(),
        "ann_cosine_query": sql_ann_cosine_query(),
        "ir_eval_metrics": sql_ir_eval_metrics(),
        "ann_lsh_topk": sql_ann_lsh_topk(),
        "ann_ivf_topk": sql_ann_ivf_topk(),
        "ann_ivf_balanced": sql_ann_ivf_balanced(),
        "semantic_dedup": sql_semantic_dedup(),
        "ann_recall_eval": sql_ann_recall_eval(),
        "emb_near_dup_lsh": sql_emb_near_dup_lsh(),
        "multimodal_features": sql_multimodal_features(),
        "multimodal_ahash": sql_multimodal_ahash(),
        "multimodal_image_dedup": sql_multimodal_image_dedup(),
        "multimodal_resize": sql_multimodal_resize(),
        "multimodal_frame_sample": sql_multimodal_frame_sample(),
        "multimodal_audio": sql_multimodal_audio(),
        "sketch_kmv_distinct": sql_sketch_kmv_distinct(),
        "sketch_count_min": sql_sketch_count_min(),
        "multimodal_dedup_verdict": sql_multimodal_dedup_verdict(),
        "multimodal_video_clips": sql_multimodal_video_clips(),
        "multimodal_audio_dedup": sql_multimodal_audio_dedup(),
        "events_sliding_distinct": sql_events_sliding_distinct(),
        "events_hourly": sql_events_hourly(),
        "events_rollup": sql_events_rollup(),
        "events_hourly_stream": sql_events_hourly(),
        "events_session_window": sql_events_session_window(),
        "s14_itk_adapter": sql_s14_itk_adapter(),
        "s17_omero_nifti": sql_s17_omero_nifti(),
        "c8_rfc4_orientation": sql_c8_rfc4_orientation(),
        "c9_version_roundtrip": sql_c9_version_roundtrip(),
        "c10_method_provenance": sql_c10_method_provenance(),
        "c7_validate_battery": sql_c7_validate_battery(),
        "t2_t3_callbacks": sql_t2_t3_callbacks(),
        "t1_stream_pixels": sql_t1_stream_pixels(),
        "events_sessionize": sql_events_sessionize(),
        # skew-safe twin is exactly equal to the plain form by design,
        # so it shares the independent oracle verbatim
        "events_sessionize_segmented": sql_events_sessionize(),
        # S15 exports the same volume/transform s14 imports — identical
        # formula oracle; the battery doubles it with a direction tag
        "s15_itk_export": sql_s14_itk_adapter(),
        "itk_adapter_battery": (
            f"SELECT 'import' AS adapter, * FROM ({sql_s14_itk_adapter()})\n"
            f"UNION ALL\nSELECT 'export' AS adapter, * FROM ({sql_s14_itk_adapter()})"
        ),
        # batch + streaming-ledger exact dedup: same batch SQL doubled
        "dedup_exact_battery": (
            f"SELECT 'batch' AS mode, * FROM ({sql_dedup_exact()})\n"
            f"UNION ALL\nSELECT 'stream' AS mode, * FROM ({sql_dedup_exact()})"
        ),
        "tpch_q1": sql_tpch_q1(),
        "tpch_q3": sql_tpch_q3(),
        "tpch_q5": sql_tpch_q5(),
        "tpch_q6": sql_tpch_q6(),
        "tpch_q4": sql_tpch_q4(),
        "tpch_q14": sql_tpch_q14(),
        "tpch_q19": sql_tpch_q19(),
        "tpch_q10": sql_tpch_q10(),
        "tpch_q17": sql_tpch_q17(),
        "tpch_q7": sql_tpch_q7(),
        "tpch_q8": sql_tpch_q8(),
        "tpch_q9": sql_tpch_q9(),
        "tpch_q13": sql_tpch_q13(),
        "tpch_q15": sql_tpch_q15(),
        "tpch_q18": sql_tpch_q18(),
        "tpch_q2": sql_tpch_q2(),
        "tpch_q11": sql_tpch_q11(),
        "tpch_q12": sql_tpch_q12(),
        "tpch_q16": sql_tpch_q16(),
        "tpch_q20": sql_tpch_q20(),
        "tpch_q21": sql_tpch_q21(),
        "tpch_q22": sql_tpch_q22(),
        "j3_well_catalog": sql_j3_well_catalog(),
        "f7_well_lookup": sql_f7_well_lookup(),
        "s18_hcs_store_read": sql_s18_hcs_store_read(),
        # streaming twin of exact dedup: same batch SQL — stream == batch
        "dedup_exact_stream": sql_dedup_exact(),
        "text_top_tokens": sql_text_top_tokens(),
        "ann_pq_topk": sql_ann_pq_topk(),
        "ann_ivfpq_topk": sql_ann_ivfpq_topk(),
        # streaming replay-dedup of a DOUBLED input == the plain table
        "events_dedup_stream": (
            "SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts, user_id, "
            "event_type, value FROM events"
        ),
        "ann_lsh_multiprobe_topk": sql_ann_lsh_multiprobe_topk(),
        "ann_ivfpq_residual_topk": sql_ann_ivfpq_residual_topk(),
        "text_gopher": sql_text_gopher(),
        "dedup_shingle_frac": sql_dedup_shingle_frac(),
        "text_pii": sql_text_pii(),
        "text_repetition": sql_text_repetition(),
        "corpus_pack_stats": sql_corpus_pack_stats(),
        "corpus_filter_pipeline": sql_corpus_filter_pipeline(),
        "dedup_dup_spans": sql_dedup_dup_spans(),
        "dedup_substring_cut": sql_dedup_substring_cut(),
        "dedup_substring_stream": sql_dedup_substring_stream(),
        "dedup_edit_distance": sql_dedup_edit_distance(),
        "dedup_lines": sql_dedup_lines(),
        "dedup_lines_nl": sql_dedup_lines_nl(),
        "dedup_contamination": sql_dedup_contamination(),
        # a fully-drained cross-batch hit fold == the batch scan
        "dedup_contamination_stream": sql_dedup_contamination(),
        "dedup_incremental": sql_dedup_incremental(),
        # a fully-drained foreachBatch gatekeeper == the batch verdicts
        "dedup_incremental_stream": sql_dedup_incremental(),
        "graph_pagerank": sql_graph_pagerank(),
        "text_vocab_coverage": sql_text_vocab_coverage(),
        "graph_triangles": sql_graph_triangles(),
        "corpus_seeded_shuffle": sql_corpus_seeded_shuffle(),
        "text_lm_perplexity": sql_text_lm_perplexity(),
        "corpus_dsir_weights": sql_corpus_dsir_weights(),
        "ir_tfidf_weights": sql_ir_tfidf_weights(),
        "ir_tfidf_topk": sql_ir_tfidf_topk(),
        "ir_bm25_topk": sql_ir_bm25_topk(),
        "ir_bm25_query": sql_ir_bm25_query(),
        "ir_rrf_fusion": sql_ir_rrf_fusion(),
        "text_quality_classifier": sql_text_quality_classifier(),
        # stream == batch: the drained sink equals the batch classifier
        "text_quality_stream": sql_text_quality_classifier(),
        "text_bpe_merges": sql_text_bpe_merges(),
        "text_bpe_subwords": sql_text_bpe_subwords(),
        "text_bpe_encode": sql_text_bpe_encode(),
        "events_zorder_key": sql_events_zorder_key(),
        "events_zorder_nd": sql_events_zorder_nd(),
        "corpus_temperature_mix": sql_corpus_temperature_mix(),
        "corpus_temperature_report": sql_corpus_temperature_report(),
        "dedup_index_refresh": sql_dedup_index_refresh(),
        "corpus_pipeline_battery": sql_corpus_pipeline_battery(),
        "events_pipeline_battery": sql_events_pipeline_battery(),
        "multimodal_pipeline_battery": sql_multimodal_pipeline_battery(),
        "imaging_pipeline_battery": sql_imaging_pipeline_battery(),
        "web_pipeline_battery": sql_web_pipeline_battery(),
        "s_optimize_roundtrip": sql_s1_s4_zarr_roundtrip(),
        "sketch_heavy_hitters": sql_sketch_heavy_hitters(),
        "web_url_dedup": sql_web_url_dedup(),
        "web_host_stats": sql_web_host_stats(),
        "dedup_dup_token_frac": sql_dedup_dup_token_frac(),
        "parity_battery": sql_parity_battery(),
        "sketch_hll_distinct": sql_sketch_hll_distinct(),
        "events_funnel": sql_events_funnel(),
        "s2_http_read": sql_s2_http_read(),
        "events_cohort_retention": sql_events_cohort_retention(),
        "events_bloom_semijoin": sql_events_bloom_semijoin(),
        "corpus_chunking": sql_corpus_chunking(),
        "corpus_rebalance": sql_corpus_rebalance(),
        "corpus_kmeans_profile": sql_corpus_kmeans_profile(),
        "multimodal_augment": sql_multimodal_augment(),
        # the stream-built partitioned index must serve the SAME probe
        # results as the batch learned-quantizer IVF
        "ann_ivf_stream_build": sql_ann_ivf_topk(),
        # count-based sessions: complete rn//10 chunks in (ts, event_id)
        # order — the single-batch twin of the stateful stream operator
        "events_count_sessions_stream": """WITH e AS (
  SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS ts, event_id FROM events
),
r AS (
  SELECT user_id, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM e
),
c AS (
  SELECT user_id, rn // 10 AS chunk, COUNT(*) AS n_events,
         MIN(ts) AS start_ts, MAX(ts) AS end_ts
  FROM r GROUP BY 1, 2
)
SELECT user_id, CAST(chunk AS BIGINT) AS chunk, CAST(n_events AS BIGINT) AS n_events,
       start_ts, end_ts
FROM c WHERE n_events = 10""",
        # exact linear-interpolation percentiles (Spark `percentile` ==
        # DuckDB quantile_cont; approx sketches could never hash-match)
        "events_percentiles": """SELECT event_type, COUNT(*) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY 1""",
        "events_user_topn": """WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, user_id, n,
         row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rank
  FROM c
)
SELECT event_type, CAST(rank AS BIGINT) AS rank, user_id, n FROM r WHERE rank <= 5""",
        "events_daily_running": """WITH d AS (
  SELECT event_type, CAST(epoch_ns(ts) AS BIGINT) // 86400000000000 AS day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
FROM d""",
        # as-of attribution: DuckDB's NATIVE ASOF LEFT JOIN against the
        # union+window composition; click side max_by-deduped per
        # (user, ts) to mirror the operator's deterministic tie-break
        "events_asof_attribution": """WITH e AS (
  SELECT event_id, user_id, CAST(epoch_ns(ts) AS BIGINT) AS ts, event_type FROM events
),
p AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts, MAX(event_id) AS event_id_click
  FROM e WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT p.user_id, p.ts, p.event_id, c.event_id_click, c.ts AS ts_click
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""",
        "events_range_windows": """WITH e AS (
  SELECT CAST(epoch_ns(ts) AS BIGINT) AS ts, event_type FROM events
),
h AS (SELECT ts // 3600000000000 AS hr, COUNT(*) AS n FROM e GROUP BY 1),
top3 AS (SELECT hr FROM h ORDER BY n DESC, hr LIMIT 3),
w AS (
  SELECT hr * 3600000000000 AS start_ts, (hr + 1) * 3600000000000 AS end_ts
  FROM top3
)
SELECT w.start_ts, e.event_type, COUNT(*) AS n
FROM e JOIN w ON e.ts >= w.start_ts AND e.ts < w.end_ts
GROUP BY 1, 2""",
        # deterministic hash split/sample: identical h64 arithmetic
        "corpus_split_counts": f"""WITH b AS (
  SELECT lang, {H64.format(s="concat('split:', CAST(doc_id AS VARCHAR))")} % 1000000 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 100000 THEN 'val'
            WHEN bucket < 150000 THEN 'test'
            ELSE 'train' END AS split,
       lang, COUNT(*) AS n_docs
FROM b GROUP BY 1, 2""",
        "corpus_stratified_sample": f"""WITH h AS (
  SELECT source, doc_id,
         {H64.format(s="concat('sample:', CAST(doc_id AS VARCHAR))")} AS hv
  FROM documents
),
r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS sample_rank
  FROM h
)
SELECT source, CAST(sample_rank AS BIGINT) AS sample_rank, doc_id
FROM r WHERE sample_rank <= 5""",
        "corpus_priority_sample": f"""WITH base AS (
  SELECT doc_id, source AS stratum, CAST(n_chars AS BIGINT) AS weight,
         CAST(n_chars AS DOUBLE)
           / (CAST(({H64.format(s="concat('prio:', CAST(doc_id AS VARCHAR))")}) + 1 AS DOUBLE)
              / 1152921504606846976.0) AS prio
  FROM documents
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY stratum ORDER BY prio DESC, doc_id ASC) AS sample_rank
  FROM base
),
tt AS (
  SELECT stratum,
         COALESCE(MAX(CASE WHEN sample_rank = 6 THEN prio END), 0.0) AS tau
  FROM rk WHERE sample_rank <= 6 GROUP BY 1
)
SELECT rk.doc_id, rk.stratum, rk.weight, CAST(rk.sample_rank AS BIGINT) AS sample_rank,
       round(GREATEST(CAST(rk.weight AS DOUBLE), tau), 6) AS est_w
FROM rk JOIN tt USING (stratum)
WHERE sample_rank <= 5""",
        # FORWARD as-of: DuckDB ASOF is backward-only, so the twin is
        # the arg_min aggregate over a max-deduped click side (same
        # tie-break as the operator); LEFT JOIN keeps unmatched NULLs
        "events_asof_forward": """WITH e AS (
  SELECT event_id, user_id, CAST(epoch_ns(ts) AS BIGINT) AS ts, event_type FROM events
),
p AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts, MAX(event_id) AS eid
  FROM e WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT p.user_id, p.ts, p.event_id,
       arg_min(c.eid, c.ts) AS event_id_click,
       MIN(c.ts) AS ts_click
FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts >= p.ts
GROUP BY 1, 2, 3""",
        # backward as-of with a 6h attribution window (tolerance bound)
        "events_asof_tolerance": """WITH e AS (
  SELECT event_id, user_id, CAST(epoch_ns(ts) AS BIGINT) AS ts, event_type FROM events
),
p AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts, MAX(event_id) AS eid
  FROM e WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT p.user_id, p.ts, p.event_id,
       arg_max(c.eid, c.ts) AS event_id_click,
       MAX(c.ts) AS ts_click
FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
     AND p.ts - c.ts <= 21600000000000
GROUP BY 1, 2, 3""",
    }
    # the bucketed range join computes the identical aggregate
    d["events_range_windows_bucketed"] = d["events_range_windows"]
    # the two-phase top-N is exactly equal to the single-window form
    d["events_user_topn_bucketed"] = d["events_user_topn"]
    # the carry-scan as-of twin is exactly equal to the window form
    d["events_asof_segmented"] = d["events_asof_attribution"]
    # histogram-descent percentiles == the buffering aggregate
    d["events_percentiles_bucketed"] = d["events_percentiles"]
    # descent-exhaustion knobs (n_buckets=2, bound=4, rounds=1) are
    # cost knobs, never correctness knobs — same oracle
    d["events_percentiles_residual"] = d["events_percentiles"]
    # a single-drain stateful streaming as-of == the batch as-of
    d["events_asof_stream"] = d["events_asof_attribution"]
    # a fully-drained stateful streaming priority sample == the batch
    # sampler (deterministic content-hash priorities; merge order
    # cannot change the per-stratum top-k)
    d["corpus_priority_sample_stream"] = d["corpus_priority_sample"]
    # the candidate-ledger streaming heavy hitters == the batch recount
    d["sketch_heavy_hitters_stream"] = d["sketch_heavy_hitters"]
    # the canonical-ledger streaming url dedup == the batch clustering
    d["web_url_dedup_stream"] = d["web_url_dedup"]
    # digest batteries: UNION ALL of each constituent's oracle wrapped
    # in the digest reduction — the inner SQL IS the constituent's own
    # oracle entry, so battery correctness derives from constituent
    # correctness by construction
    for bname, parts in (
        ("events_analytics_battery", EVENTS_ANALYTICS_PARTS),
        ("corpus_sampling_battery", CORPUS_SAMPLING_PARTS),
        ("multimodal_battery", MULTIMODAL_PARTS),
        ("sketch_battery", SKETCH_PARTS),
        ("dedup_battery", DEDUP_PARTS),
        ("hygiene_battery", HYGIENE_PARTS),
        ("ann_battery", ANN_PARTS),
        ("tpch_battery", TPCH_PARTS),
        ("planner_battery", PLANNER_PARTS),
        ("metadata_battery", METADATA_PARTS),
        ("hcs_battery", HCS_PARTS),
        ("events_skew_battery", EVENTS_SKEW_PARTS),
        ("web_battery", WEB_PARTS),
    ):
        d[bname] = "\nUNION ALL\n".join(
            _digest_sql(p, d[p], _DIGEST_SPECS[p]) for p in parts
        )
    return d
