"""Geometry operators: signature-candidate filters (P7/P8), IoU (J5),
greedy NMS (A8).

The predicates are the reference's exact constants:
* P7  (/root/reference/src/infrastructure/services/optional_services.py:96-106):
  0.2 < w/h < 5.0 AND 100 < w < 500 AND 50 < h < 200
* P8  (/root/reference/src/ml/signature_detector/main.py:74-98): adds
  w > 50, h > 20, w < 0.8*W, h < 0.8*H, 0.05 < area/(w*h) < 0.5
* IoU (/root/reference/src/ml/document_detector/main.py:101-127) and greedy
  keep-largest-area NMS with IoU > 0.05 / containment drop (main.py:38-98)

P7/P8/IoU are pure expressions (whole-stage codegen).  NMS is inherently an
order-sensitive sequential sweep per image -> grouped applyInPandas kernel,
parallel across images (SURVEY.md §2.4 A8).

For the correctness gate the boxes are derived deterministically from the
driver's `part` table via the shared md5-based h32 primitive, so DuckDB can
generate the identical boxes.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import h32_sql


def _h32(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def synthetic_boxes(part: DataFrame, boxes_per_key: int = 3) -> DataFrame:
    """Deterministic boxes (image_id, box_id, x, y, w, h, area) from part."""
    rows = []
    for b in range(boxes_per_key):
        key = F.concat(F.col("p_partkey").cast("string"), F.lit(f":{b}"))
        rows.append(F.struct(
            F.lit(b).alias("box_id"),
            (_h32(F.concat(key, F.lit(":x"))) % 700).cast("double").alias("x"),
            (_h32(F.concat(key, F.lit(":y"))) % 900).cast("double").alias("y"),
            (50 + _h32(F.concat(key, F.lit(":w"))) % 550).cast("double")
                .alias("w"),
            (20 + _h32(F.concat(key, F.lit(":h"))) % 230).cast("double")
                .alias("h"),
        ))
    df = part.select(F.col("p_partkey").alias("image_id"),
                     F.explode(F.array(*rows)).alias("bx"))
    return df.select(
        "image_id", "bx.box_id", "bx.x", "bx.y", "bx.w", "bx.h",
        # pseudo contour area: a deterministic fraction of the bbox area
        (F.col("bx.w") * F.col("bx.h")
         * ((_h32(F.concat(F.col("image_id").cast("string"),
                           F.lit(":a:"), F.col("bx.box_id").cast("string")))
             % 100).cast("double") / 100.0)).alias("area"))


def synthetic_boxes_sql(table: str = "part", boxes_per_key: int = 3) -> str:
    selects = []
    for b in range(boxes_per_key):
        key = f"CAST(p_partkey AS VARCHAR) || ':{b}'"
        selects.append(f"""
        SELECT p_partkey AS image_id, {b} AS box_id,
          CAST({h32_sql(key + " || ':x'")} % 700 AS DOUBLE) AS x,
          CAST({h32_sql(key + " || ':y'")} % 900 AS DOUBLE) AS y,
          CAST(50 + {h32_sql(key + " || ':w'")} % 550 AS DOUBLE) AS w,
          CAST(20 + {h32_sql(key + " || ':h'")} % 230 AS DOUBLE) AS h
        FROM {table}""")
    union = " UNION ALL ".join(selects)
    akey = "CAST(image_id AS VARCHAR) || ':a:' || CAST(box_id AS VARCHAR)"
    area = f"w * h * (CAST({h32_sql(akey)} % 100 AS DOUBLE) / 100.0)"
    return f"SELECT image_id, box_id, x, y, w, h, {area} AS area FROM ({union})"


# -- P7: basic signature candidate filter -------------------------------------

def p7_filter(boxes: DataFrame) -> DataFrame:
    ar = F.col("w") / F.col("h")
    return boxes.filter((ar > 0.2) & (ar < 5.0)
                        & (F.col("w") > 100) & (F.col("w") < 500)
                        & (F.col("h") > 50) & (F.col("h") < 200))


P7_WHERE = ("(w / h) > 0.2 AND (w / h) < 5.0 AND w > 100 AND w < 500 "
            "AND h > 50 AND h < 200")


# -- P8: v2 filter with density ------------------------------------------------

def p8_filter(boxes: DataFrame, img_w: float = 800.0,
              img_h: float = 1000.0) -> DataFrame:
    ar = F.col("w") / F.col("h")
    density = F.col("area") / (F.col("w") * F.col("h"))
    return boxes.filter(
        (ar > 0.2) & (ar < 5.0) & (F.col("w") > 50) & (F.col("h") > 20)
        & (F.col("w") < 0.8 * img_w) & (F.col("h") < 0.8 * img_h)
        & (density > 0.05) & (density < 0.5))


def p8_where(img_w: float = 800.0, img_h: float = 1000.0) -> str:
    return (f"(w / h) > 0.2 AND (w / h) < 5.0 AND w > 50 AND h > 20 "
            f"AND w < 0.8 * {img_w} AND h < 0.8 * {img_h} "
            f"AND (area / (w * h)) > 0.05 AND (area / (w * h)) < 0.5")


# -- J5: IoU as a pure expression ----------------------------------------------

def iou_expr(prefix_a: str = "a", prefix_b: str = "b"):
    ax1, ay1 = F.col(f"{prefix_a}.x"), F.col(f"{prefix_a}.y")
    ax2, ay2 = ax1 + F.col(f"{prefix_a}.w"), ay1 + F.col(f"{prefix_a}.h")
    bx1, by1 = F.col(f"{prefix_b}.x"), F.col(f"{prefix_b}.y")
    bx2, by2 = bx1 + F.col(f"{prefix_b}.w"), by1 + F.col(f"{prefix_b}.h")
    ix = F.greatest(F.lit(0.0), F.least(ax2, bx2) - F.greatest(ax1, bx1))
    iy = F.greatest(F.lit(0.0), F.least(ay2, by2) - F.greatest(ay1, by1))
    inter = ix * iy
    union = (F.col(f"{prefix_a}.w") * F.col(f"{prefix_a}.h")
             + F.col(f"{prefix_b}.w") * F.col(f"{prefix_b}.h") - inter)
    return F.round(inter / union, 4)


IOU_SQL = """
round(
  greatest(0.0, least(a.x + a.w, b.x + b.w) - greatest(a.x, b.x))
  * greatest(0.0, least(a.y + a.h, b.y + b.h) - greatest(a.y, b.y))
  / (a.w * a.h + b.w * b.h
     - greatest(0.0, least(a.x + a.w, b.x + b.w) - greatest(a.x, b.x))
       * greatest(0.0, least(a.y + a.h, b.y + b.h) - greatest(a.y, b.y))),
  4)
"""


# -- A8: greedy NMS (grouped kernel; no relational equivalent) -------------------

def _nms_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reference semantics (document_detector/main.py:38-98): repeatedly keep
    the largest-AREA box, drop any remaining box with IoU > 0.05 against it
    or fully contained in it."""
    boxes = pdf.assign(_area=pdf.w * pdf.h) \
               .sort_values(["_area", "box_id"], ascending=[False, True])
    kept = []
    rows = boxes.to_dict("records")
    while rows:
        best = rows.pop(0)
        kept.append(best)
        bx1, by1 = best["x"], best["y"]
        bx2, by2 = bx1 + best["w"], by1 + best["h"]
        remain = []
        for r in rows:
            rx1, ry1 = r["x"], r["y"]
            rx2, ry2 = rx1 + r["w"], ry1 + r["h"]
            ix = max(0.0, min(bx2, rx2) - max(bx1, rx1))
            iy = max(0.0, min(by2, ry2) - max(by1, ry1))
            inter = ix * iy
            union = best["w"] * best["h"] + r["w"] * r["h"] - inter
            iou = inter / union if union > 0 else 0.0
            contained = rx1 >= bx1 and ry1 >= by1 and rx2 <= bx2 and ry2 <= by2
            if iou <= 0.05 and not contained:
                remain.append(r)
        rows = remain
    out = pd.DataFrame(kept, columns=list(pdf.columns) + ["_area"])
    return out[["image_id", "box_id", "x", "y", "w", "h"]]


def greedy_nms(boxes: DataFrame) -> DataFrame:
    """Parallel across images; sequential sweep within one image's group."""
    return (boxes.select("image_id", "box_id", "x", "y", "w", "h")
            .groupBy("image_id")
            .applyInPandas(_nms_pandas,
                           "image_id long, box_id int, x double, y double, "
                           "w double, h double"))
