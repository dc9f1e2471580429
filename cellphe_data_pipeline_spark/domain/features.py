"""M4 — per-(cell, frame) static features (SURVEY §2.10).

Reference: frame_features_image.py:57-70 — per frame: load + min-max
normalise the image (A6/F10, :25-26), then per cell present in that
frame (P4, :46) fetch its ROI (J5, :49-54), clip negatives (F9,
:55-56), and call ``cellphe.features.extract_static_features`` [pkg]
(~74 size/shape/boundary/intensity/texture features, Wiseman 2023).

Engine shape: ``applyInPandas`` grouped by (path, frame_index) — the
image is decoded ONCE per frame and all its cells are looped inside the
kernel, exactly the reference's economy. The shuffle key is the frame,
so executor memory is bounded by one image + its ROIs regardless of
corpus size; 721-frame × N-timelapse corpora parallelise frame-wise
(the reference's own speedup axis, README.md:409).

The feature vector here is a REPRESENTATIVE subset (area / centroid /
radius stats / intensity stats / boundary length) computed with real
numpy on the decoded raster — the full 74-feature CellPhe kernel lives
in the public `cellphe` package and would slot into `_cell_features`
unchanged; the engine contract (schema, grouping, normalisation, skip
semantics) is what's tested.

RuntimeError-on-degenerate-cell → skip (frame_features_image.py:66-70):
cells whose clipped ROI has no interior pixels are silently dropped,
matching the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cellphe_data_pipeline_spark.domain.images import decode_frame

STATIC_FEATURE_NAMES = (
    "Area",
    "x",
    "y",
    "Rad_mean",
    "Rad_max",
    "Boundary_len",
    "Int_mean",
    "Int_std",
    "Int_min",
    "Int_max",
    "Int_q25",
    "Int_q75",
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("FrameID", T.IntegerType()),
        T.StructField("CellID", T.IntegerType()),
        T.StructField("ROI_filename", T.StringType()),
    ]
    + [T.StructField(n, T.DoubleType()) for n in STATIC_FEATURE_NAMES]
)


def _cell_features(img: np.ndarray, coords: np.ndarray) -> dict[str, float] | None:
    """Feature kernel for one cell on a [0,1]-normalised image. Returns
    None for degenerate ROIs (reference RuntimeError→skip)."""
    xs = np.clip(coords[:, 0], 0, img.shape[1] - 1)  # F9 clip
    ys = np.clip(coords[:, 1], 0, img.shape[0] - 1)
    if len(xs) < 3:
        return None
    cx, cy = float(xs.mean()), float(ys.mean())
    rad = np.sqrt((xs - cx) ** 2 + (ys - cy) ** 2)
    vals = img[ys, xs].astype("float64")
    return {
        "Area": float(len(np.unique(np.stack([xs, ys], axis=1), axis=0))),
        "x": cx,
        "y": cy,
        "Rad_mean": float(rad.mean()),
        "Rad_max": float(rad.max()),
        "Boundary_len": float(len(xs)),
        "Int_mean": float(vals.mean()),
        "Int_std": float(vals.std()),
        "Int_min": float(vals.min()),
        "Int_max": float(vals.max()),
        "Int_q25": float(np.quantile(vals, 0.25)),
        "Int_q75": float(np.quantile(vals, 0.75)),
    }


def static_features(frames: DataFrame, rois: DataFrame) -> DataFrame:
    """M4: per-(cell, frame) static features.

    `frames`: (path, frame_index, height, width, data=binary container
    payload or raw raster bytes). `rois`: (FrameID, CellID,
    ROI_filename, coords array<struct<x,y>>) — optionally carrying a
    ``path`` column; when present the join keys on (path, FrameID) so
    multiple timelapses in one DataFrame stay separated. Without it the
    rois are assumed to describe a SINGLE timelapse: joining on FrameID
    alone would cross-match identically-numbered frames across paths.
    Output one row per surviving cell-frame with FEATURES_SCHEMA.
    """
    roi_cols = ["FrameID", "CellID", "ROI_filename", "coords"]
    if "path" in rois.columns:
        join_keys = ["path", "FrameID"]
        roi_cols = ["path"] + roi_cols
    else:
        join_keys = ["FrameID"]
    tagged = frames.select(
        "path",
        F.col("frame_index").alias("FrameID"),
        "height",
        "width",
        "data",
    ).join(rois.select(*roi_cols), join_keys)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        raw = first["data"]
        if bytes(raw[:5]) == b"FAKE1":
            img = decode_frame(bytes(raw))[0].astype("float64")
        else:
            img = np.frombuffer(raw, dtype=np.uint8).reshape(
                first["height"], first["width"]
            ).astype("float64")
        lo, hi = img.min(), img.max()  # A6+F10 min-max normalise once/frame
        if hi > lo:
            img = (img - lo) / (hi - lo)
        rows = []
        for _, r in pdf.iterrows():
            coords = np.array([(c["x"], c["y"]) for c in r["coords"]], dtype="int64")
            feats = _cell_features(img, coords)
            if feats is None:
                continue  # degenerate ROI skip
            rows.append(
                {
                    "path": r["path"],
                    "FrameID": int(r["FrameID"]),
                    "CellID": int(r["CellID"]),
                    "ROI_filename": r["ROI_filename"],
                    **feats,
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return tagged.groupBy("path", "FrameID").applyInPandas(kernel, FEATURES_SCHEMA)
