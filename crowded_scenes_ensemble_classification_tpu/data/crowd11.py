"""Crowd-11 dataset adapter: database CSV + rgb/flow dirs → typed clip table.

The reference derived labels/scenes by regex over filenames shaped
`{label}_{scene}_{idx}_{name}.mp4` and matched them against the metadata
CSV's `video_name` column (generate_folds.py:56-90, 142-156).  This adapter
produces the typed clip table (`rgbclips_path`, `x/y_axis_flowclips_path`,
`scene_number`, `label`, `video_name`) the rest of the framework consumes —
same matching rules, one pass, no per-fold re-listing.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import pandas as pd

# `{label}_{scene}_{clipidx}_{rest}.{mp4|avi}` (generate_folds.py:61-87)
_CLIP_RE = re.compile(r"^(\d{1,2})_(\d+)_(\d{1,2})_(.*)\.(mp4|avi)$")


def build_clip_table(
    dataset_directory: str,
    database_file: Optional[str] = None,
) -> pd.DataFrame:
    """Scan `{dataset}/rgb` and `{dataset}/flow`, join with the metadata CSV
    when given (columns scene_number / video_name / label), else derive
    scene/label from the filename convention."""
    rgb_dir = os.path.join(dataset_directory, "rgb")
    flow_dir = os.path.join(dataset_directory, "flow")
    videos = sorted(os.listdir(rgb_dir))

    db = None
    if database_file:
        db = pd.read_csv(database_file)
        name_to_row = {
            os.path.splitext(str(r["video_name"]))[0]: r for _, r in db.iterrows()
        }

    rows = []
    for video in videos:
        m = _CLIP_RE.match(video)
        if not m:
            continue
        label, scene = int(m.group(1)), int(m.group(2))
        stem = os.path.splitext(video)[0]
        inner_name = f"{m.group(4)}"
        if db is not None:
            # match against database video_name (which lacks the
            # label_scene_idx prefix, generate_folds.py:65-68)
            row = name_to_row.get(inner_name)
            if row is not None:
                scene = int(row["scene_number"])
                label = int(row["label"])
        rows.append(
            {
                "rgbclips_path": os.path.join(rgb_dir, video),
                "x_axis_flowclips_path": os.path.join(flow_dir, stem + "_x.avi"),
                "y_axis_flowclips_path": os.path.join(flow_dir, stem + "_y.avi"),
                "scene_number": scene,
                "label": label,
                "video_name": video,
            }
        )
    return pd.DataFrame(rows)
