"""Ground-truth vaccination-result CSV parsing and splits.

Mirrors reference ``load_vac_results`` (``pygcn/utils.py:31-90``) and the
multi-CSV combine+dedup step of the evaluator trainer
(``pygcn/gnn-over-mlp.py:108-142``):

- row 0 of each CSV is the no-vaccination baseline;
- ``Vaccinated_Idxs`` holds a stringified int list per policy sample;
- labels are ``[Total_Cases, Case_Rates_STD]`` (+ ``Total_Deaths,
  Death_Rates_STD`` when present), optionally offset by the no-vac baseline;
- the split is the reference's quirky seed-42 shuffled 80/10/10 where **test
  is the middle slice and val the last**.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd


@dataclasses.dataclass
class VacResults:
    graph_labels: np.ndarray  # [num_samples, 2 or 4] float32
    idx_train: np.ndarray
    idx_val: np.ndarray
    idx_test: np.ndarray
    num_samples: int
    vac_tags: List[np.ndarray]  # per-sample vaccinated CBG index lists
    baseline: Optional[dict]  # no-vaccination row values


_LABEL_COLS4 = ["Total_Cases", "Case_Rates_STD", "Total_Deaths", "Death_Rates_STD"]
_LABEL_COLS2 = ["Total_Cases", "Case_Rates_STD"]


def _parse_idx_list(s: str) -> np.ndarray:
    s = s.strip().strip("[").strip("]")
    if not s:
        return np.zeros(0, np.int64)
    return np.array([int(v) for v in s.split(", ")], np.int64)


def load_vac_results(path, rel_result: bool = True, seed: int = 42) -> VacResults:
    df = pd.read_csv(path)
    num_samples = len(df) - 1

    baseline = None
    try:
        baseline = {
            "Total_Cases": float(df["Total_Cases"].iloc[0]),
            "Case_Rates_STD": float(df["Case_Rates_STD"].iloc[0]),
        }
        if "Total_Deaths" in df.columns:
            baseline["Total_Deaths"] = float(df["Total_Deaths"].iloc[0])
            baseline["Death_Rates_STD"] = float(df["Death_Rates_STD"].iloc[0])
    except (KeyError, ValueError):
        pass

    df = df.iloc[1:]
    vac_tags = [_parse_idx_list(s) for s in df["Vaccinated_Idxs"]]

    cols = _LABEL_COLS4 if "Total_Deaths" in df.columns else _LABEL_COLS2
    labels = df[cols].to_numpy(np.float32)
    if rel_result and baseline is not None:
        labels = labels - np.array([baseline[c] for c in cols], np.float32)

    shuffled = np.arange(num_samples)
    rng = np.random.RandomState(seed)
    rng.shuffle(shuffled)
    n80, n90 = int(0.8 * num_samples), int(0.9 * num_samples)
    idx_train = shuffled[:n80]
    idx_test = shuffled[n80:n90]  # reference keeps test as the middle slice
    idx_val = shuffled[n90:]

    return VacResults(
        graph_labels=labels,
        idx_train=idx_train.astype(np.int64),
        idx_val=idx_val.astype(np.int64),
        idx_test=idx_test.astype(np.int64),
        num_samples=num_samples,
        vac_tags=vac_tags,
        baseline=baseline,
    )


def combine_vac_results(paths: Sequence, out_path=None) -> pd.DataFrame:
    """Concatenate multiple gt CSVs and drop duplicate rows
    (reference ``pygcn/gnn-over-mlp.py:131-142``)."""
    frames = [pd.read_csv(p) for p in paths]
    combined = pd.concat(frames, axis=0).drop_duplicates()
    if out_path is not None:
        combined.to_csv(out_path, index=False)
    return combined
