"""SafeGraph open-census demographic feature loaders.

File-format-compatible rebuilds of the reference loaders
(``pygcn/utils.py:135-257``): per-MSA pandas merges over the open-census CSVs
producing population, elder ratio, mean household income, and essential-worker
ratio per CBG, plus pretrained node embeddings. Paths/columns follow the
SafeGraph open-census layout the reference expects.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import pandas as pd

from pygcn_tpu.sim import calibration


def load_cbg_ids(msa_name: str, mob_data_root: str) -> pd.DataFrame:
    """CBG ids for an MSA (reference ``pygcn/utils.py:239-242``)."""
    full = calibration.MSA_NAME_FULL_DICT[msa_name]
    df = pd.read_csv(os.path.join(mob_data_root, msa_name, f"{full}_cbg_ids.csv"))
    return df.rename(columns={"cbg_id": "census_block_group"})


def load_cbg_age(mob_data_root: str, cbg_ids_msa: pd.DataFrame):
    """Population sizes + elder ratio from ACS B01001
    (reference ``pygcn/utils.py:146-184``): male column ``B01001e{i}`` pairs
    with female ``B01001e{i+24}`` for i in 3..25; elders are 70+."""
    path = os.path.join(mob_data_root, "safegraph_open_census_data/data/cbg_b01.csv")
    agesex = pd.read_csv(path)
    df = pd.merge(cbg_ids_msa, agesex, on="census_block_group", how="left")
    df = df.fillna(0)

    total = df["B01001e1"].to_numpy(np.float64)
    total = np.where(total == 0, 1.0, total)

    ages = {}
    for i in range(3, 26):
        label = calibration.DETAILED_AGE_LIST[i - 3]
        ages[label] = df[f"B01001e{i}"].to_numpy(np.float64) + df[
            f"B01001e{i + 24}"
        ].to_numpy(np.float64)

    elder_labels = [l for l in calibration.DETAILED_AGE_LIST if l in (
        "70 To 74 Years", "75 To 79 Years", "80 To 84 Years", "85 Years And Over")]
    elder = sum(ages[l] for l in elder_labels)
    elder_ratio = elder / total

    sizes = total.astype(np.int32)
    return sizes, sizes.copy(), elder_ratio


def load_cbg_income(mob_data_root: str, cbg_ids_msa: pd.DataFrame) -> np.ndarray:
    """Mean household income (reference ``pygcn/utils.py:187-207``)."""
    path = os.path.join(
        mob_data_root, "safegraph_open_census_data/data/ACS_5years_Income_Filtered_Summary.csv"
    )
    income = pd.read_csv(path)
    income = income.drop(columns=["Unnamed: 0"], errors="ignore")
    df = pd.merge(cbg_ids_msa, income, on="census_block_group", how="left").fillna(0)
    col = "mean_household_income" if "mean_household_income" in df.columns else "Mean_Household_Income"
    return df[col].to_numpy(np.float64)


def load_cbg_occupation(
    mob_data_root: str, cbg_ids_msa: pd.DataFrame, cbg_sizes: np.ndarray
) -> np.ndarray:
    """Essential-worker ratio weighted by per-occupation rates
    (reference ``pygcn/utils.py:210-234``)."""
    path = os.path.join(mob_data_root, "safegraph_open_census_data/data/cbg_c24.csv")
    occ = pd.read_csv(path)
    df = pd.merge(cbg_ids_msa, occ, on="census_block_group", how="left")

    ew_abs = np.zeros(len(df), np.float64)
    for col, rate in calibration.ew_rate_dict.items():
        if col in df.columns:
            ew_abs += df[col].fillna(0).to_numpy(np.float64) * rate
    ratio = ew_abs / np.asarray(cbg_sizes, np.float64)
    return np.nan_to_num(ratio)


def load_cbg_demographics(
    msa_name: str, mob_data_root: str
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Orchestrate the per-MSA demographic merge
    (reference ``pygcn/utils.py:237-257``); returns column vectors
    (sizes, elder_ratio, household_income, ew_ratio), each [N, 1]."""
    ids = load_cbg_ids(msa_name, mob_data_root)
    sizes, sizes_orig, elder = load_cbg_age(mob_data_root, ids)
    income = load_cbg_income(mob_data_root, ids)
    ew = load_cbg_occupation(mob_data_root, ids, sizes_orig)
    return (
        sizes.reshape(-1, 1).astype(np.float64),
        elder.reshape(-1, 1),
        income.reshape(-1, 1),
        ew.reshape(-1, 1),
    )


def load_pretrained_embed(path: str) -> Tuple[np.ndarray, int]:
    """Pretrained node embeddings ``.npy`` (reference ``pygcn/utils.py:135-143``)."""
    embed = np.load(path)
    return embed, embed.shape[1]
