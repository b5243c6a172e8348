"""Driver-loop simulation: every ``queries()`` entry vs its
``oracle_sql()`` twin on the sf0.01 tables (row count + order-
insensitive value equality) — mirrors CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entrymod

from .conftest import SF_DIR_MED, duck_con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: "" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERY_NAMES = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    qfn = entrymod.queries()[name]
    osql = entrymod.oracle_sql()[name]
    got = _norm(qfn(spark, SF_DIR_MED).toPandas())
    exp = _norm(duck_con(SF_DIR_MED).execute(osql).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    assert len(got) > 0, f"{name}: empty result"
    mism = (got != exp).any(axis=1)
    assert not mism.any(), (
        f"{name}: {int(mism.sum())} mismatching rows; first:\n"
        f"spark={got[mism].head(3).to_dict()}\nduck={exp[mism].head(3).to_dict()}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"sink", "signature_id", "n"} <= set(df.columns)
