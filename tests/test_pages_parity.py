"""Input-table invariant: the Spark pages synthesis and the DuckDB
oracle CTE produce byte-identical rows (text per url — the
BASELINE.json input_hint per-row invariant — plus every other
column)."""

from __future__ import annotations

from sagan_spark.pages import load_pages, pages_with

from .conftest import SF_DIR


def test_pages_text_byte_identical_per_url(spark, duck):
    sdf = (
        load_pages(spark, SF_DIR, rep=4)
        .select("url", "domain", "warc_epoch", "text", "lang", "source")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    ddf = (
        duck.execute(
            pages_with(rep=4)
            + " SELECT url, domain, warc_epoch, text, lang, source FROM pages ORDER BY url"
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    assert len(sdf) == len(ddf) and len(sdf) > 0
    for col in ["url", "domain", "warc_epoch", "text", "lang", "source"]:
        mism = (sdf[col].astype(str) != ddf[col].astype(str))
        assert not mism.any(), (
            col,
            sdf.loc[mism, ["url", col]].head(3).to_dict(),
            ddf.loc[mism, ["url", col]].head(3).to_dict(),
        )


def test_pages_have_triggers(spark):
    df = load_pages(spark, SF_DIR, rep=2).limit(200).toPandas()
    assert df["text"].str.contains(" src=10.", regex=False).all()
    assert df["text"].str.contains("port ").any()
    assert df["text"].str.contains("hash=").any()
    assert df["text"].str.contains('"svc"').any()
    # html embeds text
    row = df.iloc[0]
    assert bytes(row["html"]).decode("utf-8") == f"<html><body>{row['text']}</body></html>"


def _iceberg_available(spark) -> bool:
    """True iff an Iceberg runtime jar is on the session classpath."""
    try:
        spark.read.format("iceberg").load("nosuch.db.tbl")
        return True
    except Exception as e:  # noqa: BLE001 — classify by message
        s = str(e)
        return "DATA_SOURCE_NOT_FOUND" not in s and "Failed to find" not in s


def test_pages_table_iceberg_switch(spark, tmp_path):
    """SURVEY §2.1 S1: the production read path is
    spark.read.format('iceberg').load(tbl).  The sandbox ships no
    Iceberg jar, so this leg SKIPS unless one is present; the argument
    contract (fmt validation) is asserted either way."""
    import pytest

    from sagan_spark.pages import pages_table

    with pytest.raises(ValueError, match="iceberg_table"):
        pages_table(spark, SF_DIR, fmt="iceberg")
    with pytest.raises(ValueError, match="unsupported"):
        pages_table(spark, SF_DIR, fmt="orc")
    if not _iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the classpath")
    # jar present: a catalog-configured session can read a real table;
    # without catalog config the DataSource at least resolves
    df = pages_table(spark, SF_DIR, rep=1)
    assert df.count() > 0
