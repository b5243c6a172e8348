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
