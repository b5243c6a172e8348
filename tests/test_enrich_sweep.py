"""flatten_ranges sweep: equivalence to the naive O(bounds×rows) spec
on random nested CIDR sets, plus a driver-time bound at 100 k ranges
(the real-GeoIP2-table scale the naive version could not handle)."""

from __future__ import annotations

import random
import time

from sagan_spark.enrich.enrich import bucketed_geo_rows, flatten_ranges


def naive_flatten(rows):
    """The original per-segment scan — kept here as the executable spec."""
    bounds = sorted({b for s, e, _, _ in rows for b in (s, e + 1)})
    out = []
    for lo, hi in zip(bounds, bounds[1:]):
        best = None
        for s, e, plen, cc in rows:
            if s <= lo and hi - 1 <= e and (best is None or plen > best[0]):
                best = (plen, cc)
        if best is not None:
            if out and out[-1][1] == lo - 1 and out[-1][2] == best[1]:
                out[-1] = (out[-1][0], hi - 1, best[1])
            else:
                out.append((lo, hi - 1, best[1]))
    return out


def random_cidrs(rng: random.Random, n: int, space: int = 1 << 32):
    """Aligned CIDR blocks with heavy nesting + duplicates + equal-plen
    overlaps (exercises the tie-break)."""
    rows = []
    for i in range(n):
        plen = rng.choice([8, 12, 16, 20, 24, 28, 32])
        size = 1 << (32 - plen)
        start = (rng.randrange(space) // size) * size
        rows.append((start, start + size - 1, plen, f"C{i % 7}"))
    return rows


def test_sweep_matches_naive_random():
    rng = random.Random(1234)
    for trial in range(25):
        rows = random_cidrs(rng, rng.randint(1, 60), space=1 << 20)
        assert flatten_ranges(rows) == naive_flatten(rows), rows


def test_sweep_matches_naive_edges():
    assert flatten_ranges([]) == []
    # identical ranges, different plen is impossible for CIDRs but the
    # function is generic — first-in-input wins on equal plen
    rows = [(0, 15, 28, "A"), (0, 15, 28, "B")]
    assert flatten_ranges(rows) == naive_flatten(rows) == [(0, 15, "A")]
    # disjoint + adjacent same-cc merge
    rows = [(0, 7, 29, "A"), (8, 15, 29, "A"), (32, 47, 28, "B")]
    assert flatten_ranges(rows) == naive_flatten(rows)
    # nested /24 beats its /16
    rows = [(0, 65535, 16, "US"), (256, 511, 24, "DE")]
    assert flatten_ranges(rows) == naive_flatten(rows) == [
        (0, 255, "US"),
        (256, 511, "DE"),
        (512, 65535, "US"),
    ]


def test_sweep_100k_ranges_fast():
    rng = random.Random(7)
    rows = random_cidrs(rng, 100_000)
    t0 = time.time()
    flat = flatten_ranges(rows)
    dt = time.time() - t0
    assert dt < 5.0, f"driver preprocessing took {dt:.1f}s"
    # disjoint + sorted invariants
    for (s1, e1, _), (s2, e2, _) in zip(flat, flat[1:]):
        assert s1 <= e1 and e1 < s2 and s2 <= e2
    # bucket expansion stays broadcast-sized (≤ 65536 + n rows)
    buckets = bucketed_geo_rows(rows)
    assert len(buckets) <= 65536 + len(flat)


def test_ipv6_hex_twins_agree_on_malformed(spark):
    """Engine and oracle must map the same inputs to the same hex or
    the same NULL — including multi-'::' malformed addresses, where the
    pre-r4 twins disagreed (Spark kept left-of-first/right-of-LAST
    '::', DuckDB the element after the FIRST '::')."""
    import duckdb
    from pyspark.sql import functions as F

    from sagan_spark.enrich.enrich import ipv6_hex_col, ipv6_hex_sql

    cases = [
        "2001:db8::1",
        "2001:db8:0:0:1:2:3:4",
        "::1",
        "1::2::3",          # multi-elision → NULL in BOTH twins
        "::2::",            # multi-elision → NULL
        "1:2:3:4:5:6:7:8:9",  # too many groups → NULL
        "10.0.0.1",         # v4 → NULL
        "nonsense",
    ]
    sdf = spark.createDataFrame([(c,) for c in cases], "ip string")
    got = {
        r["ip"]: r["h"]
        for r in sdf.withColumn("h", ipv6_hex_col("ip")).collect()
    }
    con = duckdb.connect()
    for c in cases:
        exp = con.execute(f"SELECT {ipv6_hex_sql(repr(c))}").fetchone()[0]
        assert got[c] == exp, (c, got[c], exp)
    assert got["2001:db8::1"] is not None
    assert got["1::2::3"] is None and got["::2::"] is None
