"""dbt-style unit tests and seeds (SURVEY §5 parity).

The reference ships EMPTY ``tests/`` and ``seeds/`` directories — the
dbt features a user of that project would reach for next. This module
supplies the engine-side equivalents:

* **Unit tests** (dbt 1.8 ``unit_tests:`` blocks): run a model against
  MOCKED inputs and diff the output against expected rows. The dbt
  ergonomics are preserved — mock rows specify only the columns the
  test cares about (everything else NULL-fills from the declared
  schema), and the compare is order-insensitive with an exact
  row-multiset diff (missing vs unexpected reported separately).
* **Seeds** (dbt ``seed`` materialization): a CSV becomes a committed
  table through the SAME manifest protocol as every other
  materialization (atomic pointer swap, stats, vacuum) — not a side
  channel.

Scale notes: unit tests run on mocked literal inputs by design (driver
LocalRelations — they never touch the lake); the diff is two EXCEPT
ALL-style anti joins, so even an accidentally-large expectation stays
distributed. Seeds are small by definition (dbt guidance), but the
manifest commit keeps them transactional next to 100 TB neighbors.
"""

from __future__ import annotations

import csv as _csv
import io
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mock_input(
    spark: SparkSession, schema_ddl: str, rows: list[dict]
) -> DataFrame:
    """Build a mocked input relation from partial row dicts — dbt unit
    tests' ``given:`` blocks: columns not mentioned by the test NULL-fill,
    so fixtures state only what the test is about."""
    schema = T._parse_datatype_string(schema_ddl)
    names = [f.name for f in schema.fields]
    unknown = {k for r in rows for k in r} - set(names)
    if unknown:
        raise ValueError(f"mock rows reference undeclared columns: {sorted(unknown)}")
    filled = [tuple(r.get(n) for n in names) for r in rows]
    return spark.createDataFrame(filled, schema)


def run_unit_test(
    actual: DataFrame,
    spark: SparkSession,
    expect_schema: str,
    expect_rows: list[dict],
    *,
    compare_cols: list[str] | None = None,
) -> dict:
    """Diff a model's output against expected rows (order-insensitive,
    exact multiset): returns {'passed', 'n_actual', 'n_expected',
    'n_missing', 'n_unexpected'} — missing = expected rows the model
    didn't produce, unexpected = produced rows the expectation lacks.
    ``compare_cols`` restricts the comparison (dbt's column subset)."""
    expected = mock_input(spark, expect_schema, expect_rows)
    cols = compare_cols or expected.columns
    a = actual.select(*cols)
    e = expected.select(*cols)
    n_missing = e.exceptAll(a).count()
    n_unexpected = a.exceptAll(e).count()
    return {
        "passed": n_missing == 0 and n_unexpected == 0,
        "n_actual": a.count(),
        "n_expected": e.count(),
        "n_missing": n_missing,
        "n_unexpected": n_unexpected,
    }


def seed(
    runner,
    name: str,
    csv_text: str,
    *,
    column_types: dict[str, str] | None = None,
) -> dict:
    """dbt ``seed``: materialize a CSV as a committed table via the
    manifest protocol (full-refresh CTAS semantics — re-seeding replaces).
    ``column_types`` mirrors dbt's ``config(column_types=...)`` —
    unlisted columns stay strings, exactly dbt's default."""
    from mycarely_saas_dbt_spark.incremental import ModelSpec

    reader = _csv.reader(io.StringIO(csv_text.strip()))
    rows = list(reader)
    header, data = rows[0], rows[1:]
    spark = runner.spark
    df = spark.createDataFrame(
        [tuple(r) for r in data], ", ".join(f"`{c}` string" for c in header)
    )
    for c, t in (column_types or {}).items():
        if c not in header:
            raise ValueError(f"column_types references unknown column {c!r}")
        df = df.withColumn(c, F.col(c).cast(t))
    df = df.select(*header)

    def build(sp, sfd, wm):
        return df

    spec = ModelSpec(name=name, unique_key=header[0], watermark_col=header[0], build=build)
    n = runner._atomic_write(spec, df)
    return {"model": name, "mode": "seed", "rows_written": n}


# ---------------------------------------------------------------------------
# Driver-entry demonstrations (oracle-checked end to end)
# ---------------------------------------------------------------------------

_SEED_CSV = """id,country,region,launch_date
1,us,amer,2024-01-05
2,de,emea,2024-02-10
3,jp,apac,2024-03-15
4,fr,emea,2024-04-20
"""


def q_seed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed a CSV through the manifest commit and read it back typed —
    proves the dbt seed materialization end to end (CSV → typed table →
    committed manifest → read_target)."""
    import tempfile

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.util import materialize

    root = tempfile.mkdtemp(prefix="mycarely_seed_")
    try:
        runner = IncrementalRunner(spark, root)
        seed(
            runner,
            "country_map",
            _SEED_CSV,
            column_types={"id": "bigint", "launch_date": "date"},
        )
        return materialize(runner.read_target("country_map"))
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


O_SEED_ROUNDTRIP = """
SELECT * FROM (VALUES
    (CAST(1 AS BIGINT), 'us', 'amer', DATE '2024-01-05'),
    (2, 'de', 'emea', DATE '2024-02-10'),
    (3, 'jp', 'apac', DATE '2024-03-15'),
    (4, 'fr', 'emea', DATE '2024-04-20')
) t(id, country, region, launch_date)
"""


def q_unit_test_traffic_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real dbt-1.8-style unit test of the traffic_pages model: mocked
    atomic-events input (only the columns the test is about — the rest
    NULL-fill), expected rows asserted both directions. Cases: the bot
    filter (a 'Googlebot' useragent must drop before the rollup, and the
    NULL-dropping `!=`/NOT ILIKE semantics require refr_medium/useragent
    set — SURVEY B6), the total-vs-unique stack unpivot, and a negative
    control proving the harness actually fails on a wrong expectation.
    The per-case verdict rows are the entry's output, so a harness
    regression flips the driver hash."""
    import datetime as dtm

    from mycarely_saas_dbt_spark.plans.traffic_pages import traffic_pages_agg

    ev_schema = (
        "app_id string, collector_tstamp timestamp, event string, "
        "domain_userid string, page_urlpath string, useragent string, "
        "br_family string, page_urlhost string, refr_medium string, "
        "mkt_medium string, mkt_source string, mkt_campaign string, "
        "refr_urlhost string, refr_source string"
    )

    def pv(ts_hour, user, ua):
        return {
            "app_id": "mycarely.io",
            "collector_tstamp": dtm.datetime(2024, 1, 5, ts_hour, 0, 0),
            "event": "page_view",
            "domain_userid": user,
            "page_urlpath": "/pricing",
            "useragent": ua,
            "refr_medium": "search",
        }

    mocked = mock_input(
        spark,
        ev_schema,
        [
            pv(10, "u1", "Mozilla"),
            pv(11, "u1", "Mozilla"),
            pv(12, "u2", "Mozilla"),
            pv(13, "bot1", "Googlebot/2.1"),  # must drop at the bot gate
        ],
    )
    out = traffic_pages_agg(spark, sf_dir, events=mocked, id_strategy="hash")
    expect_schema = "date date, type string, page_urlpath string, traffic bigint"
    cols = ["date", "type", "page_urlpath", "traffic"]
    day = dtm.date(2024, 1, 5)
    r1 = run_unit_test(
        out,
        spark,
        expect_schema,
        [
            {"date": day, "type": "all", "page_urlpath": "/pricing", "traffic": 3},
            {"date": day, "type": "unique", "page_urlpath": "/pricing", "traffic": 2},
        ],
        compare_cols=cols,
    )
    # negative control: the bot counted into 'all' must FAIL the diff
    r2 = run_unit_test(
        out,
        spark,
        expect_schema,
        [
            {"date": day, "type": "all", "page_urlpath": "/pricing", "traffic": 4},
            {"date": day, "type": "unique", "page_urlpath": "/pricing", "traffic": 2},
        ],
        compare_cols=cols,
    )
    rows = [
        ("bot_filter_and_unpivot", r1["passed"], r1["n_missing"], r1["n_unexpected"]),
        ("negative_control_fails", not r2["passed"], r2["n_missing"], r2["n_unexpected"]),
    ]
    return spark.createDataFrame(
        rows, "case string, ok boolean, n_missing bigint, n_unexpected bigint"
    )


O_UNIT_TEST_TP = """
SELECT * FROM (VALUES
    ('bot_filter_and_unpivot', TRUE, CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
    ('negative_control_fails', TRUE, 1, 1)
) t("case", ok, n_missing, n_unexpected)
"""


def register_queries(register) -> None:
    register("seed_roundtrip", q_seed_roundtrip, O_SEED_ROUNDTRIP)
    register("unit_test_traffic_pages", q_unit_test_traffic_pages, O_UNIT_TEST_TP)
