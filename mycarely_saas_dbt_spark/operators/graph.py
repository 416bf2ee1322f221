"""Graph analytics over the event click-graph (SURVEY §8 extension).

The reference has no graph surface; this family extends the engine the
same way the dedup/ANN/text families do — the entity graph a marketing
pipeline actually derives from its event stream. Nodes are the events'
``props.k`` values (the tracked entity id), edges are per-user temporal
transitions: consecutive events of one user link k_i → k_{i+1}, weighted
by transition count — the standard clickstream graph build (one
lag-window pass per user, the sessionize shuffle shape).

PageRank is kept in EXACT INTEGER arithmetic (the repo's cross-engine
bit-stability pattern — see tfidf/bm25): ranks are parts-per-billion
fixed-point, every division an integer DIV, so 3 iterations hash-match
DuckDB exactly. Damping 0.85 as the rational 85/100; dangling-node mass
is dropped (the Brin/Page variant that renormalizes implicitly —
documented, identical in the oracle).

Scale notes (100 TB):
  * the edge build is ONE shuffle on user_id (lag window) + one
    map-combinable (src, dst) count — the sessionize cost, reused.
  * per iteration: edges ⋈ ranks on src (ranks broadcast here — node
    relations are ~|V| ≪ |E|; at web scale with |V| beyond broadcast,
    co-partition edges and ranks on src and this becomes a zero-extra-
    shuffle join), then one map-combinable per-dst sum. 3 fixed
    iterations = 3 cheap passes over the persisted edge relation.
  * integer fixed-point is the contract harness; a production ranker
    at 1e9 nodes runs the same plan on doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.sources.registry import register_sources

PR_SCALE = 1_000_000_000   # rank fixed-point: parts-per-billion
PR_ITERS = 3
# Driver-residency bound for the rank vector (mirrors CC_DRIVER_MAX in
# dedup.py): below it the plan-flattening driver-dict path runs (each
# iteration = one flat job, the measured 30s→6s win at sf0.1); above it
# — or with MYCARELY_PR_DRIVER=0 — the co-partitioned DataFrame
# iteration below keeps the rank vector distributed. ~2e6 nodes ≈ 32 MB
# of (int, long) pairs, the same bounded-collect budget as CC.
PR_DRIVER_MAX = 2_000_000
_K_PATTERN = '"k": (\\d+)'


def _edges(spark: SparkSession) -> DataFrame:
    ev = spark.table("events").select(
        "user_id", "ts", "event_id",
        F.regexp_extract("props", _K_PATTERN, 1).cast("int").alias("node"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("src", F.lag("node").over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("node").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the click-transition graph, PR_ITERS fixed
    iterations, parts-per-billion integer ranks (hash-exact vs DuckDB).

    r_0(v)   = SCALE DIV |V|
    r_k+1(v) = (15*SCALE) DIV (100*|V|)
               + (85 * Σ_{u→v} (r_k(u) * w_uv) DIV out_u) DIV 100
    """
    from mycarely_saas_dbt_spark.util import bounded_persist

    register_sources(spark, sf_dir)
    # out_w via a window over the edge relation itself (r14 opt, guide
    # §2.1): the former self-join built _edges() twice — two full event
    # scans and two lag-window shuffles feeding a third join shuffle —
    # all before the persist could help. sum(w) OVER (PARTITION BY src)
    # reads the one edge build and adds a single src-hash exchange;
    # inner-join-on-src row set is identical (every src matches its own
    # aggregate).
    w_src = Window.partitionBy("src")
    edges = bounded_persist(
        _edges(spark).withColumn("out_w", F.sum("w").over(w_src)),
        "graph:edges",
    )
    # Per-iteration rank LOCALIZATION (the PQ/k-means plan-flattening
    # pattern): below PR_DRIVER_MAX nodes the rank vector is
    # metadata-scale, so each step is one flat job over the persisted
    # edge relation with the previous ranks as a broadcast LocalRelation
    # — a lazily chained formulation re-executed the whole lineage per
    # iteration (measured 30s vs ~6s at sf0.1). Above the bound (or with
    # MYCARELY_PR_DRIVER=0) the co-partitioned DataFrame path keeps the
    # rank vector distributed — same per-iteration join shape, only the
    # state residency changes; pytest pins both paths label-identical.
    import os

    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    nn = nodes.count()
    if nn == 0:  # no 2-event user / no parseable node: oracle emits 0 rows
        return spark.createDataFrame([], "node int, rank_ppb bigint")
    base = (15 * PR_SCALE) // (100 * nn)
    if nn <= PR_DRIVER_MAX and os.environ.get("MYCARELY_PR_DRIVER", "1") != "0":
        node_rows = sorted(r["node"] for r in nodes.collect())
        ranks = {n: PR_SCALE // nn for n in node_rows}
        for _ in range(PR_ITERS):
            rdf = F.broadcast(
                spark.createDataFrame(
                    [(n, r) for n, r in ranks.items()], "node int, r bigint"
                )
            )
            contrib = (
                edges.join(rdf, edges["src"] == rdf["node"])
                .select("dst", F.expr("(r * w) DIV out_w").cast("long").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            sums = {row["dst"]: row["s"] for row in contrib.collect()}
            ranks = {n: base + (85 * sums.get(n, 0)) // 100 for n in node_rows}
        return spark.createDataFrame(
            sorted(ranks.items()), "node int, rank_ppb bigint"
        )
    # Distributed path: ranks live as a DataFrame partitioned on the join
    # key. localCheckpoint per iteration truncates lineage (and preserves
    # the physical partitioning in the LogicalRDD), so each iteration is
    # one ranks-side shuffle joined to the persisted edges — never a
    # driver collect of |V| state.
    ranks_df = nodes.repartition("node").withColumn(
        "r", F.lit(PR_SCALE // nn).cast("long")
    ).localCheckpoint()
    for _ in range(PR_ITERS):
        ranks_df = _pr_step(edges, ranks_df, nodes, base).localCheckpoint()
    return ranks_df.select("node", F.col("r").alias("rank_ppb"))


def _pr_step(
    edges: DataFrame, ranks: DataFrame, nodes: DataFrame, base: int
) -> DataFrame:
    """One distributed PageRank iteration: edges ⋈ ranks on src →
    per-dst contribution sum → left join back onto the node set. Same
    integer fixed-point arithmetic as the driver path (non-negative
    operands, so BIGINT DIV ≡ Python //)."""
    contrib = (
        edges.join(ranks, edges["src"] == ranks["node"])
        .select("dst", F.expr("(r * w) DIV out_w").cast("long").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    return nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
        nodes["node"],
        (F.lit(base) + F.expr("(85 * coalesce(s, 0)) DIV 100"))
        .cast("long")
        .alias("r"),
    )


def _pr_oracle() -> str:
    base = f"""
WITH ev AS (
    SELECT user_id, ts, event_id,
           CAST(regexp_extract(props, '{_K_PATTERN}', 1) AS INT) AS node
    FROM events
),
tr AS (
    SELECT LAG(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
           node AS dst
    FROM ev
),
edges AS (
    SELECT src, dst, COUNT(*) AS w FROM tr WHERE src IS NOT NULL
    GROUP BY src, dst
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*) AS nn FROM nodes),
outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) // nn AS r FROM nodes CROSS JOIN nn)"""
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        base += f""",
c{i} AS (
    SELECT e.dst, SUM((p.r * e.w) // o.out_w) AS s
    FROM edges e JOIN {prev} p ON p.node = e.src JOIN outw o ON o.src = e.src
    GROUP BY e.dst
),
r{i} AS (
    SELECT n.node,
           (15 * CAST({PR_SCALE} AS BIGINT)) // (100 * nn.nn)
           + (85 * COALESCE(c.s, 0)) // 100 AS r
    FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node CROSS JOIN nn
)"""
        prev = f"r{i}"
    return base + f"""
SELECT node, CAST(r AS BIGINT) AS rank_ppb FROM {prev}
"""


def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node degree summary of the click graph (the health check run
    before any iterative algorithm): weighted in/out degree and distinct
    neighbor counts — two map-combinable rollups over ONE persisted edge
    relation (without the persist, the lag-window pass and (src, dst)
    count would execute once per side of the full join)."""
    from mycarely_saas_dbt_spark.util import bounded_persist

    register_sources(spark, sf_dir)
    edges = bounded_persist(_edges(spark), "graph:deg_edges")
    o = edges.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").cast("long").alias("out_w"),
        F.count(F.lit(1)).cast("long").alias("out_deg"),
    )
    i = edges.groupBy(F.col("dst").alias("node")).agg(
        F.sum("w").cast("long").alias("in_w"),
        F.count(F.lit(1)).cast("long").alias("in_deg"),
    )
    return (
        o.join(i, "node", "full")
        .select(
            "node",
            F.coalesce("out_w", F.lit(0)).alias("out_w"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_w", F.lit(0)).alias("in_w"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


O_DEGREE = f"""
WITH ev AS (
    SELECT user_id, ts, event_id,
           CAST(regexp_extract(props, '{_K_PATTERN}', 1) AS INT) AS node
    FROM events
),
tr AS (
    SELECT LAG(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
           node AS dst
    FROM ev
),
edges AS (
    SELECT src, dst, COUNT(*) AS w FROM tr WHERE src IS NOT NULL
    GROUP BY src, dst
),
o AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS out_w,
             COUNT(*) AS out_deg FROM edges GROUP BY src),
i AS (SELECT dst AS node, CAST(SUM(w) AS BIGINT) AS in_w,
             COUNT(*) AS in_deg FROM edges GROUP BY dst)
SELECT COALESCE(o.node, i.node) AS node,
       COALESCE(out_w, 0) AS out_w,
       CAST(COALESCE(out_deg, 0) AS BIGINT) AS out_deg,
       COALESCE(in_w, 0) AS in_w,
       CAST(COALESCE(in_deg, 0) AS BIGINT) AS in_deg
FROM o FULL JOIN i ON o.node = i.node
"""


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient over the
    undirected click graph, via DEGREE-ORDERED edge orientation (the
    standard scale technique): every undirected edge is directed from
    its lower-(degree, id) endpoint to the higher one, so each triangle
    is generated exactly once and — the 100 TB property — a high-degree
    hub acquires almost no OUT-edges, which bounds the wedge self-join
    at ~O(E^1.5) instead of the hub-degree-squared blowup a naive
    node-id orientation hits on skewed graphs. Plan: persisted oriented
    edge relation, one self-join on the wedge apex, one closing
    equi-join on (v, w), map-combinable counts. Clustering coefficient
    is integer parts-per-billion (3*triangles*1e9 DIV wedges) for
    cross-engine bit-stability."""
    from mycarely_saas_dbt_spark.util import bounded_persist, release_persists

    register_sources(spark, sf_dir)
    e = _edges(spark)
    und = (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    und = bounded_persist(und, "graph:tri_und")
    # n_edges FIRST: the entry needs this exact scalar anyway, and the
    # count is the action that MATERIALIZES the persisted und — so the
    # deg aggregate and both orientation broadcasts below read cached
    # blocks instead of racing three concurrent rebuilds of the
    # events-window edge pass (r15; the profile showed two ~0.65s
    # broadcast-future jobs each recomputing und)
    n_edges = und.count()
    deg = bounded_persist(
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg")),
        "graph:tri_deg",
    )
    # n_nodes / n_wedges materialize the deg persist the same way, so the
    # da/db broadcasts are cache reads
    nrow = deg.agg(
        F.count(F.lit(1)).cast("long"),
        F.sum(F.expr("deg * (deg - 1) DIV 2")).cast("long"),
    ).first()
    n_nodes = int(nrow[0])
    n_wedges = int(nrow[1]) if nrow[1] is not None else 0
    # orient low-(deg, id) -> high-(deg, id); carry the endpoint ranks
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = bounded_persist(
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(lower, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower, F.col("db")).otherwise(F.col("da")).alias("dv"),
        ),
        "graph:tri_oriented",
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    vlt = (F.col("e1.dv") < F.col("e2.dv")) | (
        (F.col("e1.dv") == F.col("e2.dv")) & (F.col("e1.v") < F.col("e2.v"))
    )
    n_tri = int(
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & vlt)
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)))
        .first()[0]
    )
    release_persists("graph:tri_und")
    release_persists("graph:tri_deg")
    release_persists("graph:tri_oriented")
    # ONE summary row: return it as a local relation instead of the old
    # materialize() parquet round-trip (a dozen write/read jobs for one
    # row — guide §5: a single row IS driver/metadata scale). Python //
    # on non-negative ints == SQL DIV, so clustering_ppb is bit-identical.
    cppb = (3 * n_tri * 1_000_000_000) // n_wedges if n_wedges > 0 else 0
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_wedges, n_tri, cppb)],
        "n_nodes bigint, n_edges bigint, n_wedges bigint, "
        "n_triangles bigint, clustering_ppb bigint",
    )


O_TRIANGLES = f"""
WITH ev AS (
    SELECT user_id, ts, event_id,
           CAST(regexp_extract(props, '{_K_PATTERN}', 1) AS INT) AS node
    FROM events
),
tr AS (
    SELECT LAG(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
           node AS dst
    FROM ev
),
edges AS (
    SELECT src, dst, COUNT(*) AS w FROM tr WHERE src IS NOT NULL
    GROUP BY src, dst
),
und AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src != dst
),
deg AS (
    SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und
    ) GROUP BY node
),
oriented AS (
    SELECT CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.a ELSE u.b END AS u,
           CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.b ELSE u.a END AS v,
           CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN db.deg ELSE da.deg
           END AS dv
    FROM und u
    JOIN deg da ON da.node = u.a
    JOIN deg db ON db.node = u.b
),
tri AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM oriented e1
    JOIN oriented e2 ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
    JOIN oriented e3 ON e3.u = e1.v AND e3.v = e2.v
),
w AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
    FROM deg
),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CAST(CASE WHEN n_wedges > 0
            THEN 3 * n_triangles * 1000000000 // n_wedges ELSE 0 END
            AS BIGINT) AS clustering_ppb
FROM w CROSS JOIN s CROSS JOIN tri
"""


def register_queries(register) -> None:
    register("graph_pagerank", pagerank_clicks, _pr_oracle())
    register("graph_degree_stats", graph_degree_stats, O_DEGREE)
    register("graph_triangles", graph_triangles, O_TRIANGLES)
