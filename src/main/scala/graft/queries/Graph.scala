package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relationships the star schema implies —
  * iterative DataFrame algebra on an AGGREGATED entity graph.
  *
  * The 100 TB shape: the corpus-scale work is the one-pass edge
  * aggregation (lineitem joins its dims — AQE broadcasts the small
  * sides — then a single shuffle contracts 6e11 line items to an
  * entity×entity edge list). The iterations then run on the
  * contracted graph only: for nation-level trade that is ≤625 edges
  * regardless of corpus size, so every per-round join broadcasts and
  * nothing corpus-sized is ever touched again. This is how PageRank
  * is actually run on warehouse-scale data: contract first, iterate
  * on the summary.
  */
object Graph {

  /** Damping = 85/100, rank mass carried in integer micro-units so
    * every engine computes bit-identical ranks (no float drift across
    * 5 iterations). */
  val PrIters = 5
  val PrDamp = 850L   // ×1000
  val PrScale = 1000000L

  /** Weighted PageRank (q70) over the nation trade graph: an edge
    * src→dst with weight w means customers of nation `src` bought w
    * line items from suppliers of nation `dst`. Contributions use
    * integer division (`div`) at every step — the DuckDB oracle
    * unrolls the identical recurrence with `//`, so ranks hash-match
    * exactly. Nodes with no inbound mass keep the base term; dangling
    * mass (a nation with no outbound purchases) is dropped by both
    * engines identically.
    */
  def q70PageRank(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val edges = li
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    // materialize the contracted graph once — the iterations below
    // reference it PrIters times and must not replay the lineitem join
    val e = edges.join(outw, "src").localCheckpoint(true)

    val nodes = Tables.nation(s, dir).select(col("n_nationkey").as("node"))
    val n = nodes.count() // node count is graph-bounded (25), not corpus-bounded
    val base = (PrScale * (1000L - PrDamp)) / 1000L / n
    var ranks = nodes.withColumn("pr", lit(PrScale / n))
    for (_ <- 1 to PrIters) {
      val contrib = e.join(broadcast(ranks), e("src") === ranks("node"))
        .select(col("dst"), expr("pr * w div outw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("mass"))
      ranks = nodes.join(broadcast(contrib), nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"$PrDamp * coalesce(mass, 0L) div 1000")).as("pr"))
    }
    ranks.join(broadcast(Tables.nation(s, dir)),
        col("node") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("pr").as("rank_micro"))
  }

  val q70Sql: String = {
    val base = s"($PrScale * (1000 - $PrDamp)) // 1000 // (SELECT count(*) FROM nation)"
    def iter(k: Int): String =
      s"""r$k AS (
         |  SELECT n.n_nationkey AS node,
         |         $base + ($PrDamp * coalesce(m.mass, 0)) // 1000 AS pr
         |  FROM nation n LEFT JOIN (
         |    SELECT e.dst AS node, sum((r.pr * e.w) // e.outw) AS mass
         |    FROM e JOIN r${k - 1} r ON e.src = r.node GROUP BY 1) m
         |  ON n.n_nationkey = m.node)""".stripMargin
    s"""WITH edges AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |e AS (SELECT src, dst, w, sum(w) OVER (PARTITION BY src) AS outw
       |      FROM edges),
       |r0 AS (SELECT n_nationkey AS node,
       |              $PrScale // (SELECT count(*) FROM nation) AS pr
       |       FROM nation),
       |${(1 to PrIters).map(iter).mkString(",\n")}
       |SELECT n.n_name AS nation, CAST(r.pr AS BIGINT) AS rank_micro
       |FROM r$PrIters r JOIN nation n ON r.node = n.n_nationkey""".stripMargin
  }
}
