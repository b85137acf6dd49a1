package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join / set-op coverage (SURVEY.md §2.7 gap table: the reference has
  * no joins at all; a complete engine needs them, and the 100 TB
  * design leans entirely on picking the right join strategy).
  *
  * Strategy notes:
  * - Dimension tables (region/nation/supplier/part/customer) are tiny
  *   relative to the fact tables at every scale factor and in TPC-H
  *   generally — every dim join below is explicitly `broadcast()`, so
  *   the fact table is never shuffled for a join.
  * - Fact-to-fact (lineitem⋈orders) is a shuffle hash join on the
  *   order key; AQE re-plans it to broadcast when the filtered side
  *   turns out small, and handles skew splitting at scale.
  */
object Relational {

  /** TPC-H Q5-flavored star join: revenue per nation, all dims
    * broadcast, one fact-fact shuffle.
    */
  def q10RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val nat = Tables.nation(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("line_count"))
  }
  val q10Sql: String =
    """SELECT n_name,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS line_count
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY 1""".stripMargin

  /** Broadcast dim join + multi-measure aggregate (TPC-H Q14/Q19
    * flavor): quantity and revenue per part brand for a filtered
    * shipdate range — the filter prunes at the parquet scan.
    */
  def q11BrandVolume(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
    li.join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
        round(sum(col("l_extendedprice")), 2).as("total_price"),
        count(lit(1)).as("line_count"))
  }
  val q11Sql: String =
    """SELECT p_brand, round(sum(l_quantity), 2) AS total_qty,
      |       round(sum(l_extendedprice), 2) AS total_price,
      |       count(*) AS line_count
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |GROUP BY 1""".stripMargin

  /** Anti join (NOT EXISTS): customers with no urgent order, counted
    * by market segment. The filter on the right side happens before
    * the join, so the anti join probes a much smaller build set; AQE
    * broadcasts it when it fits.
    */
  def q12CustomersNoOrders(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("customer_count"))
  }
  val q12Sql: String =
    """SELECT c_mktsegment, count(*) AS customer_count
      |FROM customer WHERE NOT EXISTS
      |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |     AND o_orderpriority = '1-URGENT')
      |GROUP BY 1""".stripMargin

  /** Semi join (EXISTS): suppliers with at least one shipped line,
    * counted per nation (broadcast dim).
    */
  def q13ActiveSuppliersByNation(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir)
      .join(Tables.lineitem(s, dir), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("supplier_count"))
  }
  val q13Sql: String =
    """SELECT n_name, count(*) AS supplier_count
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      |GROUP BY 1""".stripMargin

  /** Set ops + distinct (SURVEY.md §2.7): nations having customers
    * INTERSECT nations having suppliers, minus (EXCEPT) a literal,
    * then distinct-counted. Exercises Intersect/Except/Distinct.
    */
  def q14NationSetOps(s: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name")).distinct()
    val suppNations = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name")).distinct()
    custNations.intersect(suppNations)
      .except(custNations.limit(0)) // EXCEPT arm kept trivial: stable oracle
      .orderBy(col("n_name"))
  }
  val q14Sql: String =
    """SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      |INTERSECT
      |SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY n_name""".stripMargin

  /** Rollup (SURVEY.md §2.7 grouping-sets gap): order counts and value
    * by (status, priority) with subtotals and a grand total.
    */
  def q15OrderRollup(s: SparkSession, dir: String): DataFrame = {
    // Subtotal rows carry NULL keys; COALESCE to a sentinel on both
    // sides so the oracle hash-compare never depends on NULL encoding.
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"),
        round(sum(col("o_totalprice")), 2).as("total_value"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("order_count"), col("total_value"))
  }
  val q15Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS order_count,
      |       round(sum(o_totalprice), 2) AS total_value
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** Non-equi RANGE join (completes the join family next to equi/
    * semi/anti/set/as-of/interval): parts banded into price tiers by
    * `lo ≤ price < hi`. The tier table is a tiny in-plan dimension —
    * Spark plans BroadcastNestedLoopJoin with the BANDS side
    * broadcast, so the big side streams map-side exactly like an equi
    * broadcast join; the non-equi predicate is a codegen comparison,
    * and the 100 TB side never shuffles. (A big-big range join would
    * instead bucket both sides by ⌊price/width⌋ and equi-join the
    * bucket key — the standard range-bucketing rewrite.)
    */
  def q52RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // tier bounds covering the full testdata price range (900-999.9
    // at sf0.01/sf0.1; sf0.001 tops out at 919.9) — every part lands
    // in exactly one band, QueriesSpec asserts conservation
    val bands = Seq(
      ("budget", 900d, 935d),
      ("mid", 935d, 970d),
      ("premium", 970d, 1000d)).toDF("tier", "lo", "hi")
    Tables.part(s, dir).as("p")
      .join(broadcast(bands).as("b"),
        col("p.p_retailprice") >= col("b.lo") &&
          col("p.p_retailprice") < col("b.hi"))
      .groupBy(col("b.tier"))
      .agg(count(lit(1)).as("part_count"),
        round(avg(col("p.p_retailprice")), 2).as("avg_price"),
        min(col("p.p_partkey")).as("min_partkey"))
  }
  val q52Sql: String =
    """WITH bands(tier, lo, hi) AS (
      |  VALUES ('budget', 900.0, 935.0), ('mid', 935.0, 970.0),
      |         ('premium', 970.0, 1000.0))
      |SELECT tier, count(*) AS part_count,
      |       round(avg(p_retailprice), 2) AS avg_price,
      |       min(p_partkey) AS min_partkey
      |FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
      |GROUP BY 1""".stripMargin

  /** Pivot (wide-format aggregation — the §2.7 family's last gap):
    * document counts per source pivoted across languages. The pivot
    * VALUES are declared explicitly, which is the scale-correct form —
    * implicit pivot runs a distinct-values job first and caps at
    * spark.sql.pivotMaxValues; an explicit list keeps it one pass and
    * the output schema static. Lowers to a regular two-phase hash
    * aggregate over (source) with CASE-filtered partials — same plan
    * family as the oracle's FILTER clauses, one shuffle.
    */
  // the documents corpus's actual label set (all SFs) — QueriesSpec
  // asserts the pivoted columns conserve the per-source totals, which
  // catches a drifted list
  val PivotLangs: Seq[String] = Seq("en", "de", "fr", "es", "zh")
  def q53Pivot(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
      .na.fill(0L)
  }
  val q53Sql: String = {
    val cols = PivotLangs
      .map(l => s"count(*) FILTER (lang = '$l') AS $l").mkString(",\n       ")
    s"""SELECT source,
       |       $cols
       |FROM documents GROUP BY 1""".stripMargin
  }

  /** Bloom-filter parameters for q73: m=256 bits as 8×32-bit words,
    * k=3 md5-derived positions. Deliberately tight at test scale so
    * false positives actually occur and the census exercises them; at
    * 100 TB you size m to the build side (the filter stays a single
    * broadcast row either way). */
  val BloomWords = 8     // 32 bits each → m = 256
  val BloomK = 3
  val BloomBalMin = 5000.0

  /** k-th bit position for a key: md5("k:key") prefix mod m — the q68
    * derivation, so both engines compute identical filters. Composed
    * spelling kept as the differential reference for the fused
    * `hash_positions` kernel (HashPositionsSpec). */
  private[graft] def bloomPos(j: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % (BloomWords * 32)

  /** Bloom-filtered semi-join census (q73) — the 100 TB pre-join
    * filter pattern: the build side (high-balance suppliers) folds
    * into a 256-bit filter via one tiny aggregation; the single-row
    * filter broadcasts (the q49 trick) and the fact-table probe is
    * pure scan-side codegen — per row, 3 md5s + 3 bit tests, NO join
    * and NO shuffle for rows the filter rejects. The census compares
    * the bloom's verdict with exact membership (a broadcast semi-join
    * twin) per return flag, so the emitted false-positive counts pin
    * the filter's exact contents — a wrong bit anywhere flips a count.
    * This is what Spark's runtime row-level bloom does inside AQE,
    * made explicit, deterministic, and oracle-checkable.
    */
  def q73BloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.supplier(s, dir)
      .filter(col("s_acctbal") > BloomBalMin).select(col("s_suppkey"))
    // build: ≤ k·|keys| position rows → ≤ 8 words → ONE dense row
    // (native hash_positions kernel: all k in one call; the composed
    // bloomPos columns are the differential reference)
    val positions = keys.select(explode(graft.functions.HashPositionsFunctions
      .hash_positions(col("s_suppkey").cast("string"), BloomK, BloomWords * 32L))
      .as("p"))
    val words = positions
      .select(expr("p div 32").as("w"),
        expr("shiftleft(1L, cast(p % 32 as int))").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))
    val dense = s.range(BloomWords).select(col("id").as("w"))
      .join(words, Seq("w"), "left")
      .select(col("w"), coalesce(col("bits"), lit(0L)).as("bits"))
    val bf = dense.agg(expr(
      "transform(array_sort(collect_list(struct(w, bits))), x -> x.bits)").as("bf"))

    val probe = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_suppkey"))
      .crossJoin(broadcast(bf))
      // positions staged as ONE kernel call per row; the per-j bit
      // tests below stay plain codegen'd element_at arithmetic
      .withColumn("ps", graft.functions.HashPositionsFunctions
        .hash_positions(col("l_suppkey").cast("string"), BloomK, BloomWords * 32L))
    val memberBits = (0 until BloomK).map { j =>
      val p = s"element_at(ps, ${j + 1})"
      expr(s"(shiftright(element_at(bf, cast(($p) div 32 as int) + 1), " +
        s"cast(($p) % 32 as int)) & 1) = 1")
    }.reduce(_ && _)
    val exact = keys.withColumn("is_member", lit(true))
    probe.withColumn("pass_bloom", memberBits)
      .join(broadcast(exact), col("l_suppkey") === col("s_suppkey"), "left")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("pass_bloom"), 1)).as("n_pass_bloom"),
        count(when(col("is_member"), 1)).as("n_true_member"),
        count(when(col("pass_bloom") && col("is_member").isNull, 1))
          .as("n_false_pos"))
  }

  val q73Sql: String = {
    val m = BloomWords * 32
    def pos(jExpr: String, key: String) =
      s"CAST('0x' || substr(md5($jExpr || ':' || CAST($key AS VARCHAR)), 1, 8) AS BIGINT) % $m"
    val member = (0 until BloomK).map { j =>
      val p = pos(s"'$j'", "l_suppkey")
      s"((list_extract(bf, CAST(($p) // 32 AS INTEGER) + 1) >> CAST(($p) % 32 AS INTEGER)) & 1) = 1"
    }.mkString("(", " AND ", ")")
    s"""WITH keys AS (
       |  SELECT s_suppkey FROM supplier WHERE s_acctbal > $BloomBalMin),
       |pos AS (
       |  SELECT ${pos("CAST(j AS VARCHAR)", "s_suppkey")} AS p
       |  FROM keys, (SELECT unnest(range($BloomK)) AS j)),
       |wordbits AS (
       |  SELECT p // 32 AS w, bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
       |  FROM pos GROUP BY 1),
       |dense AS (
       |  SELECT w, coalesce(b.bits, 0) AS bits
       |  FROM (SELECT unnest(range($BloomWords)) AS w) LEFT JOIN wordbits b USING (w)),
       |bloom AS (SELECT list(bits ORDER BY w) AS bf FROM dense)
       |SELECT l.l_returnflag,
       |       count(*) AS n_rows,
       |       count(*) FILTER ($member) AS n_pass_bloom,
       |       count(*) FILTER (l.l_suppkey IN (SELECT s_suppkey FROM keys))
       |         AS n_true_member,
       |       count(*) FILTER ($member
       |         AND l.l_suppkey NOT IN (SELECT s_suppkey FROM keys))
       |         AS n_false_pos
       |FROM lineitem l, bloom
       |GROUP BY 1""".stripMargin
  }

  /** Market-basket association rules (q168) at brand grain: each
    * order is a basket of the part BRANDS it bought; every brand pair
    * co-occurring in a basket gets its support, both directed
    * confidences, and lift — the classic affinity surface (and, for a
    * training-data pipeline, the source co-occurrence signal behind
    * "docs from A usually arrive with docs from B").
    *
    * Scale shape — contract first, the q70 discipline: the corpus-
    * sized work is one lineitem→part equi-join (AQE broadcasts part
    * at these SFs; at 100 TB both sides hash on partkey) and one
    * distinct to (order, brand). Pair generation self-joins THAT
    * contracted frame on the order key with brand_a < brand_b — the
    * fan-out is bounded by brands-per-basket², never corpus², and the
    * result aggregates straight down to ≤ brands² rows. Per-brand
    * supports and the basket count are tiny aggregates broadcast
    * back; nothing corpus-sized is touched twice.
    *
    * Lift is spelled in DECIMAL(38) (the q137 convention): sup_ab ·
    * N · 1000 overflows a long once baskets pass ~10⁹, and the
    * permille quotient is exact integer division on both engines.
    */
  def q168AssociationRules(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("ok"), col("p_brand").as("brand"))
      .distinct()
    val sup = baskets.groupBy(col("brand")).agg(count(lit(1)).as("s"))
    val n = baskets.agg(countDistinct(col("ok")).as("n_baskets"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.ok") === col("b.ok") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
      .agg(count(lit(1)).as("sup_ab"))
    pairs
      .join(broadcast(sup.select(col("brand").as("brand_a"),
        col("s").as("sup_a"))), Seq("brand_a"))
      .join(broadcast(sup.select(col("brand").as("brand_b"),
        col("s").as("sup_b"))), Seq("brand_b"))
      .crossJoin(broadcast(n)) // 1-row stat cross (the repo's broadcast-stat idiom)
      .select(col("brand_a"), col("brand_b"), col("sup_ab"),
        col("sup_a"), col("sup_b"),
        expr("sup_ab * 1000 div sup_a").as("conf_ab_pm"),
        expr("sup_ab * 1000 div sup_b").as("conf_ba_pm"),
        expr("""CAST(CAST(sup_ab AS DECIMAL(38,0)) * n_baskets * 1000
                |  div (CAST(sup_a AS DECIMAL(38,0)) * sup_b) AS BIGINT)"""
          .stripMargin).as("lift_pm"))
  }

  val q168Sql: String =
    """WITH baskets AS (
      |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |sup AS (SELECT brand, count(*) AS s FROM baskets GROUP BY 1),
      |n AS (SELECT count(DISTINCT ok) AS n_baskets FROM baskets),
      |pairs AS (
      |  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS sup_ab
      |  FROM baskets a JOIN baskets b
      |    ON a.ok = b.ok AND a.brand < b.brand
      |  GROUP BY 1, 2)
      |SELECT brand_a, brand_b, sup_ab,
      |       sa.s AS sup_a, sb.s AS sup_b,
      |       sup_ab * 1000 // sa.s AS conf_ab_pm,
      |       sup_ab * 1000 // sb.s AS conf_ba_pm,
      |       CAST(CAST(sup_ab AS HUGEINT) * n.n_baskets * 1000
      |         // (CAST(sa.s AS HUGEINT) * sb.s) AS BIGINT) AS lift_pm
      |FROM pairs
      |JOIN sup sa ON brand_a = sa.brand
      |JOIN sup sb ON brand_b = sb.brand, n""".stripMargin

  // ------------------------------------------- expectations (q195)

  /** Data-quality expectations census (q195) — the validation suite a
    * lake runs before admitting a snapshot to training (the
    * Great-Expectations shape): one row per declared check with the
    * rows checked, the violation count, and the distinct key census
    * the check's join/scan actually computed. Referential integrity
    * across every FK edge of the lake (lineitem→orders,
    * orders→customer, customer→nation, supplier→nation,
    * events→customer), non-null/non-empty text, positive order
    * totals, and the n_chars==length(text) consistency contract. On
    * clean synthetic data every violation count is zero — that IS the
    * expected report — while `distinct_keys` (distinct FK/values seen)
    * carries the non-trivial mass that catches a check that silently
    * stopped scanning.
    *
    * Scale shape: each FK check is one anti-join censused in the same
    * pass as the distinct-key count — dim-sided checks broadcast the
    * PK side (nation/customer at any SF ratio); the lineitem→orders
    * edge keys on the lake's bucketing column (zero-exchange SMJ per
    * ScaleSpec). Scan checks are single-pass aggregates. Output is
    * O(checks). */
  def q195ExpectationsCensus(s: SparkSession, dir: String): DataFrame = {
    def fk(name: String, fact: DataFrame, key: String, pk: DataFrame,
           pkCol: String, bcast: Boolean): DataFrame = {
      val dim0 = pk.select(col(pkCol).as("pk")).distinct()
      val dim = if (bcast) broadcast(dim0) else dim0
      fact.select(col(key).as("fk"))
        .join(dim, col("fk") === col("pk"), "left")
        .agg(count(lit(1)).as("rows_checked"),
          sum(when(col("pk").isNull, 1L).otherwise(0L)).as("violations"),
          countDistinct(col("fk")).as("distinct_keys"))
        .select(lit(name).as("check_name"), col("rows_checked"),
          col("violations"), col("distinct_keys"))
    }
    def scan(name: String, df: DataFrame, bad: Column,
             keyed: Column): DataFrame =
      df.agg(count(lit(1)).as("rows_checked"),
          sum(when(bad, 1L).otherwise(0L)).as("violations"),
          countDistinct(keyed).as("distinct_keys"))
        .select(lit(name).as("check_name"), col("rows_checked"),
          col("violations"), col("distinct_keys"))
    val docs = Tables.documents(s, dir)
    fk("fk_lineitem_orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey", bcast = false)
      .unionAll(fk("fk_orders_customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey", bcast = true))
      .unionAll(fk("fk_customer_nation", Tables.customer(s, dir),
        "c_nationkey", Tables.nation(s, dir), "n_nationkey", bcast = true))
      .unionAll(fk("fk_supplier_nation", Tables.supplier(s, dir),
        "s_nationkey", Tables.nation(s, dir), "n_nationkey", bcast = true))
      .unionAll(fk("fk_events_customer", Tables.events(s, dir), "user_id",
        Tables.customer(s, dir), "c_custkey", bcast = true))
      .unionAll(scan("nn_documents_text", docs,
        col("text").isNull || length(col("text")) === 0, col("doc_id")))
      .unionAll(scan("range_orders_totalprice", Tables.orders(s, dir),
        col("o_totalprice") <= 0, col("o_orderkey")))
      .unionAll(scan("consistency_documents_chars", docs,
        col("n_chars") =!= length(col("text")), col("doc_id")))
  }
  /** Per-micro-batch expectation partials for the q202 ingest gate:
    * the batch arrives already FK-flagged (left-joined `pk` column
    * from the broadcast active-customer dim upstream in the streaming
    * plan), and each check reduces to (check_name, key, rows,
    * violations) at a BOUNDED key grain — user_id for the FK probe,
    * event_type for the scans — so the landed partials are
    * sum-mergeable AND distinct_keys stays exactly reconstructible
    * across batches. Runs batch-local inside foreachBatch: no stream
    * shuffle, no state store. */
  def expectationPartials(flagged: DataFrame): DataFrame = {
    def census(name: String, key: Column, bad: Column): DataFrame =
      flagged.groupBy(key.as("key"))
        .agg(count(lit(1)).as("rows"),
          sum(when(bad, 1L).otherwise(0L)).as("violations"))
        .select(lit(name).as("check_name"), col("key"), col("rows"),
          col("violations"))
    census("fk_events_active_customer", col("user_id").cast("string"),
        col("pk").isNull)
      .unionAll(census("nn_events_type", col("event_type"),
        col("event_type").isNull || length(col("event_type")) === 0))
      .unionAll(census("range_events_value", col("event_type"),
        col("value") < 1))
  }

  val q195Sql: String =
    """SELECT 'fk_lineitem_orders' AS check_name,
      |       count(*) AS rows_checked,
      |       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_orderkey = l.l_orderkey)
      |         THEN 1 ELSE 0 END) AS BIGINT) AS violations,
      |       count(DISTINCT l_orderkey) AS distinct_keys
      |FROM lineitem l
      |UNION ALL
      |SELECT 'fk_orders_customer', count(*),
      |       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM customer c
      |                  WHERE c.c_custkey = o.o_custkey)
      |         THEN 1 ELSE 0 END) AS BIGINT),
      |       count(DISTINCT o_custkey)
      |FROM orders o
      |UNION ALL
      |SELECT 'fk_customer_nation', count(*),
      |       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM nation n
      |                  WHERE n.n_nationkey = c.c_nationkey)
      |         THEN 1 ELSE 0 END) AS BIGINT),
      |       count(DISTINCT c_nationkey)
      |FROM customer c
      |UNION ALL
      |SELECT 'fk_supplier_nation', count(*),
      |       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM nation n
      |                  WHERE n.n_nationkey = s.s_nationkey)
      |         THEN 1 ELSE 0 END) AS BIGINT),
      |       count(DISTINCT s_nationkey)
      |FROM supplier s
      |UNION ALL
      |SELECT 'fk_events_customer', count(*),
      |       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM customer c
      |                  WHERE c.c_custkey = e.user_id)
      |         THEN 1 ELSE 0 END) AS BIGINT),
      |       count(DISTINCT user_id)
      |FROM events e
      |UNION ALL
      |SELECT 'nn_documents_text', count(*),
      |       CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
      |         THEN 1 ELSE 0 END) AS BIGINT),
      |       count(DISTINCT doc_id)
      |FROM documents
      |UNION ALL
      |SELECT 'range_orders_totalprice', count(*),
      |       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
      |         AS BIGINT),
      |       count(DISTINCT o_orderkey)
      |FROM orders
      |UNION ALL
      |SELECT 'consistency_documents_chars', count(*),
      |       CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
      |         AS BIGINT),
      |       count(DISTINCT doc_id)
      |FROM documents""".stripMargin
}
