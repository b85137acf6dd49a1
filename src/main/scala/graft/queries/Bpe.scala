package graft.queries

import graft.Tables
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (q79) — the TOKENIZER side of a
  * training-data pipeline (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016): learn
  * the first K merge rules from corpus statistics. BPE training is
  * the canonical "looks serial, is actually distributed" op: the
  * corpus-scale work is ONE explode→count pass producing the word
  * frequency table (vocab-bounded — this is why real tokenizer
  * trainers run on word counts, not raw text), and every merge round
  * then runs on that vocab-sized table only.
  *
  * Determinism across engines:
  *  - pair statistics are integer sums over all adjacent symbol pairs
  *    weighted by word frequency; the winner is (count DESC, pair ASC)
  *    — a total order, no floats anywhere;
  *  - the merge itself is EXACT greedy left-to-right BPE via a
  *    separator-doubling trick: symbols are re-joined with two
  *    spaces and the single-space-padded pair is `replace`d — the
  *    match consumes only the FIRST space of each separator, so a
  *    chain "a a a a" merges to "aa aa" in one pass (plain
  *    single-space replace would stall at "aa a a"), which is
  *    precisely the reference algorithm's scan. Java and DuckDB
  *    `replace` share left-to-right non-overlapping semantics, so
  *    both engines produce identical vocabularies every round.
  *
  * Scale shape: one corpus shuffle (word count), then K rounds of
  * vocab-bounded DataFrames — each round's argmax is a 1-row
  * TakeOrdered broadcast back onto the vocab (never collected), and
  * `localCheckpoint` keeps the round plans flat (the q70/CC
  * iteration discipline). At 100 TB the word table for a real corpus
  * is ~10^8 rows: still executor-resident, rounds still
  * corpus-free.
  */
object Bpe {

  val BpeMergeRounds = 4

  /** Single-spaced symbol string → merged, for pair `bp` ("a b"):
    * exact greedy BPE via separator doubling. SQL spelled so the
    * identical text runs under both engines (only `replace`, `trim`,
    * `||`). */
  private[queries] def mergeExpr(sym: String, bp: String): String =
    s"""replace(trim(replace(' ' || replace($sym, ' ', '  ') || ' ',
       | ' ' || replace($bp, ' ', '  ') || ' ',
       | ' ' || replace($bp, ' ', '') || ' ')), '  ', ' ')""".stripMargin

  def q79BpeMerges(s: SparkSession, dir: String): DataFrame = {
    // the ONLY corpus-scale stage: word frequencies, then chars
    val words = Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("sym", array_join(split(col("w"), ""), " "))
      .select(col("sym"), col("cnt"))
      .localCheckpoint(true) // vocab-bounded; rounds must not replay the corpus
    var cur = words
    val picked = Seq.newBuilder[DataFrame]
    for (k <- 1 to BpeMergeRounds) {
      val a = split(col("sym"), " ")
      val pairs = cur
        .select(col("cnt"), explode(zip_with(
          slice(a, lit(1), size(a) - 1), slice(a, lit(2), size(a) - 1),
          (x, y) => concat(x, lit(" "), y))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("pc"))
      val best = pairs
        .orderBy(col("pc").desc, col("pair").asc).limit(1)
        .localCheckpoint(true) // 1 row; referenced by the census AND the next round
      picked += best.select(lit(k.toLong).as("rank"),
        col("pair"), col("pc").as("pair_count"))
      cur = cur.crossJoin(broadcast(best.select(col("pair").as("bp"))))
        .selectExpr(s"${mergeExpr("sym", "bp")} AS sym", "cnt")
        .localCheckpoint(true)
    }
    picked.result().reduce(_.union(_))
  }

  val q79Sql: String = {
    def pairsOf(rel: String): String =
      s"""SELECT pair, sum(cnt) AS pc FROM (
         |  SELECT cnt, unnest(list_transform(range(1, len(str_split(sym, ' '))),
         |    i -> array_to_string(list_slice(str_split(sym, ' '), i, i + 1), ' ')))
         |    AS pair
         |  FROM $rel) GROUP BY 1""".stripMargin
    def round(k: Int): String =
      s"""p$k AS (${pairsOf(s"w${k - 1}")}),
         |b$k AS (SELECT pair, pc FROM p$k ORDER BY pc DESC, pair ASC LIMIT 1),
         |w$k AS (SELECT ${mergeExpr("sym", s"(SELECT pair FROM b$k)")} AS sym, cnt
         |        FROM w${k - 1})""".stripMargin
    val finals = (1 to BpeMergeRounds)
      .map(k => s"SELECT CAST($k AS BIGINT) AS rank, pair, pc AS pair_count FROM b$k")
      .mkString("\n|UNION ALL\n|")
    s"""WITH w0 AS (
       |  SELECT array_to_string(str_split(w, ''), ' ') AS sym, count(*) AS cnt
       |  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1),
       |${(1 to BpeMergeRounds).map(round).mkString(",\n")}
       |$finals""".stripMargin
  }
}
