package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference engine's actual pipeline, rebuilt 1:1 over its nested
  * OpenFoodFacts record schema (reference Consumer.scala:12-35). These
  * are pure `DataFrame => DataFrame` transforms usable identically
  * under `spark.read` (batch) and `spark.readStream` (streaming) — the
  * batch/stream duality Structured Streaming is built on.
  *
  * Semantics divergences from the reference are deliberate and noted
  * per-op (SURVEY.md §7.4): we keep the *intent*, with deterministic
  * tie-breaks so results are oracle-checkable.
  */
object FoodPipeline {

  /** Reference Consumer.scala:12-35 — one Kafka message = one API page. */
  val apiResponseSchema: StructType = StructType(Seq(
    StructField("rows", ArrayType(StructType(Seq(
      StructField("row", StructType(Seq(
        StructField("nutriscore_grade", StringType),
        StructField("categories_tags", ArrayType(StringType)),
        StructField("nutriments", ArrayType(StructType(Seq(
          StructField("name", StringType),
          StructField("value", DoubleType))))),
        StructField("product_name", ArrayType(StructType(Seq(
          StructField("lang", StringType),
          StructField("text", StringType))))),
        StructField("packaging_tags", ArrayType(StringType)),
        StructField("brands_tags", ArrayType(StringType)),
        StructField("additives_tags", ArrayType(StringType)),
        StructField("nova_groups_tags", ArrayType(StringType)))))))))))

  /** Parse + flatten one page-per-row input into one product-per-row
    * (reference Consumer.scala:58-61): cast binary→string, from_json
    * against the fixed schema (PERMISSIVE: malformed → null row),
    * explode the page, lift the 8 struct fields with a nested-star
    * projection. Catalyst prunes unreferenced struct fields back into
    * the JSON parser (OptimizeJsonExprs), so downstream ops that touch
    * one field only parse that field.
    */
  def parsePage(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol).cast("string"), apiResponseSchema).as("data"))
      .select(explode(col("data.rows")).as("row"))
      .select("row.row.*")

  /** parsePage with malformed-page accounting: PERMISSIVE from_json
    * turns a corrupt page into a null struct which explode then drops
    * — silently, with no metric (the reference has the same blind
    * spot). This variant tags each page before the explode so corrupt
    * input is COUNTED instead of vanishing; pipe the second frame to a
    * monitoring sink.
    * @return (products, corruptPages) — corruptPages has the raw value
    *         for quarantine/replay.
    */
  def parsePageAccounted(raw: DataFrame, valueCol: String = "value")
      : (DataFrame, DataFrame) = {
    val tagged = raw.withColumn("__data",
      from_json(col(valueCol).cast("string"), apiResponseSchema))
    // PERMISSIVE from_json yields a struct with NULL FIELDS on
    // malformed input (not a null struct): "no parsable rows array"
    // is the corrupt signal
    val products = tagged.filter(col("__data.rows").isNotNull)
      .select(explode(col("__data.rows")).as("row"))
      .select("row.row.*")
    val corrupt = tagged.filter(col("__data.rows").isNull)
      .select(col(valueCol).cast("string").as("corrupt_page"))
    (products, corrupt)
  }

  /** Q1 (reference Consumer.scala:187-199). Order preserved: bucket
    * first, null-filter second — so null grades drop but non-null
    * garbage becomes UNKNOWN.
    */
  def nutriscoreDistribution(df: DataFrame): DataFrame =
    df.filter(col("nutriscore_grade").isNotNull)
      .withColumn("nutriscore",
        Shapes.bucketize(col("nutriscore_grade"), Seq("a", "b", "c", "d", "e")))
      .select("nutriscore")
      .transform(d => Shapes.groupCount(d, Seq("nutriscore"), "product_count"))

  /** Q2 (reference Consumer.scala:201-215). Blacklist applied after
    * the prefix strip on {undefined,null,""} — the reference checks
    * `en:*` forms post-strip where they can no longer occur; we keep
    * the intent, not the dead entries.
    */
  def categoryDistribution(df: DataFrame): DataFrame =
    df.withColumn("main_category", Shapes.firstTagStripped(col("categories_tags")))
      .filter(Shapes.notPlaceholder(col("main_category")))
      .transform(d => Shapes.groupCount(d, Seq("main_category"), "category_count"))

  /** Q3 (reference Consumer.scala:239-250). */
  def brandDistribution(df: DataFrame): DataFrame =
    df.withColumn("brand", Shapes.firstTagStripped(col("brands_tags")))
      .filter(col("brand").isNotNull)
      .transform(d => Shapes.groupCount(d, Seq("brand"), "product_count"))

  /** Q4 (reference Consumer.scala:252-262). */
  def packagingDistribution(df: DataFrame): DataFrame =
    df.withColumn("packaging", Shapes.firstTagStripped(col("packaging_tags")))
      .filter(col("packaging").isNotNull)
      .transform(d => Shapes.groupCount(d, Seq("packaging"), "packaging_count"))

  /** Q5 (reference Consumer.scala:264-280): digit → int group id plus
    * stripped label, 2-key group-count.
    */
  def novaGroupSummary(df: DataFrame): DataFrame =
    df.withColumn("tag", get(col("nova_groups_tags"), lit(0)))
      .filter(col("tag").isNotNull && length(col("tag")) > 0)
      .withColumn("nova_group", regexp_extract(col("tag"), "(\\d)", 1).cast("int"))
      .withColumn("nova_label", regexp_replace(col("tag"), Shapes.langPrefix, ""))
      .transform(d => Shapes.groupCount(d, Seq("nova_group", "nova_label"), "product_count"))

  /** Main-language product name (reference Consumer.scala:75-77):
    * explode the (lang,text) list and keep lang == "main". Done with
    * `filter` on the array *before* exploding — same result, but the
    * explode then emits at most one row per product instead of one per
    * language (narrower shuffle input at scale).
    */
  def mainName(df: DataFrame): DataFrame =
    df.withColumn("product_name",
      try_element_at(filter(col("product_name"), _.getField("lang") === "main"), lit(1))
        .getField("text"))

  /** Q6 prep (reference Consumer.scala:71-84): one row per (product,
    * additive), prefix-stripped, empty additives dropped. The
    * reference uses explode_outer then filters the nulls back out —
    * net inner-explode; we keep explode_outer to preserve the shape,
    * and the filter reproduces the reference's net semantics.
    */
  def additivesExploded(df: DataFrame): DataFrame =
    df.transform(mainName)
      .select(col("product_name"), explode_outer(col("additives_tags")).as("raw"))
      .withColumn("additive", regexp_replace(col("raw"), Shapes.langPrefix, ""))
      .filter(col("additive").isNotNull && col("additive") =!= "")
      .select("product_name", "additive")

  /** Q6 aggregate (reference Consumer.scala:147-165): per-product
    * additive count + representative additive, top-10. The reference's
    * `first("additive")` is scan-order-dependent; we pin min() and a
    * (count desc, name asc) tie-break so results are deterministic
    * under any partitioning (SURVEY.md §7.4).
    */
  def topAdditiveProducts(df: DataFrame, k: Int = 10): DataFrame =
    df.transform(additivesExploded).transform(topAdditiveAgg(_, k))

  /** The aggregation half of Q6, over an already-exploded
    * (product_name, additive) frame — shared by the batch query above
    * and the streaming per-batch variant
    * (graft.streaming.Streams.perBatchTopK) so the pinned tie-break
    * and min() semantics live in exactly one place. */
  def topAdditiveAgg(exploded: DataFrame, k: Int = 10): DataFrame =
    exploded
      .groupBy(col("product_name"))
      .agg(count(lit(1)).as("additive_count"),
        min(col("additive")).as("most_common_additive"))
      .transform(d => Shapes.topK(d, k,
        col("additive_count").desc, col("product_name").asc))

  /** Q6 with a TRUE mode aggregate: the reference column is named
    * "most_common_additive" but computes scan-order `first()`
    * (SURVEY.md §2.3 Q6); this variant computes the actual mode via
    * Spark's built-in mode(deterministic=true) — lowest value on
    * frequency ties, so still reproducible. */
  def topAdditiveProductsTrueMode(df: DataFrame, k: Int = 10): DataFrame =
    df.transform(additivesExploded)
      .groupBy(col("product_name"))
      .agg(count(lit(1)).as("additive_count"),
        mode(col("additive"), deterministic = true).as("most_common_additive"))
      .transform(d => Shapes.topK(d, k,
        col("additive_count").desc, col("product_name").asc))

  /** Q7 category normalization + sugars extraction (reference
    * Consumer.scala:217-237). The reference double-explodes nutriments
    * × product_name (a per-row cross product) and filters both; we
    * express each lookup as an array filter + element_at — same
    * semantics, no row blow-up before the shuffle.
    */
  def sugarsByCategory(df: DataFrame): DataFrame =
    df.withColumn("main_category",
        lower(trim(regexp_replace(get(col("categories_tags"), lit(0)),
          Shapes.langPrefix, ""))))
      .transform(mainName)
      .withColumn("sugar",
        try_element_at(filter(col("nutriments"), _.getField("name") === "sugars"), lit(1))
          .getField("value").cast("double"))
      .filter(col("sugar").isNotNull && col("product_name").isNotNull &&
        Shapes.notPlaceholder(col("main_category")))
      .select("main_category", "product_name", "sugar")

  /** Q7 ranked window (reference Consumer.scala:106-124): per-category
    * max-sugar product via row_number == 1, deterministic tie-break.
    */
  def topSugaryPerCategory(df: DataFrame): DataFrame =
    df.transform(sugarsByCategory)
      .transform(d => Shapes.argmaxPerGroup(d, "main_category",
        Seq(col("sugar").desc, col("product_name").asc)))

  /** Scale-preferred Q7 variant: max_by is a plain hash aggregate —
    * one shuffle, no per-group sort, no WindowExec buffering.
    */
  def topSugaryPerCategoryMaxBy(df: DataFrame): DataFrame =
    df.transform(sugarsByCategory)
      .groupBy(col("main_category"))
      .agg(max_by(struct(col("product_name"), col("sugar")),
        struct(col("sugar"), col("product_name"))).as("top"))
      .select(col("main_category"), col("top.product_name"), col("top.sugar"))

  /** Nutriments re-modeled as a map (SURVEY.md §1.5): O(1) lookup
    * `nutriments_map['sugars']` instead of explode+filter.
    */
  def withNutrimentsMap(df: DataFrame): DataFrame =
    df.withColumn("nutriments_map",
      map_from_entries(filter(col("nutriments"), _.getField("name").isNotNull)))
}
