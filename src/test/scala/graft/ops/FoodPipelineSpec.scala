package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Per-operator semantics of the reference pipeline (SURVEY.md §5.1),
  * including the pinned edge cases: null grade dropped vs garbage
  * grade → UNKNOWN; blacklist applied post-strip; explode_outer nulls
  * re-filtered in Q6; deterministic representative additive.
  */
class FoodPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** One producer page as the reference receives it (FIXTURES.md §A). */
  val page: String =
    """{"rows":[
      | {"row":{"nutriscore_grade":"e",
      |  "categories_tags":["en:spreads","en:sweet-spreads"],
      |  "nutriments":[{"name":"sugars","value":56.3},{"name":"energy_100g","value":2252.0}],
      |  "product_name":[{"lang":"main","text":"Nutella"},{"lang":"fr","text":"Nutella FR"}],
      |  "packaging_tags":["en:glass-jar"],"brands_tags":["ferrero"],
      |  "additives_tags":["en:e322","en:e476"],
      |  "nova_groups_tags":["en:4-ultra-processed-food-and-drink-products"]}},
      | {"row":{"nutriscore_grade":null,
      |  "categories_tags":["fr:compotes"],
      |  "nutriments":[{"name":"sugars","value":11.0}],
      |  "product_name":[{"lang":"main","text":"Compote"}],
      |  "packaging_tags":[],"brands_tags":[],"additives_tags":[],
      |  "nova_groups_tags":["en:1-unprocessed-or-minimally-processed-foods"]}},
      | {"row":{"nutriscore_grade":"garbage",
      |  "categories_tags":["en:undefined"],
      |  "nutriments":[],
      |  "product_name":[{"lang":"en","text":"NoMainName"}],
      |  "packaging_tags":["fr:carton"],"brands_tags":["en:brandx"],
      |  "additives_tags":["en:e100"],
      |  "nova_groups_tags":[]}}
      |]}""".stripMargin.replaceAll("\n", "")

  lazy val parsed: DataFrame =
    FoodPipeline.parsePage(Seq(page).toDF("value"))

  test("parsePage flattens one page into one row per product") {
    assert(parsed.count() === 3)
    assert(parsed.columns.toSeq === Seq("nutriscore_grade", "categories_tags",
      "nutriments", "product_name", "packaging_tags", "brands_tags",
      "additives_tags", "nova_groups_tags"))
  }

  test("parsePage: malformed JSON yields null row, not a crash (PERMISSIVE)") {
    val bad = FoodPipeline.parsePage(Seq("{not json").toDF("value"))
    assert(bad.count() === 0) // explode of null array drops the row
  }

  test("parsePageAccounted: corrupt pages are counted and quarantined, not dropped") {
    val mixed = Seq(page, "{not json", "also-not-json").toDF("value")
    val (products, corrupt) = FoodPipeline.parsePageAccounted(mixed)
    assert(products.count() === 3) // the good page's products
    assert(corrupt.count() === 2)
    assert(corrupt.collect().map(_.getString(0)).toSet ===
      Set("{not json", "also-not-json"))
  }

  test("schema drift: unknown JSON fields are silently dropped (schema-on-read)") {
    // a producer that starts sending extra fields — at the page level,
    // the product level, and inside a nested struct — must not break
    // or pollute the pipeline: from_json against the FIXED schema
    // keeps exactly the declared fields (the reference's PERMISSIVE
    // schema-on-read contract, SURVEY §1.3)
    val drifted =
      """{"new_page_field":123,"rows":[
        | {"extra":"x","row":{"nutriscore_grade":"a",
        |  "categories_tags":["en:snacks"],"brand_new_field":{"deep":1},
        |  "nutriments":[{"name":"sugars","value":1.5,"unit":"g"}],
        |  "product_name":[{"lang":"main","text":"Thing","slug":"thing"}],
        |  "packaging_tags":[],"brands_tags":["b"],"additives_tags":[],
        |  "nova_groups_tags":[]}}
        |]}""".stripMargin.replaceAll("\n", "")
    val out = FoodPipeline.parsePage(Seq(drifted).toDF("value"))
    assert(out.columns.toSet === parsed.columns.toSet,
      "drifted input must yield exactly the declared columns")
    val r = out.collect()(0)
    assert(r.getAs[String]("nutriscore_grade") === "a")
    // the nested struct kept its declared fields and ignored the rest
    assert(r.getAs[Seq[org.apache.spark.sql.Row]]("nutriments")
      .map(n => (n.getAs[String]("name"), n.getAs[Double]("value")))
      === Seq(("sugars", 1.5)))
  }

  test("schema drift: per-row malformation nulls FIELDS, never neighboring rows") {
    // one product whose field has the wrong TYPE (string where the
    // schema says array) — PERMISSIVE parsing must not take down the
    // page: in Spark 4 a type mismatch nulls the malformed COLUMN's
    // enclosing struct fields for that record while intact sibling
    // rows in the same page parse fully
    val mixed =
      """{"rows":[
        | {"row":{"nutriscore_grade":"b","categories_tags":"NOT_AN_ARRAY",
        |  "nutriments":[],"product_name":[],"packaging_tags":[],
        |  "brands_tags":[],"additives_tags":[],"nova_groups_tags":[]}},
        | {"row":{"nutriscore_grade":"c","categories_tags":["en:ok"],
        |  "nutriments":[],"product_name":[],"packaging_tags":[],
        |  "brands_tags":[],"additives_tags":[],"nova_groups_tags":[]}}
        |]}""".stripMargin.replaceAll("\n", "")
    val out = FoodPipeline.parsePage(Seq(mixed).toDF("value")).collect()
      .map(r => (r.getAs[String]("nutriscore_grade"),
        Option(r.getAs[Seq[String]]("categories_tags")))).sortBy(_._1)
    // pinned (verified against Spark 4.1): ONLY the mismatched field
    // nulls; its own row's other fields and the intact sibling row
    // both survive fully
    assert(out === Seq(("b", None), ("c", Some(Seq("en:ok")))),
      s"PERMISSIVE field-nulling contract drifted: ${out.mkString("; ")}")
  }

  test("schema drift: _corrupt_record variant captures the raw page for quarantine") {
    import org.apache.spark.sql.types._
    // the columnNameOfCorruptRecord contract: a schema that declares
    // the corrupt column gets the raw text there on malformed input
    val withCorrupt = StructType(
      FoodPipeline.apiResponseSchema.fields :+
        StructField("_corrupt_record", StringType))
    val rows = Seq(page, """{"rows": BROKEN""").toDF("value")
      .select(org.apache.spark.sql.functions.from_json(
        $"value", withCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")).as("d"))
      .select($"d.rows".isNotNull.as("parsed"),
        $"d._corrupt_record".as("corrupt"))
      .collect()
    assert(rows.count(_.getBoolean(0)) === 1, "good page must parse")
    val corrupt = rows.filter(!_.getBoolean(0))
    assert(corrupt.length === 1 &&
      corrupt(0).getString(1).contains("BROKEN"),
      "malformed page must land raw in _corrupt_record")
  }

  test("Q1 nutriscore: null grade dropped, garbage → UNKNOWN, valid upper-cased") {
    val out = rowsOf(FoodPipeline.nutriscoreDistribution(parsed))
    assert(out === Seq(Seq("E", "1"), Seq("UNKNOWN", "1")))
  }

  test("Q2 categories: lang prefix stripped, placeholder 'undefined' filtered") {
    val out = rowsOf(FoodPipeline.categoryDistribution(parsed))
    // en:spreads → spreads; fr:compotes → compotes; en:undefined → dropped
    assert(out === Seq(Seq("compotes", "1"), Seq("spreads", "1")))
  }

  test("Q3 brands: no-prefix tag passes through; empty array → null dropped") {
    val out = rowsOf(FoodPipeline.brandDistribution(parsed))
    assert(out === Seq(Seq("brandx", "1"), Seq("ferrero", "1")))
  }

  test("Q4 packaging distribution strips prefixes") {
    val out = rowsOf(FoodPipeline.packagingDistribution(parsed))
    assert(out === Seq(Seq("carton", "1"), Seq("glass-jar", "1")))
  }

  test("Q5 nova: digit extracted as int group, label stripped, empty tag dropped") {
    val out = rowsOf(FoodPipeline.novaGroupSummary(parsed))
    assert(out === Seq(
      Seq("1", "1-unprocessed-or-minimally-processed-foods", "1"),
      Seq("4", "4-ultra-processed-food-and-drink-products", "1")))
  }

  test("Q6 additives: explode_outer then non-empty filter = inner explode; main name only") {
    val out = rowsOf(FoodPipeline.additivesExploded(parsed))
    // Compote: no additives → dropped; NoMainName: no 'main' lang → null name kept? No:
    // main-name extraction yields null, rows survive (name not filtered here)
    assert(out === Seq(
      Seq("Nutella", "e322"), Seq("Nutella", "e476"), Seq("null", "e100")))
  }

  test("Q6 top products: count + deterministic representative additive") {
    val out = rowsOf(FoodPipeline.topAdditiveProducts(parsed))
    assert(out.head === Seq("Nutella", "2", "e322") ||
      out.contains(Seq("Nutella", "2", "e322")))
  }

  test("Q6 true-mode variant: most frequent additive, not first/min") {
    // product with additives e476, e476, e322 → mode = e476 (min would say e322)
    val page2 =
      """{"rows":[{"row":{"nutriscore_grade":"a","categories_tags":[],
        |"nutriments":[],"product_name":[{"lang":"main","text":"P"}],
        |"packaging_tags":[],"brands_tags":[],
        |"additives_tags":["en:e476","en:e476","en:e322"],
        |"nova_groups_tags":[]}}]}""".stripMargin.replaceAll("\n", "")
    val parsed2 = FoodPipeline.parsePage(Seq(page2).toDF("value"))
    val modeOut = rowsOf(FoodPipeline.topAdditiveProductsTrueMode(parsed2))
    val minOut = rowsOf(FoodPipeline.topAdditiveProducts(parsed2))
    assert(modeOut === Seq(Seq("P", "3", "e476")))
    assert(minOut === Seq(Seq("P", "3", "e322")))
  }

  test("Q7 sugars: main-lang name + sugars nutriment via array filter, no explode") {
    val out = rowsOf(FoodPipeline.sugarsByCategory(parsed))
    assert(out === Seq(
      Seq("compotes", "Compote", "11.0"), Seq("spreads", "Nutella", "56.3")))
  }

  test("Q7 argmax and max_by variants agree when ties are absent") {
    val a = rowsOf(FoodPipeline.topSugaryPerCategory(parsed))
    val b = rowsOf(FoodPipeline.topSugaryPerCategoryMaxBy(parsed))
    assert(a === b)
  }

  test("nutriments as map gives O(1) lookup results equal to explode+filter") {
    import org.apache.spark.sql.functions._
    val viaMap = FoodPipeline.withNutrimentsMap(parsed)
      .select(element_at(col("nutriments_map"), "sugars").as("sugar"))
      .na.drop()
    assert(rowsOf(viaMap) === Seq(Seq("11.0"), Seq("56.3")))
  }
}
