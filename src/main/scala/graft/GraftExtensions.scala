package graft

import graft.functions.{CosineSimilarity, DotProduct, HyperplaneCode, KmvAgg, MinHashBands, NGramSet, RunStats, SimHashAgg, SimHashDoc}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}

/** SparkSessionExtensions entry point: installs the engine's custom
  * Catalyst functions at SESSION BUILD time, so any session created
  * with `spark.sql.extensions=graft.GraftExtensions` (spark-submit
  * conf, no code changes) has them in SQL — the deployment-grade
  * alternative to calling VectorFunctions.register() per session.
  *
  * This is the same injection surface a custom Rule[LogicalPlan] or
  * SparkStrategy would use (injectOptimizerRule / injectPlannerStrategy);
  * per SURVEY.md §7.3 no custom rule is needed — every operator here
  * lowers to built-in plans — so functions are the honest extent of
  * plan-level extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Plan-time int literal: the kernel parameters below size generated
    * code, so they must be foldable constants — a column would
    * otherwise surface as a raw unbound-reference NPE from eval()
    * instead of a clear analysis error naming the offending param. */
  private def foldableInt(funcName: String, paramName: String)(e: Expression): Int = {
    def nonFoldable(): Nothing = throw new org.apache.spark.sql.AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map("funcName" -> s"`$funcName`", "paramName" -> s"`$paramName`",
        "paramType" -> "\"INT\""),
      cause = None)
    e match {
      case e if e.foldable => e.eval() match {
        case n: Number => n.intValue()
        case _ => nonFoldable()
      }
      case _ => nonFoldable()
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - inner product of two array<double>"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two array<double>"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("vector_norm"),
      info("vector_norm", "vector_norm(a) - L2 norm of an array<double>"),
      (es: Seq[Expression]) => Sqrt(DotProduct(es(0), es(0)))))
    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands", "minhash_bands(shingles, k) - k MinHash values of an array<string>"),
      (es: Seq[Expression]) =>
        MinHashBands(es(0),
          foldableInt("minhash_bands", "k")(es(1)),
          es.lift(2).map(foldableInt("minhash_bands", "shingleK")).getOrElse(1))))
    ext.injectFunction((FunctionIdentifier("hyperplane_code"),
      info("hyperplane_code", "hyperplane_code(v) - packed 8-plane LSH bucket code of an array<double>"),
      (es: Seq[Expression]) => HyperplaneCode(es(0))))
    ext.injectFunction((FunctionIdentifier("run_stats"),
      info("run_stats", "run_stats(toks[, k]) - struct(max_run, dup_positions) of an array<string>'s k-gram runs (k defaults to 1)"),
      (es: Seq[Expression]) =>
        RunStats(es(0),
          es.lift(1).map(foldableInt("run_stats", "k")).getOrElse(1))))
    ext.injectFunction((FunctionIdentifier("ngram_set"),
      info("ngram_set", "ngram_set(toks, k) - distinct space-joined k-grams of an array<string>, first-occurrence order"),
      (es: Seq[Expression]) =>
        NGramSet(es(0), foldableInt("ngram_set", "k")(es(1)))))
    ext.injectFunction((FunctionIdentifier("simhash_doc"),
      info("simhash_doc", "simhash_doc(toks) - packed 16-bit SimHash of an array<string>"),
      (es: Seq[Expression]) => SimHashDoc(es(0))))
    ext.injectFunction((FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(code) - 16-bit SimHash over grouped BIGINT token codes"),
      (es: Seq[Expression]) => SimHashAgg(es(0)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("kmv_agg"),
      info("kmv_agg", "kmv_agg(hash, k) - struct(n, kth) of the k smallest distinct BIGINT hashes per group"),
      (es: Seq[Expression]) =>
        KmvAgg(es(0), foldableInt("kmv_agg", "k")(es(1))).toAggregateExpression()))
  }
}
