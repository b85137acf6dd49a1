package graft

import graft.functions.{CosineSimilarity, DotProduct, HyperplaneCode, MinHashBands, NGramSet, RunStats, SimHashAgg, SimHashDoc}
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
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

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
      (es: Seq[Expression]) => {
        // the hash count parameterizes codegen, so it must be a plan-time
        // constant; a column here would otherwise surface as a raw
        // unbound-reference NPE from eval() instead of an analysis error
        def nonFoldable(): Nothing = throw new org.apache.spark.sql.AnalysisException(
          "NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> "`minhash_bands`", "paramName" -> "`k`",
            "paramType" -> "\"INT\""),
          cause = None)
        def lit(e: Expression): Int = e match {
          case e if e.foldable => e.eval() match {
            case n: Number => n.intValue()
            case _ => nonFoldable()
          }
          case _ => nonFoldable()
        }
        MinHashBands(es(0), lit(es(1)), es.lift(2).map(lit).getOrElse(1))
      }))
    ext.injectFunction((FunctionIdentifier("hyperplane_code"),
      info("hyperplane_code", "hyperplane_code(v) - packed 8-plane LSH bucket code of an array<double>"),
      (es: Seq[Expression]) => HyperplaneCode(es(0))))
    ext.injectFunction((FunctionIdentifier("run_stats"),
      info("run_stats", "run_stats(toks[, k]) - struct(max_run, dup_positions) of an array<string>'s k-gram runs (k defaults to 1)"),
      (es: Seq[Expression]) => {
        // k parameterizes codegen: plan-time constant required (see
        // the minhash_bands note above)
        def nonFoldable(): Nothing = throw new org.apache.spark.sql.AnalysisException(
          "NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> "`run_stats`", "paramName" -> "`k`",
            "paramType" -> "\"INT\""),
          cause = None)
        val k = es.lift(1) match {
          case None => 1
          case Some(e) if e.foldable => e.eval() match {
            case n: Number => n.intValue()
            case _ => nonFoldable()
          }
          case _ => nonFoldable()
        }
        RunStats(es(0), k)
      }))
    ext.injectFunction((FunctionIdentifier("ngram_set"),
      info("ngram_set", "ngram_set(toks, k) - distinct space-joined k-grams of an array<string>, first-occurrence order"),
      (es: Seq[Expression]) => {
        def nonFoldable(): Nothing = throw new org.apache.spark.sql.AnalysisException(
          "NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> "`ngram_set`", "paramName" -> "`k`",
            "paramType" -> "\"INT\""),
          cause = None)
        val k = es(1) match {
          case e if e.foldable => e.eval() match {
            case n: Number => n.intValue()
            case _ => nonFoldable()
          }
          case _ => nonFoldable()
        }
        NGramSet(es(0), k)
      }))
    ext.injectFunction((FunctionIdentifier("simhash_doc"),
      info("simhash_doc", "simhash_doc(toks) - packed 16-bit SimHash of an array<string>"),
      (es: Seq[Expression]) => SimHashDoc(es(0))))
    ext.injectFunction((FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(code) - 16-bit SimHash over grouped BIGINT token codes"),
      (es: Seq[Expression]) => SimHashAgg(es(0)).toAggregateExpression()))
  }
}
