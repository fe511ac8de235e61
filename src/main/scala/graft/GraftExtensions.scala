package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{exprs => fx, CosineSim, MinHashSigs, Shingles, SimHash64}

/** SparkSessionExtensions wiring: exposes the engine's custom Catalyst
  * expressions (and a composed kernel) to SQL — `spark.sql("SELECT
  * graft_simhash64(graft_shingles(text, 1)) ...")` works on any session
  * built with these extensions (or via
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // window-top-k → bounded-heap-aggregate rewrite (scale path)
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (es: Seq[Expression]) => Shingles(es.head,
        if (es.size > 1) litInt(es(1), "k") else 3)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
      (es: Seq[Expression]) => {
        val n = if (es.size > 1) litInt(es(1), "numPerms") else 64
        val (a, b) = fx.minhashPerms(n)
        MinHashSigs(es.head, a, b)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
  }
}
