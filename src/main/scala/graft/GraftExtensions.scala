package graft

import graft.functions.{CosineSimilarity, DotProduct, JaroWinkler, MinhashSignature, NfcNormalize, PlanBarrier}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extension registering graft's native Catalyst functions.
  *
  * Wire up with `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions`. After registration the
  * functions are usable from SQL (`graft_dot(a, b)`) and from the DataFrame
  * API via `functions.call_function("graft_dot", a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cos"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cos"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    // graft_barrier(e): identity, but nondeterministic to the optimizer —
    // the filter-pushdown barrier behind graft.ops.Plans.noPushdown
    ext.injectFunction((
      new FunctionIdentifier("graft_barrier"),
      new ExpressionInfo(classOf[PlanBarrier].getName, "graft_barrier"),
      (children: Seq[Expression]) => PlanBarrier(children.head)))
    // graft_jw(a, b): Jaro-Winkler string similarity (DuckDB-pinned)
    ext.injectFunction((
      new FunctionIdentifier("graft_jw"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jw"),
      (children: Seq[Expression]) => JaroWinkler(children.head, children(1))))
    // graft_minhash(baseHashes, numHashes): numHashes must be an int literal
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash numHashes must be an integer literal, got $other")
        }
        MinhashSignature(children.head, n)
      }))
  }
}
