package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the engine's native expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(tokens) …")` works anywhere a session
  * is built through [[Sessions]] (or any session configured with
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))

    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSig(args.head, intArg(args(1), "minhash_sig k"))))

    ext.injectFunction((
      new FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (args: Seq[Expression]) =>
        ShingleSet(args.head, intArg(args(1), "shingle_set n"))))

    ext.injectFunction((
      new FunctionIdentifier("token_split"),
      new ExpressionInfo(classOf[TokenSplit].getName, "token_split"),
      (args: Seq[Expression]) => TokenSplit(args.head)))

    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))))

    ext.injectFunction((
      new FunctionIdentifier("approx_distinct_lc"),
      new ExpressionInfo(classOf[LinearCountSketch].getName, "approx_distinct_lc"),
      (args: Seq[Expression]) =>
        LinearCountSketch(args.head).toAggregateExpression()))
  }
}
