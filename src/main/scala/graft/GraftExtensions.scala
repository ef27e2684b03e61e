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
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args.head)))

    ext.injectFunction((
      new FunctionIdentifier("deflate_length"),
      new ExpressionInfo(classOf[DeflateLength].getName, "deflate_length"),
      (args: Seq[Expression]) => DeflateLength(args.head)))

    ext.injectFunction((
      new FunctionIdentifier("approx_distinct_lc"),
      new ExpressionInfo(classOf[LinearCountSketch].getName, "approx_distinct_lc"),
      (args: Seq[Expression]) =>
        LinearCountSketch(args.head).toAggregateExpression()))

    ext.injectFunction((
      new FunctionIdentifier("frequent_items_sketch"),
      new ExpressionInfo(classOf[FrequentItemsSketch].getName, "frequent_items_sketch"),
      (args: Seq[Expression]) =>
        FrequentItemsSketch(args.head,
          intArg(args(1), "frequent_items_sketch k")).toAggregateExpression()))

    ext.injectFunction((
      new FunctionIdentifier("vector_avg"),
      new ExpressionInfo(classOf[VectorAvg].getName, "vector_avg"),
      (args: Seq[Expression]) =>
        VectorAvg(args.head,
          intArg(args(1), "vector_avg dim")).toAggregateExpression()))

    // Composed operators surfaced to SQL as Catalyst trees mirroring
    // their Column-API formulations (the Column wrapper can't be
    // unwrapped pre-analysis in Spark 4 — ColumnNodes are unresolved).
    import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Md5,
      RegExpExtractAll, RegExpReplace, Remainder, Size, Substring}
    import org.apache.spark.sql.types.{LongType, StringType}

    ext.injectFunction((
      new FunctionIdentifier("redact_pii"),
      new ExpressionInfo(TextFunctions.getClass.getName, "redact_pii"),
      (args: Seq[Expression]) => new RegExpReplace(
        new RegExpReplace(args.head,
          Literal(TextFunctions.emailPattern), Literal("<EMAIL>")),
        Literal(TextFunctions.phonePattern), Literal("<PHONE>"))))

    ext.injectFunction((
      new FunctionIdentifier("bpe_piece_count"),
      new ExpressionInfo(TextFunctions.getClass.getName, "bpe_piece_count"),
      (args: Seq[Expression]) => Cast(
        Size(RegExpExtractAll(args.head,
          Literal(TextFunctions.bpePiecePattern), Literal(0))), LongType)))

    ext.injectFunction((
      new FunctionIdentifier("hash_bucket"),
      new ExpressionInfo(graft.operators.Sampling.getClass.getName, "hash_bucket"),
      (args: Seq[Expression]) => new Remainder(
        Cast(Conv(Substring(Md5(Cast(args.head, StringType)),
          Literal(1), Literal(8)), Literal(16), Literal(10)), LongType),
        Cast(args(1), LongType))))
  }
}
