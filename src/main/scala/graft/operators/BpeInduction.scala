package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer induction — the
  * Sennrich et al. (ACL'16) subword-vocabulary algorithm restated for
  * the Spark execution model.
  *
  * Scale shape: the corpus is scanned ONCE into a distinct-word
  * frequency table (vocab-sized — millions of rows at 100 TB, not
  * trillions); every merge round after that touches ONLY the word
  * table: pair counting is one aggregation over per-word adjacent
  * symbol pairs (weighted by word count, map-side partial sums), the
  * winning pair is a 1-row argmax, and applying the merge is a pure
  * codegen'd higher-order-function fold over each word's symbol
  * array — no UDF, no explode beyond the pair count, no corpus
  * re-scan. n merge rounds cost n vocab-table aggregations; the word
  * table is localCheckpoint'ed each round so plan depth and lineage
  * stay flat regardless of n.
  *
  * Determinism: pair counts are exact longs; the argmax breaks ties
  * by (count DESC, pair ASC) so the learned merge list is a pure
  * function of the corpus — replay/partitioning-independent, the same
  * discipline as every other gate operator.
  *
  * No end-of-word marker is appended (the reference algorithm's </w>
  * is a presentation choice; merges never cross word boundaries here
  * because each word is its own symbol array — the property the
  * marker exists to enforce).
  */
object BpeInduction {

  /** Word-frequency table from a text column: ONE corpus scan.
    * @return (word, cnt) */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol decomposition: one single-character symbol per
    * char. */
  def toSymbols(word: Column): Column = split(word, "")

  /** Adjacent-pair multiset of one symbol array, each pair rendered
    * "left right" (symbols never contain spaces — the tokenizer strips
    * them). Empty for single-symbol words. */
  private def pairsOf(symbols: Column): Column = {
    val n = size(symbols)
    zip_with(
      slice(symbols, lit(1), greatest(n - 1, lit(0))),
      slice(symbols, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Corpus-weighted adjacent-pair counts of a (symbols, cnt) word
    * table: one explode + one sum — the per-round aggregation.
    * @return (pair, cnt) */
  def pairCounts(words: DataFrame, symbolsCol: String = "symbols",
                 cntCol: String = "cnt"): DataFrame =
    words.select(explode(pairsOf(col(symbolsCol))).as("pair"), col(cntCol))
      .groupBy("pair").agg(sum(col(cntCol)).as("cnt"))

  /** Merge every left-to-right non-overlapping (a, b) occurrence in a
    * symbol array into one `a+b` symbol — the BPE merge as ONE
    * codegen'd fold. The accumulator carries (out, pend): `pend` is
    * the one symbol that may still fuse with the next input, so no
    * branch ever indexes into a possibly-empty array (ANSI-safe). */
  def mergePair(symbols: Column, a: String, b: String): Column = {
    val fused = lit(a + b)
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    aggregate(
      symbols, init,
      (acc, x) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend.isNull,
          struct(out.as("out"), x.as("pend")))
        .when(pend === lit(a) && x === lit(b),
          struct(concat(out, array(fused)).as("out"),
            lit(null).cast("string").as("pend")))
        .otherwise(
          struct(concat(out, array(pend)).as("out"), x.as("pend")))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("pend")))))
  }

  /** Learn `nMerges` BPE merges from a corpus.
    *
    * @return the merge list in learned order: (rank 1-based, left,
    *         right) — rows-only at the gate (the iterative induction
    *         has no SQL twin; exact parity with a single-JVM reference
    *         implementation is spec-pinned in BpeSpec)
    */
  def induceMerges(docs: DataFrame, textCol: String,
                   nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 1, "nMerges must be >= 1")
    var words = wordCounts(docs, textCol)
      .select(toSymbols(col("word")).as("symbols"), col("cnt"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // deterministic argmax: count DESC, pair ASC — a 1-row
      // TakeOrderedAndProject over the vocab-sized pair table
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((a, b))
        val prev = words
        words = words
          .select(mergePair(col("symbols"), a, b).as("symbols"), col("cnt"))
          .localCheckpoint(true) // flat lineage: one round, one plan
        prev.unpersist()
        round += 1
      }
    }
    words.unpersist()
    merges.result()
  }

  /** FAST induction: learn up to `roundSize` merges per driver
    * round-trip instead of one — the production mode for 32k–50k-entry
    * vocabularies, where [[induceMerges]]' one-argmax-per-merge loop
    * means nMerges Spark jobs driven serially from the driver.
    *
    * Each round takes the top candidates by the same deterministic
    * (count DESC, pair ASC) order and greedily keeps those that share
    * NO symbol with an earlier keep of the round (including the fused
    * symbols they create). Non-overlapping picks cannot change each
    * other's pair counts — a merge only perturbs counts of pairs
    * touching its own symbols — so every kept pair's count is exact at
    * selection time and the round's merges commute.
    *
    * DOCUMENTED DIVERGENCE from 1-at-a-time BPE: exact induction may
    * rank a pair CREATED by this round's first merge (e.g. "ab c"
    * right after "a b") above the round's remaining picks; the batched
    * order defers such pairs to the next round. The merge LIST can
    * therefore differ from [[induceMerges]]' — but it is still a valid
    * BPE model (deterministic, encoder-foldable in learned order,
    * symbols always reconstruct the word), and `roundSize = 1`
    * degenerates to the exact algorithm, pick for pick (spec-pinned
    * in BpeSpec). Round-trips drop ~roundSize×.
    */
  def induceMergesBatched(docs: DataFrame, textCol: String,
                          nMerges: Int, roundSize: Int = 16): Seq[(String, String)] = {
    require(nMerges >= 1, "nMerges must be >= 1")
    require(roundSize >= 1 && roundSize <= 256,
      "roundSize in [1, 256] (applyMerges folds one round per plan)")
    var words = wordCounts(docs, textCol)
      .select(toSymbols(col("word")).as("symbols"), col("cnt"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    var exhausted = false
    while (learned < nMerges && !exhausted) {
      val want = math.min(roundSize, nMerges - learned)
      // over-fetch so conflict-skipping can still fill the round; an
      // under-filled round self-heals (the next round re-counts)
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(want * 4 + 16).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val picked = Seq.newBuilder[(String, String)]
        var n = 0
        var i = 0
        while (i < top.length && n < want) {
          val Array(a, b) = top(i).getString(0).split(" ", 2)
          if (!used(a) && !used(b) && !used(a + b)) {
            picked += ((a, b))
            used ++= Seq(a, b, a + b)
            n += 1
          }
          i += 1
        }
        val round = picked.result() // first candidate always keeps → progress
        merges ++= round
        learned += round.size
        val prev = words
        words = words
          .select(applyMerges(col("symbols"), round).as("symbols"), col("cnt"))
          .localCheckpoint(true)
        prev.unpersist()
      }
    }
    words.unpersist()
    merges.result()
  }

  /** Apply a learned merge list to a symbol array column, in learned
    * order — `merges.size` nested folds in ONE projection. Fine for
    * the tens of merges the gate trains; a production 30k-merge
    * tokenizer wants the rank-map form of the same loop inside a
    * custom expression instead of a 30k-deep expression tree
    * (documented limit, enforced). */
  def applyMerges(symbols: Column, merges: Seq[(String, String)]): Column = {
    require(merges.size <= 256,
      "applyMerges is an expression-tree encoder: <= 256 merges " +
        "(train more? use a vocabulary-trie encoder)")
    merges.foldLeft(symbols) { case (acc, (a, b)) => mergePair(acc, a, b) }
  }

  /** Encode a text column with a learned merge list: tokenize, split
    * to characters, fold the merges. @return array<string> of BPE
    * symbols per document, word boundaries respected.
    *
    * PER-TOKEN-INSTANCE work: every occurrence of a word re-runs the
    * full merge fold, so this form is for small/streaming frames. A
    * corpus encodes via [[encodeCorpus]], which folds each DISTINCT
    * word once (measured 50×+ faster at sf0.1, and the gap grows with
    * corpus/vocab ratio). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    // coalesce: NULL text encodes to an empty array, matching
    // encodeCorpus — the two entry points must not diverge on the
    // same document
    coalesce(
      flatten(transform(TextFunctions.tokens(text),
        w => applyMerges(toSymbols(w), merges))),
      array().cast("array<string>"))

  /** Persist a learned merge list as a tiny rank-ordered parquet —
    * the tokenizer ARTIFACT a training pipeline ships alongside its
    * corpus (induce once on the 100 TB corpus, encode everywhere).
    * Overwrite semantics: a re-trained model replaces the old one
    * atomically (parquet overwrite). */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)], path: String): Unit = {
    require(merges.nonEmpty, "refusing to persist an empty merge list")
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i + 1L, a, b) }
      .toDF("rnk", "left", "right")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a merge list saved by [[saveMerges]], in learned order. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[(String, String)] = {
    val rows = spark.read.parquet(path)
      .select(col("rnk"), col("left"), col("right"))
      .collect().sortBy(_.getLong(0))
    require(rows.nonEmpty, s"no merges at $path")
    rows.map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** Corpus encoding via the vocabulary: fold the merges over each
    * DISTINCT word (vocab-sized work — the same table induction
    * already aggregates), then broadcast-join token instances to
    * their encodings and reassemble per document in token order.
    *
    * Scale shape: two corpus scans (one feeds the distinct-word fold,
    * one the instance join — cheaper than materializing the exploded
    * token stream), corpus tokens cross ONE shuffle (the per-doc
    * regroup); the expensive merge fold never touches more than the
    * vocabulary. When the vocab outgrows a broadcast, drop the hint —
    * the same plan runs as a shuffle join.
    *
    * @return (idCol, bpe array<string>); docs with no tokens keep an
    *         empty array
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "word")))
    // vocab derives from toks — ONE corpus scan/tokenization feeds
    // both the distinct-word fold and the instance join
    val vocab = toks.select(col("word")).distinct()
      .select(col("word"),
        applyMerges(toSymbols(col("word")), merges).as("syms"))
    val encoded = toks.join(broadcast(vocab), "word")
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("syms")))),
        e => e.getField("syms"))).as("bpe"))
    // left-join back so token-less documents stay present (empty bpe)
    docs.select(col(idCol)).join(encoded, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("bpe"), array().cast("array<string>")).as("bpe"))
  }
}
