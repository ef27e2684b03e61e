package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise market-basket association rules — support / confidence /
  * lift over exact integer counts.
  *
  * For every DIRECTED item pair a→b co-occurring in ≥ `minPairCount`
  * baskets:
  *   support    = n_ab / n_baskets
  *   confidence = n_ab / n_a          (P(b | a))
  *   lift       = n_ab·n_baskets / (n_a·n_b)
  *
  * Scale shape: pair generation is a per-basket self-join AFTER
  * per-basket item dedup, so fanout is Σ basket_size² — bounded by the
  * basket width, never a global cartesian (cap pathological baskets
  * upstream; a 10⁶-item "basket" is a data bug, not a basket). Counts
  * partial-aggregate before their shuffles; the three ratios are
  * single IEEE divisions over exact longs, so results are bit-stable
  * across engines and partitionings. `minPairCount` prunes the pair
  * tail BEFORE the item-count joins.
  *
  * n_baskets counts baskets with at least one valid (non-NULL) item —
  * a basket whose items are all NULL never enters support
  * denominators.
  */
object MarketBasket {

  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minPairCount: Long = 1L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    // bi feeds the self-join, the item counts AND the basket total
    // inside ONE returned lazy plan — its distinct's exchange is
    // REUSED across those branches (no cache: a cache would outlive
    // the lazy result and leak; no eager count: that would pay a
    // separate full scan per call)
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    // one-row total, broadcast into the ratio projection
    val nb = bi.agg(count_distinct(col("b")).as("n_baskets"))
    val itemN = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    // undirected co-occurrence counted once (i < j), emitted in both
    // directions afterwards — half the pair shuffle
    val pairN = bi.as("x").join(bi.as("y"), Seq("b"))
      .filter(col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("c"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val directed = pairN
      .unionByName(pairN.select(col("c").as("a"), col("a").as("c"),
        col("n_ab")))
    directed
      .join(itemN.select(col("i").as("a"), col("n_i").as("n_a")), Seq("a"))
      .join(itemN.select(col("i").as("c"), col("n_i").as("n_c")), Seq("c"))
      .crossJoin(broadcast(nb))
      .select(col("a").as("antecedent"), col("c").as("consequent"),
        col("n_ab"), col("n_a"), col("n_c"),
        (col("n_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_c")).cast("double")).as("lift"))
  }
}
