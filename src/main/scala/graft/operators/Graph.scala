package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the link/interaction-graph
  * signals a corpus-curation pipeline derives (domain authority for
  * source weighting, the PageRank-as-quality-prior trick of web-crawl
  * pretraining sets).
  *
  * Everything here follows the dedup-cluster iteration discipline:
  * per round, ONE key-partitioned join + one aggregation over the
  * EDGE list (never a collect), lineage truncated with localCheckpoint
  * so a 50-round computation plans like a 1-round one.
  */
object Graph {

  /** Default rank-mass denominator: integer NANO-units (1e9 = total
    * mass at N = 1). The per-node quantum is rankDenom / N, so the
    * denominator must scale with the graph — see the guard in
    * [[pageRankQ]]. */
  val RankDenom = 1000000000L

  /** Smallest tolerable per-node initial quantum: below this the
    * floor divisions swallow whole rank differences and mass-starved
    * nodes collapse to indistinguishable zeros. */
  private val MinQuantum = 1000L

  /** localCheckpoint cadence for the rank iteration: lineage is linear
    * so truncation every 3 rounds bounds the plan at 3 chained rounds
    * while paying a third of the materialization jobs. */
  private val CheckpointEvery = 3

  /** Largest safe denominator: the round computes 85 · Σcontrib where
    * Σcontrib ≤ rankDenom, so 85 · rankDenom must stay inside Long. */
  val MaxRankDenom: Long = Long.MaxValue / 100L

  /** Deterministically release a `localCheckpoint`-backed frame's
    * blocks. `Dataset.unpersist` only consults the CacheManager (a
    * checkpoint is not a registered cache), so without this the
    * intermediate per-round checkpoints linger until the
    * ContextCleaner happens to GC the dereferenced RDDs — in a
    * long-lived session that evicts useful cache. No-op on frames
    * that are not checkpoint-backed. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** PageRank by fixed-round power iteration with ALL arithmetic in
    * integer nano-units — floor division at every step, so the result
    * is a pure function of (graph, iterations): partitioning-, order-
    * and engine-independent (an oracle replays it bit-for-bit, and two
    * cluster runs can never disagree in the last ULP the way float
    * power iteration does).
    *
    * Update rule per round (damping d = 85/100, the Page et al.
    * standard, kept as an exact rational):
    *   contrib(s→t) = rank_q(s) div outdeg(s)
    *   rank_q'(t)   = (15·RankDenom) div (100·N)  +  (85·Σ contrib) div 100
    *
    * Dangling mass (nodes with no out-edges) is DROPPED, not
    * redistributed — the original simplification; total mass then
    * decays slightly per round, which rescales ranks uniformly and
    * changes no ordering. Floor-division dust has the same property.
    *
    * Scale shape: per round, the edge list joins ranks on src (one
    * shuffle keyed by src), aggregates contributions by dst (one
    * shuffle keyed by dst), and left-joins back to the node table —
    * work proportional to |E| + |V| per round, no driver state beyond
    * the scalar N. Edge and degree tables are computed once and
    * cached. Rank lineage grows LINEARLY (each round references the
    * previous exactly once), so rounds stay lazy and localCheckpoint
    * fires only every [[CheckpointEvery]] rounds (and at the end) —
    * one materialization job per 3 rounds instead of per round, the
    * duplicateClusters discipline; results are bit-identical because
    * the arithmetic is pure-integer (checkpoint-placement-invariant).
    *
    * @param rankDenom total rank mass in integer units; MUST scale
    *        with the graph (guarded: the per-node quantum
    *        rankDenom / N must stay ≥ 1000, or floor division would
    *        silently zero out the ranking — raise rankDenom for big
    *        graphs, up to [[MaxRankDenom]] ≈ 9.2e16, good for ~9e13
    *        nodes). Pass 0 to AUTO-SCALE: the denominator becomes
    *        max([[RankDenom]], 1000·N), so the same call keeps a
    *        usable quantum at every graph size (mirror the same
    *        GREATEST in any replaying oracle).
    * @return (id, rank_q) — one row per node */
  def pageRankQ(edges: DataFrame, srcCol: String, dstCol: String,
                iterations: Int = 10,
                rankDenom: Long = RankDenom): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(rankDenom == 0 || (rankDenom >= 1 && rankDenom <= MaxRankDenom),
      s"rankDenom 0 (auto) or in [1, $MaxRankDenom], got $rankDenom")
    // the edge lineage (often a join upstream, e.g. the trading-pair
    // derivation) is read by BOTH the degree table and the node table —
    // cache it once so neither re-runs it
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().cache()
    // pre-partition + pre-sort the per-round join side ONCE (guide
    // §2.4 "two operations keyed the same way share one exchange"):
    // the cached layout IS HashPartitioning(src)/sorted(src), so every
    // round's rank join plans zero Exchange and zero Sort on the
    // edge side — only the (node-sized) rank frame moves per round,
    // never the edge list. AQE stays out of cached plans by default
    // (canChangeCachedPlanOutputPartitioning=false), so the
    // partitioning survives for the sort-merge join to consume.
    val eDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src")).sortWithinPartitions("src")
      .cache() // every round joins against it
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .repartition(col("id")).sortWithinPartitions("id")
      .cache() // the per-round left join consumes this layout too
    val n = nodes.count() // the one driver scalar
    require(n > 0, "empty graph")
    // auto-scale: denominator grows with the graph so the per-node
    // quantum never collapses (the fixed default walks into the guard
    // below at ~1e6 nodes; auto mode cannot)
    val rd =
      if (rankDenom == 0L) math.max(RankDenom, MinQuantum * n)
      else rankDenom
    require(rd <= MaxRankDenom,
      s"graph of $n nodes needs rankDenom $rd > MaxRankDenom " +
        s"$MaxRankDenom — beyond integer-quantum range")
    // LOUD quantization guard: a quantum below MinQuantum means the
    // floor arithmetic would erase real rank differences (teleport
    // itself floors to 0 past rankDenom/n < ~7) — the degenerate
    // all-zero "ranking" must never come back silently
    require(rd / n >= MinQuantum,
      s"graph of $n nodes needs rankDenom >= ${MinQuantum * n} for a " +
        s"usable rank quantum (got $rd); raise rankDenom " +
        s"(max $MaxRankDenom) or pass 0 for auto")
    val teleportQ = 15L * rd / (100L * n)
    var ranks: DataFrame = nodes
      .select(col("id"), lit(rd / n).as("rank_q"))
      .localCheckpoint(true)
    // the checkpoint whose blocks the CURRENT lazy lineage still
    // references — freed the moment an eager successor truncates it,
    // so at most one superseded node-sized copy is ever live
    var liveCkpt: DataFrame = ranks
    var i = 0
    while (i < iterations) {
      val sums = eDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr("rank_q div outdeg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("msum"))
      val next = nodes.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(teleportQ) +
            expr("(85 * coalesce(msum, 0L)) div 100")).as("rank_q"))
      // lineage is linear (one self-reference per round), so
      // intermediate rounds stay LAZY; checkpoint every
      // CheckpointEvery rounds (and on the last) to truncate the
      // chain — round count drives shuffle work, not job count
      if ((i + 1) % CheckpointEvery == 0 || i + 1 == iterations) {
        ranks = next.localCheckpoint(true) // eager: consumes liveCkpt
        freeCheckpoint(liveCkpt)
        liveCkpt = ranks
      } else ranks = next
      i += 1
    }
    e.unpersist()
    eDeg.unpersist()
    nodes.unpersist()
    // ranks is localCheckpoint-backed — independent of the dropped
    // caches; blocks reclaim when the frame is dereferenced
    ranks
  }

  /** HITS hubs & authorities (Kleinberg) by fixed-round power
    * iteration, ALL arithmetic integer — the [[pageRankQ]] discipline
    * applied to the bipartite-flavored ranking (who aggregates
    * quality vs who carries it; the buyer/supplier, crawler/content
    * split PageRank's single score conflates).
    *
    * The textbook update normalizes by the L2 norm — irrational, so
    * no two engines agree bit-for-bit. Here each half-round rescales
    * by the MAXIMUM instead (max score = `denom` after every
    * half-round, floor division): same fixpoint direction (scale-free
    * update), fully deterministic, oracle-replayable:
    *
    *   auth_raw(i) = Σ_{j→i} hub(j);   auth = auth_raw·denom div max(auth_raw)
    *   hub_raw(j)  = Σ_{j→i} auth(i);  hub  = hub_raw·denom div max(hub_raw)
    *
    * Each half-round's raw-sum frame is cached and its max read back
    * as a ONE-ROW driver scalar (the [[pageRankQ]] `nodes.count()`
    * budget: O(1) rows per half-round, never node data). Folding the
    * max in as a cross-joined aggregate instead would reference the
    * raw subtree twice per half-round — doubling the logical plan
    * every half-round, 2^(2·rounds) growth (measured: 26 s warm for 3
    * rounds at sf0.1 vs ~2 s this way). Lineage stays linear;
    * localCheckpoint every [[CheckpointEvery]] rounds. Overflow
    * guard: raw sums are bounded by maxdeg·denom — refused loud if
    * that cannot fit a Long.
    *
    * @return (id, hub_q, auth_q) — one row per node */
  def hitsQ(edges: DataFrame, srcCol: String, dstCol: String,
            iterations: Int = 5,
            denom: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(denom >= 1, s"denom must be positive, got $denom")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().cache()
    // NOTE (r19, measured): caching one pre-partitioned copy per join
    // orientation (eBySrc/eByDst, the pageRankQ discipline) was tried
    // and REVERTED — at 3 iterations the two extra cache
    // materializations cost more than the per-half-round exchange
    // they save (job count 57→61, no-broadcast plan showed no
    // exchange removed on the round chain), and memory triples. With
    // many iterations the arithmetic flips; re-measure before raising
    // the default round count.
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().cache()
    val nNodes = nodes.count()
    require(nNodes > 0, "empty graph")
    val maxDeg = math.max(
      e.groupBy("src").count().agg(max("count")).head.getLong(0),
      e.groupBy("dst").count().agg(max("count")).head.getLong(0))
    // the rescale computes raw · denom div max(raw): raw sums reach
    // maxDeg·denom, so the PRODUCT reaches maxDeg·denom² — that is the
    // binding bound, not the raw sums alone (Long.MaxValue/denom/denom
    // floors to 0 when denom² itself overflows, refusing loudly)
    require(maxDeg <= Long.MaxValue / denom / denom,
      s"denom $denom with max degree $maxDeg would overflow the " +
        "rescale product (needs maxDeg × denom² ≤ Long.MaxValue) — " +
        "lower denom")
    val rawCaches = scala.collection.mutable.Buffer.empty[DataFrame]
    /** `complete = false` skips the nodes left join: a node absent
      * from the raw sums has score 0 and contributes nothing to the
      * next half-round's sums, so intermediate rounds work on the
      * raw-keyed frame alone — only the FINAL round joins the full
      * node set so zero-score nodes appear in the output. */
    def rescaled(raw0: DataFrame, as: String,
                 complete: Boolean): DataFrame = {
      // cache: the max probe below materializes it, and the rescale
      // join reads the cached blocks instead of re-running the chain
      val raw = raw0.cache()
      rawCaches += raw
      val mRow = raw.agg(max(col("raw"))).head()
      // raw is nonempty and every hub/auth max is exactly denom after
      // its rescale, so the max is >= denom >= 1 — assert, don't mask
      require(!mRow.isNullAt(0) && mRow.getLong(0) >= 1L,
        "HITS invariant broken: empty or non-positive raw-sum max")
      val m = mRow.getLong(0)
      val base = if (complete) nodes.join(raw, Seq("id"), "left") else raw
      base.select(col("id"),
        expr(s"coalesce(raw, 0L) * $denom div ${m}L").as(as))
    }
    var hubs: DataFrame = nodes.select(col("id"), lit(denom).as("hub_q"))
      .localCheckpoint(true)
    var auths: DataFrame = null
    // checkpoints the lazy lineage still references; freed the moment
    // a newer eager checkpoint supersedes them (the pageRankQ
    // discipline — the final round's pair stays live in the output)
    var liveCkpts: List[DataFrame] = List(hubs)
    var i = 0
    while (i < iterations) {
      val checkpointRound = (i + 1) % CheckpointEvery == 0 ||
        i + 1 == iterations
      val lastRound = i + 1 == iterations
      val authRaw = e.join(hubs.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("hub_q")).as("raw"))
      val a0 = rescaled(authRaw, "auth_q", complete = lastRound)
      // checkpoint a BEFORE h builds on it: h's eager checkpoint would
      // otherwise re-run a's whole lineage a second time
      val a = if (checkpointRound) {
        val c = a0.localCheckpoint(true) // eager: supersedes liveCkpts
        liveCkpts.foreach(freeCheckpoint)
        liveCkpts = List(c)
        c
      } else a0
      val hubRaw = e.join(a.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("auth_q")).as("raw"))
      val h0 = rescaled(hubRaw, "hub_q", complete = lastRound)
      auths = a
      hubs = if (checkpointRound) {
        val c = h0.localCheckpoint(true)
        if (!lastRound) { // last round keeps a: it is joined into out
          liveCkpts.foreach(freeCheckpoint)
          liveCkpts = Nil
        }
        liveCkpts = liveCkpts :+ c
        c
      } else h0
      i += 1
    }
    // final round checkpointed both frames eagerly — every cache below
    // is now unreferenced by the returned plan
    val out = hubs.join(auths, Seq("id"))
    rawCaches.foreach(_.unpersist())
    e.unpersist()
    nodes.unpersist()
    out
  }

  /** Per-node triangle counts (the clustering/community signal link
    * analysis ranks sources by): every node that closes at least one
    * triangle, with how many it closes. Nodes in no triangle are
    * omitted — left-join [[pageRankQ]]-style node tables for zeros.
    *
    * The naive formulation (wedge join on EVERY node's adjacency)
    * explodes quadratically at hub nodes: a degree-d node generates
    * C(d,2) wedges, and real link graphs are power-law — one 10⁶-
    * degree hub would emit 5·10¹¹ wedges. DEGREE ORIENTATION (the
    * standard compact-forward trick: point each undirected edge from
    * the (degree, id)-smaller endpoint to the larger) caps every
    * node's OUT-degree at O(√|E|), so total wedge work is O(|E|^1.5)
    * worst case — the scalable bound — while each triangle is
    * produced exactly once (its orientation-minimal corner emits the
    * wedge; the closing edge is oriented the same way by
    * transitivity of the total order).
    *
    * Shape: canonical-edge distinct (one shuffle), degree agg (one
    * shuffle), wedge self-join keyed on the spoke node, then one
    * equi-join of wedges against oriented edges — every step a
    * key-partitioned join/agg, no driver state, no collect.
    *
    * @return (id, triangles) — one row per triangle-closing node */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    // canonical undirected form: u < v, loops and NULLs dropped,
    // parallel edges collapsed (a triangle is a property of the
    // SIMPLE graph)
    val e = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull &&
        col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .distinct()
      .cache() // read by the degree agg AND the orientation join
    val deg = e.select(col("u").as("id"))
      .unionByName(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): a → b with a strictly smaller in the total
    // order; carry b's (deg, id) so the wedge join can order spokes
    // without re-joining degrees
    val oriented = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b"), col("dv").as("db")))
          .otherwise(
            struct(col("v").as("a"), col("u").as("b"), col("du").as("db")))
          .as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"), col("o.db").as("db"))
      // pre-partition + pre-sort on the wedge key: BOTH sides of the
      // wedge self-join below read this cache, so the join plans with
      // ZERO exchanges and zero sorts (guide §2.4); only the closing
      // probe re-keys (b, c)
      .repartition(col("a")).sortWithinPartitions("a")
      .cache() // wedge join reads it twice + the closing probe
    // wedges (a; b → c) with b before c in the SAME total order, so
    // the closing edge {b, c} — if present — is oriented b → c and one
    // equi-join finds it
    val wedges = oriented.as("l")
      .join(oriented.as("r"), Seq("a"))
      .filter(col("l.db") < col("r.db") ||
        (col("l.db") === col("r.db") && col("l.b") < col("r.b")))
      .select(col("a"), col("l.b").as("b"), col("r.b").as("c"))
    val triangles = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    // node-sized result: checkpoint it eagerly so the edge-sized
    // caches can be released NOW instead of lingering in the block
    // manager until session GC (the pageRankQ/hitsQ exit discipline)
    val out = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
      .localCheckpoint(true)
    oriented.unpersist()
    e.unpersist()
    out
  }

  /** k-core of the undirected simple graph: the maximal subgraph in
    * which every node has degree ≥ k — the standard density filter
    * link-based curation uses to separate a connected COMMUNITY from
    * stars and chains (a spam hub with a million leaf links has a huge
    * degree but falls out of even the 2-core once its leaves peel).
    *
    * Synchronous peeling: each round drops every node whose degree
    * WITHIN the surviving subgraph is < k, until a fixpoint. The
    * fixpoint is order-independent (peeling is monotone — the k-core
    * is unique), so the result is a pure function of (graph, k) and an
    * unrolled-round oracle replays it exactly: peeling past the
    * fixpoint is a no-op, so an oracle unrolling R ≥ convergence
    * rounds always agrees.
    *
    * Scale shape: per round, TWO semi-joins of the edge list against
    * the shrinking survivor set (keyed on each endpoint) + one degree
    * aggregation — work ∝ surviving |E| per round, no driver state
    * beyond the per-round survivor count (the [[pageRankQ]] scalar
    * budget). Unlike pageRankQ, the convergence check FORCES an action
    * every round, so rounds checkpoint eagerly every time — each
    * round's work runs exactly once (lazy rounds + a count would
    * re-execute the chain since the last checkpoint), and the
    * superseded checkpoint is freed immediately. `maxRounds` refuses
    * loudly rather than spinning on a pathological path graph (peel
    * depth is ≪ 20 on real link graphs, but a length-L chain peels in
    * Θ(L/2) rounds).
    *
    * @return (id, core_deg) — the k-core members with their degree
    *         inside the core (core_deg ≥ k by construction; empty
    *         frame with the same schema when the core is empty) */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val e = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull &&
        col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .distinct()
      // pre-partition + pre-sort on the FIRST per-round join key: the
      // u-side semi-join every peel round reuses the cached exchange
      // and sort (guide §2.4); the v-side join re-keys unavoidably
      .repartition(col("u")).sortWithinPartitions("u")
      .cache() // re-joined every peel round
    var live: DataFrame = e.select(col("u").as("id"))
      .unionByName(e.select(col("v").as("id")))
      .distinct().localCheckpoint(true)
    var liveCkpt: DataFrame = live
    var n = live.count()
    var round = 0
    while (round < maxRounds) {
      // edges whose BOTH endpoints survive, then degree within them
      val le = e
        .join(live.select(col("id").as("u")), "u")
        .join(live.select(col("id").as("v")), "v")
      val next = le.select(col("u").as("id"))
        .unionByName(le.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("core_deg"))
        .filter(col("core_deg") >= k)
        .localCheckpoint(true) // eager: supersedes liveCkpt
      freeCheckpoint(liveCkpt)
      liveCkpt = next
      val m = next.count() // the one driver scalar per round
      if (m == n || m == 0L) {
        // fixpoint (every survivor already had core_deg >= k, so the
        // degrees in `next` ARE the core degrees) or empty core — the
        // typed empty frame falls out of the same plan
        e.unpersist()
        return next
      }
      live = next.select(col("id"))
      n = m
      round += 1
    }
    throw new IllegalArgumentException(
      s"k-core peel did not converge in $maxRounds rounds " +
        s"($n nodes still live) — raise maxRounds")
  }

  /** Multi-source BFS hop levels on the undirected graph: per node the
    * length of the shortest edge path from ANY seed (0 for the seeds
    * themselves; nodes unreached within `maxHops` are absent).
    *
    * Synchronous frontier expansion — per round ONE frontier→neighbor
    * equi-join plus one anti-join against the visited set, both
    * key-partitioned (never a cartesian, never a collect). Rounds
    * checkpoint eagerly ([[kCore]]'s discipline: the convergence probe
    * forces an action anyway, so lazy rounds would re-execute the
    * chain) and the superseded checkpoint is freed immediately. At
    * 100 TB this is the standard O(diameter)-round Pregel BFS; real
    * link graphs bottom out in single-digit rounds.
    */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, idCol: String,
                maxHops: Int = 20): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    // filter AFTER the direction union so a NULL endpoint is dropped
    // from BOTH branches (a null-dst edge reversed is a null-src edge)
    val und = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .unionByName(edges.select(col(dstCol).as("s"), col(srcCol).as("d")))
      .filter(col("s").isNotNull && col("d").isNotNull &&
        col("s") =!= col("d"))
      .distinct()
      // pre-partition + pre-sort on the frontier-join key so every
      // hop's expansion join reuses the cached exchange (guide §2.4)
      .repartition(col("s")).sortWithinPartitions("s")
      .cache() // re-joined every hop
    var visited = seeds.select(col(idCol).as("id")).distinct()
      .withColumn("hop", lit(0)).localCheckpoint(true)
    var frontier = visited.select("id")
    var hop = 0
    while (hop < maxHops) {
      hop += 1
      val next = frontier.join(und, col("id") === col("s"))
        .select(col("d").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint(true)
      if (next.isEmpty) {
        freeCheckpoint(next)
        und.unpersist()
        return visited
      }
      val grown = visited.unionByName(next).localCheckpoint(true)
      freeCheckpoint(visited)
      freeCheckpoint(next)
      visited = grown
      frontier = grown.filter(col("hop") === hop).select("id")
    }
    und.unpersist()
    visited
  }

  /** Link prediction over the undirected simple graph: for every
    * non-adjacent node pair that shares at least `minCommon`
    * neighbors, the three classic neighborhood scores —
    * common-neighbor count, node Jaccard cn / (deg_a + deg_b − cn),
    * and Adamic–Adar Σ_w 1/ln(deg(w)) over the shared neighbors w
    * (rare shared neighbors are strong evidence; hubs are weak).
    *
    * Determinism: cn and the degrees are exact integers; Jaccard is
    * ONE IEEE division; each Adamic–Adar term is 1/round(ln(deg),9)
    * (the psi_term libm-ulp discipline) summed through DECIMAL so the
    * total is independent of partitioning and engine.
    *
    * Scale shape: candidate pairs arise ONLY from the wedge self-join
    * keyed on the shared neighbor — never an all-pairs product — so
    * the work is Σ_w deg(w)² over spokes. `maxSpokeDeg` caps that
    * quadratic term the way the n-gram containment df-cap does: a hub
    * above the cap contributes NO pair evidence (its 1/ln weight is
    * negligible anyway), bounding per-spoke fanout at maxSpokeDeg².
    * The cap is part of the operator's semantics — an oracle must
    * mirror it. Known-edge pairs leave via one anti-join against the
    * canonical edge set.
    *
    * @return (id_a, id_b, common, jaccard, adamic_adar), id_a < id_b */
  def linkPredict(edges: DataFrame, srcCol: String, dstCol: String,
                  maxSpokeDeg: Int = 10000,
                  minCommon: Int = 1): DataFrame = {
    require(maxSpokeDeg >= 2, s"maxSpokeDeg must be >= 2, got $maxSpokeDeg")
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val e = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull &&
        col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .distinct()
      .cache() // adjacency + degrees + the known-edge anti-join
    val adj = e.select(col("u").as("w"), col("v").as("n"))
      .unionByName(e.select(col("v").as("w"), col("u").as("n")))
    val deg = adj.groupBy(col("w").as("id")).agg(count(lit(1)).as("deg"))
    // spokes above the cap contribute no wedge (semantics, not a
    // heuristic — mirrored by the oracle)
    val spokes = adj
      .join(deg.select(col("id").as("w"), col("deg").as("dw")), "w")
      .filter(col("dw") <= maxSpokeDeg)
    val pairs = spokes.as("l").join(spokes.as("r"), Seq("w"))
      .filter(col("l.n") < col("r.n"))
      .select(col("l.n").as("id_a"), col("r.n").as("id_b"),
        col("l.dw").as("dw"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"),
        sum((lit(1.0) / round(log(col("dw").cast("double")), 9))
          .cast("decimal(28,12)")).cast("double").as("adamic_adar"))
      .filter(col("common") >= minCommon)
      // id_a < id_b matches the canonical edge orientation, so one
      // equi-anti-join removes every already-linked pair
      .join(e.select(col("u").as("id_a"), col("v").as("id_b")),
        Seq("id_a", "id_b"), "left_anti")
    val out = pairs
      .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
      .select(col("id_a"), col("id_b"), col("common"),
        (col("common").cast("double") /
          (col("da") + col("db") - col("common")).cast("double"))
          .as("jaccard"),
        col("adamic_adar"))
      .localCheckpoint(true) // node-pair-sized; frees the edge cache
    e.unpersist()
    out
  }
}
