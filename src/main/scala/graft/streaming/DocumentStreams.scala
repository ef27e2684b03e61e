package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of the continuous document-ingest pipeline: the
  * batch building blocks ([[graft.operators.Dedup.ingestDedupBatch]]
  * and friends) wired to Structured Streaming micro-batches.
  */
object DocumentStreams {

  /** Continuous dedup-gated ingest as a streaming sink: every
    * micro-batch drops its internal near-dups, probes the persisted
    * minhash index for near-dups of anything already accepted, appends
    * its survivors to the index, and lands them under
    * `corpusPath/batch_id=<id>`. The first batch bootstraps the index
    * if `<indexName>_bands` doesn't exist yet. Per-batch cost scales
    * with the BATCH (bucket-joins against a bucketed index — see
    * [[graft.operators.Dedup.incrementalNearDupPairs]]), which is what
    * makes this viable as a standing 100 TB ingest gate.
    *
    * Replay semantics (foreachBatch is at-least-once): the corpus
    * write is idempotent — a replayed batch OVERWRITES its own
    * deterministic `batch_id` partition, never duplicating documents
    * downstream. The index append is not replay-deduplicated;
    * duplicate (id, band) rows only widen candidate generation (pairs
    * are distinct-ed before gating) and can never change which
    * documents are accepted — self-pairs are filtered by id.
    */
  def streamingIngestDedup(docs: DataFrame, indexName: String,
                           corpusPath: String, idCol: String,
                           textCol: String, checkpointDir: String,
                           shingleSize: Int = 3, k: Int = 20,
                           bands: Int = 5, threshold: Double = 0.5,
                           maxBucket: Int = 1000,
                           buckets: Int = 8,
                           /** Compact the index every N batches (0 =
                             * never). Runs INSIDE foreachBatch, so the
                             * compactors' single-writer contract holds
                             * by construction — no appender can race
                             * the swap. This is the operational
                             * cadence that keeps zero-exchange probes
                             * fast after thousands of appends. */
                           compactEvery: Int = 0,
                           /** Accretion gate for the cadence: a firing
                             * only rewrites a table holding more than
                             * `buckets * maxFilesPerBucket` files
                             * BEYOND the size-justified baseline
                             * `max(buckets, bytes/targetFileBytes)`
                             * (see [[graft.operators.Maintenance
                             * .compactBucketed]]) — without it every
                             * firing is a full-index rewrite even
                             * when nearly nothing accreted. */
                           maxFilesPerBucket: Int = 4,
                           /** Declarative per-batch quality gate
                             * ([[graft.operators.DataChecks.assertPass]]):
                             * a violating batch fails the stream before
                             * ANY durable effect — index append, corpus
                             * partition, bootstrap — so the restart
                             * replays it clean. */
                           checks: Seq[graft.operators.DataChecks.Check] = Nil): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val bdf = batch.toDF()
        graft.operators.DataChecks.assertPass(bdf, checks,
          s"streamingIngestDedup($indexName) batch $batchId")
        // a PROCESS crash inside a previous batch's compaction swap
        // (DROP landed, RENAME didn't) leaves the table missing while
        // its __compact_ stage — the only complete copy — survives in
        // a persistent metastore. Complete that swap BEFORE the
        // bootstrap decision below: treating "table missing" as
        // "bootstrap" would rebuild the index from this batch alone and
        // silently re-admit near-copies of the whole accreted history.
        if (!spark.catalog.tableExists(s"${indexName}_bands") ||
            !spark.catalog.tableExists(s"${indexName}_shingles"))
          Seq("_bands", "_shingles").foreach { sfx =>
            graft.operators.Maintenance.recoverCompactSwap(
              spark, indexName + sfx)
          }
        val novel =
          if (!spark.catalog.tableExists(s"${indexName}_bands")) {
            // restart audit BEFORE bootstrapping: with a
            // non-persistent catalog, a prior JVM's index FILES
            // survive in the warehouse while the table registration
            // does not. Bootstrapping over them would either crash
            // (CTAS into a non-empty managed location) or rebuild the
            // index from this batch alone — silently re-admitting
            // near-copies of everything accepted before the restart.
            // Fail loud with the two real remedies instead. (The
            // embeddings twin keys off its plain parquet path and is
            // restart-safe without this.)
            // only files whose TABLE is missing count as orphaned: a
            // crashed first-batch bootstrap legitimately leaves the
            // shingles table registered (files + catalog entry) with
            // bands absent — the Overwrite rebuild handles that;
            // flagging registered tables would wedge the stream on a
            // false "restarted without a catalog" diagnosis. The
            // expected location comes from the CATALOG's own
            // default-location logic (handles database-qualified names
            // → <warehouse>/<db>.db/<table>), not a hand-built
            // <warehouse>/<name> path. A table created at a CUSTOM
            // location is out of audit reach by construction — its
            // location lived only in the catalog entry that this very
            // audit says is gone.
            val leftover = Seq("_bands", "_shingles")
              .filterNot(sfx => spark.catalog.tableExists(indexName + sfx))
              .map { sfx =>
                val ident = spark.sessionState.sqlParser
                  .parseTableIdentifier(indexName + sfx)
                // the DATABASE registration may be gone too (same
                // non-persistent catalog) — defaultTablePath would
                // throw NoSuchDatabase; fall back to the catalog's own
                // default-location convention: <warehouse>/<db>.db/
                // for named databases, the warehouse root for 'default'
                // (its location IS the warehouse). An unqualified ident
                // resolves against the CURRENT database here, same as
                // defaultTablePath would have.
                try new org.apache.hadoop.fs.Path(
                  spark.sessionState.catalog.defaultTablePath(ident))
                catch {
                  case _: org.apache.spark.sql.catalyst.analysis.NoSuchDatabaseException =>
                    val wh = new org.apache.hadoop.fs.Path(
                      spark.conf.get("spark.sql.warehouse.dir"))
                    val db = ident.database.getOrElse(
                      spark.sessionState.catalog.getCurrentDatabase).toLowerCase
                    val dbDir =
                      if (db == "default") wh
                      else new org.apache.hadoop.fs.Path(wh, s"$db.db")
                    new org.apache.hadoop.fs.Path(dbDir, ident.table.toLowerCase)
                }
              }
              .filter(p => p.getFileSystem(
                spark.sessionState.newHadoopConf()).exists(p))
            if (leftover.nonEmpty)
              throw new graft.model.UserException(
                s"dedup index '$indexName' has data files " +
                  s"(${leftover.mkString(", ")}) but no catalog entry " +
                  "— restarted with a non-persistent catalog? Configure " +
                  "a persistent metastore to resume this index, or " +
                  "delete the directories to rebuild from scratch")
            // bootstrap: in-batch dedup, then a full index build
            val internal = Dedup.minhashNearDupPairs(bdf, idCol, textCol,
              shingleSize, k, bands, threshold, maxBucket)
            val clean = Dedup.dropNearDups(bdf, internal, idCol).persist()
            try Dedup.saveMinhashIndex(clean, idCol, textCol, indexName,
              shingleSize, k, bands, buckets)
            catch { case e: Throwable => clean.unpersist(); throw e }
            clean
          } else
            Dedup.ingestDedupBatch(spark, indexName, bdf, idCol, textCol,
              shingleSize, k, bands, threshold, maxBucket, buckets)
        try novel.write.mode("overwrite")
          .parquet(s"$corpusPath/batch_id=$batchId")
        finally novel.unpersist()
        // cadence AFTER the batch landed: a compaction failure must
        // not roll back an accepted batch (the corpus partition and
        // index append are already durable). An in-process exception
        // fails the stream loud and the restart replays only the
        // compaction-era batch (idempotent per-batch_id overwrite);
        // PROCESS death inside the swap window is healed by the
        // recoverCompactSwap call at the top of the next batch.
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          graft.operators.Maintenance.compactMinhashIndex(spark, indexName,
            maxFilesPerBucket = maxFilesPerBucket)
        ()
      }
      .start()

  /** The curation pipeline as a standing stream: every micro-batch
    * runs a validated [[graft.model.PipelineConfig]] step chain
    * (lang-ID → quality gates → dedup → … — the same 17 step kinds
    * the batch `pipeline` CLI action speaks) and lands its survivors
    * under `<output>/batch_id=<id>`, the overwrite-idempotent
    * partition scheme every corpus sink here uses, so at-least-once
    * replay never duplicates documents.
    *
    * Step checkpoints (`stepCheckpoints=true`) give INTRA-batch crash
    * resume: a chain that dies at step 9 replays the batch but reuses
    * steps 0–8 from `<checkpointDir>/steps/batch_<id>` — the batch
    * Checkpointer's marker/fingerprint machinery, seeded off the
    * batch_id (under the offset-log contract a replayed id delivers
    * the same rows, so the id is the data identity). Committed
    * batches' step dirs are GC'd as soon as the next batch lands —
    * they can never replay again.
    *
    * Per-batch semantics caveats, inherited from the step library:
    * dedup steps gate WITHIN a micro-batch only — a standing
    * cross-batch dedup gate is [[streamingIngestDedup]]'s job (index
    * state); compose them (this stream's output as that stream's
    * input) when both are needed. `split`/`sample` hash per-document,
    * so they are batch-size-independent and replay-stable.
    *
    * `p.input` and `p.format` are ignored (the stream IS the input);
    * `p.collectStats`/`p.checkpointDir` are batch-mode observability
    * and resume knobs, superseded here by the stream's own machinery.
    */
  def streamingPipeline(docs: DataFrame, p: graft.model.PipelineConfig,
                        dataDir: String, checkpointDir: String,
                        stepCheckpoints: Boolean = true): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", s"$checkpointDir/stream")
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.app.Pipeline.runMicroBatch(batch.toDF(), p, dataDir,
          if (stepCheckpoints) Some(s"$checkpointDir/steps") else None,
          batchId)
      }
      .start()

  /** [[streamingIngestDedup]]'s vector twin: continuous embedding
    * ingest gated by cosine near-dup against the persisted IVF index
    * ([[graft.operators.Similarity.ingestEmbeddingBatch]] per
    * micro-batch — centroid-blocked in-batch dedup, index probe by
    * join, survivor append into the centroid partitions). The first
    * batch bootstraps the index (k-means-trained on itself). Same
    * replay posture: corpus partitions are overwrite-idempotent per
    * batch_id; index replay widens candidates only.
    */
  def streamingIngestEmbeddings(vectors: DataFrame, indexPath: String,
                                corpusPath: String, idCol: String,
                                vecCol: String, checkpointDir: String,
                                threshold: Double = 0.99, nProbe: Int = 4,
                                nCentroids: Int = 16,
                                trainIters: Int = 3,
                                /** Compact touched IVF lists every N
                                  * batches (0 = never) — same
                                  * single-writer-by-construction
                                  * cadence as [[streamingIngestDedup]]. */
                                compactEvery: Int = 0,
                                maxFilesPerList: Int = 4,
                                /** Per-batch quality gate — see
                                  * [[streamingIngestDedup]]'s `checks`. */
                                checks: Seq[graft.operators.DataChecks.Check] = Nil): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import graft.operators.{Dedup, Similarity}
        val bdf = batch.toDF()
        graft.operators.DataChecks.assertPass(bdf, checks,
          s"streamingIngestEmbeddings($indexPath) batch $batchId")
        val bootstrapped =
          new org.apache.hadoop.fs.Path(s"$indexPath/centroids").getFileSystem(
            spark.sparkContext.hadoopConfiguration)
            .exists(new org.apache.hadoop.fs.Path(s"$indexPath/centroids"))
        // heal a previous batch's compaction swap that a process crash
        // cut mid-rename: a licensed _compact_ stage's stranded lists
        // are renamed back in BEFORE this batch probes the index —
        // otherwise the probe keeps validating while silently missing
        // those vectors (re-admitting their near-duplicates)
        if (bootstrapped)
          graft.operators.Maintenance.recoverIvfCompaction(spark, indexPath)
        val novel =
          if (!bootstrapped) {
            // bootstrap: exact in-batch cosine dedup, then index build
            val internal = Similarity.cosineNearDupPairs(bdf, idCol, vecCol,
              threshold)
            val clean = Dedup.dropNearDups(bdf, internal, idCol).persist()
            try Similarity.saveIvfIndex(clean, idCol, vecCol, indexPath,
              nCentroids, trainIters)
            catch { case e: Throwable => clean.unpersist(); throw e }
            clean
          } else
            Similarity.ingestEmbeddingBatch(spark, indexPath, bdf,
              idCol, vecCol, threshold, nProbe)
        try novel.write.mode("overwrite")
          .parquet(s"$corpusPath/batch_id=$batchId")
        finally novel.unpersist()
        // post-landing cadence, same rationale as the text twin
        // (process death mid-swap is healed by the recoverIvfCompaction
        // call at the top of the next batch)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          graft.operators.Maintenance.compactIvfIndex(spark, indexPath,
            maxFilesPerList)
        ()
      }
      .start()
}
