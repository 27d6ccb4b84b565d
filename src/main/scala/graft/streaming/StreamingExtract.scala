package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.canonical.Canonicalize
import graft.pipeline.{Fs, Pipeline}
import graft.schema.RawDoc

/** Structured-Streaming ingest for the KG pipeline: the batch engine's
  * fused per-doc extract (P2-P13 + N1-N6 + R1-R8, `Pipeline.extract`)
  * applied unchanged to a STREAM of raw documents, with an INCREMENTAL
  * cross-document link.
  *
  * Why extraction streams cleanly: it is stateless and embarrassingly
  * parallel per document — one narrow `mapPartitions` over the source,
  * no shuffle, no state store, no watermark needed. Exactly-once per
  * doc comes from the source's offset tracking PLUS an idempotent sink:
  * foreachBatch is at-least-once, so each micro-batch overwrites its
  * own batchId-named dir (a crash-replayed batch rewrites identical
  * content instead of appending duplicates) — the streaming twin of
  * the batch path's per-doc checkpoint anti-join
  * ([[graft.pipeline.Checkpoint]]).
  *
  * Cross-document linking (connected-components canonicalization) is a
  * GLOBAL computation — any new doc can reshape components. But it can
  * still be updated incrementally WITHOUT approximation, because CC
  * merges only travel along shared (kind, surface-form) edges: a batch
  * can only reshape components REACHABLE from its own entities' forms.
  * Per micro-batch the linker therefore:
  *
  *   1. finds the prior components TOUCHED by the batch (batch forms
  *      joined against the accumulated entity-form table — entity-vocab
  *      bounded, never corpus bounded);
  *   2. re-runs CC on touched-component entities + batch entities ONLY
  *      (the star-shape contract in [[Canonicalize.normalForms]] makes
  *      one component-hop closure sufficient: every merge chain passes
  *      through a batch entity, whose direct form-neighbors all lie in
  *      touched components);
  *   3. unions the untouched remainder of the previous canonical map —
  *      bit-identical to a full re-link (the spec proves stream==batch);
  *   4. rebuilds only the triples whose subject OR object component was
  *      touched (their source predictions re-joined against the new
  *      canonical map), keeps the rest of the previous triple table
  *      as-is, and swaps the union into `workDir/triples`.
  *
  * Per-batch cost is therefore: one id-width columnar scan of the
  * accumulated extract table (to fetch predictions touching touched
  * components — parquet column pruning reads no text, which never
  * leaves the extract stage anyway), plus CC + joins bounded by the
  * touched components and the batch, NOT by the accumulated corpus.
  * The previous O(total)-re-link-per-trigger behavior (quadratic
  * cumulative for a long-running stream) is gone; per-batch metrics
  * (`state/batch_N/metrics.json`) record `cc_input_entities` vs
  * `total_entities` so the bound is auditable per trigger.
  *
  * Link state lives in batchId-versioned dirs (`state/batch_N`), each
  * holding the accumulated entity table, canonical map and triple table
  * plus a `_COMMIT` marker written last. A replayed batch N rebuilds
  * from state N-1 (still present — only states older than N-1 are
  * pruned) and overwrites state N with identical content, so the
  * at-least-once contract holds for the linker too.
  */
object StreamingExtract {

  /** The per-doc extract stream: predictions + entity rows as a
    * streaming Dataset (one narrow pass, `isStreaming == true`). */
  def extractStream(spark: SparkSession, raw: Dataset[RawDoc],
      gazette: Seq[(String, String)]): Dataset[Pipeline.DocExtract] =
    Pipeline.extract(spark, raw, gazette, keepNegatives = false)

  /** End-to-end streaming sink: per micro-batch, append the batch's
    * extract output under `workDir/extract_stream`, then incrementally
    * update the canonical map + `workDir/triples` (overwrite-swap so
    * readers never see a torn table). Returns the started query;
    * callers own its lifecycle (`processAllAvailable`/`stop`). */
  def runToTriples(spark: SparkSession, raw: Dataset[RawDoc],
      gazette: Seq[(String, String)], workDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0),
      icebergTable: Option[String] = None,
      compactEvery: Int = 16): StreamingQuery = {
    val extractDir = s"$workDir/extract_stream"
    // fail fast on the pre-batch-dir layout (flat parquet files directly
    // under extract_stream): the committed source offsets would skip
    // those docs while the batch-dir read ignores their rows — silent
    // data loss. Move the files into a batch_* dir (or re-ingest into a
    // fresh workDir) before resuming.
    require(Fs.listFiles(extractDir, "part-").isEmpty,
      s"$extractDir holds flat (pre-batch-layout) parquet files; move " +
        "them into a batch_* subdirectory or re-ingest into a fresh " +
        "workDir before resuming")
    extractStream(spark, raw, gazette).writeStream
      .option("checkpointLocation", s"$workDir/_stream_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Pipeline.DocExtract], batchId: Long) =>
        // IDEMPOTENT batch sink: foreachBatch is at-least-once (a crash
        // between the data write and the engine's commit-log entry
        // replays the batch), so each batch OVERWRITES its own
        // batchId-named dir instead of appending to a shared one —
        // a replay rewrites identical content, never duplicates docs
        batch.write.mode("overwrite")
          .parquet(f"$extractDir/batch_$batchId%08d")
        incrementalLink(batch.sparkSession, workDir, batchId, icebergTable,
          compactEvery)
      }
      .start()
  }

  /** Tier of an extract dir name: plain batch dirs are tier 0, tiered
    * compacts `batch_XXXXXXXX_cT` are tier T, and LEGACY cumulative
    * compacts `batch_XXXXXXXX_compact` (which by construction folded
    * EVERYTHING up to their bound) rank above every tier so the
    * supersession rule below treats them as the covering prefix they
    * are. */
  private def tierOf(name: String): Int =
    if (name.endsWith("_compact")) Int.MaxValue
    else {
      val i = name.lastIndexOf("_c")
      if (i > 0 && name.drop(i + 2).nonEmpty &&
          name.drop(i + 2).forall(_.isDigit)) name.drop(i + 2).toInt
      else 0
    }

  /** Covered-range upper bound of an extract dir name (the plain batch
    * name itself for tier 0). */
  private def boundOf(name: String): String =
    if (name.endsWith("_compact")) name.stripSuffix("_compact")
    else if (tierOf(name) > 0) name.take(name.lastIndexOf("_c"))
    else name

  /** The committed extract dirs strictly BEFORE `curName`, compaction
    * aware. Compacts are size-tiered (see [[maybeCompactExtract]]):
    * tier T+1 dirs fold `every` CONSECUTIVE OLDEST tier-T units, so at
    * any moment the committed tiers partition the batch sequence into
    * a prefix of high tiers and a tail of lower ones. The live view is
    * therefore: every committed dir NOT superseded by a committed
    * HIGHER-tier compact whose bound reaches it (a crash between a
    * compact's commit marker and the deletion of its inputs leaves
    * both on disk; reading both would double-count rows). */
  private[graft] def extractDirsBefore(extractDir: String,
      curName: String): Seq[String] = {
    val committed = Fs.listDirs(extractDir, "batch_")
      .filter(d => boundOf(d.split('/').last) < curName)
      .filter(d => tierOf(d.split('/').last) == 0 ||
        Fs.exists(s"$d/_COMPACT_COMMIT"))
    committed.filterNot { d =>
      val n = d.split('/').last
      committed.exists { c =>
        val cn = c.split('/').last
        tierOf(cn) > tierOf(n) && boundOf(cn) >= boundOf(n)
      }
    }.sortBy(d => boundOf(d.split('/').last))
  }

  /** Size-tiered compaction of the extract layout: whenever `every`
    * units of one tier exist, the OLDEST `every` fold into one unit of
    * the next tier (`batch_<bound>_c<tier+1>`, bound = the fold's max
    * covered batch), cascading upward until no tier is full. At real
    * trigger rates the one-dir-per-batch layout is a small-files bomb
    * on an object store (every incremental link re-lists and re-opens
    * them); tiering keeps the dir count at O(every * log_every(N))
    * while each row is rewritten only when it climbs a tier — total
    * rewrite O(N log N) bytes over a stream's lifetime. The previous
    * single-compact scheme folded the WHOLE prefix into a fresh
    * cumulative compact every `every` batches: O(N^2 / every) bytes
    * rewritten, which at real trigger rates makes compaction itself
    * the dominant write cost of the stream.
    *
    * Crash safety, per fold: (1) the compacted dir is written first,
    * (2) its `_COMPACT_COMMIT` marker second, (3) the folded inputs
    * are deleted last. A crash before (2) leaves an ignored
    * uncommitted dir that the same deterministic fold overwrites on
    * the next call; a crash between (2) and (3) leaves duplicates on
    * disk that [[extractDirsBefore]]'s supersession rule already
    * excludes — the cleanup sweep here finishes the deletion. Only
    * dirs strictly before the CURRENT batch are compacted: the current
    * batch dir may still be replayed by the engine and must stay
    * individually overwritable.
    *
    * Returns the number of rows rewritten (0 when nothing folded) so
    * callers/specs can audit the cumulative rewrite cost. */
  private[graft] def maybeCompactExtract(spark: SparkSession,
      extractDir: String, curName: String, every: Int): Long = {
    if (every <= 0) return 0L
    var rewritten = 0L
    // finish any interrupted cleanup first (superseded leftovers linger
    // only until the next link step)
    def sweep(): Unit = {
      val live = extractDirsBefore(extractDir, curName)
      Fs.listDirs(extractDir, "batch_")
        .filter(d => boundOf(d.split('/').last) < curName)
        .filterNot(live.contains)
        .filter(d => tierOf(d.split('/').last) == 0 ||
          Fs.exists(s"$d/_COMPACT_COMMIT")) // keep in-progress folds
        .foreach(Fs.deleteRecursive)
    }
    sweep()
    var folded = true
    while (folded) {
      folded = false
      val live = extractDirsBefore(extractDir, curName)
      val byTier = live.groupBy(d => tierOf(d.split('/').last))
      // lowest full tier folds first; legacy cumulative compacts
      // (Int.MaxValue) are already a covering prefix and never re-fold
      byTier.toSeq.sortBy(_._1)
        .find { case (t, ds) => t != Int.MaxValue && ds.size >= every }
        .foreach { case (t, ds) =>
          val fold = ds.sortBy(d => boundOf(d.split('/').last)).take(every)
          val bound = boundOf(fold.last.split('/').last)
          val target = s"$extractDir/${bound}_c${t + 1}"
          val df = spark.read.parquet(fold: _*)
          df.write.mode("overwrite").parquet(target)
          rewritten += spark.read.parquet(target).count()
          Fs.writeString(s"$target/_COMPACT_COMMIT", "")
          fold.foreach(Fs.deleteRecursive)
          folded = true
        }
    }
    rewritten
  }

  /** One incremental link step over the just-written extract batch.
    * Reads the batch back from its parquet dir (not the streaming
    * Dataset — deterministic on replay) and the previous committed
    * state; writes state `batch_<batchId>` and swaps the updated triple
    * table into `workDir/triples`. */
  private[graft] def incrementalLink(spark: SparkSession, workDir: String,
      batchId: Long, icebergTable: Option[String] = None,
      compactEvery: Int = 16): Unit = {
    import spark.implicits._
    val extractDir = s"$workDir/extract_stream"
    val stateRoot = s"$workDir/state"
    val curName = f"batch_$batchId%08d"
    val cur = s"$stateRoot/$curName"
    // previous committed state: strictly earlier than THIS batch — a
    // crashed attempt at this batchId may have left a partial (or even
    // committed) state dir, which a replay must rebuild, never read
    val prevDir = Fs.listDirs(stateRoot, "batch_")
      .filter(d => d.split('/').last < curName)
      .filter(d => Fs.exists(s"$d/_COMMIT"))
      .lastOption

    // local persist tracking: unpersist exactly what this step cached
    // (not catalog-wide clearCache — the enclosing session may hold
    // caches the caller owns)
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def cached(df: DataFrame): DataFrame = {
      persisted += df.persist(); df
    }

    val batchExtract = spark.read.parquet(s"$extractDir/$curName")
      .as[Pipeline.DocExtract]
    val batchEnts = cached(Pipeline.dedupeEntities(
      batchExtract.flatMap(_.entities).toDF()))
    val batchPreds = batchExtract.flatMap(_.predictions).toDF()
      .filter($"answer")

    val (allEnts, newCanon, triples, ccInputN, touchedN, keptPrev, delta) =
      prevDir match {
        case None =>
          val canon = cached(Canonicalize.components(spark, batchEnts))
          (batchEnts, canon, Pipeline.triplesOf(batchPreds, canon),
            batchEnts.count(), 0L, 0L,
            None: Option[(DataFrame, DataFrame)])
        case Some(p) =>
          val prevEnts = cached(spark.read.parquet(s"$p/entities"))
          val prevCanon = cached(spark.read.parquet(s"$p/canonical"))
          val prevTriples = spark.read.parquet(s"$p/triples")
          // 1. touched components: prior entities sharing ANY
          //    (kind, form) with a batch entity, lifted to their
          //    component. Both sides entity-vocab bounded.
          val batchForms = Canonicalize.entityForms(batchEnts)
            .select($"form").distinct()
          // touched = prior entities sharing a (kind, form) with the
          // batch, PLUS prior entities whose entity_key itself recurs
          // in the batch. The second leg is NOT redundant: coref
          // repointing can attach a form-disjoint, lexicographically
          // smaller alias to an existing key (e.g. a created anaphora
          // mention on a gazette canonical), and dedupeEntities'
          // min(alias) then REPLACES the key's form set — without the
          // key-identity leg the key's prior component reads as
          // untouched, newCanon holds the key twice (sub-CC + untouched
          // remainder) and the alias-min's split/re-merge never applies,
          // breaking the bit-identical-to-full-re-link guarantee.
          val touchedKeys0 = Canonicalize.entityForms(prevEnts)
            .join(batchForms, "form").select($"entity_key")
            .unionByName(prevEnts
              .join(batchEnts.select($"entity_key"),
                Seq("entity_key"), "leftsemi")
              .select($"entity_key"))
            .distinct()
          val touchedComps = cached(prevCanon.join(touchedKeys0, "entity_key")
            .select($"canonical").distinct())
          // every entity of a touched component (the CC re-run needs the
          // full component, or the representative election would forget
          // members)
          val touchedEnts = prevEnts.join(prevCanon, "entity_key")
            .join(touchedComps, Seq("canonical"), "leftsemi")
            .drop("canonical")
          // 2. CC over touched + batch only
          val ccInput = cached(Pipeline.dedupeEntities(
            touchedEnts.unionByName(batchEnts)))
          val subCanon = Canonicalize.components(spark, ccInput)
          // 3. untouched remainder keeps its canonical verbatim
          val untouched = prevCanon
            .join(touchedComps, Seq("canonical"), "left_anti")
          val newCanon = cached(subCanon.unionByName(
            untouched.select($"entity_key", $"canonical")))
          // 4. triples: keep rows of untouched components; rebuild rows
          //    whose subject or object component was touched, from their
          //    source predictions (id-width columnar scan of the
          //    accumulated extract — text never lives there)
          val keep = prevTriples
            .join(touchedComps.withColumnRenamed("canonical", "subj"),
              Seq("subj"), "left_anti")
            .join(touchedComps.withColumnRenamed("canonical", "obj"),
              Seq("obj"), "left_anti")
          val touchedAllKeys = cached(prevCanon
            .join(touchedComps, Seq("canonical"), "leftsemi")
            .select($"entity_key"))
          val oldDirs = extractDirsBefore(extractDir, curName)
          val touchedOldPreds =
            if (oldDirs.isEmpty) batchPreds.limit(0)
            else {
              val oldPreds = spark.read.parquet(oldDirs: _*)
                .as[Pipeline.DocExtract]
                .flatMap(_.predictions).toDF().filter($"answer")
              // OR-semi-join (left OR right key touched): two semi
              // joins + distinct — prediction rows are value-identical
              // duplicates when both sides match, so distinct is exact
              oldPreds.join(touchedAllKeys
                  .withColumnRenamed("entity_key", "left_key"),
                  Seq("left_key"), "leftsemi")
                .unionByName(oldPreds.join(touchedAllKeys
                  .withColumnRenamed("entity_key", "right_key"),
                  Seq("right_key"), "leftsemi"))
                .distinct()
            }
          val rebuilt = Pipeline.triplesOf(
            batchPreds.unionByName(touchedOldPreds), newCanon)
          val allEnts = Pipeline.dedupeEntities(
            prevEnts.unionByName(batchEnts))
          (allEnts, newCanon, keep.unionByName(rebuilt),
            ccInput.count(), touchedComps.count(), 1L,
            Some((touchedComps, rebuilt)): Option[(DataFrame, DataFrame)])
      }

    // write state (overwrite: a replayed batch rewrites identical
    // content), then the _COMMIT marker LAST — a crash mid-write leaves
    // an uncommitted dir the next attempt ignores
    allEnts.write.mode("overwrite").parquet(s"$cur/entities")
    newCanon.write.mode("overwrite").parquet(s"$cur/canonical")
    val persistedTriples = cached(triples)
    persistedTriples.write.mode("overwrite").parquet(s"$cur/triples")
    val totalEnts = spark.read.parquet(s"$cur/entities").count()
    Fs.writeString(s"$cur/metrics.json",
      s"""{"batch_id":$batchId,"cc_input_entities":$ccInputN,""" +
        s""""touched_components":$touchedN,"total_entities":$totalEnts,""" +
        s""""incremental":$keptPrev}""")
    Fs.writeString(s"$cur/_COMMIT", "")
    // visible table: swap a copy in, so readers never see a torn dir and
    // the immutable state copy stays pristine for the next batch/replay
    val triplesDir = s"$workDir/triples"
    val tmp = triplesDir + "_tmp"
    persistedTriples.write.mode("overwrite").parquet(tmp)
    Fs.swapInto(tmp, triplesDir)
    // optional Iceberg twin of the visible table: first batch = full
    // snapshot write; later batches = touched-component DELETE + APPEND
    // (NOT createOrReplace — replacing the whole table per micro-batch
    // would make the incremental link pointless on the catalog path).
    // Guarded by the runtime probe so the same code is a no-op here
    // (no Iceberg jars in this sandbox) and live on a real cluster.
    icebergTable
      .filter(_ => graft.sources.IcebergTripleSink.available)
      .foreach { tbl =>
        val sink = new graft.sources.IcebergTripleSink
        delta match {
          case None =>
            sink.write(spark, persistedTriples, tbl, buckets = 32,
              metrics = Map("batch_id" -> batchId))
          case Some((touched, rebuilt)) =>
            sink.writeIncremental(spark, rebuilt, touched, tbl)
        }
      }
    // prune states older than the one a replay of THIS batch would need
    prevDir.foreach { p =>
      val prevName = p.split('/').last
      Fs.listDirs(stateRoot, "batch_")
        .filter(d => d.split('/').last < prevName)
        .foreach(Fs.deleteRecursive)
    }
    // keep the extract layout bounded: fold accumulated batch dirs into
    // one compacted dir every `compactEvery` batches (a replay of THIS
    // batch is untouched — only strictly-earlier dirs compact)
    maybeCompactExtract(spark, extractDir, curName, compactEvery)
    persisted.foreach(_.unpersist())
    // release any operator-internal tracked caches — the same release
    // the batch run handle performs post-materialize
    graft.pipeline.Caches.release()
  }
}
