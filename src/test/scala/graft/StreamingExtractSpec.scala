package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.corpus.CorpusGen
import graft.pipeline.Pipeline
import graft.schema.RawDoc
import graft.streaming.StreamingExtract

/** Structured-Streaming ingest: the fused extract streams unchanged,
  * and per-batch re-linking over the accumulated extract converges to
  * exactly the batch pipeline's triples. */
class StreamingExtractSpec extends SparkSpec {

  test("two micro-batches of docs yield the batch pipeline's exact triple set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = 0.0002
    val gazette = CorpusGen.gazette(sf)
    val docs = CorpusGen.rawDocs(spark, sf).collect().toSeq
    val (first, rest) = docs.splitAt(docs.length / 2)

    val ms = MemoryStream[RawDoc]
    val dir = Files.createTempDirectory("graft-stream").toString
    assert(StreamingExtract
      .extractStream(spark, ms.toDS(), gazette).isStreaming)

    val q = StreamingExtract.runToTriples(spark, ms.toDS(), gazette, dir)
    try {
      ms.addData(first)
      q.processAllAvailable()
      val mid = spark.read.parquet(s"$dir/triples").count()
      assert(mid > 0, "first micro-batch produced no triples")

      ms.addData(rest)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/triples")
      .select("subj", "pred", "obj", "evidence_id").collect().toSet
    val (batch, cl) = Pipeline.runWithCleanup(spark, docs.toDS(), gazette)
    val expected = batch
      .select("subj", "pred", "obj", "evidence_id").collect().toSet
    cl()
    assert(streamed == expected,
      s"streamed ${streamed.size} != batch ${expected.size}")

    // restart from the stream checkpoint: a new query over the same
    // workDir replays NOTHING (source offsets are committed), so the
    // accumulated extract table keeps exactly one row per doc
    val extractRows = spark.read
      .parquet(s"$dir/extract_stream/batch_*").count()
    assert(extractRows == docs.length.toLong)
    val q2 = StreamingExtract.runToTriples(spark, ms.toDS(), gazette, dir)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$dir/extract_stream/batch_*").count()
      == extractRows,
      "restarted query replayed already-committed micro-batches")
  }
}
