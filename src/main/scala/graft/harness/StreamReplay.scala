package graft.harness

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Encoder, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Bounded, deterministic replay harness for the streaming operators —
  * the driver-gate surface of the streaming family: a catalog query
  * feeds a FIXED shard sequence through a Structured Streaming transform
  * (MemoryStream micro-batches, `processAllAvailable` between shards)
  * and returns the memory-sink table as an ordinary DataFrame, so the
  * streaming result lands in the same DuckDB-oracle compare as every
  * batch operator. Batch/stream parity is already asserted operator-by-
  * operator in StreamingSpec; this harness makes that parity VISIBLE to
  * the cross-engine gate by replaying the real sf-dir tables.
  *
  * The collect-to-driver feed is deliberate and bounded: replay exists
  * to gate correctness on the driver's small scale factors, not to move
  * corpus-sized data — production streams read Kafka/files through the
  * same transforms (the operators never see the harness).
  */
object StreamReplay {

  private val sinkIds = new AtomicLong()

  /** Run `build` over a stream fed `batches` in order (one micro-batch
    * each, fully processed before the next is offered) and return the
    * append-mode memory-sink contents after the final batch.
    */
  def replay[T: Encoder](
      spark: SparkSession,
      batches: Seq[Seq[T]],
      build: DataFrame => DataFrame
  ): DataFrame = {
    implicit val sqlCtx: SQLContext = spark.sqlContext
    val input = MemoryStream[T]
    val sink = s"stream_replay_${sinkIds.incrementAndGet()}"
    val query = build(input.toDF())
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try batches.foreach { b =>
      if (b.nonEmpty) input.addData(b: _*)
      query.processAllAvailable()
    } finally query.stop()
    spark.table(sink)
  }

  /** Split time-ordered rows into `k` contiguous micro-batches — the
    * canonical "shards arrive in event-time order" replay sequence.
    */
  def timeOrderedBatches[T](rows: Seq[T], k: Int): Seq[Seq[T]] = {
    require(k > 0, s"batch count must be positive, got $k")
    if (rows.isEmpty) Seq(Seq.empty)
    else rows.grouped(math.max(1, (rows.size + k - 1) / k)).toSeq
  }
}
