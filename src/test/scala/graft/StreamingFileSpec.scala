package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** File-source → transform → file-sink streaming, end to end: the
  * `readStream`/`writeStream` surface with a checkpoint and
  * `Trigger.AvailableNow` (the batch-of-a-stream execution the
  * reference's pull-based pipeline maps to, SURVEY.md §2.7).
  */
class StreamingFileSpec extends SparkSpec {

  test("readStream parquet → hourly agg → writeStream parquet, exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("stream").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val batch1 = Seq(
      (1L, t(5), 1L, "click", 1.0),
      (2L, t(15), 2L, "click", 2.0),
      (3L, t(65), 1L, "view", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    batch1.write.parquet(s"$root/in")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(batch1.schema).parquet(s"$root/in")
      EventStream.hourly(stream)
        .writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
    def outRows() = spark.read.parquet(s"$root/out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet

    // Batch 1: nothing finalizes — append mode holds windows open until
    // the watermark (max event time - 2h) passes their end.
    runOnce()
    assert(outRows().isEmpty)

    // Push event time forward across two more batches: the watermark
    // computed from batch N's data takes effect in batch N+1, which is
    // when the 00:00 and 01:00 windows close and emit exactly once.
    Seq((4L, t(250), 3L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/in")
    runOnce()
    Seq((5L, t(600), 3L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/in")
    runOnce()
    val out = outRows()
    assert(out.contains(("2024-01-01 00:00:00.0", "click", 2L)))
    assert(out.contains(("2024-01-01 01:00:00.0", "view", 1L)))

    // Re-running against the same checkpoint reprocesses nothing.
    runOnce()
    assert(outRows() == out, "checkpointed restart duplicated rows")
  }
}
