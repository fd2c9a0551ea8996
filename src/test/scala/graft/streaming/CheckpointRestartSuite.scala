package graft.streaming

import java.nio.file.{Files, Paths}

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** End-to-end exactly-once across a query restart — the fault-tolerance
  * contract a 100 TB streaming pipeline leans on. A file-source →
  * stateful-dedup → file-sink query is stopped mid-stream and
  * restarted from its checkpoint:
  *
  *   - the dedup STATE must survive the restart (an id first seen
  *     before the stop and repeated after it must still be dropped,
  *     proving the state store recovered from the checkpoint, not from
  *     reprocessing);
  *   - the OUTPUT must contain every distinct input id exactly once
  *     (proving the source offsets and the file-sink commit log give
  *     end-to-end exactly-once, no replayed or lost batches).
  */
class CheckpointRestartSuite extends SparkSessionSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("payload", StringType)))

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    // stage atomically: write elsewhere, then move the parquet files in
    val tmp = s"$dir-stage-$name"
    rows.toDF("id", "payload").coalesce(1).write.mode("overwrite").parquet(tmp)
    Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .forEach(p => Files.move(p, Paths.get(dir, s"$name.parquet")))
  }

  private def startQuery(in: String, ckpt: String, out: String) = {
    val stream = spark.readStream.schema(schema).parquet(in)
      .dropDuplicates("id")
    stream.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
  }

  test("stateful dedup is exactly-once across a checkpoint restart") {
    val base = Files.createTempDirectory("graft-restart").toString
    val in = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    Files.createDirectories(Paths.get(in))

    graft.Knobs.withShufflePartitions(spark, 4) {
      // epoch 1: ids 1..5, with 3 duplicated inside the batch window
      writeBatch(in, "b1", Seq(1L -> "a", 2L -> "b", 3L -> "c", 3L -> "c2",
        4L -> "d", 5L -> "e"))
      val q1 = startQuery(in, ckpt, out)
      q1.processAllAvailable()
      q1.stop()

      // epoch 2 arrives while the query is DOWN: id 4 repeats from
      // before the stop (tests state recovery), 6 and 7 are new
      writeBatch(in, "b2", Seq(4L -> "dup-after-restart", 6L -> "f", 7L -> "g"))

      val q2 = startQuery(in, ckpt, out)
      q2.processAllAvailable()
      q2.stop()
    }

    val result: DataFrame = spark.read.parquet(out)
    val ids = result.select("id").collect().map(_.getLong(0)).sorted.toSeq
    // every distinct id exactly once: in-batch dup dropped, cross-restart
    // dup dropped, nothing lost, nothing replayed
    ids shouldBe Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)
    // and the cross-restart duplicate kept its ORIGINAL payload
    val p4 = result.filter(col("id") === 4L).select("payload")
      .collect().map(_.getString(0)).toSeq
    p4 shouldBe Seq("d")
  }
}
