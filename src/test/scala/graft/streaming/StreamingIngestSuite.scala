package graft.streaming

import java.nio.file.Files

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Pins the r7 self-growing streaming ingestion loop (VERDICT r6 #2):
  * a near-dup of a doc admitted by an EARLIER micro-batch of the same
  * pipeline must be rejected — the persisted band index is the
  * accumulated ingestion state, growing by exactly the admitted docs
  * each epoch. Batch boundaries are made deterministic by draining the
  * source (AvailableNow) between file drops against one checkpoint. */
class StreamingIngestSuite extends SparkSessionSuite {

  test("near-dup of a doc admitted in an earlier micro-batch is rejected") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val base = Files.createTempDirectory("graft-ingest-stream").toString
    val (idx, src, ckpt, admitted) =
      (s"$base/idx", s"$base/src", s"$base/ckpt", s"$base/admitted")
    graft.ops.Dedup.saveBandIndex(docs, idx)

    // epoch 0: two genuinely new docs — both must be admitted
    Seq((91000L, "ka1 kb1 kc1 kd1 ke1 kf1"),
        (91001L, "la1 lb1 lc1 ld1 le1 lf1"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    EventStreams.ingestDocsStream(s, idx, src, ckpt, admitted)
    s.read.parquet(admitted).select("doc_id").collect().map(_.getLong(0))
      .toSet shouldBe Set(91000L, 91001L)

    // epoch 1: an exact copy of an epoch-0 ADMITTED doc (the corpus
    // index never contained it — only the self-grown appends can
    // reject it) plus one more new doc
    Seq((92000L, "ka1 kb1 kc1 kd1 ke1 kf1"),
        (92001L, "ma1 mb1 mc1 md1 me1 mf1"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    EventStreams.ingestDocsStream(s, idx, src, ckpt, admitted)
    val all = s.read.parquet(admitted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    all shouldBe Set(91000L, 91001L, 92001L)

    // and a third drop: a copy of the epoch-1 admission is rejected too
    Seq((93000L, "ma1 mb1 mc1 md1 me1 mf1"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    EventStreams.ingestDocsStream(s, idx, src, ckpt, admitted)
    s.read.parquet(admitted).count() shouldBe 3L
  }

  /** r13: streaming label maintenance — clusters must extend across
    * micro-batches (a near-dup of an EARLIER epoch's arrival joins its
    * cluster), and the final committed labels must equal a from-scratch
    * rebuild over the grown index (the ingest ≡ rebuild invariant,
    * epoch-by-epoch through the stream). */
  test("streaming labels: clusters grow across micro-batches, final ≡ rebuild") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 100)
    val base = Files.createTempDirectory("graft-label-stream").toString
    val (idx, lbl, src, ckpt) =
      (s"$base/idx", s"$base/labels", s"$base/src", s"$base/ckpt")
    graft.ops.Dedup.saveBandIndex(docs, idx)
    graft.ops.Dedup.buildBandLabels(s, idx, lbl)

    // epoch 0: near-dup of corpus doc 20 + one brand-new doc
    Seq((91020L, "na1 nb1 nc1 nd1 ne1 nf1 ng1 nh1"))
      .toDF("doc_id", "text")
      .unionAll(docs.filter(col("doc_id") === 20)
        .select(lit(90020L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
      .coalesce(1).write.mode("append").parquet(src)
    EventStreams.labelDocsStream(s, idx, lbl, src, ckpt)
    val l0 = graft.ops.Dedup.readBandLabels(s, lbl)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    l0(90020L) shouldBe 20L      // joined the corpus doc's cluster
    l0.get(91020L) shouldBe None // no near-dup yet → unclustered

    // epoch 1: an exact copy of the epoch-0 NEW doc — only the grown
    // index (not the original corpus) can cluster it
    Seq((92020L, "na1 nb1 nc1 nd1 ne1 nf1 ng1 nh1"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    EventStreams.labelDocsStream(s, idx, lbl, src, ckpt)
    val l1 = graft.ops.Dedup.readBandLabels(s, lbl)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    l1(92020L) shouldBe 91020L   // clustered with the earlier arrival
    l1(91020L) shouldBe 91020L
    l1(90020L) shouldBe 20L      // earlier cluster carried forward

    // final committed labels ≡ from-scratch rebuild over the grown index
    val rebuilt = graft.ops.Dedup.buildBandLabels(s, idx, s"$base/labels_rb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    l1 shouldBe rebuilt
  }

  test("line cleaning strips a header the moment ingestion pushes it over df") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val hdr = "all rights reserved copyright notice terms of use apply here"
    val base = Files.createTempDirectory("graft-line-stream").toString
    val (idx, src, ckpt, out) =
      (s"$base/idx", s"$base/src", s"$base/ckpt", s"$base/out")
    // historical corpus: the header appears in TWO docs — one short of
    // the df >= 3 boilerplate threshold
    graft.ops.Dedup.saveLineIndex(Seq(
      (1L, s"$hdr alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, s"$hdr lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3L, "plain document with ten completely ordinary filler tokens inside"))
      .toDF("doc_id", "text"), idx)

    // epoch 0: a third header doc — indexed df is still 2, so the
    // header SURVIVES this batch, but its count crosses the threshold
    Seq((81000L, s"$hdr epoch zero tail one two three four five six seven"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    EventStreams.cleanDocsStream(s, idx, src, ckpt, out)
    val e0 = s.read.parquet(out).filter(col("doc_id") === 81000L).head()
    e0.getAs[Long]("n_dropped") shouldBe 0L
    e0.getAs[String]("cleaned") should include("copyright")

    // epoch 1: a fourth header doc — df is now 3, the header drops
    Seq((82000L, s"$hdr epoch one tail six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    EventStreams.cleanDocsStream(s, idx, src, ckpt, out)
    val e1 = s.read.parquet(out).filter(col("doc_id") === 82000L).head()
    e1.getAs[Long]("n_dropped") shouldBe 1L
    e1.getAs[String]("cleaned") should not include "copyright"
    e1.getAs[String]("cleaned") should include("epoch one tail")
  }
}
