package graft.plans

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.Row

/** Pins the custom as-of join operator: semantics on a hand-built
  * fixture (backward match, inclusive ties, null extension, null
  * key/time never matching), the physical plan actually using
  * [[AsOfJoinExec]] (one exchange per side, no cartesian), and
  * exact agreement with the union+window composition on real data. */
class AsOfJoinSuite extends SparkSessionSuite {

  test("as-of semantics on a hand fixture") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (Some(1), Some(10L), "l-t10"), // ties are inclusive: right t=10 wins
      (Some(1), Some(5L), "l-t5"),   // backward match to right t=3
      (Some(1), Some(2L), "l-t2"),   // nothing at or before t=2
      (Some(2), Some(7L), "l-nokey"), // key absent on the right
      (Some(3), Some(100L), "l-late"), // greatest time <= 100 is t=60
      (None, Some(9L), "l-nullkey"),  // null key never matches
      (Some(1), None, "l-nulltime")   // null time never matches
    ).toDF("k", "t", "lv")
    val right = Seq(
      (Some(1), Some(3L), "r-t3"),
      (Some(1), Some(10L), "r-t10"),
      (Some(1), None, "r-nulltime"),  // never matchable
      (None, Some(1L), "r-nullkey"),  // never matchable
      (Some(3), Some(50L), "r-t50"),
      (Some(3), Some(60L), "r-t60")
    ).toDF("rk", "rt", "rv")

    val out = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt")
      .select("lv", "rv").collect().map(r => (r.getString(0), r.getString(1)))
      .toMap

    out shouldBe Map(
      "l-t10" -> "r-t10",
      "l-t5" -> "r-t3",
      "l-t2" -> null,
      "l-nokey" -> null,
      "l-late" -> "r-t60",
      "l-nullkey" -> null,
      "l-nulltime" -> null)
  }

  test("tolerance bounds the match window") {
    val s = spark
    import s.implicits._
    val left = Seq((1, 100L, "fresh"), (1, 205L, "edge"), (1, 300L, "stale"))
      .toDF("k", "t", "lv")
    val right = Seq((1, 95L, "r95"), (1, 105L, "r105")).toDF("rk", "rt", "rv")
    val out = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
        tolerance = Some(100L))
      .select("lv", "rv").collect().map(r => (r.getString(0), r.getString(1)))
      .toMap
    out shouldBe Map(
      "fresh" -> "r95",  // gap 5, well inside
      "edge" -> "r105",  // gap exactly 100: tolerance is inclusive
      "stale" -> null)   // best match r105 has gap 195 > 100
  }

  test("shuffle plan uses AsOfJoinExec with one exchange per side") {
    val s = spark
    import s.implicits._
    val left = Seq((1, 10L, "a")).toDF("k", "t", "lv")
    val right = Seq((1, 3L, "b")).toDF("rk", "rt", "rv")
    val df = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
      broadcastRight = Some(false))
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan) {
      assert(plan.contains("AsOfJoin"))
      assert(!plan.contains("BroadcastAsOfJoin"))
      assert(!plan.contains("CartesianProduct"))
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      // exactly the two key shuffles, nothing more
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2)
    }
  }

  test("small right side auto-selects the broadcast form: zero shuffles") {
    val s = spark
    import s.implicits._
    val left = Seq((1, 10L, "a"), (2, 7L, "b")).toDF("k", "t", "lv")
    val right = Seq((1, 3L, "x"), (2, 9L, "y")).toDF("rk", "rt", "rv")
    // tiny in-memory right side is far under autoBroadcastJoinThreshold
    val df = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan) {
      assert(plan.contains("BroadcastAsOfJoin"))
      assert(plan.contains("BroadcastExchange"))
      assert(!"Exchange hashpartitioning".r.findFirstIn(plan).isDefined)
    }
    df.select("lv", "rv").collect().map(r =>
      (r.getString(0), r.getString(1))).toMap shouldBe
      Map("a" -> "x", "b" -> null) // rt 9 > t 7 for key 2
  }

  test("broadcast form participates in whole-stage codegen") {
    val s = spark
    import s.implicits._
    val left = Seq((1, 10L, "a"), (2, 7L, "b")).toDF("k", "t", "lv")
    val right = Seq((1, 3L, "x"), (2, 9L, "y")).toDF("rk", "rt", "rv")
    val df = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
      broadcastRight = Some(true))
    // the generated loop produces the right answers...
    df.collect().map(r => (r.getString(2), r.getString(5))).toMap shouldBe
      Map("a" -> "x", "b" -> null)
    // ...and the AQE-finalized plan (inspected post-materialization; the
    // codegen'd exec sits inside a ResultQueryStage, a leaf to TreeNode
    // traversal, so match the rendered `*(N)` codegen-stage prefix)
    val finalPlan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    withClue(finalPlan) {
      assert("""\*\(\d+\) BroadcastAsOfJoin""".r.findFirstIn(finalPlan).isDefined,
        "BroadcastAsOfJoinExec not inside a WholeStageCodegen stage")
    }
  }

  test("generated and interpreted broadcast paths are bit-identical") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(s, dir)
    val errors = ev.filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts").as("t"),
        org.apache.spark.sql.functions.col("event_id").as("error_id"))
    val clicks = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select(org.apache.spark.sql.functions.col("user_id").as("c_user_id"),
        org.apache.spark.sql.functions.col("ts").as("c_t"),
        org.apache.spark.sql.functions.col("event_id").as("click_id"))
    def run(): Seq[Seq[Any]] =
      AsOf.join(errors, clicks, Seq("user_id" -> "c_user_id"), "t", "c_t",
          tolerance = Some(3600L * 1000000L), broadcastRight = Some(true))
        .orderBy("error_id").collect()
        .map(_.toSeq.toIndexedSeq).toIndexedSeq
    val generated = run()
    val interpreted =
      try {
        s.conf.set("spark.sql.codegen.wholeStage", "false")
        run()
      } finally s.conf.set("spark.sql.codegen.wholeStage", "true")
    generated.length should be > 0
    interpreted shouldBe generated
  }

  test("merge form participates in whole-stage codegen (no fallback)") {
    val s = spark
    import s.implicits._
    // fallback=false turns a generated-code compile failure into a hard
    // error instead of a silent interpreted fallback
    s.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val left = Seq(
        (Some(1), Some(10L), "l-t10"), (Some(1), Some(5L), "l-t5"),
        (Some(1), Some(2L), "l-t2"), (Some(2), Some(7L), "l-nokey"),
        (Some(3), Some(100L), "l-late"), (None, Some(9L), "l-nullkey"),
        (Some(1), None, "l-nulltime")).toDF("k", "t", "lv")
      val right = Seq(
        (Some(1), Some(3L), "r-t3"), (Some(1), Some(10L), "r-t10"),
        (Some(1), None, "r-nulltime"), (None, Some(1L), "r-nullkey"),
        (Some(3), Some(50L), "r-t50"), (Some(3), Some(60L), "r-t60"))
        .toDF("rk", "rt", "rv")
      val df = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
        broadcastRight = Some(false))
      df.select("lv", "rv").collect().map(r =>
        (r.getString(0), r.getString(1))).toMap shouldBe Map(
        "l-t10" -> "r-t10", "l-t5" -> "r-t3", "l-t2" -> null,
        "l-nokey" -> null, "l-late" -> "r-t60", "l-nullkey" -> null,
        "l-nulltime" -> null)
      // with tolerance too (the long-subtraction gate is generated code)
      val tl = Seq((1, 100L, "fresh"), (1, 205L, "edge"), (1, 300L, "stale"))
        .toDF("k", "t", "lv")
      val tr = Seq((1, 95L, "r95"), (1, 105L, "r105")).toDF("rk", "rt", "rv")
      AsOf.join(tl, tr, Seq("k" -> "rk"), "t", "rt",
          tolerance = Some(100L), broadcastRight = Some(false))
        .select("lv", "rv").collect().map(r =>
          (r.getString(0), r.getString(1))).toMap shouldBe Map(
        "fresh" -> "r95", "edge" -> "r105", "stale" -> null)
      // and the AQE-finalized plan shows the codegen'd stage
      val dfp = AsOf.join(tl, tr, Seq("k" -> "rk"), "t", "rt",
        broadcastRight = Some(false))
      dfp.collect()
      val finalPlan = (dfp.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }).toString
      withClue(finalPlan) {
        assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(finalPlan).isDefined,
          "AsOfJoinExec not inside a WholeStageCodegen stage")
      }
    } finally s.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("generated and interpreted merge paths are bit-identical on events") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(s, dir)
    val errors = ev.filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts").as("t"),
        org.apache.spark.sql.functions.col("event_id").as("error_id"))
    val clicks = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select(org.apache.spark.sql.functions.col("user_id").as("c_user_id"),
        org.apache.spark.sql.functions.col("ts").as("c_t"),
        org.apache.spark.sql.functions.col("event_id").as("click_id"))
    def run(): Seq[Seq[Any]] =
      AsOf.join(errors, clicks, Seq("user_id" -> "c_user_id"), "t", "c_t",
          tolerance = Some(3600L * 1000000L), broadcastRight = Some(false))
        .orderBy("error_id").collect()
        .map(_.toSeq.toIndexedSeq).toIndexedSeq
    val generated = run()
    val interpreted =
      try {
        s.conf.set("spark.sql.codegen.wholeStage", "false")
        run()
      } finally s.conf.set("spark.sql.codegen.wholeStage", "true")
    generated.length should be > 0
    interpreted shouldBe generated
  }

  test("broadcast and shuffle forms are bit-identical on events") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(s, dir)
    val errors = ev.filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts").as("t"),
        org.apache.spark.sql.functions.col("event_id").as("error_id"))
    val clicks = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select(org.apache.spark.sql.functions.col("user_id").as("c_user_id"),
        org.apache.spark.sql.functions.col("ts").as("c_t"),
        org.apache.spark.sql.functions.col("event_id").as("click_id"))
    def run(bcast: Boolean): Seq[Seq[Any]] =
      AsOf.join(errors, clicks, Seq("user_id" -> "c_user_id"), "t", "c_t",
          tolerance = None, broadcastRight = Some(bcast))
        .orderBy("error_id").collect()
        .map(_.toSeq.toIndexedSeq).toIndexedSeq
    val shuffleForm = run(false)
    val broadcastForm = run(true)
    shuffleForm.length should be > 0
    broadcastForm shouldBe shuffleForm
  }

  test("agrees exactly with the union+window composition on events") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    def canon(rows: Array[Row]): Seq[Seq[Any]] = rows.map(_.toSeq.toIndexedSeq).toIndexedSeq
    val native = graft.SparkEntry.queries("adv_asof_native")(s, dir).collect()
    val windowed = graft.SparkEntry.queries("adv_asof_join")(s, dir).collect()
    native.length should be > 0
    canon(native) shouldBe canon(windowed)
  }

  // ---- forward direction (backward on negated time) ----

  test("forward as-of semantics on a hand fixture") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (Some(1), Some(10L), "l-t10"),  // ties inclusive: right t=10 wins
      (Some(1), Some(5L), "l-t5"),    // forward match to right t=10
      (Some(1), Some(11L), "l-t11"),  // nothing at or after t=11
      (Some(2), Some(7L), "l-nokey"),
      (Some(3), Some(40L), "l-early"), // smallest t >= 40 is t=50
      (None, Some(9L), "l-nullkey"),
      (Some(1), None, "l-nulltime")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (Some(1), Some(3L), "r-t3"),
      (Some(1), Some(10L), "r-t10"),
      (Some(1), None, "r-nulltime"),
      (None, Some(1L), "r-nullkey"),
      (Some(3), Some(50L), "r-t50"),
      (Some(3), Some(60L), "r-t60")
    ).toDF("rk", "rt", "rv")
    val out = AsOf.joinForward(left, right, Seq("k" -> "rk"), "t", "rt")
      .select("lv", "rv").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    out shouldBe Map(
      "l-t10" -> "r-t10", "l-t5" -> "r-t10", "l-t11" -> null,
      "l-nokey" -> null, "l-early" -> "r-t50", "l-nullkey" -> null,
      "l-nulltime" -> null)
    // tolerance bounds rightTime - leftTime
    val tol = AsOf.joinForward(left, right, Seq("k" -> "rk"), "t", "rt",
        tolerance = Some(5L))
      .select("lv", "rv").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    tol("l-t5") shouldBe "r-t10"  // gap 5 <= 5
    tol("l-early") shouldBe null  // gap 10 > 5
  }

  test("native forward agrees exactly with the union+window forward composition") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    def canon(rows: Array[Row]): Seq[Seq[Any]] =
      rows.map(_.toSeq.toIndexedSeq).toIndexedSeq
    val native = graft.SparkEntry.queries("adv_asof_fwd_native")(s, dir).collect()
    val windowed = graft.SparkEntry.queries("adv_asof_forward")(s, dir).collect()
    native.length should be > 0
    canon(native) shouldBe canon(windowed)
  }

  test("forward as-of refuses timestamp time columns") {
    val (left, right) = microsFixture
    val e = intercept[IllegalArgumentException] {
      AsOf.joinForward(left, right, Seq("k" -> "rk"), "t", "rt")
    }
    e.getMessage should include("LongType epoch-nanos")
  }

  // ---- tolerance unit safety (the round-8 ×1000 bug class) ----

  private def microsFixture = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    // micros-backed TimestampType time columns: second 100 / 205 / 300
    // on the left, 95 / 105 on the right
    val left = Seq((1, 100000000L, "fresh"), (1, 205000000L, "edge"),
        (1, 300000000L, "stale")).toDF("k", "t_us", "lv")
      .select(col("k"), timestamp_micros(col("t_us")).as("t"), col("lv"))
    val right = Seq((1, 95000000L, "r95"), (1, 105000000L, "r105"))
      .toDF("rk", "rt_us", "rv")
      .select(col("rk"), timestamp_micros(col("rt_us")).as("rt"), col("rv"))
    (left, right)
  }

  test("raw Long tolerance on timestamp time columns is an analysis-time error") {
    val (left, right) = microsFixture
    // 100 seconds *written as nanos* — on a micros slot this would be a
    // silent 100,000 s window; the API must refuse instead
    val e = intercept[IllegalArgumentException] {
      AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
        tolerance = Some(100L * 1000000000L))
    }
    e.getMessage should include("unit-ambiguous")
  }

  test("Duration tolerance applies the correct window on timestamp columns") {
    val (left, right) = microsFixture
    val out = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
        tolerance = java.time.Duration.ofSeconds(100))
      .select("lv", "rv").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    // same window shape as the LongType codegen test: fresh->r95 (5 s),
    // edge->r105 (100 s inclusive), stale->null (195 s > 100 s)
    out shouldBe Map("fresh" -> "r95", "edge" -> "r105", "stale" -> null)
  }

  test("Duration tolerance on LongType epoch-nanos columns converts to nanos") {
    val s = spark
    import s.implicits._
    val tl = Seq((1, 100000000000L, "fresh"), (1, 205000000000L, "edge"),
      (1, 300000000000L, "stale")).toDF("k", "t", "lv")
    val tr = Seq((1, 95000000000L, "r95"), (1, 105000000000L, "r105"))
      .toDF("rk", "rt", "rv")
    val out = AsOf.join(tl, tr, Seq("k" -> "rk"), "t", "rt",
        tolerance = java.time.Duration.ofSeconds(100))
      .select("lv", "rv").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    out shouldBe Map("fresh" -> "r95", "edge" -> "r105", "stale" -> null)
  }

  test("Duration tolerance refuses mixed long/timestamp time columns") {
    val s = spark
    import s.implicits._
    val (left, _) = microsFixture
    val right = Seq((1, 95000000000L, "r95")).toDF("rk", "rt", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
        tolerance = java.time.Duration.ofSeconds(100))
    }
    e.getMessage should include("disagree")
  }
}
