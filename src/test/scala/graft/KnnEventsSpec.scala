package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Portable
import graft.operators.{Events, Knn}

/** kNN top-k contract, level assignment, and sessionization invariants. */
class KnnEventsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("topK == sorted-full-scan prefix (top-k ⊆ exact order, SURVEY.md §5.2)") {
    val emb = (0L until 50L).map(i => (i, Array.fill(4)(((i * 7 + 3) % 13).toFloat + i)))
      .toDF("vec_id", "embedding")
    val q = array((0 until 4).map(_ => lit(1.0)): _*)
    val top5 = Knn.topK(emb, q, 5).collect().map(_.getLong(0)).toSeq
    val full = Knn.topK(emb, q, 50).collect().map(_.getLong(0)).toSeq
    assert(top5 === full.take(5))
  }

  test("topKBatch returns exactly k rows per query, nearest-first") {
    val emb = (0L until 30L).map(i => (i, Array(i.toFloat, 0f))).toDF("vec_id", "embedding")
    val qs = Seq((100L, Array(0.0, 0.0)), (200L, Array(29.0, 0.0))).toDF("query_id", "query_vec")
    val out = Knn.topKBatch(emb, qs, 3).collect()
    assert(out.length === 6)
    val byQ = out.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
    assert(byQ(100L) === Seq(0L, 1L, 2L))
    assert(byQ(200L) === Seq(29L, 28L, 27L))
  }

  test("level assignment: exponential decay, clamped (hnsw.cc:140-145)") {
    val levels = spark.range(100000)
      .select(Portable.levelOf(col("id"), m = 2, maxLevel = 4).as("l"))
      .groupBy("l").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(levels.keySet.subsetOf((0 to 4).toSet), "clamped to [0, maxLevel]")
    // P(level 0) = 1 - e^(-m) ≈ 0.8647 for m=2
    assert(math.abs(levels(0) / 100000.0 - 0.8647) < 0.01)
    assert((0 to 3).forall(k => levels.getOrElse(k, 0L) > levels.getOrElse(k + 1, 0L)),
      "monotone decay")
  }

  test("sessionize splits on gaps > 30min and aggregates bounds") {
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      (1L, t(0), 10L), (2L, t(10), 10L), (3L, t(70), 10L), // user 10: 2 sessions
      (4L, t(0), 20L))                                     // user 20: 1 session
      .toDF("event_id", "ts", "user_id")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = Events.sessionize(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((10L, 1L) -> 2L, (10L, 2L) -> 1L, (20L, 1L) -> 1L))
  }

  test("salted two-phase aggregation equals direct groupBy (skew utility)") {
    val df = (0L until 1000L).map(i => (i, if (i % 10 == 0) "hot" else s"k${i % 7}", i * 0.5))
      .toDF("row_id", "key", "v")
    val salted = graft.functions.Skew
      .saltedSumCount(df, Seq("key"), col("v"), col("row_id"), buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = df.groupBy("key")
      .agg(graft.functions.Portable.dsumRounded(col("v")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("salted join equals plain join (exactly-once pairs), with broadcast disabled") {
    // 90% of fact rows on one hot key — the shuffled-join straggler shape
    val fact = (0L until 1000L)
      .map(i => (i, if (i % 10 != 0) "hot" else s"k${i % 7}", i * 0.25))
      .toDF("row_id", "key", "v")
    val dim = Seq(("hot", 100.0), ("k0", 1.0), ("k3", 3.0), ("zz", 9.0))
      .toDF("key", "boost")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = graft.functions.Skew
        .saltedJoin(fact, dim, "key", col("row_id"), buckets = 8)
        .collect().map(r => (r.getLong(1), r.getString(0), r.getDouble(2), r.getDouble(3)))
      val plain = fact.join(dim, Seq("key"))
        .collect().map(r => (r.getLong(1), r.getString(0), r.getDouble(2), r.getDouble(3)))
      assert(salted.sorted.toSeq === plain.sorted.toSeq,
        "each matching (fact, dim) pair exactly once — salting invisible in the result")
      assert(!plain.exists(_._2 == "zz"), "inner semantics: unmatched dim keys dropped")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tumbling counts bucket by hour") {
    def t(min: Int) = new Timestamp(1704067200000L + min * 60000L) // 2024-01-01 00:00 UTC
    val ev = Seq((t(5), "a", 1.0), (t(25), "a", 2.0), (t(65), "a", 4.0))
      .toDF("ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = Events.tumblingCounts(ev).orderBy("window_start").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L))
    assert(out.map(_.getDouble(3)).toSeq === Seq(3.0, 4.0))
  }

  test("sliding 2h/1h windows: every event lands in exactly 2 windows; counts overlap correctly") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:15:00"), 1L, "view", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 10:45:00"), 1L, "view", 2.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 11:30:00"), 2L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.slidingCounts(ev).orderBy("window_start").collect()
    // windows: 09:00 (e1,e2), 10:00 (e1,e2,e3), 11:00 (e3)
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 3L, 1L))
    assert(out.map(_.getDouble(3)).toSeq === Seq(3.0, 7.0, 4.0))
    assert(out.map(_.getLong(2)).sum === 2 * ev.count(), "each event in exactly 2 windows")
  }

  test("diversifiedTopK: per-group quota binds, displaced rows backfill from other groups") {
    import org.apache.spark.sql.functions.col
    // group a holds the 3 best scores but only 2 may appear; rank 3
    // overall must then be b's best (score 4), not a's third (3)
    val scored = Seq(
      (1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "a"),
      (4L, 4.0, "b"), (5L, 5.0, "b"), (6L, 6.0, "c")
    ).toDF("vec_id", "dist", "source")
    val got = graft.operators.Knn
      .diversifiedTopK(scored, col("source"), col("dist"), col("vec_id"), k = 4, j = 2)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got === Seq((1L, "a"), (2L, "a"), (4L, "b"), (5L, "b")))

    // desc ranking flips which rows survive the quota
    val gotDesc = graft.operators.Knn
      .diversifiedTopK(scored, col("source"), col("dist"), col("vec_id"),
        k = 3, j = 1, asc = false)
      .collect().map(_.getLong(0)).toSeq
    assert(gotDesc === Seq(6L, 5L, 3L))
  }

  test("movingAvgDaily: frame means over days-so-far; partitions don't leak across types") {
    def d(day: Int, h: Int) = new Timestamp(1704067200000L + (day * 24L + h) * 3600000L)
    val ev = Seq(
      (d(0, 1), "a", 2.0), (d(0, 2), "a", 4.0), // day0 a: 6
      (d(1, 1), "a", 12.0),                     // day1 a: 12
      (d(2, 1), "a", 3.0),                      // day2 a: 3
      (d(0, 1), "b", 100.0))                    // day0 b: 100
      .toDF("ts", "event_type", "value")
    val got = Events.movingAvgDaily(ev, days = 2).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(
      ("2024-01-01", "a", 6.0),   // 1-day frame
      ("2024-01-02", "a", 9.0),   // (6+12)/2
      ("2024-01-03", "a", 7.5),   // (12+3)/2 — day0 left the 2-row frame
      ("2024-01-01", "b", 100.0)))
  }

  test("conversionFunnel: stage order is enforced (a click before any view doesn't count)") {
    def t(min: Int) = new Timestamp(1704067200000L + min * 60000L)
    val ev = Seq(
      // user 1 converts in order
      (1L, t(0), 1L, "view", 0.0), (2L, t(10), 1L, "click", 0.0),
      (3L, t(20), 1L, "purchase", 0.0),
      // user 2: click precedes its only view → stalls at view stage
      (4L, t(5), 2L, "click", 0.0), (5L, t(10), 2L, "view", 0.0),
      // user 3: view+click but purchase BEFORE the click → no conversion
      (6L, t(0), 3L, "view", 0.0), (7L, t(30), 3L, "click", 0.0),
      (8L, t(15), 3L, "purchase", 0.0),
      // user 4: never viewed → not even stage 1
      (9L, t(0), 4L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.conversionFunnel(ev).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 2L, 1L)))
  }

  test("intervalJoin: bucket blocking reproduces the brute-force range join exactly") {
    val rnd = new scala.util.Random(11)
    val bucket = 1000L
    // interval lengths span sub-bucket AND multi-bucket (replication > 2)
    val ivs = (0 until 300).map { i =>
      val t0 = rnd.nextInt(100000).toLong
      (i.toLong, t0, t0 + 1 + rnd.nextInt(3000))
    }
    val pts = (0 until 2000).map(i => (i.toLong, rnd.nextInt(100000).toLong))
    val got = Events.intervalJoin(
        ivs.toDF("interval_id", "t0", "t1"), pts.toDF("point_id", "t"), bucket)
      .select("interval_id", "point_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth = for {
      (iid, t0, t1) <- ivs; (pid, t) <- pts if t >= t0 && t < t1
    } yield (iid, pid)
    assert(got.sorted === truth.sorted,
      "each qualifying pair exactly once — no misses, no bucket-replication dups")
  }

  test("purchaseClicks: equi+range join matches per-row filtering; bounds are half-open") {
    def t(min: Int) = new Timestamp(1704067200000L + min * 60000L)
    val ev = Seq(
      (1L, t(100), 7L, "purchase", 0.0),
      (2L, t(41), 7L, "click", 0.0),   // 59 min before: in
      (3L, t(100), 7L, "click", 0.0),  // same instant: OUT (cts < pts strict)
      (4L, t(40), 7L, "click", 0.0),   // exactly 60 min before: in (>= closed)
      (5L, t(39), 7L, "click", 0.0),   // 61 min before: out
      (6L, t(99), 8L, "click", 0.0))   // other user: out
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.purchaseClicks(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 7L), (1L, 4L, 7L)))
  }
}
