package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.Ivf

/** Range (radius) search over the cell-partitioned layout: the result
  * must equal a brute-force full-scan filter (the cell pruning is the
  * triangle inequality — LOSSLESS by construction), and on clustered
  * data the pruning must actually skip cells (the scale claim: a
  * query ball that intersects few clusters reads few cells' files).
  */
class IvfRangeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Clustered fixture: 4 well-separated blobs in 8-d (centers at
    * 0, 100, 200, 300 on every coordinate, members within ±1), so a
    * small ball around one blob provably cannot touch the others.
    */
  private lazy val clustered = (0L until 200L).map { i =>
    val rnd = new scala.util.Random(i)
    val center = (i % 4) * 100.0f
    (i, Array.fill(8)(center + rnd.nextFloat() * 2f - 1f))
  }.toDF("vec_id", "embedding").cache()

  private def brute(emb: org.apache.spark.sql.DataFrame,
                    q: org.apache.spark.sql.DataFrame, r: Double) =
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), 6).as("dist"))
      .filter(col("dist") <= r)
      .orderBy(col("dist"), col("vec_id"))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq

  test("rangeSearch == brute-force filter; clustered fixture skips non-intersecting cells") {
    val dir = Files.createTempDirectory("ivf_range").toString
    Ivf.writePartitionedWith(clustered, Ivf.centroids(clustered, 8), dir)
    // query near blob 0; radius covers that blob only (blob diameter
    // <= 2*sqrt(8*1) ~ 5.7, blob separation >= 100*sqrt(8) ~ 283)
    val q = clustered.filter(col("vec_id") === 0)
      .select(perturbQuery(col("embedding")).as("query_vec"))
    val r = 10.0

    val got = Ivf.rangeSearch(spark, dir, q, r)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(got === brute(clustered, q, r), "pruned range search must equal brute force")
    assert(got.nonEmpty && got.size < 200, "fixture must select a proper subset")
    assert(got.forall(_._1 % 4 == 0), "only blob-0 members lie within the ball")

    // the scale claim: the triangle-inequality bound must have skipped
    // the cells of the other blobs (re-derive the eligible set the way
    // rangeSearch does and count)
    val cents = spark.read.parquet(s"$dir/_centroids")
    val radii = spark.read.parquet(s"$dir/_radii")
    val eligible = cents.join(radii, col("centroid_id") === col("cell"))
      .crossJoin(broadcast(q))
      .filter(l2Distance(col("centroid_vec"), col("query_vec")) - col("radius")
        <= lit(r) + lit(1e-6))
      .count()
    val total = cents.count()
    assert(eligible < total,
      s"clustered fixture must prune: $eligible of $total cells eligible")
  }

  test("batch rangeSearch == per-query brute force, on clustered AND near-uniform data") {
    val dir = Files.createTempDirectory("ivf_range_batch").toString
    Ivf.writePartitionedWith(clustered, Ivf.centroids(clustered, 8), dir)
    val qs = clustered.filter(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))
    val got = Ivf.rangeSearchBatch(spark, dir, qs, 10.0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val expected = clustered.crossJoin(broadcast(qs))
      .select(col("query_id"), col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), 6).as("dist"))
      .filter(col("dist") <= 10.0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got === expected, "batch range must equal per-query brute force")
    // every query finds its own blob's members
    assert((0L until 6L).forall(qid => got.exists(_._1 == qid)))
  }

  test("filtered range search: predicate == brute force with the same filter, on every form") {
    val dir = Files.createTempDirectory("ivf_range_filt").toString
    Ivf.writePartitionedWith(clustered, Ivf.centroids(clustered, 8), dir)
    val q = clustered.filter(col("vec_id") === 0)
      .select(perturbQuery(col("embedding")).as("query_vec"))
    val pred = pmod(col("vec_id"), lit(2)) === 0

    val got = Ivf.rangeSearch(spark, dir, q, 10.0, predicate = Some(pred))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    val expected = brute(clustered.filter(pred), q, 10.0)
    assert(got === expected, "filtered range must equal brute force over the filtered table")
    assert(got.nonEmpty && got.forall(_._1 % 2 == 0))

    val qs = clustered.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))
    val gotB = Ivf.rangeSearchBatch(spark, dir, qs, 10.0, predicate = Some(pred))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val expB = clustered.filter(pred).crossJoin(broadcast(qs))
      .select(col("query_id"), col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), 6).as("dist"))
      .filter(col("dist") <= 10.0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(gotB === expB)
  }

  test("ordered=false serving twins return the same row SETS with no top-level sort") {
    val dir = Files.createTempDirectory("ivf_range_unord").toString
    Ivf.writePartitionedWith(clustered, Ivf.centroids(clustered, 8), dir)
    val q = clustered.filter(col("vec_id") === 0)
      .select(perturbQuery(col("embedding")).as("query_vec"))
    val qs = clustered.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))

    val sortedRows = Ivf.rangeSearch(spark, dir, q, 10.0)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSet
    val unord = Ivf.rangeSearch(spark, dir, q, 10.0, ordered = false)
    assert(unord.collect().map(x => (x.getLong(0), x.getDouble(1))).toSet === sortedRows)
    assert(!unord.queryExecution.executedPlan.toString.contains("Sort "),
      "the serving twin must not pay a global sort of an unbounded result")

    val sortedB = Ivf.rangeSearchBatch(spark, dir, qs, 10.0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val unordB = Ivf.rangeSearchBatch(spark, dir, qs, 10.0, ordered = false)
    assert(unordB.collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
      === sortedB)
    assert(!unordB.queryExecution.executedPlan.toString.contains("Sort "))

    // cosine + MIPS twins on their own layouts
    val cosDir = Files.createTempDirectory("cos_range_unord").toString
    Ivf.ensurePartitionedCosine(clustered, 8, cosDir)
    val sortedC = Ivf.cosineRangeSearch(spark, cosDir, q, 0.5)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSet
    val unordC = Ivf.cosineRangeSearch(spark, cosDir, q, 0.5, ordered = false)
    assert(unordC.collect().map(x => (x.getLong(0), x.getDouble(1))).toSet === sortedC)
    assert(!unordC.queryExecution.executedPlan.toString.contains("Sort "))

    val mipsDir = Files.createTempDirectory("mips_range_unord").toString
    Ivf.ensurePartitionedMips(clustered, 8, mipsDir)
    val sortedM = Ivf.mipsRangeSearch(spark, mipsDir, q, 100.0)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSet
    val unordM = Ivf.mipsRangeSearch(spark, mipsDir, q, 100.0, ordered = false)
    assert(unordM.collect().map(x => (x.getLong(0), x.getDouble(1))).toSet === sortedM)
    assert(!unordM.queryExecution.executedPlan.toString.contains("Sort "))
  }

  test("rangeSearchWithDeletes: tombstoned ids vanish; == layout rebuilt without them") {
    val dir = Files.createTempDirectory("ivf_range_del").toString
    val cents = Ivf.centroids(clustered, 8)
    Ivf.writePartitionedWith(clustered, cents, dir)
    val q = clustered.filter(col("vec_id") === 0)
      .select(perturbQuery(col("embedding")).as("query_vec"))
    val dels = Seq(0L, 4L, 8L).toDF("vec_id")
    Ivf.recordDeletes(spark, dir, dels)
    val got = Ivf.rangeSearchWithDeletes(spark, dir, q, 10.0)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(got.forall(r => !Seq(0L, 4L, 8L).contains(r._1)))
    val cleanDir = Files.createTempDirectory("ivf_range_del_clean").toString
    Ivf.writePartitionedWith(clustered.filter(!col("vec_id").isin(0L, 4L, 8L)),
      cents, cleanDir)
    assert(got === Ivf.rangeSearch(spark, cleanDir, q, 10.0)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq,
      "tombstone range serving must equal a layout built without the deleted rows")
  }

  test("cosine/MIPS range under tombstones == layouts rebuilt without the deleted rows") {
    val dels = Seq(0L, 4L, 8L).toDF("vec_id")
    val keep = !col("vec_id").isin(0L, 4L, 8L)
    val q = clustered.filter(col("vec_id") === 1)
      .select(perturbQuery(col("embedding")).as("query_vec"))

    val cosDir = Files.createTempDirectory("cos_range_del").toString
    Ivf.ensurePartitionedCosine(clustered, 8, cosDir)
    Ivf.recordDeletes(spark, cosDir, dels)
    val gotC = Ivf.cosineRangeSearchWithDeletes(spark, cosDir, q, 0.5)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(gotC.forall(r => !Seq(0L, 4L, 8L).contains(r._1)))
    val cosClean = Files.createTempDirectory("cos_range_del_clean").toString
    // same centroid geometry: normalize the FULL table for seeding so
    // the probe bounds match, then serve the kept rows
    Ivf.ensurePartitionedWith(Ivf.normalized(clustered).filter(keep),
      Ivf.centroids(Ivf.normalized(clustered), 8), cosClean, tag = "cosdelclean",
      kind = "cosine")
    assert(gotC === Ivf.cosineRangeSearch(spark, cosClean, q, 0.5)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq,
      "cosine range tombstone serving must equal a layout built without the deleted rows")

    val mipsDir = Files.createTempDirectory("mips_range_del").toString
    Ivf.ensurePartitionedMips(clustered, 8, mipsDir)
    Ivf.recordDeletes(spark, mipsDir, dels)
    val gotM = Ivf.mipsRangeSearchWithDeletes(spark, mipsDir, q, 100.0)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(gotM.forall(r => !Seq(0L, 4L, 8L).contains(r._1)))
    val mipsClean = Files.createTempDirectory("mips_range_del_clean").toString
    // same augmentation (corpus max norm from the FULL table) so the
    // augmented geometry is identical, kept rows only
    Ivf.ensurePartitionedWith(Ivf.augmented(clustered).filter(keep),
      Ivf.centroids(Ivf.augmented(clustered), 8), mipsClean, tag = "mipsdelclean",
      kind = "mips")
    assert(gotM === Ivf.mipsRangeSearch(spark, mipsClean, q, 100.0)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq,
      "MIPS range tombstone serving must equal a layout built without the deleted rows")

    // the BATCH serving forms honor the same sidecar (all 3 metrics)
    val qs = clustered.filter(col("vec_id").isin(1L, 2L))
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))
    val l2Dir = Files.createTempDirectory("l2_range_del_batch").toString
    Ivf.writePartitionedWith(clustered, Ivf.centroids(clustered, 8), l2Dir)
    Ivf.recordDeletes(spark, l2Dir, dels)
    val batchRows =
      Ivf.rangeSearchBatchWithDeletes(spark, l2Dir, qs, 10.0).select("vec_id") union
      Ivf.cosineRangeSearchBatchWithDeletes(spark, cosDir, qs, 0.5).select("vec_id") union
      Ivf.mipsRangeSearchBatchWithDeletes(spark, mipsDir, qs, 100.0).select("vec_id")
    assert(batchRows.filter(col("vec_id").isin(0L, 4L, 8L)).count() === 0,
      "tombstoned ids must reach no batch range result in any metric")
    assert(batchRows.count() > 0)
  }

  test("cosineRangeSearch == brute-force cosine filter; direction clusters prune") {
    // directional blobs: all vectors near one of 3 orthogonal axes —
    // after normalization these are tight caps on the sphere, so a
    // high similarity floor prunes the other caps' cells
    val rnd = new scala.util.Random(5)
    val dirs = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val vecs = (0L until 120L).map { i =>
      val base = dirs((i % 3).toInt)
      (i, base.map(x => x * 10f + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding").cache()
    val dir = Files.createTempDirectory("cos_range").toString
    Ivf.ensurePartitionedCosine(vecs, 6, dir)
    val q = vecs.filter(col("vec_id") === 0)
      .select(perturbQuery(col("embedding")).as("query_vec"))

    val got = Ivf.cosineRangeSearch(spark, dir, q, minSim = 0.9)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    // brute force: normalized diff-list score over every vector
    val qn = Ivf.normalizedQuery(q)
    val expected = Ivf.normalized(vecs).crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round(lit(1.0) - l2DistanceSq(col("embedding"), col("query_vec")) / lit(2.0),
          6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.9)
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(got === expected, "pruned cosine range must equal brute force")
    assert(got.nonEmpty && got.forall(_._1 % 3 == 0),
      "only the query's own direction cap clears a 0.9 floor")
  }

  test("batch cosine/MIPS range == per-query single forms, per query") {
    val rnd = new scala.util.Random(5)
    val dirs3 = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val vecs = (0L until 120L).map { i =>
      val base = dirs3((i % 3).toInt)
      (i, base.map(x => x * 10f + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding").cache()
    val qs = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))

    val cosDir = Files.createTempDirectory("cos_range_batch").toString
    Ivf.ensurePartitionedCosine(vecs, 6, cosDir)
    val gotCos = Ivf.cosineRangeSearchBatch(spark, cosDir, qs, minSim = 0.9)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val expCos = (0L until 5L).flatMap { qid =>
      val q = qs.filter(col("query_id") === qid).select("query_vec")
      Ivf.cosineRangeSearch(spark, cosDir, q, minSim = 0.9)
        .collect().map(x => (qid, x.getLong(0), x.getDouble(1)))
    }.toSet
    assert(gotCos === expCos, "batch cosine range must equal the per-query form")
    assert((0L until 5L).forall(qid => gotCos.exists(_._1 == qid)))

    val mipsDir = Files.createTempDirectory("mips_range_batch").toString
    Ivf.ensurePartitionedMips(vecs, 6, mipsDir)
    val gotMips = Ivf.mipsRangeSearchBatch(spark, mipsDir, qs, minDot = 95.0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val expMips = (0L until 5L).flatMap { qid =>
      val q = qs.filter(col("query_id") === qid).select("query_vec")
      Ivf.mipsRangeSearch(spark, mipsDir, q, minDot = 95.0)
        .collect().map(x => (qid, x.getLong(0), x.getDouble(1)))
    }.toSet
    assert(gotMips === expMips, "batch MIPS range must equal the per-query form")
    assert(gotMips.nonEmpty && gotMips.forall(t => t._1 % 3 == t._2 % 3),
      "a 95 dot floor only clears within the query's own direction cap")
  }

  test("insertInto drops stale radii so grown cells never under-prune") {
    val dir = Files.createTempDirectory("ivf_range_ins").toString
    val base = clustered.filter(col("vec_id") >= 4)   // blob centers stay seeded
    val cents = Ivf.centroids(clustered, 8)
    Ivf.writePartitionedWith(base, cents, dir)
    val q = clustered.filter(col("vec_id") === 0)
      .select(perturbQuery(col("embedding")).as("query_vec"))
    // materialize radii for the base layout, then grow it
    Ivf.rangeSearch(spark, dir, q, 10.0).count()
    Ivf.insertInto(spark, dir, clustered.filter(col("vec_id") < 4))
    val got = Ivf.rangeSearch(spark, dir, q, 10.0)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(got === brute(clustered, q, 10.0),
      "post-insert range search must see the inserted rows (radii regenerated)")
    assert(got.exists(_._1 == 0L), "the inserted near-query row must be found")
  }
}
