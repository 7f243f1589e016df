package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout invariants: the interleave itself, layout
  * independence of results, and MEASURED min/max skipping — a
  * multi-dim box predicate must touch far fewer row groups on the
  * Z-ordered layout than on a single-column-sorted one, by the same
  * footer-stats test a pruning reader applies.
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 20000
  private lazy val rows = {
    val rnd = new scala.util.Random(42)
    (0 until N).map { i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextDouble() * 1000.0)
    }.toDF("id", "x", "y").cache()
  }

  private lazy val (zDir, linDir) = {
    val base = java.nio.file.Files.createTempDirectory("layout").toString
    Layout.zorderWrite(rows, Seq("x", "y"), bits = 10, numFiles = 64, s"$base/z")
    // the single-column baseline: range-clustered and sorted on x only
    rows.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/lin")
    (s"$base/z", s"$base/lin")
  }

  test("zValue interleaves bits: key equals a reference Morton encode") {
    // 2 dims, 4 bits, bounds [0, 15]: rank == the raw value, so the key
    // must equal the classic Morton number computed in plain Scala
    def morton(x: Long, y: Long): Long =
      (0 until 4).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val got = (0L until 16L).flatMap(x => (0L until 16L).map(y => (x, y)))
      .toDF("x", "y")
      // hi = 15 + tiny epsilon is NOT needed: floor(v/15*15) == v for integers 0..15
      .select(col("x"), col("y"),
        Layout.zValue(Seq((col("x"), 0.0, 15.0), (col("y"), 0.0, 15.0)), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    (0L until 16L).foreach(x => (0L until 16L).foreach { y =>
      assert(got((x, y)) === morton(x, y), s"($x, $y)")
    })
  }

  test("results are layout-independent: box filter on the Z-ordered copy == original") {
    val pred = col("x").between(100, 300) && col("y").between(250.0, 400.0)
    val fromZ = spark.read.parquet(zDir).filter(pred)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromOrig = rows.filter(pred)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromZ === fromOrig)
    assert(fromZ.nonEmpty)
  }

  test("range predicates on the Z-ordered read reach the parquet scan (PushedFilters)") {
    val exec = spark.read.parquet(zDir)
      .filter(col("x").between(100, 300) && col("y").between(250.0, 400.0))
      .queryExecution.executedPlan
    // the scan node's metadata carries the UNtruncated pushed-filter list
    val pushed = exec.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata("PushedFilters")
    }.getOrElse(fail("no parquet scan in plan:\n" + exec))
    Seq("GreaterThanOrEqual(x,100)", "LessThanOrEqual(x,300)",
        "GreaterThanOrEqual(y,250.0)", "LessThanOrEqual(y,400.0)").foreach { f =>
      assert(pushed.contains(f), s"missing pushed filter $f in: $pushed")
    }
  }

  test("measured skipping: a 2-D box touches far fewer row groups on Z than on x-sorted") {
    val zStats = Layout.rowGroupStats(spark, zDir, Seq("x", "y"))
    val linStats = Layout.rowGroupStats(spark, linDir, Seq("x", "y"))
    assert(zStats.size >= 32 && linStats.size >= 32, "fixture must produce many row groups")
    // the y constraint is MORE selective than the x one — exactly the
    // case a single-column sort cannot serve: lin prunes to its ~20%
    // x stripe regardless of y; Z intersects both constraints
    val box = Map("x" -> (100.0, 300.0), "y" -> (250.0, 300.0))
    val zElig = Layout.eligibleRowGroups(zStats, box)
    val linElig = Layout.eligibleRowGroups(linStats, box)
    assert(zElig * 2 <= linElig,
      s"Z-order must at least halve eligible groups: z=$zElig/${zStats.size} lin=$linElig/${linStats.size}")
  }

  test("measured skipping on the SECOND dimension alone: x-sorted prunes nothing, Z does") {
    val zStats = Layout.rowGroupStats(spark, zDir, Seq("x", "y"))
    val linStats = Layout.rowGroupStats(spark, linDir, Seq("x", "y"))
    val box = Map("y" -> (250.0, 300.0)) // 5% slab, no x constraint
    val zElig = Layout.eligibleRowGroups(zStats, box)
    val linElig = Layout.eligibleRowGroups(linStats, box)
    assert(linElig === linStats.size,
      "an x-sorted layout cannot skip anything for a y-only predicate")
    assert(zElig * 2 <= zStats.size,
      s"Z-order must skip at least half the groups for a narrow y slab: $zElig/${zStats.size}")
  }

  test("ensureZordered memoizes: second call with unchanged data rewrites nothing") {
    val dir = java.nio.file.Files.createTempDirectory("layout_ens").toString + "/z"
    Layout.ensureZordered(rows, Seq("x", "y"), 10, 8, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(p).map(f => (f.getPath.getName, f.getModificationTime)).toSet
    Layout.ensureZordered(rows, Seq("x", "y"), 10, 8, dir)
    val after = fs.listStatus(p).map(f => (f.getPath.getName, f.getModificationTime)).toSet
    assert(before === after, "unchanged data must not rebuild the layout")
  }
}
