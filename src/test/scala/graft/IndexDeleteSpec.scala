package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.Hnsw

/** Index deletion lifecycle: tombstones exclude rows from serving
  * immediately; compaction folds them into a new generation rewriting
  * ONLY the affected shards — untouched shards land byte-identical.
  */
class IndexDeleteSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val P = Hnsw.Params(efSearch = 256, numPartitions = 4)

  private lazy val emb = (0L until 100L).map { i =>
    val rnd = new scala.util.Random(i)
    (i, Array.fill(8)(rnd.nextFloat() * 10f))
  }.toDF("vec_id", "embedding").cache()

  // all deleted ids hash to shard 1 (id % 4 == 1): shards 0/2/3 untouched
  private val delIds = Seq(5L, 9L, 13L, 17L)

  private lazy val queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))

  private def results(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** Files of every `part=<k>` subtree, keyed by relative path, valued
    * by content bytes (checksummed) — the byte-identity witness.
    */
  private def partFiles(base: String, parts: Set[Int]): Map[String, Int] = {
    def walk(p: Path): Seq[Path] =
      if (Files.isDirectory(p)) {
        val s = Files.list(p); try { import scala.jdk.CollectionConverters._
          s.iterator().asScala.toSeq.flatMap(walk) } finally s.close()
      } else Seq(p)
    parts.toSeq.flatMap { k =>
      val d = Paths.get(s"$base/part=$k")
      walk(d).filter(f => !f.getFileName.toString.endsWith(".crc"))
        .map(f => (s"part=$k/${d.relativize(f)}",
          java.util.Arrays.hashCode(Files.readAllBytes(f))))
    }.toMap
  }

  test("tombstoned ids vanish from serving immediately and results == rebuild without them") {
    val dir = Files.createTempDirectory("hnsw_del_serve").toString
    Hnsw.appendGeneration(emb, dir, P) // gen 0
    Hnsw.recordDeletes(spark, dir, delIds.toDF("vec_id"))
    val got = results(Hnsw.searchLatestGeneration(spark, dir, queries, 10, P))
    assert(got.forall(r => !delIds.contains(r._2)), "deleted ids must never be returned")
    // vs an index REBUILT from scratch without the deleted rows
    val remaining = emb.filter(!col("vec_id").isin(delIds: _*))
    val rebuilt = results(Hnsw.searchTopK(remaining, queries, 10, P))
    assert(got === rebuilt, "tombstone serving must equal a rebuild without the deleted rows")
  }

  test("compaction folds tombstones in: only affected shards rewritten, untouched shards byte-identical") {
    val dir = Files.createTempDirectory("hnsw_del_compact").toString
    Hnsw.appendGeneration(emb, dir, P) // gen 0
    Hnsw.recordDeletes(spark, dir, delIds.toDF("vec_id"))

    val untouched = Set(0, 2, 3)
    val nodesBefore = partFiles(s"$dir/gen=0/nodes", untouched)
    val edgesBefore = partFiles(s"$dir/gen=0/edges", untouched)
    assert(nodesBefore.nonEmpty && edgesBefore.nonEmpty)

    Hnsw.compactGeneration(spark, dir, P)

    assert(Hnsw.latestGenId(spark, dir) === Some(1), "compaction must commit the new generation")
    assert(Hnsw.deletedIds(spark, dir).isEmpty, "compaction must clear the tombstones")

    // untouched shards: same file names, same bytes
    assert(partFiles(s"$dir/gen=1/nodes", untouched) === nodesBefore,
      "untouched node shards must be byte-identical copies")
    assert(partFiles(s"$dir/gen=1/edges", untouched) === edgesBefore,
      "untouched edge shards must be byte-identical copies")

    // affected shard: deleted rows gone from nodes AND edges
    val (_, nodes1, edges1) = Hnsw.latestGeneration(spark, dir).get
    assert(nodes1.filter(col("vec_id").isin(delIds: _*)).count() === 0)
    assert(edges1.filter(col("src").isin(delIds: _*) || col("dst").isin(delIds: _*))
      .count() === 0, "compacted adjacency must not reference deleted ids")

    // serving the compacted generation == rebuild without deleted rows
    val remaining = emb.filter(!col("vec_id").isin(delIds: _*))
    val got = results(Hnsw.searchLatestGeneration(spark, dir, queries, 10, P))
    assert(got === results(Hnsw.searchTopK(remaining, queries, 10, P)))
  }

  test("delete -> compact -> append composes: the next generation builds on the compacted files") {
    val dir = Files.createTempDirectory("hnsw_del_append").toString
    val base = emb.filter(col("vec_id") < 80)
    Hnsw.appendGeneration(base, dir, P) // gen 0
    Hnsw.recordDeletes(spark, dir, delIds.toDF("vec_id"))
    Hnsw.compactGeneration(spark, dir, P) // gen 1
    val fresh = emb.filter(col("vec_id") >= 80)
    Hnsw.appendGeneration(fresh, dir, P) // gen 2 via insertInto
    assert(Hnsw.latestGenId(spark, dir) === Some(2))
    // generation GC: keep only the newest; serving is unchanged and
    // the reclaimed generations are gone from disk
    val servedBefore = results(Hnsw.searchLatestGeneration(spark, dir, queries, 10, P))
    Hnsw.vacuumGenerations(spark, dir, keep = 1)
    assert(Hnsw.latestGenId(spark, dir) === Some(2), "the newest generation survives GC")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/gen=0")) &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/gen=1")),
      "reclaimed generations must leave the disk")
    assert(results(Hnsw.searchLatestGeneration(spark, dir, queries, 10, P)) === servedBefore,
      "generation GC must not change what the latest generation serves")
    val got = results(Hnsw.searchLatestGeneration(spark, dir, queries, 10, P))
    assert(got.forall(r => !delIds.contains(r._2)))
    val (_, nodes2, _) = Hnsw.latestGeneration(spark, dir).get
    assert(nodes2.count() === 100 - delIds.length)
  }
}
