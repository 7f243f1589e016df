package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Sequence-packing laws: the window plan must reproduce a sequential
  * concat-then-chunk reference exactly, and the plan must not add a
  * second shuffle for the in-sequence position.
  */
class PackingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // three groups, varied lengths; ids interleaved across groups
  private lazy val docs = (0L until 300L)
    .map(i => (i, s"g${i % 3}", 1 + (i * 7 % 50).toInt))
    .toDF("doc_id", "grp", "n").cache()

  test("packing equals the sequential concat-then-chunk reference") {
    val budget = 100
    val got = Packing.packSequences(docs, "grp", "doc_id", col("n"), budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(x => (x._2, x._1))
    // sequential reference: running token offset per group
    val expected = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(x => (x._2, x._1))
      .groupBy(_._2).iterator.flatMap { case (g, rows) =>
        var offset = 0L
        val seqPos = collection.mutable.Map.empty[Long, Int]
        rows.sortBy(_._1).map { case (id, _, n) =>
          val seq = offset / budget
          offset += n
          val pos = seqPos.getOrElse(seq, 0) + 1
          seqPos(seq) = pos
          (id, g, n.toLong, seq, pos)
        }
      }.toSeq.sortBy(x => (x._2, x._1))
    assert(got.toSeq === expected)
  }

  test("sequences start at 0, are contiguous, and positions are dense") {
    val packed = Packing.packSequences(docs, "grp", "doc_id", col("n"), 100).cache()
    val perGroup = packed.groupBy("grp")
      .agg(min("seq_id").as("mn"), max("seq_id").as("mx"),
        countDistinct("seq_id").as("nd")).collect()
    perGroup.foreach { r =>
      assert(r.getLong(1) === 0L, "first sequence id must be 0")
      assert(r.getLong(3) === r.getLong(2) + 1, "sequence ids must be contiguous")
    }
    // seq_pos is dense 1..n within each (grp, seq_id)
    val bad = packed.groupBy("grp", "seq_id")
      .agg(count(lit(1)).as("n"), min("seq_pos").as("mn"), max("seq_pos").as("mx"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n")).count()
    assert(bad === 0)
  }

  test("chunkDocs: window/stride laws — count, full windows, overlap reconstruction") {
    import graft.operators.Packing.chunkDocs
    val texts = Seq(
      (0L, "a"), // shorter than window: one short chunk
      (1L, (1 to 32).map(i => s"w$i").mkString(" ")), // exactly one window
      (2L, (1 to 33).map(i => s"w$i").mkString(" ")), // one word past: still 1 chunk, tail rides nowhere
      (3L, (1 to 100).map(i => s"w$i").mkString(" ")) // several overlapping chunks
    ).toDF("doc_id", "text")
    val got = chunkDocs(texts, window = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    // counts: 1 + floor(max(n-32,0)/24)
    val counts = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(counts == Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> (1 + (100 - 32) / 24)))
    // every chunk of a doc with n >= window has exactly `window` words
    got.filter(c => c._1 >= 1).foreach { c =>
      assert(c._3 == 32L, s"chunk $c must be a full window")
    }
    // chunk i starts at word i*stride + 1
    val d3 = got.filter(_._1 == 3L)
    d3.foreach { case (_, i, _, text) =>
      assert(text.startsWith(s"w${i * 24 + 1} "), s"chunk $i misaligned: $text")
    }
    // short doc: the whole text, once
    assert(got.filter(_._1 == 0L).head._4 == "a")
  }

  test("chunkDocs is shuffle-free (narrow split + explode + slice)") {
    import graft.operators.Packing.chunkDocs
    val texts = Seq((0L, (1 to 80).map(_.toString).mkString(" "))).toDF("doc_id", "text")
    val plan = chunkDocs(texts, 32, 24).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("one exchange only: the seq_pos window reuses the group partitioning") {
    // budget 101: avoid hitting test 2's cached relation, whose AQE
    // string would double-print its exchange (initial + final plan)
    val plan = Packing.packSequences(docs, "grp", "doc_id", col("n"), 101)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"seq_pos must not re-shuffle (hash(grp) already clusters (grp, seq_id)):\n$plan")
  }
}
