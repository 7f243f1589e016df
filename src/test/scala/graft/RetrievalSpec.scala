package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** BM25 + reciprocal-rank-fusion retrieval (Retrieval.scala), pinned
  * against hand-computed scores on a corpus small enough to verify on
  * paper. The sf-scale outputs are hash-checked against the DuckDB
  * oracle (q_bm25_topk / q_hybrid_rrf); this spec pins the FORMULA.
  */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // d0: one 'cat' of 2 tokens; d1: two 'cat's of 3; d2: no 'cat'.
  // N=3, avgdl=2, df(cat)=2 -> idf = ln(1 + 1.5/2.5) = ln(1.6)
  private lazy val docs = Seq(
    (0L, "cat dog"), (1L, "cat cat fish"), (2L, "bird")
  ).toDF("doc_id", "text")

  test("bm25TopK matches the hand-computed Okapi scores, drops zero-score docs") {
    val out = Retrieval.bm25TopK(docs, Seq("cat"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val idf = math.log(1.6)
    val s0 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2.0 / 2.0)) // = idf
    val s1 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 2.0))
    assert(out.map(_._1).toSeq == Seq(1L, 0L), "tf=2 must outrank tf=1; d2 dropped")
    assert(math.abs(out(0)._2 - s1) < 1e-6, s"got ${out(0)._2}, want $s1")
    assert(math.abs(out(1)._2 - s0) < 1e-6, s"got ${out(1)._2}, want $s0")
  }

  test("bm25TopK: rarer term carries more weight at equal tf; absent term contributes 0") {
    // 'rare' in 1 of 3 docs, 'common' in all 3; d0 has only rare,
    // d1 only common, same dl -> d0 outranks d1. 'ghost' is in no doc:
    // idf is finite (ln(1 + 3.5/0.5)), tf=0 everywhere -> no effect.
    val d = Seq(
      (0L, "rare pad"), (1L, "common pad"), (2L, "common x common y")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, Seq("rare", "common", "ghost"), k = 10)
      .collect().map(_.getLong(0))
    assert(out.head == 0L, s"rare-term doc must rank first: ${out.toSeq}")
    assert(out.toSet == Set(0L, 1L, 2L))
  }

  test("bm25Scorer (frozen stats) reproduces bm25TopK's scores, and runs on a stream") {
    // frozen-literal scorer == the crossJoined-stats batch scoring
    val terms = Seq("cat", "fish")
    val scored = docs.select(col("doc_id"),
        Retrieval.bm25Scorer(docs, terms).as("bm25"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val topk = Retrieval.bm25TopK(docs, terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    topk.foreach { case (id, s) =>
      assert(scored(id) == s, s"frozen-stats score for doc $id: ${scored(id)} != $s")
    }
    // the same column scores a document STREAM as a stateless narrow
    // projection (stats are literals -> no agg, no join in the stream)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val scorer = Retrieval.bm25Scorer(docs, terms)
    val streamed = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), scorer.as("bm25"))
    val q = streamed.writeStream.format("memory").queryName("bm25_out")
      .outputMode("append").start()
    try {
      mem.addData((0L, "cat dog"), (1L, "cat cat fish"))
      q.processAllAvailable()
      mem.addData((2L, "bird"))
      q.processAllAvailable()
      val got = spark.table("bm25_out").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === scored, "streamed scores must equal batch scores row-for-row")
    } finally q.stop()
  }

  test("bm25TopK works AT the 64-term cap and fails fast one past it") {
    // the stats row carries one df column per term and the score is a
    // static 64-way sum — the documented width bound must actually
    // compile, run, and score identically to a narrower query whose
    // extra terms are all absent from the corpus
    val cap = Seq("cat", "fish") ++ (0 until 62).map(i => s"zz$i")
    assert(cap.size == 64)
    val atCap = Retrieval.bm25TopK(docs, cap, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val narrow = Retrieval.bm25TopK(docs, Seq("cat", "fish"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(atCap.toSeq === narrow.toSeq,
      "absent terms contribute 0: the 64-term query must score like the 2-term one")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, cap :+ "one_too_many", k = 10)
    }
    assert(e.getMessage.contains("64"), e.getMessage)
  }

  test("bm25Scorer rejects an empty reference corpus with a real message") {
    val empty = docs.filter(col("doc_id") < 0)
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25Scorer(empty, Seq("cat"))
    }
    assert(e.getMessage.contains("non-empty"), e.getMessage)
  }

  test("hybridRrfTopK fuses ranks reciprocally, ties break on doc_id") {
    // lex list: d1 rank1, d0 rank2 (d2 has no 'cat').
    // sem list (query = v0): v0 rank1, v1 rank2, v2 rank3.
    // rrf(d0) = 1/62 + 1/61 == rrf(d1) = 1/61 + 1/62 -> tie, d0 first.
    // rrf(d2) = 1/63 (sem only; lex_rank null).
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val rows = Retrieval.hybridRrfTopK(docs, emb, Seq("cat"), queryVecId = 0L, k = 10)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L), rows.mkString(";"))
    val tied = 1.0 / 61 + 1.0 / 62
    assert(math.abs(rows(0).getDouble(1) - tied) < 1e-6)
    assert(math.abs(rows(1).getDouble(1) - tied) < 1e-6)
    assert(math.abs(rows(2).getDouble(1) - 1.0 / 63) < 1e-6)
    assert(rows(2).isNullAt(2), "doc outside the lexical pool has null lex_rank")
    assert(rows(2).getLong(3) == 3L)
  }

  test("maxsimTopK: each query token matches its best doc token; max (not sum) over doc tokens") {
    // doc 0 holds both axis vectors, doc 1 only x (twice — the dup
    // must NOT double its score: max, not sum), doc 2 only y.
    val dv = Seq(
      (0L, Array(1f, 0f)), (0L, Array(0f, 1f)),
      (1L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f))
    ).toDF("doc_id", "embedding")
    val toks = Seq(
      (0L, Array(2.0, 0.0)), (1L, Array(0.0, 3.0))
    ).toDF("tok_id", "query_vec")
    val out = Retrieval.maxsimTopK(dv, toks, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // doc0: max⟨t0,·⟩=2, max⟨t1,·⟩=3 → 5; doc1: 2 + 0 = 2; doc2: 0 + 3 = 3
    assert(out.toSeq == Seq(0L -> 5.0, 2L -> 3.0, 1L -> 2.0), out.mkString(";"))
  }

  test("maxsimTopKPruned: nprobe=C == exact maxsim; small nprobe prunes yet finds the clustered winner") {
    import graft.operators.Ivf
    // 3 well-separated blobs; docs of 2 consecutive token vectors
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 90L).map { i =>
      val c = (i % 3) * 50.0f
      (i, Array.fill(6)(c + rnd.nextFloat()))
    }
    val dv = vecs.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("maxsim_pruned").toString
    Ivf.writePartitionedWith(dv, Ivf.centroids(dv, 6), dir)
    val toks = vecs.take(2).map { case (i, v) => (i, v.map(_.toDouble)) }
      .toDF("tok_id", "query_vec")
    val docIdOf = (v: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.floor(v / 2).cast("long")

    val exact = Retrieval.maxsimTopK(
      dv.select(docIdOf(col("vec_id")).as("doc_id"), col("embedding")), toks, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Retrieval.maxsimTopKPruned(spark, dir, toks, docIdOf, 10, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === exact, "nprobe=C must reproduce exact maxsim bit-for-bit")

    // small nprobe: hidden tokens can only LOWER a doc's score (all
    // dots are non-negative in this fixture, so the 0-floor is also a
    // lower bound) — pruned scores are bounded by the exact scores,
    // and the probed blobs' docs still fill the result
    val exactAll = Retrieval.maxsimTopK(
      dv.select(docIdOf(col("vec_id")).as("doc_id"), col("embedding")), toks, 45)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pruned = Retrieval.maxsimTopKPruned(spark, dir, toks, docIdOf, 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pruned.size === 10)
    pruned.foreach { case (d, s) =>
      assert(s <= exactAll(d) + 1e-9,
        s"pruned score for doc $d ($s) must not exceed the exact score (${exactAll(d)})")
    }
  }

  test("maxsimTopKBatch at nprobe=C == per-query maxsimTopK; duplicate tok_ids rejected") {
    import graft.operators.Ivf
    val rnd = new scala.util.Random(23)
    val vecs = (0L until 80L).map { i =>
      (i, Array.fill(6)(rnd.nextFloat() * 4f - 2f))
    }
    val dv = vecs.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("maxsim_batch").toString
    Ivf.writePartitionedWith(dv, Ivf.centroids(dv, 5), dir)
    val docIdOf = (v: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.floor(v / 2).cast("long")
    // 3 queries × 2 tokens each (globally unique tok_ids)
    val toks = (0 until 6).map { t =>
      (t.toLong / 2, t.toLong, Array.fill(6)(rnd.nextDouble() * 2 - 1))
    }.toDF("query_id", "tok_id", "query_vec")

    val batch = Retrieval.maxsimTopKBatch(spark, dir, toks, docIdOf, 10, nprobe = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(p => (-p._2, p._1)).toSeq)
      .toMap
    for (q <- 0L until 3L) {
      val single = Retrieval.maxsimTopK(
        dv.select(docIdOf(col("vec_id")).as("doc_id"), col("embedding")),
        toks.filter(col("query_id") === q).select("tok_id", "query_vec"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q) === single, s"batch row set for query $q must equal the single-bag form")
    }

    val dup = Seq((0L, 1L, Array.fill(6)(0.5)), (0L, 1L, Array.fill(6)(0.25)))
      .toDF("query_id", "tok_id", "query_vec")
    val e = intercept[IllegalArgumentException] {
      Retrieval.maxsimTopKBatch(spark, dir, dup, docIdOf, 5, nprobe = 5)
    }
    assert(e.getMessage.contains("duplicate tok_id"))
    intercept[IllegalArgumentException] {
      Retrieval.maxsimTopK(dv.select(docIdOf(col("vec_id")).as("doc_id"), col("embedding")),
        dup.select("tok_id", "query_vec"), 5)
    }
  }

  test("maxsim under tombstones: taken-down docs' tokens vanish; == corpus without them (pruned AND batch)") {
    import graft.operators.{Ivf, Tombstones}
    val rnd = new scala.util.Random(31)
    val vecs = (0L until 80L).map { i => (i, Array.fill(6)(rnd.nextFloat() * 4f - 2f)) }
    val dv = vecs.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("maxsim_del").toString
    Ivf.writePartitionedWith(dv, Ivf.centroids(dv, 5), dir)
    val docIdOf = (v: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.floor(v / 2).cast("long")
    // take down docs 3 and 7 → token ids 6,7 and 14,15
    val delToks = Seq(6L, 7L, 14L, 15L).toDF("vec_id")
    Ivf.recordDeletes(spark, dir, delToks)
    val toks = vecs.take(2).map { case (i, v) => (i, v.map(_.toDouble)) }
      .toDF("tok_id", "query_vec")

    val got = Retrieval.maxsimTopKPruned(spark, dir, toks, docIdOf, 40, nprobe = 5,
        excluded = Tombstones.ids(spark, dir))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty && got.forall(r => r._1 != 3L && r._1 != 7L))
    val without = Retrieval.maxsimTopK(
      dv.filter(!col("vec_id").isin(6L, 7L, 14L, 15L))
        .select(docIdOf(col("vec_id")).as("doc_id"), col("embedding")), toks, 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === without,
      "maxsim tombstone serving must equal the corpus without the taken-down docs")

    val btoks = toks.select(
      org.apache.spark.sql.functions.lit(0L).as("query_id"),
      col("tok_id"), col("query_vec"))
    val gotB = Retrieval.maxsimTopKBatch(spark, dir, btoks, docIdOf, 40, nprobe = 5,
        excluded = Tombstones.ids(spark, dir))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(gotB.toSet === without.toSet, "batch maxsim must honor the same tombstones")
  }

  test("maxsimTopK == brute-force per-token max on a random fixture") {
    val rnd = new scala.util.Random(7)
    val dv = (0 until 120).map { i =>
      (i.toLong / 3, Array.fill(6)(rnd.nextFloat() * 2f - 1f))
    }.toDF("doc_id", "embedding")
    val toks = (0 until 3).map { t =>
      (t.toLong, Array.fill(6)(rnd.nextDouble() * 2 - 1))
    }.toDF("tok_id", "query_vec")
    val got = Retrieval.maxsimTopK(dv, toks, k = 40)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val docVecs = dv.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))).toSeq
    val qToks = toks.collect().map(r => r.getSeq[Double](1)).toSeq
    val expected = docVecs.groupBy(_._1).map { case (d, pairs) =>
      val vs = pairs.map(_._2)
      d -> BigDecimal(qToks.map(t =>
        vs.map(v => v.zip(t).map { case (a, b) => a * b }.sum).max).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq.sortBy { case (d, s) => (-s, d) }.take(40)
    assert(got === expected)
  }

  test("tfidfTopK: hand-computed cosine over the full tf-idf vectors; zero-overlap docs dropped") {
    // corpus: d0 {cat dog}, d1 {cat cat fish}, d2 {bird}; query {cat}
    val got = Retrieval.tfidfTopK(docs, Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // idf(t) = trunc12(ln(4/(df+1)) + 1); w(t,d) = tf*idf
    def idf(df: Int): Double =
      BigDecimal(math.log(4.0 / (df + 1)) + 1.0)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val iCat = idf(2); val iDog = idf(1); val iFish = idf(1); val iBird = idf(1)
    def trunc(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    // per-doc norm² and numerator from DECIMAL-truncated contributions
    val n0 = trunc(iCat * iCat) + trunc(iDog * iDog)
    val n1 = trunc((2 * iCat) * (2 * iCat)) + trunc(iFish * iFish)
    val qn = trunc(iCat * iCat)
    val s0 = (trunc(iCat * iCat).toDouble /
      (math.sqrt(n0.toDouble) * math.sqrt(qn.toDouble)))
    val s1 = (trunc((2 * iCat) * iCat).toDouble /
      (math.sqrt(n1.toDouble) * math.sqrt(qn.toDouble)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq(1L -> r6(s1), 0L -> r6(s0))
      .sortBy { case (d, s) => (-s, d) }
    assert(got === expected, s"got $got expected $expected")
    assert(!got.exists(_._1 == 2L), "doc without any query term must be dropped")
  }

  test("tfidfTopKBatch == per-query tfidfTopK for every bag; heap rank, no window sort") {
    val corpus = (0L until 150L).map { i =>
      val t = i % 7 match {
        case 0 => "cat dog fish"
        case 1 => "cat cat bird"
        case 2 => "dog dog dog common"
        case 3 => "fish bird common filler"
        case _ => s"common filler pad${i % 11}"
      }
      (i, t)
    }.toDF("doc_id", "text")
    val bags = Seq(0L -> Seq("cat", "dog"), 1L -> Seq("fish"), 2L -> Seq("bird", "common"))
    val batch = Retrieval.tfidfTopKBatch(corpus, bags, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sortBy(x => (-x._2, x._1)).toSeq).toMap
    bags.foreach { case (qid, ts) =>
      val single = Retrieval.tfidfTopK(corpus, ts, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid).sortBy(x => (-x._2, x._1)) === single.sortBy(x => (-x._2, x._1)),
        s"batch result for query $qid must equal the single form")
    }
    // ranking is the bounded-heap aggregate, not a sorted window
    val plan = Retrieval.tfidfTopKBatch(corpus, bags, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topk_pairs") || plan.contains("TopKPairsAgg"),
      s"batch rank must be the heap aggregate:\n$plan")
    assert(!plan.contains("Window"), s"no window sort on the batch rank path:\n$plan")
  }

  test("tfidf layout: indexed single+batch == full compute; term filter pushes into the postings scan; stale layout rebuilds") {
    val corpus = (0L until 120L).map { i =>
      (i, if (i % 4 == 0) "cat dog shared" else s"shared filler pad${i % 9} fish")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("tfidf_layout").toString
    Retrieval.ensureTfidfLayout(corpus, dir)
    // single
    val full = Retrieval.tfidfTopK(corpus, Seq("cat", "fish"), 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = Retrieval.tfidfTopKIndexed(spark, dir, Seq("cat", "fish"), 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === full, "layout-served scores must equal full compute")
    // batch
    val bags = Seq(0L -> Seq("cat"), 1L -> Seq("fish", "dog"))
    val fullB = Retrieval.tfidfTopKBatch(corpus, bags, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val servedB = Retrieval.tfidfTopKBatchIndexed(spark, dir, bags, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(servedB === fullB, "layout-served batch must equal full-compute batch")
    // the query-term predicate reaches the stored postings scan
    val plan = Retrieval.tfidfTopKIndexed(spark, dir, Seq("cat", "dog"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(term") || plan.contains("EqualTo(term"),
      s"term predicate must push into the parquet postings scan:\n$plan")
    // a changed corpus must rebuild (completeness + fingerprint contract)
    import org.apache.spark.sql.functions.{concat_ws, lit}
    val corpus2 = corpus.withColumn("text", concat_ws(" ", col("text"), lit("newword")))
    Retrieval.ensureTfidfLayout(corpus2, dir)
    val after = Retrieval.tfidfTopKIndexed(spark, dir, Seq("newword"), 3).count()
    assert(after === 3, "rebuilt layout must serve the new corpus content")
  }

  test("tfidf layout takedowns: tombstoned docs vanish from both indexed forms; others' scores unmoved") {
    val corpus = (0L until 80L).map { i =>
      (i, if (i % 4 == 0) "cat dog shared" else s"shared filler pad${i % 9} fish")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("tfidf_del").toString
    Retrieval.ensureTfidfLayout(corpus, dir)
    val before = Retrieval.tfidfTopKIndexed(spark, dir, Seq("cat", "fish"), 80)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val deleted = corpus.filter(col("doc_id") % 3 === 0).select("doc_id")
    Retrieval.deleteDocs(spark, dir, deleted)
    val after = Retrieval.tfidfTopKIndexed(spark, dir, Seq("cat", "fish"), 80)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // exclusion-only semantics: survivors keep the built corpus' scores
    assert(after === before.filter { case (id, _) => id % 3 != 0 },
      "takedowns must drop exactly the tombstoned docs, scores unchanged")
    // batch path honors the same sidecar
    val afterB = Retrieval.tfidfTopKBatchIndexed(spark, dir, Seq(0L -> Seq("cat")), 80)
      .collect().map(_.getLong(1)).toSet
    assert(afterB.forall(_ % 3 != 0), "batch serving must exclude tombstones too")
    assert(afterB.nonEmpty)
  }

  test("phraseTopK: adjacency in order, repeated-term phrases, overlap counting, tombstones") {
    val corpus = Seq(
      (0L, "cat dog fish"),          // "cat dog" once
      (1L, "dog cat dog cat dog"),   // "cat dog" twice; "dog cat" twice
      (2L, "cat fish dog"),          // cat and dog present but NOT adjacent
      (3L, "dog cat"),               // reverse order only
      (4L, "go go go"),              // repeated-term phrase "go go" overlaps: 2
      (5L, "nothing here")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("phrase_idx").toString
    Retrieval.ensureTfidfLayout(corpus, dir)
    def got(phrase: Seq[String]) =
      Retrieval.phraseTopK(spark, dir, phrase, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // order matters: "cat dog" != "dog cat"; non-adjacent docs excluded
    assert(got(Seq("cat", "dog")) === Seq((1L, 2L), (0L, 1L)),
      "adjacent in-order occurrences only, ranked by count then doc_id")
    assert(got(Seq("dog", "cat")) === Seq((1L, 2L), (3L, 1L)))
    // repeated-term phrase: overlapping occurrences both count
    assert(got(Seq("go", "go")) === Seq((4L, 2L)))
    // 3-term phrase
    assert(got(Seq("cat", "dog", "fish")) === Seq((0L, 1L)))
    assert(got(Seq("cat", "fish", "dog")) === Seq((2L, 1L)))
    // tombstoned docs vanish from phrase serving too
    Retrieval.deleteDocs(spark, dir, Seq(1L).toDF("doc_id"))
    assert(got(Seq("cat", "dog")) === Seq((0L, 1L)))
    // the phrase-term predicate reaches the stored postings scan
    val plan = Retrieval.phraseTopK(spark, dir, Seq("cat", "dog"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(term") || plan.contains("EqualTo(term"),
      s"phrase terms must push into the parquet postings scan:\n$plan")
  }

  test("proximityTopK: windowed ordered pairs; slop=1 == phrase count; tombstones") {
    val corpus = Seq(
      (0L, "cat dog"),                 // distance 1
      (1L, "cat x dog cat y z dog"),   // pairs within 3: (0,2), (3,6)? 6-3=3 ✓ and (0→6)=6 ✗ → 2
      (2L, "cat x y z dog"),           // distance 4 — outside slop 3
      (3L, "dog cat"),                 // reverse order only
      (4L, "cat dog dog")              // (0,1) and (0,2) → 2
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("prox_idx").toString
    Retrieval.ensureTfidfLayout(corpus, dir)
    def got(a: String, b: String, slop: Int) =
      Retrieval.proximityTopK(spark, dir, a, b, slop, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got("cat", "dog", 3) === Seq((1L, 2L), (4L, 2L), (0L, 1L)),
      "ordered pairs within the window, ranked by count then doc_id")
    // slop = 1 degenerates to the exact 2-term phrase count
    val phrase = Retrieval.phraseTopK(spark, dir, Seq("cat", "dog"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got("cat", "dog", 1) === phrase)
    // direction matters: doc 1 has dog@2 → cat@3, doc 3 is reverse-only
    assert(got("dog", "cat", 3) === Seq((1L, 1L), (3L, 1L)))
    // tombstones drop from proximity serving too
    Retrieval.deleteDocs(spark, dir, Seq(1L).toDF("doc_id"))
    assert(got("cat", "dog", 3) === Seq((4L, 2L), (0L, 1L)))
  }

  test("tfidfTopK: idf join broadcasts and scores are partition-count-invariant") {
    val many = (0L until 200L).map { i =>
      (i, if (i % 5 == 0) "cat common" else "common filler fish")
    }.toDF("doc_id", "text")
    val a = Retrieval.tfidfTopK(many.repartition(1), Seq("cat", "fish"), 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = Retrieval.tfidfTopK(many.repartition(7), Seq("cat", "fish"), 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a === b, "decimal-truncated sums must not move with partitioning")
    val plan = Retrieval.tfidfTopK(many, Seq("cat"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"the vocabulary-sized idf relation must broadcast onto the postings:\n$plan")
  }
}
