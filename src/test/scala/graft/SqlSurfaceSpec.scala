package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

/** The SQL-callable operator surface: table functions registered by
  * [[GraftExtensions]] must return exactly what the Column API returns.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("SQL TVF knn_topk(dir, k) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM knn_topk('$sf', 10)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromApi = SparkEntry.queries("q_knn_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromSql === fromApi)
    assert(fromSql.length === 10)
  }

  test("SQL TVF minhash_pairs(dir, threshold) matches the Column API") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM minhash_pairs('$sf', 0.5)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromApi = Dedup.minhashPairs(Tables.documents(spark, sf), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF bm25_topk(dir, k, terms...) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM bm25_topk('$sf', 10, 'dup', 'vector', 'spark')")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromApi = SparkEntry.queries("q_bm25_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromSql === fromApi)
    assert(fromSql.length === 10)
  }

  test("SQL TVF range_search(dir, radius) matches the declared layout-served query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM range_search('$sf', 1.8)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the layout-pruned declared form has identical semantics (the
    // pruning is lossless) — the TVF must reproduce it exactly
    val fromApi = SparkEntry.queries("q_range_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF maxsim_topk(dir, k) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM maxsim_topk('$sf', 10)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromApi = SparkEntry.queries("q_maxsim_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromSql === fromApi)
    assert(fromSql.length === 10)
  }

  test("SQL TVF diversified_topk(dir, k, j) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM diversified_topk('$sf', 10, 2)")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    val fromApi = SparkEntry.queries("q_diversified_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(fromSql === fromApi)
    assert(fromSql.length === 10)
    // the quota holds in the SQL result too
    assert(fromSql.groupBy(_._3).values.forall(_.size <= 2))
  }

  test("SQL TVF sq_topk(dir, k) matches the declared layout-served query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM sq_topk('$sf', 10)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromApi = SparkEntry.queries("q_sq_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromSql === fromApi)
    assert(fromSql.length === 10)
  }

  test("SQL TVF hamming_topk(dir, k) matches the declared layout-served query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM hamming_topk('$sf', 10)")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val fromApi = SparkEntry.queries("q_hamming_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(fromSql === fromApi)
    assert(fromSql.length === 10)
  }

  test("SQL TVF cascade_topk(dir, k, l1, l2) matches the declared funnel query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM cascade_topk('$sf', 10, 100, 30)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromApi = SparkEntry.queries("q_cascade_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromSql === fromApi)
    assert(fromSql.length === 10)
  }

  test("SQL TVF pagerank(dir, iters) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM pagerank('$sf', 3)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val fromApi = SparkEntry.queries("q_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF kcore(dir, k, rounds) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM kcore('$sf', 2, 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromApi = SparkEntry.queries("q_kcore")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF triangle_counts(dir) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM triangle_counts('$sf')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromApi = SparkEntry.queries("q_triangle_counts")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF dup_spans(dir, n) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM dup_spans('$sf', 6)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val fromApi = SparkEntry.queries("q_dup_spans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF span_dedup(dir, n) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM span_dedup('$sf', 6)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val fromApi = SparkEntry.queries("q_span_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF semdedup(dir, c, iters, tau) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM semdedup('$sf', 8, 2, 0.4)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val fromApi = SparkEntry.queries("q_semdedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF bigram_nll(dir) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM bigram_nll('$sf')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromApi = SparkEntry.queries("q_bigram_nll")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF chunk_docs(dir, window, stride) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM chunk_docs('$sf', 32, 24)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val fromApi = SparkEntry.queries("q_chunk_docs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF tfidf_topk(dir, k, terms...) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM tfidf_topk('$sf', 10, 'dup', 'vector', 'spark')")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromApi = SparkEntry.queries("q_tfidf_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromSql === fromApi)
    assert(fromSql.length === 10)
  }

  test("SQL TVF logreg_scores(dir, rounds, label, feats...) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(
      s"SELECT * FROM logreg_scores('$sf', 6, 'spark', 'query', 'join', 'table')")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val fromApi = SparkEntry.queries("q_logreg_scores")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVF leakage_split(dir, trainFrac, valFrac) matches the declared Column-API query") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM leakage_split('$sf', 0.9, 0.05)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val fromApi = SparkEntry.queries("q_leakage_split")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
  }

  test("SQL TVFs pii_spans(dir) / redact_pii(dir) match the Column API") {
    GraftExtensions.register(spark)
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val spansSql = spark.sql(s"SELECT * FROM pii_spans('$sf')")
      .collect().map(_.toSeq).toSet
    val spansApi = TextAnalysis.piiSpans(docs).collect().map(_.toSeq).toSet
    assert(spansSql === spansApi) // corpus is PII-free: both empty — the
    assert(spansSql.isEmpty)      // extraction itself is oracled on injected PII
    val redSql = spark.sql(s"SELECT * FROM redact_pii('$sf') WHERE n_pii > 0").count()
    val redApi = TextAnalysis.redactPii(docs).filter(
      org.apache.spark.sql.functions.col("n_pii") > 0).count()
    assert(redSql === redApi)
  }

  test("SQL TVF corpus_pipeline(dir, lang, minq, thr[, redact]) matches the Column API") {
    GraftExtensions.register(spark)
    val fromSql = spark.sql(s"SELECT * FROM corpus_pipeline('$sf', 'en', 0.4, 0.5)")
      .collect().map(_.toSeq).toSet
    val fromApi = SparkEntry.queries("q_corpus_pipeline")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(fromSql === fromApi)
    assert(fromSql.nonEmpty)
    // redaction flag parses and runs (corpus is PII-free → identical)
    val redacted = spark.sql(s"SELECT * FROM corpus_pipeline('$sf', 'en', 0.4, 0.5, TRUE)")
      .collect().map(_.toSeq).toSet
    assert(redacted === fromApi, "redacting a PII-free corpus is the identity")
  }

  test("SQL TVFs connected_components / phrase_topk / proximity_topk match the APIs") {
    GraftExtensions.register(spark)
    val ccSql = spark.sql(s"SELECT * FROM connected_components('$sf')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ccApi = SparkEntry.queries("q_connected_components")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ccSql === ccApi)
    assert(ccSql.nonEmpty)
    val phSql = spark.sql(s"SELECT * FROM phrase_topk('$sf', 10, 'spark', 'join')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val phApi = SparkEntry.queries("q_phrase_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(phSql === phApi)
    val pxSql = spark.sql(s"SELECT * FROM proximity_topk('$sf', 10, 'spark', 'join', 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pxApi = SparkEntry.queries("q_proximity_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pxSql === pxApi)
    assert(pxSql.nonEmpty)
  }

  test("TVFs compose with plain SQL (filter + order over the TVF result)") {
    GraftExtensions.register(spark)
    val top3 = spark.sql(
      s"SELECT vec_id FROM knn_topk('$sf', 10) ORDER BY dist, vec_id LIMIT 3")
      .collect().map(_.getLong(0)).toSeq
    val all = spark.sql(s"SELECT * FROM knn_topk('$sf', 10) ORDER BY dist, vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(top3 === all.take(3))
  }
}
