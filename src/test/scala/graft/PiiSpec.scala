package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** PII detection/redaction: exact span offsets, redaction chain order,
  * rule disjointness on the injected shapes, and the SQL surface.
  */
class PiiSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val sample =
    "mail a@b.io and c.d+x@e-f.org call 555-010-0042 ip 10.0.42.7 ssn 123-45-6789 card 4111 1111 1111 1234 end"

  test("piiSpans emits exact [start, stop) offsets for every rule") {
    val docs = Seq((1L, sample)).toDF("doc_id", "text")
    val got = TextAnalysis.piiSpans(docs).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getInt(3), r.getString(4))).toSet
    def at(pii: String) = (sample.indexOf(pii), sample.indexOf(pii) + pii.length)
    val expected = Set(
      ("email", at("a@b.io")._1, at("a@b.io")._2, "a@b.io"),
      ("email", at("c.d+x@e-f.org")._1, at("c.d+x@e-f.org")._2, "c.d+x@e-f.org"),
      ("phone", at("555-010-0042")._1, at("555-010-0042")._2, "555-010-0042"),
      ("ipv4", at("10.0.42.7")._1, at("10.0.42.7")._2, "10.0.42.7"),
      ("ssn", at("123-45-6789")._1, at("123-45-6789")._2, "123-45-6789"),
      ("card", at("4111 1111 1111 1234")._1, at("4111 1111 1111 1234")._2,
        "4111 1111 1111 1234"))
    assert(got === expected)
  }

  test("piiSpans finds repeated matches of the same rule in order") {
    val docs = Seq((1L, "x@y.io then z@w.io")).toDF("doc_id", "text")
    val got = TextAnalysis.piiSpans(docs).orderBy("start").collect()
      .map(r => (r.getInt(2), r.getString(4)))
    assert(got.toSeq === Seq((0, "x@y.io"), (12, "z@w.io")))
  }

  test("redactPii masks every span, counts them, and leaves clean text alone") {
    val docs = Seq((1L, sample), (2L, "no pii in here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L)._1 ===
      "mail <EMAIL> and <EMAIL> call <PHONE> ip <IPV4> ssn <SSN> card <CARD> end")
    assert(got(1L)._2 === 6L)
    assert(got(2L) === (("no pii in here at all", 0L)))
  }

  test("n_pii counts masked spans only — shadowed sub-matches don't inflate it") {
    // the SSN-shaped substring lives inside the email local part: the email
    // rule consumes it, so exactly ONE span is masked and n_pii must be 1
    // (counting every rule against the ORIGINAL text would say 2)
    val docs = Seq((1L, "contact a.123-45-6789@x.com today"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) === (("contact <EMAIL> today", 1L)))
  }

  test("rules stay disjoint on each other's shapes (no double redaction)") {
    // an SSN is not a phone, a card is not a phone, an IP is not a phone
    val docs = Seq((1L, "123-45-6789"), (2L, "4111 1111 1111 1234"),
      (3L, "10.0.42.7"), (4L, "555-010-0042")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) === (("<SSN>", 1L)))
    assert(got(2L) === (("<CARD>", 1L)))
    assert(got(3L) === (("<IPV4>", 1L)))
    assert(got(4L) === (("<PHONE>", 1L)))
  }

  test("regexp_spans is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    Seq((1L, sample)).toDF("doc_id", "text").createOrReplaceTempView("pii_docs")
    // Spark SQL string literals process backslash escapes (same contract
    // as the builtin regexp_* functions) — double them when quoting
    val sqlPat = TextAnalysis.piiPatterns.head._2.replace("\\", "\\\\")
    val viaSql = spark.sql(
      s"""SELECT s.start, s.stop, s.pii
          FROM pii_docs LATERAL VIEW explode(
            regexp_spans(text, '$sqlPat')) AS s""")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val viaCol = Seq((1L, sample)).toDF("doc_id", "text")
      .select(explode(TextAnalysis.piiSpansCol(col("text"),
        TextAnalysis.piiPatterns.head._2)).as("s"))
      .select("s.start", "s.stop", "s.pii")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(viaSql === viaCol)
    assert(viaSql.nonEmpty)
  }

  test("url extraction and the domain gate use subdomain-suffix semantics, not substring") {
    val docs = Seq(
      (1L, "link https://a.bad-site.com/x more", "s"),   // subdomain of blocked
      (2L, "link https://bad-site.com/y", "s"),          // exact blocked
      (3L, "link https://notads.net/z", "s"),            // LOOKALIKE — must survive
      (4L, "link https://good.org/w and http://ads.net/v", "s"), // one good one blocked
      (5L, "no links at all", "s"))
      .toDF("doc_id", "text", "source")
    val domains = TextAnalysis.urlDomains(docs).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(domains === Set((1L, "a.bad-site.com"), (2L, "bad-site.com"),
      (3L, "notads.net"), (4L, "good.org"), (4L, "ads.net")))
    val kept = TextAnalysis.domainGate(docs, Seq("bad-site.com", "ads.net"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 5L),
      "blocked exact + subdomains drop; lookalike domains and link-free docs survive")
  }

  test("curation pipeline composes redaction between filtering and dedup") {
    import graft.operators.CorpusPipeline
    // two docs identical up to their PII: redaction ON must collapse
    // them in exact dedup; OFF must keep both
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 40)
    val en = CorpusPipeline.filtered(base, "en", 0.0)
      .select("doc_id", "text").limit(1).collect()
    assume(en.nonEmpty)
    val keptText = en.head.getString(1)
    val docs = Seq(
      (1L, s"$keptText mail a@b.io", "en", "s", keptText.length + 14L),
      (2L, s"$keptText mail z@q.io", "en", "s", keptText.length + 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val on = CorpusPipeline.curate(docs, "en", 0.0, 0.99, redactPii = true).collect()
    val off = CorpusPipeline.curate(docs, "en", 0.0, 0.99).collect()
    assert(on.map(_.getLong(1)).sum === 1L, "redacted twins must dedup to one")
    assert(off.map(_.getLong(1)).sum === 2L, "unredacted twins both survive")
  }

  test("luhn_check validates PAN checksums from kernel to SQL surface") {
    import graft.functions.PiiKernels
    import org.apache.spark.unsafe.types.UTF8String
    def luhn(s: String) = PiiKernels.luhnValid(UTF8String.fromString(s))
    // known-valid test PANs (public checksum examples) and off-by-one twins
    assert(luhn("4111111111111111"))
    assert(luhn("4111 1111 1111 1111"), "space separators allowed")
    assert(luhn("4111-1111-1111-1111"), "dash separators allowed")
    assert(luhn("5500005555555559"))
    assert(luhn("378282246310005"), "15-digit Amex length in range")
    assert(!luhn("4111111111111112"), "checksum off by one fails")
    assert(!luhn("4111111111111121"), "transposition fails")
    assert(!luhn("41111111111"), "11 digits below PAN range")
    assert(!luhn("41111111111111111111"), "20 digits above PAN range")
    assert(!luhn("4111x111111111111"), "non-separator character fails")
    assert(!luhn(""), "empty fails")
    // cardCandidates: regex shape + checksum gate over a corpus
    val docs = Seq(
      (1L, "pay 4111 1111 1111 1111 now"),
      (2L, "fake 4111 1111 1111 1112 here"),
      (3L, "no cards at all"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.cardCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getBoolean(4))).toSeq
    assert(got === Seq(
      (1L, "4111 1111 1111 1111", true),
      (2L, "4111 1111 1111 1112", false)),
      "shape-valid candidates split by checksum; cardless docs emit nothing")
    // offsets point at the match
    val span = TextAnalysis.cardCandidates(docs).filter(col("doc_id") === 1)
      .select("start", "stop").head()
    assert((span.getInt(0), span.getInt(1)) === ((4, 23)))
    // SQL surface
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT luhn_check('4111-1111-1111-1111'), luhn_check('4111111111111112')").head()
    assert(viaSql.getBoolean(0) && !viaSql.getBoolean(1))
    // codegen pin: over a non-foldable source the expression runs inside
    // whole-stage codegen (a local Seq constant-folds to LocalTableScan)
    val wholeStage = spark.range(10).select(
      TextAnalysis.luhnCheckCol(
        concat(lit("4111 1111 1111 111"), col("id").cast("string"))).as("v"))
    val planStr = wholeStage.queryExecution.executedPlan.toString
    assert(planStr.contains("*(1) Project [luhn_check"),
      s"luhn_check must stay inside whole-stage codegen (the * span):\n$planStr")
    assert(wholeStage.collect().count(_.getBoolean(0)) === 1,
      "exactly one last-digit completion satisfies the checksum")
  }
}
