package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HtmlKernels
import graft.operators.TextAnalysis

/** HTML/markup text extraction ([[graft.functions.HtmlKernels]]): the
  * deterministic zero-dep stage upstream of the whole text-curation
  * surface. The kernel is a single forward pass — the adversarial
  * corpus here (unclosed tags, nested tables, CDATA, attribute `>`,
  * entity edge cases) must extract exactly and must not hang.
  */
class HtmlExtractSpec extends AnyFunSuite {
  import TestSpark.spark

  private def ext(s: String): String =
    HtmlKernels.visibleText(UTF8String.fromString(s)).toString
  private def dens(s: String): Double =
    HtmlKernels.linkDensity(UTF8String.fromString(s))

  private def withConfs[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("basic structure: tags strip, blocks break lines, whitespace collapses") {
    assert(ext("<html><head><title>T</title></head><body><p>a  b</p><p>c</p></body></html>")
      === "T\na b\nc")
    assert(ext("<div>one<br>two</div>") === "one\ntwo")
    assert(ext("<span>in</span>line <b>bold</b>") === "inline bold")
    assert(ext("  plain \n text  ") === "plain text")
  }

  test("script/style/comment content is dropped, including unterminated") {
    assert(ext("<p>a</p><script>if (1 < 2) { alert('</p>'); }</script><p>b</p>")
      === "a\nb")
    assert(ext("<style>p > span { color: red }</style><p>x</p>") === "x")
    assert(ext("<p>a</p><!-- <p>ghost</p> --><p>b</p>") === "a\nb")
    // unterminated: drop to end, never hang
    assert(ext("<p>a</p><script>var x = 1;") === "a")
    assert(ext("<p>a</p><!-- no close") === "a")
    // case-insensitive close
    assert(ext("<SCRIPT>x</ScRiPt><p>ok</p>") === "ok")
  }

  test("entities decode; unknown and malformed stay literal") {
    assert(ext("Tom &amp; Jerry &lt;3 &gt; &quot;q&quot; &apos;a&apos;")
      === "Tom & Jerry <3 > \"q\" 'a'")
    assert(ext("a&nbsp;b") === "a b")
    assert(ext("&#65;&#x42;&#X43;") === "ABC")
    assert(ext("&bogus; &amp &#xZZ; &#; &") === "&bogus; &amp &#xZZ; &#; &")
    // entity inside an anchor counts toward link chars
    assert(dens("<a>&amp;</a>") === 1.0)
  }

  test("CDATA content is kept verbatim (no entity decode), markers stripped") {
    assert(ext("<p>a</p><![CDATA[<raw> &amp; stuff]]><p>b</p>")
      === "a\n<raw> &amp; stuff\nb")
    assert(ext("x<![CDATA[tail") === "xtail") // unterminated: verbatim to end
  }

  test("adversarial markup: unclosed tags, nested tables, attribute '>', stray '<'") {
    assert(ext("<p>never closed <div>still fine") === "never closed\nstill fine")
    assert(ext("<table><tr><td><table><tr><td>deep</td></tr></table></td></tr></table>")
      === "deep")
    // '>' inside a quoted attribute must not end the tag
    assert(ext("""<a href="x?a>b" title='1>2'>link</a> out""") === "link out")
    // a '<' not starting a tag is literal text
    assert(ext("1 < 2 and 2 > 1") === "1 < 2 and 2 > 1")
    // unterminated tag at end drops the tail
    assert(ext("ok<a href=") === "ok")
    assert(ext("ok<p") === "ok")
    // degenerate: empty / markup-only
    assert(ext("") === "")
    assert(ext("<div></div><p></p>") === "")
  }

  test("link density: anchor fraction of visible non-whitespace chars") {
    // 'navone'+'navtwo' = 12 link chars of 12+4 total
    val h = "<div><a href='/a'>nav one</a> <a href='/b'>nav two</a></div><p>body</p>"
    assert(math.abs(dens(h) - 12.0 / 16.0) < 1e-12)
    assert(dens("<p>no links at all</p>") === 0.0)
    assert(dens("") === 0.0)
    assert(dens("<div></div>") === 0.0)
    // nested/unclosed anchors never go negative or exceed 1
    val weird = dens("</a>text<a>x<a>y</a>z</a>w")
    assert(weird >= 0.0 && weird <= 1.0)
  }

  test("no hang on pathological inputs (single forward pass)") {
    val big = new StringBuilder
    (0 until 20000).foreach(i => big.append("<x" + (i % 7) + ">&bad; <"))
    val t0 = System.nanoTime()
    ext(big.toString)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "pathological input must stay linear")
  }

  test("extractHtml stage: text replaced, boilerplate flagged, shuffle-free plan") {
    import spark.implicits._
    val docs = Seq(
      (0L, "<p>real article text here</p><div><a>n</a></div>"),
      (1L, "<div><a href='/1'>one</a> <a href='/2'>two</a> <a href='/3'>three</a></div><p>x</p>")
    ).toDF("doc_id", "html")
    val out = TextAnalysis.extractHtml(docs, "html", maxLinkDensity = 0.5)
    val rows = out.orderBy("doc_id").collect()
    assert(rows(0).getAs[String]("text") === "real article text here\nn")
    assert(!rows(0).getAs[Boolean]("boilerplate"))
    assert(rows(1).getAs[String]("text") === "one two three\nx")
    assert(rows(1).getAs[Boolean]("boilerplate"), "link farm must flag as boilerplate")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must be a narrow projection:\n$plan")
    // composes upstream of curation: the flagged row drops, text is plain
    val cleaned = out.filter(!col("boilerplate")).select("doc_id", "text")
    assert(cleaned.count() === 1L)
    // a pre-existing `text` column is superseded (NOT duplicated): the
    // stage yields exactly one `text`, holding the extracted markup
    val withText = docs.withColumn("text", lit("stale plain text"))
    val out2 = TextAnalysis.extractHtml(withText, "html")
    assert(out2.columns.count(_ == "text") === 1,
      "rename over a pre-existing text column must not duplicate it")
    assert(out2.orderBy("doc_id").head().getAs[String]("text")
      === "real article text here\nn")
  }

  test("html_links: hrefs in document order; script/comment ghosts excluded; attribute forms") {
    def lk(s: String): Seq[String] = {
      val a = HtmlKernels.links(UTF8String.fromString(s))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    assert(lk("""<a href="/one">1</a><a href='/two'>2</a><a href=/three>3</a>""")
      === Seq("/one", "/two", "/three"))
    // other attributes around href; case-insensitive name; self-closing
    assert(lk("""<a class="x" HREF="/caps" title='1>2'>t</a><a href="/sc"/>""")
      === Seq("/caps", "/sc"))
    // ghosts in script/comment/style never count; anchors without href don't
    assert(lk("""<script>'<a href="/g1">'</script><!-- <a href="/g2"> -->
      <style>a { color: red }</style><a name="n">no href</a><a href="/real">r</a>""")
      === Seq("/real"))
    // xhref must not match (word boundary); an unterminated attribute
    // quote makes the whole tag malformed — dropped, no link, no hang
    assert(lk("""<a xhref="/no">x</a><a href="/tail>y</a>""") === Seq.empty)
    assert(lk("") === Seq.empty)
  }

  test("html_links composes with domain provenance over extracted URLs") {
    import spark.implicits._
    val docs = Seq(
      (1L, """<a href="https://good.org/a">g</a><a href="https://ads.net/b">b</a>"""),
      (2L, """<a href="/relative">r</a>"""))
      .toDF("doc_id", "html")
    val links = docs.select(col("doc_id"),
      explode(TextAnalysis.htmlLinks(col("html"))).as("url"))
    assert(links.count() === 3L)
    val domains = links
      .select(col("doc_id"), regexp_extract(col("url"),
        "https?://([A-Za-z0-9.-]+)", 1).as("domain"))
      .filter(col("domain") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(domains === Set((1L, "good.org"), (1L, "ads.net")))
  }

  test("canonical_url: each rule exact; non-http passes through; composition collapses spellings") {
    import graft.functions.UrlKernels
    def c(s: String) = UrlKernels.canonicalStr(s)
    // scheme/host lowercase, path case preserved
    assert(c("HTTPS://WWW.Site.COM/Path/X") === "https://www.site.com/Path/X")
    // default ports drop, non-default kept
    assert(c("https://a.com:443/x") === "https://a.com/x")
    assert(c("http://a.com:80/x") === "http://a.com/x")
    assert(c("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(c("https://a.com:80/x") === "https://a.com:80/x") // 80 is not https default
    // fragment drops; trailing slash (one) strips; bare '/' empties
    assert(c("https://a.com/x#frag") === "https://a.com/x")
    assert(c("https://a.com/") === "https://a.com")
    assert(c("https://a.com/x//") === "https://a.com/x/")
    // tracking params drop, others keep order; emptied query drops '?'
    assert(c("https://a.com/x?utm_source=s&id=1&utm_medium=m&b=2")
      === "https://a.com/x?id=1&b=2")
    assert(c("https://a.com/x?fbclid=f") === "https://a.com/x")
    assert(c("https://a.com/x?GCLID=g&k=v") === "https://a.com/x?k=v")
    // query is NOT a path: its trailing slash survives
    assert(c("https://a.com/x?p=a/") === "https://a.com/x?p=a/")
    // userinfo case is preserved (fetch-significant); host after the
    // LAST '@' still folds
    assert(c("https://User:Pw@A.com/x") === "https://User:Pw@a.com/x")
    assert(c("http://A@B@Host.COM/x") === "http://A@B@host.com/x")
    // no percent-decoding; non-http unchanged
    assert(c("https://a.com/x%2Fy") === "https://a.com/x%2Fy")
    assert(c("ftp://a.com/X/") === "ftp://a.com/X/")
    assert(c("not a url") === "not a url")
    // the dedup composition: three spellings, one canonical row, min id
    import spark.implicits._
    val docs = Seq(
      (5L, "see https://Dup.Example.com/page/1/"),
      (3L, "see https://dup.example.com/page/1?utm_source=x"),
      (9L, "see https://DUP.example.com/page/1#top done"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.urlDedup(docs).collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "https://dup.example.com/page/1")
    assert(out.head.getLong(1) === 3L && out.head.getLong(2) === 3L)
  }

  test("bucketed URL store: spellings collapse across corpus/batch; store side exchange-free; absorb + replay") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import graft.operators.Dedup
    import spark.implicits._
    val corpus = Seq(
      (1L, "a https://Known.Example.com/p/1/"),
      (2L, "b https://known.example.com/p/2#frag"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "c https://known.example.com/p/1?utm_source=x"), // known under another spelling
      (11L, "d https://known.example.com/p/3"),              // novel
      (12L, "e https://KNOWN.example.com/p/3/"),             // batch-dup of 11's page
      (13L, "f no url here at all"))
      .toDF("doc_id", "text")
    val tbl = "url_store_spec"
    Dedup.dropClusterStore(spark, tbl) // generic managed-table sweep
    TextAnalysis.writeUrlStore(corpus, tbl, buckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val kept = rows(TextAnalysis.incrementalUrlDedup(spark, tbl, batch, absorb = false))
    assert(kept === Set((11L, "https://known.example.com/p/3")),
      "only the novel page's first holder survives")
    // plan pin: the anti-join's store side reads pre-partitioned
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      val df = TextAnalysis.incrementalUrlDedup(spark, tbl, batch, absorb = false)
      val smj = df.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }
        .getOrElse(fail("expected a sort-merge anti-join against the URL store:\n" +
          df.queryExecution.executedPlan.toString))
      assert(smj.right.collectFirst { case e: ShuffleExchangeLike => e }.isEmpty,
        s"store side must read pre-partitioned by bucket:\n${smj.right}")
    }
    // absorb + replay idempotence
    assert(rows(TextAnalysis.incrementalUrlDedup(spark, tbl, batch))
      === Set((11L, "https://known.example.com/p/3")))
    val n1 = spark.table(tbl).count()
    assert(TextAnalysis.incrementalUrlDedup(spark, tbl, batch).collect().isEmpty,
      "a replayed batch's URLs are all known")
    assert(spark.table(tbl).count() === n1, "replay must not grow the URL store")
  }

  test("SQL surface: html_text / link_density registered") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, "<p>a &amp; b</p><a>z</a>")).toDF("id", "h").createOrReplaceTempView("htmlv")
    val r = spark.sql(
      "SELECT html_text(h) AS t, round(link_density(h), 3) AS d FROM htmlv").head()
    assert(r.getString(0) === "a & b\nz")
    assert(r.getDouble(1) === 0.25) // z = 1 link char; visible = a,&,b,z = 4
    assert(spark.sql("SELECT html_links('<a href=\"/u\">x</a>') AS l")
      .head().getSeq[String](0) === Seq("/u"))
  }
}
