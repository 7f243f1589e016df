package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-corpus ingestion: WARC (ISO 28500) and JSONL — the two formats a
  * real crawl pipeline starts from, upstream of everything else in the
  * engine (the `documents` table the curation surface consumes is what
  * these readers PRODUCE). The reference has no scan path at all
  * (hnsw.cc:336-346 synthesizes data in-process); this is
  * mandate-extension for the LLM-training-data pipeline.
  *
  * Scale design:
  *  - WARC files do not split mid-file (records are length-framed, and
  *    the CommonCrawl layout gzips each record as its own member — a
  *    byte offset inside a file is unreadable without an index), so the
  *    unit of parallelism is the SEGMENT FILE, exactly how every
  *    published WARC processor shards. Real crawls ship ~1 GiB segments
  *    in the tens of thousands per snapshot: at 100 TB that is ~100k
  *    independent file-tasks — more than any executor count needs. The
  *    scan is `binaryFile` (whole-file rows) into batched
  *    `mapPartitions` ([[graft.operators.Multimodal.Mp4Codec]]
  *    discipline): shuffle-free, embarrassingly parallel.
  *  - parsing is a single forward pass per file with magic-byte resync:
  *    a truncated/corrupt record skips to the next `WARC/` magic
  *    instead of poisoning the file (a crawl ALWAYS contains damage).
  *  - JSONL reads under an EXPLICIT schema contract — schema inference
  *    at 100 TB is a second full pass over the corpus before the first
  *    useful byte; `mode=PERMISSIVE` + corrupt-record column quarantines
  *    damaged lines instead of failing the job.
  */
object WarcCodec {

  /** One parsed WARC record: the named headers a pipeline consumes plus
    * the raw payload block. `targetUri` is null for record types that
    * carry none (warcinfo).
    */
  case class WarcRecord(warcType: String, targetUri: String, warcDate: String,
                        recordId: String, contentType: String,
                        payload: Array[Byte])

  // ---------------------------------------------------------------
  // encode — the synthesis/fixture side (deterministic, from-spec)
  // ---------------------------------------------------------------

  /** Serialize one record per ISO 28500 §4: version line, named headers,
    * CRLF, `Content-Length` payload octets, CRLF CRLF block end.
    */
  def encodeRecord(warcType: String, targetUri: Option[String], warcDate: String,
                   recordId: String, contentType: String,
                   payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(160)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    sb.append("WARC-Date: ").append(warcDate).append("\r\n")
    targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append("\r\n"))
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head, 0, head.length)
    out.write(payload, 0, payload.length)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** One gzip member per record — the CommonCrawl `.warc.gz` layout
    * (members concatenate into one valid multi-member gzip stream).
    */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(record); gz.finish(); gz.close()
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // decode
  // ---------------------------------------------------------------

  private val Magic = "WARC/".getBytes("UTF-8")

  def isGzip(b: Array[Byte]): Boolean =
    b.length > 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Inflate a (possibly multi-member) gzip stream — JDK
    * `GZIPInputStream` reads concatenated members transparently, which
    * is exactly the per-record-member WARC layout.
    */
  def gunzipMembers(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(b), 64 * 1024)
    val out = new ByteArrayOutputStream(math.max(64, b.length * 3))
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Bounded CRLF line read: returns (line-without-terminator, next pos)
    * or null past `limit` — headers are small; an unterminated multi-MB
    * "line" is damage, not a header.
    */
  private def readLine(b: Array[Byte], pos: Int, limit: Int): (String, Int) = {
    var i = pos
    val max = math.min(b.length, limit)
    while (i < max && b(i) != '\n') i += 1
    if (i >= max) return null
    val end = if (i > pos && b(i - 1) == '\r') i - 1 else i // tolerate bare LF
    (new String(b, pos, end - pos, "UTF-8"), i + 1)
  }

  /** Parse one record headed at `pos` (which must point at `WARC/`).
    * Returns the record and the position just past its payload, or None
    * when the block is damaged (bad version, malformed header, missing
    * or unparseable Content-Length, truncated payload) — the caller
    * resyncs at the next magic.
    */
  private def parseOne(b: Array[Byte], pos: Int): Option[(WarcRecord, Int)] = {
    val headerLimit = pos + 64 * 1024 // spec headers are tiny; bound the scan
    val first = readLine(b, pos, headerLimit)
    if (first == null || !first._1.startsWith("WARC/")) return None
    var p = first._2
    var warcType: String = null; var uri: String = null; var date: String = null
    var recId: String = null; var cType: String = null; var cLen = -1L
    var line = readLine(b, p, headerLimit)
    while (line != null && line._1.nonEmpty) {
      val s = line._1
      val colon = s.indexOf(':')
      if (colon <= 0) return None // malformed named field
      val name = s.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
      val value = s.substring(colon + 1).trim
      name match {
        case "warc-type"       => warcType = value
        case "warc-target-uri" => uri = value
        case "warc-date"       => date = value
        case "warc-record-id"  => recId = value
        case "content-type"    => cType = value
        case "content-length"  =>
          cLen = try value.toLong catch { case _: NumberFormatException => -1L }
        case _ => // unknown headers are legal; skip
      }
      p = line._2
      line = readLine(b, p, headerLimit)
    }
    if (line == null) return None                 // headers never terminated
    p = line._2                                   // past the blank line
    if (warcType == null || cLen < 0 || p + cLen > b.length) return None
    val payload = java.util.Arrays.copyOfRange(b, p, p + cLen.toInt)
    Some((WarcRecord(warcType, uri, date, recId, cType, payload), p + cLen.toInt))
  }

  /** All parseable records of one WARC file (gzip-transparent). Damage
    * anywhere — corrupt gzip, truncated record, garbage between records
    * — never throws and never hides the records that ARE intact.
    */
  def parseAll(raw: Array[Byte]): Vector[WarcRecord] = {
    val bytes =
      if (isGzip(raw)) try gunzipMembers(raw) catch { case _: Exception => Array.empty[Byte] }
      else raw
    val out = Vector.newBuilder[WarcRecord]
    var pos = indexOf(bytes, Magic, 0)
    while (pos >= 0) {
      parseOne(bytes, pos) match {
        case Some((rec, next)) => out += rec; pos = indexOf(bytes, Magic, next)
        case None              => pos = indexOf(bytes, Magic, pos + Magic.length)
      }
    }
    out.result()
  }

  // ---------------------------------------------------------------
  // HTTP payload (application/http; msgtype=response)
  // ---------------------------------------------------------------

  /** The response half a crawler stores: status code, media type
    * (Content-Type up to any `;` parameter, lowercased), and the body
    * octets after the header block.
    */
  case class HttpResponse(status: Int, mime: String, body: Array[Byte])

  def parseHttpResponse(p: Array[Byte]): Option[HttpResponse] = {
    val limit = math.min(p.length, 64 * 1024)
    val status = readLine(p, 0, limit)
    if (status == null) return None
    val parts = status._1.split(" ", 3)
    if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
    val code = try parts(1).toInt catch { case _: NumberFormatException => return None }
    var pos = status._2
    var mime = ""
    var line = readLine(p, pos, limit)
    while (line != null && line._1.nonEmpty) {
      val s = line._1
      val colon = s.indexOf(':')
      if (colon > 0 &&
          s.substring(0, colon).trim.equalsIgnoreCase("content-type")) {
        val v = s.substring(colon + 1).trim
        val semi = v.indexOf(';')
        mime = (if (semi < 0) v else v.substring(0, semi)).trim
          .toLowerCase(java.util.Locale.ROOT)
      }
      pos = line._2
      line = readLine(p, pos, limit)
    }
    if (line == null) return None // header block never terminated
    Some(HttpResponse(code, mime, java.util.Arrays.copyOfRange(p, line._2, p.length)))
  }
}

/** DataFrame surface over [[WarcCodec]] plus the JSONL documents path. */
object Warc {

  val recordSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("record_ix", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** One row per parseable WARC record of every file row in `files`
    * (`path` string + `content` binary — the `binaryFile` shape).
    * Shuffle-free batched `mapPartitions`; corrupt records skip.
    */
  def records(files: DataFrame, batchSize: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(recordSchema)
    files.select(col("path").cast("string"), col("content")).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val path = r.getString(0)
          val recs =
            try WarcCodec.parseAll(r.getAs[Array[Byte]](1))
            catch { case _: Exception => Vector.empty }
          recs.iterator.zipWithIndex.map { case (w, ix) =>
            Row(path, ix, w.warcType, w.targetUri, w.warcDate, w.recordId,
              w.contentType, w.payload.length.toLong, w.payload)
          }
        }
      }
    }(enc)
  }

  /** Read WARC segment files (`.warc` / `.warc.gz`, glob accepted) into
    * the per-record relation. The whole-file `binaryFile` scan is the
    * correct split unit — see the object doc.
    */
  def read(spark: SparkSession, glob: String, batchSize: Int = 4): DataFrame =
    records(spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content")), batchSize)

  val responseSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_ts", StringType, nullable = true),
    StructField("status", IntegerType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("body", BinaryType, nullable = false)))

  /** The crawl's fetched pages: each `response` record's HTTP payload
    * split into status/mime/body. Unparseable payloads skip (damage,
    * again). Narrow `mapPartitions` over [[records]] — still no shuffle
    * end to end from the file scan.
    */
  def responses(recs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(responseSchema)
    recs
      .filter(col("warc_type") === "response" &&
        col("content_type").startsWith("application/http"))
      .select("url", "warc_date", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          WarcCodec.parseHttpResponse(r.getAs[Array[Byte]](2)).map { h =>
            Row(r.getString(0), r.getString(1), h.status, h.mime, h.body)
          }
        }
      }(enc)
  }

  /** Crawl-exchange audit: each RESPONSE joined to its REQUEST record
    * by (target URI, capture timestamp) — the fetch-QA relation a
    * crawl pipeline audits (an unpaired response signals a truncated
    * capture session or an out-of-band fetch, e.g. embedded media
    * pulled without a logged request). One equi-join on the narrow
    * `(url, ts)` key; payload bytes are column-pruned out of the
    * request side entirely.
    */
  def exchanges(recs: DataFrame): DataFrame = {
    val reqs = recs.filter(col("warc_type") === "request")
      .select(col("url").as("r_url"), col("warc_date").as("r_ts")).distinct()
    responses(recs)
      .select(col("url"), col("warc_ts"), col("status"), col("mime"),
        length(col("body")).as("body_len"))
      .join(reqs, col("url") === col("r_url") && col("warc_ts") === col("r_ts"), "left")
      .select(col("url"), col("warc_ts"), col("status"), col("mime"),
        col("body_len"), col("r_url").isNotNull.as("paired"))
  }

  /** The crawl-to-curation bridge: 200-status `text/html` responses as
    * `(url, canonical_url, warc_ts, text)` rows — extracted through the
    * [[graft.functions.HtmlKernels]] codegen pass, canonicalized
    * through [[graft.functions.UrlKernels]]. Output composes directly
    * into `CorpusPipeline.curate` (after assigning a doc id) — the
    * equality against a pre-extracted documents table is spec-pinned.
    */
  def htmlDocuments(resp: DataFrame): DataFrame =
    resp.filter(col("status") === 200 && col("mime") === "text/html")
      .select(
        col("url"),
        graft.operators.TextAnalysis.canonicalUrl(col("url")).as("canonical_url"),
        col("warc_ts"),
        graft.operators.TextAnalysis.htmlText(decode(col("body"), "UTF-8")).as("text"))

  // ---------------------------------------------------------------
  // Deterministic synthesis: the documents table AS a crawl
  // ---------------------------------------------------------------
  // Every field below is a pure formula of (doc_id, text, n_chars), so
  // DuckDB oracles the PARSED output closed-form while the engine runs
  // the real byte-level codec — the Mp4Codec fixture discipline.

  def urlOf(id: Long): String =
    s"http://Site${id % 5}.Example.com/doc/$id?utm_source=synth"

  def dateOf(id: Long): String =
    f"2023-01-${id % 28 + 1}%02dT00:00:${id % 60}%02dZ"

  val warcinfoPayload = "software: graft synthetic warc\r\n"

  def requestPayload(id: Long): String =
    s"GET /doc/$id HTTP/1.1\r\nHost: site${id % 5}.example.com\r\n\r\n"

  def responsePayload(text: String): String = {
    val body = s"<html><body><p>$text</p></body></html>"
    s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body"
  }

  /** The two per-document records (request + response), encoded. */
  def recordsOf(id: Long, text: String): Seq[Array[Byte]] = Seq(
    WarcCodec.encodeRecord("request", Some(urlOf(id)), dateOf(id),
      s"<urn:graft:request:$id>", "application/http; msgtype=request",
      requestPayload(id).getBytes("UTF-8")),
    WarcCodec.encodeRecord("response", Some(urlOf(id)), dateOf(id),
      s"<urn:graft:response:$id>", "application/http; msgtype=response",
      responsePayload(text).getBytes("UTF-8")))

  def warcinfoOf(bucket: Int): Array[Byte] =
    WarcCodec.encodeRecord("warcinfo", None, "2023-01-01T00:00:00Z",
      s"<urn:graft:warcinfo:bucket-$bucket>", "application/warc-fields",
      warcinfoPayload.getBytes("UTF-8"))

  def mediaUrlOf(id: Long): String =
    s"http://Site${id % 5}.Example.com/img/$id.png"

  /** A fetched IMAGE response record: HTTP headers + binary body — the
    * multimodal half of a real crawl. The payload is the doc's base
    * dHash-fixture PNG ([[graft.operators.Multimodal.dhashBasePng]]),
    * so the crawled image's perceptual hash is the same closed-form
    * SQL formula the image queries oracle against.
    */
  def mediaRecordOf(id: Long): Array[Byte] = {
    val body = graft.operators.Multimodal.dhashBasePng(id)
    val head = (s"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
    WarcCodec.encodeRecord("response", Some(mediaUrlOf(id)), dateOf(id),
      s"<urn:graft:media:$id>", "application/http; msgtype=response",
      head ++ body)
  }

  /** Materialize the documents table as `buckets` WARC segment files
    * under `outDir` — each bucket holds a leading `warcinfo` record plus
    * request/response pairs for its docs in doc_id order; ODD buckets
    * write the per-record-gzip-member `.warc.gz` layout so one corpus
    * exercises both codec paths. Idempotent per (row count, buckets)
    * via a marker file; tasks write their own segment files (one per
    * bucket — the synthesis is a fixture, the READER is the operator
    * under test). Returns the glob to read back.
    */
  def ensureWarcFiles(documents: DataFrame, outDir: String, buckets: Int = 8,
                      withImages: Boolean = false): String = {
    val n = documents.count()
    val marker = new java.io.File(outDir, "_GRAFT_WARC")
    val stamp = s"n=$n;buckets=$buckets;img=$withImages;v=2"
    val glob = s"$outDir/*.warc*"
    if (marker.exists() &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == stamp)
      return glob
    val dirF = new java.io.File(outDir)
    if (dirF.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dirF)
    }
    dirF.mkdirs()
    val absOut = dirF.getAbsolutePath
    documents.select(col("doc_id"), col("text"))
      .withColumn("bucket", (col("doc_id") % buckets).cast("int"))
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions("doc_id")
      .foreachPartition { (rows: Iterator[Row]) =>
        // a partition may hold several buckets (hash placement); group
        // so each bucket's file is written whole, in doc_id order
        rows.toSeq.groupBy(_.getInt(2)).foreach { case (b, docs) =>
          val gz = b % 2 == 1
          val out = new ByteArrayOutputStream(1 << 16)
          def put(rec: Array[Byte]): Unit = {
            val bs = if (gz) WarcCodec.gzipMember(rec) else rec
            out.write(bs, 0, bs.length)
          }
          put(warcinfoOf(b))
          docs.foreach { r =>
            val id = r.getLong(0)
            recordsOf(id, r.getString(1)).foreach(put)
            // mixed-media corpus: every 4th doc's crawl also fetched
            // an image — one crawl, two modalities
            if (withImages && id % 4 == 0) put(mediaRecordOf(id))
          }
          val name = f"segment-$b%05d.warc" + (if (gz) ".gz" else "")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(absOut, name), out.toByteArray)
        }
      }
    java.nio.file.Files.write(marker.toPath, stamp.getBytes("UTF-8"))
    glob
  }

  // ---------------------------------------------------------------
  // JSONL documents path
  // ---------------------------------------------------------------

  /** The documents schema CONTRACT for JSONL corpora. Explicit on every
    * read: inference is a second full pass at 100 TB, and a drifting
    * inferred type (a doc_id that happens to be all-numeric-strings in
    * one shard) silently forks the pipeline.
    */
  val documentsJsonSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** Read a JSONL documents corpus under the explicit contract. The
    * scan is the TEXT source (codec-transparent, splittable for
    * uncompressed files by line framing) with `from_json` doing the
    * parse in codegen — a damaged line parses to a null struct and is
    * quarantined as `_corrupt_record` (kept when `keepCorrupt`, dropped
    * otherwise) instead of failing the scan. Deliberately NOT
    * `spark.read.json`: that source refuses plans that touch only its
    * corrupt-record column, which is exactly what a quarantine audit
    * (`count where corrupt`) does.
    */
  /** Shared parse projection: one text `value` column → the contract
    * columns (+ quarantine). PERMISSIVE from_json fills a
    * corrupt-record field (the raw line) on malformed input rather
    * than returning null — declare one in the parse schema so damage
    * is detectable per row.
    */
  private def parseJsonLines(lines: DataFrame, schema: StructType,
                             keepCorrupt: Boolean): DataFrame = {
    val withCorrupt = schema.add(StructField("_corrupt_record", StringType, nullable = true))
    val parsed = lines
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
    if (keepCorrupt)
      parsed.select(withCorrupt.fieldNames.map(f => col(s"r.$f")): _*)
    else
      parsed.filter(col("r._corrupt_record").isNull)
        .select(schema.fieldNames.map(f => col(s"r.$f")): _*)
  }

  def readJsonl(spark: SparkSession, glob: String,
                schema: StructType = documentsJsonSchema,
                keepCorrupt: Boolean = false): DataFrame =
    parseJsonLines(spark.read.text(glob), schema, keepCorrupt)

  /** STREAMING JSONL ingestion: the same contract-schema parse over the
    * file-streaming text source — new shards landing in `glob` become
    * micro-batches, damaged lines quarantine instead of killing the
    * query, and the output composes directly into
    * [[graft.streaming.StreamingCuration.curateStream]] (add an event
    * ts and a watermark). Batch ≡ streaming is structural: both paths
    * run the SAME [[parseJsonLines]] projection (spec-pinned).
    */
  def readJsonlStream(spark: SparkSession, glob: String,
                      schema: StructType = documentsJsonSchema,
                      keepCorrupt: Boolean = false): DataFrame =
    parseJsonLines(spark.readStream.text(glob), schema, keepCorrupt)

  /** Materialize the documents table as JSONL text files: half the
    * rows into a plain directory, half gzip — one corpus, both codec
    * paths. Idempotent via marker. Returns the glob covering both.
    */
  def ensureJsonlFiles(documents: DataFrame, outDir: String): String = {
    val n = documents.count()
    val marker = new java.io.File(outDir, "_GRAFT_JSONL")
    val stamp = s"n=$n;v=1"
    val glob = s"$outDir/{plain,gz}"
    if (marker.exists() &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == stamp)
      return glob
    val line = to_json(struct(
      col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")))
    documents.filter(col("doc_id") % 2 === 0).select(line)
      .write.mode("overwrite").text(s"$outDir/plain")
    documents.filter(col("doc_id") % 2 === 1).select(line)
      .write.mode("overwrite").option("compression", "gzip").text(s"$outDir/gz")
    java.nio.file.Files.write(marker.toPath, stamp.getBytes("UTF-8"))
    glob
  }
}
