package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic, zero-dependency HTML/markup text extraction — the
  * CCNet/trafilatura-shaped stage UPSTREAM of every text-curation
  * operator in this engine: a web corpus starts at markup, the lang/
  * quality/dedup pipeline starts at plain text. One single-forward-pass
  * character scan per row (no regex backtracking, no recursion — every
  * branch advances the cursor, so adversarial markup cannot hang it),
  * shared by the interpreted and generated paths of [[HtmlTextExpr]] /
  * [[LinkDensityExpr]].
  *
  * Extraction semantics (exact, so the declared query can oracle
  * against closed-form expected text):
  *  - `<!-- … -->` comments are dropped (unterminated → drop to end);
  *  - `<![CDATA[ … ]]>` content is kept VERBATIM (markers stripped,
  *    no entity decode inside — XML semantics);
  *  - `<script>`/`<style>` elements are dropped INCLUDING content
  *    (case-insensitive; unterminated → drop to end);
  *  - block-level tags (p, div, br, li, table/tr/td, h1-h6, html/head/
  *    body/title, section/article/nav/…) contribute a line break,
  *    open and close alike; all other tags (a, span, b, em, …) are
  *    stripped; a `<` not starting a tag is literal text;
  *  - entities decode: the FULL HTML 4.01 named table (Latin-1,
  *    Greek/symbol, special blocks — see [[HtmlKernels.namedEntities]];
  *    &nbsp; → a plain space) and numeric &#NNN; / &#xHH;; anything
  *    unrecognized (incl. HTML5-only names) stays literal;
  *  - whitespace normalizes: source whitespace (incl. newlines —
  *    HTML renders them as spaces) collapses to single spaces within a
  *    line, lines trim, empty lines drop, lines join with `\n`.
  *
  * Link density — the classic boilerplate signal (nav bars and footer
  * link farms are mostly anchor text) — is the fraction of visible
  * NON-WHITESPACE characters that sit inside `<a>` elements, over the
  * raw (pre-collapse) visible stream; 0.0 when nothing is visible.
  */
object HtmlKernels {

  /** The full HTML 4.01 named-entity table (the public W3C list:
    * Latin-1, symbol/Greek, and special blocks — 252 names, plus XML's
    * `apos`), GENERATED where the list is structured: the Latin-1 block
    * is the 96 standard names for code points 160–255 in order. HTML5's
    * extended names degrade gracefully — unknown stays literal, the
    * documented fallback. `nbsp` maps to a plain space (extraction
    * semantics: downstream tokenization wants ' ', and NFKC agrees).
    */
  private[graft] val namedEntities: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](512)
    def put(name: String, cp: Int): Unit = m.put(name, new String(Character.toChars(cp)))
    // Latin-1 block: names for U+00A0..U+00FF, in code-point order
    val latin1 = Array(
      "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
      "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr", "deg",
      "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot", "cedil",
      "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
      "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig",
      "Ccedil", "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute",
      "Icirc", "Iuml", "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc",
      "Otilde", "Ouml", "times", "Oslash", "Ugrave", "Uacute", "Ucirc",
      "Uuml", "Yacute", "THORN", "szlig", "agrave", "aacute", "acirc",
      "atilde", "auml", "aring", "aelig", "ccedil", "egrave", "eacute",
      "ecirc", "euml", "igrave", "iacute", "icirc", "iuml", "eth", "ntilde",
      "ograve", "oacute", "ocirc", "otilde", "ouml", "divide", "oslash",
      "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")
    latin1.zipWithIndex.foreach { case (n, i) => put(n, 160 + i) }
    // Greek block: uppercase U+0391..U+03A9 (no U+03A2), lowercase
    // U+03B1..U+03C9 with final sigma at U+03C2, plus the three symbol
    // variants
    val greekUpper = Array("Alpha", "Beta", "Gamma", "Delta", "Epsilon",
      "Zeta", "Eta", "Theta", "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi",
      "Omicron", "Pi", "Rho")
    greekUpper.zipWithIndex.foreach { case (n, i) => put(n, 0x391 + i) }
    val greekUpper2 = Array("Sigma", "Tau", "Upsilon", "Phi", "Chi", "Psi", "Omega")
    greekUpper2.zipWithIndex.foreach { case (n, i) => put(n, 0x3A3 + i) }
    val greekLower = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
      "omicron", "pi", "rho")
    greekLower.zipWithIndex.foreach { case (n, i) => put(n, 0x3B1 + i) }
    put("sigmaf", 0x3C2)
    val greekLower2 = Array("sigma", "tau", "upsilon", "phi", "chi", "psi", "omega")
    greekLower2.zipWithIndex.foreach { case (n, i) => put(n, 0x3C3 + i) }
    put("thetasym", 0x3D1); put("upsih", 0x3D2); put("piv", 0x3D6)
    // symbol block
    Seq("fnof" -> 402, "bull" -> 8226, "hellip" -> 8230, "prime" -> 8242,
      "Prime" -> 8243, "oline" -> 8254, "frasl" -> 8260, "weierp" -> 8472,
      "image" -> 8465, "real" -> 8476, "trade" -> 8482, "alefsym" -> 8501,
      "larr" -> 8592, "uarr" -> 8593, "rarr" -> 8594, "darr" -> 8595,
      "harr" -> 8596, "crarr" -> 8629, "lArr" -> 8656, "uArr" -> 8657,
      "rArr" -> 8658, "dArr" -> 8659, "hArr" -> 8660, "forall" -> 8704,
      "part" -> 8706, "exist" -> 8707, "empty" -> 8709, "nabla" -> 8711,
      "isin" -> 8712, "notin" -> 8713, "ni" -> 8715, "prod" -> 8719,
      "sum" -> 8721, "minus" -> 8722, "lowast" -> 8727, "radic" -> 8730,
      "prop" -> 8733, "infin" -> 8734, "ang" -> 8736, "and" -> 8743,
      "or" -> 8744, "cap" -> 8745, "cup" -> 8746, "int" -> 8747,
      "there4" -> 8756, "sim" -> 8764, "cong" -> 8773, "asymp" -> 8776,
      "ne" -> 8800, "equiv" -> 8801, "le" -> 8804, "ge" -> 8805,
      "sub" -> 8834, "sup" -> 8835, "nsub" -> 8836, "sube" -> 8838,
      "supe" -> 8839, "oplus" -> 8853, "otimes" -> 8855, "perp" -> 8869,
      "sdot" -> 8901, "lceil" -> 8968, "rceil" -> 8969, "lfloor" -> 8970,
      "rfloor" -> 8971, "lang" -> 9001, "rang" -> 9002, "loz" -> 9674,
      "spades" -> 9824, "clubs" -> 9827, "hearts" -> 9829, "diams" -> 9830)
      .foreach { case (n, cp) => put(n, cp) }
    // special block (markup five + Latin Extended / punctuation)
    Seq("quot" -> 34, "amp" -> 38, "lt" -> 60, "gt" -> 62, "apos" -> 39,
      "OElig" -> 338, "oelig" -> 339, "Scaron" -> 352, "scaron" -> 353,
      "Yuml" -> 376, "circ" -> 710, "tilde" -> 732, "ensp" -> 8194,
      "emsp" -> 8195, "thinsp" -> 8201, "zwnj" -> 8204, "zwj" -> 8205,
      "lrm" -> 8206, "rlm" -> 8207, "ndash" -> 8211, "mdash" -> 8212,
      "lsquo" -> 8216, "rsquo" -> 8217, "sbquo" -> 8218, "ldquo" -> 8220,
      "rdquo" -> 8221, "bdquo" -> 8222, "dagger" -> 8224, "Dagger" -> 8225,
      "permil" -> 8240, "lsaquo" -> 8249, "rsaquo" -> 8250, "euro" -> 8364)
      .foreach { case (n, cp) => put(n, cp) }
    m.put("nbsp", " ") // extraction semantics: a word separator
    m
  }

  private val blockTags: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "title", "p", "div", "br", "hr", "li", "ul",
      "ol", "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
      "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
      "footer", "blockquote", "pre", "form", "nav", "aside", "main", "dl",
      "dt", "dd", "figure", "figcaption").foreach(s.add)
    s
  }

  /** The one-pass result: normalized text + the raw visible-character
    * accounting the link-density signal needs.
    */
  final case class Extract(text: String, linkChars: Int, totalChars: Int)

  def extract(s: UTF8String): Extract = extractStr(s.toString)

  def visibleText(s: UTF8String): UTF8String =
    UTF8String.fromString(extractStr(s.toString).text)

  def linkDensity(s: UTF8String): Double = {
    val e = extractStr(s.toString)
    if (e.totalChars == 0) 0.0 else e.linkChars.toDouble / e.totalChars
  }

  /** The `href` targets of the fragment's anchor tags, in document
    * order — the provenance feed ([[graft.operators.TextAnalysis]]'s
    * URL/domain ops run downstream of this on a web corpus). Raw
    * attribute values (no entity decode — a URL's own escaping is the
    * consumer's business); anchors inside comments/scripts/styles do
    * not count; quoted and unquoted attribute forms both parse.
    */
  def links(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    extractStr(s.toString, out)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** First `href` attribute value of a tag body, null when absent. */
  private def hrefOf(body: String): String = {
    var i = 0
    while (i < body.length - 4) {
      if (body.regionMatches(true, i, "href", 0, 4) &&
          (i == 0 || !Character.isLetterOrDigit(body.charAt(i - 1)))) {
        var j = i + 4
        while (j < body.length && Character.isWhitespace(body.charAt(j))) j += 1
        if (j < body.length && body.charAt(j) == '=') {
          j += 1
          while (j < body.length && Character.isWhitespace(body.charAt(j))) j += 1
          if (j < body.length) {
            val q = body.charAt(j)
            if (q == '"' || q == '\'') {
              val e = body.indexOf(q, j + 1)
              return if (e < 0) body.substring(j + 1) else body.substring(j + 1, e)
            } else {
              var e = j
              while (e < body.length && !Character.isWhitespace(body.charAt(e)) &&
                body.charAt(e) != '>') e += 1
              return body.substring(j, e)
            }
          }
        }
      }
      i += 1
    }
    null
  }

  private def extractStr(str: String,
                         links: scala.collection.mutable.ArrayBuffer[Any] = null)
      : Extract = {
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var linkChars = 0
    var totalChars = 0
    var aDepth = 0
    var i = 0

    def emit(c: Char): Unit = {
      if (Character.isWhitespace(c)) sb.append(' ')
      else {
        sb.append(c)
        totalChars += 1
        if (aDepth > 0) linkChars += 1
      }
    }

    // case-insensitive search for the closing tag of a raw-text element
    // (</script / </style); returns the index after its '>' or n
    def skipRawElement(from: Int, name: String): Int = {
      val target = "</" + name
      var k = from
      while (k >= 0 && k <= n - target.length) {
        k = str.indexOf('<', k)
        if (k < 0 || k > n - target.length) return n
        if (str.regionMatches(true, k, target, 0, target.length)) {
          val gt = str.indexOf('>', k)
          return if (gt < 0) n else gt + 1
        }
        k += 1
      }
      n
    }

    while (i < n) {
      val c = str.charAt(i)
      if (c == '<') {
        if (str.regionMatches(i, "<!--", 0, 4)) {
          val e = str.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (str.regionMatches(i, "<![CDATA[", 0, 9)) {
          val e = str.indexOf("]]>", i + 9)
          val stop = if (e < 0) n else e
          var k = i + 9
          while (k < stop) { emit(str.charAt(k)); k += 1 }
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && {
          val d = str.charAt(i + 1)
          Character.isLetter(d) || d == '/' || d == '!' || d == '?'
        }) {
          // scan for the tag's '>' skipping quoted attribute values
          var j = i + 1
          var gt = -1
          while (j < n && gt < 0) {
            val t = str.charAt(j)
            if (t == '>') gt = j
            else if (t == '"' || t == '\'') {
              val q = str.indexOf(t, j + 1)
              j = if (q < 0) n else q + 1
            } else j += 1
          }
          if (gt < 0) i = n // malformed tag: drop the unterminated tail
          else {
            val body = str.substring(i + 1, gt)
            val closing = body.startsWith("/")
            var k = if (closing) 1 else 0
            val s0 = k
            while (k < body.length && (Character.isLetterOrDigit(body.charAt(k))))
              k += 1
            val name = body.substring(s0, k).toLowerCase(java.util.Locale.ROOT)
            if (!closing && (name == "script" || name == "style")) {
              i = skipRawElement(gt + 1, name)
            } else {
              if (blockTags.contains(name)) sb.append('\n')
              if (name == "a") {
                if (closing) aDepth = math.max(0, aDepth - 1)
                else {
                  if (!body.endsWith("/")) aDepth += 1
                  if (links != null) {
                    val h = hrefOf(body)
                    if (h != null) links += UTF8String.fromString(h)
                  }
                }
              }
              i = gt + 1
            }
          }
        } else { emit('<'); i += 1 }
      } else if (c == '&') {
        val semi = str.indexOf(';', i + 1)
        val decoded: String =
          if (semi < 0 || semi - i > 11) null
          else {
            val ent = str.substring(i + 1, semi)
            if (ent.length >= 2 && ent.charAt(0) == '#')
              try {
                val cp =
                  if (ent.charAt(1) == 'x' || ent.charAt(1) == 'X')
                    Integer.parseInt(ent.substring(2), 16)
                  else Integer.parseInt(ent.substring(1), 10)
                if (Character.isValidCodePoint(cp) && cp > 0)
                  new String(Character.toChars(cp))
                else null
              } catch { case _: NumberFormatException => null }
            else namedEntities.get(ent) // null when unknown → literal
          }
        if (decoded == null) { emit('&'); i += 1 }
        else {
          var k = 0
          while (k < decoded.length) { emit(decoded.charAt(k)); k += 1 }
          i = semi + 1
        }
      } else { emit(c); i += 1 }
    }

    // line-structure normalization: collapse space runs, trim lines,
    // drop empties, join with \n
    val out = new java.lang.StringBuilder(sb.length)
    val line = new java.lang.StringBuilder(80)
    def flushLine(): Unit = {
      // trim trailing space (leading handled by pendingSpace logic)
      var e = line.length
      while (e > 0 && line.charAt(e - 1) == ' ') e -= 1
      if (e > 0) {
        if (out.length > 0) out.append('\n')
        out.append(line, 0, e)
      }
      line.setLength(0)
    }
    var p = 0
    while (p < sb.length) {
      val c = sb.charAt(p)
      if (c == '\n') flushLine()
      else if (c == ' ') {
        if (line.length > 0 && line.charAt(line.length - 1) != ' ') line.append(' ')
      } else line.append(c)
      p += 1
    }
    flushLine()
    Extract(out.toString, linkChars, totalChars)
  }
}

/** `html_text(markup) → string`: the visible text of an HTML fragment
  * per [[HtmlKernels]] — tag strip, script/style/comment removal,
  * entity decode, block-level line structure, whitespace collapse. One
  * static kernel call inside whole-stage codegen.
  */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "html_text"

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    HtmlKernels.visibleText(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HtmlKernels.visibleText($s)")

  override protected def withNewChildInternal(newChild: Expression): HtmlTextExpr =
    copy(child = newChild)
}

/** `html_links(markup) → array<string>`: the fragment's anchor `href`
  * targets in document order ([[HtmlKernels.links]]) — the feed for the
  * URL/domain provenance operators on a markup corpus. Same single-pass
  * kernel and codegen shape as [[HtmlTextExpr]].
  */
case class HtmlLinksExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "html_links"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    HtmlKernels.links(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HtmlKernels.links($s)")

  override protected def withNewChildInternal(newChild: Expression): HtmlLinksExpr =
    copy(child = newChild)
}

/** `link_density(markup) → double`: fraction of visible non-whitespace
  * characters inside `<a>` elements — the boilerplate gate signal
  * (0.0 when the fragment has no visible text). Same kernel, same
  * codegen shape as [[HtmlTextExpr]].
  */
case class LinkDensityExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "link_density"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    HtmlKernels.linkDensity(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HtmlKernels.linkDensity($s)")

  override protected def withNewChildInternal(newChild: Expression): LinkDensityExpr =
    copy(child = newChild)
}
