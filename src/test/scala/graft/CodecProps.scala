package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.operators.{Multimodal, TextAnalysis}

/** ScalaCheck properties for the real codecs and the span kernel (pure
  * JVM — no Spark session): lossless round trips on ARBITRARY payloads
  * (not just the example fixtures), and the regex span kernel agreeing
  * with a direct `java.util.regex` reference on random text.
  */
object CodecProps extends Properties("Multimodal.codecs") {

  property("png round-trips any pixel raster losslessly") = {
    val gen = for {
      w <- Gen.choose(1, 16)
      h <- Gen.choose(1, 16)
      px <- Gen.listOfN(w * h, Gen.choose(Int.MinValue, Int.MaxValue))
    } yield (w, h, px.map(p => 0xff000000 | (p & 0xffffff)).toArray)
    Prop.forAll(gen) { case (w, h, px) =>
      val d = Multimodal.ImageCodec.decode(
        Multimodal.ImageCodec.encodePng(w, h, px)).get
      d.width == w && d.height == h && d.argb.toSeq == px.toSeq
    }
  }

  property("nearest-neighbor resize only ever emits source pixels") = {
    val gen = for {
      w <- Gen.choose(2, 12); h <- Gen.choose(2, 12)
      ow <- Gen.choose(1, 12); oh <- Gen.choose(1, 12)
      px <- Gen.listOfN(w * h, Gen.choose(0, 0xffffff))
    } yield (w, h, ow, oh, px.map(0xff000000 | _).toArray)
    Prop.forAll(gen) { case (w, h, ow, oh, px) =>
      val small = Multimodal.ImageCodec.resizeNearest(
        Multimodal.ImageCodec.Decoded(w, h, 3, px), ow, oh)
      val src = px.toSet
      small.argb.length == ow * oh && small.argb.forall(src.contains)
    }
  }

  property("wav round-trips any PCM16 sample sequence losslessly") = {
    val gen = for {
      ch <- Gen.choose(1, 2)
      frames <- Gen.choose(1, 200)
      s <- Gen.listOfN(ch * frames,
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort))
    } yield (ch, s.toArray)
    Prop.forAll(gen) { case (ch, samples) =>
      val d = Multimodal.AudioCodec.decode(
        Multimodal.AudioCodec.encodeWav(8000f, ch, samples)).get
      d.channels == ch && d.samples.toSeq == samples.toSeq
    }
  }

  property("regexp span kernel == java.util.regex reference on random text") = {
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("a@b.io", "555-010-0042", "10.0.42.7", "123-45-6789",
        "x.y@z.example.com", "...", "@@", "-"))
    val gen = Gen.listOf(word).map(_.mkString(" "))
    Prop.forAll(gen) { text =>
      TextAnalysis.piiPatterns.forall { case (_, pat, _) =>
        val got = graft.functions.PiiKernels
          .spans(org.apache.spark.unsafe.types.UTF8String.fromString(text),
            java.util.regex.Pattern.compile(pat))
        val m = java.util.regex.Pattern.compile(pat).matcher(text)
        val ref = Iterator.continually(m.find()).takeWhile(identity)
          .map(_ => (m.start(), m.end(), m.group())).toSeq
        val gotSeq = (0 until got.numElements()).map { i =>
          val r = got.getStruct(i, 3)
          (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
        }
        gotSeq == ref
      }
    }
  }

  property("avi/dib round-trips any frame stack losslessly (fps, dims, pixels)") = {
    val gen = for {
      w <- Gen.choose(1, 10); h <- Gen.choose(1, 8)
      fps <- Gen.choose(1, 60)
      nf <- Gen.choose(1, 5)
      frames <- Gen.listOfN(nf,
        Gen.listOfN(w * h, Gen.choose(0, 0xffffff).map(0xff000000 | _)).map(_.toArray))
    } yield (w, h, fps, frames)
    Prop.forAll(gen) { case (w, h, fps, frames) =>
      val d = Multimodal.VideoCodec.decode(
        Multimodal.VideoCodec.encodeAvi(w, h, fps, frames)).get
      d.fps == fps.toDouble && d.frames.length == frames.length &&
        d.frames.head.width == w && d.frames.head.height == h &&
        d.frames.zip(frames).forall { case (df, src) => df.argb.toSeq == src.toSeq }
    }
  }

  property("video decode never throws or hangs on arbitrary bytes") = {
    // random payloads, plus adversarial ones that START like an AVI so
    // the chunk walk actually engages before hitting garbage
    val raw = Gen.listOf(Gen.choose(Int.MinValue, Int.MaxValue).map(_.toByte))
      .map(_.toArray)
    val prefixed = raw.map(b => "RIFF    AVI LIST".getBytes("ISO-8859-1") ++ b)
    Prop.forAll(Gen.oneOf(raw, prefixed)) { bytes =>
      // decode must return promptly (None or Some) — an exception or a
      // hang fails the property (timeout via the suite's global limit)
      Multimodal.VideoCodec.decode(bytes)
      true
    }
  }

  // --- crafted-payload pins: each of these once escaped the
  // "a crafted payload can never hang or kill an executor task"
  // contract (r12 ADVICE) -------------------------------------------

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  property("crafted biHeight = Int.MinValue decodes to None, not garbage rows") = {
    // math.abs(Int.MinValue) is still negative — an h == 0 guard alone
    // passes it, making strideL*h negative and the bounds check a no-op
    val base = Multimodal.VideoCodec.encodeAvi(2, 1, 10,
      Seq(Array(0xff102030, 0xff405060)))
    val strfAt = base.indices.find(i => i + 4 <= base.length &&
      new String(base, i, 4, "US-ASCII") == "strf").get
    val patched = base.clone()
    le32(0x80000000L).copyToArray(patched, strfAt + 8 + 8) // biHeight
    Multimodal.VideoCodec.decode(base).isDefined &&
      Multimodal.VideoCodec.decode(patched).isEmpty
  }

  property("crafted 2^30 x 2^30 DIB dims decode to None without allocating") = {
    // strideL * h overflows Long for dims near 2^31; the divide-form
    // bound must reject it BEFORE a multi-GB Array allocation (OOM is
    // an Error, not caught by the Exception catch)
    val base = Multimodal.VideoCodec.encodeAvi(2, 1, 10,
      Seq(Array(0xff102030, 0xff405060)))
    val strfAt = base.indices.find(i => i + 4 <= base.length &&
      new String(base, i, 4, "US-ASCII") == "strf").get
    val patched = base.clone()
    le32(0x40000000L).copyToArray(patched, strfAt + 8 + 4) // biWidth
    le32(0x40000000L).copyToArray(patched, strfAt + 8 + 8) // biHeight
    Multimodal.VideoCodec.decode(patched).isEmpty
  }

  property("50k-deep nested LISTs return None promptly (no StackOverflowError)") = {
    // 12 bytes per nest ≈ 87k deep per MB of payload; unbounded
    // recursion overflows the stack PAST the Exception catch
    var body = Array.empty[Byte]
    var i = 0
    while (i < 50000) {
      body = "LIST".getBytes("US-ASCII") ++ le32(4L + body.length) ++
        "movi".getBytes("US-ASCII") ++ body
      i += 1
    }
    val payload = "RIFF".getBytes("US-ASCII") ++ le32(body.length + 4L) ++
      "AVI ".getBytes("US-ASCII") ++ body
    Multimodal.VideoCodec.decode(payload).isEmpty
  }

  property("movi stream ids parse as HEX: stream 10 serves via '0Adb' chunks") = {
    // the AVI spec encodes the stream number as two hex digits; decimal
    // parsing silently skips every chunk of streams >= 10
    def chunk(tag: String, data: Array[Byte]): Array[Byte] =
      tag.getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ data)
    val strh = new Array[Byte](56)
    "vids".getBytes("US-ASCII").copyToArray(strh, 0)
    le32(1L).copyToArray(strh, 20); le32(10L).copyToArray(strh, 24) // fps 10
    val strf = new Array[Byte](40)
    le32(40L).copyToArray(strf, 0)
    le32(2L).copyToArray(strf, 4); le32(1L).copyToArray(strf, 8) // 2x1
    strf(14) = 24 // bitCount LE low byte
    le32(0L).copyToArray(strf, 16) // BI_RGB
    val vidsStrl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val dummyStrls = Array.fill(10)(list("strl", Array.empty[Byte]))
      .reduce(_ ++ _) // ordinals 0..9; the vids stream lands at 10
    val hdrl = list("hdrl", dummyStrls ++ vidsStrl)
    // one bottom-up BGR frame, stride 8: px0 = (b,g,r), px1, 2 pad bytes
    val dib = Array(0x30, 0x20, 0x10, 0x60, 0x50, 0x40, 0, 0).map(_.toByte)
    val movi = list("movi", chunk("0Adb", dib))
    val bodyAll = hdrl ++ movi
    val payload = "RIFF".getBytes("US-ASCII") ++ le32(bodyAll.length + 4L) ++
      "AVI ".getBytes("US-ASCII") ++ bodyAll
    val d = Multimodal.VideoCodec.decode(payload)
    d.exists(v => v.fps == 10.0 && v.frames.length == 1 &&
      v.frames.head.width == 2 && v.frames.head.height == 1 &&
      v.frames.head.argb.toSeq == Seq(0xff102030, 0xff405060))
  }

  property("mp4 box walk round-trips any synthesized track layout") = {
    val trackGen = Gen.oneOf(
      for {
        w <- Gen.choose(1, 4096); h <- Gen.choose(1, 4096)
        codec <- Gen.oneOf("avc1", "hev1", "mp4v")
      } yield Multimodal.Mp4Codec.TrackSpec("vide", codec, width = w, height = h),
      for {
        rate <- Gen.choose(8000, 48000); ch <- Gen.choose(1, 8)
        codec <- Gen.oneOf("mp4a", "ac-3")
      } yield Multimodal.Mp4Codec.TrackSpec("soun", codec, sampleRate = rate, channels = ch))
    val gen = for {
      ts <- Gen.choose(1L, 1000000L)
      dur <- Gen.choose(0L, 100000L)
      tracks <- Gen.nonEmptyListOf(trackGen).map(_.take(5))
      mdat <- Gen.listOf(Gen.choose(Int.MinValue, Int.MaxValue).map(_.toByte))
    } yield (ts, dur, tracks, mdat.toArray)
    Prop.forAll(gen) { case (ts, dur, tracks, mdat) =>
      val m = Multimodal.Mp4Codec.parseMeta(
        Multimodal.Mp4Codec.encodeMp4(ts, dur, tracks, mdat)).get
      m.brand == "isom" && m.timescale == ts && m.duration == dur &&
        m.tracks.length == tracks.length &&
        m.tracks.zip(tracks).zipWithIndex.forall { case ((got, spec), i) =>
          got.trackId == i + 1 && got.handler == spec.handler &&
            got.codec == spec.codec && got.duration == dur &&
            (if (spec.handler == "vide")
              got.width == spec.width && got.height == spec.height
            else
              got.sampleRate == spec.sampleRate && got.channels == spec.channels)
        }
    }
  }

  property("mp4 parse never throws or hangs on arbitrary bytes") = {
    val raw = Gen.listOf(Gen.choose(Int.MinValue, Int.MaxValue).map(_.toByte))
      .map(_.toArray)
    // adversarial prefix: a valid-looking ftyp so the walk engages
    val prefixed = raw.map(b =>
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++
        Array[Byte](0, 0, 2, 0) ++ b)
    Prop.forAll(Gen.oneOf(raw, prefixed)) { bytes =>
      Multimodal.Mp4Codec.parseMeta(bytes)
      true
    }
  }

  property("mp4 corrupt boxes punt to None, never a wrong answer") = {
    val good = Multimodal.Mp4Codec.encodeMp4(600, 1200,
      Seq(Multimodal.Mp4Codec.TrackSpec("vide", "avc1", width = 64, height = 48)))
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // a box size that escapes the file; a size smaller than its header;
    // a truncated file; and a 100k-deep nested moov (depth cap, no SOE)
    val oversize = good.clone(); be32(0x7fffffffL).copyToArray(oversize, 0)
    val undersize = good.clone(); be32(4L).copyToArray(undersize, 0)
    val truncated = good.take(good.length - 10)
    var nest = Array.empty[Byte]
    var i = 0
    while (i < 100000) {
      nest = be32(8L + nest.length) ++ "moov".getBytes("US-ASCII") ++ nest
      i += 1
    }
    val deep = good.take(24) ++ nest // keep the ftyp, then the bomb
    Multimodal.Mp4Codec.parseMeta(good).isDefined &&
      Multimodal.Mp4Codec.parseMeta(oversize).isEmpty &&
      Multimodal.Mp4Codec.parseMeta(undersize).isEmpty &&
      Multimodal.Mp4Codec.parseMeta(truncated).isEmpty &&
      Multimodal.Mp4Codec.parseMeta(deep).isEmpty
  }

  property("mp4 v1 box layouts, 64-bit largesize, size-to-end, and unknown boxes all parse") = {
    // the encoder emits v0 boxes; real files use v1 (64-bit times),
    // largesize headers, size-0 ("to end of scope") boxes, and carry
    // boxes a metadata pass must skip by size — build those by hand
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, p: Array[Byte]) = be32(p.length + 8L) ++ t.getBytes("US-ASCII") ++ p
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "isom".getBytes)
    // mvhd VERSION 1: 8-byte creation/modification/duration
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(90000) ++ be64(123456789L) ++ be32(0x00010000L) ++ be16(0x0100) ++
      new Array[Byte](2 + 8 + 36 + 24) ++ be32(2))
    // tkhd VERSION 1 with width/height as 16.16
    val tkhd = box("tkhd", Array[Byte](1, 0, 0, 3) ++ be64(0) ++ be64(0) ++
      be32(7) ++ be32(0) ++ be64(123456789L) ++ new Array[Byte](8 + 8) ++
      new Array[Byte](36) ++ be32(1920L << 16) ++ be32(1080L << 16))
    val mdhd = box("mdhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(90000) ++ be64(123456789L) ++ be16(0x55c4) ++ be16(0))
    val hdlr = box("hdlr", new Array[Byte](8) ++ "vide".getBytes ++ new Array[Byte](13))
    val entry = be32(86) ++ "hev1".getBytes ++ new Array[Byte](6) ++ be16(1) ++
      new Array[Byte](16) ++ be16(1920) ++ be16(1080) ++ new Array[Byte](50)
    val stsd = box("stsd", be32(0) ++ be32(1) ++ entry)
    val stbl = box("stbl", stsd)
    // an unknown box interposed everywhere a walker visits
    val free = box("free", Array.fill(17)(0x5a.toByte))
    val mdia = box("mdia", mdhd ++ free ++ hdlr ++ box("minf", free ++ stbl))
    val trak = box("trak", free ++ tkhd ++ mdia)
    val moovPayload = free ++ mvhd ++ trak
    // moov with a 64-BIT LARGESIZE header (size slot = 1)
    val moov = be32(1) ++ "moov".getBytes ++ be64(16L + moovPayload.length) ++ moovPayload
    // trailing mdat with size 0 = "extends to end of file"
    val mdat = be32(0) ++ "mdat".getBytes ++ Array.fill(9)(1.toByte)
    val m = Multimodal.Mp4Codec.parseMeta(ftyp ++ moov ++ mdat).get
    m.brand == "isom" && m.timescale == 90000L && m.duration == 123456789L &&
      m.tracks.length == 1 && {
        val t = m.tracks.head
        t.trackId == 7L && t.handler == "vide" && t.codec == "hev1" &&
          t.width == 1920 && t.height == 1080 && t.duration == 123456789L
      }
  }

  property("luhn kernel == arithmetic reference on arbitrary digit strings") = {
    val gen = for {
      n <- Gen.choose(0, 24)
      ds <- Gen.listOfN(n, Gen.choose(0, 9))
      sep <- Gen.oneOf("", " ", "-")
    } yield (ds, sep)
    Prop.forAll(gen) { case (ds, sep) =>
      val s = ds.mkString(sep)
      val got = graft.functions.PiiKernels.luhnValid(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val sum = ds.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum
      got == (ds.length >= 12 && ds.length <= 19 && sum % 10 == 0)
    }
  }
}
