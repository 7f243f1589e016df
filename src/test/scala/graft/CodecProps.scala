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
}
