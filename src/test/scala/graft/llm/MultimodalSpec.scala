package graft.llm

import graft.SparkSpec
import Multimodal.{DecodedRow, MediaRow}

/** Pins the REAL image-decode path: the PNG payloads are genuine PNG
  * files, and the decoder's width/height/brightness must equal the
  * values computed straight from the generator's pixel formula — i.e.
  * the javax.imageio encode→decode round-trip is lossless and the
  * pixel scan reads what was written.
  */
class MultimodalSpec extends SparkSpec {

  /** Independent recomputation of pngFor's dims and mean brightness
    * from the pixel formula (never touches the codec). */
  private def expected(id: Long): (Int, Int, Double) = {
    val w = 8 + (id % 24).toInt
    val h = 8 + ((id / 7) % 24).toInt
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sum += ((id * 31 + x * 7 + y * 13) % 256) +
        ((id * 17 + x * 11 + y * 3) % 256) +
        ((id * 5 + x * 13 + y * 29) % 256)
    }
    (w, h, sum.toDouble / (w.toLong * h * 3 * 255))
  }

  test("pngFor emits a real PNG; decode reads exact dims and brightness") {
    for (id <- Seq(0L, 5L, 70L, 123L, 495L)) {
      val png = Multimodal.pngFor(id)
      // PNG magic bytes: a genuine file, not a fake container
      assert(png.take(8).map(_ & 0xff).toSeq ==
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
        s"doc $id payload is not a PNG")
      val (w, h, bright) = expected(id)
      val d = Multimodal.decode(MediaRow(id, png, "image/png", png.length.toLong))
      assert(d == DecodedRow(id, w, h, 1, bright),
        s"doc $id: got $d, want ($w x $h, $bright)")
    }
  }

  test("multimodal_decode: image rows decode from pixels, others use the stub") {
    val sf = "/root/testdata/sf0.001"
    val rows = Multimodal.queries("multimodal_decode")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    assert(rows.nonEmpty)
    val (imgs, stubs) = rows.partition(_._1 % 5 == 0)
    assert(imgs.nonEmpty && stubs.nonEmpty)
    imgs.foreach { case (id, (w, h, frames, bright)) =>
      val (ew, eh, eb) = expected(id)
      assert((w, h, frames, bright) == (ew, eh, 1, eb), s"doc $id")
    }
    // stub dims start at 64; real PNGs cap at 31 — the two branches
    // are disjoint and both present
    assert(imgs.values.forall(v => v._1 <= 31 && v._2 <= 31))
    assert(stubs.values.forall(v => v._1 >= 64 && v._2 >= 64))
    stubs.foreach { case (id, v) =>
      assert(v._4 >= 0.0 && v._4 <= 1.0, s"doc $id brightness out of range")
    }
  }

  test("multimodal_feature_stats aggregates the real-decoded image rows") {
    val sf = "/root/testdata/sf0.001"
    val rows = Multimodal.queries("multimodal_feature_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2).toLong, r.getInt(3).toLong,
          r.getLong(4))).toMap
    val png = rows("image/png")
    // image rows: min/max width must sit inside the generator's 8..31
    // range and every image contributes exactly one frame
    assert(png._2 >= 8L && png._3 <= 31L)
    assert(png._4 == png._1, "n_frames must equal n_media for stills")
    assert(rows.keys.count(_.startsWith("application/x-")) > 0)
  }

  test("phash dedup finds every planted retouched twin within 1 bit") {
    val sf = "/root/testdata/sf0.001"
    val pairs = Multimodal.queries("multimodal_phash_dups")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val planted = (0L until 500L)
      .filter(id => id % 35 == 0 && id % 5 == 0)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val d = pairs.get((id, id + Multimodal.PlantBase))
      assert(d.exists(_ <= 1L),
        s"planted twin of $id missing or too far: $d")
    }
  }

  test("banded phash pairs equal the brute-force popcount scan") {
    val sf = "/root/testdata/sf0.001"
    val sigs = Multimodal.phashTable(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(sigs.nonEmpty)
    val brute = (for {
      (k1, h1) <- sigs; (k2, h2) <- sigs
      if k1 < k2 &&
        java.lang.Long.bitCount(h1 ^ h2) <= Multimodal.MaxPhashDist
    } yield (k1, k2, java.lang.Long.bitCount(h1 ^ h2).toLong)).toSet
    val blocked = Multimodal.queries("multimodal_phash_dups")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked === brute)
  }
}
