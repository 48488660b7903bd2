package graft.llm

import graft.Lineage.LineageOps
import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): image/audio/video travel as
  * opaque `BINARY` columns with typed metadata; decode / feature
  * extraction runs as a partition-wise batch map (`mapPartitions` on a
  * typed Dataset — the Scala analog of `mapInPandas`: one batch per
  * partition, vectorizable inside, schema declared up front).
  *
  * The IMAGE decode path is REAL: `image/png` payloads are genuine PNG
  * files (encoded by `javax.imageio`, which ships in the JDK) and the
  * decoder reads width/height/mean-brightness from actual pixels.
  * Non-image mimes (no audio/video codec in the JDK) fall back to a
  * clearly-marked DETERMINISTIC STUB; the Spark-side plumbing —
  * binary column, metadata struct, partitioning, batch map signature,
  * output schema — is identical on both paths and driver-checked.
  */
object Multimodal extends QuerySuite {

  /** Envelope for an opaque media blob. */
  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String,
      n_bytes: Long)

  /** Byte budget per inference batch. */
  val BatchBudget = 4096L

  /** Decoded-feature schema a real decoder would emit. */
  case class DecodedRow(doc_id: Long, width: Int, height: Int,
      n_frames: Int, brightness: Double)

  /** Deterministic small RGB image for a doc id: dimensions and every
    * pixel are pure functions of the id. */
  private def imgFor(docId: Long): java.awt.image.BufferedImage = {
    val w = 8 + (docId % 24).toInt
    val h = 8 + ((docId / 7) % 24).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((docId * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((docId * 5 + x * 13 + y * 29) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private def toPng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** [[imgFor]] encoded as a REAL PNG via `javax.imageio` — so
    * [[decode]] exercises a genuine codec round-trip (header parse +
    * pixel scan), not a stand-in. */
  private[llm] def pngFor(docId: Long): Array[Byte] = toPng(imgFor(docId))

  /** A NEAR-DUPLICATE of [[pngFor]]: same image with the blue
    * channel's lowest bit flipped at pixel (0,0) — the re-encoded /
    * imperceptibly-retouched copy an image dedup must still catch
    * (the perturbation moves the sampled gray sum by ±1, so at most
    * one dHash bit flips). */
  private[llm] def pngNearFor(docId: Long): Array[Byte] = {
    val img = imgFor(docId)
    img.setRGB(0, 0, img.getRGB(0, 0) ^ 1)
    toPng(img)
  }

  /** REAL image decode for `image/png` payloads (`javax.imageio`, in
    * the JDK — no external codec needed): width/height from the decoded
    * image, brightness = mean over ACTUAL pixels of (r+g+b)/(3·255).
    * Non-image mimes fall back to [[stubDecode]]. */
  private[llm] def decode(m: MediaRow): DecodedRow =
    if (m.mime == "image/png") {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.media))
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      DecodedRow(m.doc_id, w, h, n_frames = 1,
        brightness = sum.toDouble / (w.toLong * h * 3 * 255))
    } else stubDecode(m)

  /** STUB decoder for mimes the JDK has no codec for (audio/video):
    * deterministic pure function of the bytes so results are
    * reproducible; a real implementation would decode `media` (e.g.
    * ffmpeg) in the same batched per-partition shape. */
  private def stubDecode(m: MediaRow): DecodedRow = {
    val len = m.media.length
    val checksum = m.media.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xffffff)
    DecodedRow(
      doc_id = m.doc_id,
      width = 64 + (checksum % 512).toInt,
      height = 64 + ((checksum / 512) % 512).toInt,
      n_frames = 1 + (len % 16),
      brightness = (checksum % 256) / 255.0)
  }

  /** Perceptual-hash geometry: 9×8 grayscale grid → 64 gradient bits;
    * pairs within [[MaxPhashDist]] bits are near-duplicate images.
    * 4 bands × 16 bits: any pair within distance 3 shares at least
    * one untouched band (pigeonhole), so band-blocking is COMPLETE —
    * among buckets under [[PhashMaxBucket]]; pairs whose every shared
    * band lands in a hot bucket are the documented recall trade of
    * the cap (both oracle twins apply it identically). */
  val PhashBands = 4

  /** Hot-bucket occupancy cap for dHash-band candidate generation
    * (the DedupQueries.SrpMaxBucket twin for the image path). */
  val PhashMaxBucket = 64
  val MaxPhashDist = 3L
  /** Planted near-duplicate rows live above this id offset. */
  val PlantBase = 1000000000L

  /** 64-bit difference hash (dHash) from ACTUAL decoded pixels:
    * nearest-sample a 9×8 grayscale grid from the real image, bit
    * (row·8+col) = 1 iff the cell's gray sum exceeds its right
    * neighbor's — the standard retouch/re-encode-robust image
    * fingerprint. */
  private[llm] def dHash(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val g = Array.ofDim[Int](gw, gh)
    var cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < gw) {
        val p = img.getRGB(cx * w / gw, cy * h / gh)
        g(cx)(cy) = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < 8) {
        if (g(cx)(cy) > g(cx + 1)(cy)) bits |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** Image fingerprint table: every 5th doc's PNG (the same rule as
    * [[mixedMediaTable]]) decoded and dHashed map-only; docs divisible
    * by 35 additionally plant a near-duplicate twin at id+[[PlantBase]]
    * so the dedup query always has true positives to find. */
  /** Decode a PNG payload and fingerprint its pixels (executor-side;
    * object-level so the mapPartitions closure captures only the
    * serializable module, never a session). */
  private def hashOf(png: Array[Byte]): Long =
    dHash(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png)))

  private[llm] def phashTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        if (id % 5 != 0) Iterator.empty
        else if (id % 35 == 0)
          Iterator((id, hashOf(pngFor(id))),
            (id + PlantBase, hashOf(pngNearFor(id))))
        else Iterator((id, hashOf(pngFor(id))))
      }).toDF("doc_id", "phash")
  }

  /** The b-th 16-bit band of a 64-bit fingerprint column — the ONE
    * definition both the blocking join and the fingerprint query's
    * output representation share (the pigeonhole completeness proof
    * depends on these being the same bands). */
  private def bandVal(phash: org.apache.spark.sql.Column, b: Int) =
    shiftrightunsigned(phash, 16 * b).bitwiseAND(lit(0xffffL))

  /** Banded near-duplicate pairs over a (doc_id, phash) frame: each
    * hash emits its 4 16-bit bands, candidates share a band value at
    * the same index (complete for distance ≤ 3 by pigeonhole, among
    * non-hot buckets — see [[PhashBands]] on the cap's recall trade),
    * and only candidates pay the exact popcount verify — never an
    * all-pairs scan. */
  private[llm] def phashPairs(sigs: DataFrame): DataFrame =
    phashCandidates(sigs)
      .filter(col("hamming") <= MaxPhashDist)
      .distinct()
      .orderBy("doc_a", "doc_b")

  /** The SATURATION-FREE spelling of [[phashPairs]] (round 15): the
    * 4 × 16-bit band space carries at most PhashBands-independent
    * [[PhashMaxBucket]]·2¹⁶ ≈ 4.2M fingerprints per band — the same
    * carrying-capacity cliff the SRP dedup path hit one decade
    * earlier (r14), one decade above the measured amp1000 point.
    * Unlike SRP, the bands here CANNOT simply widen: the hamming ≤
    * [[MaxPhashDist]] = 3 completeness proof is pigeonhole over 4
    * bands. This variant trades band width for probes instead —
    * 2 bands × 32 bits (capacity [[PhashMaxBucket]]·2³² ≈ 2.7e11)
    * joined MULTI-PROBE: each fingerprint probes its band value plus
    * every 1-bit flip (33 probes/band — the simhashRadiusPairs
    * pattern, Lv et al. VLDB'07) against the BARE capped identity
    * bands. Pigeonhole still closes: 3 flips over 2 bands leave one
    * band differing ≤ 1 bit, which the identity-or-flip probes cover.
    * Volume: 66·n probe rows, each meeting ≤ cap identity rows —
    * ≤ 66·cap·n candidates, linear to 10¹¹ fingerprints. The exact
    * popcount verify runs on candidates only, so over-probing can
    * only cost, never corrupt. A pair is lost only when BOTH its
    * identity buckets are hot in every ≤1-bit band — the cap's
    * documented indistinguishable-pile trade. */
  private[llm] def phashPairsWide(sigs: DataFrame): DataFrame = {
    val wideBands = sigs.select(col("doc_id"), col("phash"),
      explode(array((0 until 2).map(b =>
        struct(lit(b).as("band_idx"),
          shiftrightunsigned(col("phash"), 32 * b)
            .bitwiseAND(lit(0xffffffffL)).as("band_val"))): _*))
        .as("bd"))
      .select(col("doc_id"), col("phash"),
        col("bd.band_idx"), col("bd.band_val"))
    val ids = wideBands
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_val"))))
      .filter(col("bucket_n") <= PhashMaxBucket)
      .select(col("doc_id").as("id_b"), col("phash").as("hash_b"),
        col("band_idx"), col("band_val").as("probe"))
    val probes = wideBands.select(col("doc_id").as("id_a"),
        col("phash").as("hash_a"), col("band_idx"), col("band_val"),
        explode(array((-1 until 32).map(lit(_)): _*)).as("j"))
      .select(col("id_a"), col("hash_a"), col("band_idx"),
        expr("band_val ^ CASE WHEN j < 0 THEN CAST(0 AS BIGINT) " +
          "ELSE shiftleft(CAST(1 AS BIGINT), j) END").as("probe"))
    probes.join(ids, Seq("band_idx", "probe"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("hamming",
        expr("CAST(bit_count(hash_a ^ hash_b) AS BIGINT)"))
      .filter(col("hamming") <= MaxPhashDist)
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("hamming"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** The banded candidate join itself — ONE definition shared by the
    * dup query above and its calibration histogram, so the pigeonhole
    * completeness proof can never silently desynchronize between them
    * (an edit to the band shape lands in both or neither). Returns
    * raw (doc_a, doc_b, hamming) pairs; callers filter/distinct. */
  private def phashCandidates(sigs: DataFrame): DataFrame = {
    // hot-bucket cap (the DedupQueries.cappedBandPairs discipline,
    // round-13): the band space is FIXED at PhashBands × 2¹⁶ buckets,
    // so bucket occupancy grows with corpus density and uncapped
    // within-bucket pairing goes quadratic — the round-13 scaling
    // harness measured exponent 1.66 on the ×10 clone before this
    // cap. Buckets above [[PhashMaxBucket]] (a dHash region too dense
    // for banding to discriminate) are dropped from candidate
    // generation; at fixture scales the cap never binds, so both
    // oracle twins are unchanged where hashes are compared.
    val banded = sigs.select(col("doc_id"), col("phash"),
      explode(array((0 until PhashBands).map(b =>
        struct(lit(b).as("band_idx"),
          bandVal(col("phash"), b).as("band_val"))): _*)).as("bd"))
      .select(col("doc_id"), col("phash"),
        col("bd.band_idx"), col("bd.band_val"))
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_val"))))
      .filter(col("bucket_n") <= PhashMaxBucket)
      .drop("bucket_n")
    banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("CAST(bit_count(x.phash ^ y.phash) AS BIGINT)")
          .as("hamming"))
  }

  /** Cluster-form image dedup — the spelling that survives the
    * identical-pile regime BOTH pairwise variants measured dying at
    * the ×1000 docs decade (1.14M sigs collapse to 5,365 distinct
    * fingerprints, ~213-image piles: every bucket of ANY band split
    * is hot, the cap drops all mass, and honest pair emission would
    * be Θ(pile²) anyway). Distinct-first: (1) groupBy the 64-bit
    * fingerprint — the exact-dedup hash-groupBy shape, map-side
    * combined, linear at any corpus size — yielding one row per
    * distinct fingerprint with its canonical doc and member count;
    * (2) run the capped banded join on the DISTINCT fingerprint set
    * only (bucket occupancy is now distinct-values-per-band, not
    * images-per-band — the pile skew is gone before banding sees
    * it); (3) count near fingerprints (hamming ≤ [[MaxPhashDist]])
    * per cluster. A consumer reconstructs near-dup doc pairs only
    * where it chooses to pay for them — the query itself never
    * multiplies piles. */
  private[llm] def phashClusters(sigs: DataFrame): DataFrame = {
    // distinct-fingerprint-sized and read TWICE (band join + final
    // join) — without the checkpoint each reference replays the full
    // decode+groupBy over the corpus (the ×1000 ladder measured the
    // scan doubling: 10M rows read for a 5M-doc corpus)
    val clusters = sigs.groupBy("phash").agg(
      min("doc_id").as("canonical_doc"),
      count(lit(1)).as("n_members"))
      .truncateLineage()
    val asDocs = clusters.select(
      col("canonical_doc").as("doc_id"), col("phash"))
    val near = phashCandidates(asDocs)
      .filter(col("hamming") <= MaxPhashDist)
      .distinct()
    val nearCounts = near.select(col("doc_a").as("canonical_doc"))
      .unionAll(near.select(col("doc_b").as("canonical_doc")))
      .groupBy("canonical_doc").agg(count(lit(1)).as("n_near_fps"))
    clusters.join(nearCounts, Seq("canonical_doc"), "left")
      .select(col("canonical_doc"), col("n_members"),
        coalesce(col("n_near_fps"), lit(0L)).as("n_near_fps"))
      .orderBy("canonical_doc")
  }

  /** documents.text reinterpreted as the media payload (UTF-8 bytes). */
  private def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      concat(lit("application/x-"), col("source")).as("mime"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** Mixed-modality media table for the decode path: every 5th doc
    * carries a REAL PNG payload ([[pngFor]]), the rest keep their
    * opaque text-byte payload — so one table exercises both the real
    * codec branch and the stub branch of [[decode]]. Payload build is
    * map-only (partition-wise, no shuffle). */
  private def mixedMediaTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, source) =>
        if (id % 5 == 0) {
          val png = pngFor(id)
          MediaRow(id, png, "image/png", png.length.toLong)
        } else {
          val bytes = text.getBytes("UTF-8")
          MediaRow(id, bytes, s"application/x-$source", bytes.length.toLong)
        }
      }).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata over the binary column — byte length + content digest,
    // all computed on the BINARY representation.
    "multimodal_meta" -> ((s, d) =>
      mediaTable(s, d)
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          md5(col("media")).as("digest"))
        .orderBy("doc_id")),

    // Partition-wise batched decode: REAL PNG decode (javax.imageio)
    // for the image rows — width/height/brightness read from actual
    // pixels — and the labeled stub for non-image mimes, both through
    // the one mapPartitions batch shape a production codec stage uses.
    // Deterministic, so rows-only driver check + ScalaTest pin the
    // values (known fixture dimensions included).
    "multimodal_decode" -> ((s, d) => {
      import s.implicits._
      mixedMediaTable(s, d).as[MediaRow]
        .mapPartitions(batch => batch.map(decode))
        .toDF()
        .orderBy("doc_id")
    }),

    // Frame sampling (the video-ish path of the north star): the
    // payload modeled as fixed-size windows ("frames"), every 4th
    // frame sampled, each sampled frame sliced out and digested —
    // real slice-and-hash work, fully oracle-checked (unlike the
    // stubbed codec). The slice is also the crop/resize analog: a
    // real pipeline hands each frame slice to the batched decoder
    // above. Windows are CHARACTER-based because both engines slice
    // VARCHAR by character (DuckDB has no BLOB substring).
    // Aspect-preserving resize planning — the geometry step of an
    // image-preprocess stage, minus the codec: source dims derive
    // deterministically from the payload size (stand-in for decoded
    // metadata), the fit into a 224x224 canvas is pure integer
    // arithmetic (scale by 224/max-side via integer multiply-then-DIV,
    // letterbox padding from the remainder) so both engines agree
    // bit-for-bit. Map-only.
    "multimodal_resize_plan" -> ((s, d) =>
      mediaTable(s, d)
        .withColumn("w0", (lit(64) + pmod(col("n_bytes") * 7919, lit(1217)))
          .cast("long"))
        .withColumn("h0", (lit(64) + pmod(col("n_bytes") * 104729, lit(929)))
          .cast("long"))
        .withColumn("side", greatest(col("w0"), col("h0")))
        .select(
          col("doc_id"), col("w0"), col("h0"),
          expr("(w0 * 224) DIV side").as("target_w"),
          expr("(h0 * 224) DIV side").as("target_h"),
          expr("224 - (w0 * 224) DIV side").as("pad_x"),
          expr("224 - (h0 * 224) DIV side").as("pad_y"))
        .orderBy("doc_id")),

    "multimodal_frame_sample" -> ((s, d) => {
      val frameSize = 256L
      val stride = 4L
      val nFrames = ceil(length(col("text")).cast("double") / frameSize)
        .cast("long")
      val frame = expr(
        s"substring(text, cast(frame_idx * $frameSize + 1 as int), $frameSize)")
      // An empty document has n_frames = 0; sequence(0, -1, 4) throws
      // in Spark while the oracle's range(0, 0, 4) is simply empty, so
      // the sequence is gated on n_frames > 0 — the null branch makes
      // explode drop the row, exactly matching DuckDB's empty unnest.
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("application/x-"), col("source")).as("mime"),
          col("text"), nFrames.as("n_frames"),
          explode(when(nFrames > 0,
            sequence(lit(0L), nFrames - 1, lit(stride)))).as("frame_idx"))
        .select(col("doc_id"), col("mime"), col("n_frames"), col("frame_idx"),
          octet_length(frame).cast("long").as("frame_bytes"),
          md5(frame.cast("binary")).as("frame_digest"))
        .orderBy("doc_id", "frame_idx")
    }),

    // Inference batch planning: pack media rows into fixed byte-budget
    // batches per mime in stable doc order — the batching step in
    // front of a GPU decode/embed stage (the image analog of
    // text_pack_sequences, and since round-12 wave 6 the same
    // two-level bucketed cumsum: a window partitioned only by MIME
    // puts a whole modality — a corpus fraction — in one task at
    // 100 TB, so the cumsum runs within (mime, ⌈√N⌉-wide doc-id
    // bucket) and per-bucket bases accumulate in a mime-keyed window
    // over the ~√N bucket table). Assignment is pure integer
    // arithmetic so the oracle hash-proves the batch layout.
    "multimodal_batch_plan" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dim = Tables.documents(s, d)
        .agg(count(lit(1)).as("n"), max("doc_id").as("mx")).head()
      val width = if (dim.isNullAt(1)) 1L
        else SampleQueries.ppsBucketWidth(dim.getLong(0), dim.getLong(1))
      val m = mediaTable(s, d).withColumn("bk", expr(s"doc_id div $width"))
      val local = m.withColumn("lcum",
        sum(col("n_bytes")).over(Window.partitionBy("mime", "bk")
          .orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bases = m.groupBy("mime", "bk").agg(sum("n_bytes").as("tot"))
        .withColumn("base", coalesce(sum("tot").over(
          Window.partitionBy("mime").orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("mime", "bk", "base")
      local.join(broadcast(bases), Seq("mime", "bk"))
        .withColumn("cum", col("base") + col("lcum"))
        .withColumn("batch_id", expr(s"(cum - n_bytes) div $BatchBudget"))
        .groupBy("mime", "batch_id")
        .agg(count(lit(1)).as("n_items"),
          sum("n_bytes").as("batch_bytes"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("mime", "batch_id")
    }),

    // The REAL decode path made oracle-checkable: the PNG fixture's
    // dimensions are pure integer arithmetic of doc_id, so DuckDB can
    // predict what the codec MUST decode — the driver hash proves the
    // encode→decode round-trip (not just the plumbing) without the
    // oracle ever touching a pixel. Brightness stays spec-only (needs
    // the actual pixels).
    "multimodal_decoded_dims" -> ((s, d) => {
      import s.implicits._
      mixedMediaTable(s, d).as[MediaRow]
        .filter(_.mime == "image/png")
        .mapPartitions(batch => batch.map(decode))
        .toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("doc_id")
    }),

    // Downstream agg over decoded features: per-mime feature stats
    // (exercises decode output — real pixels for image/png — flowing
    // back into relational ops). The mime join side is recomputed from
    // doc_id/source as pure column expressions — re-reading it through
    // mixedMediaTable would re-run the typed payload build (incl. the
    // PNG encode) a second time just to project one string.
    "multimodal_feature_stats" -> ((s, d) => {
      import s.implicits._
      val decoded = mixedMediaTable(s, d).as[MediaRow]
        .mapPartitions(batch => batch.map(decode))
        .toDF()
      val mimes = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 5 === 0, lit("image/png"))
          .otherwise(concat(lit("application/x-"), col("source")))
          .as("mime"))
      decoded.join(mimes, "doc_id")
        .groupBy("mime")
        .agg(count(lit(1)).as("n_media"),
          min("width").as("min_w"), max("width").as("max_w"),
          sum("n_frames").as("total_frames"))
        .orderBy("mime")
    }),

    // Perceptual fingerprints from ACTUAL pixels: decode → 9×8
    // grayscale grid → 64 gradient bits, map-only, surfaced as four
    // 16-bit band integers (sign-safe in both engines; bands are the
    // blocking representation anyway). ORACLE-CHECKED without a
    // DuckDB codec — the decoded_dims trick completed: the fixture's
    // pixels are integer arithmetic of (doc_id, x, y), so the oracle
    // PREDICTS every gradient bit from the formula while Spark reads
    // them from the real encode→decode round-trip; any codec
    // deviation breaks the hash.
    "multimodal_phash" -> ((s, d) => {
      val bands = (0 until PhashBands).map(b =>
        bandVal(col("phash"), b).as(s"b$b"))
      phashTable(s, d)
        .select(col("doc_id") +: bands: _*)
        .orderBy("doc_id")
    }),

    // IMAGE near-duplicate detection — the multimodal twin of the
    // text dedup family: banded blocking over the dHash (complete for
    // hamming ≤ 3 by pigeonhole among non-hot buckets; the
    // PhashMaxBucket cap is mirrored in the oracle), exact popcount
    // verify on candidates only. The planted retouched twins (id+1e9)
    // are the guaranteed true positives; MultimodalSpec proves the
    // blocked output equals the brute-force pair scan at fixture
    // scale, where the cap never binds.
    "multimodal_phash_dups" -> ((s, d) =>
      phashPairs(phashTable(s, d))),

    // The deep-band twin (see [[phashPairsWide]]): same planted
    // twins, same hamming contract, a band space four orders of
    // magnitude deeper — the pairwise query for DISPERSED
    // fingerprint spaces past 4.2M images (PhashSaturationSpec
    // proves the handover executably).
    "multimodal_phash_dups_wide" -> ((s, d) =>
      phashPairsWide(phashTable(s, d))),

    // The cluster-form production query (see [[phashClusters]]): the
    // spelling that stays linear AND non-empty in the identical-pile
    // regime where any pairwise banding saturates — measured at the
    // ×1000 docs decade (bench_anchors/r15_phash_exponents.json).
    "multimodal_phash_dup_clusters" -> ((s, d) =>
      phashClusters(phashTable(s, d))),

    // Candidate-distance histogram — the banding calibration audit
    // for the image index: among band-mate CANDIDATE pairs (no
    // accept-threshold filter), how are XOR-popcount distances
    // distributed? A healthy index shows planted twins at ≤ 3 bits
    // and a background hump far above — if the hump creeps toward the
    // threshold, the bands are too coarse. Same banded join as the
    // dup query; the oracle replays it from the pixel-formula sigs
    // with hamming as the SUM of per-band 16-bit popcounts (bands
    // partition the 64 bits).
    "multimodal_phash_cand_hist" -> ((s, d) =>
      phashCandidates(phashTable(s, d))
        .distinct()
        .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
        .orderBy("hamming")))

  /** The WITH-body both phash oracles share: predicts every dHash
    * band in DuckDB from the fixture's integer pixel formula (incl.
    * the planted twin's blue-LSB flip at (0,0)), producing
    * `sigs(doc_id, b0..b3)` — while the Spark side reads the bits
    * from the genuine PNG encode→decode round-trip; a codec that
    * mangles any sampled pixel breaks both hash matches. */
  private def phashSigsSql: String = {
    def gray(px: String, py: String) =
      s"""((id*31 + ($px)*7 + ($py)*13) % 256
         | + (id*17 + ($px)*11 + ($py)*3) % 256
         | + CASE WHEN planted AND ($px) = 0 AND ($py) = 0
         |        THEN xor((id*5 + ($px)*13 + ($py)*29) % 256, 1)
         |        ELSE (id*5 + ($px)*13 + ($py)*29) % 256 END)"""
        .stripMargin.replace("\n", " ")
    s"""ids AS (
       |  SELECT doc_id AS id, doc_id AS out_id, FALSE AS planted
       |  FROM documents WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id AS id, doc_id + $PlantBase AS out_id, TRUE AS planted
       |  FROM documents WHERE doc_id % 35 = 0),
       |dims AS (
       |  SELECT id, out_id, planted,
       |    8 + id % 24 AS w, 8 + (id // 7) % 24 AS h
       |  FROM ids),
       |bits AS (
       |  SELECT out_id, (cy.cy*8 + cx.cx) // 16 AS band,
       |    CASE WHEN ${gray("cx.cx * w // 9", "cy.cy * h // 8")}
       |           > ${gray("(cx.cx + 1) * w // 9", "cy.cy * h // 8")}
       |         THEN 1::BIGINT << ((cy.cy*8 + cx.cx) % 16)
       |         ELSE 0::BIGINT END AS v
       |  FROM dims
       |  CROSS JOIN (SELECT unnest(range(0, 8)) AS cy) cy
       |  CROSS JOIN (SELECT unnest(range(0, 8)) AS cx) cx),
       |sigs AS (
       |  SELECT out_id AS doc_id,
       |    CAST(sum(CASE WHEN band = 0 THEN v ELSE 0 END) AS BIGINT) AS b0,
       |    CAST(sum(CASE WHEN band = 1 THEN v ELSE 0 END) AS BIGINT) AS b1,
       |    CAST(sum(CASE WHEN band = 2 THEN v ELSE 0 END) AS BIGINT) AS b2,
       |    CAST(sum(CASE WHEN band = 3 THEN v ELSE 0 END) AS BIGINT) AS b3
       |  FROM bits GROUP BY out_id)""".stripMargin
  }

  /** WITH-body producing `dec(doc_id, width, height, n_frames,
    * brightness)` — the decode oracle: image rows replay the REAL
    * pixel sum from the fixture's integer formula (the phash trick,
    * extended from sampled gradient bits to the full w×h brightness
    * sum), stub rows replay the byte-fold checksum via a list_reduce
    * over ASCII codepoints. Divisions are spelled DOUBLE/INTEGER so
    * DuckDB performs the same IEEE division as the JVM (a bare 255.0
    * literal would be DECIMAL division). */
  private def decodedSql: String =
    s"""img AS (SELECT doc_id, 8 + doc_id % 24 AS w,
       |          8 + (doc_id // 7) % 24 AS h
       |        FROM documents WHERE doc_id % 5 = 0),
       |pxx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM img),
       |pxy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM pxx),
       |psum AS (SELECT doc_id, w, h,
       |    CAST(sum((doc_id*31 + x*7 + y*13) % 256
       |           + (doc_id*17 + x*11 + y*3) % 256
       |           + (doc_id*5 + x*13 + y*29) % 256) AS BIGINT) AS s
       |  FROM pxy GROUP BY doc_id, w, h),
       |stb AS (SELECT doc_id,
       |    list_reduce(list_concat([0], list_transform(
       |      range(1, length(text)+1), i -> unicode(text[i:i]))),
       |      (a, b) -> (a*31 + b) & 16777215) AS ck,
       |    octet_length(encode(text)) AS len
       |  FROM documents WHERE doc_id % 5 <> 0),
       |dec AS (
       |  SELECT doc_id, CAST(w AS INTEGER) AS width,
       |    CAST(h AS INTEGER) AS height, CAST(1 AS INTEGER) AS n_frames,
       |    CAST(s AS DOUBLE) / (w * h * 3 * 255) AS brightness
       |  FROM psum
       |  UNION ALL
       |  SELECT doc_id, CAST(64 + ck % 512 AS INTEGER) AS width,
       |    CAST(64 + (ck // 512) % 512 AS INTEGER) AS height,
       |    CAST(1 + len % 16 AS INTEGER) AS n_frames,
       |    CAST(ck % 256 AS DOUBLE) / 255 AS brightness
       |  FROM stb)""".stripMargin

  def oracles: Map[String, String] = Map(
    "multimodal_decode" ->
      s"""WITH $decodedSql
         |SELECT doc_id, width, height, n_frames, brightness
         |FROM dec ORDER BY doc_id""".stripMargin,

    "multimodal_feature_stats" ->
      s"""WITH $decodedSql
         |SELECT m.mime, count(*) AS n_media,
         |  min(d.width) AS min_w, max(d.width) AS max_w,
         |  CAST(sum(d.n_frames) AS BIGINT) AS total_frames
         |FROM dec d JOIN (
         |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN 'image/png'
         |    ELSE 'application/x-' || source END AS mime
         |  FROM documents) m ON d.doc_id = m.doc_id
         |GROUP BY m.mime ORDER BY m.mime""".stripMargin,

    // The decoded_dims trick completed for pixels: every gradient bit
    // of the dHash is PREDICTED from the fixture's integer pixel
    // formula (incl. the planted twin's blue-LSB flip at (0,0)),
    // while the Spark side reads it from the genuine PNG
    // encode→decode round-trip — a codec that mangles any sampled
    // pixel breaks the hash match.
    "multimodal_phash" ->
      s"""WITH $phashSigsSql
         |SELECT doc_id, b0, b1, b2, b3 FROM sigs ORDER BY doc_id"""
        .stripMargin,

    // The pair query under the SAME pixel-formula replay: every band
    // of every candidate fingerprint is predicted in DuckDB, then the
    // oracle replays the Spark side's capped banded pipeline exactly
    // (cappedBandsSqlCte with the same PhashMaxBucket). Pigeonhole
    // (hamming ≤ $MaxPhashDist over 4 bands ⇒ a shared band) still
    // guarantees completeness within NON-hot buckets, but once hot
    // buckets are dropped the brute-force all-pairs spelling would
    // diverge — so both sides must spell the cap identically (the
    // r13 review catch; MultimodalSpec pins the blocking equivalence
    // on the uncapped regime executably).
    "multimodal_phash_cand_hist" ->
      s"""WITH $phashSigsSql,
         |banded AS (
         |  SELECT doc_id, 0 AS band_idx, b0 AS band_val FROM sigs
         |  UNION ALL SELECT doc_id, 1, b1 FROM sigs
         |  UNION ALL SELECT doc_id, 2, b2 FROM sigs
         |  UNION ALL SELECT doc_id, 3, b3 FROM sigs),
         |${DedupQueries.cappedBandsSqlCte("banded_c", "banded",
              "doc_id", PhashMaxBucket)},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM banded_c x JOIN banded_c y
         |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
         |   AND x.doc_id < y.doc_id),
         |candh AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |       + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
         |      AS BIGINT) AS hamming
         |  FROM cand c
         |  JOIN sigs a ON a.doc_id = c.doc_a
         |  JOIN sigs b ON b.doc_id = c.doc_b)
         |SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM candh GROUP BY hamming ORDER BY hamming""".stripMargin,

    // same banded + hot-bucket-capped candidate pipeline as the Spark
    // side (a brute-force pair scan here would diverge the moment a
    // band bucket exceeds PhashMaxBucket — the r13 review catch)
    "multimodal_phash_dups" ->
      s"""WITH $phashSigsSql,
         |banded AS (
         |  SELECT doc_id, 0 AS band_idx, b0 AS band_val FROM sigs
         |  UNION ALL SELECT doc_id, 1, b1 FROM sigs
         |  UNION ALL SELECT doc_id, 2, b2 FROM sigs
         |  UNION ALL SELECT doc_id, 3, b3 FROM sigs),
         |${DedupQueries.cappedBandsSqlCte("banded_c", "banded",
              "doc_id", PhashMaxBucket)},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM banded_c x JOIN banded_c y
         |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
         |   AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |       + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
         |      AS BIGINT) AS hamming
         |  FROM cand c
         |  JOIN sigs a ON a.doc_id = c.doc_a
         |  JOIN sigs b ON b.doc_id = c.doc_b)
         |WHERE hamming <= $MaxPhashDist
         |ORDER BY doc_a, doc_b""".stripMargin,

    // The wide multi-probe pipeline's EXACT semantics spelled
    // declaratively (the r13 both-sides-spell-the-cap rule): a pair
    // is a candidate iff some 32-bit band differs by <= 1 bit AND at
    // least one side's identity bucket is non-hot (probe sides are
    // uncapped; probe(a) hits id(b) iff b's bucket survives, and
    // vice versa). The <=1-bit band join is an inequality join —
    // quadratic-within-band, an ORACLE-ONLY spelling the engine's
    // linear 33-probe equijoin replaces at scale.
    "multimodal_phash_dups_wide" ->
      s"""WITH $phashSigsSql,
         |wband AS (
         |  SELECT doc_id, 0 AS band_idx,
         |    CAST(b0 + b1 * 65536 AS BIGINT) AS band_val FROM sigs
         |  UNION ALL
         |  SELECT doc_id, 1, CAST(b2 + b3 * 65536 AS BIGINT) FROM sigs),
         |wbn AS (
         |  SELECT doc_id, band_idx, band_val,
         |    count(*) OVER (PARTITION BY band_idx, band_val) AS bn
         |  FROM wband),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM wbn x JOIN wbn y
         |    ON x.band_idx = y.band_idx
         |   AND bit_count(xor(x.band_val, y.band_val)) <= 1
         |   AND (x.bn <= $PhashMaxBucket OR y.bn <= $PhashMaxBucket)
         |   AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |       + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
         |      AS BIGINT) AS hamming
         |  FROM cand c
         |  JOIN sigs a ON a.doc_id = c.doc_a
         |  JOIN sigs b ON b.doc_id = c.doc_b)
         |WHERE hamming <= $MaxPhashDist
         |ORDER BY doc_a, doc_b""".stripMargin,

    // distinct-first replay: clusters from the predicted sigs, then
    // the SAME capped banded pipeline as the pair oracles — but over
    // canonical fingerprints only (one doc_id per distinct phash)
    "multimodal_phash_dup_clusters" ->
      s"""WITH $phashSigsSql,
         |cl AS (
         |  SELECT min(doc_id) AS canonical_doc,
         |    CAST(count(*) AS BIGINT) AS n_members, b0, b1, b2, b3
         |  FROM sigs GROUP BY b0, b1, b2, b3),
         |banded AS (
         |  SELECT canonical_doc AS doc_id, 0 AS band_idx,
         |    b0 AS band_val FROM cl
         |  UNION ALL SELECT canonical_doc, 1, b1 FROM cl
         |  UNION ALL SELECT canonical_doc, 2, b2 FROM cl
         |  UNION ALL SELECT canonical_doc, 3, b3 FROM cl),
         |${DedupQueries.cappedBandsSqlCte("banded_c", "banded",
              "doc_id", PhashMaxBucket)},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM banded_c x JOIN banded_c y
         |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
         |   AND x.doc_id < y.doc_id),
         |near AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT c.doc_a, c.doc_b,
         |      CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |         + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
         |        AS BIGINT) AS hamming
         |    FROM cand c
         |    JOIN cl a ON a.canonical_doc = c.doc_a
         |    JOIN cl b ON b.canonical_doc = c.doc_b)
         |  WHERE hamming <= $MaxPhashDist),
         |nc AS (
         |  SELECT canonical_doc, CAST(count(*) AS BIGINT) AS n_near_fps
         |  FROM (SELECT doc_a AS canonical_doc FROM near
         |        UNION ALL SELECT doc_b FROM near)
         |  GROUP BY canonical_doc)
         |SELECT cl.canonical_doc, cl.n_members,
         |  coalesce(nc.n_near_fps, 0) AS n_near_fps
         |FROM cl LEFT JOIN nc USING (canonical_doc)
         |ORDER BY canonical_doc""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, 'application/x-' || source AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_resize_plan" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    64 + (octet_length(encode(text)) * 7919) % 1217 AS w0,
        |    64 + (octet_length(encode(text)) * 104729) % 929 AS h0
        |  FROM documents),
        |g AS (SELECT doc_id, w0, h0, greatest(w0, h0) AS side FROM t)
        |SELECT doc_id, CAST(w0 AS BIGINT) AS w0, CAST(h0 AS BIGINT) AS h0,
        |  CAST((w0 * 224) // side AS BIGINT) AS target_w,
        |  CAST((h0 * 224) // side AS BIGINT) AS target_h,
        |  CAST(224 - (w0 * 224) // side AS BIGINT) AS pad_x,
        |  CAST(224 - (h0 * 224) // side AS BIGINT) AS pad_y
        |FROM g ORDER BY doc_id""".stripMargin,

    "multimodal_batch_plan" ->
      s"""WITH m AS (
         |  SELECT doc_id, 'application/x-' || source AS mime,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, mime, n_bytes,
         |    sum(n_bytes) OVER (PARTITION BY mime ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM m)
         |SELECT mime, CAST((cum - n_bytes) // $BatchBudget AS BIGINT) AS batch_id,
         |  count(*) AS n_items,
         |  CAST(sum(n_bytes) AS BIGINT) AS batch_bytes,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2 ORDER BY mime, batch_id""".stripMargin,

    "multimodal_decoded_dims" ->
      """SELECT doc_id,
        |  CAST(8 + (doc_id % 24) AS BIGINT) AS width,
        |  CAST(8 + ((doc_id // 7) % 24) AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS n_frames
        |FROM documents WHERE doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin,

    "multimodal_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, 'application/x-' || source AS mime, text,
        |    CAST(ceil(length(text) / 256.0) AS BIGINT) AS n_frames
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, mime, text, n_frames,
        |    unnest(range(0, n_frames, 4)) AS frame_idx
        |  FROM m)
        |SELECT doc_id, mime, n_frames, frame_idx,
        |  CAST(octet_length(encode(substring(text,
        |    CAST(frame_idx * 256 + 1 AS BIGINT), 256))) AS BIGINT) AS frame_bytes,
        |  md5(substring(text,
        |    CAST(frame_idx * 256 + 1 AS BIGINT), 256)) AS frame_digest
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin)
}
