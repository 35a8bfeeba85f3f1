package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators — the training-data-pipeline surface for
  * opaque binary assets (images/audio/video) with typed metadata.
  *
  * The corpus is derived deterministically from `documents`: the UTF-8
  * payload bytes stand in for encoded media, modality is assigned by
  * doc_id, and a typed `meta` struct carries per-modality attributes.
  * The DECODE step is a clearly-marked STUB (this container has no
  * image/audio codecs): "features" are md5-derived values and "frames"
  * are fixed-stride payload slices. Everything around the stub — binary
  * columns, metadata schema, narrow per-asset transforms, frame
  * explosion, per-modality aggregation — is the real plumbing a media
  * pipeline needs and is fully tested (MultimodalSpec + DuckDB
  * oracles).
  *
  * Scale: decode/feature steps are narrow (no shuffle); the only
  * shuffles are the final per-modality/per-asset aggregations. At 100 TB
  * the same shape holds: assets are value-columns, never join keys.
  */
object Multimodal extends Registry {
  import Tables.table

  /** STUB decode: deterministic pseudo-feature in [0,1) from md5 of the
    * asset content and a feature index. A real deployment swaps this
    * for a codec/model call (e.g. mapInArrow over payload batches)
    * without changing the plan shape. */
  private def fakeFeature(content: Column, i: Int): Column =
    fakeFeatureK(content, i).cast("double") / lit(4294967296.0)

  /** The feature's EXACT integer form (feature = k / 2^32). Averages
    * must sum THIS and divide once: averaging per-row doubles
    * accumulates in engine-specific order, and a 1-ulp sum difference
    * vs the DuckDB oracle flips the 4th rounded decimal (observed on
    * q83 at sf0.001 before it switched to integer sums). */
  private def fakeFeatureK(content: Column, i: Int): Column =
    conv(substring(md5(concat(content, lit(s"|$i"))), 1, 8), 16, 10)
      .cast("long")

  /** round(avg(feature), 4) via the exact-integer path. The sum runs
    * in decimal(38,0) (mirroring the oracle's HUGEINT): a LongType sum
    * of 32-bit values would hit ANSI ARITHMETIC_OVERFLOW past ~2^31
    * rows per group — q80's groups are a third of the corpus each, so
    * that is a real ceiling at target scale, not a theoretical one. */
  private def avgFeature(content: Column, i: Int): Column =
    round(sum(fakeFeatureK(content, i).cast("decimal(38,0)")).cast("double") /
      (count(lit(1)) * lit(4294967296.0)), 4)

  private val modality =
    when(pmod(col("doc_id"), lit(3)) === 0, "image")
      .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
      .otherwise("video")

  /** The multimodal corpus: binary payload + typed per-modality meta. */
  def corpus(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id"),
      modality.as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      col("text"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        // stub metadata: deterministic fake dimensions / rates —
        // md5-derived (not xxhash64) so the DuckDB oracle can recompute
        // them bit-for-bit (q82)
        (fakeDim(col("doc_id"), 0) % 1280 + 64).as("width"),
        (fakeDim(col("doc_id"), 1) % 720 + 64).as("height"),
        lit(16000).as("sample_rate")).as("meta"))

  private def fakeDim(docId: Column, salt: Int): Column =
    Sampling.md5Prefix16(concat(docId.cast("string"), lit(s"#$salt")))

  val FrameChars = 64
  val MaxFrames = 8
  val WindowChars = 32
  val MaxWindows = 16
  /** q84: PCM16 samples per energy window, and the Σs² threshold a
    * window must reach to count as voiced (full 16-sample windows of
    * typical text-derived samples land well above it; short tail
    * windows below — a deterministic mixed population). */
  val WavWindowSamples = 16
  val VoicedEnergyMin = 8000000000L

  /** Fixed-stride asset slicing, capped — ONE definition of the
    * slice-count/boundary contract shared by frame sampling (q81) and
    * audio windowing (q83); a fix to the formula lands in both. */
  private def slices(assets: DataFrame, sliceChars: Int, maxSlices: Int,
      name: String): DataFrame = {
    val n = least(lit(maxSlices),
      ((length(col("text")) - 1) / sliceChars).cast("int") + 1)
    assets
      .select(col("doc_id"), col("text"), n.as("n"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n") - 1),
          i => col("text").substr(i * sliceChars + 1, lit(sliceChars)))))
      .withColumnRenamed("pos", s"${name}_idx")
      .withColumnRenamed("col", name)
  }

  /** Frame sampling (video modality): fixed-stride slices of the asset,
    * capped at MaxFrames — the standard keyframe-subsample shape. */
  def frames(video: DataFrame): DataFrame =
    slices(video, FrameChars, MaxFrames, "frame")

  val ResizeTarget = 224

  /** Resize (image modality): integer box-fit to ResizeTarget on the
    * long side preserving aspect ratio; the payload "resample" stub
    * scales byte count by the pixel ratio. Pure narrow arithmetic per
    * asset — a real resampler swap (mapPartitions over payload batches)
    * keeps the same plan shape. */
  def resized(images: DataFrame): DataFrame = {
    val w = col("meta")("width"); val h = col("meta")("height")
    val maxDim = greatest(w, h)
    val newW = floor(w * lit(ResizeTarget) / maxDim)
    val newH = floor(h * lit(ResizeTarget) / maxDim)
    images.select(col("doc_id"), w.as("width"), h.as("height"),
      newW.as("new_w"), newH.as("new_h"),
      floor(col("meta")("n_bytes") * (newW * newH) / (w * h))
        .as("resized_bytes"))
  }

  def defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q80_multimodal_decode",
      (s, dir) => corpus(s, dir)
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_assets"),
          round(avg(col("meta")("n_bytes")), 2).as("avg_bytes"),
          avgFeature(col("text"), 0).as("f0"),
          avgFeature(col("text"), 1).as("f1"))
        .orderBy(col("modality")),
      Some("""SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
             |            WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             |  count(*) AS n_assets,
             |  round(avg(octet_length(encode(text))), 2) AS avg_bytes,
             |  round(sum(CAST(('0x' || substr(md5(text || '|0'), 1, 8)) AS BIGINT))
             |        / (count(*) * 4294967296.0), 4) AS f0,
             |  round(sum(CAST(('0x' || substr(md5(text || '|1'), 1, 8)) AS BIGINT))
             |        / (count(*) * 4294967296.0), 4) AS f1
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Binary payload + typed meta + stubbed decode/feature extract"),

    // ------------------------------------------------------------------
    QueryDef(
      "q81_multimodal_frames",
      (s, dir) => frames(corpus(s, dir).filter(col("modality") === "video"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          avgFeature(col("frame"), 0).as("avg_frame_f0"))
        .orderBy(col("doc_id")),
      Some(s"""WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
             |f AS (SELECT doc_id,
             |        unnest([substr(text, i * $FrameChars + 1, $FrameChars)
             |                for i in range(0, least($MaxFrames,
             |                  (length(text) - 1) // $FrameChars + 1))]) AS frame
             |      FROM v)
             |SELECT doc_id, count(*) AS n_frames,
             |  round(sum(CAST(('0x' || substr(md5(frame || '|0'), 1, 8)) AS BIGINT))
             |        / (count(*) * 4294967296.0), 4) AS avg_frame_f0
             |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "Frame sampling (fixed-stride slices, capped) + per-frame features"),

    // ------------------------------------------------------------------
    QueryDef(
      "q82_multimodal_resize",
      (s, dir) => resized(corpus(s, dir)
        .filter(col("modality") === "image" && col("doc_id") < 300))
        .orderBy(col("doc_id")),
      Some("""WITH m AS (SELECT doc_id,
             |    octet_length(encode(text)) AS n_bytes,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#0'), 1, 4)
             |         AS BIGINT) % 1280 + 64 AS w,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#1'), 1, 4)
             |         AS BIGINT) % 720 + 64 AS h
             |  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 300)
             |SELECT doc_id, w AS width, h AS height,
             |  (w * 224) // greatest(w, h) AS new_w,
             |  (h * 224) // greatest(w, h) AS new_h,
             |  (n_bytes * ((w * 224) // greatest(w, h))
             |           * ((h * 224) // greatest(w, h))) // (w * h)
             |    AS resized_bytes
             |FROM m ORDER BY doc_id""".stripMargin),
      doc = "Image resize: integer box-fit + byte-count resample (narrow per-asset)"),

    // ------------------------------------------------------------------
    // q83: audio windowing + voice-activity gating — the audio
    // counterpart of q81's frame sampling: slice each asset into fixed
    // windows, score a per-window energy (STUB: md5-derived, a real
    // deployment swaps in an RMS/VAD model over payload batches), drop
    // sub-threshold windows, aggregate per asset. Slicing + scoring are
    // narrow; the only shuffle is the per-asset aggregate — the VAD
    // pre-filter shape that cuts an audio corpus before any expensive
    // model sees it.
    QueryDef(
      "q83_audio_windows",
      (s, dir) => {
        val audio = corpus(s, dir).filter(col("modality") === "audio")
        // energy is kept as the EXACT md5 integer k (energy = k / 2^32);
        // the voiced average sums integers and divides ONCE, because
        // averaging per-window doubles accumulates in engine-specific
        // order — a 1-ulp sum difference flips the 4th rounded decimal
        // (observed at sf0.001) while sum(k) is bit-exact everywhere
        val win = slices(audio, WindowChars, MaxWindows, "window")
          .withColumn("k", fakeFeatureK(col("window"), 2))
          .withColumn("voiced", (col("k") / lit(4294967296.0) >= 0.2).cast("int"))
        win.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_windows"),
            sum(col("voiced")).as("n_voiced"),
            coalesce(
              round(sum(when(col("voiced") === 1, col("k"))) /
                (sum(col("voiced")) * lit(4294967296.0)), 4),
              lit(-1.0)).as("avg_voiced_energy"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1),
             |w AS (SELECT doc_id,
             |        CAST(('0x' || substr(md5(win || '|2'), 1, 8)) AS BIGINT) AS k
             |      FROM (SELECT doc_id,
             |              unnest([substr(text, i * $WindowChars + 1, $WindowChars)
             |                      for i in range(0, least($MaxWindows,
             |                        (length(text) - 1) // $WindowChars + 1))]) AS win
             |            FROM a) t)
             |SELECT doc_id, count(*) AS n_windows,
             |  CAST(sum(CASE WHEN k / 4294967296.0 >= 0.2 THEN 1 ELSE 0 END)
             |       AS BIGINT) AS n_voiced,
             |  coalesce(round(
             |    CAST(sum(CASE WHEN k / 4294967296.0 >= 0.2 THEN k END) AS DOUBLE)
             |      / (sum(CASE WHEN k / 4294967296.0 >= 0.2 THEN 1 ELSE 0 END)
             |         * 4294967296.0), 4),
             |    -1.0) AS avg_voiced_energy
             |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "Audio windowing + VAD-style energy gate (stub energy, real plumbing)"),

    // ------------------------------------------------------------------
    // q84: q83's energy gate over REAL decoded samples — the one
    // modality where the decode step is a true codec, not a stub
    // (expressions.WavPcm16): each audio asset is packed into a valid
    // RIFF/WAVE PCM16 container in-engine (payload bytes = the data
    // chunk; the testdata ships no media files), then DECODED by a real
    // parser that walks the chunk list, validates magics + fmt (PCM,
    // mono, 16-bit) and sign-extends little-endian samples. Per-window
    // energy is Σ s² over 16-sample windows (exact longs — no float
    // path at all), with a voiced gate and per-asset totals. The oracle
    // recomputes the SAME samples from hex(encode(text)) byte pairs in
    // SQL — the decoder's arithmetic is replayed, not trusted. Narrow
    // per-asset work end-to-end; the only shuffle is the final sort.
    QueryDef(
      "q84_wav_pcm16",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val nWin = least(lit(MaxWindows),
          ((size(col("smp")) - 1) / lit(WavWindowSamples)).cast("int") + 1)
        // size(smp) > 0 gated pre-decode as octet_length(payload) >= 2
        // (PCM16 = 2 bytes/sample, exact): filtering on the decoded
        // array runs the codec in both Filter and Project
        corpus(s, dir).filter(col("modality") === "audio")
          .filter(expr("octet_length(payload) >= 2"))
          .select(col("doc_id"),
            expr("wav_pcm16_encode(payload, 16000)").as("wav"))
          .select(col("doc_id"),
            expr("wav_sample_rate(wav)").as("sample_rate"),
            expr("wav_pcm16_samples(wav)").as("smp"))
          .withColumn("es", transform(sequence(lit(0), nWin - 1), i =>
            aggregate(slice(col("smp"), i * lit(WavWindowSamples) + 1,
              lit(WavWindowSamples)),
              lit(0L), (acc, x) => acc + x.cast("long") * x)))
          .select(col("doc_id"), col("sample_rate"),
            size(col("smp")).as("n_samples"),
            size(col("es")).as("n_windows"),
            size(filter(col("es"), e => e >= lit(VoicedEnergyMin)))
              .cast("long").as("n_voiced"),
            aggregate(col("es"), lit(0L), _ + _).as("total_energy"),
            array_max(col("es")).as("max_window_energy"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH a AS (
             |  SELECT doc_id, encode(text) AS b FROM documents
             |  WHERE doc_id % 3 = 1),
             |s AS (
             |  SELECT doc_id,
             |    [CASE WHEN v > 32767 THEN v - 65536 ELSE v END
             |     FOR v IN [CAST(('0x' || substr(hex(b), 4*i+3, 2)
             |                          || substr(hex(b), 4*i+1, 2)) AS INT)
             |               for i in range(0, octet_length(b) // 2)]] AS smp
             |  FROM a),
             |w AS (
             |  SELECT doc_id, smp,
             |    least($MaxWindows,
             |          (len(smp) - 1) // $WavWindowSamples + 1) AS nw
             |  FROM s WHERE len(smp) > 0),
             |e AS (
             |  SELECT doc_id, len(smp) AS n_samples, nw,
             |    [list_sum(list_transform(
             |       smp[i*$WavWindowSamples+1 : (i+1)*$WavWindowSamples],
             |       x -> CAST(x AS BIGINT) * x))
             |     for i in range(0, nw)] AS es
             |  FROM w)
             |SELECT doc_id, 16000 AS sample_rate,
             |  CAST(n_samples AS INTEGER) AS n_samples,
             |  CAST(nw AS INTEGER) AS n_windows,
             |  CAST(len(list_filter(es, x -> x >= $VoicedEnergyMin)) AS BIGINT)
             |    AS n_voiced,
             |  CAST(list_sum(es) AS BIGINT) AS total_energy,
             |  CAST(list_max(es) AS BIGINT) AS max_window_energy
             |FROM e ORDER BY doc_id""".stripMargin),
      doc = "Real WAV PCM16 decode (RIFF walk + fmt validate) + exact-integer energy windows"),

    // ------------------------------------------------------------------
    // q8c: AUDIO RESAMPLE on real decoded samples — closes the modality
    // trio of true transforms over true codecs (q8a image resize, q8b
    // video thumbnails): decimation by 2 over q84's PCM16 decode,
    // 16 kHz -> 8 kHz, out sample k = in sample 2k. Integer decimation
    // is the exact-arithmetic resample (no filter kernel, no float), so
    // every output sample — signed — replays bit-for-bit from payload
    // hex byte pairs, and the position-weighted checksum (Σ s_k·(k+1),
    // over SIGNED values) fails any off-by-one, dropped tail, or
    // even/odd phase error. Same narrow shape as the rest of the
    // family: decode + decimate fuse into one pass per asset, per-row
    // reduction (no explode), only the final sort shuffles. The output
    // rate is emitted from the container's own stored rate (header
    // read, not a constant) halved — a header misparse desynchronizes.
    QueryDef(
      "q8c_audio_resample",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        // same pre-decode gate as q84: octet_length >= 2 ⟺ ≥1 sample
        corpus(s, dir).filter(col("modality") === "audio")
          .filter(expr("octet_length(payload) >= 2"))
          .select(col("doc_id"),
            expr("wav_pcm16_encode(payload, 16000)").as("wav"))
          .select(col("doc_id"),
            expr("wav_sample_rate(wav)").as("rate_in"),
            expr("wav_pcm16_samples(wav)").as("smp"))
          .withColumn("ds", expr("""transform(
            sequence(0, CAST((size(smp) + 1) div 2 AS INT) - 1),
            k -> element_at(smp, 2 * k + 1))"""))
          .select(col("doc_id"), col("rate_in"),
            (col("rate_in") / 2).cast("int").as("rate_out"),
            size(col("smp")).as("n_samples"),
            size(col("ds")).as("n_out_samples"),
            expr("""aggregate(ds, CAST(0 AS BIGINT),
              (a, x) -> a + CAST(x AS BIGINT))""").as("out_sum"),
            expr("""aggregate(zip_with(ds, sequence(1, size(ds)),
              (s, i) -> CAST(s AS BIGINT) * i),
              CAST(0 AS BIGINT), (a, x) -> a + x)""").as("pos_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS b FROM documents
             |  WHERE doc_id % 3 = 1),
             |s AS (
             |  SELECT doc_id,
             |    [CASE WHEN v > 32767 THEN v - 65536 ELSE v END
             |     FOR v IN [CAST(('0x' || substr(hex(b), 4*i+3, 2)
             |                          || substr(hex(b), 4*i+1, 2)) AS INT)
             |               for i in range(0, octet_length(b) // 2)]] AS smp
             |  FROM a),
             |w AS (SELECT doc_id, smp FROM s WHERE len(smp) > 0),
             |d AS (SELECT doc_id, len(smp) AS n_samples,
             |        [smp[2*k+1] for k in range(0, (len(smp)+1)//2)] AS ds
             |      FROM w)
             |SELECT doc_id, 16000 AS rate_in, 8000 AS rate_out,
             |  CAST(n_samples AS INTEGER) AS n_samples,
             |  CAST(len(ds) AS INTEGER) AS n_out_samples,
             |  CAST(coalesce(list_sum(ds), 0) AS BIGINT) AS out_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(ds)),
             |    k -> CAST(ds[k+1] AS BIGINT) * (k+1))), 0) AS BIGINT)
             |    AS pos_checksum
             |FROM d ORDER BY doc_id""".stripMargin),
      doc = "Audio decimation resample on real PCM16 decode: 16->8 kHz, " +
        "signed samples and phase pinned by a position-weighted checksum"),

    // ------------------------------------------------------------------
    // q85: REAL image decode for the image modality — BMP/RGB24
    // (expressions.BmpRgb24), making two of the three modalities
    // true-codec paths. The decoder reconstructs the logical top-down
    // BGR stream from BMP's bottom-up padded rows; per-asset outputs
    // are exact-integer channel sums plus an ORDER-SENSITIVE positional
    // checksum (Σ byteᵢ·((i mod 1000)+1)) — channel sums alone are
    // order-blind, so a decoder that ignored the bottom-up rule would
    // still pass them; the positional checksum is what fails it. The
    // oracle recomputes everything from hex byte pairs (the zero-filled
    // tail of the last row contributes 0 to every statistic, so the
    // payload bytes suffice). Pixel stream explode → ONE grouped agg:
    // a shuffle of (doc_id, pos, byte) triples for bounded assets.
    QueryDef(
      "q85_bmp_rgb24",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val width = 16
        corpus(s, dir).filter(col("modality") === "image")
          .select(col("doc_id"),
            expr(s"bmp_rgb24_encode(payload, $width)").as("bmp"))
          .select(col("doc_id"),
            expr("bmp_width(bmp)").as("width"),
            expr("bmp_height(bmp)").as("height"),
            expr("bmp_rgb24_pixels(bmp)").as("px"))
          // per-row reductions (q8g shape): posexplode+groupBy both
          // re-shuffled every decoded byte and let
          // InferFiltersFromGenerate clone the decode into a Filter
          .select(col("doc_id"), col("width"), col("height"),
            pxChanSum(0).as("b_sum"), pxChanSum(1).as("g_sum"),
            pxChanSum(2).as("r_sum"), pxPosChecksum.as("pos_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0),
             |bytes AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |st AS (
             |  SELECT doc_id, n, bs,
             |    (n + 2) // 3 AS n_px
             |  FROM bytes)
             |SELECT doc_id, 16 AS width,
             |  CAST(greatest(1, (n_px + 15) // 16) AS INTEGER) AS height,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> CASE WHEN i % 3 = 0 THEN bs[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS b_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> CASE WHEN i % 3 = 1 THEN bs[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS g_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> CASE WHEN i % 3 = 2 THEN bs[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS r_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> bs[i+1] * ((i % 1000) + 1))), 0) AS BIGINT) AS pos_checksum
             |FROM st ORDER BY doc_id""".stripMargin),
      doc = "Real BMP/RGB24 decode (bottom-up padded rows) + order-sensitive pixel checksum"),

    // ------------------------------------------------------------------
    // q87: REAL PNG decode — the first COMPRESSED codec in the family
    // (expressions.PngGray8). Unlike q84-q86's uncompressed containers,
    // the pixel bytes here only exist after a true zlib inflate
    // (java.util.zip.Inflater) and per-row unfiltering; the encoder
    // assigns filter type row%5, so every asset of ≥5 rows exercises
    // ALL FIVE unfilters (None/Sub/Up/Average/Paeth) structurally — and
    // the emitted n_filter_types column (distinct filter bytes read
    // back from the container) PROVES it per asset, pinned by the
    // oracle's least(height, 5). The IDAT stream is deliberately split
    // across two chunks, so a decoder that reads only the first chunk
    // fails. Stats are exact integers; the order-sensitive positional
    // checksum fails any misread filter, chunk boundary, or inflate.
    // The oracle replays everything from hex byte pairs of the payload
    // (the decode round-trips to payload + zero tail, which contributes
    // 0 to every statistic). Independence from the encoder is proven in
    // PngGray8Spec by cross-decoding against the JDK's ImageIO PNG
    // codec in both directions. Narrow per-asset work; the only shuffle
    // is the final grouped agg.
    QueryDef(
      "q87_png_gray8",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val width = 16
        corpus(s, dir).filter(col("modality") === "image")
          .select(col("doc_id"),
            expr(s"png_gray8_encode(payload, $width)").as("png"))
          .select(col("doc_id"),
            expr("png_width(png)").as("width"),
            expr("png_height(png)").as("height"),
            size(array_distinct(expr("png_filter_types(png)")))
              .as("n_filter_types"),
            expr("png_gray8_pixels(png)").as("px"))
          // per-row reductions (q8g shape; see q85)
          .select(col("doc_id"), col("width"), col("height"),
            col("n_filter_types"),
            size(col("px")).cast("long").as("n_pixels"),
            pxSum.as("px_sum"), pxPosChecksum.as("pos_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |g AS (SELECT doc_id, n, bs,
             |        greatest(1, (n + 15) // 16) AS h
             |      FROM st)
             |SELECT doc_id, 16 AS width, CAST(h AS INTEGER) AS height,
             |  CAST(least(h, 5) AS INTEGER) AS n_filter_types,
             |  CAST(h * 16 AS BIGINT) AS n_pixels,
             |  CAST(coalesce(list_sum(bs), 0) AS BIGINT) AS px_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> bs[i+1] * ((i % 1000) + 1))), 0) AS BIGINT)
             |    AS pos_checksum
             |FROM g ORDER BY doc_id""".stripMargin),
      doc = "Real PNG gray8 decode: chunk walk + CRC + zlib inflate + all-five unfilters, coverage proven in-band"),

    // ------------------------------------------------------------------
    // q88: PNG TRUECOLOR (color type 2) decode — the same compressed
    // container as q87 at the bpp=3 byte stride PNG's filters actually
    // run at in the wild: Sub/Average/Paeth reference the byte THREE
    // positions back, so a decoder that hardcodes stride 1 (correct for
    // q87's grayscale) corrupts every filtered RGB row. Width is 8
    // PIXELS = 24 bytes/row; the logical byte stream is still exactly
    // the payload + zero tail, so the oracle replays stats from hex
    // byte pairs — per-channel sums (payload index i is channel i%3)
    // catch a channel-order bug, the positional checksum catches any
    // stride/filter/boundary misread. Filter coverage is in-band like
    // q87 (row%5 ⇒ least(h,5) distinct types). Cross-codec independence
    // (ImageIO both directions, TYPE_3BYTE_BGR order-flip pinned) is in
    // PngGray8Spec.
    QueryDef(
      "q88_png_rgb24",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val widthPx = 8 // 24 bytes per row
        corpus(s, dir).filter(col("modality") === "image")
          .select(col("doc_id"),
            expr(s"png_rgb24_encode(payload, $widthPx)").as("png"))
          .select(col("doc_id"),
            expr("png_width(png)").as("width"),
            expr("png_height(png)").as("height"),
            size(array_distinct(expr("png_filter_types(png)")))
              .as("n_filter_types"),
            expr("png_rgb24_pixels(png)").as("px"))
          // per-row reductions (q8g shape; see q85)
          .select(col("doc_id"), col("width"), col("height"),
            col("n_filter_types"),
            size(col("px")).cast("long").as("n_pixel_bytes"),
            pxChanSum(0).as("r_sum"), pxChanSum(1).as("g_sum"),
            pxChanSum(2).as("b_sum"), pxPosChecksum.as("pos_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |g AS (SELECT doc_id, n, bs,
             |        greatest(1, (n + 23) // 24) AS h
             |      FROM st)
             |SELECT doc_id, 8 AS width, CAST(h AS INTEGER) AS height,
             |  CAST(least(h, 5) AS INTEGER) AS n_filter_types,
             |  CAST(h * 24 AS BIGINT) AS n_pixel_bytes,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> CASE WHEN i % 3 = 0 THEN bs[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS r_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> CASE WHEN i % 3 = 1 THEN bs[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS g_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> CASE WHEN i % 3 = 2 THEN bs[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS b_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> bs[i+1] * ((i % 1000) + 1))), 0) AS BIGINT)
             |    AS pos_checksum
             |FROM g ORDER BY doc_id""".stripMargin),
      doc = "Real PNG truecolor decode: the bpp=3 filter stride + per-channel sums, stats replayed from payload hex"),

    // ------------------------------------------------------------------
    // q89: PNG PALETTE-INDEXED (color type 3) decode — the third PNG
    // form, and the first whose pixel VALUES do not appear in the IDAT
    // stream at all: the payload bytes are palette INDICES, unfiltered
    // at stride 1 and then resolved through the container's own PLTE
    // chunk (a 256-entry table the encoder stores from the fixed
    // bijective formula entry i = ((37i+11)%256,(73i+29)%256,
    // (151i+47)%256)). The decoder reads the STORED palette — never the
    // formula — while the oracle recomputes every channel sum straight
    // from the formula applied to payload hex bytes, so a PLTE
    // parse/placement/lookup bug desynchronizes the two. Palette entry
    // 0 is deliberately non-zero (11,29,47): the zero-filled tail of
    // the last row maps to non-zero RGB, forcing BOTH engines to model
    // the tail explicitly (q87/q88 could ignore theirs). Filter
    // coverage stays in-band (row%5 ⇒ least(h,5) distinct types); the
    // positional checksum runs over the RESOLVED RGB stream, so it
    // catches index-stream misreads and palette misindexing alike.
    QueryDef(
      "q89_png_palette",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val width = 16
        corpus(s, dir).filter(col("modality") === "image")
          .select(col("doc_id"),
            expr(s"png_palette_encode(payload, $width)").as("png"))
          .select(col("doc_id"),
            expr("png_width(png)").as("width"),
            expr("png_height(png)").as("height"),
            size(array_distinct(expr("png_filter_types(png)")))
              .as("n_filter_types"),
            expr("png_palette_rgb(png)").as("px"))
          // per-row reductions (q8g shape; see q85)
          .select(col("doc_id"), col("width"), col("height"),
            col("n_filter_types"),
            size(col("px")).cast("long").as("n_pixel_bytes"),
            pxChanSum(0).as("r_sum"), pxChanSum(1).as("g_sum"),
            pxChanSum(2).as("b_sum"), pxPosChecksum.as("pos_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |g AS (SELECT doc_id, n,
             |        list_concat(bs, [0 for _x in
             |          range((greatest(1, (n + 15) // 16)) * 16 - n)]) AS ix,
             |        greatest(1, (n + 15) // 16) AS h
             |      FROM st)
             |SELECT doc_id, 16 AS width, CAST(h AS INTEGER) AS height,
             |  CAST(least(h, 5) AS INTEGER) AS n_filter_types,
             |  CAST(h * 48 AS BIGINT) AS n_pixel_bytes,
             |  CAST(list_sum(list_transform(ix,
             |    v -> (37 * v + 11) % 256)) AS BIGINT) AS r_sum,
             |  CAST(list_sum(list_transform(ix,
             |    v -> (73 * v + 29) % 256)) AS BIGINT) AS g_sum,
             |  CAST(list_sum(list_transform(ix,
             |    v -> (151 * v + 47) % 256)) AS BIGINT) AS b_sum,
             |  CAST(list_sum(list_transform(range(len(ix)), p ->
             |      ((37 * ix[p+1] + 11) % 256) * ((3*p) % 1000 + 1)
             |    + ((73 * ix[p+1] + 29) % 256) * ((3*p+1) % 1000 + 1)
             |    + ((151 * ix[p+1] + 47) % 256) * ((3*p+2) % 1000 + 1)))
             |    AS BIGINT) AS pos_checksum
             |FROM g ORDER BY doc_id""".stripMargin),
      doc = "PNG palette decode: stride-1 unfilter + stored-PLTE lookup, " +
        "oracle recomputes RGB from the palette formula incl. the non-zero tail"),

    // ------------------------------------------------------------------
    // q8d: PNG ADAM7 INTERLACED decode — the progressive layout
    // real-world PNGs actually ship (every q87-q89 container is
    // sequential; a decoder that only handles interlace=0 cannot read
    // the wild's interlaced files). Genuinely different decode logic:
    // the image arrives as SEVEN sub-images, each with its own reduced
    // geometry and independently-filtered scanlines (filter neighbors
    // are within the PASS, not the final image), and deinterlacing
    // scatters pass pixel (r,c) to (ys+r·yStep, xs+c·xStep). The
    // encoder assigns filter type (global pass-row index)%5 so ≥5 pass
    // rows exercise all five unfilters — proven in-band by the emitted
    // distinct-filter count, whose oracle pin is the CLOSED-FORM Adam7
    // row count least(Σ_p ceil-terms, 5): an engine that mis-sized any
    // pass disagrees on this column before the checksum even runs.
    // The deinterlaced stream must equal payload + zero tail exactly
    // (the scatter is a bijection), so stats replay from payload hex
    // like q87; ImageIO cross-decode holds in BOTH directions including
    // a JDK-written progressive PNG (PngGray8Spec). Stats reduce per
    // row (aggregate/zip_with, the q8a shape) — no explode, no agg
    // shuffle, only the final sort.
    QueryDef(
      "q8d_png_adam7",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val width = 16
        corpus(s, dir).filter(col("modality") === "image")
          .select(col("doc_id"),
            expr(s"png_adam7_encode(payload, $width)").as("png"))
          .select(col("doc_id"),
            expr("png_width(png)").as("width"),
            expr("png_height(png)").as("height"),
            size(array_distinct(expr("png_adam7_filter_types(png)")))
              .as("n_filter_types"),
            expr("png_adam7_pixels(png)").as("px"))
          .select(col("doc_id"), col("width"), col("height"),
            col("n_filter_types"),
            size(col("px")).cast("long").as("n_pixels"),
            expr("""aggregate(px, CAST(0 AS BIGINT),
              (a, x) -> a + CAST(x AS BIGINT))""").as("px_sum"),
            expr("""aggregate(zip_with(px, sequence(0, size(px) - 1),
              (b, i) -> CAST(b AS BIGINT) * ((i % 1000) + 1)),
              CAST(0 AS BIGINT), (a, x) -> a + x)""").as("pos_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |g AS (SELECT doc_id, n, bs,
             |        greatest(1, (n + 15) // 16) AS h
             |      FROM st)
             |SELECT doc_id, 16 AS width, CAST(h AS INTEGER) AS height,
             |  CAST(least(2 * ((h + 7) // 8) + (h + 3) // 8
             |             + (h + 3) // 4 + (h + 1) // 4
             |             + (h + 1) // 2 + h // 2, 5) AS INTEGER)
             |    AS n_filter_types,
             |  CAST(h * 16 AS BIGINT) AS n_pixels,
             |  CAST(coalesce(list_sum(bs), 0) AS BIGINT) AS px_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> bs[i+1] * ((i % 1000) + 1))), 0) AS BIGINT)
             |    AS pos_checksum
             |FROM g ORDER BY doc_id""".stripMargin),
      doc = "PNG Adam7 interlaced decode: seven-pass unfilter + " +
        "deinterlace scatter, pass-row count pinned in closed form, " +
        "stats replayed from payload hex"),

    // ------------------------------------------------------------------
    // q8a: REAL image RESIZE — the first pixel transform that runs on
    // truly DECODED pixels (q82's resize plans over stub metadata; this
    // one consumes q88's real PNG decode). Every image is thumbnailed
    // to a fixed 4x4 RGB by integer nearest-neighbor: out pixel (oy,ox)
    // reads source pixel (floor(oy*h/4), floor(ox*w/4)) — the exact
    // floor-mapping variant so both engines replay it bit-for-bit (no
    // 0.5-center rounding to disagree on), and with h free per asset
    // the vertical axis exercises BOTH directions (h>4 downsamples,
    // h<4 duplicates rows). The transform itself is index arithmetic
    // over the decoded array via built-in higher-order functions — a
    // narrow codegen projection composed onto the decode expression, no
    // new Expression and no shuffle before the final per-asset agg.
    // That is the 100 TB thumbnailing shape: decode+resize fuse into
    // one pass over the asset column. The order-sensitive positional
    // checksum runs over the RESIZED bytes, so a transposed axis,
    // off-by-one source index, or channel swap all hash-fail against
    // the oracle's replay from payload hex (source byte k is payload
    // byte k, zero past the tail — the q88 stream identity).
    QueryDef(
      "q8a_image_resize",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val widthPx = 8 // source: q88's geometry, 24 bytes per row
        corpus(s, dir).filter(col("modality") === "image")
          .select(col("doc_id"),
            expr(s"png_rgb24_encode(payload, $widthPx)").as("png"))
          .select(col("doc_id"),
            expr("png_width(png)").as("width"),
            expr("png_height(png)").as("height"),
            expr("png_rgb24_pixels(png)").as("px"))
          .select(col("doc_id"), col("width"), col("height"),
            expr("""transform(sequence(0, 47), j ->
              element_at(px, CAST(
                (((j div 12) * height) div 4) * (width * 3)
                + ((((j % 12) div 3) * width) div 4) * 3
                + (j % 3) + 1 AS INT)))""").as("rp"))
          // the thumbnail is a FIXED 48-byte array, so its stats reduce
          // per ROW (aggregate/zip_with) instead of posexplode+groupBy —
          // that keeps the whole query one narrow pass (the q87-q89
          // explode pattern would re-aggregate rows that were never
          // split, pay an agg shuffle, and bait the optimizer into
          // pushing an inferred size(rp)>0 filter that inlines a second
          // copy of the decode)
          .select(col("doc_id"), col("width"), col("height"),
            size(col("rp")).cast("long").as("n_out_bytes"),
            expr("""aggregate(zip_with(rp, sequence(0, 47),
              (b, i) -> IF(i % 3 = 0, b, 0)),
              CAST(0 AS BIGINT), (a, x) -> a + x)""").as("r_sum"),
            expr("""aggregate(zip_with(rp, sequence(0, 47),
              (b, i) -> IF(i % 3 = 1, b, 0)),
              CAST(0 AS BIGINT), (a, x) -> a + x)""").as("g_sum"),
            expr("""aggregate(zip_with(rp, sequence(0, 47),
              (b, i) -> IF(i % 3 = 2, b, 0)),
              CAST(0 AS BIGINT), (a, x) -> a + x)""").as("b_sum"),
            expr("""aggregate(zip_with(rp, sequence(1, 48),
              (b, i) -> b * i),
              CAST(0 AS BIGINT), (a, x) -> a + x)""").as("pos_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |g AS (SELECT doc_id, n, bs,
             |        greatest(1, (n + 23) // 24) AS h
             |      FROM st),
             |rp AS (SELECT doc_id, h,
             |  [CASE WHEN ((((j // 12) * h) // 4) * 24
             |         + ((((j % 12) // 3) * 8) // 4) * 3 + (j % 3)) < n
             |     THEN bs[(((j // 12) * h) // 4) * 24
             |         + ((((j % 12) // 3) * 8) // 4) * 3 + (j % 3) + 1]
             |     ELSE 0 END
             |   for j in range(48)] AS rb
             |  FROM g)
             |SELECT doc_id, 8 AS width, CAST(h AS INTEGER) AS height,
             |  CAST(48 AS BIGINT) AS n_out_bytes,
             |  CAST(coalesce(list_sum(list_transform(range(len(rb)),
             |    i -> CASE WHEN i % 3 = 0 THEN rb[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS r_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(rb)),
             |    i -> CASE WHEN i % 3 = 1 THEN rb[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS g_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(rb)),
             |    i -> CASE WHEN i % 3 = 2 THEN rb[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS b_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(rb)),
             |    i -> rb[i+1] * (i + 1))), 0) AS BIGINT) AS pos_checksum
             |FROM rp ORDER BY doc_id""".stripMargin),
      doc = "Real nearest-neighbor resize on decoded PNG pixels: " +
        "integer floor mapping fused onto the decode as one narrow pass, " +
        "resized-byte positional checksum replayed from payload hex"),

    // ------------------------------------------------------------------
    // q86: REAL video container decode — the third modality goes
    // true-codec (expressions.AviDib): each video asset is packed as a
    // valid RIFF 'AVI ' (hdrl with avih/strl, movi list of '00db' DIB
    // frames, every frame itself a real BMP), then decoded by walking
    // the container — frame count cross-checked against the avih
    // header — and each extracted frame through the format-proven BMP
    // parser. Per-doc stats are exact integers: channel sums plus a
    // frame-AND-position-sensitive checksum (Σ byte·(j+1)·((f mod
    // 97)+1)), so a decoder that reordered frames or misread a chunk
    // boundary fails the oracle, which replays everything from hex
    // byte pairs (frameBytes=96 is a multiple of the BMP's 48-byte
    // logical row pair, so full frames carry no zero tail and payload
    // index i maps to (frame i/96, offset i%96) exactly; the empty-doc
    // corner — encode emits ONE all-zero frame — is mirrored by the
    // greatest(1, ·) guards on both frame count and frame height).
    QueryDef(
      "q86_avi_dib",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        // q8i's array-native shape: decode all frames into one nested
        // array and reduce per ROW — the old double posexplode
        // re-shuffled every pixel byte and let
        // InferFiltersFromGenerate clone both decodes into Filters
        def allFrames(ch: Int): org.apache.spark.sql.Column =
          expr(s"""aggregate(pxs, CAST(0 AS BIGINT), (acc, p) ->
            acc + aggregate(sequence(0, size(p) - 1), CAST(0 AS BIGINT),
              (a, j) -> a + IF(j % 3 = $ch,
                element_at(p, CAST(j + 1 AS INT)), 0)))""")
        corpus(s, dir).filter(col("modality") === "video")
          .select(col("doc_id"),
            expr("avi_dib_frames(avi_dib_encode(payload, 96))")
              .as("frames"))
          .select(col("doc_id"),
            expr("transform(frames, fb -> bmp_rgb24_pixels(fb))").as("pxs"))
          .select(col("doc_id"), size(col("pxs")).as("n_frames"),
            expr("""aggregate(pxs, CAST(0 AS BIGINT),
              (acc, p) -> acc + size(p))""").as("total_pixel_bytes"),
            allFrames(0).as("b_sum"), allFrames(1).as("g_sum"),
            allFrames(2).as("r_sum"),
            expr("""aggregate(sequence(0, size(pxs) - 1),
              CAST(0 AS BIGINT), (acc, f) -> acc +
                aggregate(
                  sequence(0, size(element_at(pxs, f + 1)) - 1),
                  CAST(0 AS BIGINT), (a, j) -> a +
                    element_at(element_at(pxs, f + 1),
                      CAST(j + 1 AS INT)) * (j + 1) * (f % 97 + 1)))""")
              .as("frame_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 2),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |d AS (SELECT doc_id, n, greatest(1, (n + 95) // 96) AS nf,
             |        n - 96 * (greatest(1, (n + 95) // 96) - 1) AS lastlen, bs
             |      FROM st)
             |SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
             |  CAST(96 * (nf - 1)
             |       + greatest(1, (((lastlen + 2) // 3) + 15) // 16) * 48
             |       AS BIGINT)
             |    AS total_pixel_bytes,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> CASE WHEN (i % 96) % 3 = 0 THEN bs[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS b_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> CASE WHEN (i % 96) % 3 = 1 THEN bs[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS g_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> CASE WHEN (i % 96) % 3 = 2 THEN bs[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS r_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(bs)),
             |    i -> bs[i+1] * ((i % 96) + 1) * ((i // 96) % 97 + 1))), 0)
             |    AS BIGINT) AS frame_checksum
             |FROM d ORDER BY doc_id""".stripMargin),
      doc = "Real AVI/DIB video decode: container walk + per-frame BMP parse, frame-order-sensitive checksum"),

    // ------------------------------------------------------------------
    // q8b: VIDEO FRAME THUMBNAILS — the full vision-pipeline
    // composition: walk the real AVI container (q86), parse every frame
    // through the real BMP decoder, and thumbnail each frame with q8a's
    // integer nearest-neighbor kernel (here 16x2 -> 4x1: out pixel ox
    // reads source (row 0, col 4*ox), i.e. in-frame byte 12*ox+c —
    // constants fixed by the encoder's 16px geometry and pinned
    // identically in the oracle). Per-frame thumbnails stay per-row
    // (aggregate/zip_with, the q8a reduction) so the only explode is
    // the genuinely variable axis — frames — and the final agg
    // re-groups per asset. The thumb checksum keeps q86's frame-AND-
    // position sensitivity (Σ byte·(j+1)·((f mod 97)+1)): a decoder
    // that reorders frames, or a resize that misindexes, hash-fails.
    // Channel naming follows the BMP's BGR byte order (offset 0 = B),
    // matching q86. The oracle replays from payload hex via the frame
    // stream identity (frame f byte k = payload byte f*96+k, zero past
    // the tail; thumbnail indices never exceed byte 38 < 48, so they
    // are always inside even the padded last frame).
    QueryDef(
      "q8b_video_thumbnails",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        // array-native frame axis (q8i shape; see q86): thumbnails and
        // their sums fold per ROW instead of exploding per frame
        def thumbChan(ch: Int): org.apache.spark.sql.Column =
          expr(s"""aggregate(rbs, CAST(0 AS BIGINT), (acc, rb) ->
            acc + aggregate(sequence(0, 11), CAST(0 AS BIGINT),
              (a, i) -> a + IF(i % 3 = $ch,
                element_at(rb, CAST(i + 1 AS INT)), 0)))""")
        corpus(s, dir).filter(col("modality") === "video")
          .select(col("doc_id"),
            expr("avi_dib_frames(avi_dib_encode(payload, 96))")
              .as("frames"))
          .select(col("doc_id"),
            expr("transform(frames, fb -> bmp_rgb24_pixels(fb))").as("pxs"))
          .select(col("doc_id"), size(col("pxs")).as("n_frames"),
            expr("""transform(pxs, p -> transform(sequence(0, 11), j ->
              element_at(p,
                CAST(12 * (j div 3) + (j % 3) + 1 AS INT))))""").as("rbs"))
          .select(col("doc_id"), col("n_frames"),
            size(col("rbs")).cast("long").as("n_thumbs"),
            thumbChan(0).as("b_sum"), thumbChan(1).as("g_sum"),
            thumbChan(2).as("r_sum"),
            expr("""aggregate(sequence(0, size(rbs) - 1),
              CAST(0 AS BIGINT), (acc, f) -> acc +
                aggregate(zip_with(element_at(rbs, f + 1),
                    sequence(1, 12), (b, i) -> b * i),
                  CAST(0 AS BIGINT), (a, x) -> a + x) * (f % 97 + 1))""")
              .as("thumb_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 2),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |d AS (SELECT doc_id, n, greatest(1, (n + 95) // 96) AS nf, bs
             |      FROM st),
             |rb AS (SELECT doc_id, nf,
             |  [CASE WHEN ((j // 12) * 96 + 12 * ((j % 12) // 3) + (j % 3)) < n
             |     THEN bs[(j // 12) * 96 + 12 * ((j % 12) // 3) + (j % 3) + 1]
             |     ELSE 0 END
             |   for j in range(nf * 12)] AS tb
             |  FROM d)
             |SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
             |  CAST(nf AS BIGINT) AS n_thumbs,
             |  CAST(coalesce(list_sum(list_transform(range(len(tb)),
             |    i -> CASE WHEN i % 3 = 0 THEN tb[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS b_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(tb)),
             |    i -> CASE WHEN i % 3 = 1 THEN tb[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS g_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(tb)),
             |    i -> CASE WHEN i % 3 = 2 THEN tb[i+1] ELSE 0 END)), 0)
             |    AS BIGINT) AS r_sum,
             |  CAST(coalesce(list_sum(list_transform(range(len(tb)),
             |    i -> tb[i+1] * ((i % 12) + 1) * ((i // 12) % 97 + 1))), 0)
             |    AS BIGINT) AS thumb_checksum
             |FROM rb ORDER BY doc_id""".stripMargin),
      doc = "Video frame thumbnails: AVI walk + per-frame BMP decode + " +
        "NN resize per frame, frame-and-position-sensitive checksum " +
        "replayed from payload hex"),

    // ------------------------------------------------------------------
    // q8e: IMAGE NEAR-DUP via perceptual dHash — the missing dedup
    // MODALITY: text has exact/MinHash/SimHash (q40-q44), embeddings
    // have cosine/SemDeDup (q45/q59); this is the image-side member,
    // the difference-hash every media pipeline runs before anything
    // expensive. The hash rides the REAL codec path (q87's PNG encode →
    // chunk walk → inflate → unfilter → pixels), then 64 gradient bits
    // from a 9×8 nearest-neighbor grid sample (floor index mapping,
    // q8a's exact arithmetic — no means, so every step is integer and
    // the oracle replays pixels, grid, bits, hash halves, XOR hamming
    // AND ranking from payload bytes). The hash is emitted as two
    // 32-bit halves in BIGINTs so no sign bit is ever touched on either
    // engine. Scale: hashing is one narrow codegen projection per
    // asset (64 bits of state out of arbitrarily many pixels);
    // retrieval broadcasts the bounded query set and ranks by XOR
    // popcount — the q50 serving shape with a 16-byte signature
    // instead of a float vector, which is the point: candidate
    // pairing at 100 TB happens on signatures, never on pixels.
    // ------------------------------------------------------------------
    QueryDef(
      "q8e_image_phash",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        import s.implicits._
        def half(off: Int): String = {
          // bit i+off: grid row gy=(i+off) div 8, col gx=(i+off)%8;
          // NN sample row sy=(gy*h) div 8, cols sx=(gx*16) div 9 and
          // ((gx+1)*16) div 9 — px is h*16 long, so indexes are in range
          def pix(gxExpr: String): String =
            s"element_at(px, CAST(((((i+$off) div 8) * h) div 8) * 16 + " +
              s"($gxExpr * 16) div 9 + 1 AS INT))"
          s"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, i) -> " +
            s"acc + shiftleft(IF(${pix(s"((i+$off) % 8)")} > " +
            s"${pix(s"(((i+$off) % 8) + 1)")}, CAST(1 AS BIGINT), " +
            s"CAST(0 AS BIGINT)), i))"
        }
        val hashed = corpus(s, dir).filter($"modality" === "image")
          .filter($"doc_id" < 3000) // bounded slice at any sf (q45 rule)
          .select($"doc_id", expr("png_gray8_encode(payload, 16)").as("png"))
          .select($"doc_id", expr("png_gray8_pixels(png)").as("px"))
          .withColumn("h", expr("size(px) div 16"))
          .select($"doc_id", expr(half(0)).as("hash_lo"),
            expr(half(32)).as("hash_hi"))
        val q = hashed.filter($"doc_id" % 300 === 0)
          .select($"doc_id".as("q_id"), $"hash_lo".as("qlo"),
            $"hash_hi".as("qhi"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"hamming", $"neighbor_id")
        hashed.join(broadcast(q), $"doc_id" =!= $"q_id")
          .select($"q_id", $"doc_id".as("neighbor_id"),
            (bit_count($"qlo".bitwiseXOR($"hash_lo")) +
              bit_count($"qhi".bitwiseXOR($"hash_hi")))
              .cast("long").as("hamming"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter($"rank" <= 3)
          .orderBy($"q_id", $"rank")
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0 AND doc_id < 3000),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |g AS (SELECT doc_id, n, bs,
             |        greatest(1, (n + 15) // 16) AS h
             |      FROM st),
             |hsh AS (
             |  SELECT doc_id,
             |    CAST(coalesce(list_sum([CASE WHEN
             |        coalesce(bs[(((b // 8) * h) // 8) * 16
             |                    + ((b % 8) * 16) // 9 + 1], 0) >
             |        coalesce(bs[(((b // 8) * h) // 8) * 16
             |                    + (((b % 8) + 1) * 16) // 9 + 1], 0)
             |      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END
             |      for b in range(0, 32)]), 0) AS BIGINT) AS hash_lo,
             |    CAST(coalesce(list_sum([CASE WHEN
             |        coalesce(bs[((((b + 32) // 8) * h) // 8) * 16
             |                    + (((b + 32) % 8) * 16) // 9 + 1], 0) >
             |        coalesce(bs[((((b + 32) // 8) * h) // 8) * 16
             |                    + ((((b + 32) % 8) + 1) * 16) // 9 + 1], 0)
             |      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END
             |      for b in range(0, 32)]), 0) AS BIGINT) AS hash_hi
             |  FROM g),
             |p AS (
             |  SELECT q.doc_id AS q_id, c.doc_id AS neighbor_id,
             |    CAST(bit_count(xor(q.hash_lo, c.hash_lo)) +
             |         bit_count(xor(q.hash_hi, c.hash_hi)) AS BIGINT)
             |      AS hamming
             |  FROM hsh q JOIN hsh c ON c.doc_id <> q.doc_id
             |  WHERE q.doc_id % 300 = 0),
             |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id
             |        ORDER BY hamming, neighbor_id) AS BIGINT) AS rank
             |      FROM p)
             |SELECT q_id, neighbor_id, hamming, rank FROM r
             |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin),
      doc = "Image near-dup retrieval: perceptual dHash over the real " +
        "PNG decode (64 NN-grid gradient bits as two 32-bit halves), " +
        "broadcast queries ranked by XOR popcount — signatures, not " +
        "pixels, cross the network"),

    // ------------------------------------------------------------------
    // q8f: REAL baseline JPEG decode (expressions.JpegGray8) — the
    // dominant real-world image codec and the family's first ENTROPY-
    // CODED + TRANSFORM format: the decoder runs a true huffman
    // bitstream decode (canonical tables from DHT, byte-unstuffing),
    // dequant, zigzag and an 8×8 IDCT before a pixel exists. JPEG is
    // lossy, so the oracle-replay trick needs the encode to be exactly
    // invertible: each payload byte becomes one CONSTANT 8×8 block
    // (DC-only, all-ones quant table), whose IDCT is exactly integral
    // in any compliant decoder — DuckDB replays every statistic from
    // payload bytes (padded to the block grid) while the decoder still
    // walks the full entropy path. The n_dc_cats column (distinct DC
    // magnitude categories ACTUALLY DECODED from the bitstream, pinned
    // by the oracle's recomputation from payload differentials) proves
    // the huffman decode ran — a decoder shortcutting the stream cannot
    // produce it. Lossy-path coverage (real AC coefficients, ImageIO's
    // own tables, non-multiple-of-8 geometry) is JpegGray8Spec's
    // cross-decode direction. Narrow per-asset work; the only shuffle
    // is the final grouped agg.
    QueryDef(
      "q8f_jpeg_gray8",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val wb = 4 // blocks per row → 32-pixel-wide images
        corpus(s, dir).filter(col("modality") === "image")
          .select(col("doc_id"),
            expr(s"jpeg_gray8_encode(payload, $wb)").as("jpeg"))
          .select(col("doc_id"),
            expr("jpeg_width(jpeg)").as("width"),
            expr("jpeg_height(jpeg)").as("height"),
            size(array_distinct(expr("jpeg_dc_categories(jpeg)")))
              .as("n_dc_cats"),
            expr("jpeg_gray8_pixels(jpeg)").as("px"))
          // per-row reductions (q8g shape; see q85)
          .select(col("doc_id"), col("width"), col("height"),
            col("n_dc_cats"),
            size(col("px")).cast("long").as("n_pixels"),
            pxSum.as("px_sum"), pxPosChecksum.as("pos_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |g AS (SELECT doc_id, n,
             |        bs || [0 for x in range(4 * greatest(1, (n + 3) // 4) - n)]
             |          AS bf,
             |        greatest(1, (n + 3) // 4) AS h
             |      FROM st)
             |SELECT doc_id, 32 AS width, CAST(h * 8 AS INTEGER) AS height,
             |  len(list_distinct([
             |    CASE WHEN d = 0 THEN 0
             |         ELSE CAST(floor(log2(abs(d))) AS INT) + 1 END
             |    for d in [8*(bf[i+1]-128) -
             |              CASE WHEN i = 0 THEN 0 ELSE 8*(bf[i]-128) END
             |              for i in range(len(bf))]])) AS n_dc_cats,
             |  CAST(h * 4 * 64 AS BIGINT) AS n_pixels,
             |  CAST(64 * coalesce(list_sum(bf), 0) AS BIGINT) AS px_sum,
             |  CAST(coalesce(list_sum([bf[i+1] * list_sum([
             |      ((((i // 4) * 8 + p // 8) * 32 + (i % 4) * 8 + (p % 8))
             |        % 1000) + 1
             |      for p in range(64)])
             |    for i in range(len(bf))]), 0) AS BIGINT) AS pos_checksum
             |FROM g ORDER BY doc_id""".stripMargin),
      doc = "Real baseline JPEG decode: marker walk + canonical huffman " +
        "entropy decode + dequant + zigzag + IDCT, DC-category coverage " +
        "proven in-band, exact despite the lossy format (DC-only blocks)"),

    // ------------------------------------------------------------------
    // q8g: baseline COLOR JPEG — YCbCr 4:2:0, the MCU-interleaved
    // chroma-subsampled layout real crawled JPEGs overwhelmingly use,
    // and everything q8f's grayscale path structurally cannot exercise:
    // interleaved MCU scan order (4 Y + Cb + Cr per MCU), SEPARATE
    // huffman table sets (Annex K luma AND chroma), per-component DC
    // predictors and quant tables, subsampled chroma planes,
    // upsampling, and the JFIF YCbCr→RGB matrix. Exactness under a
    // lossy, subsampled codec: four payload bytes become each MCU's
    // four constant Y blocks while Cb/Cr are CONSTANT image-wide
    // (doc_id-derived) — a constant chroma plane upsamples to itself
    // under ANY decoder's filter, so the RGB output is exactly
    // replayable (conversion = floor(x·matrix + 0.5), the tie-safe
    // rule both engines share). Per-doc stats reduce per ROW with
    // aggregate() over the decoded array (the q8a shape — no explode,
    // no extra shuffle); n_dc_cats pins the Y entropy decode in-band.
    // doc_id < 1500 keeps the decoded-pixel volume bounded at any sf
    // (the q45 bounded-slice rule). ImageIO cross-decode both
    // directions (exact ours→ImageIO ±1, smooth-gradient theirs→ours
    // within upsampling-filter freedom) is JpegGray8Spec's color half.
    QueryDef(
      "q8g_jpeg_color420",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val wm = 2 // MCUs per row → 32-pixel-wide images
        val cbC = (pmod(col("doc_id") * 37 + 11, lit(256))).cast("int")
        val crC = (pmod(col("doc_id") * 73 + 29, lit(256))).cast("int")
        def chanSum(ch: Int): Column =
          expr(s"aggregate(sequence(0, size(px) div 3 - 1), " +
            s"CAST(0 AS BIGINT), (acc, i) -> " +
            s"acc + element_at(px, CAST(i * 3 + ${ch + 1} AS INT)))")
        corpus(s, dir).filter(col("modality") === "image")
          .filter(col("doc_id") < 1500)
          .select(col("doc_id"), cbC.as("cb"), crC.as("cr"),
            expr(s"jpeg_ycbcr420_encode(payload, $wm, " +
              s"CAST(pmod(doc_id * 37 + 11, 256) AS INT), " +
              s"CAST(pmod(doc_id * 73 + 29, 256) AS INT))").as("jpeg"))
          .select(col("doc_id"), col("cb"), col("cr"),
            expr("jpeg_width(jpeg)").as("width"),
            expr("jpeg_height(jpeg)").as("height"),
            size(array_distinct(expr("jpeg_dc_categories(jpeg)")))
              .as("n_dc_cats"),
            expr("jpeg_rgb_pixels(jpeg)").as("px"))
          .select(col("doc_id"), col("cb"), col("cr"), col("width"),
            col("height"), col("n_dc_cats"),
            (size(col("px")) / 3).cast("long").as("n_pixels"),
            chanSum(0).as("r_sum"), chanSum(1).as("g_sum"),
            chanSum(2).as("b_sum"),
            expr("aggregate(sequence(0, size(px) - 1), " +
              "CAST(0 AS BIGINT), (acc, i) -> " +
              "acc + element_at(px, CAST(i + 1 AS INT)) * ((i % 1000) + 1))")
              .as("rgb_checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0 AND doc_id < 1500),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    CAST((doc_id * 37 + 11) % 256 AS INT) AS cb,
             |    CAST((doc_id * 73 + 29) % 256 AS INT) AS cr,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |g AS (SELECT doc_id, n, cb, cr,
             |        bs || [0 for x in range(8 * greatest(1, (n + 7) // 8) - n)]
             |          AS bf,
             |        greatest(1, (n + 7) // 8) AS hm
             |      FROM st),
             |-- per-byte RGB via the exact conversion both engines share
             |rgb AS (SELECT doc_id, cb, cr, bf, hm,
             |    [LEAST(255, GREATEST(0,
             |       CAST(floor(y + 1.402*(cr - 128) + 0.5) AS INT)))
             |     for y in bf] AS vr,
             |    [LEAST(255, GREATEST(0,
             |       CAST(floor(y - 0.344136*(cb - 128)
             |                    - 0.714136*(cr - 128) + 0.5) AS INT)))
             |     for y in bf] AS vg,
             |    [LEAST(255, GREATEST(0,
             |       CAST(floor(y + 1.772*(cb - 128) + 0.5) AS INT)))
             |     for y in bf] AS vb
             |  FROM g)
             |SELECT doc_id, cb, cr, 32 AS width,
             |  CAST(hm * 16 AS INTEGER) AS height,
             |  len(list_distinct([
             |    CASE WHEN d = 0 THEN 0
             |         ELSE CAST(floor(log2(abs(d))) AS INT) + 1 END
             |    for d in [8*(bf[i+1]-128) -
             |              CASE WHEN i = 0 THEN 0 ELSE 8*(bf[i]-128) END
             |              for i in range(len(bf))]])) AS n_dc_cats,
             |  CAST(hm * 2 * 256 AS BIGINT) AS n_pixels,
             |  CAST(64 * coalesce(list_sum(vr), 0) AS BIGINT) AS r_sum,
             |  CAST(64 * coalesce(list_sum(vg), 0) AS BIGINT) AS g_sum,
             |  CAST(64 * coalesce(list_sum(vb), 0) AS BIGINT) AS b_sum,
             |  CAST(coalesce(list_sum([
             |    vr[i+1] * list_sum([(((((((i//4))//2)*16 + (((i%4))//2)*8
             |        + p//8)*32 + (((i//4))%2)*16 + (((i%4))%2)*8 + p%8)*3)
             |        % 1000) + 1 for p in range(64)]) +
             |    vg[i+1] * list_sum([(((((((i//4))//2)*16 + (((i%4))//2)*8
             |        + p//8)*32 + (((i//4))%2)*16 + (((i%4))%2)*8 + p%8)*3 + 1)
             |        % 1000) + 1 for p in range(64)]) +
             |    vb[i+1] * list_sum([(((((((i//4))//2)*16 + (((i%4))//2)*8
             |        + p//8)*32 + (((i//4))%2)*16 + (((i%4))%2)*8 + p%8)*3 + 2)
             |        % 1000) + 1 for p in range(64)])
             |    for i in range(len(bf))]), 0) AS BIGINT) AS rgb_checksum
             |FROM rgb ORDER BY doc_id""".stripMargin),
      doc = "Baseline COLOR JPEG (YCbCr 4:2:0): interleaved MCUs, dual " +
        "Annex K table sets, per-component DC state, chroma upsample, " +
        "JFIF YCbCr-to-RGB — exact under constant chroma, Y entropy " +
        "decode pinned in-band"),

    // ------------------------------------------------------------------
    // q8j: JPEG RESTART MARKERS (DRI + RSTn) — the resync machinery
    // real encoders emit so a corrupted scan loses one interval, not
    // the rest of the image, and the one baseline feature q8f/q8g's
    // single-segment scans structurally cannot exercise: byte-aligned
    // RSTn consumption, the cycling RST0..RST7 index check, and the
    // per-interval DC PREDICTOR RESET. Interval 3 is deliberately
    // coprime to the 4-block row so restarts land mid-row. Exactness
    // proofs, all in-band: pixels replay from payload bytes (a decoder
    // ignoring the reset has a wrong DC chain from the first boundary
    // — px_sum/pos_checksum catch it); n_dc_cats is recomputed by the
    // oracle from RESET differentials (the first block of each
    // interval codes dc − 0, not dc − prev, so the category set
    // differs from q8f's on the same payload); n_rst counts the
    // markers in the ACTUAL stream via jpeg_rst_count — a marker walk
    // that scans ONLY the entropy segment after SOS (a whole-container
    // byte-pair scan would false-positive when a header u16 encodes
    // 0xFFD0..D7, e.g. SOF height 65488 on a ~32 KB payload), pinned
    // against the oracle's analytic (blocks − 1) div interval. Same
    // narrow per-asset no-explode shape as q8g; the only shuffle is
    // the final sort.
    QueryDef(
      "q8j_jpeg_restart",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        corpus(s, dir).filter(col("modality") === "image")
          .select(col("doc_id"),
            expr(s"jpeg_gray8_encode_rst(payload, $JpegRstWb, " +
              s"$JpegRstInterval)").as("jpeg"))
          .select(col("doc_id"),
            expr("jpeg_width(jpeg)").as("width"),
            expr("jpeg_height(jpeg)").as("height"),
            size(array_distinct(expr("jpeg_dc_categories(jpeg)")))
              .as("n_dc_cats"),
            expr("CAST(jpeg_rst_count(jpeg) AS BIGINT)").as("n_rst"),
            expr("jpeg_gray8_pixels(jpeg)").as("px"))
          .select(col("doc_id"), col("width"), col("height"),
            col("n_dc_cats"), col("n_rst"),
            size(col("px")).cast("long").as("n_pixels"),
            expr("aggregate(px, CAST(0 AS BIGINT), (a, x) -> a + x)")
              .as("px_sum"),
            expr("aggregate(sequence(0, size(px) - 1), " +
              "CAST(0 AS BIGINT), (acc, i) -> " +
              "acc + element_at(px, CAST(i + 1 AS INT)) * ((i % 1000) + 1))")
              .as("pos_checksum"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 0),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |g AS (SELECT doc_id, n,
             |        bs || [0 for x in range($JpegRstWb *
             |          greatest(1, (n + ${JpegRstWb - 1}) // $JpegRstWb) - n)]
             |          AS bf,
             |        greatest(1, (n + ${JpegRstWb - 1}) // $JpegRstWb) AS h
             |      FROM st)
             |SELECT doc_id, ${JpegRstWb * 8} AS width,
             |  CAST(h * 8 AS INTEGER) AS height,
             |  len(list_distinct([
             |    CASE WHEN d = 0 THEN 0
             |         ELSE CAST(floor(log2(abs(d))) AS INT) + 1 END
             |    for d in [8*(bf[i+1]-128) -
             |              CASE WHEN i % $JpegRstInterval = 0 THEN 0
             |                   ELSE 8*(bf[i]-128) END
             |              for i in range(len(bf))]])) AS n_dc_cats,
             |  CAST((len(bf) - 1) // $JpegRstInterval AS BIGINT) AS n_rst,
             |  CAST(h * $JpegRstWb * 64 AS BIGINT) AS n_pixels,
             |  CAST(64 * coalesce(list_sum(bf), 0) AS BIGINT) AS px_sum,
             |  CAST(coalesce(list_sum([bf[i+1] * list_sum([
             |      ((((i // $JpegRstWb) * 8 + p // 8) * ${JpegRstWb * 8}
             |          + (i % $JpegRstWb) * 8 + (p % 8)) % 1000) + 1
             |      for p in range(64)])
             |    for i in range(len(bf))]), 0) AS BIGINT) AS pos_checksum
             |FROM g ORDER BY doc_id""".stripMargin),
      doc = "JPEG restart markers: DRI + cycling RSTn + per-interval " +
        "DC predictor reset, decoded through the real resync path — " +
        "marker count, reset differentials, and pixels all pinned " +
        "in-band"),

    // ------------------------------------------------------------------
    // q8k: IMA ADPCM DECODE — the COMPRESSED audio codec, closing the
    // per-modality symmetry the image side already has (PNG = zlib,
    // JPEG = huffman+DCT; audio stopped at uncompressed PCM16). IMA
    // ADPCM (RIFF wFormatTag 0x11) is the classic 4:1
    // adaptive-differential codec: each 4-bit nibble advances an
    // integer predictor by a step-table delta and adapts the step
    // index — ALL integer arithmetic, so the oracle replays the full
    // predictor chain from payload hex (a single list fold carrying
    // [stepIndex] ++ samples — no float, no tolerance). The container
    // is real multi-block structure: 36-byte blocks whose 4-byte
    // headers carry the RUNNING (predictor, stepIndex) — the format's
    // byte-aligned resync machinery (q8j's restart markers, audio
    // edition), with the header predictor emitted as the block's first
    // sample per the standard. In-band pins: n_blocks is computed from
    // the SAMPLE-COUNT IDENTITY n_samples − 2·payload_bytes (each
    // byte = 2 nibble samples, each block adds 1 header sample)
    // against the oracle's analytic ceil(bytes/32) — any lost header,
    // dropped nibble, or block misalignment breaks it; final_predictor
    // pins the entire chain; the positional checksum pins every
    // sample in order. Plan: encode+decode fuse into one narrow
    // codegen projection per asset, per-row reductions (no explode);
    // the only shuffle is the final sort. At 100 TB: embarrassingly
    // parallel per-asset decode, scalar summaries ship.
    QueryDef(
      "q8k_adpcm_audio",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        corpus(s, dir).filter(col("modality") === "audio")
          .filter(expr("octet_length(payload) >= 1"))
          .select(col("doc_id"),
            octet_length(col("payload")).as("nb"),
            expr("wav_ima_samples(wav_ima_encode(payload, 8000))")
              .as("smp"))
          .select(col("doc_id"),
            size(col("smp")).as("n_samples"),
            (size(col("smp")) - lit(2) * col("nb")).cast("long")
              .as("n_blocks"),
            element_at(col("smp"), -1).as("final_predictor"),
            expr("aggregate(smp, CAST(0 AS BIGINT), (a, x) -> a + x)")
              .as("sample_sum"),
            expr("aggregate(sequence(0, size(smp) - 1), " +
              "CAST(0 AS BIGINT), (acc, i) -> " +
              "acc + element_at(smp, CAST(i + 1 AS INT)) * ((i % 1000) + 1))")
              .as("pos_checksum"),
            array_min(col("smp")).as("min_sample"),
            array_max(col("smp")).as("max_sample"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH a AS (
             |  SELECT doc_id, encode(text) AS b FROM documents
             |  WHERE doc_id % 3 = 1 AND octet_length(encode(text)) >= 1),
             |nib AS (
             |  SELECT doc_id, octet_length(b) AS nbytes,
             |    flatten([[v & 15, v >> 4] FOR v IN
             |      [CAST(('0x' || substr(hex(b), 2*i+1, 2)) AS INT)
             |       for i in range(0, octet_length(b))]]) AS ns
             |  FROM a),
             |ded AS (
             |  SELECT doc_id, nbytes,
             |    reduce(
             |      [[0]] || [[ns[g+1], g] for g in range(0, len(ns))],
             |      (acc, x) ->
             |        [least(88, greatest(0,
             |           acc[1] + [-1,-1,-1,-1,2,4,6,8][(x[1] & 7) + 1]))]
             |        || acc[2:]
             |        || CASE WHEN (x[2] % 64) = 0
             |             THEN [CASE WHEN len(acc) >= 2
             |                        THEN acc[-1] ELSE 0 END]
             |             ELSE CAST([] AS INTEGER[]) END
             |        || [least(32767, greatest(-32768,
             |             CASE WHEN len(acc) >= 2 THEN acc[-1] ELSE 0 END
             |             + (CASE WHEN (x[1] & 8) != 0 THEN -1 ELSE 1 END)
             |               * (($ImaStepsSql[acc[1] + 1] >> 3)
             |                  + CASE WHEN (x[1] & 4) != 0
             |                         THEN $ImaStepsSql[acc[1] + 1]
             |                         ELSE 0 END
             |                  + CASE WHEN (x[1] & 2) != 0
             |                         THEN ($ImaStepsSql[acc[1] + 1] >> 1)
             |                         ELSE 0 END
             |                  + CASE WHEN (x[1] & 1) != 0
             |                         THEN ($ImaStepsSql[acc[1] + 1] >> 2)
             |                         ELSE 0 END)))]
             |      )[2:] AS smp
             |  FROM nib)
             |SELECT doc_id,
             |  CAST(len(smp) AS INTEGER) AS n_samples,
             |  CAST((nbytes + 31) // 32 AS BIGINT) AS n_blocks,
             |  smp[-1] AS final_predictor,
             |  CAST(list_sum(smp) AS BIGINT) AS sample_sum,
             |  CAST(list_sum([smp[i+1] * CAST((i % 1000) + 1 AS BIGINT)
             |    for i in range(0, len(smp))]) AS BIGINT) AS pos_checksum,
             |  list_min(smp) AS min_sample,
             |  list_max(smp) AS max_sample
             |FROM ded ORDER BY doc_id""".stripMargin),
      doc = "Real IMA ADPCM decode (multi-block container, running-" +
        "state headers): integer predictor chain replayed nibble-for-" +
        "nibble by the oracle, block structure pinned by the sample-" +
        "count identity"),

    // ------------------------------------------------------------------
    // q8m: µ-LAW DECODE (G.711, RIFF wFormatTag 7) — the COMPANDED
    // audio codec, the last audio-format box: PCM16 is uncompressed
    // (q84), ADPCM is adaptive-differential with running state (q8k),
    // µ-law is logarithmic companding with NO state — each 8-bit code
    // expands independently to the canonical 16-bit reconstruction
    // level (the ±32124 table, computed not tabulated: u = ~code,
    // (mantissa << (exp+3)) + (132 << exp) − 132, sign from bit 7).
    // Statelessness is the format's defining contrast with q8k and
    // exactly why its oracle needs no fold: every sample replays from
    // payload hex with per-byte integer arithmetic. In-band pins: the
    // 1-byte-per-sample identity (n_samples = payload bytes — the
    // companded 2:1 size ratio vs PCM16, structural), the final
    // sample, the positional checksum pinning every sample in order,
    // and min/max. Plan: encode+decode fuse into one narrow codegen
    // projection per asset (no explode); the only shuffle is the
    // final sort. At 100 TB: embarrassingly parallel per-asset
    // decode, scalar summaries ship.
    QueryDef(
      "q8m_mulaw_audio",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        corpus(s, dir).filter(col("modality") === "audio")
          .filter(expr("octet_length(payload) >= 1"))
          .select(col("doc_id"),
            octet_length(col("payload")).as("nb"),
            expr("wav_mulaw_samples(wav_mulaw_encode(payload, 8000))")
              .as("smp"))
          .select(col("doc_id"),
            size(col("smp")).as("n_samples"),
            (size(col("smp")) === col("nb")).as("byte_sample_identity"),
            element_at(col("smp"), -1).as("final_sample"),
            expr("aggregate(smp, CAST(0 AS BIGINT), (a, x) -> a + x)")
              .as("sample_sum"),
            expr("aggregate(sequence(0, size(smp) - 1), " +
              "CAST(0 AS BIGINT), (acc, i) -> " +
              "acc + element_at(smp, CAST(i + 1 AS INT)) * ((i % 1000) + 1))")
              .as("pos_checksum"),
            array_min(col("smp")).as("min_sample"),
            array_max(col("smp")).as("max_sample"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS b FROM documents
             |  WHERE doc_id % 3 = 1 AND octet_length(encode(text)) >= 1),
             |u AS (
             |  SELECT doc_id, octet_length(b) AS nbytes,
             |    [255 - CAST(('0x' || substr(hex(b), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(b))] AS us
             |  FROM a),
             |d AS (
             |  SELECT doc_id, nbytes,
             |    [CAST(CASE WHEN (x & 128) != 0
             |       THEN -(((x & 15) << (((x >> 4) & 7) + 3))
             |              + (132 << ((x >> 4) & 7)) - 132)
             |       ELSE ((x & 15) << (((x >> 4) & 7) + 3))
             |              + (132 << ((x >> 4) & 7)) - 132
             |     END AS INTEGER) for x in us] AS smp
             |  FROM u)
             |SELECT doc_id,
             |  CAST(len(smp) AS INTEGER) AS n_samples,
             |  len(smp) = nbytes AS byte_sample_identity,
             |  smp[-1] AS final_sample,
             |  CAST(list_sum(smp) AS BIGINT) AS sample_sum,
             |  CAST(list_sum([smp[i+1] * CAST((i % 1000) + 1 AS BIGINT)
             |    for i in range(0, len(smp))]) AS BIGINT) AS pos_checksum,
             |  list_min(smp) AS min_sample,
             |  list_max(smp) AS max_sample
             |FROM d ORDER BY doc_id""".stripMargin),
      doc = "G.711 mu-law decode (companded audio): stateless per-" +
        "byte expansion to the canonical 16-bit table, every sample " +
        "replayed from payload hex, byte-per-sample identity pinned " +
        "in-band"),

    // ------------------------------------------------------------------
    // q8n: A-LAW DECODE (G.711, RIFF wFormatTag 6) — the EUROPEAN
    // companding branch, closing the other half of the G.711 box q8m
    // opened. Same stateless 1-byte-per-sample structure, genuinely
    // different curve: u = code ^ 0x55 (even-bit inversion, vs
    // µ-law's full complement), segment-0 is linear-with-offset
    // ((m<<4)+8) instead of everywhere-log, range ±32256 vs ±32124,
    // and the SIGN POLARITY IS FLIPPED (bit 7 set ⇒ positive). Those
    // asymmetries are exactly what the cross-law gate pins: the same
    // payload is decoded under BOTH laws in one projection and the
    // per-asset L1 distance between the two reconstructions rides the
    // result — a wrong sign convention, transfer curve, or inversion
    // mask in either codec shifts it, and DuckDB replays both laws
    // per byte from payload hex. In-band pins mirror q8m (byte-per-
    // sample identity, final sample, positional checksum, min/max).
    // Plan: both encode+decode pairs fuse into one narrow codegen
    // projection per asset (no explode); the only shuffle is the
    // final sort. At 100 TB: embarrassingly parallel per-asset
    // decode, scalar summaries ship.
    QueryDef(
      "q8n_alaw_audio",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        corpus(s, dir).filter(col("modality") === "audio")
          .filter(expr("octet_length(payload) >= 1"))
          .select(col("doc_id"),
            octet_length(col("payload")).as("nb"),
            expr("wav_alaw_samples(wav_alaw_encode(payload, 8000))")
              .as("smp"),
            expr("wav_mulaw_samples(wav_mulaw_encode(payload, 8000))")
              .as("mul"))
          .select(col("doc_id"),
            size(col("smp")).as("n_samples"),
            (size(col("smp")) === col("nb")).as("byte_sample_identity"),
            element_at(col("smp"), -1).as("final_sample"),
            expr("aggregate(smp, CAST(0 AS BIGINT), (a, x) -> a + x)")
              .as("sample_sum"),
            expr("aggregate(sequence(0, size(smp) - 1), " +
              "CAST(0 AS BIGINT), (acc, i) -> " +
              "acc + element_at(smp, CAST(i + 1 AS INT)) * ((i % 1000) + 1))")
              .as("pos_checksum"),
            array_min(col("smp")).as("min_sample"),
            array_max(col("smp")).as("max_sample"),
            expr("aggregate(zip_with(smp, mul, (a, b) -> " +
              "CAST(abs(a - b) AS BIGINT)), CAST(0 AS BIGINT), " +
              "(acc, d) -> acc + d)").as("vs_mulaw_l1"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS b FROM documents
             |  WHERE doc_id % 3 = 1 AND octet_length(encode(text)) >= 1),
             |u AS (
             |  SELECT doc_id, octet_length(b) AS nbytes,
             |    [xor(CAST(('0x' || substr(hex(b), 2*i+1, 2)) AS INT), 85)
             |     for i in range(0, octet_length(b))] AS us,
             |    [255 - CAST(('0x' || substr(hex(b), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(b))] AS ms
             |  FROM a),
             |d AS (
             |  SELECT doc_id, nbytes,
             |    [CAST(CASE WHEN (x & 128) != 0
             |       THEN CASE WHEN ((x >> 4) & 7) = 0
             |              THEN ((x & 15) << 4) + 8
             |              ELSE (((x & 15) << 4) + 264)
             |                     << (((x >> 4) & 7) - 1) END
             |       ELSE -(CASE WHEN ((x >> 4) & 7) = 0
             |              THEN ((x & 15) << 4) + 8
             |              ELSE (((x & 15) << 4) + 264)
             |                     << (((x >> 4) & 7) - 1) END)
             |     END AS INTEGER) for x in us] AS smp,
             |    [CAST(CASE WHEN (x & 128) != 0
             |       THEN -(((x & 15) << (((x >> 4) & 7) + 3))
             |              + (132 << ((x >> 4) & 7)) - 132)
             |       ELSE ((x & 15) << (((x >> 4) & 7) + 3))
             |              + (132 << ((x >> 4) & 7)) - 132
             |     END AS INTEGER) for x in ms] AS mul
             |  FROM u)
             |SELECT doc_id,
             |  CAST(len(smp) AS INTEGER) AS n_samples,
             |  len(smp) = nbytes AS byte_sample_identity,
             |  smp[-1] AS final_sample,
             |  CAST(list_sum(smp) AS BIGINT) AS sample_sum,
             |  CAST(list_sum([smp[i+1] * CAST((i % 1000) + 1 AS BIGINT)
             |    for i in range(0, len(smp))]) AS BIGINT) AS pos_checksum,
             |  list_min(smp) AS min_sample,
             |  list_max(smp) AS max_sample,
             |  CAST(list_sum([abs(smp[i+1] - mul[i+1])
             |    for i in range(0, len(smp))]) AS BIGINT) AS vs_mulaw_l1
             |FROM d ORDER BY doc_id""".stripMargin),
      doc = "G.711 A-law decode (companded audio): even-bit-inverted " +
        "segment expansion to the canonical 16-bit table, every sample " +
        "replayed from payload hex, cross-law L1 distance vs mu-law " +
        "pinned in-band"),

    // ------------------------------------------------------------------
    // q8h: SPECTRAL BAND ANALYSIS over real decoded audio — the
    // frequency-domain feature pass every audio pipeline runs after
    // decode (VAD banding, music/speech discrimination, spectral
    // fingerprints). The transform is the 8-point WALSH–HADAMARD
    // transform per window: WHT is the ±1-coefficient orthogonal
    // transform real codecs use where DCT cost or float drift is
    // unacceptable (SATD in video encoders), and here it is the POINT:
    // every coefficient is c_k = Σ s_j·(−1)^popcount(j∧k) — pure
    // integer adds/subtracts, so the whole spectrogram replays
    // bit-for-bit in DuckDB (a float DCT would hash-desync at the ulp;
    // WHT cannot). Per asset: full 8-sample windows (capped), 8
    // sequency-band coefficients per window, per-band energies summed
    // across windows, the dominant band, and the PARSEVAL CONTRACT
    // in-band: Σ band_e = 8·Σ s² over the windowed samples — an
    // energy-conservation identity any dropped window, sign error, or
    // index off-by-one breaks, checked as data on both engines. Plan:
    // decode + both HOF passes fuse into one narrow codegen projection
    // per asset (no explode — the q8a per-row-reduction shape); the
    // only shuffle is the final sort. At 100 TB: embarrassingly
    // parallel per-asset work; band summaries (9 longs/asset) are what
    // ships, never samples.
    QueryDef(
      "q8h_audio_wht_bands",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        import s.implicits._
        // the size(smp) guard is applied BEFORE the codec as an exact
        // byte-length precondition (PCM16 = 2 bytes/sample, so
        // octet_length(payload) >= 2N ⟺ size(smp) >= N): filtering on
        // the decoded array made the optimizer evaluate the full
        // encode+decode chain in BOTH Filter and Project — the same
        // double-decode q8a/q7c were built to avoid
        corpus(s, dir).filter($"modality" === "audio")
          .filter(expr(s"octet_length(payload) >= ${2 * WhtN}"))
          .select($"doc_id", expr(
            "wav_pcm16_samples(wav_pcm16_encode(payload, 16000))")
            .as("smp"))
          .withColumn("nw",
            expr(s"CAST(least($MaxWhtWindows, size(smp) div $WhtN) AS INT)"))
          .withColumn("co", expr(s"""transform(sequence(0, nw - 1), w ->
            transform(sequence(0, ${WhtN - 1}), k ->
              aggregate(sequence(0, ${WhtN - 1}), CAST(0 AS BIGINT),
                (acc, j) -> acc +
                  CAST(element_at(smp, w * $WhtN + j + 1) AS BIGINT) *
                  (1 - 2 * pmod(bit_count(j & k), 2)))))"""))
          .withColumn("band_e", expr(s"""transform(
            sequence(0, ${WhtN - 1}), k ->
              aggregate(co, CAST(0 AS BIGINT), (acc, cw) ->
                acc + element_at(cw, k + 1) * element_at(cw, k + 1)))"""))
          // band energies ship as SCALAR columns, not an array: the
          // driver's pandas comparator cannot sort/hash array cells
          // (the one r13 red), and 8 named longs is the layout a
          // downstream feature store wants anyway
          .select(Seq($"doc_id", $"nw".as("n_windows")) ++
            (0 until WhtN).map(k =>
              expr(s"element_at(band_e, ${k + 1})").as(s"band_e$k")) ++
            Seq(
              expr("CAST(array_position(band_e, array_max(band_e)) - 1 " +
                "AS BIGINT)").as("dom_band"),
              (expr("aggregate(band_e, CAST(0 AS BIGINT), (a, x) -> a + x)")
                === lit(WhtN) * expr(s"""aggregate(
                  slice(smp, 1, nw * $WhtN), CAST(0 AS BIGINT),
                  (a, x) -> a + CAST(x AS BIGINT) * x)"""))
                .as("parseval_ok")): _*)
          .orderBy($"doc_id")
      },
      Some(s"""WITH a AS (
             |  SELECT doc_id, encode(text) AS b FROM documents
             |  WHERE doc_id % 3 = 1),
             |s AS (
             |  SELECT doc_id,
             |    [CASE WHEN v > 32767 THEN v - 65536 ELSE v END
             |     FOR v IN [CAST(('0x' || substr(hex(b), 4*i+3, 2)
             |                          || substr(hex(b), 4*i+1, 2)) AS INT)
             |               for i in range(0, octet_length(b) // 2)]] AS smp
             |  FROM a),
             |w AS (SELECT doc_id, smp,
             |        least($MaxWhtWindows, len(smp) // $WhtN) AS nw
             |      FROM s WHERE len(smp) >= $WhtN),
             |c AS (
             |  SELECT doc_id, nw, smp,
             |    [[CAST(list_sum([smp[w*$WhtN+j+1] *
             |        (1 - 2 * (bit_count(j & k) % 2))
             |        for j in range($WhtN)]) AS BIGINT)
             |      for k in range($WhtN)] for w in range(nw)] AS co
             |  FROM w),
             |e AS (
             |  SELECT doc_id, nw, smp,
             |    [CAST(list_sum([co[w+1][k+1] * co[w+1][k+1]
             |       for w in range(nw)]) AS BIGINT)
             |     for k in range($WhtN)] AS band_e
             |  FROM c)
             |SELECT doc_id, CAST(nw AS INTEGER) AS n_windows,
             |  ${(0 until WhtN).map(k =>
                  s"band_e[${k + 1}] AS band_e$k").mkString(", ")},
             |  CAST(list_position(band_e, list_max(band_e)) - 1 AS BIGINT)
             |    AS dom_band,
             |  CAST(list_sum(band_e) AS BIGINT) = $WhtN *
             |    CAST(list_sum([CAST(x AS BIGINT) * x
             |      for x in smp[1 : nw * $WhtN]]) AS BIGINT) AS parseval_ok
             |FROM e ORDER BY doc_id""".stripMargin),
      doc = "Windowed 8-point Walsh-Hadamard spectral bands over real " +
        "PCM16 decode: integer-exact sequency energies, dominant band, " +
        "and an in-band Parseval energy-conservation contract"),

    // ------------------------------------------------------------------
    // q8i: SCENE-CUT DETECTION over the real video decode — the
    // keyframe-selection pass a video training pipeline runs after
    // container decode (q86) and before frame sampling (q81): score
    // every CONSECUTIVE frame pair by the L1 pixel distance Σ|p_f −
    // p_f+1| and flag transitions above a cut threshold. All-integer
    // per-asset work, so every distance, the cut count, and the max/
    // total replay bit-for-bit from payload hex in the oracle (via the
    // frame-stream identity: frame f byte k = payload byte f·96+k,
    // zero past the tail — zero-padding matches the decoder's padded
    // last row pair, so out-of-range coalesce(0) agrees on both
    // engines). Plan shape: the frame pairing needs NO self-join and
    // NO window — frames stay an ARRAY per asset and the pairing is a
    // transform over the index sequence reading f and f+1 from the
    // same array; decode + pairing + reduction fuse into one narrow
    // projection, the only shuffle is the final sort. At 100 TB:
    // embarrassingly parallel per asset; what ships is 5 longs per
    // asset, never frames.
    QueryDef(
      "q8i_scene_cuts",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        import s.implicits._
        // nf >= 2 gated pre-decode: the encoder emits
        // max(1, ceil(len/96)) frames (AviDib.scala:62), so ≥2 frames
        // ⟺ octet_length(payload) > FrameBytes — exact, and keeps the
        // full decode chain out of the Filter node
        corpus(s, dir).filter($"modality" === "video")
          .filter(expr(s"octet_length(payload) > $FrameBytes"))
          .select($"doc_id",
            expr("avi_dib_frames(avi_dib_encode(payload, 96))")
              .as("frames"))
          .select($"doc_id",
            expr("transform(frames, fb -> bmp_rgb24_pixels(fb))").as("pxs"))
          .withColumn("nf", size($"pxs"))
          .withColumn("diffs", expr(s"""transform(sequence(0, nf - 2), f ->
            aggregate(sequence(0, ${FrameBytes - 1}), CAST(0 AS BIGINT),
              (acc, k) -> acc + abs(
                CAST(coalesce(try_element_at(element_at(pxs, f + 1), k + 1),
                  0) AS BIGINT) -
                CAST(coalesce(try_element_at(element_at(pxs, f + 2), k + 1),
                  0) AS BIGINT))))"""))
          .select($"doc_id", $"nf".as("n_frames"),
            size($"diffs").as("n_transitions"),
            size(filter($"diffs", d => d >= lit(CutThreshold)))
              .cast("long").as("n_cuts"),
            array_max($"diffs").as("max_diff"),
            expr("aggregate(diffs, CAST(0 AS BIGINT), (a, x) -> a + x)")
              .as("total_diff"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 2),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |d AS (SELECT doc_id, greatest(1, (n + 95) // $FrameBytes)
             |        AS nf, bs
             |      FROM st),
             |f AS (SELECT * FROM d WHERE nf >= 2),
             |df AS (
             |  SELECT doc_id, nf,
             |    [CAST(list_sum([abs(coalesce(bs[f*$FrameBytes+k+1], 0)
             |                      - coalesce(bs[(f+1)*$FrameBytes+k+1], 0))
             |       for k in range($FrameBytes)]) AS BIGINT)
             |     for f in range(nf - 1)] AS diffs
             |  FROM f)
             |SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
             |  CAST(len(diffs) AS INTEGER) AS n_transitions,
             |  CAST(len(list_filter(diffs, x -> x >= $CutThreshold))
             |    AS BIGINT) AS n_cuts,
             |  CAST(list_max(diffs) AS BIGINT) AS max_diff,
             |  CAST(list_sum(diffs) AS BIGINT) AS total_diff
             |FROM df ORDER BY doc_id""".stripMargin),
      doc = "Scene-cut detection on real AVI/BMP decode: L1 distance " +
        "per consecutive frame pair computed array-native (no self-join, " +
        "no window), integer-exact cut counts vs the payload replay"),

    // ------------------------------------------------------------------
    // q8l: RLE8-COMPRESSED video decode (expressions.AviRle8) — the
    // COMPRESSED member of the video family, completing the
    // per-modality compression symmetry (images: zlib'd PNG + huffman
    // JPEG; audio: IMA ADPCM; video stopped at uncompressed DIB, q86).
    // Microsoft BI_RLE8 is run-length over 8-bit palette indices with
    // escape codes, and its n=2 DELTA escape is a cursor jump whose
    // skipped pixels RETAIN THE PREVIOUS FRAME'S CONTENT — real
    // interframe/temporal compression, decoded against a persistent
    // frame buffer. The fixture's row-color model (row y of frame f is
    // a solid run of payload byte f·8+y; odd colors emit ABSOLUTE
    // mode, even ones encoded runs; unchanged rows are delta-skipped,
    // trailing ones covered by an early end-of-bitmap) exercises every
    // RLE8 mode, so the oracle replays BOTH sides analytically from
    // payload bytes: decoded content (palette formula
    // c·65536+(255−c)·256+(c⊕85) per pixel, frame-and-position
    // checksum) AND the exact encoded size — enc_bytes is measured
    // in-band as octet_length of the real container and predicted by
    // the oracle as 1248 header bytes + Σ_f(8 + frame RLE length),
    // so a lost delta escape, a wrong mode choice, or a header byte
    // off-by-one all hash-fail. Plan: encode feeds octet_length AND
    // the decode from ONE projection — codegen subexpression
    // elimination evaluates the encoder once per row (and the Filter
    // holds no codec, per the decode-once gate); per-row array folds,
    // no explode; the only shuffle is the final sort. At 100 TB:
    // embarrassingly parallel per-asset decode; 8 scalars/asset ship.
    QueryDef(
      "q8l_avi_rle8_video",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        corpus(s, dir).filter(col("modality") === "video")
          .select(col("doc_id"),
            expr("avi_rle8_encode(payload)").as("avi"))
          .select(col("doc_id"),
            octet_length(col("avi")).as("enc_bytes"),
            expr("avi_rle8_pixels(avi)").as("px"))
          .select(col("doc_id"),
            expr("CAST(size(px) div 128 AS INT)").as("n_frames"),
            size(col("px")).as("n_px"),
            col("enc_bytes"),
            expr("aggregate(px, CAST(0 AS BIGINT), (a, x) -> a + x)")
              .as("px_sum"),
            expr("""aggregate(sequence(0, size(px) - 1), CAST(0 AS BIGINT),
              (acc, i) -> acc +
                CAST(element_at(px, CAST(i + 1 AS INT)) AS BIGINT)
                * ((i % 997) + 1))""").as("pos_checksum"),
            array_min(col("px")).as("min_pixel"),
            array_max(col("px")).as("max_pixel"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, encode(text) AS bl FROM documents
             |  WHERE doc_id % 3 = 2),
             |st AS (
             |  SELECT doc_id, octet_length(bl) AS n,
             |    [CAST(('0x' || substr(hex(bl), 2*i+1, 2)) AS INT)
             |     for i in range(0, octet_length(bl))] AS bs
             |  FROM a),
             |d AS (SELECT doc_id, greatest(1, (n + 7) // 8) AS nf, bs
             |      FROM st),
             |rc AS (SELECT doc_id, nf,
             |    [coalesce(bs[i+1], 0) for i in range(nf*8)] AS c
             |  FROM d),
             |ch AS (SELECT doc_id, nf, c,
             |    [CASE WHEN i < 8 THEN TRUE ELSE c[i+1] != c[i-7] END
             |     for i in range(nf*8)] AS g
             |  FROM rc),
             |enc AS (SELECT doc_id, nf, c,
             |    1248 + list_sum([10 + list_sum(
             |      [CASE WHEN g[f*8+y+1] THEN
             |         (CASE WHEN c[f*8+y+1] % 2 = 1 THEN 20 ELSE 4 END)
             |         + (CASE WHEN y > 0 AND NOT g[f*8+y]
             |            THEN 4 ELSE 0 END)
             |       ELSE 0 END for y in range(8)])
             |     for f in range(nf)]) AS enc_bytes
             |  FROM ch),
             |px AS (SELECT doc_id, nf, enc_bytes,
             |    [c[i+1]*65536 + (255-c[i+1])*256 + xor(c[i+1], 85)
             |     for i in range(nf*8)] AS v
             |  FROM enc)
             |SELECT doc_id,
             |  CAST(nf AS INT) AS n_frames,
             |  CAST(nf*128 AS INT) AS n_px,
             |  CAST(enc_bytes AS INT) AS enc_bytes,
             |  CAST(16 * list_sum(v) AS BIGINT) AS px_sum,
             |  CAST(list_sum([CAST(v[r+1] AS BIGINT) *
             |      list_sum([(r*16+k) % 997 + 1 for k in range(16)])
             |    for r in range(nf*8)]) AS BIGINT) AS pos_checksum,
             |  CAST(list_min(v) AS INT) AS min_pixel,
             |  CAST(list_max(v) AS INT) AS max_pixel
             |FROM px ORDER BY doc_id""".stripMargin),
      doc = "RLE8-compressed AVI video decode: delta-escape interframe " +
        "compression against a persistent frame buffer, encoded size " +
        "and decoded content both replayed analytically from payload " +
        "bytes")
  )

  /** q8h: WHT size (8-point) and the per-asset window cap. */
  /** Per-row reductions over a decoded byte-array column `px` — the
    * no-explode shape (q8g precedent): posexplode+groupBy re-shuffled
    * every decoded byte AND let Catalyst's InferFiltersFromGenerate
    * clone the whole decode chain into a Filter node (the r14
    * decode-once plan gate). These fold in place inside the one
    * codegen projection. */
  private def pxChanSum(ch: Int): Column =
    expr(s"""aggregate(sequence(0, size(px) - 1), CAST(0 AS BIGINT),
      (acc, i) -> acc + IF(i % 3 = $ch,
        element_at(px, CAST(i + 1 AS INT)), 0))""")
  private def pxSum: Column =
    expr("aggregate(px, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
  private def pxPosChecksum: Column =
    expr("""aggregate(sequence(0, size(px) - 1), CAST(0 AS BIGINT),
      (acc, i) -> acc + element_at(px, CAST(i + 1 AS INT))
        * ((i % 1000) + 1))""")

  val WhtN = 8
  val MaxWhtWindows = 16

  /** q8j: blocks per row and the DRI restart interval (MCUs) — 3 is
    * coprime to the row width so restarts land mid-row. */
  val JpegRstWb = 4
  val JpegRstInterval = 3

  /** The IMA step table as a DuckDB list literal, for q8k's oracle
    * (the single source of truth is
    * `graft.expressions.WavImaAdpcm.StepTable`). */
  private val ImaStepsSql: String =
    graft.expressions.WavImaAdpcm.StepTable.mkString("[", ",", "]")

  /** q8i: bytes per encoded AVI frame (the q86 geometry) and the L1
    * cut threshold — near the expected distance of two independent
    * text-derived frames (~30 per byte × 96), so real corpora yield a
    * mixed cut/no-cut population rather than a degenerate constant. */
  val FrameBytes = 96
  val CutThreshold = 2500L
}
