package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal plumbing (SURVEY §2.G): media as opaque `binary` columns
  * with typed metadata, decoded in partition-batched imperative code.
  *
  * The Spark-side plumbing is real: a binary column, a typed
  * Dataset[Blob], and an iterator-based mapPartitions decode stage —
  * exactly where a JNI/codec call (image decode, audio resample,
  * frame sampling) would live on a production cluster, processing
  * each partition as one batch without per-row driver involvement.
  * The codec itself is STUBBED ([[FakeCodec]]): this container has no
  * image/audio libraries, so the "decode" parses deterministic fake
  * metadata out of the blob bytes. The oracle reproduces the same
  * bytes from md5 hex, so m1 stays hash-verifiable end to end.
  *
  * Scale note: decode is per-partition streaming (no collect, no
  * driver loop); blobs never shuffle — metadata extraction happens
  * before any wide operation.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** One media object: id + encoded bytes. */
  case class Blob(doc_id: Long, blob: Array[Byte])

  /** Decoded metadata row. */
  case class BlobMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                      channels: Int, mean_intensity: Double)

  /** STUB codec — a real implementation would hand `bytes` to an image
    * library (JNI) here and return true dimensions / pixel stats. The
    * fake derives deterministic metadata from the first bytes so the
    * full pipeline (schema, batching, partitioning) is testable. */
  object FakeCodec {
    /** Every synthetic blob in this corpus is `unhex(md5(text))` —
      * exactly 16 bytes. The stub stages index into the blob, so the
      * assumption is CHECKED here once, not buried in per-stage magic
      * moduli: a production codec replaces this seam (pixels/decode
      * bodies) and the contract check goes with it. */
    val StubBlobBytes = 16

    /** Length-checked unsigned view of the blob — the stand-in for
      * "decoded pixel/sample array" shared by every m-stage. */
    def pixels(bytes: Array[Byte]): Array[Int] = {
      require(bytes.length == StubBlobBytes,
        s"stub codec expects $StubBlobBytes-byte blobs (unhex(md5(text))), " +
          s"got ${bytes.length}")
      bytes.map(_ & 0xff)
    }

    def decode(id: Long, bytes: Array[Byte]): BlobMeta = {
      val px = pixels(bytes)
      var sum = 0
      var i = 0
      while (i < px.length) { sum += px(i); i += 1 }
      BlobMeta(
        doc_id = id,
        n_bytes = bytes.length,
        width = 1 + (px(0) % 128),
        height = 1 + (px(1) % 128),
        channels = 1 + (px(2) % 4),
        mean_intensity = sum / (bytes.length * 255.0))
    }
  }

  // ---------------------------------------------------------------------
  // m1: binary ingestion + batched decode. The blob is synthesized
  // deterministically (unhex(md5(text)) — a 16-byte "encoded image")
  // because the test corpus has no real media; everything downstream
  // treats it as opaque bytes.
  // ---------------------------------------------------------------------
  def m1BlobMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", unhex(md5($"text")).as("blob"))
      .as[Blob]
      .mapPartitions { it => it.map(b => FakeCodec.decode(b.doc_id, b.blob)) }
      .toDF()
      .orderBy($"doc_id")
  }

  /** One sampled "frame" of a blob (m2). */
  case class Frame(doc_id: Long, frame_idx: Int, offset: Int, mean_byte: Double)

  val FrameBytes = 4
  val FrameStride = 2 // sample every 2nd frame

  // ---------------------------------------------------------------------
  // m2: frame-sampling plumbing — one blob expands to many typed rows
  // (the video/audio shape: decode container → sample every k-th
  // frame → per-frame features). The flatMap runs inside
  // mapPartitions, so a partition's blobs are one imperative batch and
  // the row explosion happens executor-side; only the (small) frame
  // metadata ever reaches a shuffle. Frame extraction is stubbed like
  // m1's codec (fixed-width byte windows of the fake blob).
  // ---------------------------------------------------------------------
  def m2FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", unhex(md5($"text")).as("blob"))
      .as[Blob]
      .mapPartitions { it =>
        it.flatMap { b =>
          (0 until b.blob.length / FrameBytes by FrameStride).iterator.map { fi =>
            val off = fi * FrameBytes
            var sum = 0
            var j = 0
            while (j < FrameBytes) { sum += b.blob(off + j) & 0xff; j += 1 }
            Frame(b.doc_id, fi, off, sum / (FrameBytes * 255.0))
          }
        }
      }
      .toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  /** One resized thumbnail's metadata (m3). */
  case class Thumb(doc_id: Long, src_w: Int, src_h: Int, dst_w: Int, dst_h: Int,
                   thumb_bytes: Int, checksum: Int)

  val ThumbMax = 64

  // ---------------------------------------------------------------------
  // m3: batched resize/thumbnail stage — the image-preprocessing step
  // of a multimodal training pipeline (decode → fit into a 64×64 box
  // preserving aspect ratio → resample). Same honest stubbing as
  // m1/m2: the geometry (integer aspect-fit) is real preprocessing
  // arithmetic and the "resample" is a deterministic position-weighted
  // byte checksum standing in for the pixel kernel; a production
  // implementation swaps FakeCodec + the checksum loop for the image
  // library inside the same mapPartitions batch.
  // ---------------------------------------------------------------------
  def m3Resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", unhex(md5($"text")).as("blob"))
      .as[Blob]
      .mapPartitions { it =>
        it.map { b =>
          val m = FakeCodec.decode(b.doc_id, b.blob)
          val longest = math.max(m.width, m.height)
          val dw = math.max(1, m.width * ThumbMax / longest)
          val dh = math.max(1, m.height * ThumbMax / longest)
          var cs = 0
          var i = 0
          while (i < b.blob.length) { cs = (cs + (b.blob(i) & 0xff) * (i + 1)) % 9973; i += 1 }
          Thumb(b.doc_id, m.width, m.height, dw, dh, dw * dh * m.channels, cs)
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** One frame-to-frame transition (m4). */
  case class Shot(doc_id: Long, frame_idx: Int, cos_prev: Double, is_boundary: Boolean)

  /** Cosine below this between consecutive frames marks a cut. */
  val ShotThreshold = 0.85

  // ---------------------------------------------------------------------
  // m4: SHOT-BOUNDARY detection — the scene-segmentation pass a video
  // training pipeline runs before captioning/sampling: consecutive
  // frames are featurized and a similarity drop marks a cut. The frame
  // sequence of one container lives inside one blob, so the whole
  // computation stays INSIDE the imperative decode batch (a video
  // decoder is sequential within its container) — per-transition
  // cosine over the per-frame byte vectors, zero shuffles before the
  // output sort; at scale this is scan-rate over blobs exactly like
  // m1–m3. Featurization is the same stub seam (4-byte windows of the
  // fake blob standing in for a vision encoder); the cosine and the
  // threshold gate are the real arithmetic, and the oracle rebuilds
  // them byte-for-byte from the md5 hex.
  // ---------------------------------------------------------------------
  def m4ShotBoundaries(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", unhex(md5($"text")).as("blob"))
      .as[Blob]
      .mapPartitions { it =>
        it.flatMap { b =>
          val nFrames = b.blob.length / FrameBytes
          (1 until nFrames).iterator.map { fi =>
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var j = 0
            while (j < FrameBytes) {
              val x = (b.blob((fi - 1) * FrameBytes + j) & 0xff).toDouble
              val y = (b.blob(fi * FrameBytes + j) & 0xff).toDouble
              dot += x * y; na += x * x; nb += y * y
              j += 1
            }
            val cos = if (na == 0 || nb == 0) 0.0
            else dot / (math.sqrt(na) * math.sqrt(nb))
            Shot(b.doc_id, fi, cos, cos < ShotThreshold)
          }
        }
      }
      .toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  /** One fixed-hop audio chunk (m5). */
  case class Chunk(doc_id: Long, sample_rate: Int, n_samples: Int,
                   chunk_idx: Int, start_sample: Int, end_sample: Int,
                   n_chunk_samples: Int, energy: Int)

  /** Whisper-style chunking geometry: fixed window, 25% overlap. */
  val ChunkSamples = 16000
  val ChunkHop = 12000

  // ---------------------------------------------------------------------
  // m5: AUDIO CHUNKING — the segmentation pass a speech training
  // pipeline runs before feature extraction (Whisper-style fixed
  // windows with overlap): one audio blob fans out to its chunk rows
  // with sample geometry and a per-chunk energy feature. Same honest
  // stubbing as m1-m4: the container probe (sample rate, sample
  // count) and the energy are deterministic functions of the fake
  // blob bytes standing in for an audio decoder, while the chunk
  // geometry — ceil-div chunk count, hop/window arithmetic, the
  // short final chunk — is the real production arithmetic, all
  // rebuilt byte-for-byte by the oracle from the md5 hex. The fan-out
  // is a flatMap inside the mapPartitions batch (m2's shape): blobs
  // never shuffle, only chunk metadata rows leave the map side.
  // ---------------------------------------------------------------------
  def m5AudioChunks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", unhex(md5($"text")).as("blob"))
      .as[Blob]
      .mapPartitions { it =>
        it.flatMap { b =>
          val px = FakeCodec.pixels(b.blob)
          def u(i: Int): Int = px(i)
          val rate = if (u(2) % 2 == 0) 16000 else 8000
          val nSamples = 8000 + (u(0) * 256 + u(1))
          var cs = 0
          var i = 0
          while (i < px.length) { cs = (cs + px(i) * (i + 1)) % 9973; i += 1 }
          val nChunks =
            if (nSamples <= ChunkSamples) 1
            else 1 + (nSamples - ChunkSamples + ChunkHop - 1) / ChunkHop
          (0 until nChunks).iterator.map { ci =>
            val start = ci * ChunkHop
            val end = math.min(start + ChunkSamples, nSamples)
            Chunk(b.doc_id, rate, nSamples, ci, start, end, end - start,
              (cs + ci * 131) % 9973)
          }
        }
      }
      .toDF()
      .orderBy($"doc_id", $"chunk_idx")
  }

  // ---------------------------------------------------------------------
  // m6: CROSS-MODAL CAPTION RETRIEVAL — the image↔text alignment join
  // of a multimodal training pipeline (CLIP-style pairing: for each
  // image, the nearest text embedding in the shared space). The image
  // "encoder" is the FakeCodec seam (a production build runs the
  // vision tower there — one function body, m1's discipline): blob
  // bytes → a deterministic 64-dim feature inside the mapPartitions
  // batch, so blobs never shuffle and features leave the map side as
  // compact float arrays. Retrieval is the exact BNL baseline over
  // the broadcast caption index with the codegen'd CosineSim, top-1
  // per image planning as the TopKPartial/TopKFinal heap (v2's
  // machinery). The v3-IVF scale swap is LANDED behind
  // `spark.graft.m6.ivf=true` (captions cell-assigned, images probe
  // their nearest cells, scoring only inside probed cells — the
  // caption index is never broadcast whole; spec-pinned cannot-beat-
  // exact + agreement properties). The oracle rebuilds the feature
  // from the md5 hex (byteAt, m1 pattern) and replays the same
  // index-ordered cosine over the graded BNL default.
  // ---------------------------------------------------------------------
  val FeatDims = 64

  def m6CaptionRetrieval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.cosineSim
    val feats = Tables.documents(s, d)
      .select($"doc_id", unhex(md5($"text")).as("blob"))
      .as[Blob]
      .mapPartitions { it =>
        it.map { b =>
          // STUB vision tower: tile the decoded bytes across 64 dims
          // (length-driven — the 16-byte contract lives in pixels()).
          val px = FakeCodec.pixels(b.blob)
          val f = Array.tabulate(FeatDims)(i => px(i % px.length).toFloat)
          (b.doc_id, f)
        }
      }
      .toDF("doc_id", "feature")
    val caps = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val w = Window.partitionBy($"doc_id").orderBy($"cos".desc, $"vec_id")
    // Production path (`spark.graft.m6.ivf=true` — the scale swap the
    // BNL comment promises, LANDED): captions take v3's cell
    // assignment, each image probes its nearest cells, and scoring
    // runs only inside probed cells — the caption index is never
    // broadcast whole, the BNL product never forms. Graded default
    // keeps the exact BNL baseline (oracle unchanged); the spec pins
    // plan shape (no BNL node) + top-1 agreement on probed cells.
    val useIvf = s.conf.get("spark.graft.m6.ivf", "false").toBoolean
    if (!useIvf) {
      feats.crossJoin(broadcast(caps))
        .select($"doc_id", $"vec_id", cosineSim($"feature", $"embedding").as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"vec_id".as("caption_id"), $"cos")
        .orderBy($"doc_id")
    } else {
      val c = graft.sim.Sim.centroids(s, d)
      // caption → cell via the shared zero-shuffle map-side fold (r14)
      val assigned = graft.sim.Sim.assignedCos(s, d)
        .select($"vec_id", $"embedding", $"cluster")
      val wProbe = Window.partitionBy($"doc_id").orderBy($"q_cos".desc, $"c_id")
      val probes = feats.crossJoin(broadcast(c))
        .select($"doc_id", $"feature", $"c_id",
          cosineSim($"feature", $"c_emb").as("q_cos"))
        .withColumn("rn", row_number().over(wProbe))
        .filter($"rn" <= graft.sim.Sim.Probes)
        .select($"doc_id", $"feature", $"c_id".as("cluster"))
      probes.join(assigned, "cluster")
        .select($"doc_id", $"vec_id", cosineSim($"feature", $"embedding").as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"vec_id".as("caption_id"), $"cos")
        .orderBy($"doc_id")
    }
  }

  // ---------------------------------------------------------------------
  // m13: CLIP-SCORE FILTER — the gate LAION was BUILT with (keep an
  // (image, alt-text) pair iff the CLIP cosine of the image embedding
  // and its own caption's text embedding clears a threshold; LAION-400M
  // used 0.3): each doc's blob runs the stub vision tower at the
  // decode seam (m6's feature — one function body swaps in the real
  // tower), its PAIRED caption is the content-addressed doc_id mod
  // |captions| row of the embedding table, and the per-source report
  // gives pairs / kept / keep rate / cosine hull + 1e-6-quantized
  // exact mean (v16's order-independent discipline). τ = 0.10 is
  // corpus-calibrated (d5 precedent: the md5-derived features give
  // cosines in ≈[−0.28, 0.33], so 0.10 genuinely discriminates).
  // Shape: blobs never shuffle; the 1-row count and the caption index
  // broadcast (production swaps the BNL for v3/v6 exactly as m6
  // documents); one combine-enabled (source) rollup.
  // ---------------------------------------------------------------------
  val ClipTau = 0.10

  def m13ClipFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.GraftFunctions.cosineSim
    val feats = Tables.documents(s, d)
      .select($"doc_id", $"source", unhex(md5($"text")).as("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, src, blob) =>
          val px = FakeCodec.pixels(blob)
          val f = Array.tabulate(FeatDims)(i => px(i % px.length).toFloat)
          (id, src, f)
        }
      }
      .toDF("doc_id", "source", "feature")
    val caps = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val nv = caps.agg(count(lit(1)).as("n_vec"))
    feats.crossJoin(broadcast(nv))
      .select($"doc_id", $"source", $"feature",
        pmod($"doc_id", $"n_vec").as("cap_id"))
      .join(broadcast(caps), $"cap_id" === $"vec_id")
      .select($"source", cosineSim($"feature", $"embedding").as("cos"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when($"cos" >= ClipTau, 1L).otherwise(0L)).as("n_kept"),
        min($"cos").as("min_cos"),
        max($"cos").as("max_cos"),
        sum(floor($"cos" * lit(1000000.0)).cast("long")).as("q_sum"))
      .select($"source", $"n_pairs", $"n_kept",
        ($"n_kept".cast("double") / $"n_pairs".cast("double")).as("keep_rate"),
        $"min_cos", $"max_cos",
        ($"q_sum".cast("double") / $"n_pairs".cast("double") / lit(1000000.0))
          .as("mean_cos_q"))
      .orderBy($"source")
  }

  /** One orientation-classified row (m14). */
  case class GeomRow(doc_id: Long, orientation: String, w: Int, h: Int)

  // ---------------------------------------------------------------------
  // m14: ASPECT-RATIO PROFILE — the image-geometry distribution a
  // vision dataset card reports (portrait/landscape/square mix, mean
  // dimensions; training crops and bucketing strategies are chosen
  // from exactly this table): the m1/m8 stub geometry (width/height
  // from the decode seam), orientation by INTEGER comparison, ONE
  // combine-enabled groupBy over ≤3 orientation groups with integer
  // dimension sums and one divide per mean; blobs never shuffle.
  // ---------------------------------------------------------------------
  def m14AspectBuckets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", unhex(md5($"text")).as("blob"))
      .as[Blob]
      .mapPartitions { it =>
        it.map { b =>
          val px = FakeCodec.pixels(b.blob)
          val w = 1 + (px(0) % 128)
          val h = 1 + (px(1) % 128)
          val o = if (w > h) "landscape" else if (w < h) "portrait" else "square"
          GeomRow(b.doc_id, o, w, h)
        }
      }
      .toDF()
      .groupBy($"orientation")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"w").as("sum_w"),
        sum($"h").as("sum_h"))
      .select($"orientation", $"n_docs",
        ($"sum_w".cast("double") / $"n_docs".cast("double")).as("avg_width"),
        ($"sum_h".cast("double") / $"n_docs".cast("double")).as("avg_height"))
      .orderBy($"orientation")
  }

  // ---------------------------------------------------------------------
  // m7: PERCEPTUAL-HASH IMAGE DEDUP — the image-side counterpart of
  // the d-family (near-duplicate images survive re-encoding, so
  // training pipelines dedup on a perceptual hash, not the file
  // bytes). Average-hash shape: decode → tiny grayscale thumbnail →
  // one bit per pixel (pixel ≥ thumbnail mean) → group by hash, emit
  // in-bucket pairs. The decode is the FakeCodec seam (the 16 blob
  // bytes stand in for the 4×4 thumbnail; a production build computes
  // real pixels there — same function body, m1's discipline); the
  // mean comparison is integer-exact (px·16 ≥ Σpx — no division), so
  // the oracle rebuilds the hash bit-for-bit from the md5 hex. Scale
  // shape: only (doc_id, ahash) ever leaves the map side; the
  // groupBy buckets are duplicate clusters (bounded), pairs are
  // emitted from sorted in-bucket arrays — never an all-pairs join.
  // ---------------------------------------------------------------------
  def m7PhashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.documents(s, d)
      .select($"doc_id", unhex(md5($"text")).as("blob"))
      .as[Blob]
      .mapPartitions { it =>
        it.map { b =>
          // STUB decode: blob bytes as the thumbnail pixels.
          val px = FakeCodec.pixels(b.blob)
          val sum = px.sum
          var h = 0
          var i = 0
          while (i < px.length) {
            if (px(i) * px.length >= sum) h |= 1 << i
            i += 1
          }
          (b.doc_id, h)
        }
      }
      .toDF("doc_id", "ahash")
    // Dup groups only, gated by the d-family's oversized-bucket cap
    // BEFORE any aggregation: the ahash space is 16-bit, so at crawl
    // scale a boilerplate thumbnail (solid color, logo) collapses
    // millions of images into ONE bucket — O(|bucket|²) pairs AND a
    // corpus-sized collect_list buffer row. The count() window rides
    // the same (ahash) exchange the groupBy needs, so over-cap rows
    // are dropped before the list ever accumulates (a2b's discipline;
    // a post-aggregation size() filter would still build the giant
    // row first). Same drop semantics as d3/d4, mirrored in the
    // oracle's pre-join QUALIFY.
    val cap = graft.dedup.Dedup.maxBucket(s)
    hashed
      .withColumn("bsz",
        count(lit(1)).over(Window.partitionBy($"ahash")))
      .filter($"bsz" > 1 && $"bsz" <= cap)
      .drop("bsz")
      .groupBy($"ahash")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .select($"ahash", explode(flatten(transform($"ids", (a, i) =>
        transform(slice($"ids", i + 2, size($"ids")),
          b => struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .select($"p.doc_a", $"p.doc_b", $"ahash")
      .orderBy($"doc_a", $"doc_b")
  }

  /** One classified media row for the corpus report (m8). */
  case class ModalityRow(doc_id: Long, modality: String, n_bytes: Int,
                         width: Int, height: Int, px_sum: Int)

  // ---------------------------------------------------------------------
  // m8: corpus MODALITY REPORT — the dataset card every multimodal
  // release ships (counts/bytes/dimension profile per modality, LAION/
  // Obelics style). The container probe classifies each blob at the
  // decode seam (production: sniff the container magic; stub: a
  // deterministic byte rule) and emits metadata-only rows, so the
  // report is one combine-enabled groupBy over ≤ |modalities| groups —
  // blobs never shuffle, nothing after the map side scales with the
  // corpus. Averages follow the Exact discipline: integer sums
  // (Σwidth, Σheight, Σpx) with ONE IEEE divide each at the end —
  // no double is ever summed.
  // ---------------------------------------------------------------------
  def m8ModalityReport(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", unhex(md5($"text")).as("blob"))
      .as[Blob]
      .mapPartitions { it =>
        it.map { b =>
          val px = FakeCodec.pixels(b.blob)
          val mod = (px(3) % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          ModalityRow(b.doc_id, mod, b.blob.length,
            1 + (px(0) % 128), 1 + (px(1) % 128), px.sum)
        }
      }
      .toDF()
      .groupBy($"modality")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("total_bytes"),
        (sum($"width").cast("double") / count(lit(1))).as("avg_width"),
        (sum($"height").cast("double") / count(lit(1))).as("avg_height"),
        (sum($"px_sum").cast("double") / (count(lit(1)) * 16 * 255))
          .as("avg_intensity"))
      .orderBy($"modality")
  }

  /** One classified row for the per-source dataset card (m12). */
  case class CardRow(doc_id: Long, source: String, n_tok: Long,
                     modality: String, n_bytes: Int)

  // ---------------------------------------------------------------------
  // m12: the per-SOURCE DATASET CARD — the (source × modality)
  // composition table a multimodal release publishes (LAION/Obelics
  // card style: how many items of each modality each source
  // contributes, their bytes, their caption/text tokens, and each
  // modality's share WITHIN the source). m8 profiles the corpus per
  // modality; this is the provenance cut a data audit asks for.
  // Shape: modality classified at the decode seam (m8's stub rule,
  // blobs never shuffle), token counts map-side, ONE combine-enabled
  // (source, modality) groupBy; the within-source share is a window
  // over the |sources|×|modalities| bounded rows with one divide.
  // ---------------------------------------------------------------------
  def m12DatasetCard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val classified = Tables.documents(s, d)
      .select($"doc_id", $"source",
        size(graft.text.Text.toks($"text")).cast("long").as("n_tok"),
        unhex(md5($"text")).as("blob"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, src, nTok, blob) =>
          val px = FakeCodec.pixels(blob)
          val mod = (px(3) % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          CardRow(id, src, nTok, mod, blob.length)
        }
      }
      .toDF()
    val wSrc = Window.partitionBy($"source")
    classified
      .groupBy($"source", $"modality")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("total_bytes"),
        sum($"n_tok").as("tokens"))
      .withColumn("src_docs", sum($"n_docs").over(wSrc))
      .select($"source", $"modality", $"n_docs", $"total_bytes", $"tokens",
        ($"n_docs".cast("double") / $"src_docs".cast("double"))
          .as("share_of_source"))
      .orderBy($"source", $"modality")
  }

  // ---------------------------------------------------------------------
  // m9: shard packing — the WebDataset/tar-writer planning pass: media
  // objects are laid out into fixed-capacity shards per source, in
  // deterministic (doc_id) order, by BYTE OFFSET (an object starts in
  // the shard its running offset falls into — exactly how a streaming
  // tar writer rolls files; true first-fit bin packing is inherently
  // sequential and buys nothing for contiguous archives). The media
  // size is the stub-decoded width×height×channels (the m1 metadata,
  // derived arithmetically here — planning is a metadata-level pass,
  // blobs never load). Shapes: one (source) exchange shared by the
  // running-sum window and the shard rollup; every decision is
  // integer (cum − size) div capacity. At 100 TB this IS the job that
  // writes training archives: per-source ordering bounds the window
  // sort, shard manifests are the bounded output.
  // ---------------------------------------------------------------------
  val ShardCapacity = 262144L // 256 KiB of decoded payload per shard

  /** Shared shard layout: per-source (doc_id)-ordered running byte
    * offsets and the integer shard rule — m9 aggregates it into
    * manifests, m10 projects the per-item index. */
  private def shardLayout(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def px(i: Int) =
      conv(substring(md5($"text"), 2 * i + 1, 2), 16, 10).cast("long")
    val sized = Tables.documents(s, d)
      .select($"source", $"doc_id",
        ((px(0) % 128 + 1L) * (px(1) % 128 + 1L) * (px(2) % 4 + 1L))
          .as("media_bytes"))
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized
      .withColumn("cum", sum($"media_bytes").over(w))
      .withColumn("shard", expr(s"(cum - media_bytes) div $ShardCapacity"))
  }

  def m9ShardPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    shardLayout(s, d)
      .groupBy($"source", $"shard")
      .agg(
        count(lit(1)).as("n_items"),
        sum($"media_bytes").as("bytes"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"source", $"shard")
  }

  // ---------------------------------------------------------------------
  // m15: SHARD BALANCE REPORT — the check a training-data release runs
  // on m9's packing plan before writing archives: dataloader
  // throughput is gated by the SLOWEST shard, so the report surfaces
  // per-source fill ratio and shard-size skew (max·n/total — 1.0 is
  // perfectly balanced). Same [[shardLayout]] skeleton (one bounded
  // (source) window sort), two combine-enabled rollups on top;
  // all-integer until the two display divides, mirrored op-for-op.
  // ---------------------------------------------------------------------
  def m15ShardBalance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    shardLayout(s, d)
      .groupBy($"source", $"shard")
      .agg(count(lit(1)).as("n_items"), sum($"media_bytes").as("bytes"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_shards"),
        sum($"n_items").as("n_items"),
        sum($"bytes").as("total_bytes"),
        min($"bytes").as("min_shard_bytes"),
        max($"bytes").as("max_shard_bytes"))
      .select($"source", $"n_shards", $"n_items", $"total_bytes",
        $"min_shard_bytes", $"max_shard_bytes",
        ($"total_bytes".cast("double") /
          ($"n_shards" * lit(ShardCapacity)).cast("double")).as("mean_fill"),
        (($"max_shard_bytes" * $"n_shards").cast("double") /
          $"total_bytes".cast("double")).as("skew"))
      .orderBy($"source")
  }

  // ---------------------------------------------------------------------
  // m10: TAR INDEX — the per-item random-access sidecar every
  // WebDataset-style archive ships (shard id + byte offset INSIDE the
  // shard + length): what a training dataloader seeks with. Pure
  // projection over the shared shard layout — offset_in_shard =
  // (cum − size) − shard·capacity, all integers; same single (source)
  // exchange as m9 (the manifest and the index are one pass in
  // production — two graded surfaces of the same layout here).
  // ---------------------------------------------------------------------
  def m10TarIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    shardLayout(s, d)
      .select($"source", $"doc_id", $"shard",
        ($"cum" - $"media_bytes" - $"shard" * ShardCapacity).as("offset"),
        $"media_bytes")
      .orderBy($"source", $"doc_id")
  }

  /** m11's epoch count (two graded epochs prove the reshuffle; the
    * production loop passes the epoch number in). */
  val ShuffleEpochs = 2

  // ---------------------------------------------------------------------
  // m11: EPOCH SHUFFLE manifest — the deterministic per-epoch reading
  // order a training dataloader follows: position = rank of
  // md5(epoch:doc) within the source (WebDataset's shard-local
  // shuffle — exactly the granularity real loaders use, because a
  // GLOBAL shuffle of a 100 TB corpus per epoch would be a full-sort
  // per epoch for no training benefit; shard-local + shard-order
  // rotation is the published recipe). Content-addressed, so the
  // order is reproducible across runs/machines and changes completely
  // between epochs. Ranking uses q23's grouped distributed idiom
  // (r13): a Window.partitionBy(epoch, source) would hold one
  // (epoch, source) slice — corpus-sized per source — in ONE task;
  // range partitions on (epoch, source, h, doc_id) keep every task a
  // row-balanced slice, with per-(epoch, source, pid) offsets from a
  // bounded broadcast triangular join. The epoch fan-out stays a
  // map-side explode.
  // ---------------------------------------------------------------------
  def m11EpochShuffle(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // r14: the PLAIN per-(epoch, source) window — GroupedRankRewrite
    // (plans/GroupedRank.scala) supplies the scale plan the r13 hand
    // idiom (pid column + triangular offset join + persist) built
    // manually: range partitions on (epoch, source, h, doc_id), local
    // ranks, boundary-segment offsets. No (epoch, source)-sized task
    // anywhere, same bit-exact positions (GroupedRankSpec).
    val hashed = Tables.documents(s, d)
      .select($"source", $"doc_id",
        explode(sequence(lit(0), lit(ShuffleEpochs - 1))).as("epoch"))
      .withColumn("h",
        md5(concat($"epoch".cast("string"), lit(":"), $"doc_id".cast("string"))))
    val w = Window.partitionBy($"epoch", $"source").orderBy($"h", $"doc_id")
    hashed
      .select($"epoch", $"source",
        row_number().over(w).cast("long").as("pos"), $"doc_id")
      .orderBy($"epoch", $"source", $"pos")
  }

  val queries: Map[String, Q] = Map(
    "m11_epoch_shuffle" -> (m11EpochShuffle _),
    "m10_tar_index" -> (m10TarIndex _),
    "m9_shard_pack" -> (m9ShardPack _),
    "m15_shard_balance" -> (m15ShardBalance _),
    "m14_aspect_buckets" -> (m14AspectBuckets _),
    "m13_clip_filter" -> (m13ClipFilter _),
    "m12_dataset_card" -> (m12DatasetCard _),
    "m8_modality_report" -> (m8ModalityReport _),
    "m7_phash_dedup" -> (m7PhashDedup _),
    "m6_caption_retrieval" -> (m6CaptionRetrieval _),
    "m5_audio_chunks" -> (m5AudioChunks _),
    "m1_blob_meta" -> (m1BlobMeta _),
    "m2_frame_sample" -> (m2FrameSample _),
    "m3_resize" -> (m3Resize _),
    "m4_shot_boundaries" -> (m4ShotBoundaries _),
  )

  // The oracle rebuilds each blob byte from the md5 hex pair
  // (strpos-based hex→int), so it checks the decode stub bit-for-bit.
  private def hexDigit(pos: Int): String =
    s"(strpos('0123456789abcdef', substr(h, $pos, 1)) - 1)"
  private def byteAt(j: Int): String =
    s"(${hexDigit(2 * j + 1)} * 16 + ${hexDigit(2 * j + 2)})"
  private val sumBytes = (0 until 16).map(byteAt).mkString(" + ")

  val oracles: Map[String, String] = Map(
    // m11: same md5(epoch:doc) rank within (epoch, source).
    "m11_epoch_shuffle" ->
      s"""WITH f AS (
           SELECT source, doc_id, CAST(e AS INT) AS epoch,
                  md5(CAST(e AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents, range(0, $ShuffleEpochs) r(e))
         SELECT epoch, source,
                CAST(row_number() OVER (PARTITION BY epoch, source
                  ORDER BY h, doc_id) AS BIGINT) AS pos,
                doc_id
         FROM f ORDER BY epoch, source, pos""",
    // m10: the same layout CTEs, projected per item; all integers.
    "m10_tar_index" ->
      s"""WITH b AS (SELECT source, doc_id, md5(text) AS h FROM documents),
         sz AS (
           SELECT source, doc_id,
                  CAST((${byteAt(0)} % 128 + 1) *
                       (${byteAt(1)} % 128 + 1) *
                       (${byteAt(2)} % 4 + 1) AS BIGINT) AS media_bytes
           FROM b),
         c AS (
           SELECT source, doc_id, media_bytes,
                  CAST(sum(media_bytes) OVER (PARTITION BY source
                    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS cum
           FROM sz)
         SELECT source, doc_id, (cum - media_bytes) // $ShardCapacity AS shard,
                cum - media_bytes -
                  ((cum - media_bytes) // $ShardCapacity) * $ShardCapacity AS offset,
                media_bytes
         FROM c ORDER BY source, doc_id""",
    // m9: same md5-derived metadata bytes, same running-sum offsets,
    // same integer shard rule.
    "m9_shard_pack" ->
      s"""WITH b AS (SELECT source, doc_id, md5(text) AS h FROM documents),
         sz AS (
           SELECT source, doc_id,
                  CAST((${byteAt(0)} % 128 + 1) *
                       (${byteAt(1)} % 128 + 1) *
                       (${byteAt(2)} % 4 + 1) AS BIGINT) AS media_bytes
           FROM b),
         c AS (
           SELECT source, doc_id, media_bytes,
                  CAST(sum(media_bytes) OVER (PARTITION BY source
                    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS cum
           FROM sz)
         SELECT source, (cum - media_bytes) // $ShardCapacity AS shard,
                CAST(count(*) AS BIGINT) AS n_items,
                CAST(sum(media_bytes) AS BIGINT) AS bytes,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM c GROUP BY 1, 2 ORDER BY source, shard""",
    // m15: m9's layout CTEs verbatim, per-shard then per-source
    // rollups, the two divides mirrored op-for-op.
    "m15_shard_balance" ->
      s"""WITH b AS (SELECT source, doc_id, md5(text) AS h FROM documents),
         sz AS (
           SELECT source, doc_id,
                  CAST((${byteAt(0)} % 128 + 1) *
                       (${byteAt(1)} % 128 + 1) *
                       (${byteAt(2)} % 4 + 1) AS BIGINT) AS media_bytes
           FROM b),
         c AS (
           SELECT source, doc_id, media_bytes,
                  CAST(sum(media_bytes) OVER (PARTITION BY source
                    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS cum
           FROM sz),
         sh AS (
           SELECT source, (cum - media_bytes) // $ShardCapacity AS shard,
                  CAST(count(*) AS BIGINT) AS n_items,
                  CAST(sum(media_bytes) AS BIGINT) AS bytes
           FROM c GROUP BY 1, 2),
         g AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_shards,
                  CAST(sum(n_items) AS BIGINT) AS n_items,
                  CAST(sum(bytes) AS BIGINT) AS total_bytes,
                  min(bytes) AS min_shard_bytes,
                  max(bytes) AS max_shard_bytes
           FROM sh GROUP BY 1)
         SELECT source, n_shards, n_items, total_bytes,
                min_shard_bytes, max_shard_bytes,
                CAST(total_bytes AS DOUBLE) /
                  CAST(n_shards * $ShardCapacity AS DOUBLE) AS mean_fill,
                CAST(max_shard_bytes * n_shards AS DOUBLE) /
                  CAST(total_bytes AS DOUBLE) AS skew
         FROM g ORDER BY source""",
    // m8: same byte rebuild, same modality rule (byte 3 mod 3), same
    // integer sums; each average is the identical single IEEE divide.
    // m12: same stub modality rule + token counts, (source, modality)
    // rollup, within-source share via the same bounded window.
    "m12_dataset_card" ->
      s"""WITH b AS (
           SELECT doc_id, source, md5(text) AS h,
                  CAST(len(list_filter(string_split_regex(text, '\\s+'),
                    x -> x <> '')) AS BIGINT) AS n_tok
           FROM documents),
         m AS (
           SELECT doc_id, source, n_tok,
                  CASE ${byteAt(3)} % 3 WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
                  16 AS n_bytes
           FROM b),
         g AS (
           SELECT source, modality, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
                  CAST(sum(n_tok) AS BIGINT) AS tokens
           FROM m GROUP BY 1, 2),
         w AS (
           SELECT *, sum(n_docs) OVER (PARTITION BY source) AS src_docs
           FROM g)
         SELECT source, modality, n_docs, total_bytes, tokens,
                CAST(n_docs AS DOUBLE) / CAST(src_docs AS DOUBLE)
                  AS share_of_source
         FROM w ORDER BY source, modality""",
    "m8_modality_report" ->
      s"""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
         m AS (
           SELECT doc_id,
                  CASE ${byteAt(3)} % 3 WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
                  16 AS n_bytes,
                  1 + ${byteAt(0)} % 128 AS width,
                  1 + ${byteAt(1)} % 128 AS height,
                  $sumBytes AS px_sum
           FROM b)
         SELECT modality, count(*) AS n_docs,
                CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
                CAST(sum(width) AS DOUBLE) / count(*) AS avg_width,
                CAST(sum(height) AS DOUBLE) / count(*) AS avg_height,
                CAST(sum(px_sum) AS DOUBLE) / (count(*) * 16 * 255)
                  AS avg_intensity
         FROM m GROUP BY 1 ORDER BY modality""",
    // m7: same byte rebuild, same integer mean rule (px·16 ≥ Σ),
    // same bit packing; pairs via equality self-join.
    "m7_phash_dedup" -> {
      val bits = (0 until 16).map(j =>
        s"(CASE WHEN ${byteAt(j)} * 16 >= s THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
         s AS (SELECT doc_id, h, $sumBytes AS s FROM b),
         a AS (SELECT doc_id, CAST($bits AS INT) AS ahash FROM s
               QUALIFY count(*) OVER (PARTITION BY ahash) <= ${graft.dedup.Dedup.MaxBucket})
         SELECT a1.doc_id AS doc_a, a2.doc_id AS doc_b, a1.ahash AS ahash
         FROM a a1 JOIN a a2 ON a1.ahash = a2.ahash AND a1.doc_id < a2.doc_id
         ORDER BY doc_a, doc_b"""
    },
    // m6: feature rebuilt from the md5 hex (byteAt), cosine replayed
    // index-ordered exactly like the Sim oracles, arg-max via
    // row_number with the same (cos DESC, vec_id) tie rule.
    // m14: m8's geometry rebuild, integer orientation rule, one
    // divide per mean.
    "m14_aspect_buckets" ->
      s"""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
          g AS (
            SELECT doc_id,
                   1 + ${byteAt(0)} % 128 AS w,
                   1 + ${byteAt(1)} % 128 AS h2
            FROM b),
          o AS (
            SELECT doc_id, w, h2,
                   CASE WHEN w > h2 THEN 'landscape'
                        WHEN w < h2 THEN 'portrait'
                        ELSE 'square' END AS orientation
            FROM g)
          SELECT orientation, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_width,
                 CAST(sum(h2) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_height
          FROM o GROUP BY 1 ORDER BY orientation""",
    // m13: m6's feature rebuild + the same index-ordered cosine, the
    // content-addressed mod pairing, v16's quantized exact mean.
    "m13_clip_filter" -> {
      val fb = (0 until 16).map(byteAt).mkString("[", ", ", "]")
      def fAt = "fb[(i - 1) % 16 + 1]"
      val dotFe =
        s"list_sum(list_transform(range(1, 65), i -> CAST($fAt AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
      val dotFf =
        s"list_sum(list_transform(range(1, 65), i -> CAST($fAt AS DOUBLE) * CAST($fAt AS DOUBLE)))"
      val dotEe =
        s"list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
      s"""WITH b AS (SELECT doc_id, source, md5(text) AS h FROM documents),
          f AS (SELECT doc_id, source, $fb AS fb FROM b),
          nv AS (SELECT count(*) AS n_vec FROM embeddings),
          p AS (SELECT doc_id, source, fb, doc_id % n_vec AS cap_id
                FROM f CROSS JOIN nv),
          sc AS (
            SELECT source, $dotFe / (sqrt($dotFf) * sqrt($dotEe)) AS cos
            FROM p JOIN embeddings ON cap_id = vec_id),
          g AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(CASE WHEN cos >= $ClipTau THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   min(cos) AS min_cos, max(cos) AS max_cos,
                   CAST(sum(CAST(floor(cos * 1000000.0) AS BIGINT)) AS BIGINT) AS q_sum
            FROM sc GROUP BY 1)
          SELECT source, n_pairs, n_kept,
                 CAST(n_kept AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS keep_rate,
                 min_cos, max_cos,
                 CAST(q_sum AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 1000000.0
                   AS mean_cos_q
          FROM g ORDER BY source"""
    },
    "m6_caption_retrieval" -> {
      val fb = (0 until 16).map(byteAt).mkString("[", ", ", "]")
      def fAt = "fb[(i - 1) % 16 + 1]"
      val dotFe =
        s"list_sum(list_transform(range(1, 65), i -> CAST($fAt AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
      val dotFf =
        s"list_sum(list_transform(range(1, 65), i -> CAST($fAt AS DOUBLE) * CAST($fAt AS DOUBLE)))"
      val dotEe =
        s"list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
      s"""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
          f AS (SELECT doc_id, $fb AS fb FROM b),
          sc AS (
            SELECT doc_id, vec_id,
                   $dotFe / (sqrt($dotFf) * sqrt($dotEe)) AS cos
            FROM f, embeddings),
          r AS (
            SELECT doc_id, vec_id, cos,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY cos DESC, vec_id) AS rn
            FROM sc)
          SELECT doc_id, vec_id AS caption_id, cos FROM r WHERE rn = 1
          ORDER BY doc_id"""
    },
    // Container probe + chunk geometry rebuilt from the md5 hex; the
    // ceil-div chunk count and hop arithmetic use only positive ints,
    // so // truncation matches Scala's /.
    "m5_audio_chunks" -> {
      val weighted = (0 until 16).map(j => s"${byteAt(j)} * ${j + 1}").mkString(" + ")
      s"""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
          m AS (
            SELECT doc_id,
                   CASE WHEN ${byteAt(2)} % 2 = 0 THEN 16000 ELSE 8000 END AS sample_rate,
                   8000 + ${byteAt(0)} * 256 + ${byteAt(1)} AS n_samples,
                   ($weighted) % 9973 AS cs
            FROM b),
          n AS (
            SELECT *, CASE WHEN n_samples <= $ChunkSamples THEN 1
                           ELSE 1 + (n_samples - $ChunkSamples + ${ChunkHop - 1}) // $ChunkHop
                      END AS n_chunks
            FROM m),
          c AS (
            SELECT doc_id, sample_rate, n_samples, cs,
                   CAST(unnest(range(n_chunks)) AS INT) AS chunk_idx
            FROM n)
          SELECT doc_id, CAST(sample_rate AS INT) AS sample_rate,
                 CAST(n_samples AS INT) AS n_samples, chunk_idx,
                 CAST(chunk_idx * $ChunkHop AS INT) AS start_sample,
                 CAST(least(chunk_idx * $ChunkHop + $ChunkSamples, n_samples) AS INT) AS end_sample,
                 CAST(least(chunk_idx * $ChunkHop + $ChunkSamples, n_samples)
                      - chunk_idx * $ChunkHop AS INT) AS n_chunk_samples,
                 CAST((cs + chunk_idx * 131) % 9973 AS INT) AS energy
          FROM c ORDER BY doc_id, chunk_idx"""
    },
    "m1_blob_meta" ->
      s"""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents)
          SELECT doc_id, 16 AS n_bytes,
                 CAST(1 + ${byteAt(0)} % 128 AS INT) AS width,
                 CAST(1 + ${byteAt(1)} % 128 AS INT) AS height,
                 CAST(1 + ${byteAt(2)} % 4 AS INT) AS channels,
                 CAST($sumBytes AS DOUBLE) / (16 * 255.0) AS mean_intensity
          FROM b ORDER BY doc_id""",
    // Aspect-fit geometry + position-weighted checksum, rebuilt from
    // the md5 hex exactly like m1 (integer division truncates
    // identically: all values positive).
    "m3_resize" -> {
      val weighted = (0 until 16).map(j => s"${byteAt(j)} * ${j + 1}").mkString(" + ")
      s"""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
          m AS (
            SELECT doc_id,
                   CAST(1 + ${byteAt(0)} % 128 AS INT) AS src_w,
                   CAST(1 + ${byteAt(1)} % 128 AS INT) AS src_h,
                   CAST(1 + ${byteAt(2)} % 4 AS INT) AS c,
                   CAST(($weighted) % 9973 AS INT) AS checksum
            FROM b),
          g AS (
            SELECT doc_id, src_w, src_h, c, checksum,
                   CAST(greatest(1, src_w * 64 // greatest(src_w, src_h)) AS INT) AS dst_w,
                   CAST(greatest(1, src_h * 64 // greatest(src_w, src_h)) AS INT) AS dst_h
            FROM m)
          SELECT doc_id, src_w, src_h, dst_w, dst_h,
                 CAST(dst_w * dst_h * c AS INT) AS thumb_bytes, checksum
          FROM g ORDER BY doc_id"""
    },
    // Consecutive-frame cosine over the 4-byte frame vectors, rebuilt
    // from the md5 hex like m1; the int sums are exact in double and
    // the final sqrt/divide are single shared IEEE ops.
    "m4_shot_boundaries" -> {
      def transition(fi: Int): String = {
        val a = (0 until FrameBytes).map(j => byteAt((fi - 1) * FrameBytes + j))
        val b = (0 until FrameBytes).map(j => byteAt(fi * FrameBytes + j))
        val dot = a.zip(b).map { case (x, y) => s"$x * $y" }.mkString(" + ")
        val na = a.map(x => s"$x * $x").mkString(" + ")
        val nb = b.map(y => s"$y * $y").mkString(" + ")
        s"""SELECT doc_id, CAST($fi AS INT) AS frame_idx,
                   CASE WHEN ($na) = 0 OR ($nb) = 0 THEN CAST(0 AS DOUBLE)
                        ELSE CAST($dot AS DOUBLE) /
                             (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)))
                   END AS cos_prev
            FROM b"""
      }
      val transitions = (1 until 16 / FrameBytes).map(transition).mkString(" UNION ALL ")
      s"""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
          t AS ($transitions)
          SELECT doc_id, frame_idx, cos_prev, cos_prev < $ShotThreshold AS is_boundary
          FROM t ORDER BY doc_id, frame_idx"""
    },
    // Sampled frames (idx 0 and 2 of 4): per-frame byte-window means,
    // rebuilt from the md5 hex exactly like m1.
    "m2_frame_sample" -> {
      def frame(fi: Int): String = {
        val off = fi * 4
        val sum = (off until off + 4).map(byteAt).mkString(" + ")
        s"""SELECT doc_id, CAST($fi AS INT) AS frame_idx, CAST($off AS INT) AS offset,
                   CAST($sum AS DOUBLE) / (4 * 255.0) AS mean_byte FROM b"""
      }
      s"""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents)
          ${frame(0)} UNION ALL ${frame(2)}
          ORDER BY doc_id, frame_idx"""
    },
  )
}
