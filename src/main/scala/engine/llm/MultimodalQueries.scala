package engine.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import engine.Core.{t, r4}
import engine.Q

/** Multimodal column plumbing (driver mandate, SURVEY.md §2 B51): media
  * as opaque `BINARY` payloads + typed metadata, with decode / feature-
  * extract / frame-sample as a partition-local typed transform
  * (`Dataset.mapPartitions` — the Scala analog of `mapInPandas`: one
  * iterator per partition, no per-row serialization churn, executors
  * never ship whole payload sets to the driver).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * CLEARLY-MARKED deterministic fake (byte histogram + stride sampling
  * standing in for pixel decode + frame sampling). The Spark-side
  * plumbing — schema, binary payload handling, batch shape, partition
  * locality — is real and is what LlmSpec tests.
  */
object MultimodalQueries {

  /** Opaque media payload + metadata, as a pretraining table would. */
  final case class MediaRow(
      doc_id: Long, payload: Array[Byte],
      width: Int, height: Int, channels: Int)

  /** Extracted features: fixed-width histogram "embedding" + a sampled
    * byte signature (stand-ins for a real decoder's outputs). */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      hist: Array[Double], sample_hex: String)

  /** DECODE STUB — deterministic fake for the absent media codec. A real
    * deployment replaces the body with e.g. JPEG decode + resize; the
    * signature (payload bytes in, fixed-size features out, pure,
    * partition-local) is the contract that scales. */
  def decodeStub(m: MediaRow): MediaFeatures = {
    val bins = new Array[Double](16)
    m.payload.foreach(b => bins((b & 0xff) >> 4) += 1.0)
    val n = math.max(m.payload.length, 1)
    val hist = bins.map(c => math.rint(c / n * 10000) / 10000)
    // "frame sample": every stride-th byte, first 8, hex-encoded
    val stride = math.max(m.payload.length / 8, 1)
    val sample = m.payload.indices.by(stride).take(8)
      .map(i => f"${m.payload(i) & 0xff}%02x").mkString
    MediaFeatures(m.doc_id, m.payload.length, m.width, m.height, hist, sample)
  }

  /** Payload synthesized from the text bytes — deterministic, so the
    * stub IS oracle-expressible: DuckDB replays the byte arithmetic over
    * `hex(payload)` (nibble histogram with round-half-even — Scala
    * `math.rint` ≡ DuckDB `round_even` — and the stride-8 byte sample),
    * so even the mapPartitions surface is hash-checked end to end. The
    * histogram is projected as 16 scalar columns (hist_00..hist_15), not
    * ARRAY<DOUBLE>: the final result is a verification surface and
    * scalar columns sort/hash in any downstream tool (array-typed result
    * columns are the one shape the driver harness cannot factorize). */
  private val multimodalFeatures = Q(
    (s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id") * 37, lit(512)) + 128).cast("int").as("width"),
        (pmod(col("doc_id") * 53, lit(384)) + 96).cast("int").as("height"),
        lit(3).as("channels"))
        .as[MediaRow]
      val histCols = (0 until 16).map(i =>
        element_at(col("hist"), i + 1).as(f"hist_$i%02d"))
      media.mapPartitions(_.map(decodeStub)).toDF()
        .select(Seq(col("doc_id"), col("n_bytes"), col("width"),
          col("height")) ++ histCols :+ col("sample_hex"): _*)
        .orderBy("doc_id")
    },
    Some {
      // NB: no `--` comments in oracle SQL — SparkEntry normalizes all
      // whitespace to single spaces, which would comment out the rest.
      // pos uses range(nb), not range(n): a 0-byte payload must yield NO
      // byte positions (('0x' || substr('',1,1))::INT is a hard error);
      // the LEFT JOIN keeps its doc alive with bin NULL → all-zero hist.
      val histAggs = (0 until 16).map(k =>
        f"round_even(sum(CASE WHEN bin=$k THEN 1 ELSE 0 END)::DOUBLE" +
          f" / max(n) * 10000, 0)/10000 AS hist_$k%02d").mkString(", ")
      val histSel = (0 until 16).map(k => f"h.hist_$k%02d").mkString(", ")
      s"""WITH m AS (
        SELECT doc_id, encode(text) AS payload,
          (doc_id * 37) % 512 + 128 AS width,
          (doc_id * 53) % 384 + 96 AS height
        FROM documents),
      b AS (SELECT doc_id, width, height, octet_length(payload) AS nb,
              greatest(octet_length(payload), 1) AS n, hex(payload) AS hx
            FROM m),
      pos AS (SELECT doc_id, unnest(range(nb)) AS i FROM b),
      nib AS (SELECT b.doc_id, b.n,
                ('0x' || substr(b.hx, 2*pos.i+1, 1))::INT AS bin
              FROM b LEFT JOIN pos USING (doc_id)),
      h AS (SELECT doc_id, $histAggs FROM nib GROUP BY doc_id),
      smp AS (SELECT doc_id,
                string_agg(lower(substr(hx, 2*(i*s)+1, 2)), '' ORDER BY i)
                  AS sample_hex
              FROM (SELECT doc_id, hx, nb, greatest(n // 8, 1) AS s,
                      unnest(range(8)) AS i FROM b)
              WHERE i*s < nb GROUP BY doc_id)
      SELECT b.doc_id, b.nb AS n_bytes, b.width, b.height, $histSel,
        coalesce(smp.sample_hex, '') AS sample_hex
      FROM b JOIN h ON b.doc_id = h.doc_id
      LEFT JOIN smp ON b.doc_id = smp.doc_id
      ORDER BY b.doc_id"""
    })

  /** One sampled "video frame": index, byte extent, and a cheap frame
    * signature (byte sum + head bytes) — a real decoder would emit the
    * decoded frame tensor here; extents and flow are what scale. */
  final case class FrameSample(
      doc_id: Long, frame_idx: Int, offset: Int, frame_bytes: Int,
      byte_sum: Long, head_hex: String)

  /** FRAME-SAMPLE STUB — every `every`-th fixed-size frame of the
    * payload, partition-local, one output row per sampled frame (the
    * 1→N `flatMap` shape of real frame extraction: output cardinality is
    * data-dependent, unlike the 1→1 feature map). */
  def frameSampleStub(m: MediaRow, frameBytes: Int = 64,
      every: Int = 4): Iterator[FrameSample] = {
    val nFrames = (m.payload.length + frameBytes - 1) / frameBytes
    (0 until nFrames by every).iterator.map { f =>
      val off = f * frameBytes
      val end = math.min(off + frameBytes, m.payload.length)
      val bytes = m.payload.slice(off, end)
      FrameSample(m.doc_id, f, off, end - off,
        bytes.foldLeft(0L)((a, b) => a + (b & 0xff)),
        bytes.take(4).map(b => f"${b & 0xff}%02x").mkString)
    }
  }

  /** B51c: frame sampling over opaque media payloads. Same synthetic
    * payload as multimodal_features; the oracle replays frame extents
    * and byte sums over `hex(payload)`, so the flatMap plumbing is
    * hash-checked end to end. */
  private val multimodalFramesample = Q(
    (s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit(0).as("width"), lit(0).as("height"), lit(1).as("channels"))
        .as[MediaRow]
      media.mapPartitions(_.flatMap(m => frameSampleStub(m))).toDF()
        .orderBy("doc_id", "frame_idx")
    },
    Some("""WITH m AS (SELECT doc_id, encode(text) AS payload FROM documents),
      b AS (SELECT doc_id, octet_length(payload) AS nb, hex(payload) AS hx
            FROM m),
      fr AS (SELECT doc_id, nb, hx,
               unnest(range(0, (nb + 63) // 64, 4)) AS f FROM b),
      frx AS (SELECT doc_id, nb, hx, f, (f * 64)::INT AS off,
               least(f * 64 + 64, nb)::INT AS fin FROM fr),
      pos AS (SELECT doc_id, f, unnest(range(off, fin)) AS i FROM frx),
      sums AS (SELECT p.doc_id, p.f,
                 sum(('0x' || substr(x.hx, (2 * p.i + 1)::INT, 2))::BIGINT)
                   ::BIGINT AS byte_sum
               FROM pos p JOIN b x ON p.doc_id = x.doc_id
               GROUP BY p.doc_id, p.f)
      SELECT frx.doc_id AS doc_id, frx.f::INT AS frame_idx, frx.off AS offset,
        (frx.fin - frx.off) AS frame_bytes,
        sums.byte_sum,
        lower(substr(frx.hx, 2 * frx.off + 1,
          least(8, 2 * (frx.fin - frx.off)))) AS head_hex
      FROM frx JOIN sums ON frx.doc_id = sums.doc_id AND frx.f = sums.f
      ORDER BY frx.doc_id, frame_idx"""))

  /** Fixed-side nearest-neighbor thumbnail of a payload raster — the
    * RESIZE stage of the decode/feature-extract/resize/frame-sample
    * quartet. */
  final case class ResizedThumb(
      doc_id: Long, n_bytes: Int, src_w: Int, src_rows: Int,
      thumb_hex: String, thumb_mean: Double)

  /** RESIZE STUB — deterministic nearest-neighbor downsample of the
    * payload interpreted as a `width`-wide row-major byte raster (a real
    * deployment decodes pixels first and resizes those; source index
    * arithmetic, clamping, and the fixed-size output contract are what
    * carry over). Output pixel (r, c) reads source byte
    * floor(r·rows/side)·w + floor(c·w/side), clamped into the payload. */
  def resizeStub(m: MediaRow, side: Int = 8): ResizedThumb = {
    val len = m.payload.length
    val w = math.max(m.width, 1)
    val rows = (len + w - 1) / w
    if (len == 0) ResizedThumb(m.doc_id, 0, w, 0, "", 0.0)
    else {
      val px = for { r <- 0 until side; c <- 0 until side } yield {
        val idx = math.min((r * rows / side) * w + (c * w / side), len - 1)
        m.payload(idx) & 0xff
      }
      ResizedThumb(m.doc_id, len, w, rows,
        px.map(v => f"$v%02x").mkString,
        math.rint(px.sum.toDouble / px.size * 10000) / 10000)
    }
  }

  /** B51e: payload resize — same synthetic raster dims as
    * multimodal_features; 1→1 typed map, partition-local, the thumbnail
    * projected as a hex string + mean so the result surface is scalar.
    * The oracle replays the index arithmetic over `hex(payload)`, so the
    * resize plumbing is hash-checked end to end. */
  private val multimodalResize = Q(
    (s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id") * 37, lit(512)) + 128).cast("int").as("width"),
        lit(0).as("height"), lit(1).as("channels"))
        .as[MediaRow]
      media.mapPartitions(_.map(m => resizeStub(m))).toDF()
        .select(col("doc_id"), col("n_bytes"), col("src_w"),
          col("src_rows"), col("thumb_hex"),
          r4(col("thumb_mean")).as("thumb_mean"))
        .orderBy("doc_id")
    },
    Some("""WITH m AS (SELECT doc_id, encode(text) AS payload,
               ((doc_id * 37) % 512 + 128)::INT AS w FROM documents),
      b AS (SELECT doc_id, w, octet_length(payload)::INT AS len,
              hex(payload) AS hx FROM m),
      g AS (SELECT doc_id, w, len, hx, (len + w - 1) // w AS rows FROM b),
      px AS (SELECT doc_id, r, c,
               least((r * rows // 8) * w + (c * w // 8), len - 1) AS idx,
               hx
             FROM g CROSS JOIN generate_series(0, 7) tr(r)
                    CROSS JOIN generate_series(0, 7) tc(c)
             WHERE len > 0),
      th AS (SELECT doc_id,
               string_agg(lower(substr(hx, (2 * idx + 1)::INT, 2)), ''
                 ORDER BY r, c) AS thumb_hex,
               round_even(sum(('0x' || substr(hx, (2 * idx + 1)::INT, 2))
                 ::BIGINT)::DOUBLE / 64 * 10000, 0) / 10000 AS thumb_mean
             FROM px GROUP BY doc_id)
      SELECT g.doc_id, g.len AS n_bytes, g.w AS src_w,
        CASE WHEN g.len = 0 THEN 0 ELSE g.rows END AS src_rows,
        coalesce(th.thumb_hex, '') AS thumb_hex,
        round(coalesce(th.thumb_mean, 0.0), 4) AS thumb_mean
      FROM g LEFT JOIN th USING (doc_id) ORDER BY g.doc_id"""))

  /** A frame signature appearing in more than this many docs is
    * boilerplate (blank frames, shared headers) and is excluded from
    * BOTH candidate generation and the overlap measure — the C4-style
    * df cap, which also bounds the signature equi-join's fan-out. */
  private val PayloadDfCap = 32

  /** B51d: PERCEPTUAL near-dup over the binary payload column — the
    * image/video dedup stage of a multimodal corpus build, over the
    * frame signatures [[frameSampleStub]] already emits. Two payloads
    * are near-dups when their POSITION-INDEPENDENT frame-signature sets
    * overlap (Jaccard ≥ 0.5): the signature is the frame CONTENT
    * (byte_sum + head bytes + extent), not its offset, so duplication
    * shifted by a whole number of frames still matches (the dedup_spans
    * rationale at byte granularity). Here every 64-byte frame is
    * signed (`every = 1` — dedup wants coverage; the sampling stub's
    * every=4 is the preview shape). Emits (da, db, n_common, jaccard)
    * per qualifying pair.
    *
    * Shape: postings are (doc_id, signature-string) narrow rows — the
    * payload itself never rides a shuffle; candidates come ONLY from
    * the signature equi-join (df-capped, collision-bound — never
    * O(n²)); overlap counts and per-doc set sizes are hash aggregates.
    * A real deployment swaps the signature body for a perceptual hash
    * (pHash/chromaprint) inside the same partition-local stub; the
    * banding/cap/verify plumbing is the deliverable. Deterministic byte
    * arithmetic end-to-end, so the oracle replays signatures, cap,
    * pairing, and the floor-rounded Jaccard over `hex(payload)`. */
  private val multimodalPayloadDedup = Q(
    (s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit(0).as("width"), lit(0).as("height"), lit(1).as("channels"))
        .as[MediaRow]
      // ONE linear pipeline to the persisted posting table (r10 bench
      // drifted 1.86 → 2.83 s from recomputed subtrees + join-heavy df/n
      // attachment): df and the per-doc kept-count n are window counts
      // (each one exchange, vs groupBy+join's two), n rides INTO the
      // self-join so no post-join against a cnt table is needed, and the
      // final repartition(sig) leaves the cache hash-partitioned on the
      // join key — both sides of the pair join read it exchange-free.
      val w = org.apache.spark.sql.expressions.Window
      val kept = engine.ScratchCache.persist(
        media.mapPartitions(_.flatMap(m =>
            frameSampleStub(m, frameBytes = 64, every = 1))).toDF()
          .select(col("doc_id"), concat_ws(":", col("byte_sum"),
            col("head_hex"), col("frame_bytes")).as("sig"))
          .distinct()
          .withColumn("df", count(lit(1)).over(w.partitionBy("sig")))
          .filter(col("df") <= PayloadDfCap)
          .withColumn("n", count(lit(1)).over(w.partitionBy("doc_id")))
          .select(col("doc_id"), col("sig"), col("n"))
          .repartition(col("sig")))
      val jac = col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common"))
      kept.as("x").join(kept.as("y"),
          col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        // na/nb are functionally dependent on da/db — grouping by them
        // changes no groups, it just carries the counts through the agg
        .groupBy(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
          col("x.n").as("na"), col("y.n").as("nb"))
        .agg(count(lit(1)).as("n_common"))
        .withColumn("jaccard", floor(jac * 10000 + lit(0.5)) / 10000.0)
        .filter(col("jaccard") >= 0.5)
        .select(col("da"), col("db"), col("n_common"), col("jaccard"))
        .orderBy("da", "db")
    },
    Some(s"""WITH m AS (SELECT doc_id, encode(text) AS payload
               FROM documents),
      b AS (SELECT doc_id, octet_length(payload) AS nb, hex(payload) AS hx
            FROM m),
      fr AS (SELECT doc_id, nb, hx,
               unnest(range(0, (nb + 63) // 64, 1)) AS f FROM b),
      frx AS (SELECT doc_id, nb, hx, f, (f * 64)::INT AS off,
               least(f * 64 + 64, nb)::INT AS fin FROM fr),
      pos AS (SELECT doc_id, f, unnest(range(off, fin)) AS i FROM frx),
      sums AS (SELECT p.doc_id, p.f,
                 sum(('0x' || substr(x.hx, (2 * p.i + 1)::INT, 2))::BIGINT)
                   ::BIGINT AS byte_sum
               FROM pos p JOIN b x ON p.doc_id = x.doc_id
               GROUP BY p.doc_id, p.f),
      sigs AS (SELECT DISTINCT frx.doc_id,
                 (sums.byte_sum::VARCHAR || ':' ||
                  lower(substr(frx.hx, 2 * frx.off + 1,
                    least(8, 2 * (frx.fin - frx.off)))) || ':' ||
                  (frx.fin - frx.off)::VARCHAR) AS sig
               FROM frx JOIN sums
                 ON frx.doc_id = sums.doc_id AND frx.f = sums.f),
      dfc AS (SELECT sig, count(*) AS df FROM sigs GROUP BY sig),
      kept AS (SELECT s.doc_id, s.sig FROM sigs s
               JOIN dfc USING (sig) WHERE dfc.df <= $PayloadDfCap),
      cnt AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
      pr AS (SELECT x.doc_id AS da, y.doc_id AS db,
               CAST(count(*) AS BIGINT) AS n_common
             FROM kept x JOIN kept y
               ON x.sig = y.sig AND x.doc_id < y.doc_id
             GROUP BY 1, 2),
      j AS (SELECT da, db, n_common,
              floor(n_common::DOUBLE / (ca.n + cb.n - n_common)
                * 10000 + 0.5) / 10000 AS jaccard
            FROM pr JOIN cnt ca ON ca.doc_id = pr.da
                    JOIN cnt cb ON cb.doc_id = pr.db)
      SELECT da, db, n_common, jaccard FROM j
      WHERE jaccard >= 0.5 ORDER BY da, db"""))

  // --------------------------------------- B51e multimodal_phash_dedup
  /** Average-hash parameters: 60 stride samples (the house 60-bit hash
    * width), 4 bands × 15 bits, hamming verify ≤ 8, and a band-bucket
    * occupancy cap (non-uniform media hashes concentrate — the simhash
    * mega-bucket discipline, here replicated in the ORACLE too so the
    * cap is part of the checked semantics, inert at test scale). */
  private val PhBits = 60
  private val PhHam = 8
  private val PhCap = 64

  /** 60-bit average hash of a payload — the aHash stand-in for a
    * perceptual image hash (a real deployment swaps in pHash/DCT over
    * decoded pixels; the signature — payload in, fixed-width hash out,
    * pure — is the contract): sample [[PhBits]] evenly-strided bytes,
    * set bit i iff sample i clears the sample mean. Deterministic
    * integer/exact-double math, replayed byte-for-byte by the oracle
    * over the ASCII payload. */
  def aHash60(payload: Array[Byte]): Long =
    if (payload.isEmpty) 0L
    else {
      val sam = (0 until PhBits)
        .map(i => payload((i.toLong * payload.length / PhBits).toInt) & 0xff)
      val mean = sam.sum.toDouble / PhBits
      sam.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
        if (v >= mean) h | (1L << i) else h
      }
    }

  /** B51f: PERCEPTUAL-HASH near-dup over media payloads — the image-
    * dedup screen every multimodal pretraining pipeline runs (exact
    * payload dedup misses re-encoded or near-identical media; a perceptual
    * hash bands like simhash): [[aHash60]] per payload
    * (partition-local typed transform, the decode-stub surface), 4×15
    * bit LSH bands propose candidates, exact hamming ≤ [[PhHam]]
    * verifies. Band buckets above [[PhCap]] occupancy are dropped in
    * BOTH engines — media hashes are non-uniform and a viral payload's
    * bucket would re-quadratize the self-join (the dedup_simhash
    * discipline, made part of the oracle contract). Emits verified
    * (da, db, hamming) pairs. */
  private val multimodalPhashDedup = Q(
    (s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(
          col("doc_id"), col("text").cast("binary").as("payload"),
          lit(0).as("width"), lit(0).as("height"), lit(3).as("channels"))
        .as[MediaRow]
      val hashes = engine.ScratchCache.persist(
        media.mapPartitions(_.map(m => (m.doc_id, aHash60(m.payload))))
          .toDF("doc_id", "hash"))
      val bands = hashes.select(col("doc_id"), col("hash"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("b"),
              shiftright(col("hash"), 15 * b).bitwiseAND(lit(32767L))
                .as("bv"))): _*)).as("bb"))
        .select(col("doc_id"), col("hash"), col("bb.b").as("b"),
          col("bb.bv").as("bv"))
      val capped = bands.withColumn("occ", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("b"), col("bv"))))
        .filter(col("occ") <= PhCap)
      val cand = capped.as("x").join(capped.as("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("x.hash").as("ha"),
          col("y.doc_id").as("db"), col("y.hash").as("hb"))
        .distinct()
      cand.withColumn("hamming",
          expr("bit_count(ha ^ hb)").cast("int"))
        .filter(col("hamming") <= PhHam)
        .select(col("da"), col("db"), col("hamming"))
        .orderBy("da", "db")
    },
    Some(s"""WITH mph AS (SELECT doc_id, length(text) len, text
               FROM documents),
      mbits AS (SELECT doc_id, i,
                 ascii(substr(text, (i * len // $PhBits)::INT + 1, 1)) v
               FROM mph CROSS JOIN range($PhBits) t(i)),
      mmean AS (SELECT doc_id, sum(v) / ${PhBits}.0 AS mean
               FROM mbits GROUP BY 1),
      mh AS (SELECT b.doc_id,
               sum(CASE WHEN b.v >= m.mean THEN (1::BIGINT << i::INT)
                   ELSE 0 END)::BIGINT AS hash
             FROM mbits b JOIN mmean m USING (doc_id) GROUP BY 1),
      mbands AS (SELECT doc_id, hash, b::INT AS b,
                 (hash >> (15 * b::INT)) & 32767 AS bv
               FROM mh CROSS JOIN range(4) t(b)),
      mcap AS (SELECT * FROM (SELECT doc_id, hash, b, bv,
                 count(*) OVER (PARTITION BY b, bv) AS occ FROM mbands)
               WHERE occ <= $PhCap),
      mcand AS (SELECT DISTINCT x.doc_id da, x.hash ha,
                 y.doc_id db, y.hash hb
               FROM mcap x JOIN mcap y
                 ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
      SELECT da, db, bit_count(xor(ha, hb))::INT AS hamming
      FROM mcand WHERE bit_count(xor(ha, hb)) <= $PhHam
      ORDER BY da, db"""))

  // ------------------------------------------------ B51g multimodal_align
  /** B51g: CROSS-MODAL ALIGNMENT scoring — the CLIP-score filtering
    * shape every image-text pretraining pipeline runs (LAION's cosine
    * gate): each paired (payload, embedding) row gets an alignment
    * cosine between a payload-derived feature vector (the 16-bin
    * nibble histogram, computed as PURE column math on the scan — no
    * typed transform, no shuffle) and the doc's embedding folded
    * 64 → 16 dims (fixed positional 4-blocks, exact order), plus a
    * DERANGEMENT CONTROL: the same score against the NEXT doc's
    * embedding ((id+1) mod N — the standard mismatched-pair baseline an
    * alignment-filter calibration uses), and the margin. In production
    * the two feature chains are real encoders and the filter keeps
    * pairs whose score clears the control distribution; here both
    * chains are deterministic stand-ins, so the DELIVERABLE is the
    * shape — per-pair scoring as map-side column math, the 1:1
    * modality join on the id, the shifted-key control join, one row
    * per paired doc — while the scores themselves carry the expected
    * isotropic-regime caveat (random embeddings ⇒ matched ≈ control on
    * average; the same regime note ann_recall_report documents).
    *
    * Float discipline: histogram counts are exact ints; the embedding
    * fold and every dot/norm is a FIXED-ORDER list fold (aggregate /
    * zip_with ≙ list_transform / list_zip / list_sum — order never
    * depends on partitioning); sqrt and the final divisions are
    * exact-IEEE; r4 only on the reported scores. Scale: feature math
    * rides the scan, the joins are id-keyed 1:1 equi-joins carrying
    * 16-double vectors — nothing corpus-scale shuffles but ids and
    * skinny features. */
  private val multimodalAlign = Q(
    (s, d) => {
      val e = t(s, d, "embeddings").select(col("vec_id"),
        expr("""transform(sequence(0, 15), k ->
            aggregate(slice(embedding, 4 * k + 1, 4),
              cast(0.0 as double), (a, x) -> a + cast(x as double)))""")
          .as("fv"))
      val n1 = e.agg(count(lit(1)).as("nv"))
      // The 16-bin high-nibble histogram with ZERO higher-order
      // functions. The r16 shape (nibble array rebuilt inside the
      // per-bin lambda) cost O(16·nb²) interpreted char scans per doc —
      // 156.5 s = 34% of the whole bench — and materializing the array
      // in its own Project does NOT fix it: CollapseProject re-inlines
      // any non-cheap expression consumed exactly once, and a column
      // referenced only inside a lambda body counts as consumed once,
      // so the split lands back in the lambda and re-evaluates per
      // element. Instead: one regexp keeps the odd-position hex chars
      // (byte i's high nibble is hex char 2i+1), then each bin count is
      // the codegen'd length-difference after `translate`-deleting that
      // digit — O(16·nb) whole-stage-codegen string ops, no lambda, no
      // CodegenFallback. `hi` is referenced 32× below, which also keeps
      // its Project from collapsing into the counts.
      val hexDigits = "0123456789ABCDEF"
      val m = t(s, d, "documents").select(col("doc_id"),
          regexp_replace(hex(col("text").cast("binary")), "(.).", "$1")
            .as("hi"))
        .select(col("doc_id"), array((0 until 16).map(k =>
            (length(col("hi")) - length(translate(col("hi"),
              hexDigits.substring(k, k + 1), ""))).cast("double")): _*)
          .as("cv"))
        .crossJoin(broadcast(n1))
      def cos(a: String, b: String): org.apache.spark.sql.Column =
        expr(s"""aggregate(zip_with($a, $b, (x, y) -> x * y),
            cast(0.0 as double), (acc, x) -> acc + x)""") /
          (sqrt(expr(s"""aggregate($a, cast(0.0 as double),
              (acc, x) -> acc + x * x)""")) *
           sqrt(expr(s"""aggregate($b, cast(0.0 as double),
              (acc, x) -> acc + x * x)""")))
      m.join(e, col("doc_id") === col("vec_id"))
        .withColumnRenamed("fv", "fm").drop("vec_id")
        .join(e.withColumnRenamed("fv", "fc"),
          pmod(col("doc_id") + 1, col("nv")) === col("vec_id"))
        // Cosines materialized as columns so margin subtracts two
        // already-computed scalars instead of re-running four folds.
        .select(col("doc_id"), cos("cv", "fm").as("a"),
          cos("cv", "fc").as("c"))
        .select(col("doc_id"),
          r4(col("a")).as("align_cos"),
          r4(col("c")).as("ctrl_cos"),
          r4(col("a") - col("c")).as("margin"))
        .orderBy("doc_id")
    },
    Some("""WITH an AS (SELECT count(*) AS nv FROM embeddings),
      af AS (SELECT vec_id, list_transform(range(16), k ->
               list_sum(list_transform(range(4), j ->
                 embedding[4 * k + j + 1]::DOUBLE))) AS fv
             FROM embeddings),
      am AS (SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
             FROM documents),
      ac AS (SELECT doc_id, list_transform(range(16), k ->
               len(list_filter(
                 list_transform(range(nb), i ->
                   ('0x' || substr(hx, 2 * i + 1, 1))::INT),
                 x -> x = k))::DOUBLE) AS cv
             FROM am),
      aj AS (SELECT c.doc_id, c.cv, fm.fv AS fm, fc.fv AS fc
             FROM ac c CROSS JOIN an
             JOIN af fm ON fm.vec_id = c.doc_id
             JOIN af fc ON fc.vec_id = (c.doc_id + 1) % an.nv),
      ax AS (SELECT doc_id,
               list_sum(list_transform(list_zip(cv, fm),
                 p -> p[1] * p[2])) /
               (sqrt(list_sum(list_transform(cv, x -> x * x))) *
                sqrt(list_sum(list_transform(fm, x -> x * x)))) AS a,
               list_sum(list_transform(list_zip(cv, fc),
                 p -> p[1] * p[2])) /
               (sqrt(list_sum(list_transform(cv, x -> x * x))) *
                sqrt(list_sum(list_transform(fc, x -> x * x)))) AS c
             FROM aj)
      SELECT doc_id, round(a, 4) AS align_cos, round(c, 4) AS ctrl_cos,
        round(a - c, 4) AS margin
      FROM ax ORDER BY doc_id"""))

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> multimodalFeatures,
    "multimodal_align" -> multimodalAlign,
    "multimodal_framesample" -> multimodalFramesample,
    "multimodal_resize" -> multimodalResize,
    "multimodal_payload_dedup" -> multimodalPayloadDedup,
    "multimodal_phash_dedup" -> multimodalPhashDedup)
}
