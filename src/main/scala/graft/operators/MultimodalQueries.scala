package graft.operators

import graft.{Q, QueryPack, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries (north-star): binary payloads + typed
  * metadata over the synthesized media table (see [[Multimodal]]). The
  * manifest and frame-sampling pipelines are fully oracle-checked (DuckDB
  * builds the identical payloads with encode()); the stubbed decode is
  * checked for shape/determinism in MultimodalSpec.
  */
object MultimodalQueries extends QueryPack {

  val qs: Seq[Q] = Seq(
    // Ingestion manifest: per-modality counts/bytes/metadata ranges.
    // Metadata-only aggregation — the parquet scan prunes the payload
    // column entirely (ReadSchema excludes it).
    Q(
      "mm_manifest",
      """SELECT modality, COUNT(*) AS docs,
        |       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |       CAST(MIN(doc_id % 640 + 64) AS BIGINT) AS min_w,
        |       CAST(MAX(doc_id % 480 + 48) AS BIGINT) AS max_h
        |FROM (SELECT doc_id, text,
        |        ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality
        |      FROM documents) t
        |GROUP BY modality
        |ORDER BY modality""".stripMargin
    ) { (s, dir) =>
      Multimodal.mediaTable(Tables.load(s, dir, "documents"))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("docs"),
          sum(octet_length(col("payload"))).cast("long").as("total_bytes"),
          min(col("meta.width")).cast("long").as("min_w"),
          max(col("meta.height")).cast("long").as("max_h"))
        .orderBy(col("modality"))
    },

    // Frame sampling: video payloads → 64-byte pseudo-frames → every 10th
    // frame, per-doc sampled counts.
    Q(
      "mm_frame_sample",
      """SELECT doc_id, n_frames, COUNT(*) AS sampled
        |FROM (
        |  SELECT doc_id,
        |         (octet_length(encode(text)) // 64)::INT AS n_frames,
        |         unnest(generate_series(0, (octet_length(encode(text)) // 64)::INT - 1)) AS frame_no
        |  FROM documents
        |  WHERE ['image','audio','video'][(doc_id % 3 + 1)::INT] = 'video') t
        |WHERE frame_no % 10 = 0
        |GROUP BY doc_id, n_frames
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.mediaTable(Tables.load(s, dir, "documents")), 10)
        .groupBy(col("doc_id"), col("n_frames"))
        .agg(count(lit(1)).as("sampled"))
        .orderBy(col("doc_id"))
    },

    // Stubbed decode through the typed mapPartitions path. The decode
    // itself is the clearly-marked deterministic fake (no codecs in this
    // container) — but BECAUSE it is deterministic over the payload
    // bytes, DuckDB replays the identical arithmetic (same float-op
    // order: per-byte /255 accumulation, then /n, then *4) and the
    // distributed mapPartitions plumbing is fully oracle-checked, not
    // just rows-counted. MultimodalSpec still asserts shape/determinism.
    //
    // ORACLE PRECONDITION: the oracle indexes characters (ord/substr)
    // where the stub indexes UTF-8 bytes — identical only for pure-ASCII
    // text, which holds for this corpus (octet_length == length for every
    // document; verified at all SFs). A non-ASCII corpus would need a
    // byte-accurate oracle (DuckDB lacks get_byte over BLOBs).
    Q(
      "mm_decode_features",
      """SELECT doc_id,
        |       ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       round(COALESCE(list_sum(list_transform(
        |                generate_series(1, octet_length(encode(text)), 4),
        |                i -> ord(substr(text, i, 1)) / 255.0)), 0.0)
        |             / GREATEST(octet_length(encode(text)), 1) * 4.0, 6) AS f0
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.decodeFeaturesStub(
          Multimodal.mediaTable(Tables.load(s, dir, "documents")))
        .toDF()
        .select(col("doc_id"), col("modality"), col("n_bytes"),
          round(element_at(col("features"), 1), 6).as("f0"))
        .orderBy(col("doc_id"))
    },

    // Resize (stubbed codec, real plumbing): image payloads scaled to a
    // 64x64 target box — byte budget follows the pixel ratio, payload
    // truncated executor-side (binary substring, never the driver). The
    // oracle replays the identical budget arithmetic; the payload slice
    // itself is asserted prefix-exact in MultimodalSpec.
    Q(
      "mm_resize",
      """SELECT doc_id,
        |       (doc_id % 640 + 64)::INT AS w,
        |       (doc_id % 480 + 48)::INT AS h,
        |       CAST(GREATEST(1, LEAST(octet_length(encode(text)),
        |           CAST(ceil(octet_length(encode(text)) *
        |                (4096.0 / CAST((doc_id % 640 + 64) * (doc_id % 480 + 48) AS DOUBLE)))
        |                AS BIGINT))) AS BIGINT) AS resized_bytes
        |FROM documents
        |WHERE ['image','audio','video'][(doc_id % 3 + 1)::INT] = 'image'
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.resize(
          Multimodal.mediaTable(Tables.load(s, dir, "documents")), 64, 64)
        .select(col("doc_id"), col("w"), col("h"), col("resized_bytes"))
        .orderBy(col("doc_id"))
    },

    // Payload-hash dedup — exact media dedup WITHOUT decoding: md5 over
    // the raw binary payload, grouped within modality, canonical = the
    // smallest doc_id. The 100 TB point: byte-identical re-crawls and
    // re-uploads are caught by one hash-groupBy on the digest (a single
    // shuffle of 16-byte keys, payloads never move), the same shape as
    // text dedup_exact — the binary column changes nothing about the
    // plan. DuckDB hashes the identical bytes (payload = UTF-8 of text).
    Q(
      "mm_dedup_payload",
      """SELECT modality, md5(text) AS payload_md5,
        |       CAST(COUNT(*) AS BIGINT) AS copies,
        |       MIN(doc_id) AS canonical_id
        |FROM (SELECT doc_id, text,
        |        ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality
        |      FROM documents) t
        |GROUP BY modality, md5(text)
        |ORDER BY modality, payload_md5""".stripMargin
    ) { (s, dir) =>
      Multimodal.mediaTable(Tables.load(s, dir, "documents"))
        .groupBy(col("modality"), md5(col("payload")).as("payload_md5"))
        .agg(count(lit(1)).cast("long").as("copies"),
          min(col("doc_id")).as("canonical_id"))
        .orderBy(col("modality"), col("payload_md5"))
    },

    // REAL image codec, oracle-verified: per doc, render a deterministic
    // pixel pattern (r=(id+x)%256, g=(id+y)%256, b=id%256), encode→decode
    // through javax.imageio PNG ON THE EXECUTORS, and report channel means
    // computed FROM THE DECODED PIXELS. PNG is lossless, so the means must
    // equal the pattern's closed form — which is what the oracle computes
    // in SQL (mean_r collapses to the x-marginal since r is y-independent;
    // sums are exact integers, so the double division is bit-identical on
    // both engines). A decoder bug, a lossy write, or a channel swap all
    // hash-mismatch. The two-row-loop work is bounded (images ≤ 71×55) and
    // entirely payload-local: only the 7-column feature row ever moves.
    Q(
      "mm_decode_png",
      """SELECT doc_id,
        |       (doc_id % 64 + 8)::INT AS w,
        |       (doc_id % 48 + 8)::INT AS h,
        |       round(CAST(list_sum(list_transform(
        |                generate_series(0, (doc_id % 64 + 8)::INT - 1),
        |                x -> (doc_id + x) % 256)) AS DOUBLE)
        |             / (doc_id % 64 + 8), 6) AS mean_r,
        |       round(CAST(list_sum(list_transform(
        |                generate_series(0, (doc_id % 48 + 8)::INT - 1),
        |                y -> (doc_id + y) % 256)) AS DOUBLE)
        |             / (doc_id % 48 + 8), 6) AS mean_g,
        |       CAST(doc_id % 256 AS DOUBLE) AS mean_b
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.pngFeatures(Tables.load(s, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("w"), col("h"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          col("mean_b"))
        .orderBy(col("doc_id"))
    },

    // REAL codec on REAL payload bytes (closing the synthetic-gradient
    // gap): the payload bytes ARE the pixel data — r/g/b of pixel i =
    // payload byte (i)/(i+1)/(i+2) mod len over a 32×24 tile — encoded
    // to an actual PNG binary column and decoded back through
    // javax.imageio ON THE EXECUTORS, with channel means computed from
    // the DECODED pixels. The oracle replays the closed form over the
    // same bytes (pure-ASCII corpus ⇒ ord(char) = byte; sums exact
    // integers ⇒ bit-identical division). Any loss, swap, or decode bug
    // in the real codec path hash-mismatches.
    Q(
      "mm_decode_payload_png",
      """SELECT doc_id,
        |       round(CAST(list_sum(list_transform(generate_series(0, 767),
        |                i -> ord(substr(text, (i % octet_length(encode(text))) + 1, 1))))
        |              AS DOUBLE) / 768, 6) AS mean_r,
        |       round(CAST(list_sum(list_transform(generate_series(0, 767),
        |                i -> ord(substr(text, ((i + 1) % octet_length(encode(text))) + 1, 1))))
        |              AS DOUBLE) / 768, 6) AS mean_g,
        |       round(CAST(list_sum(list_transform(generate_series(0, 767),
        |                i -> ord(substr(text, ((i + 2) % octet_length(encode(text))) + 1, 1))))
        |              AS DOUBLE) / 768, 6) AS mean_b
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.payloadPngFeatures(
          Multimodal.mediaTable(Tables.load(s, dir, "documents")))
        .toDF()
        .select(col("doc_id"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy(col("doc_id"))
    },

    // Frame-level video dedup WITHOUT decoding: slice each video payload
    // into its 64-byte pseudo-frames, md5 each frame executor-side, and
    // report doc pairs sharing ≥2 distinct frame hashes with their
    // containment (shared / min frame count) — partial re-encodes and
    // clipped copies that whole-payload hashing (mm_dedup_payload) can
    // never catch. The shape is the winnow containment pipeline applied
    // to a BINARY column: payload-local slicing + hash, one equi-join on
    // the 16-byte frame digest with a df ≤ 50 stop-frame cap (intros /
    // color bars / black frames recur across unrelated videos and would
    // otherwise grow pair work df²), everything hash-partitioned — the
    // plan a 100 TB video corpus needs. DuckDB slices the identical
    // bytes (payload = UTF-8 of the pure-ASCII text).
    Q(
      "mm_frame_dedup",
      """WITH v AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 3 + 1 = 3 AND length(text) >= 64
        |    AND length(text) = octet_length(encode(text))),
        |f0 AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, length(text) // 64)) AS k
        |  FROM v),
        |f AS (
        |  SELECT DISTINCT doc_id,
        |         md5(substr(text, CAST((k - 1) * 64 + 1 AS BIGINT), 64)) AS fh
        |  FROM f0),
        |rare AS (SELECT fh FROM f GROUP BY fh HAVING count(*) <= 50),
        |fr AS (SELECT doc_id, fh FROM f WHERE fh IN (SELECT fh FROM rare)),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf FROM fr GROUP BY doc_id),
        |sh AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM fr x JOIN fr y ON x.fh = y.fh AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT s.a, s.b, s.n_shared,
        |       round(CAST(s.n_shared AS DOUBLE) / LEAST(za.nf, zb.nf), 6) AS containment
        |FROM sh s JOIN sz za ON za.doc_id = s.a JOIN sz zb ON zb.doc_id = s.b
        |WHERE s.n_shared >= 2
        |ORDER BY s.a, s.b""".stripMargin
    ) { (s, dir) =>
      // DuckDB cannot slice BLOBs, so the oracle frames by CHARACTER
      // positions — sound only where chars and bytes coincide. Both
      // sides therefore restrict to single-byte (ASCII) docs EXPLICITLY:
      // on a non-ASCII fixture the two engines agree on the restricted
      // domain instead of silently diverging on shifted frame bounds.
      // (Today's fixtures are pure ASCII at every SF, so the filter
      // keeps every doc.)
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) === octet_length(col("text")))
      val media = Multimodal.mediaTable(docs)
      // the distinct frame-hash table feeds FOUR consumers (rare, both
      // join sides, sz) — persist so the payload scan + slice + md5 +
      // distinct subtree runs once (the winnowContainment discipline
      // this pipeline mirrors)
      val frames = Multimodal.videoFrameIndex(media)
        .select(col("doc_id"),
          md5(expr("substring(payload, (k - 1) * 64 + 1, 64)")).as("fh"))
        .distinct()
        .persist()
      val rare = frames.groupBy(col("fh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50).select(col("fh"))
      val fr = frames.join(rare, "fh")
      val sz = fr.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
      val sh = fr.select(col("fh"), col("doc_id").as("a"))
        .join(fr.select(col("fh"), col("doc_id").as("b")), "fh")
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
      val result = sh
        .join(sz.select(col("doc_id").as("a"), col("nf").as("nfa")), "a")
        .join(sz.select(col("doc_id").as("b"), col("nf").as("nfb")), "b")
        .select(col("a"), col("b"), col("n_shared"),
          round(col("n_shared").cast("double") / least(col("nfa"), col("nfb")), 6)
            .as("containment"))
        .orderBy(col("a"), col("b"))
        // materialize the small pair set, cut lineage, release the
        // frame-hash scaffold now (checkpoint blocks die with the DF)
        .localCheckpoint(true)
      frames.unpersist()
      result
    },

    // Perceptual (dHash) image near-dup over the REAL decode path: byte
    // hashing (mm_dedup_payload) and frame hashing (mm_frame_dedup) both
    // miss re-encoded/resized duplicates — the dominant image-dedup case
    // in web-scale training data. Here every image doc yields TWO
    // variants through the actual javax.imageio codec (the original
    // 36×48 payload-pixel tile, and a REAL ÷2 resize of its decoded
    // pixels, re-encoded and re-decoded), each reduced to a 64-bit dHash
    // of 9×8 integer luma-block gradients. Discovery is banded LSH on
    // 4×16-bit hash slices (a shuffled equi-join — never all-pairs) with
    // an exact bit_count(xor) ≤ 6 verify. Every resized copy must
    // rediscover its original through a byte-disjoint representation;
    // the oracle replays pixels → truncated-mean resize → luma blocks →
    // bits → bands → hamming declaratively (all integer arithmetic, so
    // the replay is hash-exact).
    Q(
      "mm_dedup_perceptual",
      """WITH img AS (
        |  -- GREATEST/CASE twin of the Scala empty-payload guard
        |  -- (Multimodal.perceptualHashes substitutes a single zero byte
        |  -- for an empty payload): len = 0 would make i % len a
        |  -- division-by-zero here, on a doc the operator handles
        |  SELECT doc_id, text,
        |         GREATEST(octet_length(encode(text)), 1) AS len,
        |         octet_length(encode(text)) = 0 AS empty
        |  FROM documents
        |  WHERE doc_id % 3 = 0 AND length(text) = octet_length(encode(text))),
        |pxa AS (
        |  SELECT doc_id, i % 36 AS x, i // 36 AS y,
        |         CASE WHEN empty THEN 0
        |              ELSE ord(substr(text, (i % len) + 1, 1)) END AS r,
        |         CASE WHEN empty THEN 0
        |              ELSE ord(substr(text, ((i + 1) % len) + 1, 1)) END AS g,
        |         CASE WHEN empty THEN 0
        |              ELSE ord(substr(text, ((i + 2) % len) + 1, 1)) END AS b
        |  FROM (SELECT doc_id, text, len, empty,
        |          unnest(generate_series(0, 1727)) AS i FROM img) t),
        |pxb AS (
        |  SELECT doc_id, x // 2 AS x, y // 2 AS y,
        |         SUM(r) // 4 AS r, SUM(g) // 4 AS g, SUM(b) // 4 AS b
        |  FROM pxa GROUP BY doc_id, x // 2, y // 2),
        |blk AS (
        |  SELECT doc_id, 0 AS variant, y // 6 AS br, x // 4 AS bc,
        |         SUM(299 * r + 587 * g + 114 * b) AS s
        |  FROM pxa GROUP BY doc_id, y // 6, x // 4
        |  UNION ALL
        |  SELECT doc_id, 1 AS variant, y // 3 AS br, x // 2 AS bc,
        |         SUM(299 * r + 587 * g + 114 * b) AS s
        |  FROM pxb GROUP BY doc_id, y // 3, x // 2),
        |bits AS (
        |  SELECT doc_id, variant, br * 8 + bc AS idx, bit FROM (
        |    SELECT doc_id, variant, br, bc,
        |           CASE WHEN lead(s) OVER (PARTITION BY doc_id, variant, br
        |                                   ORDER BY bc) > s
        |                THEN 1 ELSE 0 END AS bit
        |    FROM blk) w
        |  WHERE bc < 8),
        |bnd AS (
        |  SELECT doc_id, variant, idx // 16 AS band,
        |         CAST(SUM(bit * (1 << (idx % 16))) AS BIGINT) AS bandval
        |  FROM bits GROUP BY doc_id, variant, idx // 16),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS a_doc, x.variant AS a_var,
        |                  y.doc_id AS b_doc, y.variant AS b_var
        |  FROM bnd x JOIN bnd y
        |    ON x.band = y.band AND x.bandval = y.bandval
        |   AND (x.doc_id < y.doc_id OR
        |        (x.doc_id = y.doc_id AND x.variant < y.variant))),
        |ham AS (
        |  SELECT c.a_doc, c.a_var, c.b_doc, c.b_var,
        |         CAST(SUM(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS BIGINT)
        |           AS hamming
        |  FROM cand c
        |  JOIN bits p ON p.doc_id = c.a_doc AND p.variant = c.a_var
        |  JOIN bits q ON q.doc_id = c.b_doc AND q.variant = c.b_var
        |             AND q.idx = p.idx
        |  GROUP BY c.a_doc, c.a_var, c.b_doc, c.b_var)
        |SELECT a_doc, a_var::INT AS a_var, b_doc, b_var::INT AS b_var, hamming
        |FROM ham WHERE hamming <= 6
        |ORDER BY a_doc, a_var, b_doc, b_var""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) === octet_length(col("text")))
      // the hash set feeds both sides of the band self-join — persist so
      // the codec pipeline (2 encodes + 2 decodes + resize per doc) runs
      // exactly once
      val hashes = Multimodal.perceptualHashes(Multimodal.mediaTable(docs))
        .toDF().persist()
      val items = hashes.select(col("doc_id"), col("variant"), col("dhash"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bandval", expr("shiftrightunsigned(dhash, band * 16) & 65535"))
      val result = items
        .select(col("band"), col("bandval"), col("doc_id").as("a_doc"),
          col("variant").as("a_var"), col("dhash").as("ha"))
        .join(items.select(col("band"), col("bandval"), col("doc_id").as("b_doc"),
          col("variant").as("b_var"), col("dhash").as("hb")), Seq("band", "bandval"))
        .filter(col("a_doc") < col("b_doc") ||
          (col("a_doc") === col("b_doc") && col("a_var") < col("b_var")))
        .select(col("a_doc"), col("a_var"), col("ha"),
          col("b_doc"), col("b_var"), col("hb"))
        .distinct()
        .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
        .filter(col("hamming") <= 6)
        .select(col("a_doc"), col("a_var"), col("b_doc"), col("b_var"), col("hamming"))
        .orderBy(col("a_doc"), col("a_var"), col("b_doc"), col("b_var"))
        // materialize the small pair set, then release the hash scaffold
        .localCheckpoint(true)
      hashes.unpersist()
      result
    },

    // Shot-boundary (scene-cut) detection WITHOUT decoding: the frame
    // energy expression generalizes to any fixed-frame binary modality —
    // here video payloads framed at 64 bytes, with a cut flagged where
    // consecutive frame energies jump by more than 20000 (≈ the corpus's
    // p90 inter-frame delta). Consecutive-frame deltas come from
    // zip_with over the energy array against its own tail — still
    // payload-local, zero shuffles before the sort, all integers (so the
    // oracle's lag-window replay is hash-exact).
    Q(
      "mm_scene_cuts",
      """WITH v AS (
        |  SELECT doc_id, text, octet_length(encode(text)) // 64 AS nf
        |  FROM documents
        |  WHERE doc_id % 3 + 1 = 3
        |    AND length(text) = octet_length(encode(text))
        |    AND octet_length(encode(text)) >= 128),
        |fe AS (
        |  SELECT doc_id, nf, k,
        |         list_sum(list_transform(generate_series((k - 1) * 64 + 1, k * 64),
        |           i -> CAST((ord(substr(text, CAST(i AS BIGINT), 1)) - 128)
        |                     * (ord(substr(text, CAST(i AS BIGINT), 1)) - 128) AS BIGINT))) AS e
        |  FROM (SELECT doc_id, text, nf, unnest(generate_series(1, nf)) AS k FROM v) t),
        |d AS (
        |  SELECT doc_id, nf,
        |         abs(e - lag(e) OVER (PARTITION BY doc_id ORDER BY k)) AS dd
        |  FROM fe)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |       CAST(SUM(CASE WHEN dd > 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
        |       CAST(MAX(dd) AS BIGINT) AS max_delta
        |FROM d WHERE dd IS NOT NULL
        |GROUP BY doc_id, nf
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) === octet_length(col("text")))
      val video = Multimodal.mediaTable(docs)
        .filter(col("modality") === "video")
        .filter(octet_length(col("payload")) >= 128)
      video
        .select(col("doc_id"),
          graft.functions.AudioFunctions.frameEnergies(col("payload"), 64).as("e"))
        .select(col("doc_id"),
          size(col("e")).cast("long").as("n_frames"),
          zip_with(
            slice(col("e"), lit(1), size(col("e")) - 1),
            slice(col("e"), lit(2), size(col("e")) - 1),
            (a, b) => abs(b - a)).as("d"))
        .select(col("doc_id"), col("n_frames"),
          size(filter(col("d"), x => x > lit(20000L))).cast("long").as("n_cuts"),
          array_max(col("d")).as("max_delta"))
        .orderBy(col("doc_id"))
    },

    // Audio frame analysis WITHOUT an audio lib (the audio leg of the
    // multimodal suite, next to the video mm_frame_* ops): audio payloads
    // as unsigned 8-bit PCM centered at 128, framed into 32-sample
    // windows, per-frame energy = the EXACT integer Σ(b−128)² from a
    // native expression (AudioFrameEnergiesExpr — payload-local narrow
    // map, only the energy array leaves the operator, payload bytes never
    // shuffle). Frame stats then compose from codegen'd array functions
    // (size/array_max/filter/aggregate) instead of an explode+groupBy —
    // zero shuffles before the final sort. Quiet-frame threshold 58000 ≈
    // the corpus's lower energy quartile; the oracle replays the same
    // integer arithmetic over the same ASCII bytes (ord = byte under the
    // explicit single-byte guard both sides carry, as in mm_frame_dedup).
    Q(
      "mm_audio_energy",
      """WITH a AS (
        |  SELECT doc_id, text, octet_length(encode(text)) // 32 AS nf
        |  FROM documents
        |  WHERE doc_id % 3 + 1 = 2
        |    AND length(text) = octet_length(encode(text))
        |    AND octet_length(encode(text)) >= 32),
        |fe AS (
        |  SELECT doc_id, nf,
        |         list_sum(list_transform(generate_series((k - 1) * 32 + 1, k * 32),
        |           i -> CAST((ord(substr(text, CAST(i AS BIGINT), 1)) - 128)
        |                     * (ord(substr(text, CAST(i AS BIGINT), 1)) - 128) AS BIGINT))) AS e
        |  FROM (SELECT doc_id, text, nf, unnest(generate_series(1, nf)) AS k FROM a) t)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |       CAST(MAX(e) AS BIGINT) AS peak_energy,
        |       CAST(SUM(CASE WHEN e < 58000 THEN 1 ELSE 0 END) AS BIGINT) AS n_quiet,
        |       round(CAST(SUM(e) AS DOUBLE) / nf, 6) AS mean_energy
        |FROM fe GROUP BY doc_id, nf
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) === octet_length(col("text")))
      val audio = Multimodal.mediaTable(docs)
        .filter(col("modality") === "audio")
        .filter(octet_length(col("payload")) >= 32)
      audio
        .select(col("doc_id"),
          graft.functions.AudioFunctions.frameEnergies(col("payload"), 32).as("e"))
        .select(col("doc_id"),
          size(col("e")).cast("long").as("n_frames"),
          array_max(col("e")).as("peak_energy"),
          size(filter(col("e"), x => x < lit(58000L))).cast("long").as("n_quiet"),
          round(aggregate(col("e"), lit(0L), (acc, x) => acc + x).cast("double")
                  / size(col("e")), 6).as("mean_energy"))
        .orderBy(col("doc_id"))
    }
  )
}
