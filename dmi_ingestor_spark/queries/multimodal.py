"""Multimodal queries (SURVEY.md U2/U8): binary payload plumbing.

``mm_decode_features`` is partially oracle-checkable: sha256 and byte
lengths are engine-agnostic, so the scalar halves get a DuckDB twin;
the Arrow-batch feature vectors are covered by invariant tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.operators.multimodal import (
    attach_payloads,
    decode_features,
    sample_frames,
)
from dmi_ingestor_spark.registry import register


@register(
    "mm_payload_metadata",
    oracle="""
    SELECT
      doc_id,
      'application/octet-stream' AS mime,
      CAST(LENGTH(text) AS BIGINT) AS n_bytes,
      sha256(text) AS checksum
    FROM documents
    """,
    doc=(
        "U8 metadata path: payload length + sha256 checksum computed "
        "JVM-side on the binary column (ASCII text ⇒ byte length = char "
        "length, so DuckDB can check it)."
    ),
    tags=("multimodal",),
)
def mm_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payloads(table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        "mime",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("checksum"),
    )


# DuckDB lacks direct byte indexing into sha256 output, so the oracle
# decodes hex pairs by hand: byte_i = 16*hex(2i+1) + hex(2i+2).
_HEXBYTE = (
    "((strpos('0123456789abcdef', substr(sha256(text), {lo}, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(sha256(text), {hi}, 1)) - 1))"
)


def _mm_oracle() -> str:
    # Mirrors operators/multimodal._decode_bytes exactly: f0 = len,
    # f1..f6 = digest byte i / 255.0, f7 = sum(bytes[:256]) / (255*min(n,256)).
    # Quantized round(x*1000) → BIGINT on both sides (integer-exact compare).
    feat_cols = ["CAST(ROUND(CAST(LENGTH(text) AS DOUBLE) * 1000) AS BIGINT) AS q0"]
    for i in range(6):
        hexpair = _HEXBYTE.format(lo=2 * i + 1, hi=2 * i + 2)
        feat_cols.append(
            f"CAST(ROUND(CAST({hexpair} AS DOUBLE) / 255.0 * 1000) AS BIGINT) AS q{i + 1}"
        )
    feat_cols.append(
        "CAST(ROUND("
        "  CAST(list_aggregate(list_transform(string_split(substr(text, 1, 256), ''),"
        "       x -> ascii(x)), 'sum') AS DOUBLE)"
        "  / (255.0 * LEAST(LENGTH(text), 256)) * 1000) AS BIGINT) AS q7"
    )
    cols = ",\n      ".join(feat_cols)
    return f"""
    SELECT
      doc_id,
      'application/octet-stream' AS mime,
      CAST(LENGTH(text) AS BIGINT) AS n_bytes,
      sha256(text) AS checksum,
      {cols}
    FROM documents
    """


@register(
    "mm_decode_features",
    oracle=_mm_oracle(),
    doc=(
        "U2/U8 decode: mapInPandas over binary payloads → checksum + "
        "8-dim feature vector (codec stubbed, plumbing real). The vector "
        "is emitted as quantized q0..q7 BIGINT columns so the driver's "
        "canonicalizer can sort/hash it (round-1 failure: raw "
        "array<double> cells are unhashable in pandas), and so the "
        "byte-statistics decode is itself DuckDB-checkable."
    ),
    tags=("multimodal",),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payloads(table(spark, sf_dir, "documents"))
    decoded = decode_features(media)
    quantized = [
        F.round(F.col("features")[i] * 1000).cast("long").alias(f"q{i}")
        for i in range(8)
    ]
    return decoded.select("doc_id", "mime", "n_bytes", "checksum", *quantized)


@register(
    "mm_frame_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, GREATEST(LENGTH(text) // 4, 1) AS step
      FROM documents
    )
    SELECT
      t.doc_id,
      CAST(r.i AS INTEGER) AS frame_idx,
      CAST(LENGTH(substr(t.text, r.i * t.step + 1, t.step)) AS BIGINT)
        AS n_bytes,
      sha256(substr(t.text, r.i * t.step + 1, t.step)) AS frame_checksum
    FROM t CROSS JOIN (SELECT unnest(range(4)) AS i) r
    """,
    doc=(
        "U2 explode shape: one payload → 4 frame rows via mapInPandas "
        "(video keyframe-sampling plumbing; slicing stub). Hash-green "
        "since r2: the even-chunk slicing is mirrored as substr math in "
        "DuckDB over the ASCII payload text, frames compared by length "
        "+ sha256 (the binary payload itself stays available through "
        "operators/multimodal.sample_frames for the invariant tests)."
    ),
    tags=("multimodal",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payloads(table(spark, sf_dir, "documents"))
    return sample_frames(media).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.length("frame_payload").cast("long").alias("n_bytes"),
        F.col("frame_checksum"),
    )


@register(
    "mm_resize_stride",
    oracle=r"""
    SELECT
      doc_id,
      CAST(LENGTH(text) AS BIGINT) AS n_bytes_in,
      CAST(LENGTH(regexp_replace(text, '(.).', '\1', 'gs')) AS BIGINT)
        AS n_bytes_out,
      sha256(regexp_replace(text, '(.).', '\1', 'gs')) AS checksum
    FROM documents
    """,
    doc=(
        "U2 resize stage: mapInPandas payload downsample (every-2nd-"
        "byte stride stub standing in for the absent PIL resample; "
        "plumbing — Arrow batches, binary-in/binary-out schema, "
        "map-only no-shuffle plan — is real). Hash-green: the stride "
        "is mirrored in DuckDB as a global dotall regexp_replace over "
        "the ASCII payload text, and the resized bytes are compared "
        "by sha256."
    ),
    tags=("multimodal",),
)
def mm_resize_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.multimodal import resize_payloads

    media = attach_payloads(table(spark, sf_dir, "documents"))
    return resize_payloads(media).select(
        "doc_id",
        "n_bytes_in",
        F.length("payload_out").cast("long").alias("n_bytes_out"),
        F.sha2(F.col("payload_out"), 256).alias("checksum"),
    )


@register(
    "mm_audio_energy",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, LENGTH(text) // 2 AS n_samp FROM documents
    ),
    f AS (
      SELECT doc_id, text,
             CAST(unnest(range(n_samp // 128)) AS BIGINT) AS frame_idx
      FROM t
      WHERE n_samp >= 128
    )
    SELECT doc_id, frame_idx,
           CAST(list_aggregate(list_transform(range(128), j ->
             POWER(
               CASE WHEN ascii(substr(text, CAST((frame_idx * 128 + j) * 2 + 1 AS INTEGER), 1))
                    + 256 * ascii(substr(text, CAST((frame_idx * 128 + j) * 2 + 2 AS INTEGER), 1))
                    >= 32768
                    THEN ascii(substr(text, CAST((frame_idx * 128 + j) * 2 + 1 AS INTEGER), 1))
                       + 256 * ascii(substr(text, CAST((frame_idx * 128 + j) * 2 + 2 AS INTEGER), 1))
                       - 65536
                    ELSE ascii(substr(text, CAST((frame_idx * 128 + j) * 2 + 1 AS INTEGER), 1))
                       + 256 * ascii(substr(text, CAST((frame_idx * 128 + j) * 2 + 2 AS INTEGER), 1))
               END, 2)), 'sum') AS BIGINT) AS energy
    FROM f
    """,
    doc=(
        "U2/U8 audio modality: payload bytes as PCM16-LE samples → one "
        "row per complete 128-sample window with integer energy Σ s² "
        "(operators/multimodal.audio_energy, numpy-vectorized "
        "mapInPandas — the windowed feature-extraction shape behind "
        "VAD/loudness/silence-trim stages; real soundfile decode is the "
        "codec stub per the brief). Map-only: no shuffle, rows fan out "
        "per frame. All-integer energies (|s|<2^15, 128 terms < 2^37) "
        "make the Arrow decode path itself hash-green against a "
        "byte-arithmetic DuckDB oracle."
    ),
    tags=("multimodal", "audio"),
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.multimodal import audio_energy

    media = attach_payloads(table(spark, sf_dir, "documents"))
    return audio_energy(media)


@register(
    "mm_image_patches",
    oracle="""
    WITH imgs AS (
      SELECT doc_id, text FROM documents WHERE LENGTH(text) >= 256
    ),
    grid AS (
      SELECT doc_id, text,
             CAST(pr AS BIGINT) AS patch_row,
             CAST(pc AS BIGINT) AS patch_col
      FROM imgs, UNNEST(range(4)) AS a(pr), UNNEST(range(4)) AS b(pc)
    )
    SELECT doc_id, patch_row, patch_col,
           CAST(list_aggregate(list_transform(range(16), j ->
             ascii(substr(text,
               CAST((patch_row * 4 + j // 4) * 16 + patch_col * 4 + j % 4 + 1
                    AS INTEGER), 1))), 'sum') AS BIGINT) AS sum_intensity
    FROM grid
    """,
    doc=(
        "U2/U8 image modality: payload bytes as an 8-bit 16×16 "
        "grayscale image → 4×4 ViT-style patch grid, one row per patch "
        "with integer intensity sum (operators/multimodal.image_patches "
        "— numpy reshape-sum over mapInPandas Arrow batches; real "
        "PIL/cv2 decode is the codec stub per the brief). Map-only: no "
        "shuffle, rows fan out per patch; the all-integer sums make the "
        "Arrow decode path hash-green against a byte-arithmetic DuckDB "
        "oracle, same technique as mm_audio_energy."
    ),
    tags=("multimodal", "image"),
)
def mm_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.multimodal import attach_payloads, image_patches

    media = attach_payloads(table(spark, sf_dir, "documents"))
    return image_patches(media)


# ---------------------------------------------------------------------------
# Modality routing by magic bytes (mixed-media ingestion dispatch)
# ---------------------------------------------------------------------------


@register(
    "mm_modality_router",
    oracle="""
    WITH media AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN '\\xFF\\xD8\\xFF'::BLOB || encode(text)
               WHEN 1 THEN '\\x89PNG'::BLOB || encode(text)
               WHEN 2 THEN 'RIFF'::BLOB || encode(text)
               ELSE encode(text)
             END AS payload
      FROM documents
    ),
    routed AS (
      SELECT doc_id, payload,
             CASE
               WHEN substr(hex(payload), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
               WHEN substr(hex(payload), 1, 8) = '89504E47' THEN 'image/png'
               WHEN substr(hex(payload), 1, 8) = '52494646' THEN 'audio/riff'
               ELSE 'text/plain'
             END AS modality
      FROM media
    )
    SELECT modality, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS n_bytes
    FROM routed GROUP BY modality ORDER BY modality
    """,
    doc=(
        "Mixed-media ingestion dispatch: sniff each opaque payload's "
        "MAGIC BYTES (JPEG FFD8FF, PNG 89504E47, RIFF 52494646) and "
        "route to the right decoder family — the first stage of any "
        "multimodal pipeline, where trusting file extensions or "
        "upstream MIME labels silently corrupts the corpus. Payloads "
        "are built deterministically (doc_id % 4 picks the magic) so "
        "the routing distribution is provable. Pure JVM byte ops "
        "(substring on binary + hex compare) — sniffing never leaves "
        "the scan stage, no Python, no shuffle before the per-modality "
        "rollup."
    ),
    tags=("multimodal", "router", "documents"),
)
def mm_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    body = F.encode(F.col("text"), "utf-8")
    m = F.col("doc_id") % 4
    payload = (
        F.when(m == 0, F.concat(F.unhex(F.lit("FFD8FF")), body))
        .when(m == 1, F.concat(F.unhex(F.lit("89504E47")), body))
        .when(m == 2, F.concat(F.unhex(F.lit("52494646")), body))
        .otherwise(body)
    )
    media = d.select("doc_id", payload.alias("payload"))
    sig3 = F.hex(F.substring(F.col("payload"), 1, 3))
    sig4 = F.hex(F.substring(F.col("payload"), 1, 4))
    modality = (
        F.when(sig3 == "FFD8FF", "image/jpeg")
        .when(sig4 == "89504E47", "image/png")
        .when(sig4 == "52494646", "audio/riff")
        .otherwise("text/plain")
    )
    return (
        media.select(modality.alias("modality"), F.length("payload").alias("b"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("b").cast("long").alias("n_bytes"),
        )
        .orderBy("modality")
    )


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (aHash fingerprint groups)
# ---------------------------------------------------------------------------


@register(
    "mm_phash_dedup",
    oracle="""
    WITH imgs AS (
      SELECT doc_id, text FROM documents WHERE LENGTH(text) >= 256
    ),
    blocks AS (
      SELECT doc_id, CAST(b AS BIGINT) AS b,
             CAST(list_aggregate(list_transform(range(4), j ->
               ascii(substr(text,
                 CAST(((b // 8) * 2 + j // 2) * 16 + (b % 8) * 2 + j % 2 + 1
                      AS INTEGER), 1))), 'sum') AS BIGINT) AS bs
      FROM imgs, UNNEST(range(64)) AS u(b)
    ),
    tot AS (SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS total
            FROM blocks GROUP BY doc_id),
    bits AS (
      SELECT blocks.doc_id, blocks.b,
             CASE WHEN blocks.bs * 64 > tot.total THEN 1 ELSE 0 END AS bit
      FROM blocks JOIN tot ON blocks.doc_id = tot.doc_id
    ),
    hashes AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN b >= 32
                  THEN bit * (CAST(1 AS BIGINT) << CAST(b - 32 AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS hash_hi,
             CAST(SUM(CASE WHEN b < 32
                  THEN bit * (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS hash_lo
      FROM bits GROUP BY doc_id
    )
    SELECT hash_hi, hash_lo,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM hashes GROUP BY hash_hi, hash_lo
    """,
    doc=(
        "Image near-dup dedup by perceptual average-hash: 16x16 "
        "grayscale payload -> 2x2 block sums -> 8x8 downsample -> bit "
        "j set when block j beats the image mean (block*64 > total, "
        "exact integers) -> 64-bit fingerprint -> group-by hash with "
        "keep-first — the visual twin of dedup_exact, robust to "
        "brightness-preserving re-encodes that break byte-level "
        "hashing. numpy over mapInPandas Arrow batches (map-only), "
        "one 16-byte-key aggregate; the DuckDB oracle recomputes "
        "every bit with byte arithmetic, so the whole Arrow decode + "
        "hash path is hash-green. Hamming-bucketed NEAR-dup join over "
        "these fingerprints is dedup_simhash's pigeonhole, unchanged."
    ),
    tags=("multimodal", "image", "dedup"),
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.multimodal import ahash64, attach_payloads

    media = attach_payloads(table(spark, sf_dir, "documents"))
    return (
        ahash64(media)
        .groupBy("hash_hi", "hash_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
    )


HAMMING_MAX_IMG = 3  # accept pairs within 3 differing bits
_PH_CHUNKS = 4  # 4 x 16-bit chunks: Hamming<=3 pairs share >=1 chunk


@register(
    "mm_phash_near_dup",
    oracle=f"""
    WITH imgs AS (
      SELECT doc_id, text FROM documents WHERE LENGTH(text) >= 256
    ),
    blocks AS (
      SELECT doc_id, CAST(b AS BIGINT) AS b,
             CAST(list_aggregate(list_transform(range(4), j ->
               ascii(substr(text,
                 CAST(((b // 8) * 2 + j // 2) * 16 + (b % 8) * 2 + j % 2 + 1
                      AS INTEGER), 1))), 'sum') AS BIGINT) AS bs
      FROM imgs, UNNEST(range(64)) AS u(b)
    ),
    tot AS (SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS total
            FROM blocks GROUP BY doc_id),
    bits AS (
      SELECT blocks.doc_id, blocks.b,
             CASE WHEN blocks.bs * 64 > tot.total THEN 1 ELSE 0 END AS bit
      FROM blocks JOIN tot ON blocks.doc_id = tot.doc_id
    ),
    hashes AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN b >= 32
                  THEN bit * (CAST(1 AS BIGINT) << CAST(b - 32 AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS hash_hi,
             CAST(SUM(CASE WHEN b < 32
                  THEN bit * (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS hash_lo
      FROM bits GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, hash_hi, hash_lo, CAST(c AS BIGINT) AS chunk_id,
             CAST(CASE WHEN c < 2
                  THEN (hash_lo >> CAST(c * 16 AS INTEGER)) & 65535
                  ELSE (hash_hi >> CAST((c - 2) * 16 AS INTEGER)) & 65535
             END AS BIGINT) AS chunk_val
      FROM hashes, UNNEST(range({_PH_CHUNKS})) AS u(c)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.hash_hi AS ahi, a.hash_lo AS alo,
             b.hash_hi AS bhi, b.hash_lo AS blo
      FROM chunks a
      JOIN chunks b ON a.chunk_id = b.chunk_id
                   AND a.chunk_val = b.chunk_val
                   AND a.doc_id < b.doc_id
    )
    SELECT a_id, b_id,
           CAST(bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo))
                AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo))
          <= {HAMMING_MAX_IMG}
    """,
    doc=(
        "Image NEAR-duplicate pairs over the aHash fingerprints: the "
        "64-bit hash (kept as two 32-bit BIGINT halves — combining "
        "them would overflow signed int64) splits into 4 x 16-bit "
        "chunks, and by pigeonhole any pair within Hamming distance 3 "
        "must agree on at least one whole chunk — candidates come "
        "from an equi-join on (chunk_id, chunk_val), never an "
        "all-pairs scan, and the exact bit_count(xor) verify runs "
        "only on collisions. dedup_simhash's banding applied to the "
        "VISION fingerprint (mm_phash_dedup), completing image "
        "exact-dup -> near-dup. Same scale shape as MinHash-LSH: one "
        "fingerprint pass, one bounded-key candidate join, verify on "
        "candidates."
    ),
    tags=("multimodal", "image", "dedup", "similarity"),
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.multimodal import ahash64, attach_payloads

    media = attach_payloads(table(spark, sf_dir, "documents"))
    hashes = ahash64(media)
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                (
                    F.shiftright("hash_lo", c * 16)
                    if c < 2
                    else F.shiftright("hash_hi", (c - 2) * 16)
                )
                .bitwiseAND(F.lit(65535))
                .alias("chunk_val"),
            )
            for c in range(_PH_CHUNKS)
        ]
    )
    chunks = hashes.select(
        "doc_id", "hash_hi", "hash_lo", F.explode(chunk_arr).alias("cc")
    ).select("doc_id", "hash_hi", "hash_lo", "cc.chunk_id", "cc.chunk_val")
    a = chunks.select(
        F.col("doc_id").alias("a_id"),
        F.col("hash_hi").alias("ahi"),
        F.col("hash_lo").alias("alo"),
        "chunk_id",
        "chunk_val",
    )
    b = chunks.select(
        F.col("doc_id").alias("b_id"),
        F.col("hash_hi").alias("bhi"),
        F.col("hash_lo").alias("blo"),
        "chunk_id",
        "chunk_val",
    )
    cand = (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "ahi", "alo", "bhi", "blo")
        .distinct()
    )
    hamming = F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi"))) + F.bit_count(
        F.col("alo").bitwiseXOR(F.col("blo"))
    )
    return cand.select(
        "a_id", "b_id", hamming.cast("long").alias("hamming")
    ).where(F.col("hamming") <= HAMMING_MAX_IMG)


@register(
    "mm_scene_cut_detect",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, GREATEST(LENGTH(text) // 4, 1) AS step
      FROM documents
    ),
    frames AS (
      SELECT
        t.doc_id,
        CAST(r.i AS INTEGER) AS frame_idx,
        CAST(CAST(concat('0x',
               substr(sha256(substr(t.text, r.i * t.step + 1, t.step)), 1, 8))
             AS BIGINT) AS BIGINT) AS energy
      FROM t CROSS JOIN (SELECT unnest(range(4)) AS i) r
    )
    SELECT doc_id, frame_idx, energy,
           CASE WHEN lag(energy) OVER w IS NOT NULL
                 AND ABS(energy - lag(energy) OVER w) > 2147483648
                THEN 1 ELSE 0 END AS is_cut
    FROM frames
    WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    """,
    doc=(
        "U2 video scene-cut detection plumbing: frame-sample each "
        "payload (mapInPandas explode, 4 frames), derive a per-frame "
        "energy signature, and flag a cut wherever consecutive frames' "
        "energies jump past a threshold — the shot-boundary shape "
        "(energy delta thresholding) every video curation pipeline "
        "runs before keyframe dedup. The decoder being stubbed, energy "
        "is the leading 32 bits of the frame's sha256 (deterministic, "
        "mirrored bit-for-bit in DuckDB over the ASCII payload), so "
        "the keyed lag window + threshold — the real distributed part "
        "— is hash-checked end to end. Per-doc window partitions by "
        "doc_id: no global sort, embarrassingly parallel at 100 TB."
    ),
    tags=("multimodal", "window"),
)
def mm_scene_cut_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dmi_ingestor_spark.operators.multimodal import sample_frames

    media = attach_payloads(table(spark, sf_dir, "documents"))
    frames = sample_frames(media).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.conv(F.substring("frame_checksum", 1, 8), 16, 10)
        .cast("long")
        .alias("energy"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("energy").over(w)
    return frames.select(
        "doc_id",
        "frame_idx",
        "energy",
        F.when(
            prev.isNotNull() & (F.abs(F.col("energy") - prev) > 2147483648),
            1,
        )
        .otherwise(0)
        .alias("is_cut"),
    )


@register(
    "mm_audio_vad_segments",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, LENGTH(text) // 2 AS n_samp FROM documents
    ),
    f AS (
      SELECT doc_id, text,
             CAST(unnest(range(n_samp // 32)) AS BIGINT) AS frame_idx
      FROM t WHERE n_samp >= 32
    ),
    e AS (
      SELECT doc_id, frame_idx,
             CAST(list_aggregate(list_transform(range(32), j ->
               POWER(
                 CASE WHEN ascii(substr(text, CAST((frame_idx * 32 + j) * 2 + 1 AS INTEGER), 1))
                      + 256 * ascii(substr(text, CAST((frame_idx * 32 + j) * 2 + 2 AS INTEGER), 1))
                      >= 32768
                      THEN ascii(substr(text, CAST((frame_idx * 32 + j) * 2 + 1 AS INTEGER), 1))
                         + 256 * ascii(substr(text, CAST((frame_idx * 32 + j) * 2 + 2 AS INTEGER), 1))
                         - 65536
                      ELSE ascii(substr(text, CAST((frame_idx * 32 + j) * 2 + 1 AS INTEGER), 1))
                         + 256 * ascii(substr(text, CAST((frame_idx * 32 + j) * 2 + 2 AS INTEGER), 1))
                 END, 2)), 'sum') AS BIGINT) AS energy
      FROM f
    ),
    st AS (
      SELECT doc_id, frame_idx, energy,
             CASE WHEN energy >= 20800000000 THEN 1 ELSE 0 END AS speech
      FROM e
    ),
    bd AS (
      SELECT doc_id, frame_idx, energy, speech,
             CASE WHEN speech <> COALESCE(lag(speech) OVER
                    (PARTITION BY doc_id ORDER BY frame_idx), -1)
                  THEN 1 ELSE 0 END AS boundary
      FROM st
    ),
    seg AS (
      SELECT doc_id, frame_idx, energy, speech,
             SUM(boundary) OVER (PARTITION BY doc_id ORDER BY frame_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
      FROM bd
    )
    SELECT doc_id, CAST(seg_id AS BIGINT) AS seg_id,
           CAST(MAX(speech) AS BIGINT) AS is_speech,
           CAST(MIN(frame_idx) AS BIGINT) AS start_frame,
           CAST(MAX(frame_idx) AS BIGINT) AS end_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(energy) AS BIGINT) AS seg_energy
    FROM seg
    GROUP BY doc_id, seg_id
    """,
    doc=(
        "U2/U8 voice-activity segmentation: 32-sample energy frames "
        "(operators/multimodal.audio_energy, Arrow-batched map-only), "
        "speech/silence state by energy threshold, then gaps-and-"
        "islands — a per-doc lag window marks state changes, the "
        "running sum numbers segments, one aggregate emits (segment, "
        "state, frame span, energy). The silence-trim/VAD stage every "
        "audio curation pipeline runs before ASR; windows partition by "
        "doc_id (embarrassingly parallel, no global sort) and the "
        "byte-arithmetic oracle hash-checks the whole composition "
        "including the Arrow decode."
    ),
    tags=("multimodal", "audio", "window"),
)
def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dmi_ingestor_spark.operators.multimodal import audio_energy

    media = attach_payloads(table(spark, sf_dir, "documents"))
    e = audio_energy(media, frame=32).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "energy",
        (F.col("energy") >= 20800000000).cast("int").alias("speech"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    boundary = F.when(
        F.col("speech") != F.coalesce(F.lag("speech").over(w), F.lit(-1)), 1
    ).otherwise(0)
    seg = e.withColumn("seg_id", F.sum(boundary).over(w2))
    return seg.groupBy("doc_id", F.col("seg_id").cast("long").alias("seg_id")).agg(
        F.max("speech").cast("long").alias("is_speech"),
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum("energy").cast("long").alias("seg_energy"),
    )


@register(
    "mm_cross_modal_alignment",
    oracle="""
    WITH txt AS (
      SELECT doc_id,
             list_transform(e.embedding,
                            x -> round(CAST(x AS DOUBLE) * 1000)) AS tv
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    img AS (
      SELECT xor(vec_id, 1) AS doc_id,
             list_transform(embedding,
                            x -> round(CAST(x AS DOUBLE) * 1000)) AS iv
      FROM embeddings
    ),
    scored AS (
      SELECT t.doc_id,
             CASE WHEN sqrt(list_dot_product(t.tv,t.tv))
                       * sqrt(list_dot_product(i.iv,i.iv)) > 0
                  THEN list_dot_product(t.tv,i.iv)
                       / (sqrt(list_dot_product(t.tv,t.tv))
                          * sqrt(list_dot_product(i.iv,i.iv)))
                  ELSE 0.0 END AS align
      FROM txt t JOIN img i ON i.doc_id = t.doc_id
    )
    SELECT doc_id,
           CAST(round(align * 1000000) AS BIGINT) AS align_micro,
           CASE WHEN align >= 0.2 THEN 1 ELSE 0 END AS keep
    FROM scored
    """,
    doc=(
        "LAION/DataComp-style cross-modal alignment filtering: each "
        "document's TEXT embedding is scored against its paired IMAGE "
        "embedding (the XOR-1 neighbor vector stands in for the second "
        "modality — the CLIP encoders being the stubbed codec) by "
        "quantized-integer cosine, and rows below the alignment "
        "threshold are dropped — the curation gate multimodal corpora "
        "apply before training. One equi-join on the pair id plus "
        "map-side vector math; no shuffle beyond the join. The "
        "1e3-quantized cosine makes the score hash-exact."
    ),
    tags=("multimodal", "similarity", "training-pipeline"),
)
def mm_cross_modal_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.functions.vector import cosine, quantize

    d = table(spark, sf_dir, "documents").select("doc_id")
    e = table(spark, sf_dir, "embeddings")
    txt = d.join(e, d["doc_id"] == e["vec_id"]).select(
        "doc_id", quantize(F.col("embedding")).alias("tv")
    )
    img = e.select(
        F.col("vec_id").bitwiseXOR(F.lit(1)).alias("doc_id"),
        quantize(F.col("embedding")).alias("iv"),
    )
    scored = txt.join(img, "doc_id").withColumn(
        "align", cosine(F.col("tv"), F.col("iv"))
    )
    return scored.select(
        "doc_id",
        F.round(F.col("align") * 1000000).cast("long").alias("align_micro"),
        F.when(F.col("align") >= 0.2, 1).otherwise(0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Byte-diversity (Gini–Simpson) screening of binary payloads
# ---------------------------------------------------------------------------

_DIV_S = 10**12


@register(
    "mm_byte_diversity",
    oracle=f"""
    WITH payload AS (
      SELECT doc_id, substr(text, 1, 256) AS p FROM documents
    ),
    bytes AS (
      SELECT doc_id, ascii(b) AS byte_val
      FROM payload, unnest(string_split(p, '')) AS t(b)
    ),
    hist AS (
      SELECT doc_id, byte_val, COUNT(*) AS c
      FROM bytes GROUP BY doc_id, byte_val
    ),
    stats AS (
      SELECT doc_id,
             SUM(c) AS n_bytes,
             COUNT(*) AS n_distinct,
             SUM(c * c) AS sum_sq
      FROM hist GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(n_distinct AS BIGINT) AS n_distinct_bytes,
           CAST({_DIV_S} - (sum_sq * {_DIV_S}) // (n_bytes * n_bytes)
                AS BIGINT) AS simpson_scaled
    FROM stats
    ORDER BY doc_id
    """,
    doc=(
        "Byte-diversity screening of binary payloads: the Gini-"
        "Simpson index (1 - sum p_b^2) over each payload's byte "
        "histogram, ALL-INTEGER via sum-of-squared-counts — the cheap "
        "first-pass detector for degenerate blobs (constant filler -> "
        "~0) vs compressed/encrypted payloads (-> near max) that a "
        "multimodal ingest runs before spending decode cycles. "
        "Follows the family's byte-arithmetic oracle convention "
        "(payload proxy = leading bytes, ascii() per byte on both "
        "engines), so the histogram math itself is hash-checked. One "
        "explode + two keyed aggregates, partial-combinable."
    ),
    tags=("multimodal", "quality", "documents"),
)
def mm_byte_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.substring("text", 1, 256).alias("p"))
    bytes_df = payload.select(
        "doc_id",
        F.explode(F.split(F.col("p"), "")).alias("b"),
    ).filter(F.length("b") > 0).select("doc_id", F.ascii("b").alias("byte_val"))
    hist = bytes_df.groupBy("doc_id", "byte_val").agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = hist.groupBy("doc_id").agg(
        F.sum("c").alias("n_bytes"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    return stats.select(
        "doc_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("n_distinct").cast("long").alias("n_distinct_bytes"),
        F.expr(f"{_DIV_S} - (sum_sq * {_DIV_S}) div (n_bytes * n_bytes)")
        .cast("long")
        .alias("simpson_scaled"),
    ).orderBy("doc_id")


@register(
    "mm_video_keyframe_select",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, GREATEST(LENGTH(text) // 4, 1) AS step
      FROM documents
    ),
    frames AS (
      SELECT
        t.doc_id,
        CAST(r.i AS INTEGER) AS frame_idx,
        CAST(CAST(concat('0x',
               substr(sha256(substr(t.text, r.i * t.step + 1, t.step)), 1, 8))
             AS BIGINT) AS BIGINT) AS energy
      FROM t CROSS JOIN (SELECT unnest(range(4)) AS i) r
    ),
    cuts AS (
      SELECT doc_id, frame_idx, energy,
             CASE WHEN lag(energy) OVER w IS NOT NULL
                   AND ABS(energy - lag(energy) OVER w) > 2147483648
                  THEN 1 ELSE 0 END AS is_cut
      FROM frames
      WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    ),
    shots AS (
      SELECT doc_id, frame_idx, energy,
             SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx)
               AS shot_id
      FROM cuts
    ),
    ranked AS (
      SELECT doc_id, shot_id, frame_idx, energy,
             ROW_NUMBER() OVER (PARTITION BY doc_id, shot_id
                                ORDER BY energy DESC, frame_idx) AS rk,
             COUNT(*) OVER (PARTITION BY doc_id, shot_id) AS n_frames
      FROM shots
    )
    SELECT doc_id, CAST(shot_id AS BIGINT) AS shot_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(frame_idx AS BIGINT) AS keyframe_idx,
           energy AS keyframe_energy
    FROM ranked WHERE rk = 1
    ORDER BY doc_id, shot_id
    """,
    doc=(
        "U2 keyframe selection — the stage after shot-boundary "
        "detection in every video curation pipeline (one "
        "representative frame per shot feeds the dedup/caption/embed "
        "stages, so data volume drops from frames to shots): frames "
        "are grouped into shots by the running sum of scene-cut "
        "flags, then each shot elects its argmax-energy frame with a "
        "deterministic (energy desc, frame_idx) tie-break. Shares "
        "mm_scene_cut_detect's frame sampling and sha256 energy "
        "stub, so the distributed part — three stacked per-doc "
        "windows (lag -> running sum -> per-shot rank), all "
        "PARTITION BY doc_id, zero global sorts — is hash-checked "
        "end to end. At 100 TB each doc's frames stay on one "
        "partition; the pipeline is embarrassingly parallel."
    ),
    tags=("multimodal", "window"),
)
def mm_video_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dmi_ingestor_spark.operators.multimodal import sample_frames

    media = attach_payloads(table(spark, sf_dir, "documents"))
    frames = sample_frames(media).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.conv(F.substring("frame_checksum", 1, 8), 16, 10)
        .cast("long")
        .alias("energy"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("energy").over(w)
    cuts = frames.select(
        "doc_id",
        "frame_idx",
        "energy",
        F.when(
            prev.isNotNull() & (F.abs(F.col("energy") - prev) > 2147483648),
            1,
        )
        .otherwise(0)
        .alias("is_cut"),
    )
    wsum = Window.partitionBy("doc_id").orderBy("frame_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    shots = cuts.select(
        "doc_id",
        "frame_idx",
        "energy",
        F.sum("is_cut").over(wsum).alias("shot_id"),
    )
    wrk = Window.partitionBy("doc_id", "shot_id").orderBy(
        F.col("energy").desc(), "frame_idx"
    )
    wn = Window.partitionBy("doc_id", "shot_id")
    ranked = shots.select(
        "doc_id",
        F.col("shot_id").cast("long").alias("shot_id"),
        "frame_idx",
        "energy",
        F.row_number().over(wrk).alias("rk"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n_frames"),
    )
    return (
        ranked.filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "shot_id",
            "n_frames",
            F.col("frame_idx").cast("long").alias("keyframe_idx"),
            F.col("energy").alias("keyframe_energy"),
        )
        .orderBy("doc_id", "shot_id")
    )


# --------------------------------------------------------------------------
# Bounding-box IoU suppression (layout/detection postprocessing)
# --------------------------------------------------------------------------

_NMS_BOXES = 6
_NMS_IOU_NUM, _NMS_IOU_DEN = 3, 10  # threshold 0.3


@register(
    "mm_bbox_iou_suppress",
    oracle=f"""
    WITH boxes AS (
      SELECT d.doc_id, r.i AS box_idx,
             CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '-'
                                     || CAST(r.i AS VARCHAR)), 1, 12)
                  AS BIGINT) AS h
      FROM documents d
      CROSS JOIN (SELECT unnest(range({_NMS_BOXES})) AS i) r
    ),
    geo AS (
      SELECT doc_id, box_idx,
             h % 100 AS x, (h // 100) % 100 AS y,
             10 + (h // 10000) % 20 AS w,
             10 + (h // 1000000) % 20 AS hh,
             h % 1000 AS score
      FROM boxes
    ),
    pairs AS (
      SELECT a.doc_id, a.box_idx,
             MAX(CASE WHEN
                 (b.score > a.score
                  OR (b.score = a.score AND b.box_idx < a.box_idx))
                 AND GREATEST(LEAST(a.x + a.w, b.x + b.w)
                              - GREATEST(a.x, b.x), 0)
                   * GREATEST(LEAST(a.y + a.hh, b.y + b.hh)
                              - GREATEST(a.y, b.y), 0)
                   * {_NMS_IOU_DEN}
                   >= {_NMS_IOU_NUM} *
                      (a.w * a.hh + b.w * b.hh
                       - GREATEST(LEAST(a.x + a.w, b.x + b.w)
                                  - GREATEST(a.x, b.x), 0)
                         * GREATEST(LEAST(a.y + a.hh, b.y + b.hh)
                                    - GREATEST(a.y, b.y), 0))
                 THEN 1 ELSE 0 END) AS suppressed
      FROM geo a JOIN geo b
        ON b.doc_id = a.doc_id AND b.box_idx <> a.box_idx
      GROUP BY a.doc_id, a.box_idx
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_boxes,
           CAST(SUM(1 - COALESCE(p.suppressed, 0)) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN COALESCE(p.suppressed, 0) = 0
                    THEN g.score ELSE 0 END) AS BIGINT) AS kept_score_sum,
           CAST(SUM(CASE WHEN COALESCE(p.suppressed, 0) = 0
                    THEN g.w * g.hh ELSE 0 END) AS BIGINT) AS kept_area_sum
    FROM geo g
    LEFT JOIN pairs p ON p.doc_id = g.doc_id AND p.box_idx = g.box_idx
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
    doc=(
        "Bounding-box suppression — the postprocessing every layout/"
        "object-detection stage runs before boxes feed OCR or "
        "crop-and-embed: a box is suppressed when a strictly "
        "higher-priority box (score, then index — deterministic) "
        "overlaps it at IoU >= 0.3. IoU is EXACT integer geometry "
        "(intersection/union cross-multiplied against the rational "
        "threshold — no float area math), and this is the one-pass "
        "suppress-against-all-higher variant, which relational "
        "engines express as a single keyed self-join + MAX — unlike "
        "sequential greedy NMS, which is order-dependent and needs "
        "a per-group fold. Boxes are synthesized per doc from md5 "
        "(decoder stubbed, same policy as the frame/audio family); "
        "the per-doc pairwise join is bounded by boxes-per-doc², "
        "embarrassingly parallel across docs at 100 TB."
    ),
    tags=("multimodal", "spatial"),
)
def mm_bbox_iou_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id")
    idx = F.explode(F.array(*[F.lit(i) for i in range(_NMS_BOXES)])).alias(
        "box_idx"
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("-"),
                    F.col("box_idx").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    geo = (
        d.select("doc_id", idx)
        .withColumn("h", h)
        .select(
            "doc_id",
            "box_idx",
            (F.col("h") % 100).alias("x"),
            ((F.col("h") / 100).cast("long") % 100).alias("y"),
            (10 + (F.col("h") / 10000).cast("long") % 20).alias("w"),
            (10 + (F.col("h") / 1000000).cast("long") % 20).alias("hh"),
            (F.col("h") % 1000).alias("score"),
        )
        .cache()
    )
    a = geo
    b = geo.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("box_idx").alias("box_idx_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("w").alias("wb"),
        F.col("hh").alias("hhb"),
        F.col("score").alias("score_b"),
    )
    ix = F.greatest(
        F.least(F.col("x") + F.col("w"), F.col("xb") + F.col("wb"))
        - F.greatest(F.col("x"), F.col("xb")),
        F.lit(0),
    )
    iy = F.greatest(
        F.least(F.col("y") + F.col("hh"), F.col("yb") + F.col("hhb"))
        - F.greatest(F.col("y"), F.col("yb")),
        F.lit(0),
    )
    inter = ix * iy
    union = F.col("w") * F.col("hh") + F.col("wb") * F.col("hhb") - inter
    higher = (F.col("score_b") > F.col("score")) | (
        (F.col("score_b") == F.col("score"))
        & (F.col("box_idx_b") < F.col("box_idx"))
    )
    sup = (higher & (inter * _NMS_IOU_DEN >= _NMS_IOU_NUM * union)).cast("int")
    pairs = (
        a.join(
            b,
            (F.col("doc_id_b") == F.col("doc_id"))
            & (F.col("box_idx_b") != F.col("box_idx")),
        )
        .groupBy("doc_id", "box_idx")
        .agg(F.max(sup).alias("suppressed"))
    )
    return (
        geo.join(pairs, ["doc_id", "box_idx"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_boxes"),
            F.sum(1 - F.coalesce("suppressed", F.lit(0)))
            .cast("long")
            .alias("n_kept"),
            F.sum(
                F.when(F.coalesce("suppressed", F.lit(0)) == 0, F.col("score"))
                .otherwise(0)
            )
            .cast("long")
            .alias("kept_score_sum"),
            F.sum(
                F.when(
                    F.coalesce("suppressed", F.lit(0)) == 0,
                    F.col("w") * F.col("hh"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("kept_area_sum"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Landmark audio fingerprinting (peak pairs + offset voting)
# ---------------------------------------------------------------------------

_FP_MAX_DT = 16

_FP_ENERGY_SQL = """
    t AS (
      SELECT doc_id, text, LENGTH(text) // 2 AS n_samp FROM documents
    ),
    f AS (
      SELECT doc_id, text,
             CAST(unnest(range(n_samp // 16)) AS BIGINT) AS frame_idx
      FROM t
      WHERE n_samp >= 16
    ),
    energy AS (
      SELECT doc_id, frame_idx,
             CAST(list_aggregate(list_transform(range(16), j ->
               POWER(
                 CASE WHEN ascii(substr(text, CAST((frame_idx * 16 + j) * 2 + 1 AS INTEGER), 1))
                      + 256 * ascii(substr(text, CAST((frame_idx * 16 + j) * 2 + 2 AS INTEGER), 1))
                      >= 32768
                      THEN ascii(substr(text, CAST((frame_idx * 16 + j) * 2 + 1 AS INTEGER), 1))
                         + 256 * ascii(substr(text, CAST((frame_idx * 16 + j) * 2 + 2 AS INTEGER), 1))
                         - 65536
                      ELSE ascii(substr(text, CAST((frame_idx * 16 + j) * 2 + 1 AS INTEGER), 1))
                         + 256 * ascii(substr(text, CAST((frame_idx * 16 + j) * 2 + 2 AS INTEGER), 1))
                 END, 2)), 'sum') AS BIGINT) AS energy
      FROM f
    )
"""


@register(
    "mm_audio_fingerprint_match",
    oracle=f"""
    WITH {_FP_ENERGY_SQL},
    nb AS (
      SELECT doc_id, frame_idx, energy,
             LAG(energy) OVER w AS pe, LEAD(energy) OVER w AS ne
      FROM energy
      WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    ),
    peaks AS (
      SELECT doc_id, frame_idx, energy
      FROM nb
      WHERE pe IS NOT NULL AND ne IS NOT NULL
        AND energy > pe AND energy >= ne
    ),
    pairs AS (
      SELECT doc_id, frame_idx AS t1,
             LEAD(frame_idx) OVER w - frame_idx AS dt,
             energy AS e1, LEAD(energy) OVER w AS e2
      FROM peaks
      WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    ),
    idx AS (
      SELECT doc_id, t1,
             dt * 4096 + ((e1 * 4) // (e1 + e2)) * 1024 + e1 % 1024 AS hash
      FROM pairs
      WHERE dt IS NOT NULL AND dt BETWEEN 1 AND {_FP_MAX_DT}
    ),
    q AS (
      SELECT doc_id AS qdoc, hash, t1 - 1 AS qt
      FROM idx WHERE doc_id % 10 = 0 AND t1 >= 1
    ),
    votes AS (
      SELECT q.qdoc, i.doc_id AS cand, i.t1 - q.qt AS t_offset,
             CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM q JOIN idx i USING (hash)
      GROUP BY q.qdoc, cand, t_offset
    ),
    best AS (
      SELECT qdoc, cand, t_offset, n_votes,
             ROW_NUMBER() OVER (
               PARTITION BY qdoc
               ORDER BY n_votes DESC, cand, t_offset
             ) AS rk
      FROM votes
    )
    SELECT qdoc, cand AS matched_doc, t_offset, n_votes
    FROM best WHERE rk = 1
    ORDER BY qdoc
    """,
    doc=(
        "Landmark audio fingerprinting (the Shazam/Wang-2003 scheme, "
        "1-D variant): frame energies -> strict local peaks (ties "
        "broken by the >/>= asymmetry so both engines pick identical "
        "peaks) -> consecutive-peak LANDMARK PAIRS hashed by "
        "(dt, quantized energy ratio, anchor-energy mod 1024 — the hash "
        "entropy that keeps vote collisions rare) -> an inverted hash index. "
        "Queries are one-frame-delayed snippets of every 10th doc; "
        "matching is ONE equi-join on the hash plus an offset-"
        "histogram vote, and the argmax (votes, cand, offset) row "
        "names the recovered source and alignment — self-matches "
        "must recover offset=+1 (test-asserted). THE retrieval shape "
        "that makes audio search scale: no signal comparison at query "
        "time, just a hash join against a pre-built index — at 100 TB "
        "the index is hash-partitioned and each query snippet touches "
        "only its hash buckets."
    ),
    tags=("multimodal", "audio", "retrieval"),
)
def mm_audio_fingerprint_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dmi_ingestor_spark.operators.multimodal import audio_energy

    media = attach_payloads(table(spark, sf_dir, "documents"))
    energy = audio_energy(media, frame=16)

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    nb = energy.select(
        "doc_id",
        "frame_idx",
        "energy",
        F.lag("energy").over(w).alias("pe"),
        F.lead("energy").over(w).alias("ne"),
    )
    peaks = nb.filter(
        F.col("pe").isNotNull()
        & F.col("ne").isNotNull()
        & (F.col("energy") > F.col("pe"))
        & (F.col("energy") >= F.col("ne"))
    ).select("doc_id", "frame_idx", "energy")
    pairs = peaks.select(
        "doc_id",
        F.col("frame_idx").alias("t1"),
        (F.lead("frame_idx").over(w) - F.col("frame_idx")).alias("dt"),
        F.col("energy").alias("e1"),
        F.lead("energy").over(w).alias("e2"),
    )
    idx = pairs.filter(
        F.col("dt").isNotNull() & F.col("dt").between(1, _FP_MAX_DT)
    ).select(
        "doc_id",
        "t1",
        F.expr("dt * 4096 + ((e1 * 4) div (e1 + e2)) * 1024 + e1 % 1024").alias("hash"),
    )
    q = idx.filter((F.col("doc_id") % 10 == 0) & (F.col("t1") >= 1)).select(
        F.col("doc_id").alias("qdoc"),
        "hash",
        (F.col("t1") - 1).alias("qt"),
    )
    votes = (
        q.join(idx, "hash")
        .groupBy("qdoc", F.col("doc_id").alias("cand"),
                 (F.col("t1") - F.col("qt")).alias("t_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
    )
    wbest = Window.partitionBy("qdoc").orderBy(
        F.desc("n_votes"), F.asc("cand"), F.asc("t_offset")
    )
    return (
        votes.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("qdoc", F.col("cand").alias("matched_doc"), "t_offset",
                "n_votes")
        .orderBy("qdoc")
    )


# ---------------------------------------------------------------------------
# Multipart / chunked-transfer reassembly (S3 multipart, MQTT chunking)
# ---------------------------------------------------------------------------

_CHUNKS = 4


@register(
    "mm_multipart_reassembly",
    oracle=f"""
    WITH parts AS (
      SELECT doc_id,
             i AS part_no,
             substr(text,
                    1 + (i - 1) * ((length(text) + {_CHUNKS} - 1) // {_CHUNKS}),
                    ((length(text) + {_CHUNKS} - 1) // {_CHUNKS})) AS chunk
      FROM documents, (SELECT unnest(generate_series(1, {_CHUNKS})) AS i)
      WHERE doc_id < 200
    ),
    reassembled AS (
      SELECT doc_id,
             string_agg(chunk, '' ORDER BY part_no) AS body,
             COUNT(*) AS n_parts
      FROM parts GROUP BY doc_id
    )
    SELECT r.doc_id,
           CAST(r.n_parts AS BIGINT) AS n_parts,
           CAST(length(r.body) AS BIGINT) AS n_chars,
           md5(r.body) AS digest,
           CAST(CASE WHEN r.body = d.text THEN 1 ELSE 0 END AS BIGINT)
             AS intact
    FROM reassembled r JOIN documents d ON d.doc_id = r.doc_id
    ORDER BY r.doc_id
    """,
    doc=(
        "Multipart payload reassembly — the S3-multipart / chunked-"
        "message ingest step: each document arrives as 4 out-of-order "
        "parts (part_no, bytes), and reassembly is "
        "groupBy(doc).sort-within-group + concat, with an md5 digest "
        "and an intact flag proving byte-level reconstruction against "
        "the original (the oracle reassembles independently with "
        "string_agg ORDER BY and compares to the source). The Spark "
        "side deliberately SCRAMBLES part order (repartition by a "
        "part-derived key) before reassembling via "
        "array_sort(collect_list(struct(part_no, chunk))) — order "
        "restoration is the thing under test. At scale parts shuffle "
        "once on doc_id and each group is one document's parts — "
        "bounded memory, the exact shape of multipart uploads landing "
        "out of order from a fleet of producers."
    ),
    tags=("multimodal", "ingest", "documents"),
)
def mm_multipart_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    csize = F.expr(f"CAST((length(text) + {_CHUNKS - 1}) div {_CHUNKS} AS INT)")
    parts = (
        docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(_CHUNKS))).alias("part_no"),
            csize.alias("csize"),
            "text",
        )
        .select(
            "doc_id",
            "part_no",
            F.expr(
                "substring(text, 1 + (part_no - 1) * csize, csize)"
            ).alias("chunk"),
        )
        # scramble: parts land wherever their producer shard put them
        .repartition(8, (F.col("doc_id") * 7 + F.col("part_no")) % 8)
    )
    reassembled = parts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("part_no", "chunk"))),
                lambda x: x["chunk"],
            ),
            "",
        ).alias("body"),
    )
    orig = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("orig")
    )
    return (
        reassembled.join(orig, "doc_id")
        .select(
            "doc_id",
            "n_parts",
            F.length("body").cast("long").alias("n_chars"),
            F.md5(F.col("body").cast("binary")).alias("digest"),
            (F.col("body") == F.col("orig")).cast("long").alias("intact"),
        )
        .orderBy("doc_id")
    )
