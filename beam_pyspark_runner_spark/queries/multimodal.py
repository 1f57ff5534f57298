"""Multimodal (binary) column operators.

North-star surface (SURVEY.md §2.4): treat image/audio/video as opaque
``binary`` columns with typed metadata. The container has no image/audio
codecs, so the *decode* kernel is a deterministic fake (documented
below) — but the Spark-side plumbing is real and is what the operator
contributes: Arrow-batched ``mapInPandas`` over a binary column with an
explicit output schema, the exact shape a PIL/ffmpeg kernel would use.

Scale notes (100 TB): mapInPandas streams Arrow batches through one
Python worker per core — no per-row pickling, no driver involvement;
binary payloads never expand in JVM memory (Tungsten keeps them
off-heap). Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beam_pyspark_runner_spark.queries.registry import register
from beam_pyspark_runner_spark.sources.readers import load_table

try:  # real decoder path — not available in this container, by design
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def _payload_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded to a BinaryType payload column — the stand-in
    for an image/audio blob column a real corpus would carry."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


_STATS_SCHEMA = "doc_id bigint, payload_bytes bigint, sha256 string"


def _payload_stats_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched kernel: length + checksum per binary payload."""
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": payload.map(len).astype("int64"),
                "sha256": payload.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
            }
        )


@register(
    "binary_payload_stats",
    # sha256(VARCHAR) hashes the UTF-8 bytes — identical to the kernel's
    # sha256 over the encoded payload.
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
    tags=("multimodal", "binary", "map_in_pandas"),
)
def binary_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction through the Python kernel path.
    The oracle recomputes length/sha256 natively in DuckDB, verifying the
    full Arrow round-trip byte-for-byte."""
    return _payload_df(spark, sf_dir).mapInPandas(_payload_stats_kernel, _STATS_SCHEMA)


_DECODE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_channels bigint, mean_byte double"
)


def _fake_decode_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic FAKE image decode.

    A real kernel would do ``Image.open(io.BytesIO(b))`` and return true
    dimensions + pixel stats; this container has no codecs, so dimensions
    are derived arithmetically from payload length (width = 16 + len%64,
    height = 16 + len%48, channels = 3) and ``mean_byte`` is the true
    byte-mean of the payload — still a real reduction over the binary
    data, computed in Python exactly as a pixel-mean would be.
    """
    if HAS_PIL:
        raise NotImplementedError(
            "real decode path intentionally unimplemented in this build; "
            "swap _fake_decode_kernel for a PIL kernel with this same signature"
        )
    for pdf in batches:
        payload = pdf["payload"]
        n = payload.map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": 16 + n % 64,
                "height": 16 + n % 48,
                "n_channels": pd.Series([3] * len(pdf), index=pdf.index, dtype="int64"),
                "mean_byte": payload.map(lambda b: sum(b) / len(b) if len(b) else 0.0),
            }
        )


@register(
    "image_decode_stub",
    # The corpus text is pure ASCII (verified: octet_length(encode(text))
    # == length(text) for every row), so the byte-mean equals the
    # mean of per-char code points.
    oracle="""
    WITH ch AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
               unnest(range(1, length(text) + 1)) AS i, text
        FROM documents
    )
    SELECT doc_id,
           16 + ANY_VALUE(nb) % 64 AS width,
           16 + ANY_VALUE(nb) % 48 AS height,
           CAST(3 AS BIGINT) AS n_channels,
           CAST(SUM(ascii(substr(text, CAST(i AS INT), 1))) AS DOUBLE)
               / CAST(ANY_VALUE(nb) AS DOUBLE) AS mean_byte
    FROM ch GROUP BY doc_id
    """,
    tags=("multimodal", "binary", "decode_stub", "map_in_pandas"),
)
def image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake image decode over binary payloads (see kernel docstring)."""
    return _payload_df(spark, sf_dir).mapInPandas(_fake_decode_kernel, _DECODE_SCHEMA)


FRAME_BYTES = 256
FRAME_STRIDE = 4  # sample every 4th frame

_FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_bytes bigint, first_byte bigint"


def _frame_sample_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic FAKE video frame sampler.

    A real kernel would demux the container (ffmpeg) and decode every
    STRIDE-th frame; here a "frame" is a FRAME_BYTES-sized slice of the
    payload. The 1→N row expansion (one binary in, many frame rows out)
    is the real contract a frame sampler needs from mapInPandas.
    """
    for pdf in batches:
        out_doc, out_idx, out_len, out_first = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
            for idx in range(0, n_frames, FRAME_STRIDE):
                chunk = b[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_len.append(len(chunk))
                out_first.append(chunk[0])
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int64"),
                "frame_bytes": pd.Series(out_len, dtype="int64"),
                "first_byte": pd.Series(out_first, dtype="int64"),
            }
        )


@register(
    "video_frame_sample_stub",
    # ASCII corpus ⇒ byte i == ascii(char i+1); frames are substring slices.
    oracle=f"""
    WITH f AS (
        SELECT doc_id, octet_length(encode(text)) AS nb, text,
               unnest(range(0, CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT), {FRAME_STRIDE})) AS frame_idx
        FROM documents
    )
    SELECT doc_id, frame_idx,
           LEAST(CAST({FRAME_BYTES} AS BIGINT), nb - frame_idx * {FRAME_BYTES}) AS frame_bytes,
           CAST(ascii(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS INT), 1)) AS BIGINT) AS first_byte
    FROM f
    """,
    tags=("multimodal", "binary", "frame_sample", "map_in_pandas"),
)
def video_frame_sample_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: 1 blob → N sampled frame rows
    through mapInPandas (row-expanding kernel). At 100 TB the expansion
    happens executor-side in Arrow batches; downstream operators see
    ordinary rows and the blob column is never shuffled."""
    return _payload_df(spark, sf_dir).mapInPandas(_frame_sample_kernel, _FRAME_SCHEMA)


AUDIO_WINDOW = 128  # bytes per analysis window (stand-in for PCM frames)

_AUDIO_SCHEMA = (
    "doc_id bigint, n_samples bigint, n_windows bigint, peak bigint, mean_square double"
)


def _audio_feature_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic FAKE audio feature extraction.

    A real kernel would decode PCM (soundfile/librosa) and emit per-clip
    energy features; here the payload bytes stand in for 8-bit samples.
    ``mean_square`` (mean of sample², the square of RMS) accumulates in
    exact int64 before ONE float division, so the result is independent
    of numpy reduction order and bit-matches the oracle. sqrt is left to
    the consumer — applying it here would introduce a libm ulp gap.
    """
    import numpy as np

    for pdf in batches:
        payload = pdf["payload"]
        samples = payload.map(lambda b: np.frombuffer(bytes(b), dtype=np.uint8))
        n = samples.map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_samples": n,
                "n_windows": (n + AUDIO_WINDOW - 1) // AUDIO_WINDOW,
                "peak": samples.map(lambda s: int(s.max()) if len(s) else 0),
                "mean_square": samples.map(
                    lambda s: float(int((s.astype(np.int64) ** 2).sum())) / len(s)
                    if len(s)
                    else 0.0
                ),
            }
        )


@register(
    "audio_feature_stub",
    # ASCII corpus ⇒ sample i == ascii(char i+1); int sums are exact in
    # both engines, and the single int→double division is correctly
    # rounded on both sides.
    oracle=f"""
    WITH ch AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
               unnest(range(1, length(text) + 1)) AS i, text
        FROM documents
    )
    SELECT doc_id,
           CAST(ANY_VALUE(nb) AS BIGINT) AS n_samples,
           CAST((ANY_VALUE(nb) + {AUDIO_WINDOW} - 1) // {AUDIO_WINDOW} AS BIGINT)
               AS n_windows,
           CAST(MAX(ascii(substr(text, CAST(i AS INT), 1))) AS BIGINT) AS peak,
           CAST(CAST(SUM(ascii(substr(text, CAST(i AS INT), 1))
                         * ascii(substr(text, CAST(i AS INT), 1))) AS BIGINT) AS DOUBLE)
               / CAST(ANY_VALUE(nb) AS DOUBLE) AS mean_square
    FROM ch GROUP BY doc_id
    """,
    tags=("multimodal", "binary", "audio", "decode_stub", "map_in_pandas"),
)
def audio_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake audio feature extraction over binary payloads: per-clip sample
    count, window count, peak, and mean-square energy through the same
    Arrow-batched mapInPandas contract a real PCM decoder would use.
    Completes the image/video/audio stub triad — swap the kernel for a
    soundfile/librosa one with the identical signature."""
    return _payload_df(spark, sf_dir).mapInPandas(_audio_feature_kernel, _AUDIO_SCHEMA)


_ARROW_STATS_SCHEMA = "doc_id bigint, payload_bytes bigint, head_sum bigint"


def _arrow_stats_kernel(batches):
    """Arrow-NATIVE kernel (mapInArrow): operates on pyarrow RecordBatch
    directly — no pandas conversion at all, so the per-batch overhead is
    one zero-copy view instead of Series construction. The cheapest
    Python kernel path Spark offers; use it when the kernel is
    vectorizable with pyarrow.compute but must still live in Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        payload = batch.column("payload")
        lengths = pc.binary_length(payload)
        # head_sum: sum of the first byte of each payload — a cheap
        # deterministic reduction proving byte-level access.
        first = pc.binary_slice(payload, 0, 1)
        head = pc.cast(
            pc.if_else(
                pc.equal(lengths, 0), pa.scalar(b"\x00"), first
            ),
            pa.binary(),
        )
        head_vals = pa.array(
            [b[0] if len(b) else 0 for b in head.to_pylist()], type=pa.int64()
        )
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(lengths, pa.int64()),
                head_vals,
            ],
            names=["doc_id", "payload_bytes", "head_sum"],
        )


@register(
    "arrow_map_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_sum
    FROM documents
    """,
    tags=("multimodal", "binary", "map_in_arrow", "arrow"),
)
def arrow_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow over the binary payload column: the zero-pandas Python
    kernel path (RecordBatch in, RecordBatch out). Complements the
    mapInPandas kernels — same partitioning/batching contract, lower
    per-batch overhead; the scale guidance is mapInArrow for
    pyarrow.compute-expressible kernels, mapInPandas when the kernel
    needs pandas/numpy semantics."""
    return _payload_df(spark, sf_dir).mapInArrow(
        _arrow_stats_kernel, _ARROW_STATS_SCHEMA
    )


_FRAME_HASH_SCHEMA = "doc_id long, frame_idx long, frame_md5 string"


def _frame_hash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame fingerprinting kernel: sample every FRAME_STRIDE-th frame and
    md5 its bytes. A real pipeline hashes *decoded* frames (or a
    perceptual hash of them) right here in the executor-side kernel —
    the blob never leaves the worker, only (doc, idx, 16-byte hash) rows
    do."""
    for pdf in batches:
        out_doc, out_idx, out_md5 = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
            for idx in range(0, n_frames, FRAME_STRIDE):
                chunk = b[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_md5.append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int64"),
                "frame_md5": pd.Series(out_md5, dtype="object"),
            }
        )


@register(
    "frame_hash_dedup",
    # ASCII corpus ⇒ frame bytes == text substring; md5(string) in DuckDB
    # hashes the same bytes the kernel hashes.
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               md5(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES})) AS frame_md5
        FROM (
            SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT), {FRAME_STRIDE})) AS frame_idx
            FROM documents
        )
    )
    SELECT frame_md5, COUNT(*) AS n_occ,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM f GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    tags=("multimodal", "binary", "dedup", "frame_hash", "map_in_pandas"),
)
def frame_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video duplicate-frame detection: hash sampled frames in the
    executor-side kernel, then find hashes shared by ≥2 documents — the
    multimodal twin of `dup_ngram_spans` (intros, outros, watermark
    stills, and re-uploads all surface as shared frame fingerprints).

    Scale notes (100 TB): blobs stay in the Arrow batch on the worker;
    only fixed-width (doc, idx, hash) rows enter the shuffle, and the
    hash-keyed agg map-side-combines. With a perceptual hash swapped in,
    the same plan does near-duplicate frame clustering."""
    frames = _payload_df(spark, sf_dir).mapInPandas(
        _frame_hash_kernel, _FRAME_HASH_SCHEMA
    )
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.count("*").alias("n_occ"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "modality_router",
    oracle="""
    WITH payloads AS (
        SELECT doc_id,
               CASE doc_id % 3
                   WHEN 0 THEN unhex('89504E47') || encode(text)
                   WHEN 1 THEN unhex('FFD8FFE0') || encode(text)
                   ELSE unhex('52494646') || encode(text)
               END AS payload
        FROM documents
    ),
    routed AS (
        SELECT doc_id, payload,
               CASE substr(hex(payload), 1, 8)
                   WHEN '89504E47' THEN 'image/png'
                   WHEN 'FFD8FFE0' THEN 'image/jpeg'
                   WHEN '52494646' THEN 'audio/riff'
                   ELSE 'unknown'
               END AS modality
        FROM payloads
    )
    SELECT modality,
           COUNT(*) AS n_payloads,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
           MIN(doc_id) AS first_doc
    FROM routed GROUP BY modality
    """,
    tags=("multimodal", "binary", "router", "magic_bytes", "ingestion"),
)
def modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-side modality routing: sniff each opaque binary
    payload's MAGIC BYTES (PNG/JPEG/RIFF signatures) and route to the
    per-modality pipeline — the demux step in front of every mixed-
    media corpus, and the binary counterpart of dead_letter_split's
    router. Entirely JVM-side: substring() on BinaryType + hex() + CASE
    run in whole-stage codegen, so 100 TB of blobs are sniffed without
    one byte crossing into Python (decode kernels downstream are where
    mapInPandas takes over — cf. image_decode_stub). Payload synthesis
    prepends real magic numbers to the fixture text deterministically by
    doc_id, so every route is exercised; only the 4-byte prefix is ever
    inspected."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    body = F.encode(F.col("text"), "UTF-8")
    payload = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.unhex(F.lit("89504E47")), body))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.unhex(F.lit("FFD8FFE0")), body))
        .otherwise(F.concat(F.unhex(F.lit("52494646")), body))
    )
    routed = d.select("doc_id", payload.alias("payload"))
    modality = (
        F.when(F.hex(F.expr("substring(payload, 1, 4)")) == "89504E47", "image/png")
        .when(F.hex(F.expr("substring(payload, 1, 4)")) == "FFD8FFE0", "image/jpeg")
        .when(F.hex(F.expr("substring(payload, 1, 4)")) == "52494646", "audio/riff")
        .otherwise("unknown")
    )
    return routed.groupBy(modality.alias("modality")).agg(
        F.count("*").alias("n_payloads"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "cas_dedup_savings",
    oracle="""
    WITH fp AS (
        SELECT source, md5(text) AS fp,
               MAX(octet_length(encode(text))) AS bytes,
               COUNT(*) AS n_copies
        FROM documents GROUP BY source, md5(text)
    )
    SELECT source,
           CAST(SUM(n_copies) AS BIGINT) AS n_payloads,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(n_copies * bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(bytes) AS BIGINT) AS unique_bytes,
           CAST(SUM(n_copies * bytes) - SUM(bytes) AS DOUBLE)
               / CAST(SUM(n_copies * bytes) AS DOUBLE) AS savings_ratio
    FROM fp GROUP BY source
    """,
    tags=("multimodal", "cas", "dedup", "storage"),
)
def cas_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed-storage planning: per source, how many bytes a
    CAS layer (store each distinct payload once, reference it by hash —
    git/OCI-registry/restic storage) would save on the binary payload
    column. The digest and byte length are computed JVM-side on
    BinaryType (payloads never reach Python and never expand); the
    shuffle carries only (source, digest, bytes) — fixed-width rows
    regardless of payload size, the same hashes-not-content discipline
    as frame_hash_dedup. Two-level aggregate: digest-level collapses
    copies, source-level sums the storage story."""
    p = _payload_df(spark, sf_dir).join(
        load_table(spark, sf_dir, "documents").select("doc_id", "source"),
        "doc_id",
    )
    fp = p.groupBy(
        "source", F.md5("payload").alias("fp")
    ).agg(
        F.max(F.length("payload")).alias("bytes"),
        F.count("*").alias("n_copies"),
    )
    return fp.groupBy("source").agg(
        F.sum("n_copies").cast("long").alias("n_payloads"),
        F.count("*").cast("long").alias("n_unique"),
        F.sum(F.col("n_copies") * F.col("bytes")).cast("long").alias("total_bytes"),
        F.sum("bytes").cast("long").alias("unique_bytes"),
        (
            (
                F.sum(F.col("n_copies") * F.col("bytes")) - F.sum("bytes")
            ).cast("double")
            / F.sum(F.col("n_copies") * F.col("bytes")).cast("double")
        ).alias("savings_ratio"),
    )


EXPECTED_DIM = 64  # contract dimension for paired embeddings


@register(
    "paired_modality_audit",
    oracle=f"""
    WITH d AS (SELECT doc_id FROM documents),
    e AS (SELECT vec_id, len(embedding) AS dim FROM embeddings),
    j AS (
        SELECT d.doc_id, e.vec_id, e.dim
        FROM d FULL OUTER JOIN e ON d.doc_id = e.vec_id
    )
    SELECT CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL THEN 'paired'
                WHEN vec_id IS NULL THEN 'doc_only'
                ELSE 'vec_only' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(*) FILTER (WHERE dim = {EXPECTED_DIM}) AS BIGINT)
               AS n_dim_ok
    FROM j GROUP BY 1
    """,
    tags=("multimodal", "referential_integrity", "audit", "pairing",
          "training_data_qa"),
)
def paired_modality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality PAIRING audit: a contrastive (text, embedding)
    training set is only as good as its alignment, so before any
    CLIP-style run the pipeline must answer — how many documents have
    no paired vector (doc_only), how many vectors are orphaned
    (vec_only), and do the paired vectors honor the {EXPECTED_DIM}-dim
    contract. Silent pairing drift (an upstream job dropping rows on
    one side) is the classic cause of misaligned batches; this is the
    gate that catches it. One full outer join on the pairing key +
    one tiny categorical agg; at 100 TB both sides shuffle once on
    the id — or zero times when both are bucketed on it (the
    bucketed-join discipline), which is how a pairing audit should be
    deployed against petabyte modality stores."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.size("embedding").alias("dim")
    )
    j = d.join(e, d["doc_id"] == e["vec_id"], "full_outer")
    status = (
        F.when(
            F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull(), "paired"
        )
        .when(F.col("vec_id").isNull(), "doc_only")
        .otherwise("vec_only")
    )
    return j.groupBy(status.alias("status")).agg(
        F.count("*").cast("long").alias("n_records"),
        F.count(F.when(F.col("dim") == EXPECTED_DIM, 1))
        .cast("long")
        .alias("n_dim_ok"),
    )


# --- perceptual tile-hash near-dup over binary payloads (round 7, s4) -------
_PH_TILES = 16


def _tile_phash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched perceptual-hash kernel: split each payload into
    {_PH_TILES} contiguous byte tiles, binarize each tile's byte-sum
    against the payload's overall density (integer cross-multiplication
    — tile_sum·len > total_sum·tile_len — no float mean anywhere), and
    pack the bits into one integer. A real image pipeline computes the
    same aHash over 8×8 luma tiles after decode; the reduction shape —
    per-blob tiling, per-tile reduction, bit packing — is identical."""
    for pdf in batches:
        out = []
        for b in pdf["payload"]:
            bb = bytes(b)
            n = len(bb)
            total = sum(bb)
            ph = 0
            for t in range(_PH_TILES):
                lo = t * n // _PH_TILES
                hi = (t + 1) * n // _PH_TILES
                tsum = sum(bb[lo:hi])
                if tsum * n > total * (hi - lo):
                    ph |= 1 << t
            out.append(ph)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": pdf["payload"].map(len).astype("int64"),
                "phash": pd.Series(out, index=pdf.index, dtype="int64"),
            }
        )


_PH_SCHEMA = "doc_id bigint, payload_bytes bigint, phash bigint"


@register(
    "payload_tile_phash_dedup",
    oracle=f"""
    WITH bytes AS (
        SELECT doc_id, text AS s,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               CAST(list_sum(list_transform(range(1, octet_length(encode(text)) + 1),
                                            i -> unicode(text[i])))
                    AS BIGINT) AS total
        FROM documents
    ),
    ph AS (
        SELECT doc_id, n AS payload_bytes,
               CAST(list_sum(list_transform(range(0, {_PH_TILES}), t ->
                   CASE WHEN
                       CAST(list_sum(list_transform(
                           range(t * n // {_PH_TILES} + 1,
                                 (t + 1) * n // {_PH_TILES} + 1),
                           i -> unicode(s[i]))) AS BIGINT) * n
                       > total * ((t + 1) * n // {_PH_TILES}
                                  - t * n // {_PH_TILES})
                   THEN CAST(power(2.0, t) AS BIGINT) ELSE 0 END))
                   AS BIGINT) AS phash
        FROM bytes
    )
    SELECT p.doc_id, p.payload_bytes, p.phash,
           CAST(COUNT(*) OVER (PARTITION BY p.phash) AS BIGINT)
               AS cluster_size
    FROM ph p
    """,
    tags=("multimodal", "binary", "perceptual_hash", "near_dedup",
          "map_in_pandas"),
)
def payload_tile_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual tile-hash (aHash-style) clustering of binary payloads
    — the image/av near-dup primitive the text dedup family can't
    serve: {_PH_TILES} contiguous tiles per blob, each binarized
    against the blob's overall byte density and packed into one
    {_PH_TILES}-bit signature; equal signatures = candidate perceptual
    duplicates (cluster_size > 1), robust to small local edits the way
    cryptographic hashes (frame_hash_dedup, cas_dedup_savings) are
    deliberately NOT. The kernel is an Arrow-batched mapInPandas over
    the binary column — the exact shape a real post-decode aHash uses
    (tile, reduce, compare, pack), with integer cross-multiplied
    thresholds so the oracle can recompute every bit from the encoded
    bytes in SQL (unicode(char) = byte value on this ASCII corpus).
    Scale: one Python-kernel pass (payload bytes never inflate in the
    JVM), then a signature-keyed window for cluster sizes — the same
    fingerprint-bucket shape as dedup_exact."""
    from pyspark.sql import Window as W

    ph = _payload_df(spark, sf_dir).mapInPandas(
        _tile_phash_kernel, _PH_SCHEMA
    )
    return ph.select(
        "doc_id",
        "payload_bytes",
        "phash",
        F.count("*").over(W.partitionBy("phash")).cast("long").alias(
            "cluster_size"
        ),
    )


# --- strided thumbnail resize stub (round 8) ---------------------------------
_THUMB_N = 64  # fixed "thumbnail" size: strided byte sample of the payload

_THUMB_SCHEMA = (
    "doc_id bigint, n_bytes bigint, thumb bigint, thumb_checksum bigint"
)


def _thumbnail_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic FAKE resize: sample {_THUMB_N} bytes at strided
    offsets ⌊i·L/{_THUMB_N}⌋ — the batch shape, schema, and reduction a
    real `PIL.Image.resize((8, 8))` kernel would have, with the pixel
    math replaced by byte striding (no codecs in this container). The
    emitted scalar pair (first sampled byte, checksum of all samples)
    is what the oracle can recompute natively."""
    if HAS_PIL:
        raise NotImplementedError(
            "real resize path intentionally unimplemented in this build; "
            "swap _thumbnail_kernel for a PIL kernel with this signature"
        )
    for pdf in batches:
        payload = pdf["payload"]

        def _sample(b):
            bb = bytes(b)
            n = len(bb)
            return [bb[i * n // _THUMB_N] for i in range(_THUMB_N)]

        samples = payload.map(_sample)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payload.map(len).astype("int64"),
                "thumb": samples.map(lambda s: s[0]).astype("int64"),
                "thumb_checksum": samples.map(sum).astype("int64"),
            }
        )


@register(
    "thumbnail_resize_stub",
    # documents.text is pure ASCII, so ascii(substring(...)) recomputes
    # the same byte values the kernel samples from the encoded payload.
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS thumb,
           CAST(list_reduce(
               list_transform(range(0, {_THUMB_N}),
                   i -> ascii(substr(text,
                        CAST(i * octet_length(encode(text)) // {_THUMB_N}
                             AS BIGINT) + 1, 1))),
               (acc, x) -> acc + x) AS BIGINT) AS thumb_checksum
    FROM documents
    """,
    tags=("multimodal", "binary", "map_in_pandas", "resize", "thumbnail"),
)
def thumbnail_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing through the Arrow kernel path: a strided
    {_THUMB_N}-byte 'thumbnail' per binary payload (the deterministic
    stand-in for PIL resize — this container ships no codecs, so the
    pixel math is byte striding, clearly marked in the kernel), with
    the first sampled byte and the sample checksum as the gate-visible
    scalars. What this certifies is the part that matters at 100 TB:
    BinaryType survives the Arrow round trip byte-exactly, the kernel
    is batch-shaped (one pandas frame per Arrow batch, no per-row
    Python), and the output schema is declared so Catalyst can prune
    and the sink can write without inference. Plan: one narrow
    mapInPandas, no shuffle."""
    return _payload_df(spark, sf_dir).mapInPandas(
        _thumbnail_kernel, _THUMB_SCHEMA
    )


# --- Voice-activity-detection segmentation stub (round 8) ---------------------
VAD_WINDOW = 128  # bytes per analysis window
VAD_LEVEL = 94    # voiced iff mean byte >= level (integer-exact compare)

_VAD_SCHEMA = (
    "doc_id bigint, seg_idx bigint, start_window bigint, end_window bigint,"
    " n_windows bigint"
)


def _vad_segment_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic FAKE voice-activity detector.

    A real kernel would decode PCM and compute per-frame RMS energy
    (webrtcvad / silero); here "energy" is the mean byte value of each
    VAD_WINDOW-byte slice, and the voiced test is the integer-exact
    comparison sum(bytes) >= VAD_LEVEL * window_len. The operator shape
    is the real contract: per-blob windowing, thresholding, and
    RUN-LENGTH MERGING of consecutive voiced windows into segment rows
    (1 blob -> N segments) — all inside one Arrow-batched pass.
    """
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "seg_idx", "start", "end", "n")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_win = (len(b) + VAD_WINDOW - 1) // VAD_WINDOW
            seg_idx = 0
            run_start = None
            for wi in range(n_win + 1):  # +1 sentinel flushes the last run
                chunk = b[wi * VAD_WINDOW : (wi + 1) * VAD_WINDOW]
                voiced = bool(chunk) and sum(chunk) >= VAD_LEVEL * len(chunk)
                if voiced and run_start is None:
                    run_start = wi
                elif not voiced and run_start is not None:
                    out["doc_id"].append(doc_id)
                    out["seg_idx"].append(seg_idx)
                    out["start"].append(run_start)
                    out["end"].append(wi - 1)
                    out["n"].append(wi - run_start)
                    seg_idx += 1
                    run_start = None
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "seg_idx": pd.Series(out["seg_idx"], dtype="int64"),
                "start_window": pd.Series(out["start"], dtype="int64"),
                "end_window": pd.Series(out["end"], dtype="int64"),
                "n_windows": pd.Series(out["n"], dtype="int64"),
            }
        )


@register(
    "audio_vad_segments_stub",
    # ASCII corpus => byte i == ascii(char i+1); windows are substring
    # slices, segments are gaps-and-islands over voiced window indices.
    oracle=f"""
    WITH ch AS (
        SELECT doc_id, (i - 1) // {VAD_WINDOW} AS wi,
               ascii(substr(text, CAST(i AS INT), 1)) AS b
        FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
              FROM documents)
    ),
    win AS (SELECT doc_id, wi, SUM(b) AS s, COUNT(*) AS wl
            FROM ch GROUP BY 1, 2),
    voiced AS (SELECT doc_id, wi FROM win WHERE s >= {VAD_LEVEL} * wl),
    isl AS (
        SELECT doc_id, wi,
               wi - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wi) AS g
        FROM voiced
    ),
    seg AS (
        SELECT doc_id, MIN(wi) AS start_window, MAX(wi) AS end_window,
               COUNT(*) AS n_windows
        FROM isl GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_window)
                - 1 AS BIGINT) AS seg_idx,
           CAST(start_window AS BIGINT) AS start_window,
           CAST(end_window AS BIGINT) AS end_window,
           CAST(n_windows AS BIGINT) AS n_windows
    FROM seg
    """,
    tags=("multimodal", "binary", "audio", "vad", "segmentation",
          "map_in_pandas"),
)
def audio_vad_segments_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation over binary payloads: window the
    blob, threshold per-window energy, and run-length-merge consecutive
    voiced windows into segment rows — the diarization/ASR-preprocessing
    shape audio_feature_stub (per-blob scalars) and
    video_frame_sample_stub (per-frame rows) don't cover: VARIABLE-count
    segment rows whose boundaries depend on SEQUENTIAL state within the
    blob. The stateful merge runs inside the Arrow-batched kernel where
    per-blob sequential logic is free; the engine never shuffles the
    blob, only the O(segments) output. The energy/threshold math is
    integer-exact (sum >= level·len, no float means), so the DuckDB
    gaps-and-islands oracle reproduces segment boundaries bit-for-bit."""
    return _payload_df(spark, sf_dir).mapInPandas(_vad_segment_kernel, _VAD_SCHEMA)


# --- Keyframe selection by inter-frame feature delta (round 11) --------------------
KEYFRAME_DELTA = 2048  # absolute inter-frame feature-change threshold

_KEYFEAT_SCHEMA = "doc_id bigint, frame_idx bigint, frame_bytes bigint, feat bigint"


def _keyframe_feature_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic FAKE per-frame feature extraction for keyframe
    selection.

    A real kernel would decode every frame (ffmpeg) and emit a compact
    visual feature (color histogram, perceptual hash); here a "frame"
    is a FRAME_BYTES-sized payload slice and its feature is the exact
    int64 byte sum — order-free integer arithmetic, so the value
    bit-matches the SQL oracle. The kernel deliberately emits EVERY
    frame's feature and leaves the keyframe DECISION to DataFrame
    algebra: the division of labor a production pipeline wants (Python
    touches bytes once; the shuffle-side lag/filter logic stays in
    Catalyst, where the planner can push it around)."""
    for pdf in batches:
        out_doc, out_idx, out_len, out_feat = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
            for idx in range(n_frames):
                chunk = b[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_len.append(len(chunk))
                out_feat.append(sum(chunk))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int64"),
                "frame_bytes": pd.Series(out_len, dtype="int64"),
                "feat": pd.Series(out_feat, dtype="int64"),
            }
        )


@register(
    "video_keyframe_delta_stub",
    # ASCII corpus: frame f of doc covers chars [f*FB+1, min((f+1)*FB, n)]
    # and its byte sum equals the char-codepoint sum over that slice.
    oracle=f"""
    WITH ch AS (
        SELECT doc_id,
               (unnest(range(1, length(text) + 1)) - 1) // {FRAME_BYTES}
                   AS frame_idx,
               unnest(range(1, length(text) + 1)) AS i, text
        FROM documents
    ),
    frames AS (
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(COUNT(*) AS BIGINT) AS frame_bytes,
               CAST(SUM(ascii(substr(text, CAST(i AS INT), 1))) AS BIGINT)
                   AS feat
        FROM ch GROUP BY 1, 2
    ),
    lagged AS (
        SELECT *, feat - LAG(feat) OVER (PARTITION BY doc_id
                                         ORDER BY frame_idx) AS delta
        FROM frames
    )
    SELECT doc_id, frame_idx, frame_bytes, feat,
           COALESCE(delta, CAST(0 AS BIGINT)) AS delta,
           (delta IS NULL OR ABS(delta) >= {KEYFRAME_DELTA}) AS is_keyframe
    FROM lagged
    """,
    tags=("multimodal", "binary", "video", "keyframe", "decode_stub",
          "map_in_pandas"),
)
def video_keyframe_delta_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection by inter-frame feature delta — the
    shot-boundary heuristic every video curation pipeline runs before
    captioning/embedding (sample MORE where content changes), and the
    content-adaptive complement to video_frame_sample_stub's fixed
    STRIDE sampling. The mapInPandas kernel fake-decodes frames to an
    exact-integer feature (see kernel docstring: real decode is
    environment-gated, the Spark-side plumbing is real); frame deltas
    and the keyframe decision run JVM-side as a lag window partitioned
    by doc — no Python in the selection path, so at 100 TB the decode
    kernel is the only Arrow hop and the planner is free to prune
    non-key frames before any downstream shuffle. Frame 0 is always a
    keyframe; later frames qualify when |feat - prev_feat| >=
    {KEYFRAME_DELTA} (a literal contract, not a tuned constant)."""
    from pyspark.sql import Window as W

    frames = _payload_df(spark, sf_dir).mapInPandas(
        _keyframe_feature_kernel, _KEYFEAT_SCHEMA
    )
    lag = F.lag("feat").over(W.partitionBy("doc_id").orderBy("frame_idx"))
    lagged = frames.withColumn("delta_raw", F.col("feat") - lag)
    return lagged.select(
        "doc_id",
        "frame_idx",
        "frame_bytes",
        "feat",
        F.coalesce(F.col("delta_raw"), F.lit(0).cast("long")).alias("delta"),
        (
            F.col("delta_raw").isNull()
            | (F.abs(F.col("delta_raw")) >= KEYFRAME_DELTA)
        ).alias("is_keyframe"),
    )
