"""Multimodal columns (SURVEY.md §2.8): image/audio/video as opaque
``binary`` payloads with typed metadata, plus decode / feature-extract /
resize / frame-sample operators.

The codec step itself is STUBBED (image/audio libraries are not in this
container): ``decode_features`` and ``resize_images`` run deterministic
fakes inside ``mapInPandas`` so the Spark-side plumbing — schema, Arrow
batch shape, partitioning — is real and tested, while ``real_decode=True``
raises ``NotImplementedError`` at the exact point a PIL/ffmpeg call would
go. Because the fakes are pure digests, BOTH queries carry full DuckDB
oracles: every value crossing the Arrow boundary is hash-verified.

The driver testdata has no binary table, so assets are derived
deterministically from ``documents`` (payload = utf-8 bytes of ``text``,
kind from ``doc_id`` — same derivation in the DuckDB oracle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import ensure_min_partitions, load_table
from ..plans.registry import register

__all__ = [
    "assets_from_documents",
    "decode_features",
    "resize_images",
    "frame_sample",
    "FEATURE_DIM",
]

FEATURE_DIM = 8

KINDS = ("image", "audio", "video")


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a multimodal asset table: (asset_id, kind, payload binary,
    meta struct) — deterministic so the oracle can re-derive it."""
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 16).cast("int").alias("sample_rate"),
            (F.col("n_chars") % 50 + 2).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_features(assets: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each executor receives pandas batches of (asset_id,
    kind, payload) and emits FEATURE_DIM-dim feature vectors. The fake
    featurizer is a deterministic digest of the payload bytes — the real one
    would decode pixels/samples at the marked point.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                # Real implementation: PIL.Image.open / soundfile.read /
                # av.open over io.BytesIO(payload), then model features.
                raise NotImplementedError("media codecs not available in this environment")
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                feats.append(
                    [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(FEATURE_DIM)]
                )
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "features": feats,
                }
            )

    return assets.mapInPandas(extract, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("resized_hash", T.StringType()),
    ]
)


def resize_images(assets: DataFrame, target_w: int = 256, real_decode: bool = False) -> DataFrame:
    """Aspect-preserving image resize over binary payloads (``mapInPandas``).

    Target height = floor(h·target_w/w + 0.5) (integer-exact on both
    engines). The pixel resample is the STUBBED codec step: the fake emits
    sha256(payload ‖ "WxH" dims tag) as the resized artifact's content
    hash, so the batch shape, schema and per-row output of the real
    operator are exercised — and, because the fake is a pure digest, the
    whole operator is oracle-checkable. ``real_decode=True`` raises at the
    exact point a PIL ``Image.resize`` would run.
    """
    imgs = assets.filter(F.col("kind") == "image").select(
        "asset_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        "payload",
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                # Real implementation: PIL.Image.open(io.BytesIO(payload))
                # .resize((tw, th)) then re-encode.
                raise NotImplementedError("media codecs not available in this environment")
            tws, ths, hashes = [], [], []
            for w, h, payload in zip(pdf["width"], pdf["height"], pdf["payload"]):
                tw = int(target_w)
                th = int(h * tw // w + (1 if (h * tw % w) * 2 >= w else 0)) if w else 0
                tag = f"{tw}x{th}".encode()
                tws.append(tw)
                ths.append(th)
                hashes.append(hashlib.sha256(bytes(payload) + tag).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "target_w": pd.Series(tws, dtype="int32"),
                    "target_h": pd.Series(ths, dtype="int32"),
                    "resized_hash": hashes,
                }
            )

    return imgs.mapInPandas(resize, schema=_RESIZE_SCHEMA)


def frame_sample(assets: DataFrame, stride: int = 7) -> DataFrame:
    """Frame sampling for video assets: one output row per sampled frame
    index (0, stride, 2·stride, … < n_frames). Pure explode — the per-frame
    decode would be a second ``mapInPandas`` over (payload, frame_idx)."""
    vids = assets.filter(F.col("kind") == "video")
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(stride))
    return vids.select(
        "asset_id", F.col("meta.n_frames").alias("n_frames"), F.explode(frames).alias("frame_idx")
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "multimodal_payload_stats",
    oracle="""
    SELECT doc_id AS asset_id,
           ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_hash,  -- payload = utf8(text): same bytes
           CAST(n_chars % 50 + 2 AS INTEGER) AS n_frames
    FROM documents
    """,
    tags=("multimodal",),
)
def q_multimodal_stats(spark, sf_dir):
    """Typed metadata + content hashing over binary payloads (the pure
    relational part of the multimodal pipeline — fully oracle-checked)."""
    docs = load_table(spark, sf_dir, "documents")
    a = assets_from_documents(docs)
    return a.select(
        "asset_id",
        "kind",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_hash"),
        F.col("meta.n_frames").alias("n_frames"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(n_chars % 50 + 2 AS INTEGER) AS n_frames,
           CAST(unnest(range(0, n_chars % 50 + 2, 7)) AS INTEGER) AS frame_idx
    FROM documents
    WHERE doc_id % 3 = 2
    """,
    tags=("multimodal", "frames"),
)
def q_multimodal_frames(spark, sf_dir):
    """Video frame-index sampling (explode of a bounded sequence)."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(assets_from_documents(docs), stride=7)


@register(
    "multimodal_features",
    oracle=f"""
    WITH assets AS (
        SELECT doc_id AS asset_id,
               ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS digest_hex
        FROM documents
    )
    SELECT asset_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(d.i AS INTEGER) AS dim,
           round(('0x' || substr(digest_hex, 8 * (d.i - 1) + 1, 8))::BIGINT
                     / 4294967296.0, 9) AS feature
    FROM assets CROSS JOIN (SELECT unnest(range(1, {FEATURE_DIM + 1})) AS i) d
    """,
    tags=("multimodal", "pandas-udf"),
)
def q_multimodal_features(spark, sf_dir):
    """Arrow-batched fake-decode featurization, now fully oracle-checked:
    the deterministic digest featurizer (sha256 of the payload, 4-byte
    big-endian words scaled to [0,1)) is re-derived by DuckDB from the hex
    digest, so every feature VALUE the Pandas-UDF path emits is
    value-hash-verified — the Arrow plumbing (schema, batching, mapInPandas
    signature) is exactly what a real codec featurizer would use, with the
    decode call swapped at the marked point. Features are posexploded to
    numeric rows (driver-hashable; no float→string formatting)."""
    docs = load_table(spark, sf_dir, "documents")
    out = decode_features(assets_from_documents(docs))
    return out.select(
        "asset_id",
        "kind",
        "n_bytes",
        F.posexplode("features"),
    ).select(
        "asset_id",
        "kind",
        "n_bytes",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round("col", 9).alias("feature"),
    )


@register(
    "multimodal_resize",
    oracle="""
    WITH assets AS (
        SELECT doc_id AS asset_id,
               ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
               (n_chars % 640)::INT AS width,
               (n_chars % 480)::INT AS height,
               text
        FROM documents
    ), t AS (
        SELECT asset_id, width, height,
               CASE WHEN width = 0 THEN 0
                    ELSE ((height * 256) // width
                          + CASE WHEN ((height * 256) % width) * 2 >= width
                                 THEN 1 ELSE 0 END)
               END AS target_h,
               text
        FROM assets WHERE kind = 'image'
    )
    SELECT asset_id, width, height,
           CAST(256 AS INTEGER) AS target_w,
           CAST(target_h AS INTEGER) AS target_h,
           sha256(text || 256::VARCHAR || 'x' || target_h::VARCHAR) AS resized_hash
    FROM t
    """,
    tags=("multimodal", "pandas-udf", "resize"),
)
def q_multimodal_resize(spark, sf_dir):
    """Aspect-preserving resize of the image assets (Pandas-UDF codec
    plumbing, deterministic fake resample). Fully oracle-checked: target
    dimensions are integer-exact round-half-up arithmetic and the fake
    resized-artifact hash is sha256(payload ‖ dims tag), both re-derived
    by DuckDB — so the Arrow path's entire output is value-hash-verified
    while the real PIL call stays stubbed at the marked point."""
    docs = load_table(spark, sf_dir, "documents")
    return resize_images(assets_from_documents(docs), target_w=256)


@register(
    "multimodal_text_embedding_join",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
    )
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6) AS avg_l2,
           round(avg(d.n_chars), 6) AS avg_chars,
           CAST(count(DISTINCT e.label) AS BIGINT) AS n_labels
    FROM documents d JOIN e ON d.doc_id = e.vec_id
    GROUP BY d.lang
    """,
    tags=("multimodal", "join", "embedding"),
)
def q_multimodal_text_embedding_join(spark, sf_dir):
    """Cross-modal join: text rows joined 1:1 to their embedding rows (the
    multimodal single-schema story — text + vector columns side by side),
    aggregating an embedding statistic (L2 norm) against a text statistic
    (chars) per language. At scale both tables co-partition on the shared id
    so the join shuffles each side once."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    l2 = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    e = emb.select("vec_id", l2.alias("l2"), "label")
    return (
        docs.join(e, docs.doc_id == e.vec_id)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("l2"), 6).alias("avg_l2"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup (r9): the multimodal x dedup composition — a
# 64-bit-class CONTENT-LOCALITY-SENSITIVE fingerprint per payload,
# pigeonhole Hamming-LSH blocking, exact Hamming verification.  The
# fingerprint is a 60-bit SimHash over the payload's byte 4-grams — the
# deterministic stand-in at the exact point a real DCT pHash /
# chromaprint would hash decoded pixels/samples (same stub convention as
# decode_features, but locality-sensitive: payloads sharing most of their
# bytes land within a few bits of each other, so the banded machinery
# surfaces genuine near-duplicate assets, not just byte-identical ones).
# ---------------------------------------------------------------------------

_PH_BANDS = 4       # pigeonhole: any pair with hamming <= 3 shares a band
_PH_BAND_BITS = 15  # 4 x 15 = 60 bits
_PH_MAX_HAM = _PH_BANDS - 1
_PH_BITS = 60


def payload_simhash60(assets: DataFrame) -> DataFrame:
    """(asset_id, kind, ph): 60-bit SimHash over byte 4-grams of the
    payload — bit i = sign of Σ_grams (±1 by gram-hash bit i).  One gram
    explosion + one grouped aggregation with 60 conditional sums, all
    codegen; linear in total payload bytes and embarrassingly parallel."""
    from ..functions.hashing import md5_60  # noqa: PLC0415

    s = F.decode(F.col("payload"), "UTF-8")
    # stride-3 gram sampling: 1/3 the hash+aggregate cost with the same
    # near-dup Hamming profile (verified empirically on the corpus) —
    # real pHash pipelines subsample input exactly this way
    grams = F.transform(
        F.sequence(F.lit(1), F.length(s) - 3, F.lit(3)),
        lambda i: F.substr(s, i, F.lit(4)),
    )
    toks = (
        assets.filter(F.length(s) >= 4)
        .select("asset_id", "kind", F.explode(grams).alias("gram"))
        .withColumn("h", md5_60(F.col("gram")))
    )
    sums = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"s_{i}")
        for i in range(_PH_BITS)
    ]
    agg = toks.groupBy("asset_id", "kind").agg(*sums)
    fp = None
    for i in range(_PH_BITS):
        bit = F.when(F.col(f"s_{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select("asset_id", "kind", fp.alias("ph"))


def phash_neardup_pairs(assets: DataFrame, max_ham: int = _PH_MAX_HAM) -> DataFrame:
    """(id_a, id_b, hamming) pairs of assets whose fingerprints differ in
    at most ``max_ham`` bits.  Blocking is the pigeonhole split of the
    60-bit code into ``_PH_BANDS`` 15-bit bands: a pair within Hamming
    distance ``_PH_BANDS - 1`` must agree EXACTLY on at least one band,
    so candidates come from ``_PH_BANDS`` equi-joins on (band_idx,
    band_value) — never a cross join; at 100 TB the join is Sum of
    band-bucket^2, the same bounded shape as MinHash-LSH."""
    # r13 (guide §1.2, §2.1): the fingerprint relation feeds BOTH sides of
    # the band self-join with different projections — no exchange reuse —
    # so without a cut the whole gram-explode + 60-sum aggregate ran
    # twice; the input is also spread before the byte-gram explode. The
    # checkpoint is one (asset_id, kind, ph) row per asset: model-sized.
    coded = payload_simhash60(ensure_min_partitions(assets)).localCheckpoint(
        eager=True
    )
    mask = (1 << _PH_BAND_BITS) - 1
    bands = coded.select(
        "asset_id",
        "kind",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("ph", i * _PH_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for i in range(_PH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("asset_id", "kind", "ph", "b.band", "b.bval")
    a = bands.select(
        F.col("asset_id").alias("id_a"),
        F.col("kind").alias("kind_a"),
        F.col("ph").alias("ph_a"),
        "band",
        "bval",
    )
    b = bands.select(
        F.col("asset_id").alias("id_b"),
        F.col("kind").alias("kind_b"),
        F.col("ph").alias("ph_b"),
        "band",
        "bval",
    )
    cand = (
        a.join(b, ["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "kind_a", "ph_a", "id_b", "kind_b", "ph_b")
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_ham)
        .select("id_a", "id_b", "kind_a", "kind_b", "hamming")
    )


_PH_BITSUM = " + ".join(
    f"CASE WHEN s_{i} > 0 THEN CAST(1 AS BIGINT) << {i} ELSE 0 END"
    for i in range(_PH_BITS)
)
_PH_SUMS = ", ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{i}"
    for i in range(_PH_BITS)
)


@register(
    "multimodal_phash_neardup",
    oracle=f"""
    WITH d AS (
        SELECT doc_id AS asset_id,
               ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
               text
        FROM documents
    ), g AS (
        SELECT asset_id, kind,
               ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
        FROM (
            SELECT asset_id, kind,
                   unnest([substr(text, CAST(i AS INT), 4)
                           FOR i IN range(1, greatest(length(text) - 2, 1), 3)]) AS gram
            FROM d WHERE length(text) >= 4)
    ), sums AS (
        SELECT asset_id, kind, {_PH_SUMS}
        FROM g GROUP BY asset_id, kind
    ), assets AS (
        SELECT asset_id, kind, {_PH_BITSUM} AS ph FROM sums
    ), bands AS (
        SELECT asset_id, kind, ph, b.band,
               (ph >> (b.band * {_PH_BAND_BITS})) & {(1 << _PH_BAND_BITS) - 1} AS bval
        FROM assets CROSS JOIN (
            SELECT unnest(range(0, {_PH_BANDS})) AS band) b
    ), cand AS (
        SELECT DISTINCT a.asset_id AS id_a, a.kind AS kind_a, a.ph AS ph_a,
                        b.asset_id AS id_b, b.kind AS kind_b, b.ph AS ph_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bval = b.bval AND a.asset_id < b.asset_id
    )
    SELECT id_a, id_b, kind_a, kind_b,
           CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(ph_a, ph_b)) <= {_PH_MAX_HAM}
    """,
    tags=("multimodal", "dedup", "phash", "lsh"),
)
def q_multimodal_phash_neardup(spark, sf_dir):
    """Near-duplicate binary assets by perceptual-hash distance: a 60-bit
    byte-4-gram SimHash per payload (the content-locality-sensitive
    stand-in where a real DCT pHash would hash decoded pixels), 4x15-bit
    pigeonhole bands block candidates (exact recall to Hamming 3), exact
    XOR+popcount verifies.  Surfaces genuinely near-identical payloads —
    re-encoded/lightly-edited copies in a real asset store — not just
    byte-identical ones."""
    docs = load_table(spark, sf_dir, "documents")
    return phash_neardup_pairs(assets_from_documents(docs))


@register(
    "multimodal_exact_payload_dedup",
    oracle="""
    WITH a AS (
        SELECT doc_id AS asset_id,
               ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
               sha256(text) AS payload_hash,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    ), g AS (
        SELECT payload_hash,
               CAST(count(*) AS BIGINT) AS n_copies,
               CAST(min(asset_id) AS BIGINT) AS survivor_id,
               CAST(min(n_bytes) AS BIGINT) AS n_bytes,
               CAST(count(DISTINCT kind) AS BIGINT) AS n_kinds
        FROM a GROUP BY payload_hash
        HAVING count(*) >= 2
    )
    SELECT payload_hash, n_copies, survivor_id, n_bytes,
           CAST((n_copies - 1) * n_bytes AS BIGINT) AS bytes_saved,
           n_kinds
    FROM g ORDER BY payload_hash
    """,
    tags=("multimodal", "dedup", "content-hash"),
)
def q_multimodal_exact_payload_dedup(spark, sf_dir):
    """Exact BINARY-payload dedup — the first pass of every multimodal
    ingest (before perceptual near-dup via `multimodal_phash_neardup`):
    group assets by sha256 of the raw bytes, keep the min-id survivor,
    report copies and bytes saved per group.  Content hashing is
    modality-blind by design — identical bytes dedup across the
    image/audio/video kind tags (n_kinds > 1 groups are exactly the
    cross-labeled copies a file-level store would double-pay for).

    The payload column is real ``binary`` (the asset derivation's
    contract); the hash is computed on the BYTES, with the oracle
    re-deriving the identical bytes from the text column — so the
    value-hash parity covers the binary plumbing end to end.

    Scale: one projection (hash per row — embarrassingly parallel, the
    map side of the shuffle) + one grouped agg on the 32-byte hash key;
    this is the `dedup_exact_hash` shape applied to binary content, and
    it is the only dedup that needs NO blocking at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    a = assets_from_documents(docs)
    g = (
        a.select(
            "asset_id",
            "kind",
            F.sha2("payload", 256).alias("payload_hash"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        )
        .groupBy("payload_hash")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min("asset_id").cast("long").alias("survivor_id"),
            F.min("n_bytes").cast("long").alias("n_bytes"),
            F.countDistinct("kind").cast("long").alias("n_kinds"),
        )
        .filter(F.col("n_copies") >= 2)
    )
    return g.select(
        "payload_hash",
        "n_copies",
        "survivor_id",
        "n_bytes",
        ((F.col("n_copies") - 1) * F.col("n_bytes")).cast("long").alias("bytes_saved"),
        "n_kinds",
    ).orderBy("payload_hash")
