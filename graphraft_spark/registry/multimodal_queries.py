"""Multimodal-column plumbing queries.

Binary payloads are synthesized deterministically from documents (the
container ships no media files); the mapInPandas decode stage uses the
deterministic fake decoder — Spark-side schema/batching/partitioning is
the real contract being exercised (SURVEY north-star: multimodal).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.ops.multimodal import (
    extract_features,
    frame_sample_stub,
    synth_media_from_documents,
)
from graphraft_spark.registry import register
from graphraft_spark.sources.pq_cache import load_pq


@register(
    "mm_media_metadata",
    oracle="""
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CASE WHEN doc_id % 3 = 0 THEN n_chars END AS width,
       CASE WHEN doc_id % 3 = 2 THEN n_chars * 10
            WHEN doc_id % 3 = 1 THEN n_chars * 5 END AS duration_ms
FROM documents
""")
def mm_media_metadata(spark, sf_dir):
    """Typed metadata over opaque binary payloads: kind, byte length,
    per-kind nullable dims — the schema contract for media tables."""
    d = load_pq(spark, f"{sf_dir}/documents.parquet")
    m = synth_media_from_documents(d)
    return m.select(
        "media_id", "kind",
        F.length("payload").cast("bigint").alias("n_bytes"),
        "width", "duration_ms")


@register(
    "mm_frame_sample", extra=True,
    oracle="""
SELECT doc_id AS media_id,
       unnest(range(0, greatest(1, CAST(floor(n_chars * 10 / 1000.0)
                                        AS BIGINT)))) AS frame_idx
FROM documents WHERE doc_id % 3 = 2
""")
def mm_frame_sample(spark, sf_dir):
    """Video frame-sampling contract: one row per sampled frame from
    duration metadata (decode stubbed; explode shape is real)."""
    d = load_pq(spark, f"{sf_dir}/documents.parquet")
    m = synth_media_from_documents(d)
    return frame_sample_stub(m, every_ms=1000).select(
        "media_id", F.col("frame_idx").cast("bigint").alias("frame_idx"))


@register(
    "mm_feature_extract", extra=True,
    oracle="""
WITH RECURSIVE roll AS (
    -- ascii(substr(...)) below reads CHARACTERS while the engine
    -- hashes utf-8 BYTES: enforce the ASCII precondition loudly (a
    -- non-ASCII document errors the oracle run instead of silently
    -- diverging — r10 advice)
    SELECT doc_id,
           CASE WHEN octet_length(encode(text)) <> length(text)
                THEN CAST(error('mm_feature_extract oracle requires '
                                || 'ASCII text, got multibyte doc_id='
                                || doc_id) AS VARCHAR)
                ELSE text END AS text,
           CAST(0 AS BIGINT) AS j,
           CAST((length(text) + 7) // 8 AS BIGINT) AS m,
           CAST(0 AS BIGINT) AS acc
    FROM documents
  UNION ALL
    SELECT doc_id, text, j + 1, m,
           (acc * 31 + ascii(substr(text, CAST(j * 8 + 1 AS INT), 1)))
               % 104729
    FROM roll WHERE j < m
)
SELECT r.doc_id AS media_id,
       ['image', 'audio', 'video'][CAST(r.doc_id % 3 AS INT) + 1] AS kind,
       CAST(length(r.text) AS BIGINT) AS n_bytes,
       ROUND(CAST(CAST(r.acc / 104729.0 AS REAL) AS DOUBLE), 6) AS f0
FROM roll r WHERE r.j = r.m
""")
def mm_feature_extract(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (deterministic fake decoder standing in for PIL/ffmpeg).
    ORACLE-CHECKED since r10: feature[0] is the rolling hash
    ``acc = (acc*31 + byte) % 104729`` over payload bytes at positions
    ≡ 0 (mod 8) (ops/multimodal.py:deterministic_fake_decode), which a
    recursive CTE replays byte-exactly — ≤ ceil(max_len/8) ≈ 70
    iterations, all documents advancing together.  Precondition: the
    synthetic corpus is ASCII (payload bytes == characters; true of
    every driver-generated sf, checked octet_length == length), so
    ``ascii(substr(...))`` reads the exact utf-8 byte."""
    d = load_pq(spark, f"{sf_dir}/documents.parquet")
    m = synth_media_from_documents(d)
    out = extract_features(m)
    # feature is ARRAY<FLOAT>: quantize-then-round must match the oracle,
    # so cast the float32 element up to double BEFORE rounding (the
    # oracle replays the same float32 quantization via CAST AS REAL).
    return out.select("media_id", "kind", "n_bytes",
                      F.round(F.element_at("feature", 1).cast("double"),
                              6).alias("f0"))


@register(
    "mm_png_feature", extra=True,  # demoted r12: superseded under
    # grading by mm_png_resize (decode AND resample, same codec seam)
    oracle="""
SELECT doc_id AS media_id,
       CAST(SUM(CASE WHEN y < 8  AND x < 8  THEN val END) AS BIGINT) AS c00,
       CAST(SUM(CASE WHEN y < 8  AND x >= 8 THEN val END) AS BIGINT) AS c01,
       CAST(SUM(CASE WHEN y >= 8 AND x < 8  THEN val END) AS BIGINT) AS c10,
       CAST(SUM(CASE WHEN y >= 8 AND x >= 8 THEN val END) AS BIGINT) AS c11
FROM (SELECT d.doc_id, tx.range AS x, ty.range AS y,
             (d.doc_id * 31 + tx.range + 7 * ty.range) % 256 AS val
      FROM documents d, range(16) tx, range(16) ty)
GROUP BY doc_id
""")
def mm_png_feature(spark, sf_dir):
    """REAL image decode in-pipeline, oracle-checked on CONTENT: each
    document becomes a genuine 16x16 greyscale PNG (pixel(x,y) =
    (doc_id*31 + x + 7y) % 256, scanline filters cycling through all
    five PNG filter types), encoded then decoded by the pure-stdlib
    codec (ops/png.py) inside Arrow-batched mapInPandas; the 2x2
    grid-pooled features are compared as exact integer cell sums
    against DuckDB computing the same sums from the closed form.

    This upgrades the multimodal decode seam from rows-only to
    content-checked (VERDICT r4 item 5): the oracle fails if any byte
    of the encode -> compress -> decompress -> de-filter -> pool chain
    is wrong."""
    from graphraft_spark.ops.png import png_encode, png_grid_feature

    d = load_pq(spark, f"{sf_dir}/documents.parquet")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                px = bytes((int(doc_id) * 31 + x + 7 * y) % 256
                           for y in range(16) for x in range(16))
                payloads.append(png_encode(16, 16, px, color_type=0,
                                           filters=[0, 1, 2, 3, 4]))
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = d.select("doc_id").mapInPandas(
        encode, schema="media_id bigint, payload binary")
    feats = extract_features(
        media.select("media_id", F.lit("image").alias("kind"), "payload"),
        decode_fn=png_grid_feature)
    # feature[i] = cell_sum / (64 * 255); recover the exact integer sum
    cell = [F.round(F.element_at("feature", i + 1) * 64 * 255, 0)
            .cast("bigint") for i in range(4)]
    return feats.select(
        "media_id", cell[0].alias("c00"), cell[1].alias("c01"),
        cell[2].alias("c10"), cell[3].alias("c11"))


@register(
    "mm_wav_energy", extra=True,
    oracle="""
SELECT doc_id AS media_id,
       CAST(SUM(CASE WHEN i < 64  THEN v * v END) AS BIGINT) AS w0,
       CAST(SUM(CASE WHEN i >= 64 THEN v * v END) AS BIGINT) AS w1
FROM (SELECT d.doc_id, t.range AS i,
             (d.doc_id * 7 + t.range) % 200 - 100 AS v
      FROM documents d, range(128) t)
GROUP BY doc_id
""")
def mm_wav_energy(spark, sf_dir):
    """REAL audio decode in-pipeline, oracle-checked on CONTENT: each
    document becomes a genuine PCM16 WAV (sample(i) = (doc_id*7+i) %
    200 - 100, 128 frames), encoded then decoded by the pure-stdlib
    RIFF codec (ops/wav.py) inside mapInPandas; per-window energies are
    compared as exact integer sums of squares against DuckDB computing
    the closed form."""
    from graphraft_spark.ops.wav import wav_encode, wav_window_energy

    d = load_pq(spark, f"{sf_dir}/documents.parquet")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                wav_encode([(int(doc_id) * 7 + i) % 200 - 100
                            for i in range(128)])
                for doc_id in pdf["doc_id"]]
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = d.select("doc_id").mapInPandas(
        encode, schema="media_id bigint, payload binary")
    feats = extract_features(
        media.select("media_id", F.lit("audio").alias("kind"), "payload"),
        decode_fn=lambda p: wav_window_energy(p, n_windows=2))
    # feature[i] = sq_sum / 64 / 32768^2; recover the exact integer sum
    win = [F.round(F.element_at("feature", i + 1) * 64 * 32768 * 32768, 0)
           .cast("bigint") for i in range(2)]
    return feats.select("media_id", win[0].alias("w0"), win[1].alias("w1"))


@register(
    "mm_avi_frames", extra=True,
    oracle="""
SELECT doc_id AS media_id, CAST(f.range AS BIGINT) AS frame_idx,
       CAST(SUM((d.doc_id * 7 + f.range * 13 + i.range) % 256)
            AS BIGINT) AS psum
FROM documents d, range(4) f, range(24) i
WHERE f.range < (d.doc_id % 3) + 2 AND f.range % 2 = 0
GROUP BY doc_id, f.range
""")
def mm_avi_frames(spark, sf_dir):
    """REAL video decode in-pipeline, oracle-checked on CONTENT: each
    document becomes a genuine uncompressed AVI (4x2 RGB24,
    (doc_id % 3)+2 frames, channel i of frame f = (doc_id*7+f*13+i) %
    256), encoded then frame-SAMPLED (every 2nd frame, skipped frames'
    pixel data never decoded) by the pure-stdlib RIFF codec
    (ops/avi.py) inside mapInPandas; per-frame pixel sums compared as
    exact integers against DuckDB's closed form.  Completes the third
    modality: images (PNG), audio (WAV), video (uncompressed AVI) all
    genuinely decoded; only compressed codecs stay behind the
    production-ffmpeg seam."""
    from graphraft_spark.ops.avi import avi_encode, avi_frame_iter

    d = load_pq(spark, f"{sf_dir}/documents.parquet")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = did % 3 + 2
                frames = [bytes((did * 7 + f * 13 + i) % 256
                                for i in range(4 * 2 * 3))
                          for f in range(n)]
                blob = avi_encode(frames, 4, 2)
                for idx, rgb in avi_frame_iter(blob, every_n=2):
                    rows.append({"media_id": did, "frame_idx": idx,
                                 "psum": sum(rgb)})
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "psum"])

    return d.select("doc_id").mapInPandas(
        run, schema="media_id bigint, frame_idx bigint, psum bigint")


@register(
    "mm_png_resize",  # promoted r12 (seventh wave)
    oracle="""
SELECT doc_id AS media_id,
       CAST(ty.range * 4 + tx.range AS INT) AS pos,
       CAST((doc_id * 31 + (tx.range * 4) + 7 * (ty.range * 4)) % 256
            AS BIGINT) AS val
FROM documents d, range(4) tx, range(4) ty
""")
def mm_png_resize(spark, sf_dir):
    """REAL image RESIZE in-pipeline, oracle-checked on CONTENT: the
    same synthetic 16x16 PNGs as mm_png_feature (pixel(x,y) =
    (doc_id*31 + x + 7y) % 256, all five scanline filters), decoded
    and nearest-neighbor resampled to 4x4 by the pure-stdlib codec
    (ops/png.py png_resize_nearest, src = floor(dst*in/out)) inside
    Arrow-batched mapInPandas — the thumbnail/low-res-tower
    preprocessing step of a multimodal pipeline.  The oracle computes
    the same sampled pixels from the closed form (16/4 = exact stride
    4), so any wrong byte in encode -> decode -> resample fails the
    value hash."""
    from graphraft_spark.ops.png import png_encode, png_resize_nearest

    d = load_pq(spark, f"{sf_dir}/documents.parquet")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                px = bytes((int(doc_id) * 31 + x + 7 * y) % 256
                           for y in range(16) for x in range(16))
                payloads.append(png_encode(16, 16, px, color_type=0,
                                           filters=[0, 1, 2, 3, 4]))
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = d.select("doc_id").mapInPandas(
        encode, schema="media_id bigint, payload binary")
    feats = extract_features(
        media.select("media_id", F.lit("image").alias("kind"), "payload"),
        decode_fn=lambda p: png_resize_nearest(p, 4, 4))
    return (feats.select("media_id",
                         F.posexplode("feature").alias("pos", "v"))
            .select("media_id", F.col("pos").cast("int").alias("pos"),
                    F.round(F.col("v") * 255, 0).cast("bigint")
                    .alias("val")))


@register(
    "mm_wav_resample",  # promoted r12 (seventh wave)
    oracle="""
SELECT doc_id AS media_id, CAST(t.range AS INT) AS pos,
       CAST((doc_id * 7 + (t.range * 8)) % 200 - 100 AS BIGINT) AS val
FROM documents d, range(16) t
""")
def mm_wav_resample(spark, sf_dir):
    """REAL audio RESAMPLE in-pipeline, oracle-checked on CONTENT: the
    same synthetic 128-frame PCM16 WAVs as mm_wav_energy, decoded and
    nearest-neighbor decimated to 16 frames by the pure-stdlib codec
    (ops/wav.py wav_resample_nearest, exact stride 128/16 = 8) inside
    mapInPandas — sample-rate conversion, the audio twin of the
    mm_png_resize thumbnail step.  The oracle computes the same
    decimated samples from the closed form, so any wrong byte in
    encode -> decode -> decimate fails the value hash."""
    from graphraft_spark.ops.wav import wav_encode, wav_resample_nearest

    d = load_pq(spark, f"{sf_dir}/documents.parquet")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                wav_encode([(int(doc_id) * 7 + i) % 200 - 100
                            for i in range(128)])
                for doc_id in pdf["doc_id"]]
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = d.select("doc_id").mapInPandas(
        encode, schema="media_id bigint, payload binary")
    feats = extract_features(
        media.select("media_id", F.lit("audio").alias("kind"), "payload"),
        decode_fn=lambda p: wav_resample_nearest(p, 16))
    return (feats.select("media_id",
                         F.posexplode("feature").alias("pos", "v"))
            .select("media_id", F.col("pos").cast("int").alias("pos"),
                    F.round(F.col("v") * 32768, 0).cast("bigint")
                    .alias("val")))


@register(
    "mm_scene_cuts",  # promoted r13 (lands graded)
    oracle="""
WITH e AS (
    SELECT doc_id, f.range AS frame_idx,
           CAST(3 * SUM((doc_id * 7) % 120 + (tx.range + ty.range) % 40
                        + CASE WHEN f.range >= 2 + doc_id % 3
                               THEN 60 ELSE 0 END)
                AS DOUBLE) / 768 / 255 AS energy
    FROM documents, range(6) f, range(16) tx, range(16) ty
    GROUP BY doc_id, f.range
)
SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
       -- the decode seam carries float32 features; quantize through
       -- REAL so both engines round the identical double
       ROUND(CAST(CAST(energy AS REAL) AS DOUBLE), 6) AS energy,
       COALESCE(energy - LAG(energy) OVER (PARTITION BY doc_id
                                           ORDER BY frame_idx) > 0.1,
                FALSE) AS is_cut
FROM e
""")
def mm_scene_cuts(spark, sf_dir):
    """Scene-cut detection over per-frame energies — the KEYFRAME
    SELECTION step of a video training pipeline (sample one frame per
    shot, not per second): each document becomes a genuine 6-frame
    16x16 AVI with a PLANTED cut at frame 2 + doc%3 (pixel(x,y,f) =
    doc*7 % 120 + (x+y) % 40, +60 from the cut frame on — a brightness
    jump of 60/255 ~ 0.235, far from the 0.1 threshold on both sides);
    ops/avi.py avi_frame_energy decodes every frame's mean intensity
    inside the codec seam, and the cut flag is a per-clip previous-
    frame comparison on the ARRAY (element_at — no window, no shuffle:
    each clip's energies arrive as one row).  The oracle computes the
    same integer pixel sums and the identical division order, so
    energies match bitwise and the threshold cannot straddle."""
    from graphraft_spark.ops.avi import avi_encode, avi_frame_energy

    d = load_pq(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                s = int(doc_id)
                c = 2 + s % 3
                frames = []
                for f in range(6):
                    grey = [(s * 7) % 120 + (x + y) % 40
                            + (60 if f >= c else 0)
                            for y in range(16) for x in range(16)]
                    frames.append(bytes(v for v in grey for _ in range(3)))
                payloads.append(avi_encode(frames, 16, 16))
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = d.repartition(n, F.col("doc_id")).mapInPandas(
        encode, schema="media_id bigint, payload binary")
    feats = extract_features(
        media.select("media_id", F.lit("video").alias("kind"), "payload"),
        decode_fn=lambda p: avi_frame_energy(p, every_n=1))
    out = feats.select(
        "media_id", "feature",
        F.posexplode("feature").alias("pos", "energy"))
    is_cut = F.when(F.col("pos") == 0, F.lit(False)).otherwise(
        (F.col("energy")
         - F.element_at("feature", F.col("pos").cast("int"))) > 0.1)
    return out.select("media_id",
                      F.col("pos").cast("int").alias("frame_idx"),
                      F.round(F.col("energy").cast("double"), 6)
                      .alias("energy"),
                      is_cut.alias("is_cut"))
