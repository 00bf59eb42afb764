"""Image near-dup dedup: perceptual hashing + Hamming-banded blocking.

A crawl pipeline dedups images BEFORE captioning/training: re-encoded
copies (same pixels, different bytes — filters, compressor level) and
lightly-edited copies (uniform brightness shift) must land in one
cluster while distinct images stay apart.  Byte-level hashing can't do
that; perceptual hashes over a tiny luma thumbnail can:

* aHash — bit i set iff thumbnail pixel i is above the thumbnail mean.
  Exactly invariant to uniform additive brightness shifts (mean moves
  with the pixels) as long as no pixel clips.
* dHash — bit set iff the right neighbor is brighter (horizontal
  gradient sign over a (w+1)×h thumbnail).  Invariant to ANY monotone
  per-pixel tone curve, additive or not.

Both consume the engine's OWN decode seam: ``extract_features(...,
decode_fn=png_resize_nearest(p, 8, 8))`` (ops/png.py) yields the
64-float luma thumbnail; the hash is pure JVM column arithmetic from
there — integer-exact (bits compare ``64·px > Σpx`` on recovered
0–255 ints, never float means).

Blocking is the simhash recipe (ops/dedup.py): split the 64-bit hash
into ``bands`` fixed windows; by pigeonhole any pair within Hamming
distance ``< bands`` agrees on at least one whole band, so an
equi-join on (band, value) finds EVERY such pair — no all-pairs join
ever — and an exact Hamming verify within buckets keeps precision 1.
At 100 TB the banded frame is the only shuffle (4 rows per image,
hash-partitioned on 16-bit band values) and hot buckets (boilerplate
logos, solid-color fills) are capped with star edges to the bucket
root, same as minhash LSH.

Scale honesty — candidate volume: with B-bit bands, hash-UNIFORM
corpora produce ~N²/2^(B+1) birthday-collision candidates per band
(each verified with two cheap XORs).  16-bit bands are the canonical
multi-index split for a 64-bit hash at dist ≤ 3 (bands > dist is
forced), and they carry ~10⁸ images comfortably — but at 10⁹+ the N²
term dominates regardless of skew.  The scale path is NOT different
blocking, it is a WIDER fingerprint: a 256-bit pHash is 8 words
through this same module (``hash_bands`` and ``image_neardup_pairs``
generalize over the word list — tested at 128 bits), giving 32-bit
windows (2³² buckets) at dist ≤ 7 — the birthday floor moves to
~N²/2³³ per band, past any real corpus.  The r12 soak (BASELINE.md)
measures the 64-bit behavior explicitly.

Reference parity: the reference has no image pipeline at all (its
media handling is out-of-engine); this follows SURVEY.md's
training-data-pipeline mandate — the image twin of ``simhash``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from graphraft_spark.ops.dedup import hamming

#: 64-bit hashes are carried as two 32-bit words — Spark's bigint
#: arithmetic in ``hamming`` is exact only below 2^52.
WORD_BITS = 32


def _luma_ints(feature: Column) -> Column:
    """Recover exact 0–255 ints from the decode seam's v = luma/255
    floats (round-trips exactly: 255 · k/255 rounds back to k)."""
    return F.transform(feature, lambda v: F.round(v * 255, 0)
                       .cast("bigint"))


def _pack_word(bits: Column, word: int) -> Column:
    """bits[32·word .. 32·word+31] → one bigint (bit j = 2^j)."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(WORD_BITS - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, j: acc + F.element_at(
            bits, (j + word * WORD_BITS + 1).cast("int")).cast("bigint")
        * F.pow(F.lit(2.0), j.cast("double")).cast("bigint"))


def image_ahash_words(df: DataFrame, feature_col: str = "feature",
                      prefix: str = "h") -> DataFrame:
    """Append aHash columns ``{prefix}0``/``{prefix}1`` (two 32-bit
    words, 64 bits total) computed from an 8×8 luma thumbnail column
    (array<double> of 64, the ``png_resize_nearest(p, 8, 8)`` decode
    contract).  Bit i = 1 iff ``64·px[i] > Σpx`` — integer-exact, ties
    break to 0, uniform brightness shifts cancel."""
    out = (df.withColumn("_px", _luma_ints(F.col(feature_col)))
           .withColumn("_s", F.aggregate(
               "_px", F.lit(0).cast("bigint"), lambda a, x: a + x))
           .withColumn("_bits", F.transform(
               "_px", lambda v: (v * 64 > F.col("_s")).cast("int"))))
    return (out.withColumn(f"{prefix}0", _pack_word(F.col("_bits"), 0))
            .withColumn(f"{prefix}1", _pack_word(F.col("_bits"), 1))
            .drop("_px", "_s", "_bits"))


def image_dhash_words(df: DataFrame, feature_col: str = "feature",
                      prefix: str = "h") -> DataFrame:
    """Append dHash columns from a 9×8 luma thumbnail (array<double>
    of 72, row-major, the ``png_resize_nearest(p, 9, 8)`` contract):
    bit (y·8+x) = 1 iff px[y·9+x+1] > px[y·9+x] — 8 horizontal
    gradient signs per row × 8 rows = 64 bits, invariant to any
    monotone tone curve."""
    px = _luma_ints(F.col(feature_col))
    idx = F.sequence(F.lit(0), F.lit(63))
    bits = F.transform(
        idx, lambda i: (
            F.element_at(px, (F.floor(i / 8) * 9 + i % 8 + 2).cast("int"))
            > F.element_at(px, (F.floor(i / 8) * 9 + i % 8 + 1).cast("int"))
        ).cast("int"))
    out = df.withColumn("_bits", bits)
    return (out.withColumn(f"{prefix}0", _pack_word(F.col("_bits"), 0))
            .withColumn(f"{prefix}1", _pack_word(F.col("_bits"), 1))
            .drop("_bits"))


def gradient_sign_words(df: DataFrame, feature_col: str = "feature",
                        prefix: str = "h",
                        scale: int = 32768) -> DataFrame:
    """Append a 64-bit derivative-sign fingerprint (two 32-bit words)
    over a 65-sample 1-D sequence column: bit i = 1 iff
    sample[i+1] > sample[i] — invariant to positive GAIN and DC OFFSET
    (both cancel in the differences), the audio twin of
    :func:`image_dhash_words` (a loudness-normalized or re-levelled
    copy of a clip fingerprints identically).  ``scale`` recovers
    exact ints from the decode seam's normalized floats (32768 for the
    PCM16 contract of ops/wav.py wav_resample_nearest; 255 for
    luma).  The sequence must have ≥ 65 samples — fewer would null the
    out-of-range comparisons and poison the packed words, so the
    contract is ENFORCED: a shorter sequence raises at execution
    instead of silently nulling the fingerprint (r12 advice);
    wav_resample_nearest(p, 65) guarantees exactly 65 (zero-padding
    empty clips)."""
    seq = F.when(
        F.size(F.col(feature_col)) >= 65, F.col(feature_col)
    ).otherwise(F.raise_error(F.concat(
        F.lit("gradient_sign_words: sequence must have >= 65 samples; "
              "got "),
        F.size(F.col(feature_col)).cast("string"))))
    px = F.transform(seq, lambda v: F.round(v * scale, 0).cast("bigint"))
    idx = F.sequence(F.lit(0), F.lit(63))
    bits = F.transform(
        idx, lambda i: (F.element_at(px, (i + 2).cast("int"))
                        > F.element_at(px, (i + 1).cast("int"))
                        ).cast("int"))
    out = df.withColumn("_bits", bits)
    return (out.withColumn(f"{prefix}0", _pack_word(F.col("_bits"), 0))
            .withColumn(f"{prefix}1", _pack_word(F.col("_bits"), 1))
            .drop("_bits"))


def video_ahash_words(df: DataFrame, feature_col: str = "feature",
                      tiles: int = 2, prefix: str = "h") -> DataFrame:
    """Append a (64·``tiles``)-bit CLIP fingerprint (2·``tiles``
    32-bit words ``{prefix}0..{prefix}{2·tiles-1}``) over a
    concatenated sampled-frame thumbnail column — the ops/avi.py
    ``avi_clip_thumbs(p, every_n, 8, 8, max_frames=tiles)`` decode
    contract (array<double> of 64·tiles, one 8×8 luma plane per
    sampled frame in frame order).  Tile t gets its OWN aHash: bit i
    of frame t compares ``64·px[i] > Σ(frame t's px)`` — per-frame
    means, so a uniform brightness shift applied to any subset of
    frames cancels frame-locally, exactly like the single-image
    :func:`image_ahash_words`.  Word 2t|2t+1 = frame t's low|high
    word, so Hamming distance over the word list decomposes as the
    SUM of per-sampled-frame aHash distances — the clip analog of a
    wider fingerprint, feeding the same :func:`hash_bands` /
    :func:`image_neardup_pairs` banded dataflow (4 words → bands=8 →
    16-bit windows, pigeonhole-exact to dist ≤ 7).  The feature must
    have ≥ 64·tiles samples (clips shorter than the sampling window
    under-fill the fingerprint); enforced with raise_error rather
    than silently nulling the packed words (same contract class as
    gradient_sign_words' guard)."""
    need = 64 * tiles
    checked = F.when(
        F.size(F.col(feature_col)) >= need, F.col(feature_col)
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"video_ahash_words: feature must have >= {need} "
              "samples (64 per sampled frame); got "),
        F.size(F.col(feature_col)).cast("string"))))
    out = df.withColumn("_px_all", _luma_ints(checked))
    for t in range(tiles):
        tile = F.slice(F.col("_px_all"), t * 64 + 1, 64)
        out = (out.withColumn("_px", tile)
               .withColumn("_s", F.aggregate(
                   "_px", F.lit(0).cast("bigint"), lambda a, x: a + x))
               .withColumn("_bits", F.transform(
                   "_px", lambda v: (v * 64 > F.col("_s")).cast("int")))
               .withColumn(f"{prefix}{2 * t}",
                           _pack_word(F.col("_bits"), 0))
               .withColumn(f"{prefix}{2 * t + 1}",
                           _pack_word(F.col("_bits"), 1)))
    return out.drop("_px_all", "_px", "_s", "_bits")


def clip_frame_match_pairs(hashed: DataFrame, id_col: str = "id",
                           frame_col: str = "frame_idx",
                           word_cols: tuple[str, ...] = ("h0", "h1"),
                           max_dist: int = 3, bands: int = 4,
                           min_frames: int = 3) -> DataFrame:
    """Temporally-shifted (TRIMMED) clip detection: a clip missing its
    first frames fingerprints differently under the fixed sampled-frame
    recipe (video_ahash_words — every sampled index shifts), so this
    matcher works at FRAME granularity instead: ``hashed`` carries one
    row per (clip ``id_col``, ``frame_col``) with per-frame hash words;
    frames band/bucket exactly like single images (pigeonhole-exact
    per-frame recall for dist ≤ max_dist), candidate frame pairs join
    across DIFFERENT clips only, and clip pairs aggregate
    ``matched_frames`` = count of distinct (frame_a, frame_b) matches,
    flagged ``is_dup`` at ≥ ``min_frames`` — containment semantics (a
    3-frame trim of a 4-frame clip matches 3 of 4), the video analog
    of ops/dedup.py asymmetric containment.  Returns (id_a, id_b,
    matched_frames, is_dup); pairs with zero matching frames are
    absent.  Scale shape: the banded equi-join is the only shuffle
    (``bands`` rows per FRAME), the clip-pair aggregate map-side
    combines — never an all-pairs join over clips or frames."""
    if bands <= max_dist:
        raise ValueError(
            f"pigeonhole needs bands > max_dist for exact per-frame "
            f"recall; got bands={bands}, max_dist={max_dist}")
    k = len(word_cols)
    ws = [f"w{i}" for i in range(k)]
    s = hashed.select(F.col(id_col).alias("id"),
                      F.col(frame_col).alias("f"),
                      *[F.col(c).alias(w)
                        for c, w in zip(word_cols, ws)])
    banded = (s.select("id", "f", *ws, F.explode(
        hash_bands([F.col(w) for w in ws], bands)).alias("bb"))
        .select("id", "f", *ws, F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket")))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("a.f").alias("fa"),
                    F.col("b.id").alias("id_b"),
                    F.col("b.f").alias("fb"),
                    *[F.col(f"a.{w}").alias(f"{w}a") for w in ws],
                    *[F.col(f"b.{w}").alias(f"{w}b") for w in ws])
            .distinct())
    dist = sum((hamming(F.col(f"{w}a"), F.col(f"{w}b"), WORD_BITS)
                for w in ws[1:]),
               hamming(F.col(f"{ws[0]}a"), F.col(f"{ws[0]}b"),
                       WORD_BITS))
    matched = (cand.filter(dist <= max_dist)
               .groupBy("id_a", "id_b")
               .agg(F.count("*").alias("matched_frames")))
    return matched.select(
        "id_a", "id_b",
        F.col("matched_frames").cast("int").alias("matched_frames"),
        (F.col("matched_frames") >= min_frames).alias("is_dup"))


def hash_bands(words: list[Column] | tuple[Column, ...],
               bands: int) -> Column:
    """Split a (32·len(words))-bit fingerprint (word 0 = lowest bits)
    into ``bands`` equal windows: ARRAY<STRUCT<band INT,
    bucket BIGINT>>.  ``bands`` must divide the total bit count into
    windows whose width divides 32 (each window stays inside one
    word): the 64-bit default with bands=4 gives 16-bit windows; a
    256-bit pHash (8 words) with bands=8 gives 32-bit windows (2³²
    buckets) — the wider-fingerprint scale path in the module
    docstring."""
    total = WORD_BITS * len(words)
    if (bands <= 0 or total % bands
            or (total // bands) > WORD_BITS
            or WORD_BITS % (total // bands)):
        raise ValueError(
            f"bands must divide {total} bits into windows of width "
            f"dividing {WORD_BITS}; got bands={bands}")
    width = total // bands
    per_word = WORD_BITS // width
    out = []
    for j in range(bands):
        word = words[j // per_word]
        off = (j % per_word) * width
        val = (F.floor(word / F.lit(float(1 << off))).cast("bigint")
               % F.lit(1 << width))
        out.append(F.struct(F.lit(j).alias("band"), val.alias("bucket")))
    return F.array(*out)


def image_neardup_pairs(hashed: DataFrame, id_col: str = "id",
                        word_cols: tuple[str, ...] = ("h0", "h1"),
                        max_dist: int = 3, bands: int = 4,
                        max_bucket_size: int | None = None,
                        repair_capped: bool = False) -> DataFrame:
    """Near-dup image pairs (id_a < id_b, dist ≤ ``max_dist``) from a
    hashed frame.  Pigeonhole requires ``bands > max_dist`` — then the
    banded equi-join is RECALL-EXACT (uncapped): the output equals the
    all-pairs Hamming filter, without the all-pairs join.

    ``max_bucket_size``: hot buckets (near-identical floods — the
    image analog of boilerplate) are replaced by star edges to the
    bucket root before the quadratic within-bucket join; star edges
    still pass the exact Hamming verify, so precision stays 1 and
    identical-image floods stay clustered, while a genuinely diverse
    hot bucket trades recall for the bounded work — the same contract
    as minhash LSH's cap (ops/dedup.py).

    ``repair_capped`` closes the star-edge recall gap at the COMPONENT
    level, mirroring the minhash repair (ops/dedup.py
    _lsh_verified_pairs): capped-bucket members whose star link to the
    root FAILS the Hamming verify are re-paired with every bucket-mate
    and re-verified.  For any same-bucket pair (X, Y) with
    dist ≤ max_dist, either both root links passed (path X–root–Y
    survives) or a failed endpoint was re-paired with the other
    directly — so connected components over the capped+repaired pairs
    equal components over the uncapped output.  Unlike the minhash
    repair this stays fully LAZY (the verify is pure column
    arithmetic, not a join back to shingle arrays); pass a
    pre-materialized ``hashed`` (e.g. localCheckpointed fingerprints)
    when the decode subtree is expensive, since the repair path
    references the banded frame three extra times."""
    if bands <= max_dist:
        raise ValueError(
            f"pigeonhole needs bands > max_dist for exact recall; "
            f"got bands={bands}, max_dist={max_dist}")
    k = len(word_cols)
    ws = [f"w{i}" for i in range(k)]
    s = hashed.select(F.col(id_col).alias("id"),
                      *[F.col(c).alias(w) for c, w in zip(word_cols, ws)])
    # the hash words RIDE ALONG through the banding explode (`bands`
    # rows × k extra bigints per image — negligible) so the
    # within-bucket verify needs NO join back to the hashed frame: the
    # upstream decode/hash subtree is referenced exactly twice (the
    # self-join's two sides), not four times
    banded = (s.select("id", *ws, F.explode(
        hash_bands([F.col(w) for w in ws], bands)).alias("bb"))
        .select("id", *ws, F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket")))
    star = repair = None
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        tagged = banded.select(
            "id", *ws, "band", "bucket",
            F.count("*").over(w).alias("bsz"),
            # min-id member's (id, words...) — the star root with words
            F.min(F.struct("id", *ws)).over(w).alias("root"))
        members = tagged.filter(F.col("bsz") > max_bucket_size)
        star = (members.filter(F.col("id") != F.col("root.id"))
                .select(F.col("root.id").alias("id_a"),
                        F.col("id").alias("id_b"),
                        *[F.col(f"root.{w}").alias(f"{w}a") for w in ws],
                        *[F.col(w).alias(f"{w}b") for w in ws]))
        if repair_capped:
            star_dist = sum(
                (hamming(F.col(f"root.{w}"), F.col(w), WORD_BITS)
                 for w in ws[1:]),
                hamming(F.col(f"root.{ws[0]}"), F.col(ws[0]), WORD_BITS))
            at_risk = (members
                       .filter((F.col("id") != F.col("root.id"))
                               & (star_dist > max_dist))
                       .select("band", "bucket",
                               F.col("id").alias("rid"),
                               *[F.col(w).alias(f"_r_{w}") for w in ws]))
            mates = members.select("band", "bucket",
                                   F.col("id").alias("mid"),
                                   *[F.col(w).alias(f"_m_{w}") for w in ws])
            rp = (at_risk.join(mates, ["band", "bucket"])
                  .filter(F.col("rid") != F.col("mid")))
            lo = F.col("rid") < F.col("mid")
            repair = rp.select(
                F.least("rid", "mid").alias("id_a"),
                F.greatest("rid", "mid").alias("id_b"),
                *[F.when(lo, F.col(f"_r_{w}")).otherwise(F.col(f"_m_{w}"))
                  .alias(f"{w}a") for w in ws],
                *[F.when(lo, F.col(f"_m_{w}")).otherwise(F.col(f"_r_{w}"))
                  .alias(f"{w}b") for w in ws])
        banded = tagged.filter(F.col("bsz") <= max_bucket_size) \
            .select("id", *ws, "band", "bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    *[F.col(f"a.{w}").alias(f"{w}a") for w in ws],
                    *[F.col(f"b.{w}").alias(f"{w}b") for w in ws]))
    if star is not None:
        cand = cand.unionByName(star)
    if repair is not None:
        cand = cand.unionByName(repair)
    # distinct on the pair: the word columns are functionally dependent
    # on the ids, so including them cannot widen the key
    cand = cand.distinct()
    dist = sum((hamming(F.col(f"{w}a"), F.col(f"{w}b"), WORD_BITS)
                for w in ws[1:]),
               hamming(F.col(f"{ws[0]}a"), F.col(f"{ws[0]}b"), WORD_BITS))
    return (cand.withColumn("dist", dist)
            .filter(F.col("dist") <= max_dist)
            .select("id_a", "id_b", F.col("dist").cast("int").alias("dist")))
