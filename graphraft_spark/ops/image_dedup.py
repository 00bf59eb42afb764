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
    out-of-range comparisons and poison the packed words;
    wav_resample_nearest(p, 65) guarantees exactly 65 (zero-padding
    empty clips)."""
    px = F.transform(F.col(feature_col),
                     lambda v: F.round(v * scale, 0).cast("bigint"))
    idx = F.sequence(F.lit(0), F.lit(63))
    bits = F.transform(
        idx, lambda i: (F.element_at(px, (i + 2).cast("int"))
                        > F.element_at(px, (i + 1).cast("int"))
                        ).cast("int"))
    out = df.withColumn("_bits", bits)
    return (out.withColumn(f"{prefix}0", _pack_word(F.col("_bits"), 0))
            .withColumn(f"{prefix}1", _pack_word(F.col("_bits"), 1))
            .drop("_bits"))


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
                        max_bucket_size: int | None = None) -> DataFrame:
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
    as minhash LSH's cap (ops/dedup.py)."""
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
    star = None
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        tagged = banded.select(
            "id", *ws, "band", "bucket",
            F.count("*").over(w).alias("bsz"),
            # min-id member's (id, words...) — the star root with words
            F.min(F.struct("id", *ws)).over(w).alias("root"))
        star = (tagged.filter((F.col("bsz") > max_bucket_size)
                              & (F.col("id") != F.col("root.id")))
                .select(F.col("root.id").alias("id_a"),
                        F.col("id").alias("id_b"),
                        *[F.col(f"root.{w}").alias(f"{w}a") for w in ws],
                        *[F.col(w).alias(f"{w}b") for w in ws]))
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
    # distinct on the pair: the word columns are functionally dependent
    # on the ids, so including them cannot widen the key
    cand = cand.distinct()
    dist = sum((hamming(F.col(f"{w}a"), F.col(f"{w}b"), WORD_BITS)
                for w in ws[1:]),
               hamming(F.col(f"{ws[0]}a"), F.col(f"{ws[0]}b"), WORD_BITS))
    return (cand.withColumn("dist", dist)
            .filter(F.col("dist") <= max_dist)
            .select("id_a", "id_b", F.col("dist").cast("int").alias("dist")))
