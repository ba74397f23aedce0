"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Designed for the 100 TB training-data path:

- exact_dedup        — one hash-aggregate shuffle on the fingerprint.
- ngram_jaccard_pairs— exact near-dup pairs via shingle explode + equi
                       self-join; quadratic in bucket size, so it's the
                       *verification* stage, run on LSH candidates at scale.
- minhash_signatures / lsh_candidate_pairs — the scale path: signature is a
  per-doc aggregate (linear), banding turns near-dup search into an
  equi-join on (band, band_key) — no pairwise comparison outside buckets.
- simhash            — 32-bit hex-digit SimHash; hamming-style near-dup via
                       band equality.

Hashing is md5-string based (not xxhash64) so every stage is byte-identical
in ANSI SQL — each operator here has a DuckDB oracle. Lexicographic min over
md5 hex strings is a valid uniform min-hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from impc_etl_spark.operators.text import fingerprint, tokens, word_shingles


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep one representative (min id) per identical document.

    ``normalize=True`` collapses whitespace/punctuation variants via the
    canonical fingerprint; False uses the raw text bytes. Single shuffle;
    at scale group on the 128-bit fingerprint, never the raw text (shuffle
    keys stay 16 bytes instead of document-sized).
    """
    key = fingerprint(text_col) if normalize else F.md5(F.col(text_col))
    return (
        df.withColumn("__fp", key)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__fp")
    )


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(id, shingle) pairs, distinct — the shared base for jaccard/minhash."""
    return (
        df.select(F.col(id_col), F.explode(word_shingles(tokens(text_col), k)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard-over-k-shingles near-duplicate pairs (a < b).

    jaccard = |A∩B| / (|A|+|B|-|A∩B|), computed by exploding distinct
    shingles, equi-self-joining on shingle, and counting matches — the
    classic SQL formulation. The shingle join is the quadratic step: at
    scale, run it per LSH bucket (see lsh_candidate_pairs) instead of
    globally.
    """
    sh = shingle_table(df, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 12,
) -> DataFrame:
    """Per-doc MinHash signature: for seed s, min over shingles of
    md5(s ‖ ':' ‖ shingle) (lexicographic min of hex strings).

    Linear in corpus size: explode shingles once, aggregate num_hashes mins
    in ONE groupBy pass (no per-seed shuffle). Docs with no shingles are
    dropped (they can't near-dup match anything).
    """
    sh = shingle_table(df, text_col, id_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"mh_{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b), distinct.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows; band
    key = md5 of the concatenated mins. Docs sharing ANY band key become a
    candidate pair — an equi-join on (band, band_key), which Spark executes
    as a hash join; no pairwise scan. Tune (num_hashes, bands) for the
    target similarity threshold ~ (1/bands)^(bands/num_hashes).

    At 100 TB: candidate generation is shuffle-bound on band keys; giant
    buckets (boilerplate docs) should be capped or salted before the join —
    compose with `ngram_jaccard_pairs` on the candidates to verify.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes)
    band_entries = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_entries.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("band_key")))
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_entries)).alias("bk")
    ).select(id_col, "bk.band", "bk.band_key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def _hex_digit_value(c: Column) -> Column:
    """Value 0-15 of one lowercase hex digit via position arithmetic —
    portable to ANSI SQL (no engine-specific hex parse)."""
    return F.instr(F.lit("0123456789abcdef"), c) - 1


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash over unigram tokens: per token, md5 → first bits/4 hex digits;
    each bit votes ±1; sign of the sum is the output bit. Returns
    (id, simhash) with the hash as a bits-length bitstring column.

    One explode + one groupBy — linear. Near-dup = small hamming distance;
    pair search at scale goes through band equality on substrings of the
    bitstring (same LSH trick as minhash).
    """
    ndigits = bits // 4
    toks = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .withColumn("h", F.substring(F.md5(F.col("tok")), 1, ndigits))
    )
    # vote per bit: digit d (0..ndigits-1), bit j (0..3): +1 if set else -1
    bit_votes = [
        F.sum(
            F.when(
                ((_hex_digit_value(F.substring(F.col("h"), d + 1, 1))
                  .bitwiseAND(F.lit(1 << j))) > 0),
                1,
            ).otherwise(-1)
        ).alias(f"b_{d * 4 + j}")
        for d in range(ndigits)
        for j in (3, 2, 1, 0)
    ]
    votes = toks.groupBy(id_col).agg(*bit_votes)
    bitstr = F.concat(*[
        F.when(F.col(f"b_{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ])
    return votes.select(F.col(id_col), bitstr.alias("simhash"))
