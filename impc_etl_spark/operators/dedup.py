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

Hashing is md5 based (not xxhash64) so every stage is byte-identical
in ANSI SQL — each operator here has a DuckDB oracle. Lexicographic min over
md5 hex strings is a valid uniform min-hash. Where the hash stays INTERNAL
(span-dedup grouping keys that never reach output or oracle), the 16-byte
BINARY form ``unhex(md5(...))`` is used instead of the 32-char hex string —
same grouping, half the bytes on every exchange (r9: this plus pinned
derived widths took the sf30-equivalent span-dedup exchanges from
9.1 GB shuffle / 8.7 GB spill to 4.7 GB / zero spill).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from impc_etl_spark.operators.partitioning import (
    advisory_mb, fan_out, shuffle_partitions_for,
)
from impc_etl_spark.operators.text import re_escape
from impc_etl_spark.operators.text import bind, fingerprint, tokens, word_shingles


def _bucket_pairs(
    buckets: DataFrame, ids_col: str = "ids", max_bucket_size: int | None = None
) -> DataFrame:
    """Expand each bucket's sorted id array into ordered pairs (a < b).

    Row-local combination generation (`transform` over indices) — replaces
    the classic equi-self-join, which evaluates the bucket-building plan
    twice and shuffles both sides. Output columns: doc_a, doc_b.

    ``max_bucket_size`` is the mega-bucket guard: buckets larger than it
    (boilerplate documents — at web scale a single template can put 10⁶
    docs in one bucket, making quadratic expansion fatal) emit STAR edges
    (min id ↔ every other id, O(n) per bucket) instead of all O(n²) pairs.
    A star keeps every member connected to the bucket representative, so
    connected-components dup-group assignment is unchanged; only per-pair
    completeness within the giant bucket is given up.
    """
    ids = F.col(ids_col)
    if max_bucket_size is not None:
        # Capped callers: per-row pair arrays are bounded by
        # C(max_bucket_size, 2) structs (the star branch by O(n)), so the
        # single-pass flat expansion is memory-safe AND fastest — the
        # two-level form below measured ×1.1-1.15 on the capped headline
        # LSH queries (r11 A/B: duplicate of the ids array per anchor row
        # through an extra Generate buys nothing when arrays are small).
        all_pairs = F.flatten(
            F.transform(
                ids,
                lambda a, i: F.transform(
                    F.slice(ids, i + F.lit(2), F.size(ids)),
                    lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
                ),
            )
        )
        star = F.transform(
            F.slice(ids, 2, F.size(ids)),
            lambda b: F.struct(F.element_at(ids, 1).alias("doc_a"), b.alias("doc_b")),
        )
        pairs = F.when(F.size(ids) > max_bucket_size, star).otherwise(all_pairs)
        return buckets.select(F.explode(pairs).alias("p")).select("p.doc_a", "p.doc_b")
    # Uncapped callers (r11): the flat form builds ONE C(n,2)-element
    # struct array per bucket row before exploding — for a 10⁴-id bucket
    # that is a multi-GB single allocation (executor heap OOM at the
    # sf10-equivalent rehearsal: 200 k vectors over a fixed 16-bucket
    # band space put ~1.2×10⁴ ids in every bucket). Exploding the anchor
    # index FIRST and the per-anchor tail SECOND yields the IDENTICAL
    # pair multiset while the biggest in-flight value is the bucket's id
    # array itself (O(n) per row, streamed row-by-row by Generate).
    first = buckets.select(
        ids.alias("__ids"), F.posexplode(ids).alias("__i", "__a")
    )
    return first.select(
        F.col("__a").alias("doc_a"),
        F.explode(
            F.slice(F.col("__ids"), F.col("__i") + F.lit(2), F.size("__ids"))
        ).alias("doc_b"),
    )


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
        fan_out(df).withColumn("__fp", key)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__fp")
    )


def dedup_against_store(
    df: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    store_text_col: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """INCREMENTAL exact dedup: drop rows of ``df`` (today's batch) whose
    fingerprint already exists in ``store`` (the historical corpus /
    previous releases) — the daily-ingest companion of ``exact_dedup``,
    which only dedups within one frame.

    One anti join on 16-byte fingerprints: the store side reduces to its
    distinct fingerprint set first (store text never ships), the batch
    side hashes row-locally. The batch is typically ≪ store, so at scale
    persist the store's fingerprint set once and reuse it across daily
    runs instead of recomputing from raw text.
    """
    key = fingerprint(text_col) if normalize else F.md5(F.col(text_col))
    s_col = store_text_col or text_col
    s_key = fingerprint(s_col) if normalize else F.md5(F.col(s_col))
    seen = store.select(s_key.alias("__fp")).distinct()
    return (
        fan_out(df)
        .withColumn("__fp", key)
        .join(seen, "__fp", "left_anti")
        .drop("__fp")
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    out: str = "clean_text",
) -> DataFrame:
    """Corpus-wide segment (line/paragraph) dedup, C4-style: split every
    document on ``sep``, keep each distinct normalized segment only at its
    FIRST occurrence (min ``(id, position)`` across the whole corpus), and
    reassemble the surviving segments per document in original order.
    Documents whose every segment was seen earlier disappear entirely.

    This removes boilerplate (nav bars, cookie banners, license headers)
    that exact/near whole-doc dedup can't touch — the single highest-yield
    cleaning pass on web corpora after URL dedup.

    Scale shape: segments shuffle ONCE on ``md5(normalized segment)``
    (16-byte key, never the raw line) for an unordered window-min — a
    single exchange and a single evaluation of the explode, where the
    equivalent groupBy+self-join would ship the exploded corpus twice.
    Survivors shuffle back on the doc id for reassembly. Both exchanges
    are unavoidable for corpus-global first-occurrence semantics; no
    global-order window, no UDF.
    """
    from pyspark.sql import Window

    segs = (
        fan_out(df)
        .select(
            F.col(id_col),
            # sep is a LITERAL separator: escape it — F.split's second
            # argument is a regex, and e.g. sep='.' or '|' would
            # otherwise split on every character and shred the corpus
            F.posexplode(
                F.split(F.col(text_col), re_escape(sep))
            ).alias("__pos", "__seg"),
        )
        .where(F.trim(F.col("__seg")) != "")
        .withColumn("__key", F.md5(F.lower(F.trim(F.col("__seg")))))
    )
    w = Window.partitionBy("__key")
    kept = (
        segs.withColumn(
            "__first", F.min(F.struct(F.col(id_col), F.col("__pos"))).over(w)
        )
        .where(
            (F.col(id_col) == F.col(f"__first.{id_col}"))
            & (F.col("__pos") == F.col("__first.__pos"))
        )
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
                    lambda s: s["__seg"],
                ),
                sep,
            ).alias(out)
        )
    )


def strip_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_df_ratio: float = 0.05,
    min_df: int = 2,
    out: str = "clean_text",
) -> DataFrame:
    """Remove corpus-frequent segments (nav bars, cookie banners, license
    headers) from EVERY document: a line whose document frequency exceeds
    both ``min_df`` docs and ``max_df_ratio`` of the corpus is boilerplate
    and is dropped everywhere (RefinedWeb/C4-style line-frequency filter).

    Complements `line_dedup`: that keeps each duplicated line at its
    FIRST occurrence (corpus-global dedup); this removes high-frequency
    lines from ALL occurrences including the first (template removal).
    Documents reduced to nothing disappear.

    Scale shape: the doc-frequency table is computed over the DISTINCT
    (16-byte line hash, doc) projection — (hash, doc) pre-aggregation
    before the counting exchange, so a line repeated inside one doc
    counts once and raw text never shuffles. The frequency table is
    line-vocabulary-sized (≪ corpus) and joins back on the hash with
    map-side combine + AQE skew-splitting; survivors shuffle once on the
    doc id for in-order reassembly. Corpus total-docs rides a 1-row
    broadcast (BNL of a scalar frame, the allowlisted pattern).
    """
    segs = (
        fan_out(df)
        .select(
            F.col(id_col),
            # sep is a LITERAL separator: escape it — F.split's second
            # argument is a regex, and e.g. sep='.' or '|' would
            # otherwise split on every character and shred the corpus
            F.posexplode(
                F.split(F.col(text_col), re_escape(sep))
            ).alias("__pos", "__seg"),
        )
        .where(F.trim(F.col("__seg")) != "")
        .withColumn("__key", F.md5(F.lower(F.trim(F.col("__seg")))))
    )
    doc_freq = (
        segs.select("__key", id_col)
        .distinct()
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    n_docs = df.select(
        F.count(F.lit(1)).alias("__n")
    )
    flagged = (
        # merge hint: doc_freq is one row per distinct segment key —
        # data-sized; a static-underestimate auto-broadcast OOMs the
        # driver at corpus scale (see dup_spans)
        segs.join(doc_freq.hint("merge"), "__key")
        .crossJoin(F.broadcast(n_docs))
        .where(
            ~(
                (F.col("__df") >= F.lit(min_df))
                & (F.col("__df") / F.col("__n") > F.lit(max_df_ratio))
            )
        )
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
                    lambda s: s["__seg"],
                ),
                sep,
            ).alias(out)
        )
    )


def record_linkage_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_distance: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """Entity resolution / fuzzy record matching: candidate pairs via
    BLOCKING (records sharing ``block_cols`` values), exact Levenshtein
    distance on ``text_col`` computed only inside blocks, pairs with
    distance ≤ ``max_distance`` returned as (id_a, id_b, distance).

    The classic record-linkage shape: comparing all records is O(n²);
    blocking reduces it to Σ|block|² — pick block keys (normalized name
    prefix, zip code, phone area) that are cheap, high-recall, and keep
    blocks small. ``max_block_size`` hard-caps a block's members (sorted
    by id — deterministic) so one degenerate key (empty string, 'N/A')
    can't go quadratic; at web scale that cap is mandatory.

    Plan: ONE groupBy on the block key collecting (id, text) structs
    (bounded by the cap), row-local in-block pair expansion (same
    nested-transform trick as LSH buckets — no self-join, the block
    table is never shuffled twice), then a row-local `levenshtein`.
    """
    sid = F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t"))
    members = F.array_sort(F.collect_list(sid))
    if max_block_size is not None:
        members = F.slice(members, 1, max_block_size)
    blocks = df.groupBy(*block_cols).agg(members.alias("__m"))
    arr = F.col("__m")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda a, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda b: F.struct(
                    a["i"].alias("id_a"),
                    b["i"].alias("id_b"),
                    F.levenshtein(a["t"], b["t"]).alias("distance"),
                ),
            ),
        )
    )
    return (
        blocks.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b", "p.distance")
        .where(F.col("distance") <= max_distance)
    )


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(id, shingle) pairs, distinct — the shared base for jaccard/minhash."""
    return (
        fan_out(df)
        .select(F.col(id_col), F.explode(word_shingles(tokens(text_col), k)).alias("shingle"))
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
    # ONE tokenize+shingle pass materialized, feeding BOTH the exploded
    # shingle table and the row-local |A| sizes (the shared-scan pattern
    # verified_near_dups measures at ~1.9x on the CPU-dense stage —
    # recomputing the regex pipeline for the sizes frame doubles scan CPU)
    base = (
        fan_out(df)
        .select(
            F.col(id_col),
            F.array_distinct(word_shingles(tokens(text_col), k)).alias("__sh"),
        )
        .where(F.size("__sh") > 0)
        .localCheckpoint(eager=True)
    )
    sh = base.select(F.col(id_col), F.explode("__sh").alias("shingle"))
    sizes = base.select(F.col(id_col), F.size("__sh").alias("n_shingles"))
    # Group docs per shingle, emit in-bucket pairs, count co-occurrences.
    # Same pair cardinality as the textbook shingle self-join but the
    # shingle table is computed/shuffled ONCE instead of twice.
    buckets = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    common = (
        _bucket_pairs(buckets)
        .groupBy("doc_a", "doc_b")
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
    tokens_col: str | None = None,
    shingles_col: str | None = None,
) -> DataFrame:
    """Per-doc MinHash signature: for seed s, min over distinct shingles of
    md5(s ‖ ':' ‖ shingle) (lexicographic min of hex strings). Returns
    (id_col, minhash: array<string> of length num_hashes).

    Computed entirely row-local with array higher-order functions — the
    shingle set never leaves its row, so signature generation needs ZERO
    shuffles (vs the classic explode→distinct→groupBy formulation, which
    shuffles the full shingle corpus twice). At 100 TB this is the
    difference between a map-only stage and shuffling ~10× the input. The
    shingle array is let-bound so it is built once per row, not once per
    seed. Docs with no shingles are dropped (they can't near-dup match
    anything).
    """
    seeds = F.array(*[F.lit(f"{s}:") for s in range(num_hashes)])

    def mk_sig(sh_arr: Column) -> Column:
        return bind(
            sh_arr,
            lambda sh: F.transform(
                seeds,
                lambda s: F.array_min(F.transform(sh, lambda x: F.md5(F.concat(s, x)))),
            ),
        )

    if shingles_col is not None:
        # Pre-built (already-distinct) shingle sets — the share-the-scan
        # path used by `verified_near_dups`, where the same materialized
        # sets also feed verification.
        return (
            df.where(F.size(F.col(shingles_col)) > 0)
            .select(F.col(id_col), mk_sig(F.col(shingles_col)).alias("minhash"))
        )
    toks = F.col(tokens_col) if tokens_col else tokens(text_col)
    sig = mk_sig(F.array_distinct(word_shingles(toks, k)))
    # Pre-filter on a cheap exact condition (shingles exist iff ≥ k tokens)
    # instead of post-filtering on the signature — a post-filter would be
    # pushed below the projection and re-evaluate the whole signature.
    return (
        fan_out(df)
        .where(F.size(toks) >= k)
        .select(F.col(id_col), sig.alias("minhash"))
    )


def band_keys(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """Explode a minhash-signature frame into (id, band, band_key) rows —
    band key = md5 of that band's concatenated mins. Row-local (one
    explode of a ``bands``-element literal array, zero shuffle). Shared by
    in-corpus pair generation and batch-vs-store probing; a persisted
    store keeps exactly this frame as its incremental LSH index."""
    rows_per_band = num_hashes // bands
    band_entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws("|", *[
                    F.element_at(F.col("minhash"), b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ])
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_entries)).alias("bk")
    ).select(id_col, "bk.band", "bk.band_key")


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    tokens_col: str | None = None,
    max_bucket_size: int | None = None,
    shingles_col: str | None = None,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b), distinct.

    ``sig_df``: a precomputed ``minhash_signatures`` frame (same k /
    num_hashes) to band instead of rebuilding one — callers that need
    the signatures AGAIN after banding (Jaccard estimation, recall
    audits) materialize them once and pass them here, saving a full
    tokenize+minhash corpus pass (r10: docs_minhash_jaccard_est spent
    half its sf10-equivalent wall clock on the duplicate pass).

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows; band
    key = md5 of the concatenated mins. Docs sharing ANY band key become a
    candidate pair — an equi-join on (band, band_key), which Spark executes
    as a hash join; no pairwise scan. Tune (num_hashes, bands) for the
    target similarity threshold ~ (1/bands)^(bands/num_hashes).

    At 100 TB: candidate generation is shuffle-bound on band keys; set
    ``max_bucket_size`` so giant buckets (boilerplate docs) emit O(n) star
    edges instead of O(n²) pairs (see `_bucket_pairs`) — dup-group
    connectivity is preserved, expansion stays bounded. Compose with
    `ngram_jaccard_pairs` on the candidates to verify.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    sig = sig_df if sig_df is not None else minhash_signatures(
        df, text_col, id_col, k, num_hashes, tokens_col, shingles_col
    )
    banded = band_keys(sig, id_col, num_hashes, bands)
    # Bucketize per (band, band_key) and expand pairs in-bucket: ONE
    # aggregation shuffle over ~bands×n_docs tiny rows, signature pipeline
    # evaluated once (a self-join would run it twice). At 100 TB, cap or
    # salt giant buckets (boilerplate docs) before expansion; candidates
    # then feed ngram_jaccard_pairs for exact verification.
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    return _bucket_pairs(buckets, max_bucket_size=max_bucket_size).distinct()


def verified_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    metric: str = "jaccard",
) -> DataFrame:
    """The full scale composition: MinHash-LSH candidate generation, then
    EXACT similarity verification computed only on the candidates.

    ``metric="jaccard"`` scores |A∩B| / |A∪B| (symmetric resemblance);
    ``metric="containment"`` scores |A∩B| / min(|A|, |B|) — the
    asymmetric measure that SCORES subset duplication (one document
    embedded whole inside a longer one) correctly where Jaccard
    under-reports it: a doc reused inside one 3× its size has Jaccard
    ≈ 0.33 but containment = 1.0. Training-data pipelines need both
    (quote-heavy web pages, concatenated dumps). The output score
    column is named after the metric.

    Candidate RECALL is still MinHash/Jaccard-driven: a pair whose
    Jaccard is near zero (tiny doc inside a huge one) rarely lands in a
    shared band, so it never reaches verification. For that regime use
    narrower bands (bands == num_hashes) — per-band collision
    probability is then the raw per-hash Jaccard, caught by enough
    hashes — or the `dup_spans` substring path, which is containment's
    exact scalable cousin.

    Verification joins each candidate pair to the two docs' distinct
    shingle ARRAYS (two broadcast-able hash joins keyed by id) and
    computes |A∩B| row-locally with `array_intersect` — no global
    shingle-level self-join ever happens, so the quadratic step is gone
    entirely: cost = O(corpus) signatures + O(candidates) verifications.
    Output: (doc_a, doc_b, jaccard ≥ threshold).

    The distinct-shingle sets are computed ONCE and materialized
    (`localCheckpoint`), then shared by all three consumers — signature
    generation and both verification sides. Without this the CPU-dense
    tokenize+shingle regex pass runs 3× over the corpus (no cross-tree
    CSE in Catalyst); measured ~1.9× end-to-end on the bench query. On a
    cluster prefer reliable `checkpoint()`/`persist(DISK_ONLY)`: the
    materialized sets are ~shingle-factor × corpus bytes per executor.
    """
    shingle_sets = (
        fan_out(df)
        .select(
            F.col(id_col),
            F.array_distinct(word_shingles(tokens(text_col), k)).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    cands = lsh_candidate_pairs(
        shingle_sets, text_col, id_col, k, num_hashes, bands,
        max_bucket_size=max_bucket_size, shingles_col="sh",
    )
    a = shingle_sets.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = shingle_sets.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    if metric == "jaccard":
        denom = F.size("sh_a") + F.size("sh_b") - inter
    elif metric == "containment":
        denom = F.least(F.size("sh_a"), F.size("sh_b"))
    else:
        raise ValueError(f"unknown metric {metric!r} (jaccard|containment)")
    score = F.round(inter / denom, 6)
    return (
        joined.select("doc_a", "doc_b", score.alias(metric))
        .where(F.col(metric) >= threshold)
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    k: int = 8,
    mark_only: bool = False,
    min_overlap_fraction: float | None = None,
) -> DataFrame:
    """Benchmark decontamination: drop (or with ``mark_only`` flag) training
    docs sharing ANY k-token shingle with an eval/benchmark set — the
    standard n-gram overlap test-set filter of LLM training pipelines
    (GPT-3 appendix C shape).

    ``min_overlap_fraction`` switches to the FUZZY criterion: contaminated
    iff matching distinct shingles / total distinct shingles ≥ the
    threshold — the right dial when benchmarks quote common boilerplate
    (any-hit would nuke half the web for sharing one stock phrase).

    Shingles are md5-hashed row-locally before the join so the shuffle/
    broadcast key is 16 bytes, never text. Benchmark sets are small (eval
    suites), so their distinct shingle-hash table broadcasts and the
    contamination probe is a map-side semi join over one corpus scan; the
    corpus never shuffles (the fraction path adds one (id)-keyed count
    aggregate over the 16-byte hash rows, still corpus-text-free).
    """
    def sh(col: str | Column) -> Column:
        return word_shingles(tokens(col), k)

    bench_sh = F.broadcast(
        benchmark.select(F.explode(sh(bench_text_col)).alias("__s"))
        .select(F.md5("__s").alias("__h"))
        .distinct()
    )
    doc_sh = fan_out(df).select(
        F.col(id_col), F.explode(F.array_distinct(sh(text_col))).alias("__s")
    ).select(id_col, F.md5("__s").alias("__h"))
    if min_overlap_fraction is not None:
        with_flag = doc_sh.join(
            bench_sh.withColumn("__hit", F.lit(1)), "__h", "left_outer"
        )
        frac = (
            with_flag.groupBy(id_col)
            .agg(
                (F.count("__hit") / F.count(F.lit(1))).alias("__frac")
            )
        )
        contaminated = frac.where(
            F.col("__frac") >= F.lit(float(min_overlap_fraction))
        ).select(id_col)
    else:
        contaminated = (
            doc_sh.join(bench_sh, "__h", "left_semi").select(id_col).distinct()
        )
    if mark_only:
        flag = contaminated.withColumn("is_contaminated", F.lit(True))
        return df.join(flag, id_col, "left_outer").withColumn(
            "is_contaminated", F.coalesce(F.col("is_contaminated"), F.lit(False))
        )
    return df.join(contaminated, id_col, "left_anti")


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    skew_safe: bool = True,
) -> DataFrame:
    """Exact duplicate-SPAN detection: for every k-token window, find the
    windows that occur in >= ``min_docs`` distinct documents, and score each
    document by the fraction of its windows that are corpus-duplicated —
    the fixed-window adaptation of suffix-array substring dedup
    ("Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022), which whole-doc and near-dup passes cannot see (a long
    quote or license block inside otherwise-unique pages).

    Returns ``(id, n_spans, dup_spans, dup_frac)`` — one row per document
    that has at least one window; downstream passes trim or drop documents
    with high ``dup_frac``.

    Scale shape: windows are md5-hashed row-locally (16-byte keys, never
    text), and the span exchange's width is DERIVED from the measured
    input size at the session's memory-derived advisory bytes (see the
    inline comment) — zero spill at the sf10-equivalent rehearsal where
    fixed-32 reducers spilled 3.4 GB. Stage 1 aggregates to one row per
    (hash, doc) on the pinned-width partitions. Stage 2 counts distinct
    docs per hash; ``skew_safe`` (default) does it as a groupBy JOINED
    back — a boilerplate span present in millions of docs (license
    blocks: exactly what this op hunts) would pile every (hash, doc) row
    onto one task under a count-over-window, while AQE skew-join splits
    the equivalent join partition (windows get no such handling). The
    two join branches deliberately recompute the explode rather than
    cache it: every materialization variant measured worse at the
    rehearsal (lazy localCheckpoint raced under AQE's concurrent stage
    submission and OOM'd unrolling deserialized multi-GB blocks; the
    explode is cheap CPU against a pipelined scan). ``skew_safe=False``
    keeps the single-evaluation window form — one pass, but skew-fragile
    on extreme span frequencies. Stage 3 re-aggregates per doc. No
    self-join; nothing data-sized is ever broadcast (merge hint below).
    """
    spans = fan_out(df).select(
        F.col(id_col),
        F.explode(word_shingles(tokens(text_col), k)).alias("__s"),
    ).select(id_col, F.unhex(F.md5("__s")).alias("__h"))
    # Shuffle width on this multi-GB exchange is DERIVED from the
    # measured input size, not assumed (r7 verdict item 3): AQE's
    # parallelism-first coalescing would hand the ~2.6 GB span shuffle to
    # defaultParallelism reducers (~85 MB each at 32 local cores — they
    # sort-spilled 3.4 GB at the sf10-equivalent rehearsal), while its
    # size-first mode starves low-byte/high-CPU stages elsewhere
    # (session.py). So the operator pins the width itself at the
    # session's memory-derived advisory bytes. The span key is the
    # 16-BYTE BINARY md5 (unhex), not the 32-char hex string — the hash
    # never appears in output, so the only thing hex bought was double
    # the key bytes on every exchange (r9). expansion=20: one
    # (id, 16-byte) row per k-token window off snappy-compressed parquet
    # text (the hex form measured ~30× at the sf10-equivalent rehearsal;
    # binary rows are ~2/3 the size). Partitioning by __h alone satisfies
    # the (__h, id) clustering of the groupBy, so no second exchange; at
    # small sf the helper floors at defaultParallelism so nothing
    # under-parallelizes.
    width = shuffle_partitions_for(
        df, target_mb=advisory_mb(df.sparkSession), expansion=20.0)
    per_doc = (
        spans.repartition(width, "__h")
        .groupBy("__h", id_col).agg(F.count("*").alias("__c"))
    )
    if skew_safe:
        # Both consumers below re-derive per_doc from the pinned-width
        # exchange; neither needs a further exchange (already partitioned
        # by __h). Column pruning specializes each branch's scan, so the
        # exchanges don't canonicalize equal and the explode runs twice —
        # measured CHEAPER end-to-end than every materialization variant
        # (lazy localCheckpoint raced under AQE's concurrent stage
        # submission and OOM'd unrolling deserialized multi-GB blocks at
        # the sf10-equivalent rehearsal; the explode is pipelined CPU
        # behind a column-pruned scan).
        ndocs = per_doc.groupBy("__h").agg(F.count("*").alias("__ndocs"))
        # merge (sort-merge) hint, NOT broadcast or shuffle-hash: ndocs
        # is a data-sized aggregate (one row per distinct span hash —
        # grows with the corpus), but Catalyst's static size estimate
        # through the explode+agg chain can land under
        # autoBroadcastJoinThreshold and plan a broadcast that OOMs the
        # driver at scale (observed at the sf10-equivalent rehearsal:
        # "Not enough memory to build and broadcast"; the shuffle-hash
        # form then died building per-partition hash maps). Sort-merge
        # spills gracefully on both sides — the only strategy whose
        # memory is O(1) in table size — and AQE still splits skewed
        # partitions under it.
        with_docs = per_doc.join(ndocs.hint("merge"), "__h")
    else:
        from pyspark.sql import Window

        with_docs = per_doc.withColumn(
            "__ndocs", F.count("*").over(Window.partitionBy("__h"))
        )
    dup = (F.col("__ndocs") >= min_docs).cast("long")
    return (
        with_docs.groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_spans"),
            F.sum(F.col("__c") * dup).alias("dup_spans"),
        )
        .withColumn(
            "dup_frac",
            # portable floor(x*1e6+0.5)/1e6 rounding (see queries._rnd)
            F.floor(F.col("dup_spans") / F.col("n_spans") * 1000000 + F.lit(0.5))
            / 1000000,
        )
    )


def dup_span_ranges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Duplicate-span RANGE extraction: where ``dup_spans`` scores each
    document, this returns the actual cuttable intervals — every maximal
    run of overlapping/adjacent k-token windows that occur in >=
    ``min_docs`` distinct documents, merged gaps-and-islands style. This
    is the output shape of suffix-array substring dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022): the
    downstream pass CUTS these token ranges out of the text instead of
    dropping whole documents.

    Returns ``(id, range_id, range_start, range_end, n_windows)`` —
    token offsets, 0-based, end exclusive; ``range_id`` numbers a doc's
    ranges in order. Two windows merge when their starts differ by <= k
    (overlap or exact adjacency).

    Scale shape: three data-sized exchanges, each on a narrow key, every
    hash a 16-BYTE BINARY md5 (the hash never appears in output; hex
    doubled the key bytes for nothing — r9) — (1) the (hash, doc)
    pre-agg finds corpus-duplicated spans (same regime as dup_spans);
    (2) the positioned span table joins the flagged hashes MERGE-HINTED
    (data-sized aggregate, never broadcast — see dup_spans' OOM note),
    with BOTH derived-width exchanges pinned to one width so the
    single-key sort-merge join is co-partitioned and the planner adds
    nothing; (3) the per-doc interval merge windows on the doc key over
    the FLAGGED SUBSET only (lag + running-sum islands: two window
    functions over ONE partitioning+ordering, a single exchange).
    Positions ride two exchanges as one int beside the hash — the price
    of ranges over scores, and still never the text itself. (A two-phase
    variant that moved positions to a doc-key exchange was MEASURED
    WORSE at the sf30-equivalent rehearsal — Spark does not reuse the
    shared pre-agg exchange between its two consumers, so the saved
    position bytes were repaid double in hash rows: 11.2 GB vs 9.1 GB
    shuffle. Plans that look narrower on paper still get benched.)
    """
    from pyspark.sql import Window

    toks = tokens(text_col)
    sp = fan_out(df).select(
        F.col(id_col),
        F.posexplode(word_shingles(toks, k)).alias("__pos", "__s"),
    ).select(id_col, "__pos", F.unhex(F.md5("__s")).alias("__h"))
    # one width for both hash-keyed exchanges: the positioned side is the
    # wider of the two ((id, pos, 16B) vs (id, 16B) per window), so size
    # for it and let the pre-agg side ride the same partitioning
    width = shuffle_partitions_for(
        df, target_mb=advisory_mb(df.sparkSession), expansion=24.0)
    # corpus-duplicated hashes: (hash, doc) pre-agg -> ndocs filter
    dup_h = (
        sp.select("__h", id_col)
        .repartition(width, "__h")
        .groupBy("__h", id_col).agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__h").agg(F.count("*").alias("__ndocs"))
        .where(F.col("__ndocs") >= min_docs)
        .select("__h")
    )
    flagged = (
        sp.repartition(width, "__h")
        .join(dup_h.hint("merge"), "__h")
        .select(id_col, "__pos")
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    brk = F.when(
        F.col("__pos") - F.lag("__pos").over(w) <= k, F.lit(0)
    ).otherwise(F.lit(1))
    islands = flagged.withColumn("__brk", brk).withColumn(
        "__island", F.sum("__brk").over(w)
    )
    return (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("__pos").alias("range_start"),
            (F.max("__pos") + F.lit(k)).alias("range_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            id_col,
            F.col("__island").cast("long").alias("range_id"),
            F.col("range_start").cast("long").alias("range_start"),
            F.col("range_end").cast("long").alias("range_end"),
            "n_windows",
        )
    )


def cut_span_ranges(
    df: DataFrame,
    ranges: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Apply substring-dedup CUTS: remove every token covered by a
    duplicate range (``dup_span_ranges`` output, or computed here when
    ``ranges`` is None) and reassemble the surviving text — the final
    step of the Lee et al. 2022 loop (score → locate → CUT), keeping the
    unique remainder of documents that whole-doc dedup would drop
    entirely.

    Returns one row per document with >= 1 token:
    ``(id, n_tokens, n_removed, clean_text)`` where ``clean_text`` is
    the kept tokens joined by single spaces (canonical token form — the
    cut operates on the tokenized view, like the reference dedup cuts
    byte ranges of the normalized text).

    Scale shape: the ranges table aggregates to one array row per doc
    (ranges per doc are few — islands, not windows) and joins back
    MERGE-HINTED; the cut itself is row-local higher-order functions
    (indexed transform → exists-filter → array_join), zero additional
    shuffle beyond the ranges derivation.
    """
    if ranges is None:
        ranges = dup_span_ranges(
            df, text_col, id_col, k=k, min_docs=min_docs
        )
    rng = ranges.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("range_start").alias("s"), F.col("range_end").alias("e"))
        ).alias("__rngs")
    )
    joined = df.join(rng.hint("merge"), id_col, "left").withColumn(
        "__rngs", F.coalesce(F.col("__rngs"), F.array())
    )
    toks = tokens(text_col)
    kept = bind(
        F.filter(
            F.transform(
                toks, lambda x, i: F.struct(x.alias("t"), i.alias("i"))
            ),
            lambda st: ~F.exists(
                F.col("__rngs"),
                lambda r: (st["i"] >= r["s"]) & (st["i"] < r["e"]),
            ),
        ),
        lambda kp: F.struct(
            F.transform(kp, lambda st: st["t"]).alias("toks"),
            F.size(kp).alias("n"),
        ),
    )
    return (
        joined.select(
            F.col(id_col),
            F.size(toks).cast("long").alias("n_tokens"),
            kept.alias("__kept"),
        )
        .where(F.col("n_tokens") >= 1)
        .select(
            id_col,
            "n_tokens",
            (F.col("n_tokens") - F.col("__kept.n")).cast("long").alias("n_removed"),
            F.array_join("__kept.toks", " ").alias("clean_text"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: docs within ``max_hamming`` bit flips.

    Pigeonhole banding: two hashes within d flips agree on at least one of
    d+1 bands, so candidates come from equality joins on band substrings
    (``bands`` should be > max_hamming); exact hamming distance verifies
    in-bucket. Same bucket-expansion shape as MinHash-LSH — no pairwise
    scan outside buckets. ``max_bucket_size`` caps giant buckets to O(n)
    star edges against the bucket's min-id representative (hamming verify
    still applies per edge), bounding expansion on boilerplate-heavy
    corpora.
    """
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming (pigeonhole)")
    width = bits // bands
    sh = simhash(df, text_col, id_col, bits)
    band_entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("simhash", b * width + 1, width).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = sh.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*band_entries)).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.band_key")
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_set(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("h")))).alias("entries"))
        .where(F.size("entries") >= 2)
    )
    ids = F.col("entries")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda b: F.struct(
                    a["id"].alias("doc_a"), b["id"].alias("doc_b"),
                    a["h"].alias("h_a"), b["h"].alias("h_b"),
                ),
            ),
        )
    )
    if max_bucket_size is not None:
        rep = F.element_at(ids, 1)
        star = F.transform(
            F.slice(ids, 2, F.size(ids)),
            lambda b: F.struct(
                rep["id"].alias("doc_a"), b["id"].alias("doc_b"),
                rep["h"].alias("h_a"), b["h"].alias("h_b"),
            ),
        )
        pairs = F.when(F.size(ids) > max_bucket_size, star).otherwise(pairs)
    expanded = buckets.select(F.explode(pairs).alias("p")).select(
        "p.doc_a", "p.doc_b", "p.h_a", "p.h_b"
    )
    # exact hamming distance over the bitstrings, row-local: parse each
    # side's '0'/'1' string once into ≤32-bit long chunks and popcount the
    # XOR — identical to the old per-position substr compare (every
    # position is covered by exactly one chunk) without 2·bits string
    # slices per candidate pair
    bchunks = [(start, min(32, bits - start)) for start in range(0, bits, 32)]

    def _bits_to_long(col: str, start: int, width: int) -> Column:
        return F.conv(F.substring(F.col(col), start + 1, width), 2, 10).cast("long")

    chunk_counts = [
        F.bit_count(
            _bits_to_long("h_a", s, w).bitwiseXOR(_bits_to_long("h_b", s, w))
        )
        for s, w in bchunks
    ]
    hamming = chunk_counts[0]
    for c in chunk_counts[1:]:
        hamming = hamming + c
    # Hamming-filter BEFORE the cross-band dedup (r10): the verify is
    # row-local integer popcount, so re-running it on a pair's duplicate
    # band hits is far cheaper than pushing the full candidate stream —
    # ~19 M rows × two bits-length strings at sf0.1 — through the
    # distinct's exchange; the distinct then dedups only true matches.
    # hamming is a pure function of (h_a, h_b), so filter-then-distinct
    # equals distinct-then-filter exactly.
    return (
        expanded.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over an undirected pair list → (doc_id,
    group_id = min id reachable). The cluster-assignment step after LSH:
    near-dup PAIRS become dedup GROUPS (keep min id, drop the rest).

    Each round does (1) min-label propagation — every node takes the min
    of its own and its neighbors' labels — and (2) pointer doubling —
    ``l(v) ← min(l(v), l(l(v)))``, the label table joined to itself —
    which halves remaining chain lengths, so convergence is O(log
    diameter) rounds (plain propagation alone is O(diameter): one hop per
    round). Driver code only steers the loop (a `count` per round checks
    convergence); all data movement is joins/groupBys. Each round
    checkpoints the label frame — without it the lineage doubles per
    iteration and the plan explodes. By default that's executor-local
    (``localCheckpoint``: fast, but lost if an executor dies mid-job);
    pass ``checkpoint_dir`` (HDFS/S3 path on a real cluster) to use
    RELIABLE ``checkpoint()`` so a 100 TB run survives executor loss
    without recomputing the whole iteration history.

    If the loop hits ``max_iterations`` with labels still changing the
    result may split true groups — a ``RuntimeWarning`` is raised so the
    caller can't miss it.
    """
    import warnings

    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ck(frame: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return frame.checkpoint(eager=True)
        return frame.localCheckpoint(eager=True)

    # Materialize the pair list ONCE before mirroring: `pairs` usually
    # sits on top of an expensive candidate-generation plan (MinHash/LSH
    # banding), and a union of two projections of it would execute that
    # whole subtree twice (Spark has no automatic CTE reuse across union
    # branches); every round's neighbor join would then re-execute it
    # again — measured 2× end-to-end on the LSH dup-groups bench query.
    # Mirror each pair row-locally (explode of a 2-struct array) instead of
    # a union of two projections: the candidate-generation subtree under
    # `pairs` (MinHash/LSH banding — the expensive part) is evaluated
    # exactly ONCE, and a single eager checkpoint materializes the full
    # bidirectional edge list before the loop (a union form either runs
    # the subtree twice or needs two serialized checkpoint barriers).
    edges = _ck(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
                    F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    )
    labels = _ck(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
    )
    # Convergence check: labels under min-propagation are NON-INCREASING
    # per node, so for numeric ids the global label sum strictly decreases
    # until the fixpoint — one cheap aggregate per round replaces a
    # join+count job. Non-numeric ids (e.g. md5 strings) fall back to the
    # join-based diff count.
    numeric_ids = dict(labels.dtypes)["lbl"] in (
        "tinyint", "smallint", "int", "bigint",
    )

    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).head()[0]

    prev_sum = _label_sum(labels) if numeric_ids else None
    if numeric_ids and prev_sum is None:
        # empty label set (no edges, or all-NULL ids): propagation is a
        # no-op — skip the loop outright instead of running one round of
        # empty joins to discover it
        return labels.select(
            F.col("id").alias("doc_id"), F.col("lbl").alias("group_id")
        )
    changed = 0
    for rnd in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        propagated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left_outer")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
            )
        )
        if rnd == 0:
            # Round 1 is propagation-only: labels are still identities, so
            # pointer doubling (l(v) <- l(l(v))) is l(v) <- l(v) — a no-op
            # self-join. LSH dup graphs are mostly stars/cliques (diameter
            # 1, especially under max_bucket_size star-capping), which
            # converge on this first propagation alone; chains still get
            # O(log diameter) rounds from doubling starting at round 2.
            new_labels = _ck(propagated)
        else:
            mapping = propagated.select(
                F.col("id").alias("mid"), F.col("lbl").alias("mlbl")
            )
            new_labels = _ck(
                propagated.join(mapping, propagated.lbl == mapping.mid, "left_outer")
                .select(
                    "id",
                    F.least(F.col("lbl"), F.coalesce(F.col("mlbl"), F.col("lbl"))).alias("lbl"),
                )
            )
        if numeric_ids:
            new_sum = _label_sum(new_labels)
            changed = int(new_sum != prev_sum)
            prev_sum = new_sum
        elif rnd == 0 and max_iterations > 1:
            # Round 0 ALWAYS changes labels when any edge exists (for every
            # edge (a,b) with a<b, node b takes label <= a < b) — so the
            # round-0 convergence check is a guaranteed-true driver sync.
            # For string ids that check is a labels⋈labels diff JOIN; skip
            # it (the r10 verdict's "halve the syncs" item) with provably
            # zero extra propagation rounds, since round 1's diff is
            # independent of round 0's. The numeric label-sum check cannot
            # skip: each round's comparison needs the PREVIOUS round's sum,
            # and that aggregate over the just-materialized label frame is
            # already the cheap part. Kept when max_iterations == 1 so the
            # may-be-split warning below stays exact.
            changed = 1
        else:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
                .where(F.col("n.lbl") != F.col("o.lbl"))
                .count()
            )
        labels = new_labels
        if changed == 0:
            break
    if changed:
        warnings.warn(
            f"connected_components stopped after {max_iterations} rounds with "
            f"labels still changing — groups may be split; raise "
            "max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("lbl").alias("group_id"))


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash over unigram tokens: per token, md5 → first bits/4 hex digits;
    each bit votes ±1; sign of the sum is the output bit. Returns
    (id, simhash) with the hash as a bits-length bitstring column.

    Computed row-local: the token array never leaves its row (per-token md5
    via `transform`, per-bit votes via `aggregate`) — a map-only stage with
    no shuffle, vs the classic explode+groupBy which shuffles every token.
    Near-dup = small hamming distance; pair search at scale goes through
    band equality on substrings of the bitstring (same LSH trick as
    minhash).
    """
    if bits <= 0 or bits % 4 != 0 or bits > 128:
        raise ValueError(
            f"simhash bits must be a positive multiple of 4 (<=128), got {bits} "
            "— the hash is built 4 bits per md5 hex digit, so a non-multiple "
            "would silently truncate and under-count hamming distances"
        )
    ndigits = bits // 4
    # Parse each token's md5 prefix ONCE into ≤8-hex-digit (32-bit) long
    # chunks; the per-bit vote is then an integer shift/mask instead of a
    # substring + instr hex parse per (token, bit). Same votes bit-for-bit
    # (chunk value = Σ digit_d · 16^(width-1-d), so digit d's bit j sits at
    # shift (width-1-d)·4+j); measured ~9× on the sf0.1 corpus (r10) — the
    # old form did 32 string searches per token where this does one conv.
    chunks = [(start, min(8, ndigits - start)) for start in range(0, ndigits, 8)]
    hs = F.transform(
        tokens(text_col),
        lambda t: F.struct(*[
            F.conv(F.substring(F.md5(t), start + 1, width), 16, 10)
            .cast("long")
            .alias(f"c{i}")
            for i, (start, width) in enumerate(chunks)
        ]),
    )
    # vote per bit: digit d (0..ndigits-1), bit j (0..3, LSB-first to match
    # the b_{d*4+j} output ordering): +1 if set else -1 — i.e. 2·bit − 1
    def vote(d: int, j: int) -> Column:
        ci = d // 8
        start, width = chunks[ci]
        shift = (width - 1 - (d - start)) * 4 + j
        return F.aggregate(
            F.col("__hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.shiftright(h[f"c{ci}"], shift).bitwiseAND(F.lit(1)).cast("int")
            * F.lit(2)
            - F.lit(1),
        )

    bitstr = F.concat(*[
        F.when(vote(d, j) > 0, F.lit("1")).otherwise(F.lit("0"))
        for d in range(ndigits)
        for j in (0, 1, 2, 3)
    ])
    return (
        fan_out(df).select(F.col(id_col), hs.alias("__hs"))
        .where(F.size("__hs") > 0)
        .select(F.col(id_col), bitstr.alias("simhash"))
    )


def near_dup_against_store(
    batch: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    store_text_col: str | None = None,
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    mode: str = "drop",
) -> DataFrame:
    """INCREMENTAL near-dup dedup: check today's batch against the
    historical corpus with MinHash-LSH banding, verifying exact Jaccard
    only on band-collision candidates — ``dedup_against_store``'s fuzzy
    sibling, and the production shape for a continuously-crawled corpus
    (the in-corpus pair generators compare a corpus to ITSELF; recrawls
    need batch-vs-STORE).

    Plan shape at 100 TB: both sides reduce to (id, band, band_key) rows —
    the batch computes its keys row-locally (zero shuffle); the store's
    keys are exactly the ``band_keys`` frame, which a production pipeline
    PERSISTS once as its incremental LSH index and re-reads per batch
    (bands × n_docs tiny rows — store text is never re-tokenized, never
    shuffled). Candidates come from one equi hash join on (band,
    band_key) — batch-sized, not corpus-sized; hot template band keys are
    ordinary join skew (AQE splits them). Verification joins candidates
    to both sides' distinct-shingle sets and scores |A∩B|/|A∪B|
    row-locally — quadratic work never happens.

    ``mode="drop"`` returns surviving batch rows (anti join on matched
    ids); ``mode="mark"`` returns all scoreable batch rows with
    ``near_dup_matched`` + best ``jaccard`` (docs with < k tokens can't
    match and are dropped from "mark" output but kept by "drop").
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    if mode not in ("drop", "mark"):
        raise ValueError(f"unknown mode {mode!r} (drop|mark)")
    s_text = store_text_col or text_col

    def _shingles(frame: DataFrame, col: str) -> DataFrame:
        return (
            fan_out(frame)
            .select(
                F.col(id_col),
                F.array_distinct(word_shingles(tokens(col), k)).alias("sh"),
            )
            .where(F.size("sh") > 0)
            .localCheckpoint(eager=True)
        )

    b_sh = _shingles(batch, text_col)
    s_sh = _shingles(store, s_text)
    b_keys = band_keys(
        minhash_signatures(b_sh, id_col=id_col, num_hashes=num_hashes,
                           shingles_col="sh"),
        id_col, num_hashes, bands,
    ).select(F.col(id_col).alias("__bid"), "band", "band_key")
    s_keys = band_keys(
        minhash_signatures(s_sh, id_col=id_col, num_hashes=num_hashes,
                           shingles_col="sh"),
        id_col, num_hashes, bands,
    ).select(F.col(id_col).alias("__sid"), "band", "band_key")
    cands = (
        b_keys.join(s_keys, ["band", "band_key"])
        .select("__bid", "__sid")
        .distinct()
    )
    scored = (
        cands.join(b_sh.select(F.col(id_col).alias("__bid"),
                               F.col("sh").alias("sh_b")), "__bid")
        .join(s_sh.select(F.col(id_col).alias("__sid"),
                          F.col("sh").alias("sh_s")), "__sid")
        .select(
            "__bid",
            bind(
                F.size(F.array_intersect("sh_b", "sh_s")).cast("double"),
                lambda i: i / (F.size("sh_b") + F.size("sh_s") - i),
            ).alias("__j"),
        )
    )
    best = scored.groupBy("__bid").agg(F.max("__j").alias("__best"))
    if mode == "drop":
        matched = best.where(F.col("__best") >= threshold).select(
            F.col("__bid").alias(id_col)
        )
        return batch.join(matched, id_col, "left_anti")
    kp = F.floor(F.coalesce(F.col("__best"), F.lit(0.0)) * 1000000 + F.lit(0.5)) / 1000000
    return (
        b_sh.select(id_col)
        .join(best.select(F.col("__bid").alias(id_col), "__best"), id_col, "left")
        .select(
            id_col,
            kp.alias("jaccard"),
            (F.coalesce(F.col("__best"), F.lit(0.0)) >= threshold).alias(
                "near_dup_matched"
            ),
        )
    )


def minhash_jaccard_estimate(
    pairs: DataFrame,
    signatures: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    out: str = "jaccard_est",
) -> DataFrame:
    """Signature-based Jaccard ESTIMATE for candidate pairs: the fraction
    of agreeing minhash positions — E[fraction] = true Jaccard, the
    classic sketch estimator. The triage stage between LSH candidate
    generation and exact verification at extreme scale: exact verify
    joins each pair to two full shingle SETS (shingle-factor × text
    bytes); this joins only the num_hashes-element signatures (fixed
    ~400 bytes/side), so pairs can be pre-filtered by estimated
    similarity before any shingle set ships.

    Row-local agreement count via ``zip_with`` after two signature
    lookups (broadcast-able hash joins on the id).
    """
    sa = signatures.select(
        F.col(id_col).alias(a_col), F.col("minhash").alias("__ma")
    )
    sb = signatures.select(
        F.col(id_col).alias(b_col), F.col("minhash").alias("__mb")
    )
    agree = F.size(
        F.filter(
            F.zip_with("__ma", "__mb", lambda x, y: x == y), lambda m: m
        )
    )
    return (
        pairs.join(sa, a_col)
        .join(sb, b_col)
        .select(
            a_col,
            b_col,
            (
                F.floor(
                    agree.cast("double") / F.size("__ma") * 1000000 + F.lit(0.5)
                ) / 1000000
            ).alias(out),
        )
    )


def contamination_score(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    k: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Per-document contamination REPORT — the score `decontaminate`
    thresholds internally, surfaced for auditing: fraction of each doc's
    distinct k-token shingles that appear in the benchmark set, plus the
    raw counts. Same 100 TB shape as the filter: the benchmark's hashed
    shingle table broadcasts, the corpus scans once, the only aggregate
    is (id)-keyed counts over 16-byte hashes. Returns
    (id, n_shingles, n_hits, contamination)."""
    def sh(col):
        return word_shingles(tokens(col), k)

    bench_sh = F.broadcast(
        benchmark.select(F.explode(sh(bench_text_col)).alias("__s"))
        .select(F.md5("__s").alias("__h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    doc_sh = fan_out(df).select(
        F.col(id_col), F.explode(F.array_distinct(sh(text_col))).alias("__s")
    ).select(id_col, F.md5("__s").alias("__h"))
    q = 10 ** round_to
    return (
        doc_sh.join(bench_sh, "__h", "left_outer")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_hits"),
        )
        .withColumn(
            "contamination",
            F.floor(
                F.col("n_hits").cast("double") / F.col("n_shingles") * q
                + F.lit(0.5)
            )
            / q,
        )
    )
