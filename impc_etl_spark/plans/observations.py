"""The observation-mapping plan: nested experiment docs → flat fact table.

This is the semantic core of the reference pipeline (the IMPC
``ExperimentToObservationMapper``, jobs/load/observation_mapper.py:1187-1520):
experiments arrive as nested documents with arrays of typed parameter
structs; the engine explodes each parameter family to one row per measured
value, mints a stable position-derived observation id
(observation_mapper.py:1026-1082), classifies the observation type
(observation_mapper.py:519-542), resolves family-specific typed values
(simple :544-607, time series :655-811), attaches the experiment's
metadata-group hash (specimen_experiment_cross_ref.py:116-195), conforms
every branch to one fixed column contract (unify_schema,
observation_mapper.py:419-424), and unions the branches.

Here the same dataflow runs over the driver's star schema: orders play the
experiment documents, lineitems the parameter entries. ``nest_experiments``
builds the nested representation (proving the engine handles
array<struct> documents end-to-end), ``map_to_observations`` flattens it
back through the real operator chain. Every step is pure DataFrame algebra
— the whole plan is two shuffles (the nest groupBy + the orders join) and
is oracle-checked against DuckDB on the flat tables.

Scale notes (100 TB): the nest groupBy shuffles on the experiment key —
the natural partitioning for everything downstream (explodes are row-local,
conform/union are projections). Families are processed from ONE nested
frame, so the source is scanned once, not once per family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StringType

from impc_etl_spark.operators.conform import conform_to_schema, contract, union_conform
from impc_etl_spark.operators.explode import explode_params
from impc_etl_spark.operators.partitioning import shuffle_partitions_for

#: The fixed observation contract (a compact analog of the reference's
#: 66-column OBSERVATION_COLUMNS, config/constants.py:360-426).
OBSERVATION_CONTRACT = contract(
    ("observation_id", StringType()),
    ("experiment_id", StringType()),
    ("parameter_family", StringType()),
    ("parameter_seq", IntegerType()),
    ("observation_type", StringType()),
    ("data_point", DoubleType()),
    ("category", StringType()),
    ("time_point", DoubleType()),
    ("discrete_point", DoubleType()),
    ("metadata_group", StringType()),
)


def metadata_group_hash(items: Column) -> Column:
    """md5 over the sorted metadata item array — the metadata-group scheme
    (cross_ref_helper.py:162-193: accumulate items, sort, hash) as a single
    row-local expression."""
    return F.md5(F.concat_ws("|", F.sort_array(items)))


def nest_experiments(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Build nested experiment documents from the flat star schema.

    One row per order with:
      - ``simpleParameter``  array<struct<seq,qty,flag,price>> (sorted by seq)
      - ``seriesParameter``  array<struct<increment,value>> (sorted)
      - ``metadata_group``   hash of the experiment-level metadata items

    The sort keys are unique within a document, so the arrays — and every
    position-derived id downstream — are deterministic under re-runs.
    """
    entry = F.struct(
        F.col("l_linenumber").alias("seq"),
        F.col("l_quantity").alias("qty"),
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    )
    series_entry = F.struct(
        F.col("l_linenumber").alias("increment"),
        F.col("l_extendedprice").alias("value"),
    )
    # The nest shuffle carries EVERY lineitem row into per-order arrays —
    # collect_list has no map-side reduction, so this is the plan's widest
    # exchange (~2 GB at the sf10-equivalent rehearsal) and AQE's
    # parallelism-first coalescing would hand it to defaultParallelism
    # reducers (~65 MB wire ≈ 400 MB of array-building heap each → 3.6 GB
    # of graceful spill measured). Pin the width from the measured scan
    # size at the session's memory-derived advisory bytes instead
    # (expansion=3: row objects + struct headers off snappy parquet;
    # measured ~2×, 3 adds margin). Partitioning by the groupBy key means
    # no second exchange, and the orders join below inherits it.
    advisory_mb = max(
        1, int(lineitem.sparkSession.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(64 << 20))) >> 20)
    width = shuffle_partitions_for(
        lineitem, target_mb=advisory_mb, expansion=3.0)
    nested = lineitem.repartition(width, "l_orderkey").groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(entry)).alias("simpleParameter"),
        F.sort_array(F.collect_list(series_entry)).alias("seriesParameter"),
    )
    meta_items = F.array(
        F.concat(F.lit("priority="), F.col("o_orderpriority")),
        F.concat(F.lit("status="), F.col("o_orderstatus")),
    )
    docs = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        metadata_group_hash(meta_items).alias("metadata_group"),
    )
    return nested.join(docs, "l_orderkey").select(
        F.col("l_orderkey").cast("string").alias("experiment_id"),
        "simpleParameter",
        "seriesParameter",
        "metadata_group",
    )


def _simple_observations(nested: DataFrame) -> DataFrame:
    """simpleParameter family: classify categorical vs unidimensional and
    resolve the typed value (observation_mapper.py:519-607)."""
    ex = explode_params(
        nested,
        "simpleParameter",
        parent_key="experiment_id",
        keep_cols=["metadata_group"],
        value_col="p",
    )
    is_cat = F.col("p.qty") < 10
    return conform_to_schema(
        ex.select(
            "observation_id",
            "experiment_id",
            F.lit("simpleParameter").alias("parameter_family"),
            F.col("p.seq").alias("parameter_seq"),
            F.when(is_cat, "categorical").otherwise("unidimensional").alias("observation_type"),
            F.when(~is_cat, F.col("p.qty")).alias("data_point"),
            F.when(is_cat, F.col("p.flag")).alias("category"),
            "metadata_group",
        ),
        OBSERVATION_CONTRACT,
    )


def _series_observations(nested: DataFrame) -> DataFrame:
    """seriesParameter family: one time_series observation per increment,
    discrete_point = position (observation_mapper.py:655-811)."""
    ex = explode_params(
        nested,
        "seriesParameter",
        parent_key="experiment_id",
        keep_cols=["metadata_group"],
        value_col="p",
    )
    return conform_to_schema(
        ex.select(
            "observation_id",
            "experiment_id",
            F.lit("seriesParameter").alias("parameter_family"),
            F.col("p.increment").alias("parameter_seq"),
            F.lit("time_series").alias("observation_type"),
            F.col("p.value").alias("data_point"),
            F.col("p.increment").cast("double").alias("time_point"),
            F.col("_pos").cast("double").alias("discrete_point"),
            "metadata_group",
        ),
        OBSERVATION_CONTRACT,
    )


def map_to_observations(nested: DataFrame) -> DataFrame:
    """Explode every parameter family of the nested docs into the flat
    observation fact table (the union of all family branches, each
    conformed to OBSERVATION_CONTRACT).

    Reference-shaped (one branch per family + union). NOTE: Spark plans
    each union branch as an independent subtree, so the nested source is
    scanned and shuffled once PER FAMILY — fine for a handful of families
    over checkpointed parquet (the reference's situation), wrong at 100 TB
    straight off the fact table. ``map_to_observations_fused`` is the
    single-scan variant; ``observations()`` uses it.
    """
    return union_conform([
        _simple_observations(nested),
        _series_observations(nested),
    ])


def map_to_observations_fused(nested: DataFrame) -> DataFrame:
    """Single-scan observation mapping: build every family's observation
    structs row-locally (`transform` with index = the family-relative
    position), concatenate, and explode ONCE.

    Produces byte-identical rows to ``map_to_observations`` (same ids,
    same typed values) from one scan + one Generate — the union version's
    per-family subtree duplication (2 scans, 2 nest shuffles, 2 joins at
    2 families; k× at k families) collapses into a plan that touches the
    source once. This is the variant that survives a 100× scale-up.
    """
    nd = F.lit(None).cast("double")
    ns = F.lit(None).cast("string")

    def _present(col_name: str, built: Column) -> Column:
        # NULL-family guard replicating the union twin's posexplode_outer
        # + isNotNull: a missing family array contributes NOTHING — but
        # concat(NULL, x) is NULL, which would silently drop the OTHER
        # family's observations too (the whole experiment vanishes)
        return F.when(F.col(col_name).isNotNull(), built).otherwise(F.array())

    def _live(col_name: str, build) -> Column:
        # build per-element structs at ORIGINAL positions, then drop the
        # ones whose source element was NULL (same rows the union twin's
        # isNotNull filter removes, same pos numbering)
        indexed = F.transform(
            F.col(col_name),
            lambda p, i: F.struct(p.alias("p"), i.alias("i")),
        )
        live = F.filter(indexed, lambda x: x["p"].isNotNull())
        return F.transform(live, lambda x: build(x["p"], x["i"]))

    simple = _present("simpleParameter", _live(
        "simpleParameter",
        lambda p, i: F.struct(
            F.lit("simpleParameter").alias("family"),
            i.alias("pos"),
            p["seq"].alias("parameter_seq"),
            F.when(p["qty"] < 10, "categorical").otherwise("unidimensional").alias("observation_type"),
            F.when(~(p["qty"] < 10), p["qty"]).alias("data_point"),
            F.when(p["qty"] < 10, p["flag"]).alias("category"),
            nd.alias("time_point"),
            nd.alias("discrete_point"),
        ),
    ))
    series = _present("seriesParameter", _live(
        "seriesParameter",
        lambda p, i: F.struct(
            F.lit("seriesParameter").alias("family"),
            i.alias("pos"),
            p["increment"].alias("parameter_seq"),
            F.lit("time_series").alias("observation_type"),
            p["value"].alias("data_point"),
            ns.alias("category"),
            p["increment"].cast("double").alias("time_point"),
            i.cast("double").alias("discrete_point"),
        ),
    ))
    exploded = nested.select(
        "experiment_id",
        "metadata_group",
        F.explode(F.concat(simple, series)).alias("o"),
    )
    return exploded.select(
        F.md5(
            F.concat_ws(
                "#", F.col("experiment_id"), F.col("o.family"), F.col("o.pos").cast("string")
            )
        ).alias("observation_id"),
        "experiment_id",
        F.col("o.family").alias("parameter_family"),
        F.col("o.parameter_seq").alias("parameter_seq"),
        F.col("o.observation_type").alias("observation_type"),
        F.col("o.data_point").alias("data_point"),
        F.col("o.category").alias("category"),
        F.col("o.time_point").alias("time_point"),
        F.col("o.discrete_point").alias("discrete_point"),
        "metadata_group",
    )


def observations(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Full plan: flat star schema → nested docs → observation fact table
    (fused single-scan mapping)."""
    return map_to_observations_fused(nest_experiments(orders, lineitem))


def synthesize_curve_observations(obs: DataFrame) -> DataFrame:
    """Derive per-experiment summary observations from the series family —
    the body-weight-curve synthesis pattern
    (observation_mapper.py:1084-1185: derived rows minted FROM existing
    observations and unioned back in). One aggregation over the series
    rows produces a 'curve' observation per experiment whose data_point is
    the trapezoid AUC over (time_point, data_point) and whose id is minted
    from the experiment key with a reserved family tag.
    """
    series = obs.where(F.col("parameter_family") == "seriesParameter")
    pts = series.groupBy("experiment_id", "metadata_group").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("time_point").alias("t"), F.col("data_point").alias("v")))
        ).alias("pts")
    )
    auc = F.aggregate(
        F.zip_with(
            F.slice(F.col("pts"), 1, F.size("pts") - 1),
            F.slice(F.col("pts"), 2, F.size("pts") - 1),
            lambda a, b: (b["t"] - a["t"]) * (a["v"] + b["v"]) / 2.0,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    derived = pts.select(
        F.md5(F.concat_ws("#", F.col("experiment_id"), F.lit("derivedCurve"), F.lit("0")))
        .alias("observation_id"),
        "experiment_id",
        F.lit("derivedCurve").alias("parameter_family"),
        F.lit(0).alias("parameter_seq"),
        F.lit("curve_summary").alias("observation_type"),
        auc.alias("data_point"),
        "metadata_group",
    )
    return conform_to_schema(derived, OBSERVATION_CONTRACT)
