"""Reference-data ingest — S2/S3 (prepare_database.py:28-114).

The reference loads two tracker datasets with per-row ORM upserts and
boolean OR-merge (prepare_database.py:10-26). Spark-shaped: read the
JSON declaratively, explode to (entity, site, flags) rows, aggregate
flags with max() (bool OR == max over 0/1), and MERGE into the dims —
here the merge is an outer-join upsert over the previous dim snapshot
(Iceberg MERGE INTO in production).

Input shapes (matching the reference's vendored datasets):

* disconnect services.json: {"categories": {cat: [{entity_name:
  {homepage_url: [domain, ...]}}, ...]}}
  (prepare_database.py:31-41 navigation)
* Open-Cookie-Database JSON: {entity: [{"category": ..., "domain":
  ...}, ...]} (prepare_database.py:92-110)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pycrawler_spark.functions.udfs import parse_url_udf

# disconnect category -> flag mapping (prepare_database.py:38-90)
_FINGERPRINTING = {"FingerprintingInvasive", "FingerprintingGeneral"}
_MALICIOUS = {"Cryptomining"}

ENTITY_COLS = ["entity", "adult", "tracking", "fingerprinting", "malicious"]
SITE_COLS = ["site", "entity", "adult", "tracking", "fingerprinting", "malicious"]


def load_disconnect(spark: SparkSession, path: str) -> DataFrame:
    """services.json -> (entity, site, tracking, fingerprinting,
    malicious) rows. Every listed category implies tracking=true; the
    homepage's eTLD+1 is added to the site set
    (prepare_database.py:43-48)."""
    raw = spark.read.option("multiLine", "true").json(path)
    # read.json infers dynamic keys as STRUCT fields; re-parse as a
    # typed map so the category/entity/homepage levels are explodable
    cat_map_t = (
        "map<string,array<map<string,map<string,array<string>>>>>"
    )
    cats = raw.select(
        F.explode(
            F.from_json(F.to_json(F.col("categories")), cat_map_t)
        ).alias("category", "entries")
    )
    ent = cats.select(
        "category", F.explode("entries").alias("entry")
    ).select("category", F.explode(F.col("entry")).alias("entity", "homes"))
    homes = ent.select(
        "category", "entity", F.explode(F.col("homes")).alias("home", "domains")
    )
    domains = homes.select(
        "category",
        "entity",
        F.explode(
            F.array_union(
                F.col("domains"),
                F.array(F.coalesce(parse_url_udf(F.col("home")).getField("fld"),
                                   F.element_at(F.col("domains"), 1))),
            )
        ).alias("site"),
    )
    return domains.select(
        "entity",
        "site",
        F.lit(False).alias("adult"),
        F.lit(True).alias("tracking"),
        F.col("category").isin(list(_FINGERPRINTING)).alias("fingerprinting"),
        F.col("category").isin(list(_MALICIOUS)).alias("malicious"),
    )


def load_ocdb(spark: SparkSession, path: str) -> DataFrame:
    """Open-Cookie-Database -> tracker (entity, site) pairs for
    Analytics/Marketing cookies (prepare_database.py:100-110)."""
    raw = spark.read.option("multiLine", "true").json(path)
    # top level is a map entity -> array of cookie structs
    stacked = raw.select(
        F.explode(
            F.map_filter(
                F.from_json(F.to_json(F.struct("*")), "map<string,array<struct<category:string,domain:string>>>"),
                lambda k, v: k.isNotNull(),
            )
        ).alias("entity", "cookies")
    )
    cookies = stacked.select(
        "entity", F.explode("cookies").alias("c")
    ).filter(F.col("c.category").isin("Analytics", "Marketing"))
    pairs = cookies.select(
        "entity",
        F.nullif(F.regexp_replace(F.trim(F.col("c.domain")), r"^\.+|\.+$", ""), F.lit("")).alias("site"),
    ).dropDuplicates(["entity", "site"])  # U2 (prepare_database.py:100-110)
    return pairs.select(
        "entity",
        "site",
        F.lit(False).alias("adult"),
        F.lit(True).alias("tracking"),
        F.lit(False).alias("fingerprinting"),
        F.lit(False).alias("malicious"),
    )


def merge_flags(
    updates: DataFrame,
    current_entities: DataFrame | None = None,
    current_sites: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """A5 OR-merge upsert (prepare_database.py:10-26): returns the new
    (entities, sites) dims. bool OR == max; entity assignment keeps the
    first non-null (site.entity = site.entity or entity)."""
    flag_aggs = [
        F.max(F.coalesce(F.col(c).cast("int"), F.lit(0))).cast("boolean").alias(c)
        for c in ("adult", "tracking", "fingerprinting", "malicious")
    ]
    ent_updates = updates.groupBy("entity").agg(*flag_aggs)
    if current_entities is not None:
        both = current_entities.unionByName(ent_updates)
        ent = both.groupBy("entity").agg(*flag_aggs)
    else:
        ent = ent_updates
    site_updates = updates.filter(F.col("site").isNotNull()).groupBy("site").agg(
        F.min("entity").alias("entity"), *flag_aggs
    )
    if current_sites is not None:
        both_s = current_sites.unionByName(site_updates)
        sites = both_s.groupBy("site").agg(
            F.min("entity").alias("entity"), *flag_aggs
        )
    else:
        sites = site_updates
    return ent.select(*ENTITY_COLS), sites.select(*SITE_COLS)
