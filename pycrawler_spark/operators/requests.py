"""Sub-resource requests stream + media instrumentation (M3/M6, S5/S6).

The reference taps every HTTP response of a page load via a browser
event handler and INSERTs a row per response
(modules/CollectRequests.py:99-167). In corpus mode the set of
sub-resources a page load would trigger is derivable from the stored
HTML (img/script/stylesheet references): :func:`derive_requests`
turns one wave's fetched pages into the ``requests`` fact table.

:func:`instrument_media` is the InstrumentMedia analog
(modules/InstrumentMedia.py:33-88): a pure column substitution that
replaces would-be image payloads with a constant 1x1-pixel body and
flags the row — no I/O, exactly what route-interception becomes when
there is no network.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from pycrawler_spark import htmlkit
from pycrawler_spark.functions.udfs import join_href_udf

_REF_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("resource_type", T.StringType()),
            T.StructField("ref", T.StringType()),
        ]
    )
)


@pandas_udf(_REF_T)
def resource_refs_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda h: [
            {"resource_type": t, "ref": u}
            for (t, u) in htmlkit.extract_resource_refs(h)
        ]
    )


# 1x1 transparent PNG (our own constant; role of InstrumentMedia.MEDIA)
PIXEL_PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000001000000010806000000"
    "1f15c4890000000b49444154789c6300010000050001"
    "0d0a2db40000000049454e44ae426082"
)


def derive_requests(hits: DataFrame) -> DataFrame:
    """One row per sub-resource a browser would request for each
    fetched page: (task_id, page_url, depth, resource_type, url,
    method, navigation). The page's own navigation request is included
    with navigation=true (CollectRequests records it with the
    navigation flag, modules/CollectRequests.py:133)."""
    nav = hits.select(
        "task_id",
        F.col("url").alias("page_url"),
        "depth",
        F.lit("document").alias("resource_type"),
        F.col("url"),
        F.lit("GET").alias("method"),
        F.lit(True).alias("navigation"),
    )
    sub = (
        hits.select(
            "task_id",
            F.col("url").alias("page_url"),
            "depth",
            F.explode(resource_refs_udf(F.col("html"))).alias("r"),
        )
        .select(
            "task_id",
            "page_url",
            "depth",
            F.col("r.resource_type").alias("resource_type"),
            join_href_udf(F.col("page_url"), F.col("r.ref"))
            .getField("url_full")
            .alias("url"),
            F.lit("GET").alias("method"),
            F.lit(False).alias("navigation"),
        )
        .filter(F.col("url").isNotNull())
    )
    return nav.unionByName(sub)


def instrument_media(requests: DataFrame) -> DataFrame:
    """F11 media predicate + S6 pixel substitution: GET image requests
    get a constant 1x1 pixel body and intercepted=true; everything
    else passes through untouched (modules/InstrumentMedia.py:36-88)."""
    is_media = (F.col("method") == "GET") & (F.col("resource_type") == "image")
    return requests.withColumn("intercepted", is_media).withColumn(
        "body",
        F.when(is_media, F.lit(PIXEL_PNG)).otherwise(F.lit(None).cast("binary")),
    )
